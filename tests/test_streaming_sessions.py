"""Stateful streaming sessionization (applyInPandasWithState) must agree with
the batch sessionize operator: every CLOSED session matches; the open tail
session per user stays in state. Two single-file triggers force the state to
carry across micro-batches."""

import datetime as dt
import os

import numpy as np
import pandas as pd


def test_stateful_sessionization_stream(spark, tmp_root):
    from blacklab_spark.operators.grouping import sessionize
    from blacklab_spark.streaming.sessions import sessionize_stream

    rng = np.random.default_rng(9)
    n = 400
    base = dt.datetime(2026, 1, 1)
    pdf = pd.DataFrame({
        "user_id": rng.integers(0, 8, n).astype("int64"),
        "ts": [
            base + dt.timedelta(minutes=int(m))
            for m in np.cumsum(rng.integers(0, 40, n))
        ],
    }).sort_values("ts").reset_index(drop=True)

    d = f"{tmp_root}/sess_stream"
    os.makedirs(d, exist_ok=True)
    for i, half in enumerate([pdf.iloc[:200], pdf.iloc[200:]]):
        tmpd = f"{tmp_root}/sess_tmp{i}"
        spark.createDataFrame(half).coalesce(1).write.mode("overwrite").parquet(tmpd)
        part = [f for f in os.listdir(tmpd) if f.startswith("part-")][0]
        dst = f"{d}/{i:03d}.parquet"
        os.rename(f"{tmpd}/{part}", dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))  # oldest-first pickup

    schema = spark.read.parquet(d).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # ≥2 triggers → state must carry
        .parquet(d)
    )
    q = (
        sessionize_stream(src, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_closed")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["session_start_epoch"], r["session_end_epoch"]
        )
        for r in spark.sql("SELECT * FROM sess_closed").collect()
    }

    batch = sessionize(spark.createDataFrame(pdf), gap_minutes=30).collect()
    by_user_max = {}
    for r in batch:
        by_user_max[r["user_id"]] = max(
            by_user_max.get(r["user_id"], -1), r["session_id"]
        )
    expected = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["session_start_epoch"], r["session_end_epoch"]
        )
        for r in batch
        if r["session_id"] < by_user_max[r["user_id"]]  # open tail stays in state
    }
    assert expected, "fixture produced no closed sessions"
    assert got == expected
