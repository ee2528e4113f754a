"""Dense, deterministic docID assignment — scalable global rank.

Reference analog: Lucene's two-level docID scheme (segment-local ordinal +
docBase; /root/reference/engine/src/main/java/nl/inl/blacklab/forwardindex/
TermsGlobal.java:84-95,172-184). Ours: doc_id = GLOBAL RANK of the row under
orderBy(order_cols) — by construction invariant to partition count, so results
are identical at local[8] and local[32] (the north_rule determinism demand).

Implementation avoids a single-partition global window: range-partition on the
order columns (disjoint ordered ranges), count rows per partition (tiny driver
collect ≈ num_partitions rows), then doc_id = partition_offset + local
row_number within the partition — a per-partition window, fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    return_count: bool = False,
):
    """Add `id_col` = dense 0-based global rank of the row by order_cols.

    order_cols must be a unique key (for transcripts: (conv_id, turn_idx) —
    the BASELINE.json document-identity contract). The input is re-range-
    partitioned; output partitioning is by range of order_cols.
    return_count=True → (df, total_rows): the total falls out of the offset
    computation for free, sparing callers a separate full count job.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(num_partitions, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # Persist so the sampled range boundaries are computed exactly once —
    # the count job and the final job must see identical partitioning.
    with_pid.persist()
    try:
        counts = dict(
            (r["_pid"], r["cnt"])
            for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
        )
        offsets = {}
        acc = 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        offs_df = F.broadcast(
            spark.createDataFrame(
                [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
            )
        )
        w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
        out = (
            with_pid.withColumn("_rn", F.row_number().over(w))
            .join(offs_df, "_pid")
            .withColumn(id_col, (F.col("_off") + F.col("_rn") - F.lit(1)).cast("long"))
            .drop("_pid", "_rn", "_off")
        )
        # Materialization happens in the caller (build writes parquet
        # immediately). The persisted intermediate rides along so the caller
        # can unpersist EXACTLY this relation afterwards — r7: the old
        # contract ended with spark.catalog.clearCache() in build_index,
        # which also evicted CALLER-owned caches (e.g. a persisted input
        # DataFrame a benchmark reuses across two builds, forcing a full
        # recompute of the second build's input).
        out._blx_persisted = with_pid
        if return_count:
            return out, acc
        return out
    except Exception:
        with_pid.unpersist()
        raise
