"""r07: probe-gated postings-stage sub-step attribution.

Builds one index (for real docs/term_dict parquet), then times each
sub-pipeline of the postings stage best-of-N with clean-probe gating.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_probe, _membw_probe  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from blacklab_spark.build import (  # noqa: E402
    _TFPOS_SCHEMA,
    _term_counts_batches,
    build_index,
)
from blacklab_spark.datagen import make_transcripts  # noqa: E402
from blacklab_spark.session import get_spark  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n_turns = int(os.environ.get("BENCH_TURNS", "1200000"))
spark = get_spark("profile_postings", cores=cpus, shuffle_partitions=max(cpus, 8))
np_ = max(cpus, 8)

pdf = make_transcripts(n_turns, seed=42)
transcripts = spark.createDataFrame(pdf).repartition(np_).persist()
transcripts.count()
idx = tempfile.mkdtemp(prefix="blx_pp_")
build_index(spark, transcripts, idx, salt_df_threshold=10_000, docs_per_salt=1 << 16)

docs = spark.read.parquet(os.path.join(idx, "docs"))
term_dict = spark.read.parquet(os.path.join(idx, "term_dict"))

FLOOR, MFLOOR = 118.0, 40.0


def timed(name, fn, n=5):
    best = None
    done = 0
    for _ in range(n * 3):
        p0, m0 = _cpu_probe(0.2), _membw_probe(0.2)
        if p0 < FLOOR or m0 < MFLOOR:
            time.sleep(8)
            continue
        t = time.time()
        fn()
        w = time.time() - t
        best = w if best is None else min(best, w)
        done += 1
        if done >= n:
            break
    print(name, round(best if best is not None else -1, 2), flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


tfpos = docs.select("doc_id", "dl", "tokens").mapInArrow(
    _term_counts_batches, schema=_TFPOS_SCHEMA
)
timed("1.tfpos_noop", lambda: noop(tfpos))

joined = tfpos.join(term_dict.select("term", "term_id", "df"), "term")
salted = joined.withColumn(
    "salt",
    F.when(F.col("df") > F.lit(10_000),
           (F.col("doc_id") / F.lit(1 << 16)).cast("long")).otherwise(
        F.lit(0).cast("long")),
)
sel = salted.select("term_id", "salt", "doc_id", "tf", "dl", "df", "pos_enc")
timed("2.join_salt_noop", lambda: noop(sel))

shuf = sel.repartition(np_, "term_id", "salt")
timed("3.shuffle_noop", lambda: noop(shuf))

sorted_ = shuf.sortWithinPartitions("term_id", "salt", "doc_id")
timed("4.shuffle_sort_noop", lambda: noop(sorted_))

# real encode (reproduce build.py's closure)
import json  # noqa: E402

with open(os.path.join(idx, "_meta.json")) as f:
    meta = json.load(f)

from blacklab_spark import build as B  # noqa: E402

# re-run the full postings stage through build_index resume machinery:
# delete the postings marker + dir, call build_index(resume=True)
def full_postings():
    shutil.rmtree(os.path.join(idx, "postings"), ignore_errors=True)
    shutil.rmtree(os.path.join(idx, "manifest"), ignore_errors=True)
    for st in ("postings", "manifest"):
        m = os.path.join(idx, "_checkpoints", f"{st}.json")
        if os.path.exists(m):
            os.remove(m)
    build_index(spark, transcripts, idx, resume=True,
                salt_df_threshold=10_000, docs_per_salt=1 << 16)


timed("5.full_postings_stage", full_postings)

shutil.rmtree(idx, ignore_errors=True)
transcripts.unpersist()
