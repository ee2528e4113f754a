"""r07: attribute the docs/postings stage walls to sub-steps (guide §1.4).

Times each sub-pipeline with the noop sink where possible, on the bench
corpus shape. Run: SPARK_GRAFT_CPUS=32 BENCH_TURNS=1200000 python
scripts/profile_build_substages.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark import TaskContext  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from blacklab_spark import codecs, scoring  # noqa: E402
from blacklab_spark.build import _TFPOS_SCHEMA, _term_counts_batches, build_index  # noqa: E402
from blacklab_spark.datagen import make_transcripts  # noqa: E402
from blacklab_spark.session import get_spark  # noqa: E402
from blacklab_spark.tokenizer import tokenize_series  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n_turns = int(os.environ.get("BENCH_TURNS", "1200000"))
spark = get_spark("profile_substages", cores=cpus, shuffle_partitions=max(cpus, 8))
np_ = max(cpus, 8)

pdf = make_transcripts(n_turns, seed=42)
transcripts = spark.createDataFrame(pdf).repartition(np_).persist()
transcripts.count()

T0 = {}


def timed(name, fn, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t = time.time()
        fn()
        w = time.time() - t
        best = w if best is None else min(best, w)
    T0[name] = round(best, 2)
    print(name, round(best, 2), flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# ---------------- docs stage sub-steps ----------------
doc_key = ("conv_id", "turn_idx")

def docs_substeps():
    ranged = (
        transcripts.repartitionByRange(np_, *doc_key)
        .sortWithinPartitions(*doc_key)
    )
    timed("docs.range_shuffle_noop", lambda: noop(ranged))

    rp = ranged.persist()
    timed("docs.persist_count", lambda: rp.count())

    # tokenize via mapInPandas, emit full rows -> noop
    out_schema = T.StructType(
        [f for f in transcripts.schema.fields]
        + [T.StructField("doc_id", T.LongType()),
           T.StructField("tokens", T.ArrayType(T.StringType())),
           T.StructField("dl", T.IntegerType())]
    )

    def assign_and_tokenize(batches):
        seen = 0
        for p in batches:
            toks = tokenize_series(p["text"])
            p = p.assign(doc_id=np.arange(seen, seen + len(p), dtype="int64"),
                         tokens=toks, dl=toks.str.len().astype("int32"))
            seen += len(p)
            yield p

    docs = rp.mapInPandas(assign_and_tokenize, schema=out_schema)
    timed("docs.tokenize_noop", lambda: noop(docs))
    d = tempfile.mkdtemp(prefix="blx_prof_docs_")
    timed("docs.tokenize_write", lambda: docs.write.mode("overwrite").parquet(d))
    sz = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
             if f.startswith("part-"))
    print("docs parquet MB:", round(sz / 1e6, 1), flush=True)
    rp.unpersist()
    return d


docs_dir = docs_substeps()

# ---------------- postings stage sub-steps ----------------
docs = spark.read.parquet(docs_dir)
timed("post.read_tokens_noop", lambda: noop(docs.select("doc_id", "dl", "tokens")))

tfpos = docs.select("doc_id", "dl", "tokens").mapInArrow(
    _term_counts_batches, schema=_TFPOS_SCHEMA
)
timed("post.tfpos_noop", lambda: noop(tfpos))

# term dict quick (for the join)
flat = F.col("tokens")
cf_df = docs.select(F.explode(flat).alias("term")).groupBy("term").agg(F.count("*").alias("cf"))
timed("post.explode_cf_noop", lambda: noop(cf_df))
df_df = docs.select(F.explode(F.array_distinct(flat)).alias("term")).groupBy("term").agg(F.count("*").alias("df"))
td = df_df.join(cf_df, "term").withColumn(
    "term_id", F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("term")
    ).cast("long") - 1
)
td_p = td.persist()
n_terms = td_p.count()
print("n_terms", n_terms, flush=True)

joined = tfpos.join(td_p.select("term", "term_id", "df"), "term")
salted = joined.withColumn(
    "salt",
    F.when(F.col("df") > F.lit(10_000),
           (F.col("doc_id") / F.lit(1 << 16)).cast("long")).otherwise(F.lit(0).cast("long")),
)
sel = salted.select("term_id", "salt", "doc_id", "tf", "dl", "df", "pos_enc")
timed("post.join_salt_noop", lambda: noop(sel))

shuffled = sel.repartition(np_, "term_id", "salt").sortWithinPartitions(
    "term_id", "salt", "doc_id")
timed("post.shuffle_sort_noop", lambda: noop(shuffled))

# encode via the real encoder
import importlib
bmod = importlib.import_module("blacklab_spark.build")
meta_nd = n_turns
avgdl = 12.0


def make_encode():
    # reuse build.py's encode_partition by calling build_index? simpler:
    # inline time the full postings stage through build_index below.
    pass

# full build for reference walls
idx = tempfile.mkdtemp(prefix="blx_prof_idx_")
t = time.time()
build_index(spark, transcripts, idx, salt_df_threshold=10_000, docs_per_salt=1 << 16)
print("full_build", round(time.time() - t, 2), flush=True)
import json
ck = os.path.join(idx, "_checkpoints")
print({f[:-5]: round(json.load(open(os.path.join(ck, f)))["wall_sec"], 2)
       for f in os.listdir(ck)}, flush=True)
psz = sum(os.path.getsize(os.path.join(idx, "postings", f))
          for f in os.listdir(os.path.join(idx, "postings")) if f.startswith("part-"))
print("postings parquet MB:", round(psz / 1e6, 1), flush=True)

print(T0)
shutil.rmtree(docs_dir, ignore_errors=True)
shutil.rmtree(idx, ignore_errors=True)
