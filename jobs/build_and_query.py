"""spark-submit entry point: build (or reuse) an index over a transcripts
parquet table and run a BM25 query.

    spark-submit --py-files dist/blacklab_spark.zip jobs/build_and_query.py \
        --input <transcripts.parquet> --index <index_dir> \
        [--query "fox"] [--k 10] [--resume]

NOTE: pandas-written parquet needs coerce_timestamps="us" (Spark rejects
TIMESTAMP(NANOS)). The transcripts table must have the BASELINE.json input shape
(conv_id, turn_idx, role, text, tool, ts); extra columns ride along as
document metadata.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--cql", default=None, help="BCQL span query (plans/cql.py grammar)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from blacklab_spark.build import build_index
    from blacklab_spark.corpus import Corpus

    spark = SparkSession.builder.appName("blacklab-build-and-query").getOrCreate()
    transcripts = spark.read.parquet(args.input)
    t0 = time.time()
    build_index(spark, transcripts, args.index, resume=args.resume)
    build_sec = time.time() - t0
    c = Corpus(spark, args.index)
    out = {
        "n_docs": c.n_docs,
        "avgdl": c.avgdl,
        "build_sec": round(build_sec, 3),
    }
    if args.query:
        hits = c.search(args.query, k=args.k).collect()
        out["query"] = args.query
        out["hits"] = [[r["doc_id"], r["score"]] for r in hits]
    if args.cql:
        spans = c.find_cql(args.cql).limit(args.k).collect()
        out["cql"] = args.cql
        out["spans"] = [[r["doc_id"], r["start"], r["end"]] for r in spans]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
