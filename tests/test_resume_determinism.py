"""Checkpoint/resume + cross-parallelism determinism (SURVEY.md §5.2).

- resume: interrupt the build after stage k (simulated by deleting later
  stage outputs+markers), rebuild with resume=True → logically identical
  index, earlier stages untouched (markers unchanged).
- determinism: the same corpus built under different partition counts /
  salting configs yields identical query results and identical decoded
  postings (the north_rule N vs 4N invariance, testable in one session).
"""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from blacklab_spark import codecs
from blacklab_spark.build import build_index
from blacklab_spark.corpus import Corpus
from blacklab_spark.datagen import make_transcripts


@pytest.fixture(scope="module")
def corpus_pdf():
    return make_transcripts(1500, seed=11, vocab_size=300)


def decoded_postings(spark, path):
    c = Corpus(spark, path)
    tid2term = {r["term_id"]: r["term"] for r in c.term_dict.collect()}
    out = {}
    for r in c.postings.collect():
        d, t, l = codecs.decode_block(r.asDict())
        key = tid2term[r["term_id"]]
        out.setdefault(key, []).append((r["block_no"], tuple(d), tuple(t), tuple(l)))
    return {
        k: tuple(x[1:] for x in sorted(v)) for k, v in out.items()
    }


def test_resume_after_partial_build(spark, tmp_root, corpus_pdf):
    path = f"{tmp_root}/resume_idx"
    df = spark.createDataFrame(corpus_pdf)
    build_index(spark, df, path, salt_df_threshold=40, docs_per_salt=128)
    full = decoded_postings(spark, path)
    docs_marker = json.load(open(f"{path}/_checkpoints/docs.json"))

    # simulate a crash after term_dict: postings + manifest lost
    os.remove(f"{path}/_checkpoints/postings.json")
    os.remove(f"{path}/_checkpoints/manifest.json")
    shutil.rmtree(f"{path}/postings")
    shutil.rmtree(f"{path}/manifest")

    build_index(spark, df, path, salt_df_threshold=40, docs_per_salt=128, resume=True)
    assert json.load(open(f"{path}/_checkpoints/docs.json")) == docs_marker, \
        "completed stage was re-run on resume"
    assert decoded_postings(spark, path) == full


def test_manifest_lineage_metrics(spark, tmp_root, corpus_pdf):
    path = f"{tmp_root}/resume_idx"  # built above
    man = spark.read.parquet(f"{path}/manifest")
    rows = man.collect()
    assert len(rows) >= 1
    total_postings = sum(r["postings_written"] for r in rows)
    c = Corpus(spark, path)
    # postings_written == total (term, doc) pairs == sum of df over terms
    expect = c.term_dict.agg(F.sum("df")).collect()[0][0]
    assert total_postings == expect
    assert all(r["bytes_compressed"] > 0 for r in rows)
    marker = json.load(open(f"{path}/_checkpoints/manifest.json"))
    assert marker["postings_written"] == total_postings


def test_determinism_across_parallelism(spark, tmp_root, corpus_pdf):
    """Same corpus, different shuffle partitioning + salting config →
    identical postings and identical top-k (incl. float64 scores)."""
    df = spark.createDataFrame(corpus_pdf)
    pa = f"{tmp_root}/det_a"
    pb = f"{tmp_root}/det_b"
    build_index(spark, df.repartition(2), pa, num_partitions=2,
                salt_df_threshold=1_000_000, docs_per_salt=1 << 20)
    build_index(spark, df.repartition(13), pb, num_partitions=11,
                salt_df_threshold=30, docs_per_salt=64)

    da = decoded_postings(spark, pa)
    db = decoded_postings(spark, pb)
    # salting changes BLOCK boundaries, never the merged posting content
    flat = lambda blocks: tuple(
        x for b in blocks for x in zip(b[0], b[1], b[2])
    )
    assert set(da) == set(db)
    for t in da:
        assert flat(da[t]) == flat(db[t]), t

    ca, cb = Corpus(spark, pa), Corpus(spark, pb)
    assert ca.meta["n_docs"] == cb.meta["n_docs"]
    assert ca.meta["avgdl"] == cb.meta["avgdl"]
    for q in [["the"], ["w0001", "w0002", "the"], ["w0250"]]:
        ra = [(r["doc_id"], r["score"]) for r in ca.search_or(q, k=25).collect()]
        rb = [(r["doc_id"], r["score"]) for r in cb.search_or(q, k=25).collect()]
        assert ra == rb, q
    pa_ = [(r["doc_id"], r["score"]) for r in ca.search_phrase(["the", "a"], k=25).collect()]
    pb_ = [(r["doc_id"], r["score"]) for r in cb.search_phrase(["the", "a"], k=25).collect()]
    assert pa_ == pb_
