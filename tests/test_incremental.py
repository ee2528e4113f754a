"""Incremental add-to-index + compaction (SURVEY.md §2.6: incremental index
add maps to appending per-partition segments + a merge compaction)."""

import json

import pytest

from blacklab_spark import oracle as orc
from blacklab_spark.build import build_index
from blacklab_spark.corpus import Corpus
from blacklab_spark.datagen import make_transcripts
from blacklab_spark.incremental import add_to_index, compact_index


@pytest.fixture(scope="module")
def setup(spark, tmp_root):
    base = make_transcripts(1200, seed=21, vocab_size=250)
    # delta with DIFFERENT conv ids (renamed) so doc identity stays unique
    delta = make_transcripts(400, seed=22, vocab_size=250)
    delta["conv_id"] = delta["conv_id"].str.replace("conv-", "delta-")
    path = f"{tmp_root}/incr_idx"
    build_index(spark, spark.createDataFrame(base), path,
                salt_df_threshold=60, docs_per_salt=128)
    add_to_index(spark, spark.createDataFrame(delta), path)

    # oracle over the FULL corpus in engine docID order: base first (its
    # conv-* order), then delta (delta-* order appended at N)
    bo = base.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    do = delta.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    texts = list(bo["text"]) + list(do["text"])
    oi = orc.build_oracle_index(list(zip(range(len(texts)), texts)))
    return path, oi


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_meta_updated_and_stale(spark, setup):
    path, oi = setup
    meta = json.load(open(f"{path}/_meta.json"))
    assert meta["n_docs"] == oi.n_docs
    assert meta["total_tokens"] == oi.total_tokens
    assert meta["avgdl"] == oi.avgdl
    assert meta["bounds_stale"] is True
    assert meta["n_segments"] == 2


def test_post_append_exact_scores(spark, setup):
    path, oi = setup
    c = Corpus(spark, path)
    for q in [["the"], ["w0001", "w0010"], ["w0200"]]:
        assert rows(c.search_or(q, k=30)) == orc.topk_or(oi, q, 30), q
    bigram = ["the", "a"]
    assert rows(c.search_phrase(bigram, k=30)) == orc.topk_phrase(oi, bigram, 30)


def test_term_dict_merged(spark, setup):
    path, oi = setup
    c = Corpus(spark, path)
    got = {r["term"]: (r["df"], r["cf"]) for r in c.term_dict.collect()}
    expect = {t: (df, cf) for t, df, cf in orc.term_frequencies(oi)}
    assert got == expect
    ids = sorted(r["term_id"] for r in c.term_dict.collect())
    assert ids == list(range(len(ids)))  # still dense after merge


def test_compact_restores_bounds_and_parity(spark, setup):
    path, oi = setup
    compact_index(spark, path)
    meta = json.load(open(f"{path}/_meta.json"))
    assert meta["bounds_stale"] is False and meta["n_segments"] == 1
    assert meta["n_docs"] == oi.n_docs and meta["avgdl"] == oi.avgdl
    c = Corpus(spark, path)
    for q in [["the"], ["w0001", "w0010"]]:
        assert rows(c.search_or(q, k=30)) == orc.topk_or(oi, q, 30), q
    # WAND path (k_hint) active again and still exact
    assert rows(c.search_or(["the"], k=5)) == orc.topk_term(oi, "the", 5)


def test_post_append_chain_kernel_matches_join(spark, setup):
    # the r4 positions-chain kernel must handle MULTI-SEGMENT indexes (a doc
    # lives in exactly one segment; the kernel is block_no-agnostic) — pin
    # kernel == join on the appended index for fixed and variable gaps
    import os as _os

    path, oi = setup
    c = Corpus(spark, path)
    queries = ['"the" "a"', '"the" []{0,2} "a"', '"w0001" [] "the"']
    for q in queries:
        kern = {
            (r["doc_id"], r["start"], r["end"])
            for r in c.find_cql(q).select("doc_id", "start", "end").collect()
        }
        _os.environ["BLACKLAB_SEQ_KERNEL"] = "join"
        try:
            join = {
                (r["doc_id"], r["start"], r["end"])
                for r in c.find_cql(q).select("doc_id", "start", "end").collect()
            }
        finally:
            _os.environ.pop("BLACKLAB_SEQ_KERNEL", None)
        assert kern == join, q
        assert len(kern) > 0, q


def test_fold_version_gate(spark, tmp_root):
    # ADVICE r5: an index whose baked-in fold convention differs from the
    # engine's current one must not be silently queried (insensitive layers
    # would miss re-folded terms) and must never be appended to (one term
    # dict would mix two conventions)
    import warnings

    from blacklab_spark.tokenizer import FOLD_VERSION

    path = f"{tmp_root}/fold_gate_idx"
    df = spark.createDataFrame(make_transcripts(40, seed=7, vocab_size=50))
    build_index(spark, df, path)
    meta = json.load(open(f"{path}/_meta.json"))
    assert meta["fold_version"] == FOLD_VERSION  # stamped at build

    # current stamp: clean open, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Corpus(spark, path)

    # explicit mismatch: open warns, append refuses
    meta["fold_version"] = FOLD_VERSION - 1
    json.dump(meta, open(f"{path}/_meta.json", "w"))
    with pytest.warns(UserWarning, match="fold_version"):
        Corpus(spark, path)
    delta = make_transcripts(10, seed=8, vocab_size=50)
    delta["conv_id"] = "x-" + delta["conv_id"]
    with pytest.raises(RuntimeError, match="fold_version"):
        add_to_index(spark, spark.createDataFrame(delta), path)

    # unstamped (pre-r6): open and append both warn but proceed
    del meta["fold_version"]
    json.dump(meta, open(f"{path}/_meta.json", "w"))
    with pytest.warns(UserWarning, match="fold_version"):
        Corpus(spark, path)
