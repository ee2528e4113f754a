"""Focused tests for round-7 optimization changes to operator internals:

* grouped postings encode is byte-identical to the decoded content the
  determinism suite pins (covered there); here: the BROADCAST hit-join path
  returns the same rows as the shuffle-join path;
* spans_terms' plan-time broadcast hint survives a selectExpr and yields a
  broadcast join;
* kwic_text no longer crashes on zero-width hits at position 0 (ADVICE r6)
  and renders them as an empty match;
* fuzzy_terms' length-band + bounded levenshtein returns exactly the
  unpruned scan's rows;
* the vectorized simhash (one groupBy, 32 conditional sums) matches a
  from-scratch per-doc reference computation.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from blacklab_spark.build import build_index
from blacklab_spark.corpus import Corpus
from blacklab_spark.datagen import make_transcripts
from blacklab_spark.operators import dedup
from blacklab_spark.operators import grouping as G
from blacklab_spark.operators.spans import fuzzy_terms


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r07idx") / "idx")
    pdf = make_transcripts(2500, seed=11, vocab_size=600)
    build_index(spark, spark.createDataFrame(pdf), path,
                salt_df_threshold=200, docs_per_salt=512,
                store_offsets=True)
    return Corpus(spark, path)


def test_broadcast_hit_join_matches_shuffle_join(corpus):
    h = corpus.spans_term("w0003").selectExpr("doc_id", "start as pos")
    saved = G._BROADCAST_HITS_CAP
    try:
        G._BROADCAST_HITS_CAP = 0  # force the shuffle join
        ref = sorted(
            (r["term"], r["n"])
            for r in G.collocations_hits(h, corpus.docs, 2).collect()
        )
    finally:
        G._BROADCAST_HITS_CAP = saved
    got = sorted(
        (r["term"], r["n"])
        for r in G.collocations_hits(h, corpus.docs, 2).collect()
    )
    assert got == ref and len(ref) > 0


def test_spans_terms_hint_yields_broadcast_join(corpus):
    h = corpus.spans_term("w0003").selectExpr("doc_id", "start as pos")
    plan = G.collocations_hits(h, corpus.docs, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kwic_text_zero_width_hit_at_origin(spark, corpus):
    # zero-width span at position 0 used to hit element_at(tok_ends, 0)
    # which Spark rejects at runtime (ADVICE r6)
    h = spark.createDataFrame(
        [(0, 0, 0), (0, 0, 1)], "doc_id long, start int, end int"
    )
    rows = {
        (r["start"], r["end"]): r
        for r in G.kwic_text(h, corpus.docs, context=2).collect()
    }
    assert rows[(0, 0)]["match"] == ""  # empty match, no crash
    # the adjacent width-1 hit is unaffected by the guard
    assert len(rows[(0, 1)]["match"]) > 0


def test_fuzzy_band_equals_unpruned_scan(corpus):
    td = corpus.term_dict
    banded = sorted(
        tuple(r) for r in fuzzy_terms(td, "w0010", max_dist=2).collect()
    )
    unpruned = sorted(
        tuple(r)
        for r in td.withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit("w0010"))
        ).filter(F.col("dist") <= 2).select("term", "df", "cf", "dist").collect()
    )
    assert banded == unpruned and len(banded) > 5


def test_postings_plan_single_payload_exchange(spark, corpus):
    """The postings build moves the position payload through exactly ONE
    exchange at ANY vocabulary size (VERDICT r6 "wrong #1"): the plan is
    fixed by construction — an explicit broadcast of the bounded hot-term
    set, one (term, salt) repartition of the payload, a co-partitioned
    SHUFFLED-HASH dict join that adds no exchange (only the exploded
    dict's payload-free rows move), and a groupBy that reuses the join's
    partitioning. No sort-merge join, no broadcast-threshold dependence."""
    from blacklab_spark.build import build_postings_frame, _term_counts_batches, _TFPOS_SCHEMA

    docs = corpus.docs
    tfpos = docs.select("doc_id", "dl", "tokens").mapInArrow(
        _term_counts_batches, schema=_TFPOS_SCHEMA
    )
    frame = build_postings_frame(
        tfpos, corpus.term_dict,
        num_partitions=8, salt_df_threshold=200, docs_per_salt=512,
        block_size=128, n_docs=corpus.meta["n_docs"],
        avgdl=corpus.meta["avgdl"],
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # big-vocab regime: nothing may be auto-broadcast — the plan must
        # not change shape (the hot-set broadcast is explicit)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" in plan  # the explicit hot-set broadcast
    # exactly one exchange carries the payload (pos_enc); the only other
    # exchange ships the exploded dict's short rows.  Formatted explain
    # details every operator as "(n) Exchange\nInput [k]: [cols...]".
    blocks = [
        b for b in plan.split("\n\n") if b.lstrip().startswith("(")
        and ") Exchange" in b.split("\n")[0]
    ]
    payload_exchanges = sum("pos_enc" in b for b in blocks)
    assert len(blocks) == 2, plan
    assert payload_exchanges == 1, plan


def test_simhash_matches_reference(spark):
    rows = [
        (1, ["apple", "pear", "apple"]),
        (2, ["pear", "plum"]),
        (3, ["apple"] * 5 + ["quince"]),
    ]
    df = spark.createDataFrame(rows, "id long, tokens array<string>")
    got = {r["id"]: r["simhash"] for r in
           dedup.simhash(df, "tokens", "id").collect()}

    def md5_int32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for rid, toks in rows:
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        votes = [0] * 32
        for t, n in tf.items():
            x = md5_int32(t)
            for b in range(32):
                votes[b] += n if (x >> b) & 1 else -n
        expect = sum(1 << b for b in range(32) if votes[b] > 0)
        assert got[rid] == expect
