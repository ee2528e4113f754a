"""Multi-value token positions (position-increment 0).

The reference indexes several values at ONE token position — synonyms /
normalized forms (AnnotationWriter.java:267-291; the "The|DOH|ZZZ" fixture,
core/src/test/java/nl/inl/blacklab/testutil/TestIndex.java:102-106). Here the
build accepts tokens as array<array<string>>: outer index = position, every
inner value indexed at that position; the docs table keeps the MAIN (first)
value per position for KWIC/forward-index consumers.
"""

import pandas as pd
import pytest

from blacklab_spark.build import build_index
from blacklab_spark.corpus import Corpus

# doc 0: The|DOH|ZZZ quick brown fox ; doc 1: the end
DOCS = [
    [["the", "doh", "zzz"], ["quick"], ["brown"], ["fox"]],
    [["the"], ["end", "finish"]],
]


@pytest.fixture(scope="module")
def mvidx(spark, tmp_root):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(DOCS),
        "turn_idx": range(len(DOCS)),
        "tokens": DOCS,
    })
    path = f"{tmp_root}/mv_idx"
    schema = "conv_id string, turn_idx int, tokens array<array<string>>"
    build_index(spark, spark.createDataFrame(pdf, schema=schema), path,
                block_size=4)
    return Corpus(spark, path)


def spans(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


def test_all_values_indexed_at_position(mvidx):
    # every synonym hits the SAME position
    assert spans(mvidx.spans_term("the")) == [(0, 0, 1), (1, 0, 1)]
    assert spans(mvidx.spans_term("doh")) == [(0, 0, 1)]
    assert spans(mvidx.spans_term("zzz")) == [(0, 0, 1)]
    assert spans(mvidx.spans_term("finish")) == [(1, 1, 2)]


def test_doc_lengths_count_positions_not_values(mvidx):
    dls = {r["doc_id"]: r["dl"] for r in mvidx.doc_lengths().collect()}
    assert dls == {0: 4, 1: 2}
    assert mvidx.meta["total_tokens"] == 6


def test_sequences_cross_synonyms(mvidx):
    # a phrase can enter through one value and continue from the position
    assert spans(mvidx.find_cql('"doh" "quick"')) == [(0, 0, 2)]
    assert spans(mvidx.find_cql('"the" "quick"')) == [(0, 0, 2)]


def test_forward_index_keeps_main_value(mvidx):
    toks = {r["doc_id"]: r["tokens"] for r in
            mvidx.docs.select("doc_id", "tokens").collect()}
    assert toks[0] == ["the", "quick", "brown", "fox"]
    assert toks[1] == ["the", "end"]


def test_compact_preserves_multivalue(spark, tmp_root):
    # compaction rebuilds from the STORED tokens_mv, not by re-tokenizing
    # text (which would drop every synonym value)
    import pandas as pd

    from blacklab_spark.incremental import compact_index

    path = f"{tmp_root}/mv_compact_idx"
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(DOCS),
        "turn_idx": range(len(DOCS)),
        "tokens": DOCS,
    })
    schema = "conv_id string, turn_idx int, tokens array<array<string>>"
    build_index(spark, spark.createDataFrame(pdf, schema=schema), path,
                block_size=4)
    c0 = Corpus(spark, path)
    before = {
        t: spans(c0.spans_term(t)) for t in ["the", "doh", "zzz", "finish"]
    }
    td_before = sorted(
        (r["term"], r["df"], r["cf"]) for r in c0.term_dict.collect()
    )
    compact_index(spark, path)
    c1 = Corpus(spark, path)
    assert not c1.meta["bounds_stale"]
    for t, sp in before.items():
        assert spans(c1.spans_term(t)) == sp, t
    assert sorted(
        (r["term"], r["df"], r["cf"]) for r in c1.term_dict.collect()
    ) == td_before


def test_term_stats_per_value(mvidx):
    td = {r["term"]: (r["df"], r["cf"]) for r in mvidx.term_dict.collect()}
    assert td["the"] == (2, 2)
    assert td["doh"] == (1, 1)
    assert td["end"] == (1, 1) and td["finish"] == (1, 1)
