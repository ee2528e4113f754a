"""Match-sensitivity layers (the reference's @s / @i fields).

BlackLab indexes each annotation at up to four sensitivities as separate
Lucene fields (engine/.../indexmetadata/MatchSensitivity.java:14-17; field
naming doc/technical/index-formats/integrated.md:19-31). Here the sensitive
variant is a second annotation layer `word_s` holding case-preserving tokens
(tokenizer.tokenize_sensitive), position-aligned with `word`:

  [word_s="Fox"]        exact-case search
  [word="(?-i)Fox"]     sensitivity flag routes to the _s layer
  [word="Fox"]          insensitive literal is desensitized → finds "fox"
"""

import pandas as pd
import pytest

from blacklab_spark.annotated import AnnotatedCorpus, build_annotated_index
from blacklab_spark.tokenizer import tokenize, tokenize_sensitive

TEXTS = [
    "The quick Brown fox jumps over the lazy Dog",   # doc 0
    "THE FOX and the fox saw a Fox",                 # doc 1
    "no capitals here at all",                       # doc 2
]


@pytest.fixture(scope="module")
def scorp(spark, tmp_root):
    rows = [
        ("conv-s", i, tokenize(t), tokenize_sensitive(t))
        for i, t in enumerate(TEXTS)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "word", "word_s"])
    root = f"{tmp_root}/sens_idx"
    build_annotated_index(
        spark, spark.createDataFrame(pdf), root,
        {"word": "word", "word_s": "word_s"}, block_size=4,
    )
    return AnnotatedCorpus(spark, root)


def spans(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


def test_alignment_contract():
    # lower ∘ tokenize_sensitive == tokenize, position by position
    for t in TEXTS:
        assert [w.lower() for w in tokenize_sensitive(t)] == tokenize(t)


def test_sensitive_exact_case(scorp):
    assert spans(scorp.find_cql('[word_s="Fox"]')) == [(1, 7, 8)]
    assert spans(scorp.find_cql('[word_s="fox"]')) == [(0, 3, 4), (1, 4, 5)]
    assert spans(scorp.find_cql('[word_s="FOX"]')) == [(1, 1, 2)]


def test_sensitivity_flag_routes_to_s_layer(scorp):
    assert spans(scorp.find_cql('[word="(?-i)FOX"]')) == [(1, 1, 2)]
    assert spans(scorp.find_cql('[word="(?c)Fox"]')) == [(1, 7, 8)]


def test_insensitive_literal_is_desensitized(scorp):
    # reference desensitizes the search string for @i fields
    got = spans(scorp.find_cql('[word="Fox"]'))
    assert got == [(0, 3, 4), (1, 1, 2), (1, 4, 5), (1, 7, 8)]
    assert got == spans(scorp.find_cql('"FOX"'))


def test_sensitive_regex_is_case_exact(scorp):
    assert spans(scorp.find_cql('[word_s="F.x"]')) == [(1, 7, 8)]
    assert spans(scorp.find_cql('[word_s="(F|f)ox"]')) == [
        (0, 3, 4), (1, 4, 5), (1, 7, 8)
    ]


def test_sensitive_phrase(scorp):
    assert spans(scorp.find_cql('[word_s="THE"] [word_s="FOX"]')) == [(1, 0, 2)]


def test_flag_without_s_layer_raises(scorp):
    with pytest.raises(ValueError, match="lemma_s"):
        # lemma_s was never indexed
        scorp.find_cql('[lemma="(?-i)x"]')
