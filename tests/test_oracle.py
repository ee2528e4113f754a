"""Oracle known-answer tests on the FIXTURES.md §2 micro-corpus.

Mirrors the reference's TestSearches-over-TestIndex approach
(/root/reference/core/src/test/java/nl/inl/blacklab/search/TestSearches.java)."""

import math

import numpy as np
import pytest

from blacklab_spark import scoring
from blacklab_spark.datagen import fixture_corpus
from blacklab_spark.oracle import (
    build_oracle_index,
    phrase_freqs,
    topk_or,
    topk_phrase,
    topk_term,
)
from blacklab_spark.tokenizer import tokenize


@pytest.fixture(scope="module")
def idx():
    pdf = fixture_corpus()
    docs = list(zip(range(len(pdf)), pdf["text"].tolist()))
    return build_oracle_index(docs)


def test_corpus_stats(idx):
    assert idx.n_docs == 6
    # doc lengths: 9, 12, 12, 10, 0, 9
    assert [idx.dl[i] for i in range(6)] == [9, 12, 12, 10, 0, 9]
    assert idx.total_tokens == 52
    assert idx.avgdl == 52 / 6


def test_df_tf(idx):
    assert idx.df("the") == 4
    assert idx.df("fox") == 2
    assert idx.df("aap") == 1
    assert idx.postings["aap"][1] == 5
    assert idx.postings["the"][0] == 2
    assert idx.df("zzzabsent") == 0


def test_idf_formula(idx):
    # hand-computed Lucene 9 idf
    assert scoring.idf(6, 2) == math.log(1 + (6 - 2 + 0.5) / (2 + 0.5))


def test_term_scores_exact(idx):
    # fox: df=2, docs 0 and 5, tf=1, dl=9
    w = scoring.idf(6, 2)
    expected = w * 1.0 / (1.0 + 1.2 * (1 - 0.75 + 0.75 * 9.0 / (52 / 6)))
    top = topk_term(idx, "fox", 10)
    assert [d for d, _ in top] == [0, 5]  # tie broken by doc_id asc
    assert top[0][1] == pytest.approx(expected, rel=0, abs=0)
    assert top[0][1] == top[1][1]


def test_topk_k_edges(idx):
    assert topk_term(idx, "aap", 1) == topk_term(idx, "aap", 1000)[:1]
    assert len(topk_term(idx, "aap", 1000)) == 1
    assert topk_term(idx, "zzzabsent", 10) == []


def test_or_scores_sum(idx):
    # quick fox: same docs; score = s(quick)+s(fox)
    t_quick = dict(topk_term(idx, "quick", 10))
    t_fox = dict(topk_term(idx, "fox", 10))
    both = topk_or(idx, ["quick", "fox"], 10)
    for d, s in both:
        assert s == np.float64(t_fox[d]) + np.float64(t_quick[d])  # quick>fox? term-asc order: fox then quick
    # order of docs: tie → doc_id asc
    assert [d for d, _ in both] == [0, 5]


def test_phrase(idx):
    assert phrase_freqs(idx, ["quick", "brown"]) == {0: 1, 5: 1}
    assert phrase_freqs(idx, ["the", "lazy", "dog"]) == {0: 1, 5: 1}
    assert phrase_freqs(idx, ["may", "the", "force"]) == {2: 2}
    assert phrase_freqs(idx, ["dog", "quick"]) == {}
    top = topk_phrase(idx, ["may", "the", "force"], 10)
    assert [d for d, _ in top] == [2]
    idf_sum = scoring.idf(6, 1) + scoring.idf(6, 4) + scoring.idf(6, 1)
    expected = idf_sum * 2.0 / (2.0 + 1.2 * (1 - 0.75 + 0.75 * 12.0 / (52 / 6)))
    assert top[0][1] == pytest.approx(expected, rel=1e-15)


def test_tokenizer_contract():
    assert tokenize("The quick-brown FOX!") == ["the", "quick", "brown", "fox"]
    assert tokenize("don't stop 123abc") == ["don't", "stop", "123abc"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("''weird '' 'a") == ["weird", "a"]
