"""Exact single-process oracle — plays the role of BlackLab's golden responses.

The reference pins its integration semantics on committed golden JSON responses
(/root/reference/test/data/saved-responses/, workflow /root/reference/test/README.md:24-27)
with fully-specified sort order for determinism (/root/reference/test/test/hits.js:34,
`sort: "field:pid,hitposition"`). This module is our equivalent: a dict-based
inverted index + the shared scoring module, over the SAME tokenizer, producing
(doc_id, score) lists the Spark engine must match bit-for-bit (float64) with
tie-break (score DESC, doc_id ASC).

Summation order contract: multi-term scores accumulate per-doc in ASCENDING
TERM ORDER (after dedup) — the engine sorts its per-term contribution structs
by term before a left-fold, giving the identical float64 sum.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np

from blacklab_spark import scoring
from blacklab_spark.tokenizer import tokenize


@dataclass
class OracleIndex:
    n_docs: int = 0
    total_tokens: int = 0
    # term -> {doc_id: tf}
    postings: dict = field(default_factory=lambda: defaultdict(dict))
    # term -> {doc_id: [positions]}
    positions: dict = field(default_factory=lambda: defaultdict(dict))
    dl: dict = field(default_factory=dict)  # doc_id -> exact token count

    @property
    def avgdl(self) -> float:
        # float64 division, N includes empty docs (dl=0), same as engine stats
        return float(np.float64(self.total_tokens) / np.float64(self.n_docs))

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: [(doc_id, text)] — doc_ids must already be dense/stable."""
    idx = OracleIndex()
    for doc_id, text in docs:
        toks = tokenize(text)
        idx.n_docs += 1
        idx.total_tokens += len(toks)
        idx.dl[doc_id] = len(toks)
        for pos, t in enumerate(toks):
            idx.postings[t].setdefault(doc_id, 0)
            idx.postings[t][doc_id] += 1
            idx.positions[t].setdefault(doc_id, []).append(pos)
    return idx


def _term_scores(idx: OracleIndex, term: str) -> dict[int, np.float64]:
    df = idx.df(term)
    if df == 0:
        return {}
    w = scoring.idf(idx.n_docs, df)
    avgdl = idx.avgdl
    out = {}
    for doc_id, tf in idx.postings[term].items():
        out[doc_id] = np.float64(scoring.bm25(tf, idx.dl[doc_id], avgdl, w))
    return out


def topk_or(idx: OracleIndex, terms: list[str], k: int) -> list[tuple[int, float]]:
    """Multi-term OR (BooleanQuery SHOULD): sum per-term BM25, term-asc order."""
    uniq = sorted(set(terms))
    acc: dict[int, np.float64] = {}
    for t in uniq:  # ascending term order => fixed summation order
        for doc_id, s in _term_scores(idx, t).items():
            acc[doc_id] = acc.get(doc_id, np.float64(0.0)) + s
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]


def topk_term(idx: OracleIndex, term: str, k: int) -> list[tuple[int, float]]:
    return topk_or(idx, [term], k)


def topk_and(idx: OracleIndex, terms: list[str], k: int) -> list[tuple[int, float]]:
    """Conjunctive BooleanQuery (all MUST): docs containing every term."""
    uniq = sorted(set(terms))
    if not uniq or any(idx.df(t) == 0 for t in uniq):
        return []
    docs = set(idx.postings[uniq[0]])
    for t in uniq[1:]:
        docs &= set(idx.postings[t])
    acc: dict[int, np.float64] = {}
    for t in uniq:  # same ascending-term summation order as topk_or
        for doc_id, s in _term_scores(idx, t).items():
            if doc_id in docs:
                acc[doc_id] = acc.get(doc_id, np.float64(0.0)) + s
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]


def topk_and_groups(
    idx: OracleIndex, groups: list[list[str]], k: int
) -> list[tuple[int, float]]:
    """Conjunction of OR-groups (a BooleanQuery whose MUST clauses are
    multi-term expansions): doc must match ≥1 term of every group; score sums
    every (group, matched-term) contribution in (group, term-asc) order."""
    resolved = [sorted({t for t in g if idx.df(t) > 0}) for g in groups]
    if not resolved or any(not g for g in resolved):
        return []
    docsets = [
        set().union(*(set(idx.postings[t]) for t in g)) for g in resolved
    ]
    docs = set.intersection(*docsets)
    acc: dict[int, np.float64] = {}
    for g in resolved:  # group order, then ascending term within the group
        for t in g:
            for doc_id, s in _term_scores(idx, t).items():
                if doc_id in docs:
                    acc[doc_id] = acc.get(doc_id, np.float64(0.0)) + s
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]


def phrase_freqs(idx: OracleIndex, terms: list[str]) -> dict[int, int]:
    """Exact adjacent-phrase frequency per doc (positions intersect, gap=1)."""
    if not terms:
        return {}
    first = idx.positions.get(terms[0], {})
    out: dict[int, int] = {}
    for doc_id, pos0 in first.items():
        cand = set(pos0)
        ok = True
        for i, t in enumerate(terms[1:], start=1):
            plist = idx.positions.get(t, {}).get(doc_id)
            if not plist:
                ok = False
                break
            nxt = set(p - i for p in plist)
            cand &= nxt
            if not cand:
                ok = False
                break
        if ok and cand:
            out[doc_id] = len(cand)
    return out


def topk_phrase(idx: OracleIndex, terms: list[str], k: int) -> list[tuple[int, float]]:
    """Lucene PhraseQuery scoring: idf = sum of member idfs (duplicates kept),
    tf = phrase frequency, same BM25 saturation with exact dl."""
    freqs = phrase_freqs(idx, terms)
    if not freqs:
        return []
    idf_sum = np.float64(0.0)
    for t in terms:  # Lucene sums idf per phrase position, duplicates included
        df = idx.df(t)
        if df == 0:
            return []
        idf_sum += np.float64(scoring.idf(idx.n_docs, df))
    avgdl = idx.avgdl
    acc = {}
    for doc_id, tf in freqs.items():
        acc[doc_id] = float(scoring.bm25(tf, idx.dl[doc_id], avgdl, float(idf_sum)))
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def term_frequencies(idx: OracleIndex) -> list[tuple[str, int, int]]:
    """(term, df, cf) sorted by term — BlackLab's TermFrequencyList analog."""
    return sorted((t, len(p), sum(p.values())) for t, p in idx.postings.items())
