"""Mini query language — the front-end compiler stage.

A deliberately small analog of the reference's BCQL parser
(/root/reference/query-parser/src/main/javacc/nl/inl/blacklab/queryParser/
corpusql/cql.jj): query string → typed AST → (in Corpus) DataFrame plan.

Grammar:
    query   := phrase | terms
    phrase  := '"' word+ '"'          exact adjacent sequence
    terms   := atom+                  OR semantics (BooleanQuery SHOULD)
    atom    := /regex/ | word[*]      regex/wildcard expand via term_dict
                                      (the TextPatternRegex rewrite,
                                      /root/reference/engine/src/main/java/nl/
                                      inl/blacklab/search/textpattern/
                                      TextPatternRegex.java)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from blacklab_spark.tokenizer import tokenize


@dataclass(frozen=True)
class TermAtom:
    pattern: str
    regex: bool = False


@dataclass(frozen=True)
class OrQuery:
    terms: list[TermAtom]


@dataclass(frozen=True)
class AndQuery:
    terms: list[TermAtom]


@dataclass(frozen=True)
class PhraseQuery:
    terms: list[str]


def parse_query(query: str) -> OrQuery | AndQuery | PhraseQuery:
    q = query.strip()
    if len(q) >= 2 and q.startswith('"') and q.endswith('"'):
        return PhraseQuery(tokenize(q[1:-1]))
    atoms: list[TermAtom] = []
    conjunctive = False
    for part in q.split():
        if part.startswith("+") and len(part) > 1:  # +term → MUST clause
            conjunctive = True
            part = part[1:]
        if len(part) >= 2 and part.startswith("/") and part.endswith("/"):
            atoms.append(TermAtom(part[1:-1], regex=True))
        elif part.endswith("*") and len(part) > 1:
            # wildcard prefix → regex (BLSpanMultiTermQueryWrapper analog);
            # expand_pattern anchors the whole-term match
            atoms.append(TermAtom(re.escape(part[:-1]) + ".*", regex=True))
        else:
            toks = tokenize(part)
            atoms.extend(TermAtom(t) for t in toks)
    return AndQuery(atoms) if conjunctive else OrQuery(atoms)
