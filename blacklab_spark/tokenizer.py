"""Tokenizer — deterministic, locale-independent, vectorized.

Contract (FIXTURES.md §3): lowercase, then findall r"[a-z0-9]+(?:'[a-z0-9]+)?".
ASCII fold only; term order is plain byte order (we deliberately avoid the
reference's ICU collators — /root/reference/engine/src/main/java/nl/inl/blacklab/
forwardindex/Collators.java:3-67 — to keep parity trivially deterministic).

The reference's analog is its analyzer chain (BLDutchTokenizer / DesensitizeFilter,
/root/reference/engine/src/main/java/nl/inl/blacklab/analysis/BLDutchTokenizer.java:6-15).
Both engine and oracle import THIS function; tests assert per-turn token equality.

The vectorized path (`tokenize_series`) is a pandas str-method pipeline used
inside an Arrow-batched pandas UDF — no per-row Python in the Spark hot path.
"""

from __future__ import annotations

import re

import pandas as pd

TOKEN_PATTERN = r"[a-z0-9]+(?:'[a-z0-9]+)?"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# The same pattern as an ANSI/DuckDB-compatible regex literal (single quotes doubled).
TOKEN_PATTERN_SQL = "[a-z0-9]+(?:''[a-z0-9]+)?"


def tokenize(text: str) -> list[str]:
    """Scalar tokenizer (oracle / tests)."""
    if text is None:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: pd.Series[str] -> pd.Series[list[str]]."""
    return texts.fillna("").str.lower().str.findall(TOKEN_RE)
