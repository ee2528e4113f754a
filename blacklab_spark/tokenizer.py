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


# --- case-SENSITIVE variant (the reference's @s sensitivity) -----------------
# BlackLab indexes each annotation at up to four sensitivities as separate
# Lucene fields (MatchSensitivity.java:14-17; field naming `contents%word@s`,
# doc/technical/index-formats/integrated.md:19-31). Here the sensitive layer
# is a SECOND index layer (`<annot>_s`) built from case-preserving tokens.
#
# Position-alignment contract: sensitive tokens are matched on the RAW text
# with the case-insensitive ASCII pattern, so for any text whose lower() maps
# ASCII letters to ASCII letters (all ASCII text; virtually all real text)
# lower(tokenize_sensitive(t)) == tokenize(t) position by position. Exotic
# one-to-many lowercasings (U+0130, U+212A) can break alignment — derive the
# insensitive layer from the sensitive one (transform(.., lower)) when both
# are indexed together, as build examples and the driver entry do.

TOKEN_PATTERN_SENSITIVE = r"[A-Za-z0-9]+(?:'[A-Za-z0-9]+)?"
TOKEN_RE_SENSITIVE = re.compile(TOKEN_PATTERN_SENSITIVE)
TOKEN_PATTERN_SENSITIVE_SQL = "[A-Za-z0-9]+(?:''[A-Za-z0-9]+)?"


def tokenize_sensitive(text: str) -> list[str]:
    """Scalar case-preserving tokenizer (oracle / tests)."""
    if text is None:
        return []
    return TOKEN_RE_SENSITIVE.findall(text)


def tokenize_sensitive_series(texts: pd.Series) -> pd.Series:
    """Vectorized case-preserving tokenizer."""
    return texts.fillna("").str.findall(TOKEN_RE_SENSITIVE)
