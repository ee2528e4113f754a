"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Every operator is a closed-form DataFrame expression (JVM codegen, no
Python) with arithmetic simple enough to replicate in any SQL engine —
that is the oracle contract for the driver's DuckDB comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blacklab_spark.tokenizer import TOKEN_PATTERN_JAVA

# marker-word lists for the n-gram language heuristic (deterministic toy
# lists — the point is the Spark plumbing, not linguistic accuracy)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit"],
    "es": ["el", "la", "los", "es", "con"],
    "fr": ["le", "la", "les", "est", "avec"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]


def _tokens(text_col):
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN_JAVA), 0)


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_re_tokens, n_chars): whitespace split vs the
    engine tokenizer regex — the two standard token-count estimators."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.size(_tokens(F.col(text_col))).alias("n_re_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, stopword_ratio, mean_token_len, alnum_ratio, quality):
    classic cheap quality heuristics; quality is a fixed linear blend."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    out = df.select(
        F.col(id_col).alias("id"),
        F.when(n > 0, stops / n).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(n > 0, tok_chars / n).otherwise(F.lit(0.0)).alias("mean_token_len"),
        F.when(F.length(text_col) > 0, alnum / F.length(text_col))
        .otherwise(F.lit(0.0))
        .alias("alnum_ratio"),
    )
    return out.withColumn(
        "quality",
        F.round(
            0.4 * F.col("alnum_ratio")
            + 0.3 * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
            + 0.3 * F.least(F.col("mean_token_len") / 8, F.lit(1.0)),
            6,
        ),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, lang_pred, lang_score): argmax of marker-word hit counts, ties
    broken by language code — a deterministic n-gram heuristic."""
    toks = _tokens(F.col(text_col))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(F.col(id_col).alias("id"), *scores)
    langs = sorted(LANG_MARKERS)
    structs = F.array(
        *[
            F.struct(
                F.col(f"score_{l}").alias("s"),
                F.lit(len(langs) - i).alias("pref"),  # earlier lang wins ties
                F.lit(l).alias("lang"),
            )
            for i, l in enumerate(langs)
        ]
    )
    best = F.array_max(structs)
    return scored.select(
        "id", best["lang"].alias("lang_pred"), best["s"].alias("lang_score")
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, fp): order-aware rolling document fingerprint —
    fp = sum over tokens of md5int32(token) * (pos mod 64 + 1), mod 2^61.
    Position-weighted so permuted docs differ; md5-based so any engine
    reproduces it."""
    toks = _tokens(F.col(text_col))
    pairs = df.select(
        F.col(id_col).alias("id"), F.posexplode_outer(toks).alias("pos", "tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    contrib = (h * ((F.col("pos") % 64) + 1)) % F.lit(2305843009213693951)
    return (
        pairs.groupBy("id")
        .agg(
            F.coalesce(
                F.sum(contrib) % F.lit(2305843009213693951), F.lit(0)
            ).alias("fp")
        )
    )
