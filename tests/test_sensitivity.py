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


# --------------------- round 4: Unicode + 4-level sensitivity ----------------

UNI_TEXTS = [
    "Het Café aan de gracht",            # doc 0
    "een cafe zonder accenten",          # doc 1
    "CAFÉ in kapitalen, één café",       # doc 2
    "Müller's muller-molen",             # doc 3
]


@pytest.fixture(scope="module")
def ucorp(spark, tmp_root):
    from blacklab_spark.annotated import build_sensitivity_index

    rows = [
        ("conv-u", i, tokenize_sensitive(t)) for i, t in enumerate(UNI_TEXTS)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "word_s"])
    root = f"{tmp_root}/uni_sens_idx"
    build_sensitivity_index(
        spark, spark.createDataFrame(pdf), root, block_size=4,
    )
    return AnnotatedCorpus(spark, root)


def test_unicode_tokenize_keeps_diacritics():
    assert tokenize("Café") == ["café"]
    assert tokenize("café, cafe; CAFÉ") == ["café", "cafe", "café"]
    assert tokenize_sensitive("Müller's Café") == ["Müller's", "Café"]


def test_insensitive_level_folds_case_and_accents(ucorp):
    # i-level: Café == cafe == CAFÉ == café
    assert spans(ucorp.find_cql('[word="cafe"]')) == [
        (0, 1, 2), (1, 1, 2), (2, 0, 1), (2, 4, 5)
    ]
    # pattern WITH accents also folds before matching the folded layer
    assert spans(ucorp.find_cql('[word="café"]')) == [
        (0, 1, 2), (1, 1, 2), (2, 0, 1), (2, 4, 5)
    ]
    assert spans(ucorp.find_cql('[word="Café"]')) == [
        (0, 1, 2), (1, 1, 2), (2, 0, 1), (2, 4, 5)
    ]


def test_ci_level_keeps_accents(ucorp):
    # ci: case folds, diacritics distinguish
    assert spans(ucorp.find_cql('[word_ci="café"]')) == [
        (0, 1, 2), (2, 0, 1), (2, 4, 5)
    ]
    assert spans(ucorp.find_cql('[word_ci="cafe"]')) == [(1, 1, 2)]


def test_di_level_keeps_case(ucorp):
    # di: diacritics fold, case distinguishes
    assert spans(ucorp.find_cql('[word_di="Cafe"]')) == [(0, 1, 2)]
    assert spans(ucorp.find_cql('[word_di="Café"]')) == [(0, 1, 2)]
    assert spans(ucorp.find_cql('[word_di="cafe"]')) == [(1, 1, 2), (2, 4, 5)]
    assert spans(ucorp.find_cql('[word_di="CAFE"]')) == [(2, 0, 1)]


def test_s_level_exact(ucorp):
    assert spans(ucorp.find_cql('[word_s="Café"]')) == [(0, 1, 2)]
    assert spans(ucorp.find_cql('[word_s="café"]')) == [(2, 4, 5)]
    assert spans(ucorp.find_cql('[word="(?c)CAFÉ"]')) == [(2, 0, 1)]


def test_insensitive_regex_is_desensitized(ucorp):
    # ADVICE r3: a regex with uppercase on an insensitive layer must not
    # silently match nothing
    assert spans(ucorp.find_cql('[word="Caf.*"]')) == spans(
        ucorp.find_cql('[word="caf.*"]')
    )
    assert len(spans(ucorp.find_cql('[word="Caf.*"]'))) == 4


def test_apostrophe_token(ucorp):
    assert spans(ucorp.find_cql('[word="müller\'s"]')) == [(3, 0, 1)]
    # folded: muller's finds Müller's
    assert spans(ucorp.find_cql('[word="muller\'s"]')) == [(3, 0, 1)]


def test_tri_engine_token_class_agreement_bmp():
    """Python [^\\W_] == RE2 [\\p{L}\\p{N}] over the BMP (exhaustive), minus
    a pinned skew list for codepoints newer Unicode tables added."""
    import re as _re

    import duckdb

    con = duckdb.connect()
    cps = [i for i in range(1, 0x10000) if not (0xD800 <= i <= 0xDFFF)]
    con.execute("CREATE TEMP TABLE cp AS SELECT unnest(?) AS i", [cps])
    duck = dict(
        con.execute(
            "SELECT i, regexp_matches(chr(i), '^[\\p{L}\\p{N}]$') FROM cp"
        ).fetchall()
    )
    py = _re.compile(r"[^\W_]")
    mism = [i for i in cps if bool(py.fullmatch(chr(i))) != bool(duck[i])]
    assert mism == [], f"BMP token-class skew vs RE2: {[hex(i) for i in mism[:10]]}"


def test_fold_map_locked_across_python_and_duckdb():
    import duckdb

    from blacklab_spark.tokenizer import ACCENT_FROM, ACCENT_TO, fold_accents

    con = duckdb.connect()
    got = con.execute(
        "SELECT translate(?, ?, ?)", [ACCENT_FROM, ACCENT_FROM, ACCENT_TO]
    ).fetchone()[0]
    assert got == fold_accents(ACCENT_FROM) == ACCENT_TO


# --------------------- round 5: digraph / ligature folds ---------------------

DG_TEXTS = [
    "het ĳs op de gracht",      # doc 0: ligature ĳ
    "ijs zonder ligatuur",      # doc 1: plain ij
    "die Straße im Dorf",       # doc 2: ß
    "ærlig over het œuvre",     # doc 3: æ / œ
]


@pytest.fixture(scope="module")
def dgcorp(spark, tmp_root):
    from blacklab_spark.annotated import build_sensitivity_index

    rows = [
        ("conv-dg", i, tokenize_sensitive(t)) for i, t in enumerate(DG_TEXTS)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "word_s"])
    root = f"{tmp_root}/dg_sens_idx"
    build_sensitivity_index(spark, spark.createDataFrame(pdf), root, block_size=4)
    return AnnotatedCorpus(spark, root)


def test_digraph_fold_map():
    from blacklab_spark.tokenizer import fold_accents

    assert fold_accents("ĳs") == "ijs"
    assert fold_accents("Straße") == "Strasse"
    assert fold_accents("œuvre") == "oeuvre"
    assert fold_accents("ærlig") == "aerlig"
    assert fold_accents("Łódź") == "Lodz"  # reference's Ł/ł special case
    assert fold_accents("ĲSSELMEER") == "IJSSELMEER"


def test_fold_sql_parity_duckdb_and_spark(spark):
    import duckdb

    from blacklab_spark.tokenizer import fold_accents, fold_sql

    probes = ["ĳs", "Straße", "ærlig œuvre", "Łódź café", "ĲS ẞ Æ Œ", "plain"]
    con = duckdb.connect()
    for p in probes:
        duck = con.execute(
            f"SELECT {fold_sql('x')} FROM (SELECT ? AS x)", [p]
        ).fetchone()[0]
        sp = spark.sql(
            f"SELECT {fold_sql('x')} AS f FROM (SELECT '{p}' AS x)"
        ).first()["f"]
        assert duck == sp == fold_accents(p), p


def test_insensitive_search_crosses_digraph(dgcorp):
    # VERDICT r4 #2: an insensitive search for "ijs" must hit "ĳs" (and the
    # digraph spelling must hit the plain one — the fold is symmetric)
    def docs_of(q):
        return sorted({r["doc_id"] for r in dgcorp.find_cql(q).collect()})

    assert docs_of('[word="ijs"]') == [0, 1]
    assert docs_of('[word="ĳs"]') == [0, 1]
    assert docs_of('[word="strasse"]') == [2]
    assert docs_of('[word="straße"]') == [2]
    assert docs_of('[word="aerlig"]') == [3]
    # di level folds digraphs but keeps case
    assert docs_of('[word_di="ijs"]') == [0, 1]
    # ci level keeps the digraph distinct (case-folded only)
    assert docs_of('[word_ci="ĳs"]') == [0]
    assert docs_of('[word_ci="ijs"]') == [1]


# --------------------- round 6: engine-parity pins ---------------------------


def test_insensitive_series_matches_scalar():
    # VERDICT r5 #6: the vectorized i-level tokenizer must share the scalar's
    # _FULL_FOLD_MAP contract (digraphs included), not the accent-only map
    from blacklab_spark.tokenizer import (
        tokenize_insensitive,
        tokenize_insensitive_series,
    )

    probes = UNI_TEXTS + DG_TEXTS + [
        "ĲSSELMEER strasse Straße œconomie Łódź ÆRLIG",
    ]
    ser = tokenize_insensitive_series(pd.Series(probes))
    for text, toks in zip(probes, ser):
        assert toks == tokenize_insensitive(text), text


def test_expand_pattern_cached_equals_fallback(dgcorp):
    """VERDICT r5 #5: expand_pattern serves from a driver-side pandas cache
    (Python re.fullmatch) when the vocabulary fits and falls back to a
    distributed rlike scan (java.util.regex) above _TD_CACHE_MAX. The probe
    set covers the documented skew classes — \\w/\\d Unicode membership and
    (?i) case folding over accented/digraph codepoints — where Java defaults
    to ASCII semantics unless UNICODE_CHARACTER_CLASS is enabled (the
    fallback's inline (?U))."""
    corp = dgcorp.layers["word_ci"]  # case-folded, digraphs/accents kept
    pats = [
        r"\w+",            # Unicode word chars: ĳs/straße/ærlig/œuvre
        r"stra\we",        # \w must accept ß
        r"\ws",            # \w must accept ĳ
        r"(?i)ĲS",         # case-insensitive fold of a non-ASCII codepoint
        r"[æœ]\w+",        # explicit class + unicode tail
        r".s",             # dot
        r"\d+",            # no digit terms: both must return []
        r"ij.*|ĳ.*",       # alternation
    ]
    cached = {p: corp.expand_pattern(p) for p in pats}
    assert cached[r"\w+"], "probe vocabulary unexpectedly empty"
    assert "straße" in cached[r"stra\we"]
    assert "ĳs" in cached[r"(?i)ĲS"]
    # force the huge-vocabulary path (regex pushed to the Spark scan)
    corp._td_cache = None
    corp._td_too_big = True
    try:
        fallback = {p: corp.expand_pattern(p) for p in pats}
    finally:
        corp._td_too_big = False
        corp.lookup_terms([])  # rebuild the cache for other tests
    assert cached == fallback
