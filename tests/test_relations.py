"""Dependency relations — the reference's SpanQueryRelations / `-reltype->`
grammar (engine/.../lucene/SpanQueryRelations.java; cql.jj:288-352), here a
columnar relations table + (doc_id, position)-keyed joins.

Fixture (UD-ish): heads are 1-based, 0 = root.
  doc 0: the0 dogs1 bark2     det(dogs→the) nsubj(bark→dogs) root(bark)
  doc 1: a0 dog1 barked2 loudly3   det nsubj root advmod(barked→loudly)
"""

import pytest

from blacklab_spark.annotated import (
    AnnotatedCorpus,
    build_annotated_index,
    build_relations,
)
from blacklab_spark.sources.readers import read_conllu_annotated

CONLLU = """1\tThe\tthe\tDET\t_\t_\t2\tdet\t_\t_
2\tdogs\tdog\tNOUN\t_\t_\t3\tnsubj\t_\t_
3\tbark\tbark\tVERB\t_\t_\t0\troot\t_\t_

1\tA\ta\tDET\t_\t_\t2\tdet\t_\t_
2\tdog\tdog\tNOUN\t_\t_\t3\tnsubj\t_\t_
3\tbarked\tbark\tVERB\t_\t_\t0\troot\t_\t_
4\tloudly\tloudly\tADV\t_\t_\t3\tadvmod\t_\t_
"""


@pytest.fixture(scope="module")
def rcorp(spark, tmp_root, tmp_path_factory):
    d = tmp_path_factory.mktemp("conllu_rel")
    (d / "r.conllu").write_text(CONLLU)
    frame = read_conllu_annotated(spark, str(d / "r.conllu"))
    root = f"{tmp_root}/rel_idx"
    build_annotated_index(
        spark, frame, root,
        {"word": "word", "lemma": "lemma", "pos": "pos"}, block_size=4,
    )
    build_relations(spark, frame, root)
    return AnnotatedCorpus(spark, root)


def spans(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


def test_relations_table(rcorp):
    rels = {
        (r["doc_id"], r["rel_type"], r["src_start"], r["tgt_start"])
        for r in rcorp.relations.collect()
    }
    assert (0, "det", 1, 0) in rels
    assert (0, "nsubj", 2, 1) in rels
    assert (0, "root", -1, 2) in rels
    assert (1, "advmod", 2, 3) in rels
    assert len(rels) == 7


def test_rel_find_type_and_modes(rcorp):
    assert spans(rcorp.rel_find("det")) == [(0, 0, 2), (1, 0, 2)]
    assert spans(rcorp.rel_find("det", span_mode="target")) == [
        (0, 0, 1), (1, 0, 1)
    ]
    assert spans(rcorp.rel_find("det", span_mode="source")) == [
        (0, 1, 2), (1, 1, 2)
    ]
    # regex over types
    assert spans(rcorp.rel_find("det|advmod")) == [
        (0, 0, 2), (1, 0, 2), (1, 2, 4)
    ]


def test_rel_directions(rcorp):
    # forward: target after source → only advmod
    assert spans(rcorp.rel_find(".*", direction="forward")) == [(1, 2, 4)]
    # root: relations without a source (span = target)
    assert spans(rcorp.rel_find(".*", direction="root")) == [
        (0, 2, 3), (1, 2, 3)
    ]
    # backward: det + nsubj in both docs
    assert len(spans(rcorp.rel_find(".*", direction="backward"))) == 4


def test_rel_capture_columns(rcorp):
    r = rcorp.rel_find("nsubj").orderBy("doc_id").first()
    assert (r["c_source_s"], r["c_source_e"]) == (2, 3)
    assert (r["c_target_s"], r["c_target_e"]) == (1, 2)


def test_rel_cql_grammar(rcorp):
    # A -rel-> B: A matches the SOURCE span, B the TARGET span
    assert spans(rcorp.find_cql('[pos="verb"] -nsubj-> [pos="noun"]')) == [
        (0, 1, 3), (1, 1, 3)
    ]
    # wildcard sides via []
    assert spans(rcorp.find_cql('[] -det-> "the"')) == [(0, 0, 2)]
    assert spans(rcorp.find_cql('[] --> []')) == spans(rcorp.rel_find(".*"))
    # root relation query
    assert spans(rcorp.find_cql('^--> []')) == [(0, 2, 3), (1, 2, 3)]
    # composes with the rest of the algebra (within)
    got = spans(rcorp.find_cql('([] -det-> []) within ("a" "dog")'))
    assert got == [(1, 0, 2)]


def test_rel_query_without_relations_table_raises(spark, tmp_root):
    import pandas as pd

    from blacklab_spark.build import build_index
    from blacklab_spark.corpus import Corpus

    path = f"{tmp_root}/norel_idx"
    pdf = pd.DataFrame({
        "conv_id": ["c"], "turn_idx": [0], "text": ["a b c"],
    })
    build_index(spark, spark.createDataFrame(pdf), path, block_size=4)
    with pytest.raises(ValueError, match="relations"):
        Corpus(spark, path).find_cql('[] --> []')


def test_rspan_grammar_modes(rcorp):
    # rspan(A -rel-> B, 'mode') — RelationInfo.SpanMode via the BCQL surface
    # (cql.jj relation functions; previously API-only, r4 grammar support)
    full = spans(rcorp.find_cql("rspan([] -det-> [], 'full')"))
    assert full == spans(rcorp.rel_find("det", span_mode="full"))
    src = spans(rcorp.find_cql("rspan([] -det-> [], 'source')"))
    assert src == spans(rcorp.rel_find("det", span_mode="source"))
    tgt = spans(rcorp.find_cql("rspan([] -det-> [], target)"))  # bare ident ok
    assert tgt == spans(rcorp.rel_find("det", span_mode="target"))
    # 'all' covers source+target+match envelope
    al = spans(rcorp.find_cql("rspan([] -nsubj-> [], 'all')"))
    assert al == spans(
        __import__("blacklab_spark.operators.relations",
                   fromlist=["rspan_all"]).rspan_all(rcorp.rel_find("nsubj"))
    )


def test_rspan_requires_relation_match(rcorp):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rspan"):
        rcorp.find_cql("rspan([word=\"the\"], 'full')")


# ------------------- parallel corpora (cross-field alignment) ---------------

@pytest.fixture(scope="module")
def pcorp(spark, tmp_root):
    """Two-version parallel fixture (plan-parallel.md): field `word` = nl,
    field `word__de` = de, word alignments nl→de with one reorder and one
    unaligned token."""
    import pandas as pd

    from blacklab_spark.annotated import (
        AnnotatedCorpus,
        build_alignments,
        build_annotated_index,
    )

    nl = [
        ["als", "kat", "en", "hond"],
        ["de", "kat", "slaapt"],
        ["als", "muis", "en", "kat"],
    ]
    de = [
        ["wie", "katze", "und", "hund"],
        ["die", "katze", "schläft"],
        ["wie", "maus", "und", "katze"],
    ]
    rows = [
        ("conv-p", i, a, b) for i, (a, b) in enumerate(zip(nl, de))
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "word", "word__de"])
    root = f"{tmp_root}/par_idx"
    build_annotated_index(
        spark, spark.createDataFrame(pdf), root,
        {"word": "word", "word__de": "word__de"}, block_size=4,
    )
    # 1:1 positional word alignments nl→de
    al = [
        (d, "al", i, i + 1, "de", i, i + 1)
        for d in range(3) for i in range(len(nl[d]))
    ]
    apdf = pd.DataFrame(al, columns=[
        "doc_id", "rel_type", "src_start", "src_end",
        "tgt_field", "tgt_start", "tgt_end",
    ])
    build_alignments(spark, spark.createDataFrame(apdf), root)
    return AnnotatedCorpus(spark, root)


def test_alignment_operator_envelope(pcorp):
    # 'als [] en []' in nl, aligned envelope in de
    out = pcorp.find_cql('"als" [] "en" [] ==>de _').collect()
    got = {(r["doc_id"], r["start"], r["end"],
            r["c_target_s"], r["c_target_e"], r["n_rels"]) for r in out}
    assert got == {(0, 0, 4, 0, 4, 4), (2, 0, 4, 0, 4, 4)}


def test_alignment_operator_with_target_filter(pcorp):
    # right side must CONTAIN the de query: only doc 0 has 'hund'
    out = pcorp.find_cql('"als" [] "en" [] ==>de "wie" [] "und" "hund"').collect()
    assert {(r["doc_id"], r["start"], r["end"]) for r in out} == {(0, 0, 4)}
    # de-side single word filter
    out2 = pcorp.find_cql('"kat" ==>de "katze"').collect()
    assert {(r["doc_id"], r["start"], r["end"]) for r in out2} == {
        (0, 1, 2), (1, 1, 2), (2, 3, 4)
    }
    # a de-side filter that the envelope can NOT contain
    assert pcorp.find_cql('"kat" ==>de "hund"').count() == 0


def test_alignment_rel_type_and_errors(pcorp):
    # rel-type filter that matches nothing
    assert pcorp.find_cql('"kat" =xx=>de _').count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="target version"):
        pcorp.find_cql('"kat" ==> _')
    with _pytest.raises(ValueError, match="version"):
        pcorp.find_cql('"kat" ==>fr "chat"')


def test_alignment_api_direct(pcorp):
    src = pcorp.layers["word"].spans_term("kat")
    out = pcorp.align_find(src, "de").collect()
    assert all(r["n_rels"] == 1 for r in out)
    assert len(out) == 3  # kat in docs 0,1,2


# ---------------- property fuzz: rel_spans vs naive evaluator ---------------

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_arc = st.tuples(
    st.integers(0, 2),                            # doc
    st.sampled_from(["nsubj", "obj", "det"]),     # type
    st.integers(-1, 5),                           # src_start (-1 = root)
    st.integers(0, 5),                            # tgt_start
)
_arcs = st.lists(_arc, min_size=0, max_size=12)


def _naive_rel_spans(rows, rel_type, direction, span_mode):
    import re as _re

    pat = _re.compile(f"^(?:{rel_type})$")
    out = set()
    for d, t, ss, se, ts, te in rows:
        if not pat.fullmatch(t):
            continue
        if direction == "root" and ss != -1:
            continue
        if direction == "forward" and not (ss != -1 and ts > ss):
            continue
        if direction == "backward" and not (ss != -1 and ts < ss):
            continue
        if span_mode == "source":
            if ss == -1:
                continue
            s, e = ss, se
        elif span_mode == "target":
            s, e = ts, te
        else:  # full envelope; root = target span
            if ss == -1:
                s, e = ts, te
            else:
                s, e = min(ss, ts), max(se, te)
        out.add((d, s, e))
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    arcs=_arcs,
    rt=st.sampled_from(["nsubj", "obj|det", ".*", "n.*"]),
    direction=st.sampled_from(["both", "forward", "backward", "root"]),
    mode=st.sampled_from(["full", "target", "source"]),
)
def test_rel_spans_fuzz(spark, arcs, rt, direction, mode):
    from blacklab_spark.operators.relations import rel_spans

    assume(not (mode == "source" and direction == "root"))
    rows = [
        (d, t, s, s + 1 if s >= 0 else -1, g, g + 1) for d, t, s, g in arcs
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, rel_type string, src_start int, src_end int, "
        "tgt_start int, tgt_end int",
    )
    got = {
        (r["doc_id"], r["start"], r["end"])
        for r in rel_spans(df, rt, direction, mode).collect()
    }
    assert got == _naive_rel_spans(rows, rt, direction, mode), (
        rt, direction, mode
    )


def test_rcapture_relations_within(rcorp):
    # rcapture(q, label, type) — XFRelations.rcapture: every type-matching
    # relation whose envelope lies within the hit, captured as a sorted
    # string list; hits keep their extent and hits without relations keep
    # an empty capture (SpanQueryCaptureRelationsWithinSpan semantics)
    rows = {
        (r["doc_id"], r["start"], r["end"]): list(r["c_r"])
        for r in rcorp.find_cql("rcapture([pos=\"verb\"], 'r', 'root')").collect()
    }
    assert rows == {
        (0, 2, 3): ["root:-1--1>2-3"],
        (1, 2, 3): ["root:-1--1>2-3"],
    }
    full = {
        (r["doc_id"], r["start"], r["end"]): list(r["c_captured_rels"])
        for r in rcorp.find_cql('rcapture("the" "dogs" "bark")').collect()
    }
    assert full == {
        (0, 0, 3): ["det:1-2>0-1", "nsubj:2-3>1-2", "root:-1--1>2-3"],
    }
    # type-filter regex + empty capture retention
    g = {
        (r["doc_id"], r["start"], r["end"]): list(r["c_r"])
        for r in rcorp.find_cql(
            'rcapture([]{2,2}, \'r\', "det|nsubj")'
        ).collect()
    }
    assert g[(1, 2, 4)] == []          # advmod filtered out, hit kept
    assert g[(0, 0, 2)] == ["det:1-2>0-1"]
    assert g[(0, 1, 3)] == ["nsubj:2-3>1-2"]


def test_rel_function(rcorp):
    # rel('type'[, target[, 'mode'[, 'direction']]]) — XFRelations.rel with
    # the reference's defaults (span mode 'source'); must agree with the
    # rel_find API and the -type-> operator
    assert spans(rcorp.find_cql("rel('det', _, 'full')")) == spans(
        rcorp.rel_find("det")
    )
    assert spans(rcorp.find_cql("rel('det')")) == spans(
        rcorp.rel_find("det", span_mode="source")
    )
    assert spans(rcorp.find_cql("rel('det', \"the\", 'full')")) == [(0, 0, 2)]
    assert spans(rcorp.find_cql("rel('.*', _, 'target', 'root')")) == spans(
        rcorp.rel_find(".*", direction="root", span_mode="target")
    )
    with pytest.raises(ValueError, match="span mode"):
        rcorp.find_cql("rel('det', _, 'sideways')")


def test_alignment_hits_property_fuzz(spark):
    # property fuzz for the `==>` operator (closing the r4 deferred fuzz
    # gap): random alignment tables + random source/target span sets vs a
    # naive Python evaluation of the contract — source-within-hit, target
    # ENVELOPE, optional envelope-contains-target filter
    import random

    from blacklab_spark.operators.relations import ALIGN_COLS, alignment_hits

    rng = random.Random(20260817)
    for trial in range(6):
        n_docs = rng.randint(1, 4)
        als = []
        for _ in range(rng.randint(3, 18)):
            d = rng.randrange(n_docs)
            ss = rng.randrange(8)
            se = ss + rng.randint(1, 3)
            ts = rng.randrange(8)
            te = ts + rng.randint(1, 3)
            als.append((d, rng.choice(["al", "xx"]), ss, se,
                        rng.choice(["de", "fr"]), ts, te))
        spans_l = sorted({
            (rng.randrange(n_docs), s, s + w)
            for s, w in [(rng.randrange(7), rng.randint(1, 4))
                         for _ in range(rng.randint(2, 8))]
        })
        tgt_l = sorted({
            (rng.randrange(n_docs), s, s + w)
            for s, w in [(rng.randrange(9), rng.randint(1, 3))
                         for _ in range(rng.randint(1, 5))]
        })
        al_df = spark.createDataFrame(als, ALIGN_COLS)
        src_df = spark.createDataFrame(spans_l, "doc_id long, start int, end int")
        tgt_df = spark.createDataFrame(tgt_l, "doc_id long, start int, end int")

        def naive(with_tgt):
            out = {}
            for (d, s, e) in spans_l:
                rels = [a for a in als
                        if a[0] == d and a[1] == "al" and a[4] == "de"
                        and a[2] >= s and a[3] <= e]
                if not rels:
                    continue
                env = (min(r[5] for r in rels), max(r[6] for r in rels))
                if with_tgt and not any(
                    td == d and ts >= env[0] and te <= env[1]
                    for (td, ts, te) in tgt_l
                ):
                    continue
                out[(d, s, e)] = (env[0], env[1], len(rels))
            return out

        for with_tgt in (False, True):
            got = {
                (r["doc_id"], r["start"], r["end"]):
                    (r["c_target_s"], r["c_target_e"], r["n_rels"])
                for r in alignment_hits(
                    al_df, src_df, "de", "al",
                    tgt_df if with_tgt else None,
                ).collect()
            }
            assert got == naive(with_tgt), (trial, with_tgt)


def test_capture_preserves_duplicate_hits(spark):
    # ADVICE r5: same-extent hits reached via different match paths are
    # distinct Hits in the reference — rcapture/with-spans must not collapse
    # them (previously dropDuplicates before the capture join did)
    from blacklab_spark.operators.relations import capture_relations_within
    from blacklab_spark.operators.spans import capture_overlapping_spans

    hits = spark.createDataFrame(
        [(0, 0, 3), (0, 0, 3), (0, 5, 6)],
        "doc_id long, start int, end int",
    )
    rels = spark.createDataFrame(
        [(0, "det", 1, 2, 0, 1)],
        "doc_id long, rel_type string, src_start int, src_end int, "
        "tgt_start int, tgt_end int",
    )
    out = capture_relations_within(hits, rels, "r").collect()
    assert len(out) == 3
    caps = sorted((r["doc_id"], r["start"], r["end"], tuple(r["c_r"])) for r in out)
    assert caps == [
        (0, 0, 3, ("det:1-2>0-1",)),
        (0, 0, 3, ("det:1-2>0-1",)),
        (0, 5, 6, ()),
    ]

    others = spark.createDataFrame([(0, 2, 4)], "doc_id long, start int, end int")
    out2 = capture_overlapping_spans(hits, others, "w").collect()
    assert len(out2) == 3
    caps2 = sorted((r["doc_id"], r["start"], r["end"], tuple(r["c_w"])) for r in out2)
    assert caps2 == [
        (0, 0, 3, ("2-4",)),
        (0, 0, 3, ("2-4",)),
        (0, 5, 6, ()),
    ]


def test_rfield_projects_hits_into_other_version(pcorp):
    # rfield(q, 'de') — XFRelations.rfield (XFRelations.java:139-151): the
    # nl hits for "kat" rendered as de-side spans ("katze" positions)
    out = pcorp.find_cql('rfield("kat", "de")').collect()
    assert {(r["doc_id"], r["start"], r["end"]) for r in out} == {
        (0, 1, 2), (1, 1, 2), (2, 3, 4)
    }
    # per-hit mapping: exactly one output row per inner hit (the r6
    # multiplicity re-expansion must not duplicate the 1:1 case)
    assert len(out) == 3
    assert set(out[0].asDict()) == {"doc_id", "start", "end"}
    # multi-token query → target envelope of the covered alignments
    env = pcorp.find_cql('rfield("als" [] "en", "de")').collect()
    assert {(r["doc_id"], r["start"], r["end"]) for r in env} == {
        (0, 0, 3), (2, 0, 3)
    }


def test_rfield_same_field_and_errors(pcorp):
    # own field name: query unchanged (XFRelations.java:146-148)
    same = pcorp.find_cql('rfield("kat", "word")').collect()
    assert {(r["doc_id"], r["start"], r["end"]) for r in same} == {
        (0, 1, 2), (1, 1, 2), (2, 3, 4)
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="field or version"):
        pcorp.find_cql('rfield("kat", "")')
