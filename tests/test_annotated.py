"""Multi-annotation layers (word/lemma/pos): per-layer indexes share the
docID space and token positions, so [lemma="x" & pos="y"] and lemma-level
constraints work as span intersections across layers — the reference's
annotated-field semantics (TestSearches exercises lemma/pos heavily)."""

import pytest

from blacklab_spark.annotated import AnnotatedCorpus, build_annotated_index
from blacklab_spark.sources.readers import read_conllu_annotated

CONLLU = """# doc 1
1\tThe\tthe\tDET
2\tdogs\tdog\tNOUN
3\tbark\tbark\tVERB

1\tA\ta\tDET
2\tdog\tdog\tNOUN
3\tbarked\tbark\tVERB
4\tloudly\tloudly\tADV

1\tdogs\tdog\tNOUN
2\tbark\tbark\tNOUN
"""


@pytest.fixture(scope="module")
def acorp(spark, tmp_root, tmp_path_factory):
    d = tmp_path_factory.mktemp("conllu")
    (d / "x.conllu").write_text(CONLLU)
    frame = read_conllu_annotated(spark, str(d / "x.conllu"))
    root = f"{tmp_root}/annot_idx"
    build_annotated_index(
        spark, frame, root,
        {"word": "word", "lemma": "lemma", "pos": "pos"},
        block_size=4,
    )
    return AnnotatedCorpus(spark, root)


def spans(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


def test_layers_aligned(acorp):
    # all layers share docIDs and doc lengths (position alignment)
    dls = {
        name: {r["doc_id"]: r["dl"] for r in layer.doc_lengths().collect()}
        for name, layer in acorp.layers.items()
    }
    assert dls["word"] == dls["lemma"] == dls["pos"]
    assert dls["word"] == {0: 3, 1: 4, 2: 2}


def test_lemma_query(acorp):
    # lemma dog: dogs(0,1), dog(1,1), dogs(2,0)
    assert spans(acorp.find_cql('[lemma="dog"]')) == [
        (0, 1, 2), (1, 1, 2), (2, 0, 1)
    ]


def test_word_and_pos_intersection(acorp):
    # word 'bark' occurs at (0,2) VERB and (2,1) NOUN
    assert spans(acorp.find_cql('[word="bark" & pos="noun"]')) == [(2, 1, 2)]
    assert spans(acorp.find_cql('[word="bark" & pos="verb"]')) == [(0, 2, 3)]


def test_cross_layer_sequence(acorp):
    # DET followed by lemma dog
    assert spans(acorp.find_cql('[pos="det"] [lemma="dog"]')) == [
        (0, 0, 2), (1, 0, 2)
    ]


def test_lemma_constraint(acorp):
    # A:[] B:[] :: A.lemma = B.lemma — adjacent same-lemma pair: doc2
    # has none (dog, bark); doc0 the/dogs/bark none... build one: use pos
    got = spans(acorp.find_cql('A:[] B:[] :: A.pos = B.pos'))
    # adjacent same-POS pairs: doc2 (dogs NOUN, bark NOUN) only
    assert got == [(2, 0, 2)]


def test_annotated_append(spark, tmp_root, tmp_path_factory):
    from blacklab_spark.annotated import add_to_annotated_index
    d = tmp_path_factory.mktemp("conllu2")
    (d / "base.conllu").write_text(CONLLU)
    delta = "1\tcats\tcat\tNOUN\n2\tbark\tbark\tVERB\n"
    (d / "delta.conllu").write_text(delta)
    root = f"{tmp_root}/annot_incr_idx"
    ann = {"word": "word", "lemma": "lemma", "pos": "pos"}
    build_annotated_index(
        spark, read_conllu_annotated(spark, str(d / "base.conllu")), root, ann,
        block_size=4,
    )
    add_to_annotated_index(
        spark, read_conllu_annotated(spark, str(d / "delta.conllu")), root, ann
    )
    ac = AnnotatedCorpus(spark, root)
    dls = {
        name: {r["doc_id"]: r["dl"] for r in layer.doc_lengths().collect()}
        for name, layer in ac.layers.items()
    }
    assert dls["word"] == dls["lemma"] == dls["pos"]  # still aligned
    assert len(dls["word"]) == 4
    # new doc visible across layers: cats/cat/NOUN at (3,0)
    assert spans(ac.find_cql('[lemma="cat"]')) == [(3, 0, 1)]
    assert spans(ac.find_cql('[word="bark" & pos="verb"]')) == [(0, 2, 3), (3, 1, 2)]
    # r5: cross-layer chains through the kernel on the MULTI-SEGMENT
    # (appended) index must match the join baseline — the appended segment's
    # block_no offsets and docID shifts ride the same (layer, term_id) keying
    import os
    chain_qs = ['[pos="noun"] [pos="verb"]', '[lemma="cat"] []{0,1} [pos="verb"]']
    kernel = {q: spans(ac.find_cql(q)) for q in chain_qs}
    os.environ["BLACKLAB_SEQ_KERNEL"] = "join"
    try:
        join_r = {q: spans(ac.find_cql(q)) for q in chain_qs}
    finally:
        del os.environ["BLACKLAB_SEQ_KERNEL"]
    assert kernel == join_r
    assert kernel['[pos="noun"] [pos="verb"]'] == [(0, 1, 3), (1, 1, 3), (3, 0, 2)]


def test_unknown_layer_errors(acorp):
    with pytest.raises(ValueError, match="unknown annotation"):
        acorp.find_cql('[xpos="NN"]').collect()


def test_word_only_corpus_rejects_lemma(spark, tmp_root):
    from blacklab_spark.build import build_index
    from blacklab_spark.corpus import Corpus
    from blacklab_spark.datagen import fixture_corpus
    path = f"{tmp_root}/wordonly_idx"
    build_index(spark, spark.createDataFrame(fixture_corpus()), path, block_size=4)
    with pytest.raises(ValueError, match="unknown annotation"):
        Corpus(spark, path).find_cql('[lemma="x"]').collect()

def test_cross_layer_chain_kernel_matches_join(acorp, monkeypatch):
    # r5 (VERDICT #7): cross-layer fixed-gap chains (and the variable-gap
    # tail) run in the positions-chain kernel — blocks keyed (layer,
    # term_id), one doc-range shuffle. The BLACKLAB_SEQ_KERNEL=join baseline
    # must produce identical spans for every chain shape.
    queries = [
        '[pos="det"] [lemma="dog"]',
        '[pos="det"] [lemma="dog"] [word="bark.*"]',
        '[lemma="dog"] []{0,2} [pos="verb"]',   # cross-layer vargap tail
        '[word="a"] [] [lemma="bark"]',
        '[pos="noun"] [pos="noun"]',
    ]
    kernel = {q: spans(acorp.find_cql(q)) for q in queries}
    monkeypatch.setenv("BLACKLAB_SEQ_KERNEL", "join")
    join = {q: spans(acorp.find_cql(q)) for q in queries}
    monkeypatch.delenv("BLACKLAB_SEQ_KERNEL")
    assert kernel == join
    assert kernel['[pos="det"] [lemma="dog"]'] == [(0, 0, 2), (1, 0, 2)]
    # non-empty guards: the parity must not be vacuous
    assert all(kernel[q] for q in queries[:3]), kernel
