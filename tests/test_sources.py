"""Input-format readers (DocIndexer analogs): CHAT, CoNLL-U, plain text,
tabular — parsed frames feed build_index end-to-end."""

import os

import pytest

from blacklab_spark.build import build_index
from blacklab_spark.corpus import Corpus
from blacklab_spark.sources import readers

CHAT = """@Begin
@Participants:\tMOT Mother, CHI Child
*MOT:\tdo you want the ball ?
%mor:\tpro|you v|want det|the n|ball ?
*CHI:\tball ball !
*MOT:\there is the
\tred ball .
@End
"""

CONLLU = """# sent_id = 1
# text = The dog barks.
1\tThe\tthe\tDET\t_\t_\t2\tdet\t_\t_
2\tdog\tdog\tNOUN\t_\t_\t3\tnsubj\t_\t_
3\tbarks\tbark\tVERB\t_\t_\t0\troot\t_\t_

1-2\tcannot\t_\t_\t_\t_\t_\t_\t_\t_
1\tcan\tcan\tAUX\t_\t_\t0\troot\t_\t_
2\tnot\tnot\tPART\t_\t_\t1\tadvmod\t_\t_
2.1\tghost\t_\t_\t_\t_\t_\t_\t_\t_
"""


@pytest.fixture(scope="module")
def srcdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sources")
    (d / "a.cha").write_text(CHAT)
    (d / "b.conllu").write_text(CONLLU)
    (d / "c.txt").write_text("plain text document body\n")
    (d / "d.csv").write_text("conv,who,utt\nx,alice,hello there\nx,bob,hi\ny,alice,bye\n")
    return str(d)


def test_read_chat(spark, srcdir):
    rows = readers.read_chat(spark, os.path.join(srcdir, "a.cha")).collect()
    got = [(r["turn_idx"], r["role"], r["text"]) for r in
           sorted(rows, key=lambda r: r["turn_idx"])]
    assert got == [
        (0, "MOT", "do you want the ball ?"),
        (1, "CHI", "ball ball !"),
        (2, "MOT", "here is the red ball ."),  # continuation line folded in
    ]


def test_read_conllu(spark, srcdir):
    rows = readers.read_conllu(spark, os.path.join(srcdir, "b.conllu")).collect()
    got = [r["text"] for r in sorted(rows, key=lambda r: r["turn_idx"])]
    # range token 1-2 and empty node 2.1 are skipped
    assert got == ["The dog barks", "can not"]


def test_read_plaintext(spark, srcdir):
    rows = readers.read_plaintext(spark, os.path.join(srcdir, "c.txt")).collect()
    assert len(rows) == 1 and rows[0]["text"] == "plain text document body"
    assert rows[0]["conv_id"] == "c.txt" and rows[0]["turn_idx"] == 0


def test_read_tabular(spark, srcdir):
    rows = readers.read_tabular(
        spark, os.path.join(srcdir, "d.csv"),
        text_col="utt", conv_col="conv", role_col="who",
    ).collect()
    got = sorted((r["conv_id"], r["turn_idx"], r["role"], r["text"]) for r in rows)
    assert got == [
        ("x", 0, "alice", "hello there"),
        ("x", 1, "bob", "hi"),
        ("y", 0, "alice", "bye"),
    ]


def test_sources_feed_build(spark, srcdir, tmp_root):
    """Parsed CHAT transcript → index → query, end-to-end."""
    frame = readers.read_chat(spark, os.path.join(srcdir, "a.cha"))
    path = f"{tmp_root}/chat_idx"
    build_index(spark, frame, path)
    c = Corpus(spark, path)
    hits = c.spans_term("ball").collect()
    assert len(hits) == 4  # ball in turns 0, 1 (x2), 2
    assert c.search_or(["ball"], k=3).count() == 3


def test_highlight(spark, srcdir, tmp_root):
    from blacklab_spark.operators.grouping import highlight_snippets
    path = f"{tmp_root}/chat_idx"  # reuses the index built above
    if not os.path.exists(path):
        build_index(spark, readers.read_chat(spark, os.path.join(srcdir, "a.cha")), path)
    c = Corpus(spark, path)
    h = c.spans_term("ball").selectExpr("doc_id", "start as pos")
    snips = sorted(r["snippet"] for r in highlight_snippets(h, c.docs, 2).collect())
    assert "want the <<ball>>" in snips[3] or any("<<ball>>" in s for s in snips)
    assert all("<<ball>>" in s for s in snips)
