"""Input-format readers — DocIndexer analogs (SURVEY.md §2.1).

Each reader produces the engine's transcript input shape
(conv_id, turn_idx, role, text, tool, ts) from files, ready for build_index:

  read_plaintext   one document per file          ≈ DocIndexerPlainText
                   (/root/reference/engine/.../indexers/config/DocIndexerPlainText.java)
  read_tabular     CSV/TSV with column mapping    ≈ DocIndexerTabular
  read_chat        CHAT (.cha) transcripts:       ≈ DocIndexerChat
                   *SPK: utterance lines; @ headers and % tiers skipped
                   (/root/reference/engine/.../indexers/config/DocIndexerChat.java)
  read_conllu      CoNLL-U: FORM column joined    ≈ DocIndexerCoNLLU
                   per sentence; one turn per sentence
                   (/root/reference/engine/.../indexers/config/DocIndexerCoNLLU.java)

Scale shape: `spark.read.text(wholetext=True)` yields (path, content) rows —
one task per file, files parsed in parallel by a vectorized mapInPandas stage
(format parsing needs intra-file line order, which a split text scan does not
guarantee; whole-file parsing is the standard Spark pattern for record
formats with multi-line records). Timestamps are a constant epoch: these
formats carry no timestamps, and build determinism forbids wall-clock reads.
"""

from __future__ import annotations

import datetime as dt
import os
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _rows(conv_id: str, turns: list[tuple[str, str]]) -> pd.DataFrame:
    return pd.DataFrame({
        "conv_id": [conv_id] * len(turns),
        "turn_idx": pd.array(range(len(turns)), dtype="int32"),
        "role": [r for r, _ in turns],
        "text": [t for _, t in turns],
        "tool": [""] * len(turns),
        "ts": [EPOCH] * len(turns),
    })


def _whole_files(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )


def _parse_files(files: DataFrame, parse_one) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                conv = os.path.basename(row.path)
                turns = parse_one(row.content)
                if turns:
                    out.append(_rows(conv, turns))
            if out:
                yield pd.concat(out, ignore_index=True)

    return files.mapInPandas(gen, schema=_SCHEMA)


def read_plaintext(spark: SparkSession, path: str) -> DataFrame:
    """One document per file (the whole file is turn 0)."""
    return _parse_files(
        _whole_files(spark, path),
        lambda content: [("", content.strip())] if content.strip() else [],
    )


def read_tabular(
    spark: SparkSession, path: str, text_col: str,
    conv_col: str | None = None, id_col: str | None = None,
    role_col: str | None = None, sep: str = ",", header: bool = True,
) -> DataFrame:
    """CSV/TSV rows → turns.

    conv_col groups rows into conversations; turn_idx follows file order
    within the conversation (a per-conversation window — shuffles on the
    conversation key, scale-safe). id_col makes each row its own single-turn
    conversation keyed by that stable id (no shuffle at all — preferred at
    scale). With neither, rows are numbered by a GLOBAL window: correct but
    single-partition, only for small files (document ids must be stable, and
    bare CSV rows have no other identity)."""
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    role = F.col(role_col).cast("string") if role_col else F.lit("")
    from pyspark.sql import Window
    if conv_col is not None:
        w = Window.partitionBy(conv_col).orderBy(F.monotonically_increasing_id())
        out = df.select(
            F.col(conv_col).cast("string").alias("conv_id"),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            role.alias("role"),
            F.col(text_col).cast("string").alias("text"),
        )
    elif id_col is not None:
        out = df.select(
            F.col(id_col).cast("string").alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            role.alias("role"),
            F.col(text_col).cast("string").alias("text"),
        )
    else:
        w = Window.orderBy(F.monotonically_increasing_id())
        out = df.select(
            F.format_string("row-%09d", F.row_number().over(w) - 1).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            role.alias("role"),
            F.col(text_col).cast("string").alias("text"),
        )
    return out.withColumn("tool", F.lit("")).withColumn("ts", F.lit(EPOCH))


_CHAT_UTT = re.compile(r"^\*([A-Za-z0-9]+):\s*(.*)$")


def _parse_chat(content: str) -> list[tuple[str, str]]:
    turns: list[tuple[str, str]] = []
    cur: tuple[str, str] | None = None
    for line in content.splitlines():
        if line.startswith(("@", "%")):
            if cur:
                turns.append(cur)
                cur = None
            continue
        m = _CHAT_UTT.match(line)
        if m:
            if cur:
                turns.append(cur)
            cur = (m.group(1), m.group(2).strip())
        elif cur and (line.startswith("\t") or line.startswith(" ")):
            cur = (cur[0], (cur[1] + " " + line.strip()).strip())  # continuation
        elif cur:
            turns.append(cur)
            cur = None
    if cur:
        turns.append(cur)
    return turns


def read_chat(spark: SparkSession, path: str) -> DataFrame:
    """CHAT transcripts: each *SPK: utterance (with tab/space continuation
    lines) is one turn; @ headers and % dependent tiers are skipped."""
    return _parse_files(_whole_files(spark, path), _parse_chat)


def _parse_conllu(content: str) -> list[tuple[str, str]]:
    turns: list[tuple[str, str]] = []
    forms: list[str] = []
    for line in content.splitlines():
        line = line.rstrip()
        if not line:
            if forms:
                turns.append(("", " ".join(forms)))
                forms = []
            continue
        if line.startswith("#"):
            continue
        cols = line.split("\t")
        # skip multi-word-token ranges (1-2) and empty nodes (1.1)
        if len(cols) >= 2 and "-" not in cols[0] and "." not in cols[0]:
            forms.append(cols[1])
    if forms:
        turns.append(("", " ".join(forms)))
    return turns


def read_conllu(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL-U: one turn per sentence, text = FORM column joined by spaces;
    comments, multi-word-token ranges and empty nodes skipped."""
    return _parse_files(_whole_files(spark, path), _parse_conllu)


_ANNOT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, word array<string>, lemma array<string>, pos array<string>, "
    "head array<int>, deprel array<string>"
)


def read_conllu_annotated(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL-U with token-aligned annotation layers: per sentence, parallel
    word (FORM, lowercased like the engine tokenizer), lemma (LEMMA) and pos
    (UPOS) arrays — feed to build_annotated_index — plus dependency columns
    head (1-based HEAD, 0 = root; -1 when absent) and deprel (DEPREL,
    lowercased; '' when absent) for build_relations. All arrays are aligned
    by construction (same rows of the same sentence)."""
    files = _whole_files(spark, path)

    def parse_one(content: str) -> list[tuple[list, list, list, list, list]]:
        sents, w, l, p, h, d = [], [], [], [], [], []
        for line in content.splitlines():
            line = line.rstrip()
            if not line:
                if w:
                    sents.append((w, l, p, h, d))
                    w, l, p, h, d = [], [], [], [], []
                continue
            if line.startswith("#"):
                continue
            cols = line.split("\t")
            if len(cols) >= 4 and "-" not in cols[0] and "." not in cols[0]:
                w.append(cols[1].lower())
                l.append(cols[2].lower())
                p.append(cols[3].lower())
                if len(cols) >= 8 and cols[6].isdigit():
                    h.append(int(cols[6]))
                    d.append(cols[7].lower())
                else:
                    h.append(-1)
                    d.append("")
        if w:
            sents.append((w, l, p, h, d))
        return sents

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                conv = os.path.basename(row.path)
                sents = parse_one(row.content)
                if sents:
                    out.append(pd.DataFrame({
                        "conv_id": [conv] * len(sents),
                        "turn_idx": pd.array(range(len(sents)), dtype="int32"),
                        "role": [""] * len(sents),
                        "text": [" ".join(s[0]) for s in sents],
                        "tool": [""] * len(sents),
                        "ts": [EPOCH] * len(sents),
                        "word": [s[0] for s in sents],
                        "lemma": [s[1] for s in sents],
                        "pos": [s[2] for s in sents],
                        "head": [s[3] for s in sents],
                        "deprel": [s[4] for s in sents],
                    }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return files.mapInPandas(gen, schema=_ANNOT_SCHEMA)


_TEI_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, word array<string>, lemma array<string>, pos array<string>, "
    "tags array<struct<tag:string,start:int,end:int,attrs:map<string,string>>>"
)


def _local_name(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_tei(content: str):
    """TEI-ish XML → per-utterance rows: one document per <u> (turn), with
    token-aligned word/lemma/pos arrays from inline <w lemma=".." pos="..">
    elements and a tag-span list covering the nested non-token elements
    (<s>, <seg>, <name> …) in TOKEN positions — the structure
    DocIndexerXPath captures from annotated TEI (/root/reference/engine/
    src/main/java/nl/inl/blacklab/indexers/config/DocIndexerXPath.java;
    inline tags → SpanQueryTags spans). Namespaces are ignored (local
    names); <w> text is the form, lowercased for the word layer like the
    engine tokenizer, raw text reconstructed space-joined."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    utts = []
    for u in root.iter():
        if _local_name(u.tag) != "u":
            continue
        words, lemmas, poss, tags = [], [], [], []

        def walk(el):
            start = len(words)
            for child in el:
                name = _local_name(child.tag)
                if name == "w":
                    form = (child.text or "").strip()
                    if form:
                        words.append(form.lower())
                        lemmas.append((child.get("lemma") or form).lower())
                        poss.append((child.get("pos") or "").lower())
                else:
                    walk(child)
            if _local_name(el.tag) != "u":  # the utterance IS the doc
                attrs = {_local_name(k): v for k, v in el.attrib.items()}
                tags.append((_local_name(el.tag), start, len(words), attrs))

        walk(u)
        if words:
            utts.append((u.get("who") or "", words, lemmas, poss, tags))
    return utts


def read_tei_annotated(spark: SparkSession, path: str) -> DataFrame:
    """TEI-style XML (≈ DocIndexerXPath for the common annotated-TEI shape):
    one document per <u> utterance; word/lemma/pos layers from <w> attrs;
    nested element extents (e.g. <s> sentences) as a `tags` column of
    (tag, start, end) structs in token space — feed to
    build_annotated_index + build_tags for `<s/>` tag queries. Whole-file
    parallel parse like the other readers."""
    files = _whole_files(spark, path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                conv = os.path.basename(row.path)
                utts = _parse_tei(row.content)
                if utts:
                    out.append(pd.DataFrame({
                        "conv_id": [conv] * len(utts),
                        "turn_idx": pd.array(range(len(utts)), dtype="int32"),
                        "role": [u[0] for u in utts],
                        "text": [" ".join(u[1]) for u in utts],
                        "tool": [""] * len(utts),
                        "ts": [EPOCH] * len(utts),
                        "word": [u[1] for u in utts],
                        "lemma": [u[2] for u in utts],
                        "pos": [u[3] for u in utts],
                        "tags": [u[4] for u in utts],
                    }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return files.mapInPandas(gen, schema=_TEI_SCHEMA)
