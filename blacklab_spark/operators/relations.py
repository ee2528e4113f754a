"""Relations / dependency queries — the BlackLab 5 headline feature.

Reference: SpanQueryRelations (/root/reference/engine/src/main/java/nl/inl/
blacklab/search/lucene/SpanQueryRelations.java — Direction enum :36-48,
span modes RelationInfo.SpanMode :83-96) and the `-reltype->` grammar
(query-parser/src/main/javacc/.../cql.jj:288-352). The reference indexes
relations as payload-augmented terms inside the Lucene field; Spark-first,
relations are a TABLE:

    (doc_id, rel_type, src_start, src_end, tgt_start, tgt_end)

one row per relation, src_start = -1 for root relations (no source). The
table is columnar, so rel_type filters push down to the parquet scan and
source/target matching is an ordinary (doc_id, position)-keyed join —
set-at-a-time instead of the reference's per-segment payload walk.

Output spans carry c_source_s/e and c_target_s/e capture columns, so the
rest of the span algebra (within/containing, grouping, constraints) composes
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REL_COLS = ["doc_id", "rel_type", "src_start", "src_end", "tgt_start", "tgt_end"]


def relations_from_heads(
    frame: DataFrame,
    head_col: str = "head",
    deprel_col: str = "deprel",
) -> DataFrame:
    """Dependency arcs from token-aligned head/deprel arrays (CoNLL-U HEAD /
    DEPREL, read_conllu_annotated): token i (0-based) with 1-based head h
    yields a relation  source=(h-1, h) → target=(i, i+1); h == 0 is the
    root relation (no source, src = -1). h < 0 (annotation absent) yields
    nothing. Pure JVM: posexplode over zipped arrays."""
    z = frame.select(
        "doc_id",
        F.posexplode(F.arrays_zip(F.col(head_col), F.col(deprel_col))).alias(
            "i", "hd"
        ),
    ).select(
        "doc_id",
        F.col("i").cast("int").alias("i"),
        F.col(f"hd.{head_col}").cast("int").alias("h"),
        F.lower(F.col(f"hd.{deprel_col}")).alias("rel_type"),
    ).filter(F.col("h") >= 0)
    return z.select(
        "doc_id",
        "rel_type",
        F.when(F.col("h") == 0, F.lit(-1)).otherwise(F.col("h") - 1)
        .cast("int").alias("src_start"),
        F.when(F.col("h") == 0, F.lit(-1)).otherwise(F.col("h"))
        .cast("int").alias("src_end"),
        F.col("i").alias("tgt_start"),
        (F.col("i") + 1).cast("int").alias("tgt_end"),
    )


def rel_spans(
    rels: DataFrame,
    rel_type: str = ".*",
    direction: str = "both",
    span_mode: str = "full",
) -> DataFrame:
    """SpanQueryRelations: relations whose type matches the ANCHORED regex,
    restricted by direction, returned as spans per span_mode with
    c_source_s/e and c_target_s/e capture columns.

    direction: 'root' (no source), 'forward' (target after source),
    'backward' (target before source), 'both'.
    span_mode: 'source' | 'target' | 'full' (envelope; for root = target)."""
    out = rels.filter(F.col("rel_type").rlike(f"^(?:{rel_type})$"))
    if direction == "root":
        out = out.filter(F.col("src_start") == -1)
    elif direction == "forward":
        out = out.filter(
            (F.col("src_start") != -1)
            & (F.col("tgt_start") > F.col("src_start"))
        )
    elif direction == "backward":
        out = out.filter(
            (F.col("src_start") != -1)
            & (F.col("tgt_start") < F.col("src_start"))
        )
    elif direction != "both":
        raise ValueError(f"unknown direction {direction!r}")
    if span_mode == "source":
        if direction == "root":
            raise ValueError("root relations have no source span")
        out = out.filter(F.col("src_start") != -1)
        s, e = F.col("src_start"), F.col("src_end")
    elif span_mode == "target":
        s, e = F.col("tgt_start"), F.col("tgt_end")
    elif span_mode == "full":
        # envelope of source+target; root (src == -1) = the target span
        s = F.when(F.col("src_start") == -1, F.col("tgt_start")).otherwise(
            F.least("src_start", "tgt_start")
        )
        e = F.when(F.col("src_start") == -1, F.col("tgt_end")).otherwise(
            F.greatest("src_end", "tgt_end")
        )
    else:
        raise ValueError(f"unknown span_mode {span_mode!r}")
    return out.select(
        "doc_id",
        s.cast("int").alias("start"),
        e.cast("int").alias("end"),
        F.col("src_start").alias("c_source_s"),
        F.col("src_end").alias("c_source_e"),
        F.col("tgt_start").alias("c_target_s"),
        F.col("tgt_end").alias("c_target_e"),
    )


def relations_matching(
    rels: DataFrame,
    source_spans: DataFrame | None = None,
    target_spans: DataFrame | None = None,
    rel_type: str = ".*",
    direction: str = "both",
    span_mode: str = "full",
) -> DataFrame:
    """`A -reltype-> B`: relations whose source span matches A and target
    span matches B (either side None = match anything, the `_` wildcard).
    Matching is span EQUALITY on (doc_id, start, end) — semi-joins keyed on
    doc+positions, so each filter is one hash join, never a cross product."""
    out = rels.filter(F.col("rel_type").rlike(f"^(?:{rel_type})$"))
    if direction == "root":
        out = out.filter(F.col("src_start") == -1)
    if source_spans is not None:
        src = source_spans.select(
            "doc_id",
            F.col("start").alias("src_start"),
            F.col("end").alias("src_end"),
        )
        out = out.join(src, ["doc_id", "src_start", "src_end"], "left_semi")
    if target_spans is not None:
        tgt = target_spans.select(
            "doc_id",
            F.col("start").alias("tgt_start"),
            F.col("end").alias("tgt_end"),
        )
        out = out.join(tgt, ["doc_id", "tgt_start", "tgt_end"], "left_semi")
    return rel_spans(out, ".*", direction if direction != "root" else "both",
                     span_mode)


def rspan_all(spans_with_rel_caps: DataFrame) -> DataFrame:
    """rspan(..., 'all'): expand each span to also cover the source and
    target of its matched relation (RelationInfo.SpanMode.ALL_SPANS)."""
    df = spans_with_rel_caps
    s = F.least(
        "start",
        F.when(F.col("c_source_s") == -1, F.col("start")).otherwise(
            F.col("c_source_s")
        ),
        "c_target_s",
    )
    e = F.greatest("end", "c_source_e", "c_target_e")
    keep = [c for c in df.columns if c not in ("start", "end")]
    return df.select(
        s.cast("int").alias("start"), e.cast("int").alias("end"), *keep
    ).select("doc_id", "start", "end",
             *[c for c in keep if c != "doc_id"])


# --------------------- parallel corpora (cross-field alignment) -------------
# Reference: SpanQueryOtherFieldHits / SpansOtherFieldHits (engine/.../lucene/
# SpansOtherFieldHits.java:10-21) and the `==>` alignment operator design
# (doc/technical/design/archive/plan-parallel.md): one annotated field per
# document VERSION (`word`, `word__de`, ...), alignment relations indexed as
# cross-field rows. Spark-first, alignments are a table:
#
#     (doc_id, rel_type, src_start, src_end, tgt_field, tgt_start, tgt_end)
#
# where positions on each side are in THAT version's token space.

def capture_relations_within(
    spans_df: DataFrame,
    rels: DataFrame,
    name: str = "captured_rels",
    rel_type: str = ".*",
) -> DataFrame:
    """rcapture(query, captureAs, relationType) — capture ALL relations of
    a matching type whose (envelope) span lies WITHIN each hit
    (XFRelations.rcapture, /root/reference/engine/src/main/java/nl/inl/
    blacklab/search/extensions/XFRelations.java:178-186 →
    SpanQueryCaptureRelationsWithinSpan). A root relation's envelope is its
    target span (no source). Spark-first shape: the captured set is a
    `c_<name>` column of sorted "type:src_s-src_e>tgt_s-tgt_e" strings
    (deterministic, hashable) — one doc_id-keyed join + one groupBy over
    the hit's own columns; hits with no relations keep an empty array.

    Legitimately duplicated hits (same extent reached via different match
    paths — distinct Hits in the reference) are PRESERVED: a per-hit
    surrogate key rides through the groupBy instead of deduplicating
    (ADVICE r5)."""
    from pyspark.sql import Window

    cols = spans_df.columns
    # deterministic duplicate-index surrogate: row_number within the group
    # of IDENTICAL hit rows (1..k for k duplicates). Unlike
    # monotonically_increasing_id, this is stable under task retry /
    # speculative re-execution — the id depends only on the row values,
    # not on physical partition layout
    w_dup = Window.partitionBy(*cols).orderBy(F.lit(1))
    h = spans_df.withColumn("_hid", F.row_number().over(w_dup)).alias("h")
    r = rels.filter(
        F.col("rel_type").rlike("^(?:" + rel_type + ")$")
    ).alias("r")
    env_s = F.when(
        F.col("r.src_start") == -1, F.col("r.tgt_start")
    ).otherwise(F.least("r.src_start", "r.tgt_start"))
    env_e = F.when(
        F.col("r.src_start") == -1, F.col("r.tgt_end")
    ).otherwise(F.greatest("r.src_end", "r.tgt_end"))
    rel_str = F.when(  # null on a left-join miss — collect_list drops nulls
        F.col("r.doc_id").isNotNull(),
        F.concat_ws(
            "", F.col("r.rel_type"), F.lit(":"),
            F.col("r.src_start"), F.lit("-"), F.col("r.src_end"),
            F.lit(">"), F.col("r.tgt_start"), F.lit("-"), F.col("r.tgt_end"),
        ),
    )
    j = h.join(
        r,
        (F.col("h.doc_id") == F.col("r.doc_id"))
        & (env_s >= F.col("h.start")) & (env_e <= F.col("h.end")),
        "left",
    )
    hcols = [F.col(f"h.{c}") for c in cols]
    return (
        j.select(*hcols, F.col("h._hid").alias("_hid"), rel_str.alias("_rs"))
        .groupBy("_hid", *[F.col(c) for c in cols])
        .agg(F.sort_array(F.collect_list("_rs")).alias(f"c_{name}"))
        .drop("_hid")
    )


ALIGN_COLS = [
    "doc_id", "rel_type", "src_start", "src_end",
    "tgt_field", "tgt_start", "tgt_end",
]


def alignment_hits(
    alignments: DataFrame,
    source_spans: DataFrame,
    target_field: str,
    rel_type: str = ".*",
    target_spans: DataFrame | None = None,
) -> DataFrame:
    """`A ==>v B`: for each left hit, find the alignment relations (of the
    matching type, pointing at `target_field`) whose SOURCE lies within the
    hit; the right side is the ENVELOPE of the matching relations' targets
    (plan-parallel.md "find all relations between two spans"). When
    `target_spans` is given, only hits whose envelope CONTAINS at least one
    right-side hit survive.

    Output: the LEFT spans + c_target_s/e (envelope, target token space) +
    n_rels. Physical shape: one doc-keyed equi-join + range filters + one
    aggregation — hits-sized, never a cross product over positions."""
    al = alignments.filter(
        F.col("rel_type").rlike(f"^(?:{rel_type})$")
        & (F.col("tgt_field") == target_field)
    )
    src = source_spans.select("doc_id", "start", "end")
    j = src.join(al, "doc_id").filter(
        (F.col("src_start") >= F.col("start"))
        & (F.col("src_end") <= F.col("end"))
    )
    grouped = j.groupBy("doc_id", "start", "end").agg(
        F.min("tgt_start").cast("int").alias("c_target_s"),
        F.max("tgt_end").cast("int").alias("c_target_e"),
        F.count("*").alias("n_rels"),
    )
    if target_spans is not None:
        t = target_spans.select(
            "doc_id",
            F.col("start").alias("t_s"),
            F.col("end").alias("t_e"),
        )
        grouped = (
            grouped.alias("g")
            .join(t.alias("t"), "doc_id")
            .filter(
                (F.col("t_s") >= F.col("c_target_s"))
                & (F.col("t_e") <= F.col("c_target_e"))
            )
            .select("g.*")
            .dropDuplicates(["doc_id", "start", "end"])
        )
    return grouped
