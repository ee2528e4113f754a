"""Multi-annotation corpora — word / lemma / pos layers, position-aligned.

Reference analog: BlackLab's annotated fields, where each annotation gets its
own Lucene field over the SAME token positions (`contents%word@s`,
`contents%lemma@s`, ... — /root/reference/engine/src/main/java/nl/inl/
blacklab/search/indexmetadata/Annotation.java:9-47; field naming
/root/reference/doc/technical/index-formats/integrated.md:19-31).

Spark-first shape: one full index PER ANNOTATION LAYER under a shared root
(`<root>/word`, `<root>/lemma`, ...), all built from position-aligned token
arrays of the same doc_key frame, so docIDs AND token positions line up
across layers. A token-level `[lemma="x" & pos="y"]` is then a span
intersection of two layers' postings leaves — the same per-doc merge the
reference does between annotation fields.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blacklab_spark.build import build_index
from blacklab_spark.corpus import Corpus

_LAYERS_FILE = "_layers.json"


def sensitivity_exprs(raw_col: str, base: str = "word") -> dict[str, F.Column]:
    """The reference's 4-level MatchSensitivity as derived layer expressions
    over ONE raw (case+accent-preserving) token array column
    (MatchSensitivity.java:14-17; field naming `contents%word@s`,
    doc/technical/index-formats/integrated.md:19-31):

        <base>     i-level:  fold_accents(lower(tok))   — the default field
        <base>_ci  case-insensitive only: lower(tok)
        <base>_di  diacritics-insensitive only: fold_accents(tok)
        <base>_s   sensitive: the raw tokens

    All four are per-position transforms of the SAME array, so positions are
    aligned by construction. The fold is tokenizer.ACCENT_FROM/TO via SQL
    translate() — identical bytes to the Python and DuckDB folds."""
    from blacklab_spark.tokenizer import fold_sql

    return {
        base: F.expr(f"transform({raw_col}, x -> {fold_sql('lower(x)')})"),
        base + "_ci": F.expr(f"transform({raw_col}, x -> lower(x))"),
        base + "_di": F.expr(f"transform({raw_col}, x -> {fold_sql('x')})"),
        base + "_s": F.col(raw_col),
    }


def build_sensitivity_index(
    spark: SparkSession,
    frame: DataFrame,
    root: str,
    raw_col: str = "word_s",
    base: str = "word",
    *,
    doc_key: tuple[str, str] = ("conv_id", "turn_idx"),
    **build_kwargs,
) -> str:
    """Build the full 4-sensitivity index from a raw token column: layers
    <base>, <base>_ci, <base>_di, <base>_s. The i-level (and _di) layers are
    recorded as FOLDED so the CQL compiler accent-folds literal patterns
    against them (the reference desensitizes the search string per field)."""
    exprs = sensitivity_exprs(raw_col, base)
    derived = frame.select(
        *doc_key, *[e.alias(f"__{n}") for n, e in exprs.items()]
    )
    return build_annotated_index(
        spark, derived, root,
        {n: f"__{n}" for n in exprs},
        doc_key=doc_key,
        folded={base, base + "_di"},
        **build_kwargs,
    )


def build_annotated_index(
    spark: SparkSession,
    frame: DataFrame,
    root: str,
    annotations: dict[str, str],
    *,
    doc_key: tuple[str, str] = ("conv_id", "turn_idx"),
    folded: set[str] | None = None,
    **build_kwargs,
) -> str:
    """Build one index per annotation layer from position-aligned token
    columns. `annotations` maps layer name → array<string> column of `frame`;
    a 'word' layer is required (it is the default annotation, like the
    reference's mainAnnotation). All layers share the docID space because
    every per-layer build sorts the same doc_key set. `folded` names the
    layers whose tokens are accent-FOLDED (i/di sensitivity levels) so the
    query compiler desensitizes patterns against them the same way."""
    if "word" not in annotations:
        raise ValueError("a 'word' layer is required")
    os.makedirs(root, exist_ok=True)
    for name, col in annotations.items():
        layer = frame.select(*doc_key, F.col(col).alias("tokens"))
        build_index(spark, layer, os.path.join(root, name),
                    doc_key=doc_key, **build_kwargs)
    with open(os.path.join(root, _LAYERS_FILE), "w") as f:
        json.dump(
            {"layers": sorted(annotations), "folded": sorted(folded or [])}, f
        )
    return root


def add_to_annotated_index(
    spark: SparkSession,
    frame: DataFrame,
    root: str,
    annotations: dict[str, str],
    *,
    doc_key: tuple[str, str] = ("conv_id", "turn_idx"),
) -> str:
    """Append position-aligned documents to every layer (the incremental
    add-to-index path, layer by layer). The layer set must match the built
    index — a partial append would desynchronize docID spaces."""
    from blacklab_spark.incremental import add_to_index

    names = set(_read_layers(root)[0])
    if set(annotations) != names:
        raise ValueError(f"layer mismatch: index has {sorted(names)}, "
                         f"append provides {sorted(annotations)}")
    for name, col in annotations.items():
        layer = frame.select(*doc_key, F.col(col).alias("tokens"))
        add_to_index(spark, layer, os.path.join(root, name))
    return root


def build_relations(
    spark: SparkSession,
    frame: DataFrame,
    root: str,
    head_col: str = "head",
    deprel_col: str = "deprel",
    doc_key: tuple[str, str] = ("conv_id", "turn_idx"),
) -> str:
    """Extract dependency relations (CoNLL-U HEAD/DEPREL arrays) into a
    relations table under the annotated root, docIDs aligned with the layer
    indexes via the word layer's doc_map — the Spark-first analog of the
    reference indexing relations into the Lucene field
    (SpanQueryRelations.java; integrated.md relations storage)."""
    from blacklab_spark.operators.relations import relations_from_heads

    word = Corpus(spark, os.path.join(root, "word"))
    dm = word.doc_map()
    f = frame.select(*doc_key, head_col, deprel_col).join(dm, list(doc_key))
    rels = relations_from_heads(f, head_col, deprel_col)
    rels.write.mode("overwrite").parquet(os.path.join(root, "relations"))
    return root


def build_tags(
    spark: SparkSession,
    frame: DataFrame,
    root: str,
    tags_col: str = "tags",
    doc_key: tuple[str, str] = ("conv_id", "turn_idx"),
) -> str:
    """Store inline-tag spans (sentence/paragraph/named-entity boundaries
    captured at ingest, e.g. read_tei_annotated's `tags` column of
    (tag, start, end) structs) as a tags table under the annotated root,
    docIDs aligned via the word layer's doc_map — the Spark-first analog of
    the reference indexing start/end tags into the _relation annotation
    (SpanQueryTags.java; integrated.md tag storage). Enables `<s/>` and
    `<s> q </s>` BCQL tag queries."""
    word = Corpus(spark, os.path.join(root, "word"))
    dm = word.doc_map()
    f = frame.select(*doc_key, F.explode(tags_col).alias("t")).join(
        dm, list(doc_key)
    )
    has_attrs = "attrs" in [
        x.name for x in frame.schema[tags_col].dataType.elementType.fields
    ]
    attrs = (
        F.col("t.attrs") if has_attrs
        else F.create_map().cast("map<string,string>")
    )
    f.select(
        "doc_id",
        F.col("t.tag").alias("tag"),
        F.col("t.start").cast("int").alias("start"),
        F.col("t.end").cast("int").alias("end"),
        attrs.alias("attrs"),
    ).write.mode("overwrite").parquet(os.path.join(root, "tags"))
    return root


def _read_layers(root: str) -> tuple[list[str], list[str]]:
    """(layer names, folded layer names) — tolerates the pre-r4 bare-list
    file format."""
    with open(os.path.join(root, _LAYERS_FILE)) as f:
        data = json.load(f)
    if isinstance(data, list):
        return data, []
    return data["layers"], data.get("folded", [])


def build_alignments(
    spark: SparkSession,
    rows: DataFrame,
    root: str,
) -> str:
    """Store cross-field alignment relations (parallel corpora,
    plan-parallel.md): rows must have operators.relations.ALIGN_COLS with
    doc_id already in the word layer's docID space (or join via doc_map
    before calling). Positions on each side are in that VERSION's token
    space."""
    from blacklab_spark.operators.relations import ALIGN_COLS

    rows.select(*ALIGN_COLS).write.mode("overwrite").parquet(
        os.path.join(root, "alignments")
    )
    return root


class AnnotatedCorpus:
    """Query-side view over the per-annotation layer indexes."""

    def __init__(self, spark: SparkSession, root: str):
        names, folded = _read_layers(root)
        self.root = root
        self.layers = {n: Corpus(spark, os.path.join(root, n)) for n in names}
        self.folded = set(folded)
        self.word = self.layers["word"]
        self.spark = spark

    @property
    def relations(self) -> DataFrame | None:
        p = os.path.join(self.root, "relations")
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    @property
    def alignments(self) -> DataFrame | None:
        p = os.path.join(self.root, "alignments")
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    @property
    def tags(self) -> DataFrame | None:
        p = os.path.join(self.root, "tags")
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    def align_find(
        self,
        source_spans: DataFrame,
        target_field: str,
        rel_type: str = ".*",
        target_spans: DataFrame | None = None,
    ) -> DataFrame:
        """Cross-field alignment search (`A ==>v B`, SpansOtherFieldHits
        analog) over the stored alignments table."""
        from blacklab_spark.operators.relations import alignment_hits

        al = self.alignments
        if al is None:
            raise ValueError("no alignments table: run build_alignments first")
        return alignment_hits(al, source_spans, target_field, rel_type,
                              target_spans)

    def rel_find(
        self,
        rel_type: str = ".*",
        direction: str = "both",
        span_mode: str = "full",
        source: DataFrame | None = None,
        target: DataFrame | None = None,
    ) -> DataFrame:
        """Relation search (SpanQueryRelations analog): spans of relations
        whose type matches the anchored regex, with c_source_*/c_target_*
        capture columns; source/target restrict the respective side to a
        span frame (e.g. a find_cql result)."""
        from blacklab_spark.operators.relations import relations_matching

        rels = self.relations
        if rels is None:
            raise ValueError("no relations table: run build_relations first")
        return relations_matching(
            rels, source, target, rel_type, direction, span_mode
        )

    def spans_term(self, term: str, annot: str = "word") -> DataFrame:
        return self.layers[annot].spans_term(term)

    def enable_search_cache(self, max_entries: int = 64) -> "AnnotatedCorpus":
        """Plan-keyed result cache across all layers (see
        Corpus.enable_search_cache)."""
        from blacklab_spark.plans.cql import PlanCache

        if getattr(self, "_search_cache", None) is None:
            self._search_cache = PlanCache(max_entries)
        return self

    def find_cql(self, query: str) -> DataFrame:
        """BCQL over all annotation layers: [lemma="x" & pos="y"], lemma
        constraints (:: A.lemma = B.lemma), etc."""
        from blacklab_spark.plans.cql import CqlCompiler, parse_cql
        from blacklab_spark.plans.rewrite import rewrite

        def build():
            compiler = CqlCompiler(
                self.word, layers=self.layers, relations=self.relations,
                folded=self.folded, alignments=self.alignments,
                tags=self.tags,
            )
            return compiler.compile(rewrite(parse_cql(query)))

        cache = getattr(self, "_search_cache", None)
        if cache is None:
            return build()
        version = tuple(
            (n, c.meta["n_docs"], c.meta.get("n_segments", 1))
            for n, c in sorted(self.layers.items())
        )
        return cache.get_or_build(self.word.paths.root, version, query, build)
