"""Index build pipeline — Spark-first re-expression of BlackLab's index build.

Reference analogs (what each stage computes, not how):
  * tokenize + positions     ≈ AnnotationWriter.addValue position tracking
    (/root/reference/engine/src/main/java/nl/inl/blacklab/index/annotated/AnnotationWriter.java:267-291)
  * per-term posting blocks  ≈ BlackLabPostingsWriter.write() field→term→doc walk
    (/root/reference/engine/src/main/java/nl/inl/blacklab/codec/BlackLabPostingsWriter.java:155-236)
  * shuffle merge on term    ≈ BlackLab's custom segment merge
    (/root/reference/engine/src/main/java/nl/inl/blacklab/codec/BlackLabPostingsWriter.java:96-130)
  * exact doc lengths        ≈ contents%length_tokens numeric field
    (/root/reference/engine/src/main/java/nl/inl/blacklab/search/indexmetadata/AnnotatedField.java:38-40)
  * docs table (tokens col)  ≈ the forward index + content store in one columnar table
    (/root/reference/doc/technical/index-formats/integrated.md:170-258,333-397)

Scale design (10^12 turns): every stage is partition-local except TWO keyed
shuffles — (term, doc_id) partial-agg for tf/positions (map-side combine via
Spark partial aggregation) and the term-keyed posting merge. High-DF terms are
explicitly salted by docID range so no single reducer owns a stop-word's full
posting list; salt boundaries == block boundaries, so delta decode restarts per
salted sub-list and the merged result is identical to the unsalted one (the
reference's analogous skew fix is greedy segment bin-packing,
/root/reference/engine/src/main/java/nl/inl/blacklab/search/results/hits/Parallel.java:42-67).

Resumability: each stage writes its output + a _checkpoints/<stage>.json marker
with lineage and metrics; build_index(resume=True) skips completed stages.
A per-partition manifest table records postings written / bytes compressed /
docs indexed (the north_rule lineage+metrics contract).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blacklab_spark import codecs, scoring
from blacklab_spark.docmap import assign_dense_ids
from blacklab_spark.tokenizer import TOKEN_PATTERN, tokenize_series

SCHEMA_VERSION = 1

POSTINGS_SCHEMA = T.StructType([
    T.StructField("term_id", T.LongType()),
    T.StructField("block_no", T.LongType()),
    T.StructField("first_doc_id", T.LongType()),
    T.StructField("last_doc_id", T.LongType()),
    T.StructField("num_docs", T.IntegerType()),
    T.StructField("doc_gaps", T.BinaryType()),
    T.StructField("tfs", T.BinaryType()),
    T.StructField("dls", T.BinaryType()),
    T.StructField("positions", T.BinaryType()),
    T.StructField("block_max_tf", T.IntegerType()),
    T.StructField("block_max_score", T.DoubleType()),
])


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def term_dict(self) -> str:
        return os.path.join(self.root, "term_dict")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")

    @property
    def meta(self) -> str:
        return os.path.join(self.root, "_meta.json")

    @property
    def checkpoints(self) -> str:
        return os.path.join(self.root, "_checkpoints")

    def marker(self, stage: str) -> str:
        return os.path.join(self.checkpoints, f"{stage}.json")


def _stage_done(paths: IndexPaths, stage: str, output: str | None) -> bool:
    if not os.path.exists(paths.marker(stage)):
        return False
    return output is None or os.path.exists(output)


def _mark_stage(paths: IndexPaths, stage: str, started: float, **info) -> None:
    os.makedirs(paths.checkpoints, exist_ok=True)
    payload = {
        "stage": stage,
        "started_ts": started,
        "finished_ts": time.time(),
        "wall_sec": time.time() - started,
        **info,
    }
    with open(paths.marker(stage), "w") as f:
        json.dump(payload, f, indent=2, default=str)


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_series(texts)


_TFPOS_SCHEMA = (
    "doc_id long, dl int, term string, tf int, positions array<int>"
)


def _term_counts_batches(batches):
    """docs(doc_id, dl, tokens) -> (doc_id, dl, term, tf, positions) rows.

    Fully map-side (NO shuffle): a term's positions within one doc live in
    one row. Vectorized: flat explode with numpy, lexsort, boundary split.
    The reference's analog is AnnotationWriter's per-doc position tracking
    (/root/reference/engine/src/main/java/nl/inl/blacklab/index/annotated/AnnotationWriter.java:267-291).
    """
    import numpy as np

    for pdf in batches:
        toks = pdf["tokens"]
        lengths = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        total = int(lengths.sum())
        if total == 0:
            continue
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        row_idx = np.repeat(np.arange(len(toks)), lengths)
        offs = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        pos = np.arange(total) - np.repeat(offs, lengths)
        # sort by (row, term) to get contiguous (doc, term) groups;
        # factorize terms so the lexsort runs on ints, not strings
        codes, uniques = pd.factorize(flat)
        order = np.lexsort((pos, codes, row_idx))
        r, c, p = row_idx[order], codes[order], pos[order]
        t = uniques.to_numpy()[c] if hasattr(uniques, "to_numpy") else np.asarray(uniques)[c]
        new_grp = np.concatenate(([True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])))
        starts = np.flatnonzero(new_grp)
        ends = np.concatenate((starts[1:], [total]))
        tf = (ends - starts).astype(np.int32)
        doc_ids = pdf["doc_id"].to_numpy()[r[starts]]
        dls = pdf["dl"].to_numpy()[r[starts]]
        yield pd.DataFrame({
            "doc_id": doc_ids,
            "dl": dls,
            "term": t[starts],
            "tf": tf,
            "positions": [p[s:e].astype("int32") for s, e in zip(starts, ends)],
        })


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    path: str,
    *,
    doc_key: tuple[str, str] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    block_size: int = codecs.DEFAULT_BLOCK_SIZE,
    salt_df_threshold: int = 100_000,
    docs_per_salt: int = 1 << 20,
    resume: bool = False,
) -> IndexPaths:
    """Build the full inverted index at `path` from a transcripts DataFrame.

    transcripts: any DataFrame containing the doc_key columns plus `text`;
    extra columns (role, tool, ts, ...) are carried into the docs table as
    metadata fields (the reference's doc metadata analog).
    """
    paths = IndexPaths(path)
    if not resume and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(paths.checkpoints, exist_ok=True)
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # ---------------- stage: docs (docmap + tokenize + forward index) ------
    if not _stage_done(paths, "docs", paths.docs):
        t0 = time.time()
        with_ids, n_docs = assign_dense_ids(
            transcripts, list(doc_key), id_col="doc_id",
            num_partitions=num_partitions, return_count=True,
        )
        docs = (
            with_ids
            .withColumn("tokens", _tokenize_udf(F.col("text")))
            .withColumn("dl", F.size("tokens").cast("int"))
        )
        docs.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(paths.docs)
        spark.catalog.clearCache()
        _mark_stage(paths, "docs", t0, docs_indexed=n_docs)

    docs = spark.read.parquet(paths.docs)

    # ---------------- stage: stats -----------------------------------------
    if not _stage_done(paths, "stats", None) or not os.path.exists(paths.meta):
        t0 = time.time()
        row = docs.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
        ).collect()[0]
        n_docs = int(row["n_docs"])
        total_tokens = int(row["total_tokens"] or 0)
        avgdl = float(total_tokens) / float(n_docs) if n_docs else 0.0
        meta = {
            "schema_version": SCHEMA_VERSION,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "k1": scoring.K1,
            "b": scoring.B,
            "block_size": block_size,
            "salt_df_threshold": salt_df_threshold,
            "docs_per_salt": docs_per_salt,
            "doc_key": list(doc_key),
            "tokenizer": TOKEN_PATTERN,
        }
        with open(paths.meta, "w") as f:
            json.dump(meta, f, indent=2)
        _mark_stage(paths, "stats", t0, **{k: v for k, v in meta.items() if k != "tokenizer"})
    with open(paths.meta) as f:
        meta = json.load(f)
    avgdl = meta["avgdl"]
    n_docs = meta["n_docs"]

    # ---------------- stage: term/doc freq + positions ---------------------
    # Computed MAP-SIDE in one vectorized mapInPandas pass (a term's positions
    # within a doc live in one row — no (term, doc) shuffle is ever needed).
    # Persisted because both term_dict and postings consume it.
    tfpos = docs.select("doc_id", "dl", "tokens").mapInPandas(
        _term_counts_batches, schema=_TFPOS_SCHEMA
    )
    from pyspark import StorageLevel
    tfpos = tfpos.persist(StorageLevel.MEMORY_AND_DISK)

    # ---------------- stage: term_dict --------------------------------------
    if not _stage_done(paths, "term_dict", paths.term_dict):
        t0 = time.time()
        term_stats = tfpos.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        term_dict, n_terms = assign_dense_ids(
            term_stats, ["term"], id_col="term_id",
            num_partitions=num_partitions, return_count=True,
        )
        term_dict.sortWithinPartitions("term").write.mode("overwrite").parquet(paths.term_dict)
        spark.catalog.clearCache()
        meta["n_terms"] = n_terms
        with open(paths.meta, "w") as f:
            json.dump(meta, f, indent=2)
        _mark_stage(paths, "term_dict", t0, n_terms=n_terms)
    term_dict = spark.read.parquet(paths.term_dict)

    # ---------------- stage: postings (salted term-keyed merge) ------------
    if not _stage_done(paths, "postings", paths.postings):
        t0 = time.time()
        joined = tfpos.join(term_dict.select("term", "term_id", "df"), "term")
        salted = joined.withColumn(
            "salt",
            F.when(
                F.col("df") > F.lit(salt_df_threshold),
                (F.col("doc_id") / F.lit(docs_per_salt)).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

        blocks_per_salt = docs_per_salt // block_size + 1
        bs = block_size
        nd = n_docs
        ad = avgdl
        colnames = [f.name for f in POSTINGS_SCHEMA.fields]

        def encode_partition(batches):
            """Encode a (term_id, salt)-sorted partition into posting blocks.

            One Python call per ARROW BATCH (not per term); groups straddling
            batch boundaries are carried over — the pandas-stage analog of
            BlackLabPostingsWriter's sequential term walk."""
            import numpy as np

            pending: pd.DataFrame | None = None

            def encode_groups(pdf: pd.DataFrame):
                tids = pdf["term_id"].to_numpy()
                salts = pdf["salt"].to_numpy()
                newg = np.concatenate(
                    ([True], (tids[1:] != tids[:-1]) | (salts[1:] != salts[:-1]))
                )
                starts = np.flatnonzero(newg)
                ends = np.concatenate((starts[1:], [len(pdf)]))
                doc_all = pdf["doc_id"].to_numpy()
                tf_all = pdf["tf"].to_numpy()
                dl_all = pdf["dl"].to_numpy()
                df_all = pdf["df"].to_numpy()
                pos_col = pdf["positions"].to_numpy()
                rows = []
                for s, e in zip(starts, ends):
                    w = scoring.idf(nd, int(df_all[s]))
                    pos_flat = (
                        np.concatenate([np.asarray(p, dtype="int64") for p in pos_col[s:e]])
                        if pos_col[s] is not None else None
                    )
                    blocks = codecs.encode_blocks(
                        doc_all[s:e], tf_all[s:e], dl_all[s:e], pos_flat,
                        avgdl=ad, idf_val=w, block_size=bs,
                    )
                    base = int(salts[s]) * blocks_per_salt
                    tid = int(tids[s])
                    for i, b in enumerate(blocks):
                        rows.append({"term_id": tid, "block_no": base + i, **b})
                return pd.DataFrame(rows, columns=colnames)

            for pdf in batches:
                if pending is not None:
                    pdf = pd.concat([pending, pdf], ignore_index=True)
                    pending = None
                if not len(pdf):
                    continue
                # hold back the (possibly incomplete) trailing group
                tids = pdf["term_id"].to_numpy()
                salts = pdf["salt"].to_numpy()
                tail = (tids == tids[-1]) & (salts == salts[-1])  # contiguous run
                cut = 0 if tail.all() else len(pdf) - int(np.argmin(tail[::-1]))
                pending = pdf.iloc[cut:].reset_index(drop=True)
                head = pdf.iloc[:cut]
                if len(head):
                    yield encode_groups(head)
            if pending is not None and len(pending):
                yield encode_groups(pending)

        postings = (
            salted.repartition(num_partitions, "term_id", "salt")
            .sortWithinPartitions("term_id", "salt", "doc_id")
            .mapInPandas(encode_partition, schema=POSTINGS_SCHEMA)
        )
        # Range-layout by term_id so per-term query scans prune to few files
        # (parquet min/max on term_id), analogous to Lucene's term-sorted
        # postings file.
        (
            postings.repartitionByRange(num_partitions, "term_id")
            .sortWithinPartitions("term_id", "block_no")
            .write.mode("overwrite")
            .parquet(paths.postings)
        )
        _mark_stage(paths, "postings", t0)

    # ---------------- stage: manifest (per-partition lineage + metrics) ----
    if not _stage_done(paths, "manifest", paths.manifest):
        t0 = time.time()
        written = spark.read.parquet(paths.postings)
        manifest = (
            written.withColumn("file", F.input_file_name())
            .groupBy("file")
            .agg(
                F.count("*").alias("blocks_written"),
                F.sum("num_docs").alias("postings_written"),
                (
                    F.sum(F.octet_length("doc_gaps"))
                    + F.sum(F.octet_length("tfs"))
                    + F.sum(F.octet_length("dls"))
                    + F.sum(F.octet_length("positions"))
                ).alias("bytes_compressed"),
                F.min("term_id").alias("min_term_id"),
                F.max("term_id").alias("max_term_id"),
            )
            .withColumn("docs_indexed", F.lit(n_docs))
            .withColumn("finished_ts", F.lit(time.time()))
        )
        manifest.write.mode("overwrite").parquet(paths.manifest)
        totals = spark.read.parquet(paths.manifest).agg(
            F.sum("postings_written"), F.sum("bytes_compressed"), F.sum("blocks_written")
        ).collect()[0]
        _mark_stage(
            paths, "manifest", t0,
            postings_written=int(totals[0] or 0),
            bytes_compressed=int(totals[1] or 0),
            blocks_written=int(totals[2] or 0),
        )

    tfpos.unpersist()
    spark.catalog.clearCache()
    return paths
