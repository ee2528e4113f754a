"""Incremental index maintenance — append a new segment, compact later.

Reference analog: BlackLab's incremental add-to-index
(/root/reference/server/src/main/java/nl/inl/blacklab/server/requesthandlers/
RequestHandlerAddToIndex.java) on top of Lucene's append-a-segment model,
with BlackLab's custom merge as the compaction
(/root/reference/engine/src/main/java/nl/inl/blacklab/codec/BlackLabPostingsWriter.java:96-130).

Design:
  * add_to_index appends: new docs get docIDs starting at the current N
    (dense rank within the batch under the same (conv_id, turn_idx) order);
    a new posting SEGMENT is encoded for the delta only, with block_no
    offset by a per-segment base so segments coexist; term_dict is merged
    (df/cf summed; new terms get fresh dense ids above the old max).
  * Scores stay EXACT after an append: the decode path recomputes BM25 from
    stored (tf, dl) with the UPDATED meta avgdl and term_dict df — nothing
    scored at build time is trusted except the block-max bound.
  * The stored block_max_score IS stale after an append (df/avgdl moved),
    so meta["bounds_stale"]=True disables block-max WAND pruning until
    compact_index() rebuilds postings from the docs table (full stats) and
    clears the flag — exactly Lucene's "bounds are per-segment until merge".
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blacklab_spark.build import IndexPaths, build_index, _mark_stage

SEGMENT_BLOCK_BASE = 1 << 44  # block_no high bits per segment


def add_to_index(
    spark: SparkSession,
    new_transcripts: DataFrame,
    path: str,
) -> IndexPaths:
    paths = IndexPaths(path)
    with open(paths.meta) as f:
        meta = json.load(f)
    n_old = meta["n_docs"]
    n_terms_old = meta["n_terms"]
    segment = meta.get("n_segments", 1)

    # Build the delta as a standalone mini-index in a staging dir (reuses the
    # whole build pipeline: same tokenizer, salting, codecs).
    staging = os.path.join(path, f"_segment_{segment}")
    build_index(
        spark, new_transcripts, staging,
        doc_key=tuple(meta.get("doc_key", ["conv_id", "turn_idx"])),
        block_size=meta["block_size"],
        salt_df_threshold=meta["salt_df_threshold"],
        docs_per_salt=meta["docs_per_salt"],
    )
    s = IndexPaths(staging)
    with open(s.meta) as f:
        smeta = json.load(f)

    # ---- docs: shift docIDs by n_old, append --------------------------------
    sdocs = spark.read.parquet(s.docs).withColumn(
        "doc_id", F.col("doc_id") + F.lit(n_old)
    )
    sdocs.write.mode("append").parquet(paths.docs)

    # ---- term_dict merge ----------------------------------------------------
    old_td = spark.read.parquet(paths.term_dict)
    delta_td = spark.read.parquet(s.term_dict).select(
        "term",
        F.col("term_id").alias("d_term_id"),
        F.col("df").alias("d_df"),
        F.col("cf").alias("d_cf"),
    )
    joined = old_td.join(delta_td, "term", "full_outer")
    # new terms: dense ids above the old max, ranked by term string
    from pyspark.sql import Window
    new_terms = joined.filter(F.col("term_id").isNull())
    w = Window.orderBy("term")  # new-vocab cardinality is delta-sized; fine
    new_ids = new_terms.withColumn(
        "term_id", F.row_number().over(w) + F.lit(n_terms_old - 1)
    )
    merged = (
        joined.filter(F.col("term_id").isNotNull())
        .unionByName(new_ids)
        .select(
            "term",
            "term_id",
            (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("d_df"), F.lit(0))).alias("df"),
            (F.coalesce(F.col("cf"), F.lit(0)) + F.coalesce(F.col("d_cf"), F.lit(0))).alias("cf"),
            F.col("d_term_id"),
        )
    )
    # MATERIALIZE the merged dict before touching any source directory —
    # everything below derives from the written copy, not the lazy lineage
    tmp_td = os.path.join(path, "_term_dict_new")
    merged.write.mode("overwrite").parquet(tmp_td)
    merged_w = spark.read.parquet(tmp_td)

    # ---- postings: remap delta term_ids -> merged ids, shift docs + blocks --
    id_map = merged_w.filter(F.col("d_term_id").isNotNull()).select(
        F.col("d_term_id"), F.col("term_id").alias("new_term_id")
    )
    sp = spark.read.parquet(s.postings)
    remapped = (
        sp.join(F.broadcast(id_map), sp["term_id"] == id_map["d_term_id"])
        .select(
            F.col("new_term_id").alias("term_id"),
            (F.col("block_no") + F.lit(segment * SEGMENT_BLOCK_BASE)).alias("block_no"),
            (F.col("first_doc_id") + F.lit(n_old)).alias("first_doc_id"),
            (F.col("last_doc_id") + F.lit(n_old)).alias("last_doc_id"),
            "num_docs", "doc_gaps", "tfs", "dls", "positions",
            "block_max_tf", "block_max_score",
        )
    )
    remapped.write.mode("append").parquet(paths.postings)
    n_terms_new = merged_w.count()

    # ---- swap term_dict, update meta ---------------------------------------
    final_td = os.path.join(path, "_term_dict_final")
    merged_w.drop("d_term_id").write.mode("overwrite").parquet(final_td)
    shutil.rmtree(paths.term_dict)
    os.rename(final_td, paths.term_dict)
    shutil.rmtree(tmp_td)

    meta["n_docs"] = n_old + smeta["n_docs"]
    meta["total_tokens"] = meta["total_tokens"] + smeta["total_tokens"]
    meta["avgdl"] = float(meta["total_tokens"]) / float(meta["n_docs"])
    meta["n_terms"] = n_terms_new
    meta["n_segments"] = segment + 1
    meta["bounds_stale"] = True  # block_max_score no longer an upper bound
    with open(paths.meta, "w") as f:
        json.dump(meta, f, indent=2)
    _mark_stage(paths, f"segment_{segment}", time.time(), docs_added=smeta["n_docs"])
    shutil.rmtree(staging)
    return paths


def compact_index(spark: SparkSession, path: str) -> IndexPaths:
    """Rebuild postings/term_dict from the docs table with full-corpus stats
    (the segment-merge compaction); restores exact block-max bounds."""
    paths = IndexPaths(path)
    with open(paths.meta) as f:
        meta = json.load(f)
    docs = spark.read.parquet(paths.docs)
    transcripts = docs.drop("doc_id", "tokens", "dl")
    rebuilt = os.path.join(path, "_compacted")
    build_index(
        spark, transcripts, rebuilt,
        doc_key=tuple(meta.get("doc_key", ["conv_id", "turn_idx"])),
        block_size=meta["block_size"],
        salt_df_threshold=meta["salt_df_threshold"],
        docs_per_salt=meta["docs_per_salt"],
    )
    for sub in ["docs", "term_dict", "postings", "manifest"]:
        dst = os.path.join(path, sub)
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(os.path.join(rebuilt, sub), dst)
    with open(IndexPaths(rebuilt).meta) as f:
        new_meta = json.load(f)
    new_meta["n_segments"] = 1
    new_meta["bounds_stale"] = False
    with open(paths.meta, "w") as f:
        json.dump(new_meta, f, indent=2)
    shutil.rmtree(rebuilt)
    return paths
