"""Interleaved A/B: cross-layer sequence chains — positions-chain kernel vs
the join fallback (BLACKLAB_SEQ_KERNEL=join), same index, same queries.

Evidence for VERDICT r4 #7 ("multi-layer positions_chain ... Done = annot-
layer chain entry green + an interleaved A/B in BENCH notes"). Variants
alternate round-robin with per-variant best-of, per the host-drift protocol
(BENCH/SCALING_r3.md).

Usage: python scripts/ab_annot_chain.py [turns] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from blacklab_spark.annotated import AnnotatedCorpus, build_annotated_index
    from blacklab_spark.datagen import make_transcripts
    from blacklab_spark.operators.textstats import STOPWORDS
    from blacklab_spark.session import get_spark
    from blacklab_spark.tokenizer import TOKEN_PATTERN_JAVA

    spark = get_spark("ab-annot-chain", cores=32, shuffle_partitions=32)
    pdf = make_transcripts(turns, seed=42)
    stop = ", ".join("'" + w + "'" for w in STOPWORDS)
    pos_rule = (
        f"CASE WHEN x IN ({stop}) THEN 'func' "
        "WHEN length(x) >= 6 THEN 'long' ELSE 'short' END"
    )
    frame = (
        spark.createDataFrame(pdf)
        .repartition(32)
        .select(
            "conv_id", "turn_idx",
            F.regexp_extract_all(
                F.lower("text"), F.lit(TOKEN_PATTERN_JAVA), 0
            ).alias("word"),
        )
        .select(
            "conv_id", "turn_idx", "word",
            F.expr("transform(word, x -> substring(x, 1, 1))").alias("lemma"),
            F.expr(f"transform(word, x -> {pos_rule})").alias("pos"),
        )
    )
    root = tempfile.mkdtemp(prefix="ab_annot_")
    t0 = time.time()
    build_annotated_index(
        spark, frame, root, {"word": "word", "lemma": "lemma", "pos": "pos"}
    )
    build_sec = time.time() - t0
    ac = AnnotatedCorpus(spark, root)

    # the synthetic vocab is stopwords + w0001..w5000 (all <= 5 chars), so
    # pos ∈ {func, short} and lemma = first char; these chains are the
    # WORST case for the kernel — pos/lemma layers have single-digit
    # cardinality, so every clause is a giant posting list
    queries = {
        # cross-layer fixed-gap chains (the r5 kernel target)
        "x_pos_lemma": '[pos="func"] [lemma="w"]',
        "x_three": '[pos="func"] [lemma="w"] [pos="func"]',
        "x_word_pos": '[word="the"] [pos="short"]',
        # cross-layer variable-gap tail
        "x_vargap": '[pos="func"] []{1,2} [lemma="w"]',
    }

    variants = {"kernel": None, "join": "join"}
    times: dict[str, dict[str, list[float]]] = {
        v: {q: [] for q in queries} for v in variants
    }
    counts: dict[str, dict[str, int]] = {v: {} for v in variants}
    for _ in range(rounds):
        for vname, envval in variants.items():
            if envval is None:
                os.environ.pop("BLACKLAB_SEQ_KERNEL", None)
            else:
                os.environ["BLACKLAB_SEQ_KERNEL"] = envval
            for qname, q in queries.items():
                t = time.time()
                n = ac.find_cql(q).count()
                times[vname][qname].append(round(time.time() - t, 4))
                counts[vname][qname] = n
    os.environ.pop("BLACKLAB_SEQ_KERNEL", None)
    assert counts["kernel"] == counts["join"], (
        "A/B result mismatch", counts
    )
    assert all(n > 0 for n in counts["kernel"].values()), (
        "vacuous A/B: a query returned zero hits", counts
    )
    best = {
        v: {q: min(ts) for q, ts in qs.items()} for v, qs in times.items()
    }
    print(json.dumps({
        "turns": turns,
        "rounds": rounds,
        "build_sec": round(build_sec, 1),
        "counts": counts["kernel"],
        "kernel_best": best["kernel"],
        "join_best": best["join"],
        "speedup": {
            q: round(best["join"][q] / best["kernel"][q], 2) for q in queries
        },
        "all": times,
    }))


if __name__ == "__main__":
    main()
