"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram Jaccard dedup — each a DataFrame
plan designed so the only shuffles are keyed on (hash/signature/shingle):

  dedup_exact        hash-groupBy; at 100 TB this is one shuffle on a
                     fixed-width digest, with AQE skew handling for
                     pathological duplicate clusters
  shingle/minhash    shingles -> 32-bit md5-prefix ints -> k permutation
                     hashes (a_i*x+b_i mod p) -> min per doc; LSH bands ->
                     candidate pairs via a band-keyed self-join; verify with
                     exact Jaccard on the candidates only
  simhash            sign-aggregated 32-bit fingerprints; near-dup pairs by
                     hamming distance over banded buckets
  ngram_jaccard      exact pairwise Jaccard via a shingle-keyed inverted
                     join (only pairs sharing >=1 shingle are generated)

All hash arithmetic is md5-prefix based (deterministic, engine-independent —
reproducible in any SQL engine for oracle checks; no Spark-internal hash()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed permutation-hash family over 32-bit shingle ids
MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def _md5_int32(col):
    """First 8 hex chars of md5 -> uint32 as long. Same formula is expressible
    in DuckDB as ('0x' || substr(md5(x),1,8))::BIGINT — the oracle contract."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest id per exact text group: (kept_id, group_size)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias("kept_id"), F.count("*").alias("group_size"))
        .select("kept_id", "group_size")
    )


def shingles(df: DataFrame, tokens_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle): distinct word n-grams per doc, built with built-in
    array ops (transform over index range) — no Python."""
    k = F.size(F.col(tokens_col)) - (n - 1)
    # sequence(1, 0) would DESCEND in Spark; guard short docs with an empty array
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(F.col(tokens_col), i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """(id, sig array<long>): MinHash over md5-int32 shingle ids with the
    fixed family h_i(x) = ((2i+1)*x + i*i + 7) mod P. Coefficients are tiny
    so products stay < 2^38 (safe in any engine's int64)."""
    hashed = sh.select("id", _md5_int32(F.col("shingle")).alias("x"))
    aggs = [
        F.min(
            (F.col("x") * F.lit(2 * i + 1) + F.lit(i * i + 7)) % F.lit(MINHASH_PRIME)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = 16, bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures and self-join on (band, band_sig) → candidate
    (id_a < id_b) pairs. The band-keyed join is the only shuffle.

    max_bucket_size bounds the residual quadratic risk: a degenerate bucket
    of b identical docs yields b·(b-1)/2 pairs; buckets above the cap are
    dropped before the self-join (their members are exact/near-identical
    clusters better handled by exact dedup first)."""
    rows_per_band = num_hashes // bands
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band),
            )
        ).alias("band", "band_sig"),
    )
    # r7 (guide §2.4/§3.3): the old banded SELF-JOIN evaluated the whole
    # upstream pipeline (shingles → md5 → 16-way minhash agg) TWICE — once
    # per join side — and shuffled on an array-typed key; the bucket-size
    # cap added a third aggregation plus a semi join. One groupBy now
    # collects each bucket's sorted ids, the cap is a free size() filter on
    # the collected array, and the candidate pairs fall out of a JVM
    # higher-order transform (i<j over the sorted array) — identical pairs,
    # one upstream evaluation, one shuffle. Measured 11.6s → see
    # OPTIMIZATION_r07.md.
    buckets = banded.groupBy("band", "band_sig").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    # r7b: near-identical docs agree in EVERY band, so the same sorted
    # member list recurs once per band and each recurrence re-emits the
    # full k^2/2 pair set into the final distinct. Deduping the id-lists
    # first (a shuffle of bucket rows, not pairs) cuts the expansion and
    # the distinct's input by up to `bands`x in exactly the degenerate
    # case that dominates (measured at sf0.1: 4 identical 3,890-member
    # buckets → 30M exploded rows → 7.5M pairs; noop-sink 10.4 s → 5.3 s).
    # Identical output: duplicate lists produce duplicate pairs only.
    buckets = buckets.select("ids").distinct()
    # two-step streamed expansion: posexplode anchors id_a, a second
    # explode streams the tail — no bucket-sized pair array is ever
    # materialized at once (a flatten(transform(...)) variant built each
    # bucket's full k^2/2 pair array in memory and measured 2x slower)
    anchored = buckets.select(
        "ids", F.posexplode("ids").alias("i", "id_a")
    )
    return (
        anchored.select(
            "id_a",
            F.explode(
                F.slice("ids", F.col("i") + 2, F.size("ids"))
            ).alias("id_b"),
        )
        .distinct()
    )


def exact_jaccard_pairs(
    sh: DataFrame, min_jaccard: float = 0.0, max_shingle_df: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing ≥1 shingle.

    inverted join on shingle → pair intersection counts; sizes joined in;
    union = |A| + |B| - inter. Only co-shingled pairs are ever materialized.

    max_shingle_df caps the inverted join's fan-out: a shingle appearing in d
    docs generates d·(d-1)/2 pairs, so one ubiquitous n-gram ("of the and")
    detonates quadratically at scale. Shingles with document frequency above
    the cap are dropped BEFORE the join (standard near-dup practice; the
    intersection then undercounts pairs that only share ubiquitous shingles,
    which are the pairs one wants to ignore anyway). Sizes are computed on
    the same capped shingle set so Jaccard stays internally consistent.
    """
    # r7 (guide §2.4/§3.3): the shingle-keyed SELF-JOIN evaluated the
    # upstream shingle pipeline twice (three times with the df cap's
    # frequency pass). One groupBy(shingle) collects each inverted list;
    # the df cap becomes a size() filter on it; pair intersection counts
    # come from a JVM pairwise expansion of the sorted list; doc sizes are
    # re-derived from the SAME capped buckets (the documented "sizes on the
    # capped shingle set" contract). Identical output, one upstream
    # evaluation.
    buckets = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    if max_shingle_df is not None:
        buckets = buckets.filter(F.size("ids") <= max_shingle_df)
    sizes = (
        buckets.select(F.explode("ids").alias("id"))
        .groupBy("id").agg(F.count("*").alias("sz"))
    )
    anchored = buckets.select("ids", F.posexplode("ids").alias("i", "id_a"))
    inter = (
        anchored.select(
            "id_a",
            F.explode(
                F.slice("ids", F.col("i") + 2, F.size("ids"))
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "inter", "jaccard")
    )


def simhash(df: DataFrame, tokens_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash): sign-aggregated fingerprint from md5-int32 token hashes,
    weighted by term frequency. Pure explode + bit-arithmetic + groupBy."""
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_col).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("x", _md5_int32(F.col("term")))
    )
    # r7 (guide §2.3 "shuffle fewer bytes"): the per-bit vote used to
    # explode every (id, term) row `bits` times and shuffle the 32x row set
    # through a (id, bit) groupBy plus a second (id) groupBy. The same
    # votes fall out of ONE groupBy("id") with `bits` sums —
    # v_bit = sum(((x>>b & 1)*2 - 1) * tf) — and the fingerprint is then a
    # row-local sum of shifted sign bits. Identical values, one shuffle of
    # (id, term) rows with map-side partial aggregation, no 32x explode.
    # (A first cut used `bits` CASE WHEN sums — measured 1.4-4x slower
    # than the exploded r6 form; the branch-free arithmetic ties it:
    # noop-sink A/B at sf0.1 explode 0.63 s / when-sums 0.90 / arith 0.66.)
    votes = tf.groupBy("id").agg(*[
        F.sum(
            F.expr(f"((shiftright(x, {b}) & 1) * 2 - 1) * tf")
        ).alias(f"v{b}")
        for b in range(bits)
    ])
    fingerprint = None
    for b in range(bits):
        term = F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("id", fingerprint.alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3, bands: int = 4, bits: int = 32) -> DataFrame:
    """Near-dup pairs by hamming distance ≤ max_hamming, banded so at least
    one band matches exactly (pigeonhole: hamming ≤ bands-1 guarantees a
    matching band; larger distances are best-effort like standard simhash LSH)."""
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn("band_val", F.expr(f"shiftright(simhash, band * {width}) & {mask}"))
    # r7: bucket-collect instead of a self-join (see lsh_candidate_pairs) —
    # the upstream simhash pipeline is evaluated once, and candidate pairs
    # come from a JVM pairwise expansion of each bucket's (id, simhash)
    # structs, sorted by id so id_a < id_b. Identical pairs.
    buckets = banded.groupBy("band", "band_val").agg(
        F.sort_array(F.collect_list(F.struct("id", "simhash"))).alias("ms")
    )
    # identical member lists across bands re-emit identical pair sets —
    # dedupe lists before the quadratic expansion (see lsh_candidate_pairs)
    buckets = buckets.select("ms").distinct()
    anchored = buckets.select("ms", F.posexplode("ms").alias("i", "a"))
    cand = (
        anchored.select(
            "a",
            F.explode(
                F.slice("ms", F.col("i") + 2, F.size("ms"))
            ).alias("b"),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
