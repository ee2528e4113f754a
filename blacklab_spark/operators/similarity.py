"""Similarity search over embedding columns (array<float>).

  cosine_topk      exact brute-force top-k — the correctness baseline; the
                   dot product is a built-in zip_with/aggregate expression
                   (JVM codegen, no Python), query vector broadcast as a
                   literal array; top-k via TakeOrderedAndProject
  signlsh_topk     the scale path: random-hyperplane (sign) LSH buckets —
                   hyperplane components derived deterministically from
                   md5(plane,dim) so signatures are reproducible anywhere;
                   candidates = same-bucket rows (multi-probe: hamming≤1),
                   then exact cosine re-rank on the small candidate set
  cosine_near_pairs  embedding near-dup pairs above a threshold (bucketed)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector (broadcast by value)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(np.asarray(query_vec, "float64"), np.asarray(query_vec, "float64"))))
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        emb.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _plane_component(plane: int, dim_col):
    """Deterministic ±1 hyperplane component from md5('p<plane>:<dim>')."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"p{plane}:"), dim_col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def signlsh_signature(emb: DataFrame, num_planes: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, bucket): sign-LSH bucket from num_planes deterministic ±1 planes.

    sign(v · r_p) per plane, packed into an int bucket id. The projection is
    computed with built-in array ops over (dim, value) pairs.
    """
    dims = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    proj = dims.groupBy("id").agg(
        *[
            F.sum(F.col("val").cast("double") * _plane_component(p, F.col("dim"))).alias(f"s{p}")
            for p in range(num_planes)
        ]
    )
    bucket = None
    for p in range(num_planes):
        bit = F.when(F.col(f"s{p}") >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return proj.select("id", bucket.cast("long").alias("bucket"))


def signlsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    num_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    sig: DataFrame | None = None, multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: restrict to buckets within hamming<=h of the query bucket,
    then exact cosine on the (much smaller) candidate set. `sig` may be a
    precomputed signature table (the production path: built once, reused)."""
    if sig is None:
        sig = signlsh_signature(emb, num_planes, id_col, vec_col)
    qv = np.asarray(query_vec, dtype="float64")

    import hashlib

    def comp(plane: int, dim: int) -> float:
        h = int(hashlib.md5(f"p{plane}:{dim}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 0 else -1.0

    qbucket = 0
    for p in range(num_planes):
        s = sum(qv[d] * comp(p, d) for d in range(len(qv)))
        if s >= 0:
            qbucket |= 1 << p
    probe = [qbucket]
    if multiprobe_hamming >= 1:
        probe += [qbucket ^ (1 << p) for p in range(num_planes)]
    cand = sig.filter(F.col("bucket").isin(probe)).select("id")
    sub = emb.join(cand, emb[id_col] == cand["id"], "left_semi")
    return cosine_topk(sub, query_vec, k, id_col, vec_col)


def ivf_train_centroids(
    emb: DataFrame, n_centroids: int = 16, sample_n: int = 10000,
    iters: int = 10, seed: int = 1, vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer for IVF: spherical k-means trained driver-side on a
    bounded deterministic sample (standard IVF practice — at 100 TB the
    training sample is still small; only the ASSIGNMENT pass is distributed).
    Returns (n_centroids, dim) float64, L2-normalized rows."""
    frac_rows = emb.select(vec_col).limit(sample_n).collect()
    X = np.array([r[0] for r in frac_rows], dtype="float64")
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest-centroid assignment. One Arrow-batched pandas UDF
    doing a single matmul per batch (the centroid matrix rides in the UDF
    closure — broadcast by value); this is the only distributed IVF pass and
    it is embarrassingly parallel."""
    C = np.ascontiguousarray(centroids, dtype="float64")

    @F.pandas_udf("int")
    def nearest(vs):
        import pandas as pd  # noqa: F811 — executor-side import
        M = np.stack(vs.to_numpy())
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype("int32"))

    return emb.select(F.col(id_col).alias("id"), nearest(F.col(vec_col)).alias("cell"))


def ivf_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    centroids: np.ndarray | None = None, nprobe: int = 4,
    assign: DataFrame | None = None, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the nprobe cells nearest the query (driver-side
    argmax over the small centroid matrix), exact cosine re-rank on the
    candidate cells only. With nprobe == n_centroids this degrades to exact
    brute force (the recall-1.0 end of the knob). `centroids`/`assign` may be
    precomputed (the production path: train + assign once, reuse per query)."""
    if centroids is None:
        centroids = ivf_train_centroids(emb, n_centroids, vec_col=vec_col)
    if assign is None:
        assign = ivf_assign(emb, centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype="float64")
    q = q / max(np.linalg.norm(q), 1e-12)
    sims = centroids @ q
    probe = [int(i) for i in np.argsort(-sims)[: min(nprobe, len(centroids))]]
    cand = assign.filter(F.col("cell").isin(probe)).select("id")
    sub = emb.join(cand, emb[id_col] == cand["id"], "left_semi")
    return cosine_topk(sub, query_vec, k, id_col, vec_col)


def exact_near_pairs(
    emb: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold — the correctness baseline for
    cosine_near_pairs (the LSH-bucketed scale path). O(n²) by design: use on
    bounded sets only (an LSH candidate pool, a sampled audit), never the
    full corpus."""
    e = emb.select(F.col(id_col).alias("rid"), F.col(vec_col).alias("vec"))
    a, b = e.alias("a"), e.alias("b")
    sim = _dot(F.col("a.vec"), F.col("b.vec")) / (
        _norm(F.col("a.vec")) * _norm(F.col("b.vec"))
    )
    return (
        a.join(b, F.col("a.rid") < F.col("b.rid"))
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_near_pairs(
    emb: DataFrame, threshold: float = 0.9, num_planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket by sign-LSH, exact cosine within
    buckets (candidates only — never the full cross product)."""
    sig = signlsh_signature(emb, num_planes, id_col, vec_col)
    e = emb.join(sig, emb[id_col] == sig["id"]).select(
        F.col(id_col).alias("rid"), F.col(vec_col).alias("vec"), "bucket"
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.rid") < F.col("b.rid")),
    )
    sim = _dot(F.col("a.vec"), F.col("b.vec")) / (_norm(F.col("a.vec")) * _norm(F.col("b.vec")))
    return (
        pairs.select(
            F.col("a.rid").alias("id_a"), F.col("b.rid").alias("id_b"), sim.alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
