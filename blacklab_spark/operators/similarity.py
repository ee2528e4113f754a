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
