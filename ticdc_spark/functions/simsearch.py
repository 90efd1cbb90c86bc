"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; sign-LSH bucketing
as the scale path (prune candidate pairs before the exact re-rank — at
100 TB the bucketed join replaces the O(n²) cross join; the exact pass
only runs within buckets).

All arithmetic is native Column expressions (zip_with / aggregate run in
codegen'd JVM) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embs: DataFrame, n_queries: int = 8, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact top-k neighbors for the first `n_queries` vectors.
    Broadcast the (tiny) query side so the candidate scan never shuffles."""
    from pyspark.sql import Window as W

    q = embs.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _bucket_col(vec_col: str, n_bits: int):
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), i + 1) >= 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return bucket


def sign_lsh_bucket(embs: DataFrame, n_bits: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane-LSH stand-in with deterministic axis-aligned
    hyperplanes: bucket = sign pattern of the first n_bits coordinates."""
    return embs.select(
        F.col(id_col).alias("vec_id"), _bucket_col(vec_col, n_bits).alias("bucket")
    )


def lsh_neardup_pairs(embs: DataFrame, n_bits: int = 8, min_cos: float = 0.1,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Near-dup candidate pairs: same LSH bucket, then exact cosine filter
    (bucket-join candidate generation + exact verify)."""
    withb = embs.select(
        F.col(id_col).alias("vec_id"),
        _bucket_col(vec_col, n_bits).alias("bucket"),
        F.col(vec_col).alias("v"),
    )
    a = withb.alias("a")
    b = withb.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.round(cosine(F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cos)
    )
