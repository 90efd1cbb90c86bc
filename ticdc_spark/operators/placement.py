"""Exact bucket->partition placement for hash exchanges.

``repartition(n, _bucket)`` routes rows through
``pmod(murmur3(_bucket), n)`` — for n bucket values into n partitions
that mapping collides heavily (birthday bound: ~1/e of partitions empty,
stragglers carrying 2-3 buckets). When the whole dedup+mount+write
pipeline runs inside that exchange's stage, the straggler sets the wall
clock.

The fix is a per-bucket placement TOKEN: token[b] is the smallest long x
with ``pmod(murmur3(x), n) == b``, so hash-partitioning on
``element_at(tokens, _bucket + 1)`` with n partitions places bucket b in
partition b exactly — one bucket per task, perfectly balanced, and the
``partitionBy`` write emits exactly one file per bucket with no second
exchange. Token discovery is one metadata-cardinality job over
``range(n * 64)`` (the probability of an unhit class at 64x
oversampling is ~n * e^-64; the loop widens deterministically if it ever
happens).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def aligned_partition_tokens(spark: SparkSession, n: int) -> list[int]:
    """token[b] = min x >= 0 with pmod(murmur3_hash(x), n) == b.

    ``F.hash`` is the same Murmur3(seed=42) expression HashPartitioning
    routes by, and ``spark.range`` ids are longs — the caller must keep
    the token column long-typed for the hashes to agree.
    """
    k = 64
    while True:
        rows = (
            spark.range(n * k)
            .select(F.pmod(F.hash("id"), F.lit(n)).alias("b"), "id")
            .groupBy("b")
            .agg(F.min("id").alias("t"))
            .collect()
        )
        toks = {int(r["b"]): int(r["t"]) for r in rows}
        if len(toks) == n:
            return [toks[b] for b in range(n)]
        k *= 4


def placement_token_column(spark: SparkSession, n: int, idx: Column) -> Column:
    """Long column that, hash-partitioned into ``n`` partitions, places
    rows with placement index ``idx`` (0-based, < n) in partition
    ``idx`` exactly."""
    toks = aligned_partition_tokens(spark, n)
    arr = F.array(*[F.lit(t).cast("bigint") for t in toks])
    return F.element_at(arr, idx.cast("int") + 1)
