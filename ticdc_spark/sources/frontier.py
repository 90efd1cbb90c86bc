"""Resolved-ts frontier: the engine's watermark.

TiCDC keeps a skiplist+min-heap of per-span resolved timestamps and defines
the table watermark as the min over spans
(/root/reference/cdc/puller/frontier/frontier.go:31-37, min at :75-77); the
changefeed checkpoint is the min over tables
(/root/reference/cdc/scheduler/internal/v3/replication/replication_manager.go:631-641).

Here a "span" is a source partition. The frontier is a one-line
aggregation — Spark's groupBy/min replaces ~700 lines of heap code — and
the invariant it guards is W1: **a micro-batch never processes an event
with commit_ts greater than the global frontier.**
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_partition_resolved(resolved_log: DataFrame) -> DataFrame:
    """Latest resolved-ts per partition (monotone by contract)."""
    return resolved_log.groupBy("partition_id").agg(F.max("resolved_ts").alias("resolved_ts"))


def global_frontier(resolved_log: DataFrame, expected_partitions: int | None = None) -> int:
    """min over partitions of the per-partition max resolved-ts.

    ``expected_partitions`` guards span-coverage holes (replication_manager
    hole-detection analog): a partition that never reported holds the
    frontier at 0.
    """
    agg = per_partition_resolved(resolved_log)
    row = agg.agg(
        F.min("resolved_ts").alias("frontier"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if row["n"] == 0:
        return 0
    if expected_partitions is not None and row["n"] < expected_partitions:
        return 0
    return int(row["frontier"])


def frontier_steps(resolved_log: DataFrame, low: int, high: int | None = None,
                   expected_partitions: int | None = None) -> list[int]:
    """Achievable global-frontier values in (low, high] in ascending order.

    A resolved value r is an achievable global frontier once every
    partition has resolved >= r; for bounded replay that is every distinct
    resolved value <= the global frontier. The driver loop picks batch
    boundaries from this list. The list is tiny (one entry per resolved
    block), so collecting it is driver-safe.
    """
    gf = global_frontier(resolved_log, expected_partitions)
    cap = gf if high is None else min(high, gf)
    rows = (
        resolved_log.select("resolved_ts")
        .filter((F.col("resolved_ts") > low) & (F.col("resolved_ts") <= cap))
        .distinct()
        .orderBy("resolved_ts")
        .collect()
    )
    return [int(r[0]) for r in rows]
