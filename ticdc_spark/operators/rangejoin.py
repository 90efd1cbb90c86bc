"""Bucketized RANGE join (interval containment at scale).

Joining events to time intervals (`lo <= ts < hi`) has no equi-key, so
Spark's only native plan is BroadcastNestedLoopJoin / CartesianProduct —
O(|events| x |intervals|) comparisons, which melts at 100 TB. The classic
fix (Databricks' range-join bin optimization, interval trees in
single-node engines) is to QUANTIZE time into coarse buckets:

    intervals explode into every bucket they overlap
      -> equi-join on the bucket id (hash shuffle, prunable, salt-able)
      -> residual predicate lo <= ts < hi

The interval side grows by ceil(span / bucket) rows — bounded and chosen
by the caller (bucket ~ median interval span keeps the blow-up < 2x) —
while the probe side keeps exactly one row per event. The join becomes a
plain shuffled/broadcast hash join on `_rbucket`, so every join strategy
Spark has (AQE skew split, broadcast when the interval side is small)
applies unchanged.

The reference has no interval operator (its only temporal association is
the as-of schema lookup, see operators/asof.py); this is the
training-data-pipeline sibling: attributing events to sessions,
maintenance windows, experiment cohorts, or rate-limit epochs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(events: DataFrame, intervals: DataFrame,
               ts_col: str = "ts", lo_col: str = "lo", hi_col: str = "hi",
               bucket: int = 1_000, by: Sequence[str] | None = None) -> DataFrame:
    """Pair every event with every interval containing it
    (``lo <= ts < hi``) — INNER semantics (the residual containment
    filter makes outer variants ill-defined here; anti/outer shapes
    compose from this via left_anti on the result keys) — optionally
    also matching on equi-keys ``by``.

    Scale shape: intervals explode into ceil(span/bucket) bucket rows
    (ONE pure-Column sequence+explode, no shuffle); the join is an
    EQUI-join on (_rbucket, *by) — hash-shuffled or broadcast, never a
    nested loop — with the containment predicate applied as a residual
    filter. Events are never exploded.

    Half-open semantics: ``lo <= ts < hi`` (an instant belongs to exactly
    one adjacent interval). Empty intervals (hi <= lo) match nothing.
    """
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    by = list(by or [])
    ts = F.col(ts_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    # buckets overlapped by [lo, hi): lo div b .. (hi-1) div b — integer
    # `div`, not float floor: exact for the full long range (timestamps
    # must be non-negative, which epoch/commit-ts domains are)
    r = intervals.filter(hi > lo).withColumn(
        "_rbucket",
        F.explode(F.sequence(
            F.expr(f"cast({lo_col} as bigint) div {bucket}"),
            F.expr(f"cast({hi_col} - 1 as bigint) div {bucket}"),
        )),
    )
    l = events.withColumn(
        "_rbucket", F.expr(f"cast({ts_col} as bigint) div {bucket}"))
    joined = l.join(r, on=["_rbucket", *by], how="inner").filter(
        (lo <= ts) & (ts < hi)
    )
    return joined.drop("_rbucket")
