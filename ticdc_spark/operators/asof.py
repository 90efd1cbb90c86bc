"""General-purpose AS-OF join (point-in-time enrichment).

The reference's only as-of association is event<->schema-version resolution
(J(a), plans/schema_registry.py — cdc/entry/schema_storage.go keeps
multi-version snapshots and resolves each event against the version at its
commit-ts). This operator generalizes that to ANY timestamped dimension:
each left row is enriched with the latest right row whose version-ts <=
the left row's ts, per key.

Spark-first shape — the union-marker pattern, NOT a range join:

    union(left tagged 1, right tagged 0)
      -> window last(right_payload, ignorenulls) over
         (partition by key order by ts, side rows unbounded preceding..current)
      -> filter side = 1

One hash exchange on the key + an in-partition sort; no join node at all,
so there is no row explosion and no per-key right-side scan — a naive
`l JOIN r ON l.k = r.k AND l.ts >= r.vts` + max-filter materializes
O(|l| x versions-per-key) intermediates, which melts at 100 TB. Equal
timestamps resolve INCLUSIVELY (a version effective exactly at the event's
ts matches): right rows sort before left rows at the same instant.

Requires (by, right_ts) unique on the right side (version histories are);
with duplicates the survivor among equal-ts versions is unspecified.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, by: Sequence[str] | str,
              left_ts: str = "ts", right_ts: str = "vts",
              how: str = "left") -> DataFrame:
    """Enrich each left row with the latest right row at or before its
    timestamp, per key. how='left' keeps unmatched left rows with nulls;
    how='inner' drops them."""
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left|inner, got {how!r}")
    by = [by] if isinstance(by, str) else list(by)
    payload = [c for c in right.columns if c not in by]
    r_struct = F.struct(*[F.col(c) for c in payload])
    r2 = right.select(
        *by,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        r_struct.alias("_rv"),
    )
    struct_ddl = r2.schema["_rv"].dataType.simpleString()
    left_cols = left.columns
    l2 = left.select(
        *by,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_ddl).alias("_rv"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lv"),
    )
    u = r2.withColumn("_lv", F.lit(None).cast(l2.schema["_lv"].dataType.simpleString())) \
          .unionByName(l2)
    w = (
        Window.partitionBy(*by).orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w)) \
               .filter(F.col("_side") == 1)
    if how == "inner":
        carried = carried.filter(F.col("_m").isNotNull())
    return carried.select(
        *[F.col(f"_lv.{c}").alias(c) for c in left_cols],
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )
