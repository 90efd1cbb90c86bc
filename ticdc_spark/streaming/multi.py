"""Multi-table changefeed: N tables through one feed.

TiCDC's data model is per-table everywhere — per-table spans and
resolved-ts (/root/reference/cdc/puller/multiplexing_puller.go:175-520),
per-table schema storage (/root/reference/cdc/entry/schema_storage.go:72-153),
per-table DDL barriers with global vs table-scoped events
(/root/reference/cdc/owner/ddl_manager.go:40-85,459-532), and the feed
checkpoint = min over tables
(/root/reference/cdc/scheduler/internal/v3/replication/replication_manager.go:556-731).

Spark-first re-expression: each table is an independent single-table
:class:`~ticdc_spark.streaming.pipeline.Changefeed` over the shared WAL,
filtered by ``table_name`` (a pushed-down predicate — partition the WAL by
table for partition pruning at scale). The reference's table→capture
scheduler assigns tables to nodes; here Spark's scheduler spreads each
table's jobs across executors, and tables progress independently exactly
as TiCDC's replication manager allows. A table-scoped DDL barriers only
its own table (`ddl_only_block_related_table` scenario); a global DDL
(``table_name`` NULL) is replayed into every table's barrier list.

Exactly-once and resume are per-table: each LakeTable manifest carries its
own checkpoint and batch_ids, so a crash mid-feed resumes every table from
its own high-water mark; the feed-level checkpoint reported to the user is
the min over tables.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, table_matches


class MultiTableChangefeed:
    def __init__(
        self,
        spark: SparkSession,
        binlog: DataFrame,
        resolved_log: DataFrame,
        ddl_log: DataFrame | list | None,
        table_factory: Callable[[str], LakeTable],
        config: ChangefeedConfig | None = None,
        tables: list | None = None,
        table_col: str = "table_name",
    ):
        """``binlog`` carries a ``table_col`` column; ``ddl_log`` rows carry
        one too (NULL = global DDL, applied to every table). ``tables``
        skips the discovery scan when the table set is known."""
        self.spark = spark
        self.config = config or ChangefeedConfig(changefeed_id="cf-multi")
        self.table_col = table_col
        if tables is None:
            tables = sorted(
                r[0] for r in binlog.select(table_col).distinct().collect() if r[0] is not None
            )
        # allow/block routing decides the replicated set (filter.go:95-235)
        self.tables = [t for t in tables if table_matches(t, self.config)]
        if isinstance(ddl_log, list) or ddl_log is None:
            ddl_rows = ddl_log or []
        else:
            ddl_rows = ddl_log.collect()
        self.feeds: dict = {}
        for t in self.tables:
            t_ddls = [
                r for r in ddl_rows
                if r[table_col] is None or r[table_col] == t
            ]
            self.feeds[t] = Changefeed(
                spark,
                binlog.filter(F.col(table_col) == t).drop(table_col),
                resolved_log,
                t_ddls,
                table_factory(t),
                replace(self.config, changefeed_id=f"{self.config.changefeed_id}/{t}"),
            )

    # -------------- feed-level aggregation --------------

    def checkpoint(self) -> int:
        """Feed checkpoint = min over tables (replication_manager.go:631-641)."""
        vals = [f.target.checkpoint["resolved_ts"] for f in self.feeds.values()
                if f.target.exists()]
        return min(vals) if vals else 0

    def is_synced(self) -> bool:
        return all(f.is_synced() for f in self.feeds.values())

    def read(self, table: str) -> DataFrame:
        return self.feeds[table].target.read()

    def read_union(self) -> DataFrame:
        """All tables' final states as one DataFrame (schemas reconciled by
        name: a column a table never had is NULL there)."""
        parts = []
        for t in self.tables:
            parts.append(
                self.feeds[t].target.read().withColumn(self.table_col, F.lit(t))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # -------------- the driver loop --------------

    def run(self, max_merges_per_table: int | None = None) -> dict:
        """Advance every table to the current global frontier. Tables are
        independent (per-table barriers/checkpoints); a crash between
        tables resumes cleanly because each manifest self-describes."""
        stats = {"tables": len(self.tables), "merges": 0, "events": 0}
        for t in self.tables:
            s = self.feeds[t].run(max_merges=max_merges_per_table)
            stats["merges"] += s["merges"]
            stats["events"] += s["events"]
        stats["checkpoint"] = self.checkpoint()
        return stats


def route_tables(names: list, allow: tuple = (), block: tuple = ()) -> list:
    """Standalone allow/block router (F1) for callers without a config."""
    cfg = ChangefeedConfig(table_allow=tuple(allow), table_block=tuple(block))
    return [n for n in names if table_matches(n, cfg)]
