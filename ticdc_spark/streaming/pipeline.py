"""Changefeed — the watermark-driven micro-batch driver loop.

This is the owner/processor tick re-expressed
(/root/reference/cdc/owner/changefeed.go:268-527,
/root/reference/cdc/processor/sinkmanager/manager.go:489-663):

per micro-batch
  1. advance the global frontier (min per-partition resolved-ts, W1)
  2. split the window at DDL commit-ts — the barrier
     (/root/reference/cdc/owner/ddl_manager.go:346-532): DML with
     commit_ts <= ddl_ts flushes against the pre-DDL schema, then the
     ALTER applies, then later DML proceeds on the new schema
  3. mount (vectorized pandas-UDF decode vs the snapshot at CRTs-1)
  4. last-writer-wins dedup per handle key
  5. exactly-once MERGE into the lake table, committing per-partition
     lineage + the new checkpoint in the same atomic manifest

Exactly-once across restarts: the batch_id is derived from the window
bounds, recorded in the manifest commit; replaying a window after a crash
is a recognized no-op, and a crash between a barrier-merge and its ALTER
is healed by the idempotent DDL reconciliation at startup
(the changefeed-init edge where a DDL commits exactly at the checkpoint,
/root/reference/cdc/owner/changefeed.go:620-630).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ticdc_spark.functions.mount import mount, mounted_columns
from ticdc_spark.operators.sortdedup import HANDLE_KEY, lww_dedup, split_updates, with_op_rank
from ticdc_spark.plans.schema_registry import BASE_PAYLOAD_FIELDS, SchemaRegistry
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.frontier import frontier_steps


@dataclass
class ChangefeedConfig:
    """ReplicaConfig analog (/root/reference/pkg/config/replica_config.go:132-167)."""

    changefeed_id: str = "cf-1"
    key: tuple = HANDLE_KEY
    n_buckets: int = 16
    frontiers_per_batch: int = 1  # resolved steps folded into one micro-batch
    safe_mode_ts: int = 0  # updates with commit_ts <= this split into D+I (S5)
    defaults: dict = field(default_factory=dict)
    start_ts: int = 0


def table_fields(registry: SchemaRegistry, as_of_ts: int, key=HANDLE_KEY) -> list:
    """Full sink-table schema at a snapshot: key columns + payload columns
    (ts transported as long → timestamp)."""
    snap = registry.snapshot_at(as_of_ts)
    key_fields = [("conv_id", "string"), ("turn_idx", "int")]
    payload = [(n, "timestamp" if n == "ts" and t == "long" else t) for n, t in snap.fields]
    return key_fields + payload


class Changefeed:
    def __init__(
        self,
        spark: SparkSession,
        binlog: DataFrame,
        resolved_log: DataFrame,
        ddl_log: DataFrame | None,
        target: LakeTable,
        config: ChangefeedConfig | None = None,
    ):
        self.spark = spark
        self.binlog = binlog
        self.resolved_log = resolved_log
        self.config = config or ChangefeedConfig()
        self.target = target
        self.registry = SchemaRegistry(BASE_PAYLOAD_FIELDS, base_version=0)
        self.ddl_rows = (
            sorted(ddl_log.collect(), key=lambda r: r["commit_ts"]) if ddl_log is not None else []
        )
        self.registry.replay(self.ddl_rows)  # snapshot chain; lookups are ts-bounded

    # -------------- lifecycle --------------

    def ensure_target(self) -> None:
        if not self.target.exists():
            self.target.create(
                key=list(self.config.key),
                fields=table_fields(self.registry, 0, self.config.key),
                n_buckets=self.config.n_buckets,
                schema_version=0,
            )

    def _reconcile_ddl(self, ckpt: int) -> None:
        """Idempotently re-apply any DDL at or below the checkpoint that the
        table missed (crash between barrier-merge and ALTER)."""
        for d in self.ddl_rows:
            if d["commit_ts"] <= ckpt:
                self.target.alter(
                    d["ddl_type"], d["column"], d["old_column"],
                    d["col_type"] or "string", schema_version=int(d["commit_ts"]),
                )

    # -------------- one sub-batch --------------

    def _apply_window(self, lo: int, hi: int) -> dict:
        batch_id = f"{self.config.changefeed_id}:{lo}:{hi}"
        if batch_id in self.target.committed_batch_ids():
            return {"status": "skipped", "batch_id": batch_id}

        df = self.binlog.filter((F.col("commit_ts") > lo) & (F.col("commit_ts") <= hi))
        if self.config.safe_mode_ts:
            df = split_updates(df, self.config.safe_mode_ts)
        df = with_op_rank(df)

        # per-source-partition lineage (A2/A5): tiny agg, collected
        lineage = [
            {
                "batch_id": batch_id,
                "partition_id": int(r["partition_id"]),
                "resolved_ts": hi,
                "event_count": int(r["n"]),
                "max_commit_ts": int(r["mx"]),
            }
            for r in df.groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("commit_ts").alias("mx"))
            .collect()
        ]

        # DML whose commit_ts equals a DDL finishedTs uses the schema
        # BEFORE the DDL (mounter.go:173) — windows end AT ddl ts, so the
        # decode snapshot is the one at the window's start
        mounted = mount(df, self.registry, as_of_ts=lo if self._ddl_at(hi) else hi,
                        defaults=self.config.defaults)
        deduped = lww_dedup(mounted, self.config.key)
        payload_cols = mounted_columns(
            self.registry, lo if self._ddl_at(hi) else hi
        )
        src = deduped.select(*self.config.key, "op", *payload_cols)
        res = self.target.merge(src, batch_id, lineage_rows=lineage, resolved_ts=hi)
        res["events"] = sum(r["event_count"] for r in lineage)
        return res

    def _ddl_at(self, ts: int) -> dict | None:
        for d in self.ddl_rows:
            if int(d["commit_ts"]) == ts:
                return d
        return None

    # -------------- the driver loop --------------

    def run(self, max_merges: int | None = None) -> dict:
        """Process all currently-resolved input; returns run stats.
        Restartable: picks up from the manifest checkpoint."""
        self.ensure_target()
        ckpt = max(self.target.checkpoint["resolved_ts"], self.config.start_ts)
        self._reconcile_ddl(ckpt)

        steps = frontier_steps(self.resolved_log, low=ckpt)
        # fold k resolved steps into one micro-batch
        k = max(1, self.config.frontiers_per_batch)
        uppers = steps[k - 1 :: k]
        if steps and (not uppers or uppers[-1] != steps[-1]):
            uppers.append(steps[-1])

        merges = 0
        events = 0
        for r in uppers:
            # barrier boundaries inside (ckpt, r]
            bounds = [d for d in self.ddl_rows if ckpt < int(d["commit_ts"]) <= r]
            lo = ckpt
            for d in bounds:
                hi = int(d["commit_ts"])
                res = self._apply_window(lo, hi)
                events += res.get("events", 0)
                merges += res["status"] == "committed"
                # the barrier: quiesce done (merge committed), apply ALTER
                self.target.alter(
                    d["ddl_type"], d["column"], d["old_column"],
                    d["col_type"] or "string", schema_version=hi,
                )
                lo = hi
                if max_merges and merges >= max_merges:
                    return {"merges": merges, "events": events, "checkpoint": lo}
            if lo < r:
                res = self._apply_window(lo, r)
                events += res.get("events", 0)
                merges += res["status"] == "committed"
            ckpt = r
            if max_merges and merges >= max_merges:
                break
        return {"merges": merges, "events": events, "checkpoint": ckpt}


def expected_final_state(
    binlog: DataFrame,
    registry: SchemaRegistry,
    frontier: int,
    key=HANDLE_KEY,
    safe_mode_ts: int = 0,
) -> DataFrame:
    """The batch LWW oracle: what the lake table must equal after replaying
    everything <= frontier (SURVEY §5 — final-state equivalence is the
    reference's own correctness oracle, tests/integration_tests/_utils/check_sync_diff)."""
    df = binlog.filter(F.col("commit_ts") <= frontier)
    if safe_mode_ts:
        df = split_updates(df, safe_mode_ts)
    df = with_op_rank(df)
    mounted = mount(df, registry, as_of_ts=frontier)
    deduped = lww_dedup(mounted, key)
    payload_cols = mounted_columns(registry, frontier)
    return deduped.filter(F.col("op") != "D").select(*key, *payload_cols)
