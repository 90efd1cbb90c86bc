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
from ticdc_spark.operators.sortdedup import (
    HANDLE_KEY,
    lww_dedup,
    split_key_changing_updates,
    split_updates,
    with_op_rank,
)
from ticdc_spark.plans.schema_registry import BASE_PAYLOAD_FIELDS, SchemaRegistry
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.frontier import frontier_steps


@dataclass
class ChangefeedConfig:
    """ReplicaConfig analog (/root/reference/pkg/config/replica_config.go:132-167)."""

    changefeed_id: str = "cf-1"
    key: tuple = HANDLE_KEY
    n_buckets: int = 16
    # base (version-0) payload schema of the transcript table; override for
    # feeds whose payload carries extra typed columns (e.g. modify_column
    # scenarios start from an int column)
    payload_fields: tuple = BASE_PAYLOAD_FIELDS
    frontiers_per_batch: int = 1  # resolved steps folded into one micro-batch
    safe_mode_ts: int = 0  # updates with commit_ts <= this split into D+I (S5)
    defaults: dict = field(default_factory=dict)
    start_ts: int = 0
    # finish-at semantics (changefeed_finish integration test; TargetTs in
    # cdc/model/changefeed.go): nothing with commit_ts > target_ts ever
    # replicates; once the source frontier resolves past it the final
    # window clamps AT target_ts, the checkpoint reaches it, and the feed
    # is FINISHED (terminal — run() becomes a no-op). None = unbounded.
    target_ts: int | None = None
    # sink mode: "mor" appends LWW deltas and compacts every `compact_every`
    # batches (LSM trade — O(batch) ingest; the production default), "cow"
    # rewrites affected buckets per batch (Iceberg copy-on-write MERGE
    # semantics — the reference path for consumers that need merge-free reads)
    sink_mode: str = "mor"
    compact_every: int = 8
    # MOR delta layout: "flat" = max ingest throughput (the north metric);
    # "bucketed" = O(bucket delta) point reads between compactions (7.9x)
    # at ~1.7x ingest cost — measured trade-off, BENCH/OPERATORS.md
    delta_layout: str = "flat"
    # force-replicate (replica_config.go:135; force_replicate_table
    # integration test): replicate a KEYLESS table append-only — no dedup,
    # no MERGE; every event lands as a row of an insert log (op and
    # commit_ts become ordinary columns). The F4 default (refuse keyless
    # tables) stays; this is the explicit opt-in degradation.
    force_replicate: bool = False
    # DDL-free spans of resolved windows are executed as ONE Spark job
    # (window-id partitioned write; each window still commits its OWN
    # fileset/batch-id/syncpoint/lineage via one group manifest rewrite).
    # This amortizes the per-job serial constant (~1s of plan/codegen/
    # commit) across up to this many windows — the single-table twin of
    # the multi-table feed journal. 1 disables batching.
    max_windows_per_job: int = 16
    # initial-load fast path: when the FIRST span lands on an EMPTY table
    # (no base, no deltas, no truncate incarnation), fold it across
    # windows and write the compacted BASE directly — the normal path
    # would write every window as a delta and immediately compact,
    # writing the data twice and decoding one row per key PER WINDOW.
    # Exactly-once and final state are bit-identical (LWW is associative;
    # every window still commits its own batch id/syncpoint/lineage
    # atomically) — tests/test_mor.py proves state equality vs the flag
    # off. The 100-TB initial-sync path.
    bootstrap_fast_path: bool = True
    # multi-table homogeneous windows: at/above this many applying tables,
    # the window's delta is written as ONE SHARED per-bucket fileset (all
    # tables mixed, clustered by table within each bucket file) instead of
    # per-table partition dirs. Per-window file count becomes
    # O(tasks x buckets) — independent of table count — which is what keeps
    # a 100k-table fleet from writing tasks x N tiny files per window; the
    # trade is that per-table MOR reads before the next compaction scan the
    # shared window files and filter (deltas are recent and small; the
    # compactor re-splits per table). Measured: scripts/bench_commit_tail.py
    shared_deltas_after: int = 32
    # snapshot expiry (W8): every N committed merges, expire snapshots older
    # than the newest `expire_keep_last`, except versions protected by the
    # GC safepoint (checkpoint >= gc_safepoint_ts is never expired). 0 = off.
    expire_every: int = 0
    expire_keep_last: int = 2
    gc_safepoint_ts: int | None = None
    # source partitions the frontier must hear from before advancing; None
    # derives the set from the resolved log itself (a partition that never
    # reports would then NOT hold the frontier at 0 — set this in production)
    expected_partitions: int | None = None
    # ---- event/table filters (pkg/filter/filter.go:95-235 +
    # replica_config.go:132-167 analog) ----
    # regex allow/block lists over table names (multi-table feeds): a table
    # replicates iff it matches an allow pattern (or allow is None) and no
    # block pattern. Single-table feeds ignore these.
    table_allow: tuple = ()
    table_block: tuple = ()
    # event ops to drop outright (sql_event_filter 'ignore-event' analog)
    ignore_ops: tuple = ()
    # SQL boolean expression over event columns; matching events are DROPPED
    # (expr_filter.go:249 'ignore-*-value-expr' analog)
    ignore_event_expr: str | None = None
    # transactions to skip by start_ts (filter.go:159-184 ignore-txn-start-ts)
    ignore_start_ts: tuple = ()
    # BDR mode (replica_config.go:147; bdr_mode integration test): in a
    # bidirectional-replication pair, events the PEER cluster's changefeed
    # applied here carry its origin marker — re-replicating them back would
    # loop forever. With bdr_mode on, events whose `origin` column names a
    # different cluster are dropped before the sink; locally-originated
    # writes (origin NULL or == cluster_id) replicate normally.
    bdr_mode: bool = False
    cluster_id: str = "cluster-1"
    # P3 integrity verification: when the binlog carries a `checksum`
    # column, recompute it over the payload and QUARANTINE mismatches
    # (dropped from the merge; surfaced via quarantine_count in run stats —
    # cdc/entry/mounter.go:453-523)
    verify_checksums: bool = False
    checksum_algo: str = "md5"


def apply_event_filters(df: DataFrame, config: "ChangefeedConfig") -> DataFrame:
    """Configured event filters, applied BEFORE the update splits and dedup
    (the reference filters at the puller, pkg/filter/filter.go:95-235).
    All are native Column predicates — they push down into the WAL scan."""
    if config.ignore_ops:
        df = df.filter(~F.col("op").isin(*config.ignore_ops))
    if config.ignore_start_ts:
        df = df.filter(~F.col("start_ts").isin(*[int(t) for t in config.ignore_start_ts]))
    if config.ignore_event_expr:
        df = df.filter(~F.expr(config.ignore_event_expr))
    if config.bdr_mode and "origin" in df.columns:
        # replication-loop guard (BDR, replica_config.go:147): drop events
        # the peer cluster originated; pushed into the WAL scan like every
        # other filter
        df = df.filter(
            F.col("origin").isNull() | (F.col("origin") == config.cluster_id)
        )
    return df


def table_matches(name: str, config: "ChangefeedConfig") -> bool:
    """Allow/block-list table routing (filter.go:95-235): replicate iff the
    name matches an allow pattern (or the allow list is empty) and no block
    pattern. Full-match regex, like the reference's table matchers."""
    import re as _re

    if config.table_allow and not any(_re.fullmatch(p, name) for p in config.table_allow):
        return False
    return not any(_re.fullmatch(p, name) for p in config.table_block)


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
        self.registry = SchemaRegistry(self.config.payload_fields, base_version=0)
        # ddl_log: a DataFrame (collected — the DDL stream is tiny by
        # nature), or an already-collected list of rows/dicts
        if ddl_log is None:
            self.ddl_rows = []
        elif isinstance(ddl_log, list):
            self.ddl_rows = sorted(ddl_log, key=lambda r: r["commit_ts"])
        else:
            self.ddl_rows = sorted(ddl_log.collect(), key=lambda r: r["commit_ts"])
        self.registry.replay(self.ddl_rows)  # snapshot chain; lookups are ts-bounded

    # -------------- lifecycle --------------

    def ensure_target(self) -> None:
        if self.target.exists():
            return
        if self.config.force_replicate:
            tf = table_fields(self.registry, 0, self.config.key)
            nk = len(self.config.key)
            self.target.create(
                key=[],
                fields=tf[:nk] + [("op", "string"), ("commit_ts", "long")] + tf[nk:],
                n_buckets=self.config.n_buckets,
                schema_version=0,
                append_only=True,
            )
            return
        self.target.create(
            key=list(self.config.key),
            fields=table_fields(self.registry, 0, self.config.key),
            n_buckets=self.config.n_buckets,
            schema_version=0,
            with_order_cols=(self.config.sink_mode == "mor"),
            delta_layout=self.config.delta_layout,
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

    def _prepare_window(self, df: DataFrame, batch_id: str):
        """Shared pre-dedup pipeline on a WAL slice: configured event
        filters, checksum quarantine, update splits, op-rank. Returns
        (df, quarantine_observation|None)."""
        df = apply_event_filters(df, self.config)
        qobs = None
        if self.config.verify_checksums and "checksum" in df.columns:
            # P3: recompute + quarantine corrupt rows; the count rides the
            # same scan via an Observation (no extra job)
            from pyspark.sql import Observation

            if self.config.checksum_algo == "md5":
                recomputed = F.md5(F.coalesce(F.col("payload"), F.lit("")))
            else:
                recomputed = F.xxhash64(F.coalesce(F.col("payload"), F.lit(""))).cast("string")
            ok = F.col("checksum").isNull() | (F.col("checksum") == recomputed)
            qobs = Observation(f"quarantine-{batch_id}")
            df = df.withColumn("_ck_ok", ok).observe(
                qobs, F.sum(F.when(~F.col("_ck_ok"), 1).otherwise(0)).alias("quarantined")
            ).filter(F.col("_ck_ok")).drop("_ck_ok", "checksum")
        # key-changing updates FIRST (they stop being 'U'), then safe mode
        df = split_key_changing_updates(df, self.config.key)
        if self.config.safe_mode_ts:
            df = split_updates(df, self.config.safe_mode_ts)
        # pre_payload is consumed by the splits above and op is an exact
        # function of op_rank — dropping both keeps dead bytes out of the
        # dedup shuffle (the one exchange per batch)
        return with_op_rank(df).drop("pre_payload", "op"), qobs

    @staticmethod
    def _dedup_window(df: DataFrame, key) -> DataFrame:
        """LWW dedup with per-key lineage stats folded into the SAME
        aggregate: one scan + one shuffle per batch total. ``key`` may be
        extended with a table column (multi-table single-pass mode)."""
        deduped = lww_dedup(df, list(key), stats=True)
        return deduped.withColumn(
            "op",
            F.when(F.col("op_rank") == 1, "D").when(F.col("op_rank") == 2, "U").otherwise("I"),
        )

    def _append_window(self, lo: int, hi: int) -> dict:
        """Force-replicate window: filters + mount, NO dedup shuffle and no
        merge — the whole window appends as insert-log rows in one narrow
        write (the cheapest possible sink; the degradation the reference
        applies to no-PK tables)."""
        from pyspark.sql import Observation

        batch_id = f"{self.config.changefeed_id}:{lo}:{hi}"
        if hi <= max(self.target.checkpoint["resolved_ts"], self.config.start_ts) or (
            batch_id in self.target.committed_batch_ids()
        ):
            return {"status": "skipped", "batch_id": batch_id}
        df = self.binlog.filter((F.col("commit_ts") > lo) & (F.col("commit_ts") <= hi))
        df, qobs = self._prepare_window(df, batch_id)
        df = df.withColumn(
            "op",
            F.when(F.col("op_rank") == 1, "D").when(F.col("op_rank") == 2, "U").otherwise("I"),
        )
        obs = Observation(f"lineage-{batch_id}")
        aggs = []
        for p in self._partitions:
            aggs.append(F.sum(F.when(F.col("partition_id") == p, 1)).alias(f"n_{p}"))
            aggs.append(F.max(F.when(F.col("partition_id") == p, F.col("commit_ts"))).alias(f"mx_{p}"))
        df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"), *aggs)
        # DML at a DDL's commit-ts decodes against the PRE-DDL snapshot
        # (mounter.go:173), same as the merge path
        as_of = lo if self._ddl_at(hi) else hi
        mounted = mount(df, self.registry, as_of_ts=as_of, defaults=self.config.defaults)
        payload_cols = mounted_columns(self.registry, as_of)
        src = mounted.select(*self.config.key, "op", "commit_ts", *payload_cols)

        def lineage_rows():
            try:
                vals = obs.get
            except Exception:
                return []
            return [
                {"batch_id": batch_id, "partition_id": int(p), "resolved_ts": hi,
                 "event_count": int(vals[f"n_{p}"]), "max_commit_ts": int(vals[f"mx_{p}"])}
                for p in self._partitions
                if vals.get(f"n_{p}") is not None
            ]

        res = self.target.append_log(src, batch_id, lineage_rows=lineage_rows,
                                     resolved_ts=hi)
        res["events"] = sum(r["event_count"] for r in res.get("lineage", []))
        return res

    def _bootstrap_eligible(self) -> bool:
        """True when the NEXT span would land on a completely empty table —
        the initial-load fast path's gate (no base files, no deltas, no
        truncate incarnation)."""
        if not self.config.bootstrap_fast_path or not self.target.exists():
            return False
        m = self.target.manifest()
        return (
            not any(info["files"] for info in m["buckets"].values())
            and not m.get("deltas")
            and not m.get("truncate_ts", 0)
        )

    def _apply_windows_batched(self, lo: int, uppers: list) -> dict:
        """Execute a DDL-free SPAN of resolved windows as ONE Spark job:
        filter once, dedup once per (window, key), mount once, write once
        partitioned by window id — then commit every window's fileset,
        batch id, syncpoint and lineage in ONE group manifest rewrite
        (:meth:`LakeTable.append_delta_files_group`). Per-window cost
        collapses from ~1 s of plan/codegen/commit serial constant to a
        partition dir listing; semantics are bit-identical to the
        per-window path (windows dedup independently; the LWW read
        re-resolves across them, exactly as with separate batches).

        Crash contract: the group commit is atomic — a crash before it
        leaves only unreferenced staged files (reaped by snapshot expiry),
        after it every window is durable with its own batch id."""
        hi = uppers[-1]
        span_id = f"{self.config.changefeed_id}:{lo}:{hi}:span"
        df = self.binlog.filter((F.col("commit_ts") > lo) & (F.col("commit_ts") <= hi))
        df, qobs = self._prepare_window(df, span_id)
        # window id = index of the first upper bound >= commit_ts
        wexpr = F.lit(len(uppers) - 1)
        for i in range(len(uppers) - 2, -1, -1):
            wexpr = F.when(F.col("commit_ts") <= uppers[i], i).otherwise(wexpr)
        df = df.withColumn("_win", wexpr.cast("int"))
        m = self.target.manifest()
        bucketed = m.get("delta_layout", "flat") == "bucketed"
        # initial-load fast path: on an EMPTY table the span IS the
        # table's first content — fold it across windows (LWW is
        # associative over (commit_ts, start_ts, op_rank)) and write
        # the compacted BASE once, instead of delta-writing every
        # window and immediately compacting (2x write, and decode of
        # one row per key per WINDOW instead of per key)
        bootstrap = (
            self.config.bootstrap_fast_path
            and not any(info["files"] for info in m["buckets"].values())
            and not m.get("deltas")
            and not m.get("truncate_ts", 0)
        )
        if not bootstrap and self.config.sink_mode != "mor":
            raise RuntimeError(
                "span execution on a non-empty CoW table — the span "
                "gate only admits CoW for the bootstrap span")
        # bootstrap: NO cache — the raw span feeds the write job and the
        # lineage-stats job straight from the WAL scan; the stats job
        # prunes to (commit_ts, partition_id), so the re-scan is far
        # cheaper than materializing the undeduped span (which at a true
        # 100-TB initial load would cache the whole corpus — the r5
        # VERDICT wart). The delta path still caches its (much smaller)
        # per-window dedup output, which two jobs genuinely share.
        deduped = (
            df if bootstrap
            else self._dedup_window(df, ["_win", *self.config.key]).persist()
        )
        try:
            import os as _os
            import uuid as _uuid

            staging = _os.path.join(self.target.data_dir, _uuid.uuid4().hex)
            if bootstrap:
                n_buckets = m["n_buckets"]
                dp = self.spark.sparkContext.defaultParallelism
                raw = deduped.drop("_win")
                aligned = n_buckets >= dp
                if aligned:
                    # exchange the raw span ONCE, placed bucket->partition
                    # 1:1 (operators/placement.py); the (bucket, key)
                    # aggregate reuses that partitioning (bucket is a
                    # function of key[0], so the groups are identical to a
                    # plain key dedup) in a single sort pass — no map-side
                    # partial sort — and the partitionBy write streams
                    # straight out of mount: the mounted rows are never
                    # exchanged a second time and each task writes exactly
                    # one bucket file.
                    from ticdc_spark.operators.placement import (
                        placement_token_column,
                    )

                    raw = raw.withColumn(
                        "_bucket",
                        self.target._bucket_expr(n_buckets,
                                                 self.config.key[0]),
                    ).withColumn(
                        "_pt",
                        placement_token_column(self.spark, n_buckets,
                                               F.col("_bucket")),
                    ).repartition(n_buckets, F.col("_pt"))
                    final = self._dedup_window(
                        raw, ["_pt", "_bucket", *self.config.key]
                    ).drop("_pt")
                else:
                    # fewer buckets than cores: bucket-aligned placement
                    # would underuse the cluster, so spread the raw span
                    # by key[0] (the aggregate reuses it — still a single
                    # sort pass) and align buckets only in a second small
                    # exchange of the already-deduped mounted rows.
                    raw = raw.repartition(dp, F.col(self.config.key[0]))
                    final = self._dedup_window(raw, self.config.key)
                # final-state tombstones leave the base entirely — exactly
                # what compact(drop_tombstones=True) produces in this mode
                final = final.filter(F.col("op_rank") != 1)
                mounted = mount(final, self.registry, as_of_ts=hi,
                                defaults=self.config.defaults)
                payload_cols = mounted_columns(self.registry, hi)
                # CoW tables carry no LWW order metadata in their schema;
                # write exactly the target's columns
                meta_cols = (
                    [
                        F.col("commit_ts").alias("_commit_ts"),
                        F.col("start_ts").alias("_start_ts"),
                        F.col("op_rank").alias("_op_rank"),
                        (F.col("op") == "D").cast("int").alias("_deleted"),
                    ]
                    if "_commit_ts" in [x[0] for x in m["schema"]]
                    else []
                )
                if aligned:
                    src = mounted.select(
                        "_bucket", *self.config.key, *payload_cols,
                        *meta_cols,
                    )
                else:
                    src = mounted.select(
                        *self.config.key, *payload_cols, *meta_cols,
                    ).withColumn(
                        "_bucket",
                        self.target._bucket_expr(n_buckets,
                                                 self.config.key[0]),
                    ).repartition(n_buckets, F.col("_bucket"))
                src.write.partitionBy("_bucket").parquet(staging)
            else:
                mounted = mount(deduped, self.registry, as_of_ts=hi,
                                defaults=self.config.defaults)
                payload_cols = mounted_columns(self.registry, hi)
                src = mounted.select(
                    "_win", *self.config.key, *payload_cols,
                    F.col("commit_ts").alias("_commit_ts"),
                    F.col("start_ts").alias("_start_ts"),
                    F.col("op_rank").alias("_op_rank"),
                    (F.col("op") == "D").cast("int").alias("_deleted"),
                )
                pcols = ["_win"]
                if bucketed:
                    src = src.withColumn(
                        "_bucket",
                        F.pmod(F.xxhash64(F.col(self.config.key[0])),
                               F.lit(m["n_buckets"])).cast("int"),
                    )
                    pcols.append("_bucket")
                src.write.partitionBy(*pcols).parquet(staging)
            # per-(window, source partition) lineage: one metadata-
            # cardinality job amortized over the whole span (bootstrap
            # re-scans the WAL pruned to two columns; the delta path reads
            # its cached per-window dedup with folded per-key stats)
            if bootstrap:
                stats = (
                    deduped.groupBy("_win", "partition_id")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.max("commit_ts").alias("mx"))
                    .collect()
                )
            else:
                stats = (
                    deduped.groupBy("_win", "partition_id")
                    .agg(F.sum("_n_events").alias("n"),
                         F.max("_max_commit_ts").alias("mx"))
                    .collect()
                )
            by_win: dict = {}
            for r in stats:
                by_win.setdefault(int(r["_win"]), []).append(r)
            batches = []
            prev = lo
            for i, u in enumerate(uppers):
                batch_id = f"{self.config.changefeed_id}:{prev}:{u}"
                wdir = _os.path.join(staging, f"_win={i}")
                files: list = []
                buckets: dict | None = None
                if not bootstrap and _os.path.isdir(wdir):
                    if bucketed:
                        buckets = {}
                        for d in sorted(_os.listdir(wdir)):
                            if d.startswith("_bucket="):
                                bdir = _os.path.join(wdir, d)
                                buckets[d.split("=", 1)[1]] = sorted(
                                    _os.path.join(bdir, x)
                                    for x in _os.listdir(bdir)
                                    if x.endswith(".parquet")
                                )
                        files = sorted(f for fl in buckets.values() for f in fl)
                    else:
                        files = sorted(
                            _os.path.join(wdir, x)
                            for x in _os.listdir(wdir) if x.endswith(".parquet")
                        )
                rows = [
                    {"batch_id": batch_id, "partition_id": int(r["partition_id"]),
                     "resolved_ts": u, "event_count": int(r["n"]),
                     "max_commit_ts": int(r["mx"])}
                    for r in by_win.get(i, [])
                ]
                batches.append({"batch_id": batch_id, "files": files,
                                "buckets": buckets, "resolved_ts": u,
                                "lineage_rows": rows})
            if bootstrap:
                bucket_files: dict = {}
                for d in sorted(_os.listdir(staging)):
                    if d.startswith("_bucket="):
                        bdir = _os.path.join(staging, d)
                        bucket_files[d.split("=", 1)[1]] = sorted(
                            _os.path.join(bdir, x)
                            for x in _os.listdir(bdir) if x.endswith(".parquet")
                        )
                res = self.target.bootstrap_base_group(batches, bucket_files)
            else:
                res = self.target.append_delta_files_group(batches)
        finally:
            if not bootstrap:
                deduped.unpersist()
        out = {"status": "committed" if res["status"] == "committed" else "skipped",
               "windows": res.get("batches", 0),
               "events": sum(r["event_count"] for r in res.get("lineage", []))}
        if qobs is not None:
            try:
                out["quarantined"] = int(qobs.get.get("quarantined") or 0)
            except Exception:
                out["quarantined"] = 0
        return out

    def _apply_window(self, lo: int, hi: int) -> dict:
        if self.config.force_replicate:
            return self._append_window(lo, hi)
        batch_id = f"{self.config.changefeed_id}:{lo}:{hi}"
        # recognition is two-tier: the monotone-window rule (a window whose
        # upper bound is at/below the checkpoint was already applied — lets
        # the manifest PRUNE old batch ids instead of growing forever) plus
        # the live batch-id set for in-flight windows
        if hi <= self.target.checkpoint["resolved_ts"] or (
            batch_id in self.target.committed_batch_ids()
        ):
            return {"status": "skipped", "batch_id": batch_id}

        df = self.binlog.filter((F.col("commit_ts") > lo) & (F.col("commit_ts") <= hi))
        df, qobs = self._prepare_window(df, batch_id)
        # dedup BEFORE mount: the decode then touches only surviving rows
        deduped = self._dedup_window(df, self.config.key)
        return self._sink_deduped(deduped, lo, hi, qobs=qobs)

    def _sink_deduped(self, deduped: DataFrame, lo: int, hi: int,
                      qobs=None) -> dict:
        """Mount + exactly-once sink of an already-deduped window slice.
        Split out of :meth:`_apply_window` so the multi-table single-pass
        driver can dedup ALL tables in one shuffle and feed each table's
        slice here (streaming/multi.py)."""
        batch_id = f"{self.config.changefeed_id}:{lo}:{hi}"
        if hi <= max(self.target.checkpoint["resolved_ts"], self.config.start_ts) or (
            batch_id in self.target.committed_batch_ids()
        ):
            return {"status": "skipped", "batch_id": batch_id}

        # per-source-partition lineage (A2/A5) via the Observation API:
        # the metrics ride on the sink's own action — NO extra Spark job
        # per micro-batch. partition_id is a function of conv_id, so
        # per-key stats aggregate exactly.
        from pyspark.sql import Observation

        obs = Observation(f"lineage-{batch_id}")
        aggs = []
        for p in self._partitions:
            aggs.append(
                F.sum(F.when(F.col("partition_id") == p, F.col("_n_events"))).alias(f"n_{p}")
            )
            aggs.append(
                F.max(F.when(F.col("partition_id") == p, F.col("_max_commit_ts"))).alias(f"mx_{p}")
            )
        deduped = deduped.observe(obs, F.count(F.lit(1)).alias("n_keys"), *aggs)

        def lineage_rows():
            try:
                vals = obs.get
            except Exception:
                # an empty window schedules zero tasks, so the Observation
                # never fires — no events means no lineage rows
                return []
            rows = []
            for p in self._partitions:
                if vals.get(f"n_{p}") is not None:
                    rows.append(
                        {
                            "batch_id": batch_id,
                            "partition_id": int(p),
                            "resolved_ts": hi,
                            "event_count": int(vals[f"n_{p}"]),
                            "max_commit_ts": int(vals[f"mx_{p}"]),
                        }
                    )
            return rows

        # DML whose commit_ts equals a DDL finishedTs uses the schema
        # BEFORE the DDL (mounter.go:173) — windows end AT ddl ts, so the
        # decode snapshot is the one at the window's start
        as_of = lo if self._ddl_at(hi) else hi
        mounted = mount(deduped, self.registry, as_of_ts=as_of,
                        defaults=self.config.defaults)
        payload_cols = mounted_columns(self.registry, as_of)
        if self.config.sink_mode == "mor":
            src = mounted.select(
                *self.config.key, *payload_cols,
                F.col("commit_ts").alias("_commit_ts"),
                F.col("start_ts").alias("_start_ts"),
                F.col("op_rank").alias("_op_rank"),
                (F.col("op") == "D").cast("int").alias("_deleted"),
            )
            res = self.target.append_delta(
                src, batch_id, lineage_rows=lineage_rows, resolved_ts=hi
            )
        else:
            src = mounted.select(*self.config.key, "op", *payload_cols)
            res = self.target.merge(src, batch_id, lineage_rows=lineage_rows, resolved_ts=hi)
        res["events"] = sum(r["event_count"] for r in res.get("lineage", []))
        if qobs is not None:
            try:
                res["quarantined"] = int(qobs.get.get("quarantined") or 0)
            except Exception:
                res["quarantined"] = 0
        return res

    def is_synced(self, use_cached_frontier: bool = True) -> bool:
        """Synced detection (W7, /root/reference/cdc/api/v2/changefeed.go:974-976):
        the feed is fully synced when the sink checkpoint has reached the
        source's global frontier — every resolved event is applied.

        ``run()`` caches the frontier it already computed, so the common
        call pattern (run → is_synced) costs ZERO extra Spark jobs — the
        single-table twin of the multi-table feed's one-job rule. Pass
        ``use_cached_frontier=False`` to re-read a resolved log that may
        have grown since the last run."""
        from ticdc_spark.sources.frontier import global_frontier

        gf = getattr(self, "_cached_frontier", None)
        if not use_cached_frontier or gf is None:
            gf = global_frontier(self.resolved_log)
            self._cached_frontier = gf
        return self.target.checkpoint["resolved_ts"] >= gf

    @property
    def is_finished(self) -> bool:
        """Finish-at state (W5; changefeed_finish integration test): a feed
        with target_ts set is terminal once its sink checkpoint reaches it.
        The owner (ChangefeedManager) flips the registry state to
        ``finished`` on observing this."""
        t = self.config.target_ts
        if t is None or not self.target.exists():
            return False
        return max(self.target.checkpoint["resolved_ts"], self.config.start_ts) >= t

    def syncpoints(self) -> list:
        """Syncpoint store analog (K8,
        /root/reference/cdc/syncpointstore/mysql_syncpoint_store.go:133-180):
        (source resolved-ts → lake snapshot version) pairs, one per commit —
        the mapping a consistent cross-system snapshot read needs. Read from
        the table's append-only sidecar (bounded manifests)."""
        return [
            {"primary_ts": rts, "version": v}
            for rts, v in self.target.syncpoints()
        ]

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
        # source partition ids, once per run (tiny): drives the observe-based
        # per-partition lineage without a per-batch aggregation job
        self._partitions = sorted(
            int(r[0]) for r in self.resolved_log.select("partition_id").distinct().collect()
        )

        steps = frontier_steps(
            self.resolved_log, low=ckpt,
            expected_partitions=self.config.expected_partitions,
        )
        # cache the frontier this job already computed: run -> is_synced
        # costs no extra frontier job (steps empty => frontier <= ckpt,
        # for which ckpt is an equivalent bound)
        self._cached_frontier = steps[-1] if steps else ckpt
        # fold k resolved steps into one micro-batch
        k = max(1, self.config.frontiers_per_batch)
        uppers = steps[k - 1 :: k]
        if steps and (not uppers or uppers[-1] != steps[-1]):
            uppers.append(steps[-1])
        tgt = self.config.target_ts
        if tgt is not None:
            # finish-at: windows past target_ts never run; the last window
            # clamps AT target_ts once the frontier has resolved past it
            reached = bool(steps) and steps[-1] >= tgt
            uppers = [u for u in uppers if u < tgt]
            if reached and ckpt < tgt:
                uppers.append(tgt)

        merges = 0
        events = 0
        quarantined = 0
        last_expired = 0  # merges count at the last snapshot-expiry tick

        def _ticks():
            nonlocal last_expired
            if (
                self.config.sink_mode == "mor"
                and not self.config.force_replicate
                and self.target.delta_depth() >= self.config.compact_every
            ):
                # resolved-ts mode: nothing older than the checkpoint can
                # arrive → tombstones are droppable at compaction
                self.target.compact(drop_tombstones=True)
            # span batching advances `merges` by the span size, so an exact
            # `merges % expire_every == 0` test would fire gcd-dependently;
            # fire whenever the counter CROSSES a multiple since last tick
            ee = self.config.expire_every
            if ee and merges // ee > last_expired // ee:
                last_expired = merges
                self.target.expire_snapshots(
                    keep_last=self.config.expire_keep_last,
                    safepoint_ts=self.config.gc_safepoint_ts,
                )

        i = 0
        while i < len(uppers):
            r = uppers[i]
            # barrier boundaries inside (ckpt, r]
            bounds = [d for d in self.ddl_rows if ckpt < int(d["commit_ts"]) <= r]
            if (
                not bounds
                and not self.config.force_replicate
                and self.config.max_windows_per_job > 1
                and (self.config.sink_mode == "mor"
                     # CoW takes the span path ONLY for the bootstrap span
                     # (empty table): the folded base write is mode-
                     # agnostic; steady-state CoW stays per-window MERGE
                     or self._bootstrap_eligible())
            ):
                # DDL-free span: schedule up to max_windows_per_job windows
                # as ONE Spark job with per-window group commits — the
                # per-batch serial constant amortizes across the span
                cap = self.config.max_windows_per_job
                if max_merges:
                    cap = min(cap, max_merges - merges)
                j = i
                while (
                    j + 1 < len(uppers) and (j + 1 - i) < cap
                    and not any(
                        uppers[j] < int(d["commit_ts"]) <= uppers[j + 1]
                        for d in self.ddl_rows
                    )
                ):
                    j += 1
                if j > i:
                    res = self._apply_windows_batched(ckpt, uppers[i:j + 1])
                    events += res.get("events", 0)
                    quarantined += res.get("quarantined", 0)
                    merges += res.get("windows", 0)
                    ckpt = uppers[j]
                    i = j + 1
                    _ticks()
                    if max_merges and merges >= max_merges:
                        break
                    continue
            lo = ckpt
            stop = False
            for d in bounds:
                hi = int(d["commit_ts"])
                res = self._apply_window(lo, hi)
                events += res.get("events", 0)
                quarantined += res.get("quarantined", 0)
                merges += res["status"] == "committed"
                # the barrier: quiesce done (merge committed), apply ALTER
                self.target.alter(
                    d["ddl_type"], d["column"], d["old_column"],
                    d["col_type"] or "string", schema_version=hi,
                )
                lo = hi
                if max_merges and merges >= max_merges:
                    return {"merges": merges, "events": events, "checkpoint": lo,
                            "quarantined": quarantined}
            if lo < r:
                res = self._apply_window(lo, r)
                events += res.get("events", 0)
                quarantined += res.get("quarantined", 0)
                merges += res["status"] == "committed"
            ckpt = r
            _ticks()
            if max_merges and merges >= max_merges:
                stop = True
            i += 1
            if stop:
                break
        return {"merges": merges, "events": events, "checkpoint": ckpt,
                "quarantined": quarantined}


def expected_final_state(
    binlog: DataFrame,
    registry: SchemaRegistry,
    frontier: int,
    key=HANDLE_KEY,
    safe_mode_ts: int = 0,
    config: ChangefeedConfig | None = None,
) -> DataFrame:
    """The batch LWW oracle: what the lake table must equal after replaying
    everything <= frontier (SURVEY §5 — final-state equivalence is the
    reference's own correctness oracle, tests/integration_tests/_utils/check_sync_diff)."""
    df = binlog.filter(F.col("commit_ts") <= frontier)
    if 0 < registry.truncate_ts <= frontier:
        # a truncate wipes everything at/below it; only later DML survives
        df = df.filter(F.col("commit_ts") > registry.truncate_ts)
    if config is not None:
        df = apply_event_filters(df, config)
    df = split_key_changing_updates(df, key)
    if safe_mode_ts:
        df = split_updates(df, safe_mode_ts)
    df = with_op_rank(df)
    mounted = mount(df, registry, as_of_ts=frontier)
    deduped = lww_dedup(mounted, key)
    payload_cols = mounted_columns(registry, frontier)
    return deduped.filter(F.col("op") != "D").select(*key, *payload_cols)
