"""Structured-Streaming mode: tail a binlog directory with a file-source
readStream and apply arrival-ordered micro-batches via foreachBatch.

Two execution modes exist for the same engine:

1. ``pipeline.Changefeed`` — resolved-ts-driven windows (commit-ts space is
   partitioned across batches; barrier-exact DDL). This mirrors TiCDC's
   semantics precisely and is the mode used for DDL scenarios.
2. this module — Spark-native streaming over file arrival. Batch
   boundaries are arbitrary w.r.t. commit-ts, so the sink must be
   order-aware: ``LakeTable.merge_lww`` compares each event against the
   stored ``(_commit_ts, _start_ts, _op_rank)`` and keeps delete
   tombstones, making the final state independent of batching — the
   generalization of the MySQL sink's REPLACE idempotency
   (/root/reference/cdc/sink/dmlsink/txn/mysql/mysql.go:516,533-537).

Exactly-once: Spark's streaming checkpoint provides offset tracking;
re-delivered epochs are no-ops via the batch_id registry committed
atomically with the data (same guarantee as the driver-loop mode).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ticdc_spark.functions.mount import mount, mounted_columns
from ticdc_spark.operators.sortdedup import lww_dedup, with_op_rank
from ticdc_spark.plans.schema_registry import SchemaRegistry
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.streaming.pipeline import ChangefeedConfig, table_fields

BINLOG_SCHEMA = (
    "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, "
    "payload string, pre_payload string, schema_version long, partition_id int"
)

_FAR_FUTURE = 2**62


def run_streaming(
    spark: SparkSession,
    binlog_dir: str,
    target: LakeTable,
    config: ChangefeedConfig | None = None,
    registry: SchemaRegistry | None = None,
    ddl_log=None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> dict:
    """Drain all currently-available binlog files (Trigger.AvailableNow)
    into the lake table. Restartable via ``checkpoint_dir``; safe to call
    repeatedly as new files land.

    DDL in this mode is applied MONOTONICALLY rather than as commit-ts
    barriers: batch boundaries are arbitrary w.r.t. commit-ts here, so
    ``ddl_log`` (rows or DataFrame) is replayed into the registry up front,
    the target evolves to the newest schema, and every event decodes
    against its own writer version (the per-row ``schema_version`` column —
    snapshot-at-CRTs-1, cdc/entry/mounter.go:173). Equivalent final state:
    the schema chain is column-ID-stable (add/rename/drop never reuse an
    id), so late old-version events land as NULL-backfilled rows exactly as
    a barrier replay would produce. Barrier-exact intermediate states need
    the resolved-ts driver loop."""
    config = config or ChangefeedConfig(changefeed_id="cf-stream")
    registry = registry or SchemaRegistry(config.payload_fields)
    ddl_rows = []
    if ddl_log is not None:
        ddl_rows = ddl_log if isinstance(ddl_log, list) else ddl_log.collect()
        ddl_rows = sorted(ddl_rows, key=lambda r: r["commit_ts"])
        registry.replay(ddl_rows)
    if not target.exists():
        target.create(
            key=list(config.key),
            fields=table_fields(registry, _FAR_FUTURE, config.key),
            n_buckets=config.n_buckets,
            schema_version=registry.resolved_ts,
            with_order_cols=True,
            delta_layout=config.delta_layout,
        )
    else:
        ck = target.checkpoint
        hwms = ck.get("epoch_hwms")
        feed_hwm = (
            ck.get("epoch_hwm", -1) if hwms is None  # legacy scalar manifest
            else hwms.get(config.changefeed_id, -1)
        )
        if feed_hwm < 0 and any(
            b.startswith(f"{config.changefeed_id}:epoch-")
            for b in target.committed_batch_ids()
        ):
            feed_hwm = 0
        if feed_hwm >= 0:
            # the target already holds committed epochs for THIS changefeed:
            # a run without a checkpoint (or with a fresh/older one) restarts
            # epochs at 0 and re-reads ALL files — reused epoch ids would
            # collide with committed ones and lose data. The manifest's
            # per-feed epoch-regression raise is the deep defense; this is
            # the friendly up-front one.
            import os as _os
            off_dir = _os.path.join(checkpoint_dir or "", "offsets")
            committed = -1
            if checkpoint_dir and _os.path.isdir(off_dir):
                nums = [int(f) for f in _os.listdir(off_dir) if f.isdigit()]
                committed = max(nums) if nums else -1
            if checkpoint_dir is None or committed < feed_hwm:
                raise ValueError(
                    f"target holds committed epochs (hwm={feed_hwm}) for "
                    f"changefeed {config.changefeed_id!r} but the streaming "
                    f"checkpoint {'is missing' if checkpoint_dir is None else f'only reaches offset {committed}'} "
                    "— resume with the ORIGINAL checkpoint_dir so epochs "
                    "continue instead of restarting at 0"
                )
    # evolve an existing target to the registry's newest schema (idempotent
    # by schema_version — the streaming twin of _reconcile_ddl)
    for d in ddl_rows:
        target.alter(
            d["ddl_type"], d["column"], d["old_column"],
            (d["col_type"] or "string"), schema_version=int(d["commit_ts"]),
        )
    payload_cols = mounted_columns(registry, _FAR_FUTURE)
    # source partition ids, ONCE per run (metadata-cardinality): enables the
    # observe-based per-partition lineage with no per-batch aggregation job
    partitions = sorted(
        int(r[0])
        for r in spark.read.schema(BINLOG_SCHEMA).parquet(binlog_dir)
        .select("partition_id").distinct().collect()
    )
    stats = {"batches": 0, "events": 0}

    def process(batch_df, epoch_id: int):
        from pyspark.sql import Observation

        batch_id = f"{config.changefeed_id}:epoch-{epoch_id}"
        df = with_op_rank(batch_df)
        deduped = lww_dedup(df, config.key, stats=True)
        # lineage rides on the sink's own write via the Observation API —
        # zero extra Spark jobs per micro-batch (same pattern as the
        # resolved-ts driver loop, streaming/pipeline.py)
        obs = Observation(f"lineage-{batch_id}")
        aggs = []
        for p in partitions:
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
                return []  # empty batch: zero tasks, observation never fires
            return [
                {
                    "batch_id": batch_id,
                    "partition_id": int(p),
                    "resolved_ts": None,
                    "event_count": int(vals[f"n_{p}"]),
                    "max_commit_ts": int(vals[f"mx_{p}"]),
                }
                for p in partitions
                if vals.get(f"n_{p}") is not None
            ]

        mounted = mount(deduped, registry, as_of_ts=_FAR_FUTURE, defaults=config.defaults)
        src = mounted.select(
            *config.key, "op", *payload_cols,
            F.col("commit_ts").alias("_commit_ts"),
            F.col("start_ts").alias("_start_ts"),
            F.col("op_rank").alias("_op_rank"),
            (F.col("op") == "D").cast("int").alias("_deleted"),
        )
        # epoch rides into the commit so the manifest can PRUNE old epoch
        # batch_ids by the monotone epoch high-water mark (foreachBatch
        # epochs are monotone; only the newest can be re-delivered) — the
        # arrival-ordered twin of the monotone-window rule
        res = target.merge_lww(src, batch_id, lineage_rows=lineage_rows,
                               epoch=int(epoch_id))
        stats["batches"] += 1
        stats["events"] += sum(r["event_count"] for r in res.get("lineage", []))

    reader = spark.readStream.schema(BINLOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(binlog_dir)
    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return stats


MULTI_BINLOG_SCHEMA = BINLOG_SCHEMA + ", table_name string"


def _epoch_reset_guard(target: LakeTable, feed_id: str,
                       checkpoint_dir: str | None) -> None:
    """Refuse to stream into a target that holds committed epochs for this
    changefeed unless the ORIGINAL streaming checkpoint is supplied —
    restarted epochs would collide with committed ones and lose data (the
    friendly up-front twin of the manifest's epoch-regression raise)."""
    if not target.exists():
        return
    ck = target.checkpoint
    hwms = ck.get("epoch_hwms")
    feed_hwm = (
        ck.get("epoch_hwm", -1) if hwms is None  # legacy scalar manifest
        else hwms.get(feed_id, -1)
    )
    if feed_hwm < 0 and any(
        b.startswith(f"{feed_id}:epoch-") for b in target.committed_batch_ids()
    ):
        feed_hwm = 0
    if feed_hwm >= 0:
        import os as _os
        off_dir = _os.path.join(checkpoint_dir or "", "offsets")
        committed = -1
        if checkpoint_dir and _os.path.isdir(off_dir):
            nums = [int(f) for f in _os.listdir(off_dir) if f.isdigit()]
            committed = max(nums) if nums else -1
        if checkpoint_dir is None or committed < feed_hwm:
            raise ValueError(
                f"target holds committed epochs (hwm={feed_hwm}) for "
                f"changefeed {feed_id!r} but the streaming checkpoint "
                f"{'is missing' if checkpoint_dir is None else f'only reaches offset {committed}'} "
                "— resume with the ORIGINAL checkpoint_dir so epochs "
                "continue instead of restarting at 0"
            )


def run_streaming_multi(
    spark: SparkSession,
    binlog_dir: str,
    table_factory,
    config: ChangefeedConfig | None = None,
    ddl_log=None,
    tables: list | None = None,
    table_col: str = "table_name",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> dict:
    """Multi-table Structured-Streaming twin of
    ``multi.MultiTableChangefeed``: tail ONE WAL directory carrying a whole
    fleet's change events and drain it (Trigger.AvailableNow) with the same
    single-pass execution shape as the driver loop — per micro-batch ONE
    LWW-dedup exchange keyed (table, conv, turn), ONE mount, ONE write job
    partitioned by table, and ONE fsync'd feed-journal append for every
    table in the batch; per-table manifests group-fold at the end of the
    drain. Reference anchor: the processor's sink manager multiplexing N
    tables' sinks through one worker pool
    (/root/reference/cdc/processor/sinkmanager/manager.go:489-663).

    Batch boundaries are ARRIVAL-ordered (arbitrary w.r.t. commit-ts), so
    correctness leans on the order-independent MOR read: deltas carry
    ``(_commit_ts, _start_ts, _op_rank)`` and the read-time ``max_by``
    re-resolves LWW across batches — final state equals the driver loop's
    on the same WAL regardless of file batching (asserted by pytest).
    Consequences of arrival order, handled:

    - replay recognition uses the per-changefeed monotone-EPOCH rule
      (``cf/table:epoch-N`` ids), not the resolved-ts window rule;
    - delete tombstones are retained (a later-arriving lower-commit-ts
      event must still lose to them), so compaction here never drops them;
    - DDL is applied MONOTONICALLY up front exactly as single-table
      ``run_streaming`` does (per-row ``schema_version`` decodes each
      event against its writer schema); barrier-exact intermediate states
      need the driver loop. Lifecycle DDL (create/drop/rename/exchange)
      requires barriers by nature -> rejected here.

    Homogeneous chains (the fleet case) take the one-write-job path; if
    table-scoped DDLs diverge the chains, the batch falls back to
    per-table mount + ``append_delta`` (epoch-recognized), mirroring the
    driver loop's heterogeneous fallback."""
    import os
    import re

    from ticdc_spark.sinks.journal import FeedJournal
    from ticdc_spark.streaming.multi import fold_feed_journal
    from ticdc_spark.streaming.pipeline import table_fields, table_matches

    config = config or ChangefeedConfig(changefeed_id="cf-multi-stream")
    if isinstance(ddl_log, list) or ddl_log is None:
        ddl_rows = sorted(ddl_log or [], key=lambda r: r["commit_ts"])
    else:
        ddl_rows = sorted(ddl_log.collect(), key=lambda r: r["commit_ts"])
    lifecycle = [r for r in ddl_rows
                 if r["ddl_type"] in ("create_table", "drop_table",
                                      "rename_table", "exchange_table_partition")]
    if lifecycle:
        raise ValueError(
            "lifecycle DDL needs barrier semantics — use the resolved-ts "
            "driver loop (MultiTableChangefeed) for create/drop/rename/"
            "exchange scenarios"
        )
    batch_read = spark.read.schema(MULTI_BINLOG_SCHEMA).parquet(binlog_dir)
    if tables is None:
        tables = sorted(
            r[0] for r in batch_read.select(table_col).distinct().collect()
            if r[0] is not None
        )
    tables = [t for t in tables if table_matches(t, config)]
    if not tables:
        return {"tables": 0, "batches": 0, "events": 0}

    # crash recovery FIRST — before the epoch guard reads any manifest and
    # before any DDL bumps schema_version. A crash after journal appends
    # but before the fold leaves manifests lagging the journal: the guard
    # would read a pre-fold epoch hwm (defeating the reset protection),
    # and folding AFTER an alter would stamp old staged files with the new
    # written_version, silently NULLing renamed columns at read time (the
    # driver loop's fold-before-DDL barrier rule, applied at setup). The
    # journal root derives from the factory's PATH only — no create needed.
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", config.changefeed_id)
    feed_dir = os.path.join(
        os.path.dirname(os.path.abspath(table_factory(tables[0]).path)),
        f"_feed_{safe}",
    )
    journal = FeedJournal(feed_dir)
    fold_feed_journal(spark, journal)

    # per-table registry: global rows (table_col NULL) + scoped rows
    registries: dict = {}
    targets: dict = {}
    for t in tables:
        reg = SchemaRegistry(config.payload_fields)
        reg.replay([r for r in ddl_rows
                    if r.get(table_col) is None or r[table_col] == t])
        registries[t] = reg
        tgt = table_factory(t)
        feed_id = f"{config.changefeed_id}/{t}"
        _epoch_reset_guard(tgt, feed_id, checkpoint_dir)
        if not tgt.exists():
            tgt.create(
                key=list(config.key),
                fields=table_fields(reg, _FAR_FUTURE, config.key),
                n_buckets=config.n_buckets,
                schema_version=reg.resolved_ts,
                with_order_cols=True,
                delta_layout=config.delta_layout,
            )
        for d in [r for r in ddl_rows
                  if r.get(table_col) is None or r[table_col] == t]:
            tgt.alter(d["ddl_type"], d["column"], d["old_column"],
                      (d["col_type"] or "string"),
                      schema_version=int(d["commit_ts"]))
        targets[t] = tgt
    homogeneous = len({
        reg.chain_digest(_FAR_FUTURE) for reg in registries.values()
    }) == 1

    probe_reg = registries[tables[0]]
    payload_cols = mounted_columns(probe_reg, _FAR_FUTURE)
    stats = {"tables": len(tables), "batches": 0, "events": 0,
             "wal_scans_per_batch": 1}

    def process(batch_df, epoch_id: int):
        df = with_op_rank(batch_df.filter(F.col(table_col).isin(*tables)))
        deduped = lww_dedup(df, [table_col, *config.key], stats=True).persist()
        try:
            # per-(table, source partition) lineage off the cached dedup —
            # ONE metadata-cardinality aggregate for the whole batch
            agg = (
                deduped.groupBy(table_col, "partition_id")
                .agg(F.sum("_n_events").alias("n"),
                     F.max("_max_commit_ts").alias("mx"))
                .collect()
            )
            if not agg:
                return  # empty batch
            by_table: dict = {}
            for r in agg:
                by_table.setdefault(r[table_col], []).append(r)

            def lineage(t: str, bid: str) -> list:
                return [
                    {"batch_id": bid, "partition_id": int(r["partition_id"]),
                     "resolved_ts": None, "event_count": int(r["n"]),
                     "max_commit_ts": int(r["mx"])}
                    for r in by_table.get(t, [])
                ]

            if homogeneous:
                # the fleet fast path: one mount + ONE write job for every
                # table in the batch + ONE journal append (commit point)
                mounted = mount(deduped, probe_reg, as_of_ts=_FAR_FUTURE,
                                defaults=config.defaults)
                src = mounted.select(
                    table_col, *config.key, "op", *payload_cols,
                    F.col("commit_ts").alias("_commit_ts"),
                    F.col("start_ts").alias("_start_ts"),
                    F.col("op_rank").alias("_op_rank"),
                ).withColumn(
                    "_deleted", (F.col("op") == "D").cast("int")
                ).drop("op")
                # fleet mode (the driver loop's rule, applied per batch):
                # at/above shared_deltas_after applying tables, per-table
                # partition dirs would write O(tasks x tables) tiny files —
                # ONE SHARED per-bucket fileset caps it at O(tasks x
                # buckets), independent of table count; per-table reads
                # filter the discriminator until compaction re-splits
                shared = len(by_table) >= config.shared_deltas_after
                bexpr = F.pmod(F.xxhash64(F.col(config.key[0])),
                               F.lit(config.n_buckets)).cast("int")
                if shared:
                    src = src.withColumn("_bucket", bexpr).sortWithinPartitions(
                        "_bucket", table_col)
                    pcols = ["_bucket"]
                    bucketed = True
                else:
                    pcols = [table_col]
                    bucketed = config.delta_layout == "bucketed"
                    if bucketed:
                        src = src.withColumn("_bucket", bexpr)
                        pcols.append("_bucket")
                seq, staging = journal.new_staging()
                src.write.partitionBy(*pcols).parquet(staging)
                entry_tables = {}
                for t in sorted(by_table):
                    bid = f"{config.changefeed_id}/{t}:epoch-{int(epoch_id)}"
                    rows = lineage(t, bid)
                    entry_tables[t] = {"src": t, "path": targets[t].path,
                                       "bid": bid, "lineage": rows}
                    stats["events"] += sum(r["event_count"] for r in rows)
                journal.append_window(seq, 0, 0, bucketed, entry_tables,
                                      table_col, shared=shared,
                                      epoch=int(epoch_id))
            else:
                # diverged chains: per-table mount + epoch-recognized MOR
                # append (the streaming twin of the driver loop's
                # heterogeneous fallback)
                for t in sorted(by_table):
                    reg = registries[t]
                    sliced = deduped.filter(F.col(table_col) == t).drop(table_col)
                    mounted = mount(sliced, reg, as_of_ts=_FAR_FUTURE,
                                    defaults=config.defaults)
                    cols = mounted_columns(reg, _FAR_FUTURE)
                    src = mounted.select(
                        *config.key, "op", *cols,
                        F.col("commit_ts").alias("_commit_ts"),
                        F.col("start_ts").alias("_start_ts"),
                        F.col("op_rank").alias("_op_rank"),
                    ).withColumn(
                        "_deleted", (F.col("op") == "D").cast("int")
                    ).drop("op")
                    bid = f"{config.changefeed_id}/{t}:epoch-{int(epoch_id)}"
                    rows = lineage(t, bid)
                    targets[t].append_delta(src, bid, lineage_rows=rows,
                                            epoch=int(epoch_id))
                    stats["events"] += sum(r["event_count"] for r in rows)
            stats["batches"] += 1
        finally:
            deduped.unpersist()

    reader = spark.readStream.schema(MULTI_BINLOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(binlog_dir)
    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    # manifests catch up with the journal so ordinary per-table reads see
    # every batch; tombstone-retaining compaction keeps read cost bounded;
    # shared fleet filesets whose last manifest reference compacted away
    # are reclaimed by the same GC the driver loop uses
    from ticdc_spark.streaming.multi import gc_shared_filesets

    fold_feed_journal(spark, journal)
    compacted = False
    for t in tables:
        if targets[t].delta_depth() >= config.compact_every:
            targets[t].compact(drop_tombstones=False)
            compacted = True
    if compacted:
        gc_shared_filesets(spark, journal)
    return stats
