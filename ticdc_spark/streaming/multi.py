"""Multi-table changefeed: N tables through ONE feed, single-pass.

TiCDC multiplexes every table's spans through one puller pass
(/root/reference/cdc/puller/multiplexing_puller.go:175-520) and targets
100,000 tables per node (docs/design/2022-03-16-ticdc-db-sorter.md:177-181);
per-table state is everywhere else — per-table schema storage
(/root/reference/cdc/entry/schema_storage.go:72-153), per-table DDL barriers
with global vs table-scoped events
(/root/reference/cdc/owner/ddl_manager.go:40-85,459-532), and the feed
checkpoint = min over tables
(/root/reference/cdc/scheduler/internal/v3/replication/replication_manager.go:556-731).

Spark-first single-pass execution: per frontier window the shared WAL is
scanned ONCE and LWW-deduped ONCE with ``table_name`` prepended to the
handle key — one shuffle for all N tables — then each table's slice is a
narrow filter off the persisted dedup output, mounted against that table's
schema registry and committed to its own LakeTable. Work per window is
O(window events) + N cheap cached filters, not N full WAL scans. Store the
WAL partitioned by ``table_name`` (:func:`write_wal_partitioned`) so any
residual per-table scan partition-prunes.

Mid-stream table lifecycle (batch_add_table / multi_tables_ddl analogs,
/root/reference/tests/integration_tests/batch_add_table/,
/root/reference/cdc/entry/schema/snapshot.go:412-551):

- ``create_table`` DDL at ts c: a new feed activates at the barrier; its
  windows start at c (upstream guarantees no DML below a table's create-ts).
- ``drop_table`` at ts d: the feed applies its final window ending at d,
  then deactivates (replicated data is retained, as TiCDC's sink does).
- ``rename_table`` at ts r (``old_column`` = old name, ``table_name`` = new
  name): same target table, same registry; WAL events carry the old name
  through r and the new name after — windows split at r, so each window
  filters exactly one source name.

Exactly-once and resume stay per-table: each LakeTable manifest carries its
own checkpoint and batch_ids, so a crash mid-feed resumes every table from
its own high-water mark; the feed-level checkpoint is the min over tables.
"""

from __future__ import annotations

import os
import re
import shutil

from collections.abc import Callable
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ticdc_spark.sinks.journal import FeedJournal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.frontier import frontier_steps
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, table_matches

_LIFECYCLE = ("create_table", "recover_table", "drop_table", "rename_table",
              "rename_tables", "exchange_table_partition",
              "add_table_partition", "drop_table_partition",
              "reorganize_partition")


def _logical(name: str) -> str:
    """Logical table of a feed key: partition feeds are keyed
    ``<table>#<partition>`` (each upstream partition is its own
    replication span, /root/reference/cdc/entry/schema/snapshot.go:64 —
    partition ids are first-class physical tables there)."""
    return name.split("#", 1)[0]


def write_wal_partitioned(df: DataFrame, path: str, table_col: str = "table_name") -> None:
    """Persist a multi-table WAL partitioned by table so per-table reads
    partition-prune instead of scanning every table's events (the storage
    layout the single-pass driver assumes at scale)."""
    df.write.partitionBy(table_col).parquet(path)


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
        partitions: dict | None = None,
    ):
        """``binlog`` carries a ``table_col`` column; ``ddl_log`` rows carry
        one too (NULL = global DDL, applied to every table). ``tables``
        skips the discovery scan when the table set is known. Tables with a
        ``create_table`` DDL activate at that barrier even if absent from
        ``tables``/discovery.

        ``partitions`` maps a LOGICAL table to its partition names
        (snapshot.go:64,218-246 — each upstream partition is its own
        replication span): ``{"pt": ["p0", "p1"]}`` expands to feed keys
        ``pt#p0``/``pt#p1``, whose WAL events arrive under those physical
        names. Column DDLs scoped to the logical name apply to every
        partition feed; :meth:`read_logical` unions the partition targets;
        ``exchange_table_partition`` (ddl row: table_name = partition feed
        key, old_column = the normal table) swaps the partition's target
        with the normal table's at the barrier — the downstream half of
        the upstream metadata swap, O(1) metadata, no data movement."""
        self.spark = spark
        self.binlog = binlog
        self.resolved_log = resolved_log
        self.config = config or ChangefeedConfig(changefeed_id="cf-multi")
        self.table_col = table_col
        self.table_factory = table_factory
        if isinstance(ddl_log, list) or ddl_log is None:
            self.ddl_rows = sorted(ddl_log or [], key=lambda r: r["commit_ts"])
        else:
            self.ddl_rows = sorted(ddl_log.collect(), key=lambda r: r["commit_ts"])
        # ActionTruncateTablePartition (ALTER TABLE ... TRUNCATE PARTITION,
        # /root/reference/cdc/entry/schema_storage_test.go:826): downstream
        # it is exactly a truncate of the PARTITION SPAN's target — the
        # existing per-span truncate_table path, scoped to the span key.
        # ActionCreateTables (batch CREATE, snapshot.go:51): order-
        # independent per-table creates at one barrier — normalize into
        # individual create_table rows (table_name = comma-joined names).
        normalized = []
        for r in self.ddl_rows:
            if r["ddl_type"] == "truncate_table_partition":
                normalized.append(
                    {**(r.asDict() if hasattr(r, "asDict") else dict(r)),
                     "ddl_type": "truncate_table"})
            elif r["ddl_type"] == "create_tables":
                base = r.asDict() if hasattr(r, "asDict") else dict(r)
                for t in r[table_col].split(","):
                    normalized.append(
                        {**base, "ddl_type": "create_table", table_col: t})
            else:
                normalized.append(r)
        self.ddl_rows = normalized
        self.lifecycle = [r for r in self.ddl_rows if r["ddl_type"] in _LIFECYCLE]
        created = {r[table_col] for r in self.lifecycle if r["ddl_type"] == "create_table"}
        if tables is None:
            tables = sorted(
                r[0] for r in binlog.select(table_col).distinct().collect() if r[0] is not None
            )
            # renamed tables appear in the WAL under BOTH names; only the
            # original (pre-rename) name is a table of its own at start
            renamed_to = {r[table_col] for r in self.lifecycle if r["ddl_type"] == "rename_table"}
            for r in self.lifecycle:
                if r["ddl_type"] == "rename_tables":
                    # atomic multi-rename: exclude new names NOT also being
                    # renamed away at the same barrier (a cyclic swap keeps
                    # every name live; a plain batch rename retires olds)
                    olds = set(r["old_column"].split(","))
                    renamed_to |= {n for n in r["column"].split(",") if n not in olds}
            tables = [t for t in tables if t not in renamed_to]
        # partitioned tables: expand each logical table into its spans
        self.partitions = dict(partitions or {})
        expanded = []
        for t in tables:
            for p in self.partitions.get(t, [None]):
                expanded.append(t if p is None else f"{t}#{p}")
        # allow/block routing decides the replicated set (filter.go:95-235),
        # matched on the LOGICAL name for partition spans;
        # mid-stream creates start INACTIVE and activate at their barrier
        self.tables = [
            t for t in expanded
            if table_matches(_logical(t), self.config) and t not in created
        ]
        self.feeds: dict = {}
        # current WAL source name per feed key (diverges on rename)
        self._source_name: dict = {}
        # per-feed driver-cached state (checkpoint, layout, delta depth):
        # the window loop must not re-read N manifest JSONs per window
        self._state: dict = {}
        for t in self.tables:
            self._add_feed(t, start_ts=self.config.start_ts)
        # feed-level window journal root: a DETERMINISTIC sibling of the
        # table dirs (same name on resume; same filesystem, so fold renames
        # never degrade to copies)
        probe_name = self.tables[0] if self.tables else next(
            (r[table_col] for r in self.lifecycle if r["ddl_type"] == "create_table"),
            None,
        )
        self.feed_dir = None
        if probe_name is not None:
            safe = re.sub(r"[^A-Za-z0-9_.-]", "_", self.config.changefeed_id)
            self.feed_dir = os.path.join(
                os.path.dirname(os.path.abspath(table_factory(probe_name).path)),
                f"_feed_{safe}",
            )
        self._journal: FeedJournal | None = None

    @property
    def journal(self) -> FeedJournal:
        if self._journal is None:
            if self.feed_dir is None:
                raise RuntimeError("feed has no tables; no journal root")
            self._journal = FeedJournal(self.feed_dir)
        return self._journal

    def _table_ddls(self, t: str) -> list:
        """Column-DDL rows scoped to table t (global rows included; a row
        scoped to a LOGICAL table covers every partition span of it)."""
        return [
            r for r in self.ddl_rows
            if r["ddl_type"] not in _LIFECYCLE
            and (r[self.table_col] is None or r[self.table_col] == t
                 or r[self.table_col] == _logical(t))
        ]

    def _add_feed(self, t: str, start_ts: int) -> None:
        self.feeds[t] = Changefeed(
            self.spark,
            self.binlog.filter(F.col(self.table_col) == t).drop(self.table_col),
            self.resolved_log,
            self._table_ddls(t),
            self.table_factory(t),
            replace(self.config, changefeed_id=f"{self.config.changefeed_id}/{t}",
                    start_ts=start_ts),
        )
        self._source_name[t] = t

    # -------------- feed-level aggregation --------------

    def checkpoint(self) -> int:
        """Feed checkpoint = min over tables (replication_manager.go:631-641)."""
        vals = [f.target.checkpoint["resolved_ts"] for f in self.feeds.values()
                if f.target.exists()]
        return min(vals) if vals else 0

    @property
    def is_finished(self) -> bool:
        """Finish-at state (changefeed_finish): target_ts set and EVERY
        table's checkpoint has reached it — terminal for the whole fleet."""
        t = self.config.target_ts
        if t is None or not self.feeds:
            return False
        return all(
            f.target.exists() and f.target.checkpoint["resolved_ts"] >= t
            for f in self.feeds.values()
        )

    def is_synced(self) -> bool:
        """Synced when every table's checkpoint reached the shared global
        frontier — computed ONCE (the per-feed form would run one frontier
        job per table; at fleet scale that is N jobs for one boolean)."""
        from ticdc_spark.sources.frontier import global_frontier

        if not self.feeds:
            return True
        gf = global_frontier(self.resolved_log,
                             self.config.expected_partitions)
        return all(
            f.target.checkpoint["resolved_ts"] >= gf
            for f in self.feeds.values()
        )

    def read(self, table: str) -> DataFrame:
        return self.feeds[table].target.read()

    def read_logical(self, logical: str) -> DataFrame:
        """A partitioned table's LOGICAL state: union of its partition
        spans' targets (partition pruning on the physical span is free —
        each partition is its own storage unit)."""
        keys = sorted(
            t for t in self.feeds
            if t == logical or _logical(t) == logical
        )
        if not keys:
            raise KeyError(f"no feeds for logical table {logical!r}")
        out = self.feeds[keys[0]].target.read()
        for t in keys[1:]:
            out = out.unionByName(self.feeds[t].target.read(),
                                  allowMissingColumns=True)
        return out

    def read_union(self) -> DataFrame:
        """All tables' final states as one DataFrame (schemas reconciled by
        name: a column a table never had is NULL there)."""
        parts = []
        for t in sorted(self.feeds):
            parts.append(
                self.feeds[t].target.read().withColumn(self.table_col, F.lit(t))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # -------------- driver-cached per-feed state --------------

    def _load_state(self, t: str) -> None:
        """ONE manifest read per (feed, load point) — refreshed only at
        resume, create barriers, and compactions. Everything the window
        loop consults per window (checkpoint, truncate incarnation, delta
        layout, delta depth) lives here so per-window driver cost is
        independent of both table count and manifest size."""
        f = self.feeds[t]
        m = f.target.manifest()
        self._state[t] = {
            "ckpt": max(m["checkpoint"]["resolved_ts"], f.config.start_ts),
            "truncate": bool(m.get("truncate_ts", 0)),
            "layout": m.get("delta_layout", "flat"),
            "n_buckets": m["n_buckets"],
            "depth": len(m.get("deltas", [])),
        }

    # -------------- lifecycle barriers --------------

    def _apply_lifecycle(self, d) -> None:
        ts = int(d["commit_ts"])
        t = d[self.table_col]
        if d["ddl_type"] in ("create_table", "recover_table"):
            # ActionRecoverTable (FLASHBACK/RECOVER, snapshot.go:51,492 —
            # treated as create): drop_table RETAINS the target's data, so
            # the recovered feed re-attaches to it — the pre-drop rows ARE
            # the recovered content (TiDB recovers by un-deleting the
            # physical table), and post-recover DML applies on top; events
            # in the dropped gap never replicate, matching upstream where
            # the table did not exist to receive writes.
            if t in self.feeds:
                return  # idempotent replay (resume past this barrier)
            if not table_matches(t, self.config):
                return
            self._add_feed(t, start_ts=ts)
            f = self.feeds[t]
            f.ensure_target()
            # catch the new target's schema up to create time: global column
            # DDLs below the create barrier apply to the newborn table too
            f._reconcile_ddl(ts)
            f._partitions = getattr(self, "_partitions", [])
            self._load_state(t)
        elif d["ddl_type"] == "drop_table":
            self.feeds.pop(t, None)  # stop replicating; data retained
            self._source_name.pop(t, None)
            self._state.pop(t, None)
        elif d["ddl_type"] == "rename_table":
            old = d["old_column"]
            if old in self.feeds and t not in self.feeds:
                self.feeds[t] = self.feeds.pop(old)
                self._source_name[t] = t  # WAL carries the new name after ts
                del self._source_name[old]
                if old in self._state:
                    self._state[t] = self._state.pop(old)
        elif d["ddl_type"] == "rename_tables":
            # ActionRenameTables (RENAME TABLE a TO b, b TO a, ...;
            # /root/reference/cdc/entry/schema_storage.go:405): ATOMIC
            # multi-rename — all (old -> new) pairs swap simultaneously
            # against a snapshot of the pre-barrier feed map, so cyclic
            # renames (the a<->b swap) do not chain through intermediate
            # states the way sequential rename_table applications would.
            olds = d["old_column"].split(",")
            news = d["column"].split(",")
            snap = {o: (self.feeds.get(o), self._state.get(o)) for o in olds}
            for o in olds:
                if snap[o][0] is not None:
                    self.feeds.pop(o, None)
                    self._source_name.pop(o, None)
                    self._state.pop(o, None)
            for o, nn in zip(olds, news):
                f, st = snap[o]
                if f is None or nn in self.feeds:
                    continue
                self.feeds[nn] = f
                self._source_name[nn] = nn  # WAL carries the new name after ts
                if st is not None:
                    self._state[nn] = st
        elif d["ddl_type"] == "exchange_table_partition":
            # ALTER TABLE <logical> EXCHANGE PARTITION p WITH TABLE <nt>
            # (snapshot.go:218-246 swaps the physical ids): upstream swaps
            # DATA by metadata, so downstream swaps the two spans' targets.
            # Replay-safe: the feed->target map is rebuilt from the factory
            # at construction, so re-applying the barrier on resume
            # reconstructs the same post-exchange association.
            pk, nt = t, d["old_column"]
            if pk in self.feeds and nt in self.feeds:
                fp, fn = self.feeds[pk], self.feeds[nt]
                fp.target, fn.target = fn.target, fp.target
                if pk in self._state and nt in self._state:
                    self._state[pk], self._state[nt] = (
                        self._state[nt], self._state[pk])
        elif d["ddl_type"] == "add_table_partition":
            # ALTER TABLE <logical> ADD PARTITION (schema_storage_test.go:
            # 825): a NEW replication span activates at the barrier — the
            # partition id is a first-class physical table upstream
            # (snapshot.go:64), so downstream this is create_table for the
            # span key; global/logical column DDLs below the barrier catch
            # the newborn span up, same as create.
            if t in self.feeds or not table_matches(_logical(t), self.config):
                return
            self._add_feed(t, start_ts=ts)
            f = self.feeds[t]
            f.ensure_target()
            f._reconcile_ddl(ts)
            f._partitions = getattr(self, "_partitions", [])
            self._load_state(t)
        elif d["ddl_type"] == "drop_table_partition":
            # ALTER TABLE <logical> DROP PARTITION (schema_storage_test.go:
            # 824): upstream deletes the partition's rows by metadata, so
            # the span leaves the logical table — replication stops and
            # read_logical() no longer unions the span's target (files
            # retained for time travel, same posture as drop_table).
            self.feeds.pop(t, None)
            self._source_name.pop(t, None)
            self._state.pop(t, None)
        elif d["ddl_type"] == "reorganize_partition":
            self._apply_reorganize(d, ts)

    def _apply_reorganize(self, d, ts: int) -> None:
        """ALTER TABLE <logical> REORGANIZE PARTITION p.. INTO (p'.. VALUES
        LESS THAN ..) (/root/reference/cdc/entry/schema_storage_test.go:833,
        ActionReorganizePartition): upstream re-shards the named partitions'
        rows into new physical partitions by the range metadata carried IN
        the DDL. DDL row encoding: ``table_name`` = the logical table,
        ``old_column`` = comma-joined old partition names, ``column`` =
        comma-joined new partition names, ``col_type`` = ';'-joined SQL
        boolean predicates routing a row to each new span in order (the
        VALUES LESS THAN metadata; the LAST span takes the remainder, so
        len(predicates) == len(new spans) - 1).

        Downstream: the new spans activate at the barrier, the old spans'
        final state (consistent — lifecycle barriers run between windows)
        is re-sharded into the new targets by the routing predicates as ONE
        LWW merge per new span, and the old spans leave the feed. Replay
        safety: the migration merge carries batch_id ``reorg-<ts>`` and
        resolved_ts=<ts>, so re-applying the barrier on resume is
        recognized (batch-id tier, or checkpoint tier once later windows
        advanced past ts) and skipped — exactly-once, no regression of
        post-barrier writes."""
        logical = d[self.table_col]
        olds = [f"{logical}#{p}" for p in d["old_column"].split(",")]
        news = [f"{logical}#{p}" for p in d["column"].split(",")]
        preds = [p.strip() for p in (d["col_type"] or "").split(";") if p.strip()]
        if len(preds) != len(news) - 1:
            raise ValueError(
                "reorganize_partition needs one routing predicate per new "
                "span except the last (remainder)")
        for nk in news:
            if nk in self.feeds:
                continue
            self._add_feed(nk, start_ts=ts)
            f = self.feeds[nk]
            f.ensure_target()
            f._reconcile_ddl(ts)
            f._partitions = getattr(self, "_partitions", [])
        src = None
        for ok in olds:
            f = self.feeds.pop(ok, None)
            self._source_name.pop(ok, None)
            self._state.pop(ok, None)
            if f is not None and f.target.exists():
                # include_meta: migrated rows keep their ORIGINAL LWW order
                # metadata, so post-barrier events win ties exactly as if
                # the rows had always lived in the new span
                r = f.target.read(include_meta=True)
                src = r if src is None else src.unionByName(r)
        if src is not None:
            route = None
            for i, p in enumerate(preds):
                cond = F.expr(p)
                route = F.when(cond, i) if route is None else route.when(cond, i)
            routed = src.withColumn(
                "_route",
                route.otherwise(len(news) - 1) if route is not None
                else F.lit(0),
            )
            for i, nk in enumerate(news):
                part = (
                    routed.filter(F.col("_route") == i)
                    .drop("_route")
                    .withColumn("op", F.lit("I"))
                )
                self.feeds[nk].target.merge(
                    part, batch_id=f"reorg-{ts}", resolved_ts=ts)
        for nk in news:
            self._load_state(nk)

    def _replay_lifecycle_below(self, ckpt: int) -> None:
        """Resume: re-apply lifecycle barriers at/below the checkpoint so a
        fresh engine instance reconstructs the live table set (idempotent —
        create of an existing feed is a no-op, targets self-describe)."""
        for d in self.lifecycle:
            if int(d["commit_ts"]) <= ckpt:
                self._apply_lifecycle(d)

    def _apply_column_ddl(self, d) -> None:
        ts = int(d["commit_ts"])
        scope = (
            list(self.feeds) if d[self.table_col] is None else
            [t for t in self.feeds
             if t == d[self.table_col] or _logical(t) == d[self.table_col]]
        )
        for t in scope:
            self.feeds[t].target.alter(
                d["ddl_type"], d["column"], d["old_column"],
                d["col_type"] or "string", schema_version=ts,
            )
            if d["ddl_type"] == "truncate_table" and t in self._state:
                # new table incarnation: fast path must re-check stale-DML
                # drops per table; truncate also cleared every delta fileset
                self._state[t]["truncate"] = True
                self._state[t]["depth"] = 0

    # -------------- the single-pass driver loop --------------

    def run(self, max_merges_per_table: int | None = None) -> dict:
        """Advance every table to the current global frontier, scanning the
        shared WAL ONCE per window (not once per table): filters + update
        splits + the LWW dedup shuffle run over all tables together with
        ``table_name`` prepended to the key; each table then consumes a
        narrow cached filter of the dedup output. Windows split at every
        table's DDL commit-ts (a barrier only quiesces its own table's
        slice; others just see a finer window)."""
        # crash recovery FIRST: pending journal windows are durable but not
        # yet in the per-table manifests — fold so every checkpoint below
        # reflects them (a lagging checkpoint would replay lifecycle
        # barriers short and mis-place the window loop's start)
        self._fold_journal()
        # reap orphan fleet-bootstrap staging (a crash mid-bootstrap leaves
        # the uncommitted span dir; committed tables are non-empty and the
        # gate routes the rest through the normal path)
        if self.feed_dir and os.path.isdir(self.feed_dir):
            for d in os.listdir(self.feed_dir):
                if d.startswith("_bootstrap_"):
                    shutil.rmtree(os.path.join(self.feed_dir, d),
                                  ignore_errors=True)
        # resume: rebuild live table set, targets, and missed column DDL
        start_ckpt = self.checkpoint()
        self._replay_lifecycle_below(start_ckpt)
        for f in self.feeds.values():
            f.ensure_target()
            f._reconcile_ddl(f.target.checkpoint["resolved_ts"])
        self._partitions = sorted(
            int(r[0]) for r in self.resolved_log.select("partition_id").distinct().collect()
        )
        for f in self.feeds.values():
            f._partitions = self._partitions
        for t in self.feeds:
            self._load_state(t)

        effective = [st["ckpt"] for st in self._state.values()]
        ckpt = min(effective) if effective else self.config.start_ts
        steps = frontier_steps(
            self.resolved_log, low=ckpt,
            expected_partitions=self.config.expected_partitions,
        )
        k = max(1, self.config.frontiers_per_batch)
        uppers = steps[k - 1 :: k]
        if steps and (not uppers or uppers[-1] != steps[-1]):
            uppers.append(steps[-1])
        tgt = self.config.target_ts
        if tgt is not None:
            # finish-at (changefeed_finish): the whole fleet stops AT
            # target_ts — same clamp rule as the single-table feed
            reached = bool(steps) and steps[-1] >= tgt
            uppers = [u for u in uppers if u < tgt]
            if reached and ckpt < tgt:
                uppers.append(tgt)

        stats = {"tables": len(self.feeds), "merges": 0, "events": 0,
                 "windows": 0, "wal_scans_per_window": 1}
        merged_windows = 0

        def _ticks():
            due = [
                t for t, f in self.feeds.items()
                if f.config.sink_mode == "mor"
                and self._state[t]["depth"] >= f.config.compact_every
            ]
            if due:
                self._fold_journal()
                for t in due:
                    self.feeds[t].target.compact(drop_tombstones=True)
                    self._load_state(t)
                self._gc_shared()

        i = 0
        while i < len(uppers):
            r = uppers[i]
            bounds = [d for d in self.ddl_rows if ckpt < int(d["commit_ts"]) <= r]
            if (
                not bounds
                and self.config.sink_mode == "mor"
                and self.config.max_windows_per_job > 1
            ):
                # DDL-free span: schedule up to max_windows_per_job windows
                # x all tables as ONE job (the span twin of the single-table
                # batched path; each (window, table) still commits its own
                # batch id through the journal)
                cap = self.config.max_windows_per_job
                if max_merges_per_table:
                    cap = min(cap, max_merges_per_table - merged_windows)
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
                    span = uppers[i:j + 1]
                    s = self._apply_span_all(ckpt, span)
                    stats["merges"] += s["merges"]
                    stats["events"] += s["events"]
                    stats["windows"] += len(span)
                    stats["write_jobs"] = stats.get("write_jobs", 0) + s.get("write_jobs", 0)
                    merged_windows += s.get("windows_merged", 0)
                    ckpt = uppers[j]
                    i = j + 1
                    _ticks()
                    if max_merges_per_table and merged_windows >= max_merges_per_table:
                        break
                    continue
            lo = ckpt
            for d in bounds + [None]:
                hi = r if d is None else int(d["commit_ts"])
                if lo < hi:
                    s = self._apply_window_all(lo, hi)
                    stats["merges"] += s["merges"]
                    stats["events"] += s["events"]
                    stats["windows"] += 1
                    stats["write_jobs"] = stats.get("write_jobs", 0) + s.get("write_jobs", 0)
                    merged_windows += s["merges"] > 0
                if d is not None:
                    # the barrier: quiesce done, fold pending journal
                    # windows (manifest state must be current before a DDL
                    # mutates schema_version or the table set), apply DDL
                    self._fold_journal()
                    if d["ddl_type"] in _LIFECYCLE:
                        self._apply_lifecycle(d)
                    else:
                        self._apply_column_ddl(d)
                lo = hi
            ckpt = r
            _ticks()
            i += 1
            if max_merges_per_table and merged_windows >= max_merges_per_table:
                break
        # end-of-run fold: manifests catch up with the journal so external
        # readers (tests, downstream queries, a fresh engine instance) see
        # every window through the ordinary per-table read path
        self._fold_journal()
        stats["tables"] = len(self.feeds)
        stats["checkpoint"] = self.checkpoint()
        return stats

    def _apply_window_all(self, lo: int, hi: int) -> dict:
        return self._apply_span_all(lo, [hi])

    def _apply_span_all(self, lo: int, uppers: list) -> dict:
        """A DDL-free SPAN of windows, all tables: ONE WAL scan + ONE dedup
        exchange + (homogeneous fast path) ONE write job for the whole
        span x table cross-product — each (window, table) still commits
        its own batch id through the journal. A single-window call is the
        degenerate span."""
        hi = uppers[-1]
        live = {
            t: f for t, f in self.feeds.items() if hi > self._state[t]["ckpt"]
        }
        out = {"merges": 0, "events": 0, "windows_merged": 0}
        if not live:
            return out
        wal = self.binlog.filter(
            (F.col("commit_ts") > lo) & (F.col("commit_ts") <= hi)
        )
        # source-name routing: each live feed reads exactly one WAL name in
        # this span (spans never cross rename barriers)
        names = {self._source_name[t]: t for t in live}
        wal = wal.filter(F.col(self.table_col).isin(*names))
        probe = next(iter(live.values()))
        df, qobs = probe._prepare_window(wal, f"{self.config.changefeed_id}:{lo}:{hi}")
        span = len(uppers) > 1
        if span:
            # window id = index of the first upper bound >= commit_ts;
            # dedup stays PER WINDOW (the LWW read re-resolves across
            # windows, exactly as with separate batches)
            wexpr = F.lit(len(uppers) - 1)
            for i in range(len(uppers) - 2, -1, -1):
                wexpr = F.when(F.col("commit_ts") <= uppers[i], i).otherwise(wexpr)
            df = df.withColumn("_win", wexpr.cast("int"))
            dkey = ["_win", self.table_col, *self.config.key]
        else:
            dkey = [self.table_col, *self.config.key]
        # FLEET initial load: when the whole span lands on empty tables,
        # skip the per-window pre-dedup, the table-clustering sort and the
        # cache entirely — one direct (table, key) LWW over the raw span
        # plus one column-pruned stats re-scan (see _fleet_bootstrap)
        if span and self._fleet_bootstrap(live, names, df, lo, uppers, out):
            if qobs is not None:
                try:
                    out["quarantined"] = int(qobs.get.get("quarantined") or 0)
                except Exception:
                    out["quarantined"] = 0
            return out
        deduped = probe._dedup_window(df, dkey)
        # cluster the cached dedup output by table WITHIN partitions (no
        # extra exchange): cache batches become single-table runs, so each
        # table's slice filter prunes other tables' batches via the
        # in-memory scan's per-batch column stats instead of rescanning the
        # whole cache N times
        deduped = deduped.sortWithinPartitions(self.table_col).persist()
        try:
            if not self._apply_homogeneous(live, names, deduped, lo, uppers, out):
                # heterogeneous (diverged schema chains, DDL-at-boundary,
                # truncate, CoW mode): per window, MOR tables without a
                # truncate incarnation still share ONE union write job per
                # type-compatibility group (mount per table, union by name,
                # partitionBy(table), one journal append) — per-table DDL
                # churn no longer degrades to N write jobs per window.
                # Serial per-table sink remains only for CoW (base rewrite
                # is per-table by nature) and truncate tables (their
                # stale-DML drop lives inside append_delta). Manifests must
                # be CURRENT before any direct per-table commit — it would
                # advance the checkpoint past an unfolded journal window,
                # whose later fold would be wrongly recognized as replay.
                self._fold_journal()
                prev = lo
                for i, u in enumerate(uppers):
                    wdf = (
                        deduped.filter(F.col("_win") == i).drop("_win")
                        if span else deduped
                    )
                    batched, serial = [], []
                    for name, t in sorted(names.items()):
                        if (live[t].config.sink_mode == "mor"
                                and not self._state[t]["truncate"]):
                            if u > self._state[t]["ckpt"]:
                                batched.append((name, t))
                        else:
                            serial.append((name, t))
                    w_merged = 0
                    if batched:
                        w_merged += self._sink_union_window(
                            live, batched, wdf, prev, u, out)
                    for name, t in serial:
                        feed = live[t]
                        sliced = wdf.filter(
                            F.col(self.table_col) == name
                        ).drop(self.table_col)
                        res = feed._sink_deduped(sliced, prev, u)
                        out["events"] += res.get("events", 0)
                        committed = res["status"] == "committed"
                        out["merges"] += committed
                        w_merged += committed
                        out["write_jobs"] = out.get("write_jobs", 0) + 1
                        st = self._state[t]
                        st["ckpt"] = max(st["ckpt"], u)
                        if committed and feed.config.sink_mode == "mor":
                            st["depth"] += 1
                    out["windows_merged"] += w_merged > 0
                    prev = u
        finally:
            deduped.unpersist()
        if qobs is not None:
            try:
                out["quarantined"] = int(qobs.get.get("quarantined") or 0)
            except Exception:
                out["quarantined"] = 0
        return out

    def _fleet_bootstrap(self, live: dict, names: dict, df,
                         lo: int, uppers: list, out: dict) -> bool:
        """FLEET initial-load fast path — the multi-table twin of the
        single-table bootstrap span (pipeline.py): when every applying
        table's target is completely EMPTY, no journal window is pending,
        and no table resumes mid-span, the span folds ONCE across windows
        per (table, key) DIRECTLY off the raw prepared span — no
        per-window pre-dedup exchange, no table-clustering sort, no cache
        of the undeduped span (at a true 100-TB initial load that cache
        would hold the whole corpus) — mounts only the survivors, and
        writes every table's compacted BASE in one
        partitionBy(table, bucket) job. Lineage re-scans the WAL pruned
        to (win, table, partition_id, commit_ts). Per-window batch ids /
        syncpoints / lineage commit atomically per table; the journal is
        bypassed for the span (its per-window O(1) amortization exists
        for steady state; an initial load pays N manifest commits ONCE).
        The normal path would journal every window as deltas and write
        the data again at the first fold + compaction. Excluded: CoW,
        diverged schema chains, DDL-at-boundary, truncate incarnations,
        shared fleet filesets (their per-bucket mixed files have no
        per-table split yet) and mixed bucket counts — those fleets take
        the normal path, correct either way."""
        import uuid as _uuid

        cfg = self.config
        hi = uppers[-1]
        if not cfg.bootstrap_fast_path or cfg.sink_mode != "mor":
            return False
        digests = set()
        for name, t in names.items():
            feed = live[t]
            st = self._state[t]
            if feed._ddl_at(hi) is not None or st["truncate"]:
                return False
            if st["ckpt"] >= uppers[0]:
                return False  # resumes mid-span: per-window path handles it
            digests.add(feed.registry.chain_digest(hi))
        if len(digests) > 1:
            return False  # diverged chains: one mount can't decode all
        applying = names
        nb_all = {self._state[t]["n_buckets"] for t in applying.values()}
        if len(nb_all) != 1:
            return False
        if len(applying) >= cfg.shared_deltas_after:
            return False  # shared fileset mode owns fleets this large
        if self.journal.pending():
            return False  # unfolded windows: manifests understate state

        def empty(t):
            tg = live[t].target
            if not tg.exists():
                return False
            m = tg.manifest()
            return (not any(i["files"] for i in m["buckets"].values())
                    and not m.get("deltas") and not m.get("truncate_ts", 0))

        if not all(empty(t) for t in applying.values()):
            return False
        from ticdc_spark.functions.mount import mount, mounted_columns

        probe = live[next(iter(applying.values()))]
        nb = next(iter(nb_all))
        n_slots = len(applying) * nb
        dp = self.spark.sparkContext.defaultParallelism
        raw = df.drop("_win").withColumn(
            "_bucket",
            F.pmod(F.xxhash64(F.col(cfg.key[0])), F.lit(nb)).cast("int"),
        )
        if n_slots >= dp:
            # the fleet twin of the single-table aligned bootstrap: ONE
            # exchange of the raw span, placed (table, bucket) -> partition
            # 1:1 (operators/placement.py — plain hash-on-(table,bucket)
            # collides and staggers the whole dedup+mount+write stage);
            # the (table, bucket, key) aggregate reuses the partitioning
            # in a single sort pass, and the partitionBy write streams
            # straight out of mount — the mounted rows are never
            # exchanged a second time, one file per (table, bucket).
            from ticdc_spark.operators.placement import placement_token_column

            tnames = sorted(applying)
            tmap = F.create_map(
                *[x for i, tn in enumerate(tnames)
                  for x in (F.lit(tn), F.lit(i))]
            )
            idx = (
                F.coalesce(F.element_at(tmap, F.col(self.table_col)),
                           F.lit(0)) * nb + F.col("_bucket")
            )
            raw = raw.withColumn(
                "_pt", placement_token_column(self.spark, n_slots, idx)
            ).repartition(n_slots, F.col("_pt"))
            final = probe._dedup_window(
                raw, ["_pt", self.table_col, "_bucket", *cfg.key]
            ).drop("_pt").filter(F.col("op_rank") != 1)
        else:
            # fewer (table, bucket) slots than cores: spread the raw span
            # by (table, key[0]) — the aggregate reuses it, still one
            # sort pass — and align buckets in a second small exchange of
            # the deduped mounted rows.
            raw = raw.repartition(dp, F.col(self.table_col),
                                  F.col(cfg.key[0]))
            final = probe._dedup_window(
                raw, [self.table_col, "_bucket", *cfg.key]
            ).filter(F.col("op_rank") != 1)
        mounted = mount(final, probe.registry, as_of_ts=hi,
                        defaults=cfg.defaults)
        payload_cols = mounted_columns(probe.registry, hi)
        src = mounted.select(
            self.table_col, "_bucket", *cfg.key, *payload_cols,
            F.col("commit_ts").alias("_commit_ts"),
            F.col("start_ts").alias("_start_ts"),
            F.col("op_rank").alias("_op_rank"),
            (F.col("op") == "D").cast("int").alias("_deleted"),
        )
        if n_slots < dp:
            src = src.repartition(n_slots, self.table_col, F.col("_bucket"))
        staging = os.path.join(self.feed_dir, f"_bootstrap_{_uuid.uuid4().hex}")
        src.write.partitionBy(self.table_col, "_bucket").parquet(staging)
        out["write_jobs"] = out.get("write_jobs", 0) + 1
        stats = (
            df.groupBy("_win", self.table_col, "partition_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("commit_ts").alias("mx"))
            .collect()
        )
        by_key: dict = {}
        for r in stats:
            by_key.setdefault((int(r["_win"]), r[self.table_col]), []).append(r)
        for name in sorted(applying):
            t = applying[name]
            feed = live[t]
            sdir = os.path.join(staging, f"{self.table_col}={name}")
            bucket_files: dict = {}
            if os.path.isdir(sdir):
                os.makedirs(feed.target.data_dir, exist_ok=True)
                dest = os.path.join(feed.target.data_dir, _uuid.uuid4().hex)
                os.rename(sdir, dest)
                for d in sorted(os.listdir(dest)):
                    if d.startswith("_bucket="):
                        bdir = os.path.join(dest, d)
                        bucket_files[d.split("=", 1)[1]] = sorted(
                            os.path.join(bdir, x) for x in os.listdir(bdir)
                            if x.endswith(".parquet")
                        )
            batches, prev = [], lo
            for i, u in enumerate(uppers):
                bid = f"{feed.config.changefeed_id}:{prev}:{u}"
                rows = [
                    {"batch_id": bid, "partition_id": int(r["partition_id"]),
                     "resolved_ts": u, "event_count": int(r["n"]),
                     "max_commit_ts": int(r["mx"])}
                    for r in by_key.get((i, name), [])
                ]
                batches.append({"batch_id": bid, "resolved_ts": u,
                                "lineage_rows": rows})
                out["events"] += sum(r["event_count"] for r in rows)
                out["merges"] += 1
                prev = u
            feed.target.bootstrap_base_group(batches, bucket_files)
            self._state[t]["ckpt"] = hi
        out["windows_merged"] += len(uppers)
        shutil.rmtree(staging, ignore_errors=True)
        return True

    def _apply_homogeneous(self, live: dict, names: dict, deduped, lo: int,
                           uppers: list, out: dict) -> bool:
        """HOMOGENEOUS-window fast path: when every live table shares the
        SAME schema chain up to ``hi`` (the 100k-table fleet case — one
        transcript schema, global DDLs only), mount ONCE, write every
        table's delta files in ONE Spark job (partitionBy table — plus
        ``_bucket`` when tables use the bucketed delta layout, so the
        7.9x point-read dial survives multi-table mode), and commit the
        window with ONE feed-journal append. Driver cost per window: 1
        write job + 1 metadata-cardinality lineage aggregate + 1 jsonl
        append — independent of table count; per-table manifest I/O is
        amortized into group folds at barriers/compactions/run end.
        Falls back (returns False) on diverged chain digests, a DDL
        barrier at ``hi``, truncate incarnations, mixed bucket counts, or
        CoW mode."""
        cfg = self.config
        hi = uppers[-1]
        span = len(uppers) > 1
        if cfg.sink_mode != "mor":
            return False
        applying: dict = {}
        digests = set()
        for name, t in sorted(names.items()):
            f = live[t]
            st = self._state[t]
            if f._ddl_at(hi) is not None or st["truncate"]:
                return False
            # equal chain digests ⇒ identical writer maps ⇒ one mount
            # decodes every table's events correctly (O(1) per table per
            # window off the registry's cached cumulative hashes)
            digests.add(f.registry.chain_digest(hi))
            if hi <= st["ckpt"]:
                continue  # this table already has the window
            applying[name] = t
        if len(digests) > 1:
            return False
        if not applying:
            return True
        nb_all = {self._state[applying[n]]["n_buckets"] for n in applying}
        nb_set = {
            self._state[applying[n]]["n_buckets"] for n in applying
            if self._state[applying[n]]["layout"] == "bucketed"
        }
        if len(nb_set) > 1:
            return False  # mixed bucket counts can't share one staged layout
        # fleet mode: above the threshold, per-table partition dirs would
        # write O(tasks x tables) tiny files per window — switch to ONE
        # SHARED per-bucket fileset (file count O(tasks x buckets),
        # independent of table count; per-table split deferred to the
        # compactor). Requires one common bucket count.
        shared = (
            len(applying) >= cfg.shared_deltas_after and len(nb_all) == 1
        )
        from ticdc_spark.functions.mount import mount, mounted_columns

        probe = live[next(iter(applying.values()))]
        # per-table checkpoint snapshot BEFORE updates: a table resuming
        # mid-span applies only windows above its own mark (the others'
        # batches are recognized as replays at fold anyway)
        ckpt0 = {t: self._state[t]["ckpt"] for t in applying.values()}
        sliced = deduped.filter(F.col(self.table_col).isin(*applying))
        mounted = mount(sliced, probe.registry, as_of_ts=hi, defaults=cfg.defaults)
        payload_cols = mounted_columns(probe.registry, hi)
        src = mounted.select(
            *(["_win"] if span else []),
            self.table_col, *cfg.key, *payload_cols,
            F.col("commit_ts").alias("_commit_ts"),
            F.col("start_ts").alias("_start_ts"),
            F.col("op_rank").alias("_op_rank"),
            (F.col("op") == "D").cast("int").alias("_deleted"),
        )
        bucketed = bool(nb_set) or shared
        if shared:
            nb = nb_all.pop()
            # cluster rows by table WITHIN each bucket file so a per-table
            # read of a recent delta at least skips via row-group stats
            src = src.withColumn(
                "_bucket",
                F.pmod(F.xxhash64(F.col(cfg.key[0])), F.lit(nb)).cast("int"),
            ).sortWithinPartitions(
                *(["_win"] if span else []), "_bucket", self.table_col
            )
            pcols = ["_bucket"]
        else:
            pcols = [self.table_col]
            if bucketed:
                nb = nb_set.pop()
                src = src.withColumn(
                    "_bucket",
                    F.pmod(F.xxhash64(F.col(cfg.key[0])), F.lit(nb)).cast("int"),
                )
                pcols.append("_bucket")
        if span:
            pcols = ["_win", *pcols]
        seq0, staging = self.journal.new_staging()
        # THE one write job for all tables in the whole span
        src.write.partitionBy(*pcols).parquet(staging)
        out["write_jobs"] = out.get("write_jobs", 0) + 1
        # per-(window, table, source partition) lineage off the cached
        # dedup: metadata-cardinality output, one small job for the span
        gcols = ([F.col("_win")] if span else []) + [
            F.col(self.table_col), F.col("partition_id")]
        stats = (
            deduped.filter(F.col(self.table_col).isin(*applying))
            .groupBy(*gcols)
            .agg(F.sum("_n_events").alias("n"), F.max("_max_commit_ts").alias("mx"))
            .collect()
        )
        by_key: dict = {}
        for r in stats:
            w = int(r["_win"]) if span else 0
            by_key.setdefault((w, r[self.table_col]), []).append(r)
        prev = lo
        for i, u in enumerate(uppers):
            if span:
                # carve the window's partition dir out as its own journal
                # staging (cheap rename; a crash before the appends leaves
                # orphan dirs above the newest journal seq — reaped)
                seq_i, wpath = self.journal.new_staging()
                wsrc = os.path.join(staging, f"_win={i}")
                if os.path.isdir(wsrc):
                    os.rename(wsrc, wpath)
            else:
                seq_i = seq0
            entry_tables: dict = {}
            w_merged = 0
            for name in sorted(applying):
                t = applying[name]
                if u <= ckpt0[t]:
                    continue  # this table already has this window
                feed = live[t]
                batch_id = f"{feed.config.changefeed_id}:{prev}:{u}"
                rows = [
                    {"batch_id": batch_id, "partition_id": int(r["partition_id"]),
                     "resolved_ts": u, "event_count": int(r["n"]),
                     "max_commit_ts": int(r["mx"])}
                    for r in by_key.get((i, name), [])
                ]
                entry_tables[t] = {"src": name, "path": feed.target.path,
                                   "bid": batch_id, "lineage": rows}
                st = self._state[t]
                st["ckpt"] = u
                st["depth"] += 1
                out["events"] += sum(r["event_count"] for r in rows)
                out["merges"] += 1
                w_merged += 1
            out["windows_merged"] += w_merged > 0
            if entry_tables:
                # the window's commit point: ONE durable append for all N
                self.journal.append_window(seq_i, prev, u, bucketed,
                                           entry_tables, self.table_col,
                                           shared=shared)
            prev = u
        if span:
            shutil.rmtree(staging, ignore_errors=True)
        return True

    def _sink_union_window(self, live: dict, items: list, wdf, lo: int,
                           hi: int, out: dict) -> int:
        """Heterogeneous-window WRITE BATCHING: each table mounts against
        its OWN registry snapshot (diverged chains welcome; a DDL at ``hi``
        mounts as-of ``lo`` per the barrier rule), the mounted frames union
        by name into ONE ``partitionBy(table)`` write + ONE journal append.
        The staged files carry the UNION of the group's payload columns;
        that is safe because the per-table read projects files through the
        writer-version schema by explicit column name (``_reconcile``) —
        a column the table never had is simply not read.

        Tables whose payload schemas conflict in TYPE for a shared column
        name (e.g. a modify_column divergence) cannot share one parquet
        schema, so the group splits by type-compatibility — in practice
        one or two groups, so a 32-table fleet with per-table DDL churn
        runs ≤2 write jobs per window instead of 32 (measured:
        scripts/bench_multi_table.py churn scenario). Returns the number
        of tables committed."""
        from ticdc_spark.functions.mount import mount, mounted_columns

        cfg = self.config
        frames: dict = {}
        for name, t in items:
            feed = live[t]
            as_of = lo if feed._ddl_at(hi) else hi
            sliced = wdf.filter(F.col(self.table_col) == name)
            mounted = mount(sliced, feed.registry, as_of_ts=as_of,
                            defaults=cfg.defaults)
            pcols = mounted_columns(feed.registry, as_of)
            src = mounted.select(
                self.table_col, *cfg.key, *pcols,
                F.col("commit_ts").alias("_commit_ts"),
                F.col("start_ts").alias("_start_ts"),
                F.col("op_rank").alias("_op_rank"),
                (F.col("op") == "D").cast("int").alias("_deleted"),
            )
            frames[name] = (t, src, dict(src.dtypes))
        # greedy type-compatibility grouping: frames join a group iff no
        # shared column name carries a different type there
        groups: list = []
        for name in sorted(frames):
            _, _, types = frames[name]
            for g in groups:
                if all(g["types"].get(c, ty) == ty for c, ty in types.items()):
                    g["names"].append(name)
                    g["types"].update(types)
                    break
            else:
                groups.append({"names": [name], "types": dict(types)})
        # per-(table, source partition) lineage for the whole window in ONE
        # metadata-cardinality job off the cached dedup
        stats = (
            wdf.filter(F.col(self.table_col).isin(*[n for n, _ in items]))
            .groupBy(self.table_col, "partition_id")
            .agg(F.sum("_n_events").alias("n"),
                 F.max("_max_commit_ts").alias("mx"))
            .collect()
        )
        by_table: dict = {}
        for r in stats:
            by_table.setdefault(r[self.table_col], []).append(r)
        committed = 0
        for g in groups:
            gnames = g["names"]
            # honor the bucketed dial only when the whole group shares it
            layouts = {self._state[frames[n][0]]["layout"] for n in gnames}
            nbs = {self._state[frames[n][0]]["n_buckets"] for n in gnames}
            bucketed = layouts == {"bucketed"} and len(nbs) == 1
            union = None
            for n in gnames:
                src = frames[n][1]
                union = src if union is None else union.unionByName(
                    src, allowMissingColumns=True)
            pcols = [self.table_col]
            if bucketed:
                union = union.withColumn(
                    "_bucket",
                    F.pmod(F.xxhash64(F.col(cfg.key[0])),
                           F.lit(nbs.pop())).cast("int"),
                )
                pcols.append("_bucket")
            seq, staging = self.journal.new_staging()
            union.write.partitionBy(*pcols).parquet(staging)
            out["write_jobs"] = out.get("write_jobs", 0) + 1
            entry_tables: dict = {}
            for n in gnames:
                t = frames[n][0]
                feed = live[t]
                batch_id = f"{feed.config.changefeed_id}:{lo}:{hi}"
                rows = [
                    {"batch_id": batch_id, "partition_id": int(r["partition_id"]),
                     "resolved_ts": hi, "event_count": int(r["n"]),
                     "max_commit_ts": int(r["mx"])}
                    for r in by_table.get(n, [])
                ]
                entry_tables[t] = {"src": n, "path": feed.target.path,
                                   "bid": batch_id, "lineage": rows}
                st = self._state[t]
                st["ckpt"] = max(st["ckpt"], hi)
                st["depth"] += 1
                out["events"] += sum(r["event_count"] for r in rows)
                out["merges"] += 1
                committed += 1
            self.journal.append_window(seq, lo, hi, bucketed, entry_tables,
                                       self.table_col)
        return committed

    def _fold_journal(self) -> None:
        """Fold pending journal windows into per-table manifests — see
        :func:`fold_feed_journal`. Amortization points: run start (crash
        recovery), DDL barriers, compaction, run end."""
        if self.feed_dir is None or (
            self._journal is None and not os.path.isdir(self.feed_dir)
        ):
            return
        fold_feed_journal(self.spark, self.journal)

    def _gc_shared(self) -> int:
        if self._journal is None:
            return 0
        return gc_shared_filesets(self.spark, self.journal)


def gc_shared_filesets(spark: SparkSession, j: FeedJournal) -> int:
    """Reclaim SHARED window filesets no manifest references anymore
    (after compaction folds a table's deltas into its base, the last
    reference to a shared window dies). O(folded entries x referencing
    tables) manifest checks — run at compaction points, not per
    window. Shared by the driver-loop feed and the streaming twin."""
    hwm = j.fold_hwm()
    manifests: dict = {}
    removed = 0
    for e in j._entries():
        if e["seq"] > hwm or not e.get("shared"):
            continue
        d = os.path.join(j.root, e["dir"])
        if not os.path.isdir(d):
            continue
        prefix = os.path.realpath(d)
        live = False
        for info in e["tables"].values():
            p = info["path"]
            if p not in manifests:
                # every RETAINED manifest version counts — a time-travel
                # read of an un-expired snapshot must keep working
                tab = LakeTable(spark, p)
                ms = []
                for v in tab._versions():
                    try:
                        ms.append(tab.manifest(v))
                    except FileNotFoundError:
                        pass
                manifests[p] = ms
            if any(
                os.path.realpath(f).startswith(prefix)
                for m in manifests[p]
                for dd in m.get("deltas", [])
                for f in dd["files"]
            ):
                live = True
                break
        if not live:
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
    return removed


def fold_feed_journal(spark: SparkSession, j: FeedJournal) -> None:
    """Fold pending journal windows into per-table manifests: move each
    table's staged partition dir into its own ``data_dir`` (same-fs
    rename; deterministic ``jw<seq>`` names make a re-fold after a
    crash idempotent) and GROUP-commit all of a table's pending batches
    in one manifest rewrite. Shared by the driver-loop multi feed and the
    arrival-ordered streaming twin (entries carrying ``epoch`` commit
    under the monotone-epoch replay rule instead of the resolved-ts
    rule)."""
    entries = j.pending()
    if not entries:
        # still reap orphans (a crash between staging write and journal
        # append leaves a dir no entry names) — one listdir, O(dirs)
        j.cleanup()
        return

    def _list(dest: str, bucketed: bool) -> tuple:
        files: list = []
        buckets: dict | None = None
        if os.path.isdir(dest):
            if bucketed:
                buckets = {}
                for d in sorted(os.listdir(dest)):
                    if d.startswith("_bucket="):
                        bdir = os.path.join(dest, d)
                        buckets[d.split("=", 1)[1]] = sorted(
                            os.path.join(bdir, x)
                            for x in os.listdir(bdir)
                            if x.endswith(".parquet")
                        )
                files = sorted(f for fl in buckets.values() for f in fl)
            else:
                files = sorted(
                    os.path.join(dest, x)
                    for x in os.listdir(dest) if x.endswith(".parquet")
                )
        return files, buckets

    from urllib.parse import unquote

    def _part_dirs(window_dir: str, col: str) -> dict:
        """Partition value -> dir, UNESCAPING Hive's %-hex encoding of
        special chars in partition paths (a span named ``pt#p0`` is
        staged as ``table_name=pt%23p0`` — a literal join would miss
        it and silently commit an empty window)."""
        out = {}
        if os.path.isdir(window_dir):
            for d in os.listdir(window_dir):
                if d.startswith(col + "="):
                    out[unquote(d.split("=", 1)[1])] = os.path.join(window_dir, d)
        return out

    part_dirs = {
        e["seq"]: _part_dirs(os.path.join(j.root, e["dir"]), e["table_col"])
        for e in entries if not e.get("shared")
    }
    # shared windows: ONE listing serves every table in the window
    shared_listing = {
        e["seq"]: _list(os.path.join(j.root, e["dir"]), e.get("bucketed", False))
        for e in entries if e.get("shared")
    }
    per_table: dict = {}
    for e in entries:
        for t, info in e["tables"].items():
            per_table.setdefault(info["path"], []).append((e, info))

    def _batch(e, info, files, buckets) -> dict:
        b = {
            "batch_id": info["bid"], "files": files, "buckets": buckets,
            "lineage_rows": info.get("lineage") or [],
        }
        if e.get("epoch") is not None:
            # arrival-ordered streaming window: commit under the monotone
            # per-changefeed epoch rule, not the resolved-ts window rule
            b["resolved_ts"] = None
            b["epoch"] = e["epoch"]
        else:
            b["resolved_ts"] = e["hi"]
        return b

    for path, items in sorted(per_table.items()):
        table = LakeTable(spark, path)
        group = []
        for e, info in items:
            if e.get("shared"):
                # fleet mode: files stay under the feed's journal dir
                # (every table references them; _gc_shared reclaims the
                # window once all references compact away)
                files, buckets = shared_listing[e["seq"]]
                b = _batch(e, info, files, buckets)
                b["shared"] = (e["table_col"], info["src"])
                group.append(b)
                continue
            src = part_dirs[e["seq"]].get(info["src"], "")
            dest = os.path.join(table.data_dir, f"jw{e['seq']:08d}")
            if src and os.path.isdir(src):
                os.makedirs(table.data_dir, exist_ok=True)
                try:
                    os.rename(src, dest)
                except OSError:
                    shutil.move(src, dest)
            files, buckets = _list(dest, e.get("bucketed", False))
            group.append(_batch(e, info, files, buckets))
        table.append_delta_files_group(group)
    j.mark_folded(entries[-1]["seq"])
    j.cleanup()


def route_tables(names: list, allow: tuple = (), block: tuple = ()) -> list:
    """Standalone allow/block router (F1) for callers without a config."""
    cfg = ChangefeedConfig(table_allow=tuple(allow), table_block=tuple(block))
    return [n for n in names if table_matches(n, cfg)]
