"""Multi-table changefeed scenarios (multi_tables_ddl / batch_add_table
analogs, /root/reference/tests/integration_tests/multi_tables_ddl/):
N tables through one feed, per-table schema registries and DDL barriers
(global vs table-scoped), per-table exactly-once resume, feed checkpoint =
min over tables."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, DDLSpec, gen_binlog, gen_ddl_log, gen_resolved_log
from ticdc_spark.streaming.multi import MultiTableChangefeed, route_tables
from ticdc_spark.streaming.pipeline import ChangefeedConfig, expected_final_state

KEY = ["conv_id", "turn_idx"]

SCOPED = DDLSpec(commit_ts=2_000, ddl_type="add_column", column="tool_args", table_name="t1")
GLOBAL = DDLSpec(commit_ts=3_000, ddl_type="add_column", column="qscore")


def _specs():
    """3 tables, same block structure (shared resolved log), distinct
    streams; t1 additionally sees the table-scoped DDL."""
    out = {}
    for i, t in enumerate(["t0", "t1", "t2"]):
        ddls = (GLOBAL,) if t != "t1" else (SCOPED, GLOBAL)
        out[t] = BinlogSpec(n_events=4_000, n_convs=120, seed=100 + i, ddls=ddls)
    return out


def _build(spark, base_path, cfg=None):
    specs = _specs()
    parts = [
        gen_binlog(spark, spec).withColumn("table_name", F.lit(t))
        for t, spec in specs.items()
    ]
    binlog = parts[0]
    for p in parts[1:]:
        binlog = binlog.unionByName(p)
    resolved = gen_resolved_log(spark, next(iter(specs.values())))
    ddl_rows = [
        {"commit_ts": SCOPED.commit_ts, "ddl_type": SCOPED.ddl_type, "query": SCOPED.query(),
         "column": SCOPED.column, "old_column": None, "col_type": "string",
         "schema_version": SCOPED.commit_ts, "table_name": "t1"},
        {"commit_ts": GLOBAL.commit_ts, "ddl_type": GLOBAL.ddl_type, "query": GLOBAL.query(),
         "column": GLOBAL.column, "old_column": None, "col_type": "string",
         "schema_version": GLOBAL.commit_ts, "table_name": None},
    ]
    mt = MultiTableChangefeed(
        spark, binlog, resolved, ddl_rows,
        table_factory=lambda t: LakeTable(spark, f"{base_path}/{t}"),
        config=cfg or ChangefeedConfig(changefeed_id="mt", n_buckets=4),
        tables=list(specs),
    )
    return mt, specs


def test_multi_table_final_state_and_scoped_ddl(spark, tmp_path):
    mt, specs = _build(spark, str(tmp_path))
    stats = mt.run()
    assert stats["tables"] == 3
    assert stats["events"] == sum(s.n_events for s in specs.values())
    # per-table final state vs the per-table batch oracle
    for t, spec in specs.items():
        feed = mt.feeds[t]
        want = expected_final_state(
            gen_binlog(spark, spec), feed.registry, spec.max_commit_ts, KEY
        )
        assert_df_equal(feed.target.read(), want, KEY)
    # table-scoped DDL evolved ONLY t1; the global one evolved everybody
    assert "tool_args" in mt.read("t1").columns
    assert "tool_args" not in mt.read("t0").columns
    assert "tool_args" not in mt.read("t2").columns
    for t in specs:
        assert "qscore" in mt.read(t).columns
    # feed checkpoint = min over tables = shared frontier
    assert stats["checkpoint"] == specs["t0"].max_commit_ts
    assert mt.is_synced()
    # union read reconciles schemas (t0/t2 rows carry NULL tool_args)
    u = mt.read_union()
    assert "tool_args" in u.columns and "table_name" in u.columns
    assert u.filter("table_name = 't0' AND tool_args IS NOT NULL").count() == 0


def test_multi_table_restart_resume(spark, tmp_path):
    mt1, specs = _build(spark, str(tmp_path))
    s1 = mt1.run(max_merges_per_table=2)
    assert 0 < mt1.checkpoint() < specs["t0"].max_commit_ts
    # fresh engine instance over the same lake paths: resumes per table
    mt2, _ = _build(spark, str(tmp_path))
    s2 = mt2.run()
    assert s2["merges"] > 0  # resumed work, not a full replay
    assert mt2.checkpoint() == specs["t0"].max_commit_ts
    for t, spec in specs.items():
        feed = mt2.feeds[t]
        want = expected_final_state(
            gen_binlog(spark, spec), feed.registry, spec.max_commit_ts, KEY
        )
        assert_df_equal(feed.target.read(), want, KEY)


def _lifecycle_build(spark, base_path):
    """ta renamed→tz at 3000; tb CREATED at 2000 (events only after);
    tc DROPPED at 3000 (events continue but stop replicating)."""
    sa = BinlogSpec(n_events=4_000, n_convs=100, seed=7)
    sb = BinlogSpec(n_events=4_000, n_convs=100, seed=8)
    sc = BinlogSpec(n_events=4_000, n_convs=100, seed=9)
    wa = gen_binlog(spark, sa).withColumn(
        "table_name",
        F.when(F.col("commit_ts") <= 3_000, F.lit("ta")).otherwise(F.lit("tz")),
    )
    wb = gen_binlog(spark, sb).filter(F.col("commit_ts") > 2_000).withColumn(
        "table_name", F.lit("tb")
    )
    wc = gen_binlog(spark, sc).withColumn("table_name", F.lit("tc"))
    binlog = wa.unionByName(wb).unionByName(wc)
    ddl_rows = [
        {"commit_ts": 2_000, "ddl_type": "create_table", "query": "CREATE TABLE tb",
         "column": None, "old_column": None, "col_type": None,
         "schema_version": 2_000, "table_name": "tb"},
        {"commit_ts": 3_000, "ddl_type": "rename_table", "query": "RENAME TABLE ta TO tz",
         "column": None, "old_column": "ta", "col_type": None,
         "schema_version": 3_000, "table_name": "tz"},
        {"commit_ts": 3_000, "ddl_type": "drop_table", "query": "DROP TABLE tc",
         "column": None, "old_column": None, "col_type": None,
         "schema_version": 3_000, "table_name": "tc"},
    ]
    mt = MultiTableChangefeed(
        spark, binlog, gen_resolved_log(spark, sa), ddl_rows,
        table_factory=lambda t: LakeTable(spark, f"{base_path}/{t}"),
        config=ChangefeedConfig(changefeed_id="lc", n_buckets=4),
        tables=["ta", "tc"],
    )
    return mt, (sa, sb, sc)


def test_table_lifecycle_create_drop_rename(spark, tmp_path):
    mt, (sa, sb, sc) = _lifecycle_build(spark, str(tmp_path))
    mt.run()
    # rename: same target, full stream, now keyed tz
    assert set(mt.feeds) == {"tz", "tb"}
    want_a = expected_final_state(gen_binlog(spark, sa), mt.feeds["tz"].registry,
                                  sa.max_commit_ts, KEY)
    assert_df_equal(mt.read("tz"), want_a, KEY)
    # created table consumed exactly its post-create events
    want_b = expected_final_state(
        gen_binlog(spark, sb).filter(F.col("commit_ts") > 2_000),
        mt.feeds["tb"].registry, sb.max_commit_ts, KEY,
    )
    assert_df_equal(mt.read("tb"), want_b, KEY)
    assert mt.feeds["tb"].target.checkpoint["resolved_ts"] == sb.max_commit_ts
    # dropped table froze at the drop barrier; its data is retained
    tc = LakeTable(spark, f"{tmp_path}/tc")
    assert tc.checkpoint["resolved_ts"] == 3_000
    reg = mt.feeds["tz"].registry  # same (empty) column-DDL set
    want_c = expected_final_state(
        gen_binlog(spark, sc).filter(F.col("commit_ts") <= 3_000), reg, 3_000, KEY
    )
    from ticdc_spark.streaming.pipeline import Changefeed  # read via fresh handle
    assert_df_equal(tc.read(), want_c, KEY)


def test_table_lifecycle_resume(spark, tmp_path):
    """Crash after the first window; a fresh instance must replay lifecycle
    barriers below the checkpoint and land on the same final state."""
    mt1, (sa, sb, sc) = _lifecycle_build(spark, str(tmp_path))
    mt1.run(max_merges_per_table=2)  # past the create barrier at 2000
    mt2, _ = _lifecycle_build(spark, str(tmp_path))
    mt2.run()
    assert set(mt2.feeds) == {"tz", "tb"}
    want_a = expected_final_state(gen_binlog(spark, sa), mt2.feeds["tz"].registry,
                                  sa.max_commit_ts, KEY)
    assert_df_equal(mt2.read("tz"), want_a, KEY)
    want_b = expected_final_state(
        gen_binlog(spark, sb).filter(F.col("commit_ts") > 2_000),
        mt2.feeds["tb"].registry, sb.max_commit_ts, KEY,
    )
    assert_df_equal(mt2.read("tb"), want_b, KEY)


def test_wal_partitioned_by_table_prunes(spark, tmp_path):
    """The storage layout contract: a WAL written with
    write_wal_partitioned serves per-table reads via PARTITION PRUNING —
    the table predicate appears in the scan's PartitionFilters, not as a
    post-scan filter over all tables' bytes."""
    from ticdc_spark.streaming.multi import write_wal_partitioned

    spec = BinlogSpec(n_events=2_000, n_convs=50)
    wal = gen_binlog(spark, spec).withColumn(
        "table_name", F.concat(F.lit("t"), (F.col("turn_idx") % 4).cast("string"))
    )
    path = str(tmp_path / "wal")
    write_wal_partitioned(wal, path)
    got = spark.read.parquet(path).filter(F.col("table_name") == "t1")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "table_name" in plan.split("PartitionFilters")[1][:200]
    n_t1 = wal.filter("table_name = 't1'").count()
    assert got.count() == n_t1


def test_table_allow_block_routing(spark, tmp_path):
    cfg = ChangefeedConfig(
        changefeed_id="mt", n_buckets=4,
        table_allow=("t[0-9]",), table_block=("t2",),
    )
    mt, _ = _build(spark, str(tmp_path), cfg=cfg)
    assert mt.tables == ["t0", "t1"]
    assert route_tables(["a", "t1", "t2", "t10"], allow=("t[0-9]",), block=("t2",)) == ["t1"]


def test_homogeneous_window_is_one_write_for_all_tables(spark, tmp_path, monkeypatch):
    """When tables share one schema chain (the fleet case), a window must
    execute the single-write fast path: every table commits via
    append_delta_files (metadata-only, fed by ONE partitionBy write) and
    the per-table append_delta write path never runs."""
    calls = {"files": 0, "delta": 0}
    orig_f = LakeTable.append_delta_files
    orig_d = LakeTable.append_delta

    def count_f(self, *a, **k):
        calls["files"] += 1
        return orig_f(self, *a, **k)

    def count_d(self, *a, **k):
        calls["delta"] += 1
        return orig_d(self, *a, **k)

    monkeypatch.setattr(LakeTable, "append_delta_files", count_f)
    monkeypatch.setattr(LakeTable, "append_delta", count_d)
    specs = {f"h{i}": BinlogSpec(n_events=2_000, n_convs=60, seed=300 + i)
             for i in range(4)}
    parts = [gen_binlog(spark, s).withColumn("table_name", F.lit(t))
             for t, s in specs.items()]
    binlog = parts[0]
    for p in parts[1:]:
        binlog = binlog.unionByName(p)
    mt = MultiTableChangefeed(
        spark, binlog, gen_resolved_log(spark, next(iter(specs.values()))), None,
        table_factory=lambda t: LakeTable(spark, f"{tmp_path}/{t}"),
        config=ChangefeedConfig(changefeed_id="h", n_buckets=4),
        tables=list(specs),
    )
    stats = mt.run()
    assert stats["merges"] == 4 * stats["windows"]
    assert calls["delta"] == 0            # per-table write path never ran
    assert calls["files"] == 4 * stats["windows"]
    for t, s in specs.items():
        want = expected_final_state(gen_binlog(spark, s), mt.feeds[t].registry,
                                    s.max_commit_ts, KEY)
        assert_df_equal(mt.read(t), want, KEY)
    # GC ownership: every table's delta files live under ITS data_dir
    for t in specs:
        m = mt.feeds[t].target.manifest()
        for d in m["deltas"]:
            for f in d["files"]:
                assert f.startswith(mt.feeds[t].target.data_dir), f
