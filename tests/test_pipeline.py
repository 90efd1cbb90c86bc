"""End-to-end changefeed scenarios — the tier-2 gates.

Replays the reference's integration scenarios over synthetic binlog and
asserts final-state equivalence with the batch LWW oracle, the reference's
own correctness criterion (sync_diff,
/root/reference/tests/integration_tests/_utils/check_sync_diff):

- smoke / out-of-order commit-ts   (entry_sorter_test.go:127 analog)
- restart/resume from checkpoint   (changefeed_pause_resume/run.sh:49-60)
- DDL-during-DML with barrier      (ddl_manager, ddl_only_block_related_table)
- rename column mid-stream         (schema_storage_test.go:394)
- hot-key skew                     (keyspan/splitter_write.go analog)
- bank-style invariant             (tests/integration_tests/bank/case.go:60-86)
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, DDLSpec, gen_binlog, gen_ddl_log, gen_resolved_log
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, expected_final_state

KEY = ["conv_id", "turn_idx"]


def _run(spark, spec, path, cfg=None, max_merges=None):
    binlog = gen_binlog(spark, spec)
    resolved = gen_resolved_log(spark, spec)
    ddl = gen_ddl_log(spark, spec) if spec.ddls else None
    cf = Changefeed(spark, binlog, resolved, ddl, LakeTable(spark, path), cfg)
    stats = cf.run(max_merges=max_merges)
    return cf, stats


def _check_final(spark, spec, cf):
    want = expected_final_state(
        gen_binlog(spark, spec), cf.registry, spec.base_ts + spec.n_blocks * spec.block, KEY
    )
    got = cf.target.read()
    assert_df_equal(got, want, KEY)


def test_smoke_out_of_order(spark, tmp_table_path):
    spec = BinlogSpec(n_events=10_000, n_convs=300, n_partitions=4)
    cf, stats = _run(spark, spec, tmp_table_path)
    assert stats["merges"] == spec.n_blocks
    assert stats["events"] == spec.n_events
    _check_final(spark, spec, cf)
    # synced detection (W7): lineage covers every partition to the frontier
    lin = cf.target.lineage_df()
    assert lin.groupBy("partition_id").agg(F.max("resolved_ts").alias("r")).filter(
        F.col("r") != spec.max_commit_ts
    ).count() == 0


def test_restart_resume_identical(spark, tmp_table_path, tmp_path):
    """Kill after k merges, resume with a fresh Changefeed → final state
    bit-for-bit identical to an uninterrupted run, no duplicate lineage."""
    spec = BinlogSpec(n_events=8_000, n_convs=200, n_partitions=4)
    cf1, s1 = _run(spark, spec, tmp_table_path, max_merges=3)
    assert s1["merges"] == 3
    # resume — new engine instance, same manifest checkpoint
    cf2, s2 = _run(spark, spec, tmp_table_path)
    assert s2["merges"] == spec.n_blocks - 3
    _check_final(spark, spec, cf2)

    # uninterrupted control run
    control_path = str(tmp_path / "control")
    cfc, _ = _run(spark, spec, control_path)
    assert_df_equal(cf2.target.read(), cfc.target.read(), KEY)

    # no duplicate (batch_id, partition_id) lineage rows
    lin = cf2.target.lineage_df()
    assert lin.groupBy("batch_id", "partition_id").count().filter("count > 1").count() == 0


def test_replay_committed_batch_is_noop(spark, tmp_table_path):
    spec = BinlogSpec(n_events=3_000, n_convs=100)
    cf, s1 = _run(spark, spec, tmp_table_path)
    # re-run the whole feed from ts 0: every batch recognized, none reapplied
    cf2, s2 = _run(spark, spec, tmp_table_path)
    assert s2["merges"] == 0
    _check_final(spark, spec, cf2)


def test_ddl_add_column_during_dml(spark, tmp_table_path):
    ddl = DDLSpec(commit_ts=2_500, ddl_type="add_column", column="tool_args")
    spec = BinlogSpec(n_events=5_000, n_convs=150, ddls=(ddl,))
    cf, stats = _run(spark, spec, tmp_table_path)
    _check_final(spark, spec, cf)
    got = cf.target.read()
    assert "tool_args" in got.columns
    # rows whose final image was written pre-DDL have NULL tool_args
    assert got.filter(
        "ts <= timestamp_micros(CAST(1700000000 + 2500 AS BIGINT) * 1000000) AND tool_args IS NOT NULL"
    ).count() == 0


def test_ddl_rename_column_mid_stream(spark, tmp_table_path):
    ddl = DDLSpec(commit_ts=2_000, ddl_type="rename_column", column="speaker", old_column="role")
    spec = BinlogSpec(n_events=4_000, n_convs=150, ddls=(ddl,))
    cf, _ = _run(spark, spec, tmp_table_path)
    _check_final(spark, spec, cf)
    got = cf.target.read()
    assert "speaker" in got.columns and "role" not in got.columns
    assert got.filter("speaker IS NULL").count() == 0


def test_ddl_at_checkpoint_resume(spark, tmp_table_path):
    """Resume where a DDL commits exactly at the checkpoint
    (changefeed.go:620-630 edge): barrier merge lands, then 'crash' before
    more progress; the resumed feed must reconcile the ALTER."""
    ddl = DDLSpec(commit_ts=2_000, ddl_type="add_column", column="extra")
    spec = BinlogSpec(n_events=4_000, n_convs=100, block=1_000, ddls=(ddl,))
    # merges: (1000,2000] ends at ddl → merge #2 is the barrier batch
    cf1, s1 = _run(spark, spec, tmp_table_path, max_merges=2)
    cf2, _ = _run(spark, spec, tmp_table_path)
    _check_final(spark, spec, cf2)
    assert "extra" in cf2.target.read().columns


def test_hot_key_skew(spark, tmp_table_path):
    spec = BinlogSpec(n_events=12_000, n_convs=500, hot_frac=0.5, n_hot=3, n_partitions=4)
    cf, stats = _run(spark, spec, tmp_table_path)
    assert stats["events"] == spec.n_events
    _check_final(spark, spec, cf)


def test_multi_frontier_batches(spark, tmp_table_path):
    cfg = ChangefeedConfig(frontiers_per_batch=3)
    spec = BinlogSpec(n_events=7_000, n_convs=200)
    cf, stats = _run(spark, spec, tmp_table_path, cfg=cfg)
    assert stats["merges"] == 3  # ceil(7 blocks / 3)
    _check_final(spark, spec, cf)


def test_safe_mode_split(spark, tmp_table_path):
    cfg = ChangefeedConfig(safe_mode_ts=3_000)
    spec = BinlogSpec(n_events=5_000, n_convs=150)
    cf, _ = _run(spark, spec, tmp_table_path, cfg=cfg)
    binlog = gen_binlog(spark, spec)
    want = expected_final_state(
        binlog, cf.registry, spec.max_commit_ts, KEY, safe_mode_ts=3_000
    )
    assert_df_equal(cf.target.read(), want, KEY)


def test_bank_invariant(spark, tmp_table_path):
    """Paired updates within one txn keep a conserved quantity: after every
    committed batch, the sum over all live rows of balance is constant
    (bank/case.go:60-86 analog, balances ride in the payload text)."""
    rows = []
    n_accounts, init = 8, 100
    commit = 100
    for i in range(n_accounts):
        rows.append((50 + i, 40, "I", "bank", i, '{"role":"user","text":"%d","tool":null,"ts":1}' % init, None, 0, 0))
    import random

    rnd = random.Random(3)
    balances = [init] * n_accounts
    for _ in range(60):
        a, b = rnd.sample(range(n_accounts), 2)
        amt = rnd.randrange(1, 20)
        balances[a] -= amt
        balances[b] += amt
        start = commit - 1
        for acct, bal in ((a, balances[a]), (b, balances[b])):
            rows.append((commit, start, "U", "bank", acct,
                         '{"role":"user","text":"%d","tool":null,"ts":1}' % bal, None, 0, 0))
        commit += 1
    schema = ("commit_ts long, start_ts long, op string, conv_id string, turn_idx int, "
              "payload string, pre_payload string, schema_version long, partition_id int")
    binlog = spark.createDataFrame(rows, schema)
    resolved = spark.createDataFrame(
        [(0, 120, 1), (0, 140, 2), (0, 200, 3)], "partition_id int, resolved_ts long, emit_seq long"
    )
    t = LakeTable(spark, tmp_table_path)
    cf = Changefeed(spark, binlog, resolved, None, t, ChangefeedConfig(n_buckets=4))
    cf.run()
    # invariant on every committed snapshot (batch granularity)
    for v in range(2, t.manifest()["version"] + 1):
        snap = t.read(version=v)
        total = snap.agg(F.sum(F.col("text").cast("long")).alias("s")).collect()[0]["s"]
        assert total == n_accounts * init, f"snapshot v{v} violates conservation"


def test_configured_event_filters(spark, tmp_table_path):
    """F2/F3/F5 as changefeed config (pkg/filter/filter.go:95-235): dropped
    events never reach the sink; final state = LWW over the filtered stream."""
    cfg = ChangefeedConfig(
        n_buckets=4,
        ignore_event_expr="commit_ts % 7 = 0",
        ignore_start_ts=(1999,),
    )
    spec = BinlogSpec(n_events=5_000, n_convs=150)
    cf, _ = _run(spark, spec, tmp_table_path, cfg=cfg)
    want = expected_final_state(
        gen_binlog(spark, spec), cf.registry, spec.max_commit_ts, KEY, config=cfg
    )
    assert_df_equal(cf.target.read(), want, KEY)
    # the filter really dropped rows: no surviving text from a %7 commit
    assert cf.target.read().filter(
        "CAST(regexp_extract(text, 'v(\\\\d+)$', 1) AS BIGINT) % 7 = 0"
    ).count() == 0


def test_force_replicate_append_only(spark, tmp_table_path):
    """force-replicate (replica_config.go:135): a keyless table replicates
    as an APPEND-ONLY insert log — every event survives (no dedup, no
    delete application), op/commit_ts are ordinary columns, replays are
    still exactly-once, and the default F4 refusal stays for tables
    created keyless without the opt-in."""
    from ticdc_spark.sources.binlog_gen import gen_binlog

    cfg = ChangefeedConfig(n_buckets=4, force_replicate=True)
    spec = BinlogSpec(n_events=5_000, n_convs=150)
    cf, stats = _run(spark, spec, tmp_table_path, cfg=cfg)
    got = cf.target.read()
    # the log keeps EVERY event — deletes and overwritten updates included
    assert got.count() == spec.n_events
    assert stats["events"] == spec.n_events
    src = gen_binlog(spark, spec)
    for op in ("I", "U", "D"):
        assert got.filter(F.col("op") == op).count() == src.filter(F.col("op") == op).count()
    # deletes carry NULL payload columns but real keys/commit_ts
    d = got.filter("op = 'D'")
    assert d.filter("text IS NOT NULL").count() == 0
    assert d.filter("conv_id IS NULL OR commit_ts IS NULL").count() == 0
    # re-run: all windows recognized, nothing re-appended
    cf2, stats2 = _run(spark, spec, tmp_table_path, cfg=cfg)
    assert stats2["merges"] == 0
    assert cf2.target.read().count() == spec.n_events
    # F4 default unchanged: keyless create without the opt-in refuses
    t = LakeTable(spark, tmp_table_path + "_nokey")
    with pytest.raises(ValueError, match="force-replicate"):
        t.create(key=[], fields=[("a", "string")])
    # merge paths refuse the append-only table
    with pytest.raises(ValueError, match="append_log"):
        cf.target.merge(cf.target.read().limit(1), "bx")


def test_bdr_mode_drops_peer_origin_events(spark, tmp_table_path):
    """BDR mode (replica_config.go:147): events applied by the PEER
    cluster's changefeed (origin marker != ours) are dropped before the
    sink — no replication loop — while local writes replicate in full."""
    from ticdc_spark.sources.binlog_gen import gen_binlog, gen_resolved_log

    spec = BinlogSpec(n_events=5_000, n_convs=150)
    peer = F.col("commit_ts") % 4 == 0
    binlog = gen_binlog(spark, spec).withColumn(
        "origin", F.when(peer, "cluster-b").otherwise(F.lit(None).cast("string")))
    cfg = ChangefeedConfig(n_buckets=4, bdr_mode=True, cluster_id="cluster-a")
    cf = Changefeed(spark, binlog, gen_resolved_log(spark, spec), None,
                    LakeTable(spark, tmp_table_path), cfg)
    cf.run()
    # final state = LWW over ONLY the locally-originated stream
    want = expected_final_state(
        gen_binlog(spark, spec).filter(~peer), cf.registry,
        spec.max_commit_ts, KEY)
    assert_df_equal(cf.target.read(), want, KEY)


def test_batched_windows_preserve_per_window_commits(spark, tmp_table_path, tmp_path):
    """DDL-free spans run as ONE Spark job (max_windows_per_job) but every
    window still commits its OWN batch id + syncpoint + lineage, final
    state matches the per-window execution bit-for-bit, and replays stay
    exactly-once."""
    spec = BinlogSpec(n_events=6_000, n_convs=150, block=1_000)  # 6 windows
    cfg = ChangefeedConfig(n_buckets=4, sink_mode="mor", compact_every=100)
    cf, stats = _run(spark, spec, tmp_table_path, cfg=cfg)
    assert stats["merges"] == 6  # six windows, individually committed
    # one syncpoint per window, monotone resolved_ts
    sp = [p["primary_ts"] for p in cf.syncpoints()]
    assert sp == sorted(sp) and len(sp) == 6
    # all six windows share ONE group manifest commit (the whole point)
    assert cf.target.manifest()["version"] <= 3
    ids = cf.target.committed_batch_ids()
    assert any(":0:" in b or ":1000" in b for b in ids) or len(ids) >= 1
    _check_final(spark, spec, cf)
    # identical final state to the per-window execution
    cfg1 = ChangefeedConfig(n_buckets=4, sink_mode="mor", compact_every=100,
                            max_windows_per_job=1)
    cf1, stats1 = _run(spark, spec, str(tmp_path / "pw"), cfg=cfg1)
    assert stats1["merges"] == 6
    assert_df_equal(cf.target.read(), cf1.target.read(), KEY)
    # replay: everything recognized
    cf2, stats2 = _run(spark, spec, tmp_table_path, cfg=cfg)
    assert stats2["merges"] == 0
    _check_final(spark, spec, cf2)
    # lineage rows survived per window
    assert cf.target.lineage_df().select("resolved_ts").distinct().count() == 6


def test_batched_windows_resume_mid_span(spark, tmp_table_path):
    """max_merges stops inside a span; a fresh engine resumes from the
    checkpoint and completes — per-window ids make the group atomic."""
    spec = BinlogSpec(n_events=6_000, n_convs=150, block=1_000)
    cfg = ChangefeedConfig(n_buckets=4, sink_mode="mor", compact_every=100)
    cf1, s1 = _run(spark, spec, tmp_table_path, cfg=cfg, max_merges=2)
    assert s1["merges"] == 2
    assert cf1.target.checkpoint["resolved_ts"] == 3_000  # two windows in
    cf2, s2 = _run(spark, spec, tmp_table_path, cfg=cfg)
    assert s2["merges"] == 4
    _check_final(spark, spec, cf2)


def test_target_ts_finish(spark, tmp_table_path, tmp_path):
    """changefeed_finish (tests/integration_tests/changefeed_finish): a feed
    with target_ts stops exactly AT it — no later event replicates, the
    checkpoint lands on target_ts, the feed is terminal (re-run no-op),
    and the state equals the LWW oracle over commit_ts <= target_ts."""
    spec = BinlogSpec(n_events=6_000, n_convs=150, n_partitions=4)
    tgt = spec.base_ts + 3 * spec.block + spec.block // 2  # mid-window
    cfg = ChangefeedConfig(changefeed_id="fin", target_ts=tgt)
    cf, stats = _run(spark, spec, tmp_table_path, cfg=cfg)
    assert stats["checkpoint"] == tgt
    assert cf.is_finished
    cf2, s2 = _run(spark, spec, tmp_table_path, cfg=cfg)  # terminal no-op
    assert s2["merges"] == 0 and s2["events"] == 0
    want = expected_final_state(gen_binlog(spark, spec), cf.registry, tgt, KEY)
    assert_df_equal(cf.target.read(), want, KEY)
    # an unbounded feed over the same stream is NOT finished
    cfu, _ = _run(spark, spec, str(tmp_path / "nofin"))
    assert not cfu.is_finished
