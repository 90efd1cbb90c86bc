"""Changefeed management surface (streaming/manager.py — the api/v2 +
owner analog, /root/reference/cdc/api/v2/changefeed.go +
cdc/model/changefeed.go state machine): create/pause/resume/remove/list,
durable registry across manager restarts, per-feed failure isolation in
the owner tick, bounded-work fairness."""

import pytest

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
from ticdc_spark.streaming.manager import ChangefeedManager
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, expected_final_state

KEY = ["conv_id", "turn_idx"]


def _engine(spark, tmp_path, fid, spec):
    return Changefeed(
        spark, gen_binlog(spark, spec), gen_resolved_log(spark, spec), None,
        LakeTable(spark, f"{tmp_path}/{fid}"),
        ChangefeedConfig(changefeed_id=fid, n_buckets=4),
    )


def test_lifecycle_pause_resume_and_state_rules(spark, tmp_path):
    mgr = ChangefeedManager(str(tmp_path / "mgr"))
    spec_a = BinlogSpec(n_events=3_000, n_convs=80, seed=1)
    spec_b = BinlogSpec(n_events=3_000, n_convs=80, seed=2)
    mgr.create("cf-a", _engine(spark, tmp_path, "cf-a", spec_a))
    mgr.create("cf-b", _engine(spark, tmp_path, "cf-b", spec_b))
    with pytest.raises(ValueError, match="already exists"):
        mgr.create("cf-a")
    # pause cf-b BEFORE any tick: it must not advance while cf-a completes
    mgr.pause("cf-b")
    with pytest.raises(ValueError, match="cannot pause"):
        mgr.pause("cf-b")
    res = mgr.tick()
    assert "cf-b" not in res and res["cf-a"]["events"] == spec_a.n_events
    assert mgr.state("cf-b") == "stopped"
    assert LakeTable(spark, f"{tmp_path}/cf-b").exists() is False
    # resume: cf-b catches up to the same final state
    mgr.resume("cf-b")
    res2 = mgr.tick()
    assert res2["cf-b"]["events"] == spec_b.n_events and res2["cf-b"]["synced"]
    from ticdc_spark.plans.schema_registry import SchemaRegistry
    want = expected_final_state(gen_binlog(spark, spec_b), SchemaRegistry(),
                                spec_b.max_commit_ts, KEY)
    assert_df_equal(LakeTable(spark, f"{tmp_path}/cf-b").read(), want, KEY)
    # listing carries states + checkpoints
    listed = {r["changefeed_id"]: r for r in mgr.list()}
    assert listed["cf-a"]["state"] == "normal"
    assert listed["cf-a"]["checkpoint_ts"] == spec_a.max_commit_ts


def test_failure_isolation_and_resume_clears_error(spark, tmp_path):
    mgr = ChangefeedManager(str(tmp_path / "mgr"))
    spec = BinlogSpec(n_events=2_000, n_convs=60, seed=3)

    class Boom:
        def run(self, *a, **k):
            raise RuntimeError("sink exploded")

    mgr.create("cf-bad", Boom())
    mgr.create("cf-good", _engine(spark, tmp_path, "cf-good", spec))
    res = mgr.tick()
    # the bad feed enters WARNING (retried next tick — the
    # feedStateManager posture); the good one still completes this tick
    assert res["cf-bad"] == {"retrying": "sink exploded", "attempt": 1}
    assert res["cf-good"]["events"] == spec.n_events
    assert mgr.state("cf-bad") == "warning"
    assert "sink exploded" in mgr.list()[0]["error"]
    # retry budget (max_retries=3): two more consecutive errors fail it hard
    mgr.tick()
    res3 = mgr.tick()
    assert "failed" in res3["cf-bad"]
    assert mgr.state("cf-bad") == "failed"
    with pytest.raises(ValueError, match="cannot resume"):
        mgr.resume("cf-good")  # normal feeds don't resume
    mgr.resume("cf-bad")  # failed feeds do, clearing the error
    assert mgr.state("cf-bad") == "normal"
    assert mgr.list()[0]["error"] is None


def test_registry_survives_manager_restart(spark, tmp_path):
    root = str(tmp_path / "mgr")
    mgr1 = ChangefeedManager(root)
    spec = BinlogSpec(n_events=2_000, n_convs=60, seed=4)
    mgr1.create("cf-r", _engine(spark, tmp_path, "cf-r", spec))
    mgr1.tick(max_merges_per_tick=1)  # partial progress
    mgr1.pause("cf-r")
    ck1 = {r["changefeed_id"]: r for r in mgr1.list()}["cf-r"]["checkpoint_ts"]
    assert 0 < ck1 < spec.max_commit_ts

    mgr2 = ChangefeedManager(root)  # restart: registry reloads from disk
    listed = {r["changefeed_id"]: r for r in mgr2.list()}
    assert listed["cf-r"]["state"] == "stopped"
    assert listed["cf-r"]["checkpoint_ts"] == ck1
    assert listed["cf-r"]["attached"] is False
    mgr2.resume("cf-r")
    assert mgr2.tick()["cf-r"] == {"skipped": "not attached"}
    # re-attach the data plane; the feed resumes from its OWN manifest
    mgr2.attach("cf-r", _engine(spark, tmp_path, "cf-r", spec))
    ticks = mgr2.run_until_synced(max_merges_per_tick=2)
    assert ticks >= 1
    from ticdc_spark.plans.schema_registry import SchemaRegistry
    want = expected_final_state(gen_binlog(spark, spec), SchemaRegistry(),
                                spec.max_commit_ts, KEY)
    assert_df_equal(LakeTable(spark, f"{tmp_path}/cf-r").read(), want, KEY)
    mgr2.remove("cf-r")
    assert mgr2.list() == []
    # removal retains replicated data (reference semantics)
    assert LakeTable(spark, f"{tmp_path}/cf-r").exists()


def test_manager_drives_multi_table_feed(spark, tmp_path):
    """The owner tick speaks both engine dialects: a MultiTableChangefeed
    under the manager advances with bounded work per tick (signature-
    dispatched max_merges_per_table) and reports the fleet checkpoint."""
    from pyspark.sql import functions as F

    from ticdc_spark.streaming.multi import MultiTableChangefeed

    specs = {f"m{i}": BinlogSpec(n_events=2_000, n_convs=60, seed=30 + i)
             for i in range(2)}
    parts = [gen_binlog(spark, s).withColumn("table_name", F.lit(t))
             for t, s in specs.items()]
    binlog = parts[0].unionByName(parts[1])
    mt = MultiTableChangefeed(
        spark, binlog, gen_resolved_log(spark, next(iter(specs.values()))),
        None,
        table_factory=lambda t: LakeTable(spark, f"{tmp_path}/{t}"),
        config=ChangefeedConfig(changefeed_id="mmt", n_buckets=4),
        tables=list(specs),
    )
    mgr = ChangefeedManager(str(tmp_path / "mgr"))
    mgr.create("cf-fleet", mt)
    r1 = mgr.tick(max_merges_per_tick=1)  # bounded: one window this tick
    assert 0 < r1["cf-fleet"]["checkpoint_ts"] < next(iter(specs.values())).max_commit_ts
    mgr.run_until_synced(max_merges_per_tick=2)
    listed = mgr.list()[0]
    assert listed["checkpoint_ts"] == next(iter(specs.values())).max_commit_ts
    from ticdc_spark.plans.schema_registry import SchemaRegistry
    for t, s in specs.items():
        want = expected_final_state(gen_binlog(spark, s), SchemaRegistry(),
                                    s.max_commit_ts, KEY)
        assert_df_equal(mt.read(t), want, KEY)


def test_target_ts_feed_reaches_finished_state(spark, tmp_path):
    """A feed created with target_ts transitions to the TERMINAL finished
    state on the tick that reaches it; finished feeds are skipped by later
    ticks and can neither pause nor resume (changefeed.go state rules)."""
    mgr = ChangefeedManager(str(tmp_path / "mgr"))
    spec = BinlogSpec(n_events=3_000, n_convs=80, seed=7)
    tgt = spec.base_ts + 2 * spec.block
    eng = Changefeed(
        spark, gen_binlog(spark, spec), gen_resolved_log(spark, spec), None,
        LakeTable(spark, f"{tmp_path}/cf-fin"),
        ChangefeedConfig(changefeed_id="cf-fin", n_buckets=4, target_ts=tgt),
    )
    mgr.create("cf-fin", eng)
    res = mgr.tick()
    assert res["cf-fin"]["finished"] and res["cf-fin"]["checkpoint_ts"] == tgt
    assert mgr.state("cf-fin") == "finished"
    assert mgr.tick() == {}  # terminal: skipped entirely
    with pytest.raises(ValueError, match="cannot pause"):
        mgr.pause("cf-fin")
    with pytest.raises(ValueError, match="cannot resume"):
        mgr.resume("cf-fin")


def test_warning_feed_recovers_on_success(spark, tmp_path):
    """A transient error (fails once, then works) leaves the feed in
    warning for one tick and back to normal on the next successful run —
    error cleared, retry counter reset (sink_retry analog)."""
    mgr = ChangefeedManager(str(tmp_path / "mgr"))
    spec = BinlogSpec(n_events=2_000, n_convs=60, seed=9)
    inner = _engine(spark, tmp_path, "cf-flaky", spec)

    class Flaky:
        def __init__(self):
            self.calls = 0

        def run(self, *a, **k):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("transient broker hiccup")
            return inner.run(*a, **k)

        @property
        def is_synced(self):
            return inner.is_synced

        target = inner.target

    mgr.create("cf-flaky", Flaky())
    res1 = mgr.tick()
    assert "retrying" in res1["cf-flaky"] and mgr.state("cf-flaky") == "warning"
    res2 = mgr.tick()
    assert res2["cf-flaky"]["events"] == spec.n_events
    assert mgr.state("cf-flaky") == "normal"
    rec = {r["changefeed_id"]: r for r in mgr.list()}["cf-flaky"]
    assert rec["error"] is None and rec["consecutive_errors"] == 0
