"""Structured-Streaming mode: arrival-ordered batches + order-aware MERGE.

The invariant under test: final state is INDEPENDENT of batch boundaries
— any interleaving of arrival-ordered files produces the same table as the
batch LWW oracle, because merge_lww re-establishes the order law against
the stored (_commit_ts, _start_ts, _op_rank) and keeps delete tombstones.
"""

from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog
from ticdc_spark.streaming.pipeline import ChangefeedConfig, expected_final_state
from ticdc_spark.streaming.structured import run_streaming

KEY = ["conv_id", "turn_idx"]


def _write_binlog(spark, spec, path, n_files=6):
    gen_binlog(spark, spec).repartition(n_files).write.parquet(path)


def _final(cf_registry, spark, spec):
    from ticdc_spark.plans.schema_registry import SchemaRegistry

    return expected_final_state(gen_binlog(spark, spec), SchemaRegistry(), spec.max_commit_ts, KEY)


def test_streaming_matches_oracle(spark, tmp_path):
    spec = BinlogSpec(n_events=6_000, n_convs=150)
    binlog_dir = str(tmp_path / "binlog")
    _write_binlog(spark, spec, binlog_dir)
    t = LakeTable(spark, str(tmp_path / "t"))
    stats = run_streaming(
        spark, binlog_dir, t, ChangefeedConfig(changefeed_id="s1", n_buckets=8),
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=2,
    )
    assert stats["batches"] >= 3 and stats["events"] == spec.n_events
    got = t.read().drop("_commit_ts", "_start_ts", "_op_rank", "_deleted")
    assert_df_equal(got, _final(None, spark, spec), KEY)


def test_streaming_incremental_and_restart(spark, tmp_path):
    """Files land in two waves; the stream drains each wave with the same
    checkpoint — and replaying wave 2 is a no-op (exactly-once)."""
    spec = BinlogSpec(n_events=4_000, n_convs=100)
    binlog_dir = str(tmp_path / "binlog")
    full = gen_binlog(spark, spec)
    # wave 1 = first half of arrival order, wave 2 = rest (split by commit parity — arbitrary)
    full.filter(F.col("start_ts") % 2 == 0).repartition(2).write.mode("append").parquet(binlog_dir)
    t = LakeTable(spark, str(tmp_path / "t"))
    cfg = ChangefeedConfig(changefeed_id="s2", n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    run_streaming(spark, binlog_dir, t, cfg, checkpoint_dir=ckpt)
    full.filter(F.col("start_ts") % 2 != 0).repartition(2).write.mode("append").parquet(binlog_dir)
    run_streaming(spark, binlog_dir, t, cfg, checkpoint_dir=ckpt)
    # third drain: nothing new
    s3 = run_streaming(spark, binlog_dir, t, cfg, checkpoint_dir=ckpt)
    assert s3["events"] == 0
    got = t.read().drop("_commit_ts", "_start_ts", "_op_rank", "_deleted")
    assert_df_equal(got, _final(None, spark, spec), KEY)


def test_tombstone_blocks_late_older_event(spark, tmp_path):
    """A delete at ts 30 arrives in batch 1; an OLDER update (ts 20) for the
    same key arrives in batch 2 — it must NOT resurrect the row."""
    schema = (
        "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, "
        "payload string, pre_payload string, schema_version long, partition_id int"
    )
    pay = '{"role":"user","text":"%s","tool":null,"ts":1}'
    b1 = spark.createDataFrame(
        [(10, 9, "I", "c1", 0, pay % "v10", None, 0, 0),
         (30, 29, "D", "c1", 0, None, None, 0, 0),
         (10, 9, "I", "c2", 0, pay % "keep", None, 0, 0)], schema)
    b2 = spark.createDataFrame(
        [(20, 19, "U", "c1", 0, pay % "v20-late", None, 0, 0),
         (40, 39, "U", "c2", 0, pay % "newer", None, 0, 0)], schema)
    d1 = str(tmp_path / "binlog")
    b1.coalesce(1).write.mode("append").parquet(d1)
    t = LakeTable(spark, str(tmp_path / "t"))
    cfg = ChangefeedConfig(changefeed_id="s3", n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    run_streaming(spark, d1, t, cfg, checkpoint_dir=ckpt)
    b2.coalesce(1).write.mode("append").parquet(d1)
    run_streaming(spark, d1, t, cfg, checkpoint_dir=ckpt)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert got == {("c2", 0): "newer"}  # c1 stays deleted
    # the tombstone is still present internally
    assert t.read(include_deleted=True).filter("_deleted = 1").count() == 1


def test_streaming_ddl_monotone_schema(spark, tmp_path):
    """DDL in arrival-ordered mode: an add_column DDL replayed up front
    evolves the target once; events written under BOTH schema versions —
    arriving in ONE stream, across batch boundaries unaligned with the DDL
    commit-ts — decode against their own writer version and produce the
    barrier-replay final state."""
    from ticdc_spark.sources.binlog_gen import DDLSpec, gen_ddl_log

    ddl = DDLSpec(commit_ts=2_000, ddl_type="add_column", column="tool_args")
    spec = BinlogSpec(n_events=4_000, n_convs=100, ddls=(ddl,))
    binlog_dir = str(tmp_path / "binlog")
    _write_binlog(spark, spec, binlog_dir)
    t = LakeTable(spark, str(tmp_path / "t"))
    stats = run_streaming(
        spark, binlog_dir, t, ChangefeedConfig(changefeed_id="sd", n_buckets=8),
        ddl_log=[r.asDict() for r in gen_ddl_log(spark, spec).collect()],
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=2,
    )
    assert stats["events"] == spec.n_events
    got = t.read().drop("_commit_ts", "_start_ts", "_op_rank", "_deleted")
    assert "tool_args" in got.columns
    from ticdc_spark.plans.schema_registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.replay([r.asDict() for r in gen_ddl_log(spark, spec).collect()])
    want = expected_final_state(gen_binlog(spark, spec), reg, spec.max_commit_ts, KEY)
    assert_df_equal(got, want, KEY)
    # pre-DDL winners carry NULL tool_args, post-DDL winners carry values
    assert got.filter("ts <= timestamp_micros(1700002000 * CAST(1000000 AS BIGINT)) "
                      "AND tool_args IS NOT NULL").count() == 0
    assert got.filter("tool_args IS NOT NULL").count() > 0
