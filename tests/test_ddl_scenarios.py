"""Extra DDL scenarios from the reference integration suite:
sequential DDLs (`ddl_manager`), reentrant DDL (`ddl_reentrant`),
DDL + MOR sink combination."""

from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, DDLSpec, gen_binlog, gen_ddl_log, gen_resolved_log
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, expected_final_state

KEY = ["conv_id", "turn_idx"]


def _run(spark, spec, path, cfg=None, max_merges=None):
    cf = Changefeed(
        spark, gen_binlog(spark, spec), gen_resolved_log(spark, spec),
        gen_ddl_log(spark, spec) if spec.ddls else None,
        LakeTable(spark, path), cfg,
    )
    return cf, cf.run(max_merges=max_merges)


def _check(spark, spec, cf, drop_meta=False):
    want = expected_final_state(gen_binlog(spark, spec), cf.registry, spec.max_commit_ts, KEY)
    got = cf.target.read()
    if drop_meta:
        got = got.drop("_commit_ts", "_start_ts", "_op_rank", "_deleted")
    assert_df_equal(got, want, KEY)


def test_sequential_ddls_add_then_rename(spark, tmp_table_path):
    """Two barriers in one stream: add_column at 1500, then rename of a
    base column at 3500 (ddl_manager: many sequential DDLs)."""
    ddls = (
        DDLSpec(commit_ts=1_500, ddl_type="add_column", column="tool_args"),
        DDLSpec(commit_ts=3_500, ddl_type="rename_column", column="speaker", old_column="role"),
    )
    spec = BinlogSpec(n_events=5_000, n_convs=120, ddls=ddls)
    cf, stats = _run(spark, spec, tmp_table_path)
    _check(spark, spec, cf)
    got = cf.target.read()
    assert {"speaker", "tool_args"} <= set(got.columns) and "role" not in got.columns
    # events written pre-add have NULL tool_args; all role data survived rename
    assert got.filter("speaker IS NULL").count() == 0


def test_two_ddls_inside_one_frontier_window(spark, tmp_table_path):
    """Both DDLs commit inside a single resolved window — the barrier must
    split the batch twice (ddl_only_block_related_table granularity)."""
    ddls = (
        DDLSpec(commit_ts=1_200, ddl_type="add_column", column="a1"),
        DDLSpec(commit_ts=1_700, ddl_type="add_column", column="a2"),
    )
    spec = BinlogSpec(n_events=3_000, n_convs=100, block=3_000, ddls=ddls)  # ONE window
    cf, stats = _run(spark, spec, tmp_table_path)
    assert stats["merges"] == 3  # (0,1200], (1200,1700], (1700,4000]
    _check(spark, spec, cf)


def test_ddl_reentrant(spark, tmp_table_path):
    """Applying the same DDL again is foregone (ddl_reentrant analog)."""
    spec = BinlogSpec(n_events=2_000, n_convs=60,
                      ddls=(DDLSpec(commit_ts=1_500, ddl_type="add_column", column="x"),))
    cf, _ = _run(spark, spec, tmp_table_path)
    assert not cf.target.alter("add_column", "x", schema_version=1_500)
    assert not cf.registry.apply_ddl(1_500, "add_column", "x")
    _check(spark, spec, cf)


def test_ddl_with_mor_sink_and_compaction(spark, tmp_table_path):
    """Schema evolution while deltas are outstanding; compaction folds
    mixed-schema filesets correctly."""
    spec = BinlogSpec(n_events=4_000, n_convs=100,
                      ddls=(DDLSpec(commit_ts=2_200, ddl_type="add_column", column="tool_args"),))
    cfg = ChangefeedConfig(changefeed_id="mordd", sink_mode="mor", compact_every=100)
    cf, _ = _run(spark, spec, tmp_table_path, cfg=cfg)
    _check(spark, spec, cf, drop_meta=True)
    cf.target.compact()
    _check(spark, spec, cf, drop_meta=True)
    got = cf.target.read()
    assert got.filter(
        "_commit_ts > 2200 AND tool_args IS NULL"
    ).count() == 0
