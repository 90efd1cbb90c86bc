"""Generator contract tests (the synthetic TiKV guarantee, kv.go:59-66)."""

from pyspark.sql import functions as F

from ticdc_spark.sources.binlog_gen import BinlogSpec, DDLSpec, gen_binlog, gen_ddl_log, gen_resolved_log
from ticdc_spark.sources.frontier import frontier_steps, global_frontier


def test_deterministic(spark):
    spec = BinlogSpec(n_events=2_000)
    a = gen_binlog(spark, spec).collect()
    b = gen_binlog(spark, spec).collect()
    assert a == b


def test_commit_ts_unique_and_bounded(spark):
    spec = BinlogSpec(n_events=3_500, block=1_000)
    df = gen_binlog(spark, spec)
    n = df.count()
    assert n == 3_500
    assert df.select("commit_ts").distinct().count() == n
    row = df.agg(F.min("commit_ts").alias("lo"), F.max("commit_ts").alias("hi")).collect()[0]
    assert row["lo"] >= spec.base_ts + 1
    assert row["hi"] <= spec.max_commit_ts


def test_out_of_order_within_block_but_resolved_contract_holds(spark):
    """Arrival order (row order) is scrambled inside a block, but every
    event with commit_ts <= resolved r exists once r is emitted."""
    spec = BinlogSpec(n_events=2_000, block=1_000)
    df = gen_binlog(spark, spec)
    rows = df.select("commit_ts").collect()
    ts = [r[0] for r in rows]
    assert ts != sorted(ts), "expected out-of-order arrival within blocks"
    # block containment: event i in block k has commit_ts in (base+k*block, base+(k+1)*block]
    bad = (
        gen_binlog(spark, spec)
        .withColumn("row_id", F.monotonically_increasing_id())
        .filter(
            (F.col("commit_ts") <= spec.base_ts)
            | (F.col("commit_ts") > spec.base_ts + spec.n_events)
        )
        .count()
    )
    assert bad == 0


def test_frontier(spark):
    spec = BinlogSpec(n_events=3_000, block=1_000, n_partitions=4)
    resolved = gen_resolved_log(spark, spec)
    assert global_frontier(resolved) == spec.base_ts + 3_000
    assert frontier_steps(resolved, low=spec.base_ts) == [2000, 3000, 4000]
    assert frontier_steps(resolved, low=2000) == [3000, 4000]
    # hole detection: a partition that never reported holds the frontier
    assert global_frontier(resolved.filter("partition_id != 3"), expected_partitions=4) == 0


def test_schema_versions_in_binlog(spark):
    ddl = DDLSpec(commit_ts=2_000, ddl_type="add_column", column="tool_args")
    spec = BinlogSpec(n_events=3_000, ddls=(ddl,))
    df = gen_binlog(spark, spec)
    pre = df.filter("commit_ts <= 2000")
    post = df.filter("commit_ts > 2000")
    assert pre.filter("schema_version != 0").count() == 0
    assert post.filter("schema_version != 2000").count() == 0
    assert post.filter(~F.col("payload").contains("tool_args")).filter("op != 'D'").count() == 0
    assert pre.filter(F.col("payload").contains("tool_args")).count() == 0
    ddl_df = gen_ddl_log(spark, spec)
    assert ddl_df.collect()[0]["query"].startswith("ALTER TABLE transcripts ADD COLUMN")
