"""Disaster-recovery replay (tools/redo_apply — the redo-apply analog,
/root/reference/pkg/cmd/redo/apply.go): kill a changefeed mid-stream,
rebuild on a CLEAN directory from the WAL alone, and prove the rebuilt
table is bit-identical to the crashed original at its checkpoint — then
that catch-up past the bound reaches the full final state."""

import json
import subprocess
import sys

from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, DDLSpec, gen_binlog, gen_resolved_log
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, expected_final_state
from ticdc_spark.tools.redo_apply import redo_apply

KEY = ["conv_id", "turn_idx"]


def _digest(spark, table: LakeTable) -> str:
    """Order-insensitive whole-state digest: bit-identical tables agree."""
    df = table.read()
    row = df.select(
        F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                               F.lit("\x00"))
                                    for c in sorted(df.columns)])).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"),
          F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s")
          ).collect()[0]
    return f"{row['n']}:{row['s']}"


def test_redo_apply_rebuilds_crashed_state(spark, tmp_path):
    spec = BinlogSpec(
        n_events=8_000, n_convs=200, seed=77,
        ddls=(DDLSpec(commit_ts=3_000, ddl_type="add_column", column="tool_args"),),
    )
    binlog = gen_binlog(spark, spec)
    resolved = gen_resolved_log(spark, spec)
    ddl_rows = [{"commit_ts": 3_000, "ddl_type": "add_column",
                 "query": "ALTER TABLE transcripts ADD COLUMN tool_args STRING",
                 "column": "tool_args", "old_column": None,
                 "col_type": "string", "schema_version": 3_000}]
    orig = LakeTable(spark, str(tmp_path / "orig"))
    cf = Changefeed(spark, binlog, resolved, ddl_rows, orig,
                    ChangefeedConfig(changefeed_id="orig", n_buckets=4))
    cf.run(max_merges=3)  # the crash: mid-stream, schema already evolved
    crash_ckpt = orig.checkpoint["resolved_ts"]
    assert 0 < crash_ckpt < spec.max_commit_ts

    # rebuild on a CLEAN dir up to the crash checkpoint -> bit-identical
    rebuilt = str(tmp_path / "rebuilt")
    redo_apply(spark, binlog, resolved, ddl_rows, rebuilt,
               config=ChangefeedConfig(changefeed_id="dr", n_buckets=4),
               until=crash_ckpt)
    rt = LakeTable(spark, rebuilt)
    assert rt.checkpoint["resolved_ts"] == crash_ckpt
    assert_df_equal(rt.read(), orig.read(), KEY)
    assert _digest(spark, rt) == _digest(spark, orig)

    # a second apply WITHOUT the bound catches the same target up to the
    # full frontier (idempotent overlap), matching the batch oracle
    redo_apply(spark, binlog, resolved, ddl_rows, rebuilt,
               config=ChangefeedConfig(changefeed_id="dr", n_buckets=4))
    want = expected_final_state(binlog, cf.registry, spec.max_commit_ts, KEY)
    assert_df_equal(LakeTable(spark, rebuilt).read(), want, KEY)


def test_redo_apply_cli(spark, tmp_path):
    """The argparse entry point end-to-end in a subprocess (spark-submit
    stand-in): parquet WAL + JSON DDL file in, rebuilt table out."""
    spec = BinlogSpec(n_events=2_000, n_convs=60, seed=9)
    wal = str(tmp_path / "wal")
    res = str(tmp_path / "resolved")
    gen_binlog(spark, spec).write.parquet(wal)
    gen_resolved_log(spark, spec).write.parquet(res)
    ddl_path = tmp_path / "ddl.json"
    ddl_path.write_text(json.dumps([]))
    target = str(tmp_path / "rebuilt")
    out = subprocess.run(
        [sys.executable, "-m", "ticdc_spark.tools.redo_apply",
         "--wal", wal, "--resolved", res, "--target", target,
         "--n-buckets", "4", "--changefeed-id", "dr-cli"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["events"] == spec.n_events
    from ticdc_spark.plans.schema_registry import SchemaRegistry
    want = expected_final_state(
        gen_binlog(spark, spec), SchemaRegistry(), spec.max_commit_ts, KEY)
    got = LakeTable(spark, target).read()
    assert_df_equal(got, want, KEY)


def test_redo_apply_multi_rebuilds_fleet(spark, tmp_path):
    """Fleet DR: a multi-table feed killed mid-stream is rebuilt on a
    clean root from the shared WAL alone — every table bit-identical at
    the crash checkpoint, then catch-up to the full frontier."""
    from ticdc_spark.streaming.multi import MultiTableChangefeed
    from ticdc_spark.tools.redo_apply import redo_apply_multi

    specs = {f"d{i}": BinlogSpec(n_events=2_500, n_convs=70, seed=50 + i)
             for i in range(3)}
    parts = [gen_binlog(spark, s).withColumn("table_name", F.lit(t))
             for t, s in specs.items()]
    binlog = parts[0]
    for p in parts[1:]:
        binlog = binlog.unionByName(p)
    resolved = gen_resolved_log(spark, next(iter(specs.values())))
    mt = MultiTableChangefeed(
        spark, binlog, resolved, None,
        table_factory=lambda t: LakeTable(spark, f"{tmp_path}/orig/{t}"),
        config=ChangefeedConfig(changefeed_id="orig", n_buckets=4),
        tables=list(specs),
    )
    mt.run(max_merges_per_table=1)  # the crash
    ck = mt.checkpoint()
    assert 0 < ck < next(iter(specs.values())).max_commit_ts

    stats = redo_apply_multi(
        spark, binlog, resolved, None, f"{tmp_path}/rebuilt",
        tables=list(specs),
        config=ChangefeedConfig(changefeed_id="dr", n_buckets=4), until=ck)
    assert stats["checkpoint"] == ck
    for t in specs:
        rt = LakeTable(spark, f"{tmp_path}/rebuilt/{t}")
        assert rt.checkpoint["resolved_ts"] == ck
        assert_df_equal(rt.read(), mt.read(t), KEY)
        assert _digest(spark, rt) == _digest(
            spark, LakeTable(spark, f"{tmp_path}/orig/{t}"))
    # unbounded second apply catches the fleet up to the full final state
    redo_apply_multi(spark, binlog, resolved, None, f"{tmp_path}/rebuilt",
                     tables=list(specs),
                     config=ChangefeedConfig(changefeed_id="dr", n_buckets=4))
    from ticdc_spark.plans.schema_registry import SchemaRegistry
    for t, s in specs.items():
        want = expected_final_state(gen_binlog(spark, s), SchemaRegistry(),
                                    s.max_commit_ts, KEY)
        assert_df_equal(LakeTable(spark, f"{tmp_path}/rebuilt/{t}").read(),
                        want, KEY)
