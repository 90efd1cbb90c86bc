"""Schema multi-version replay + mounter decode tests.

Mirrors cdc/entry/schema_storage_test.go (TestHandleDDL :294,
TestMultiVersionStorage :486, TestHandleRenameTables :394) and
cdc/entry/mounter_test.go (TestGetDefaultZeroValue :464, TestDecodeRow :1238).
"""

from pyspark.sql import functions as F

from ticdc_spark.functions.mount import mount, mounted_columns, verify_checksum
from ticdc_spark.plans.schema_registry import SchemaRegistry
from ticdc_spark.sources.binlog_gen import BinlogSpec, DDLSpec, gen_binlog, gen_ddl_log


def test_multi_version_snapshot_lookup():
    reg = SchemaRegistry()
    assert reg.apply_ddl(100, "add_column", "tool_args")
    assert reg.apply_ddl(200, "rename_column", "speaker", old_column="role")
    # idempotent / foregone replay (schema_storage.go:204-219)
    assert not reg.apply_ddl(200, "rename_column", "speaker", old_column="role")
    assert not reg.apply_ddl(50, "add_column", "zzz")

    assert [n for n, _ in reg.snapshot_at(0).fields] == ["role", "text", "tool", "ts"]
    assert [n for n, _ in reg.snapshot_at(99).fields] == ["role", "text", "tool", "ts"]
    assert [n for n, _ in reg.snapshot_at(100).fields] == ["role", "text", "tool", "ts", "tool_args"]
    assert [n for n, _ in reg.snapshot_at(10**9).fields] == ["speaker", "text", "tool", "ts", "tool_args"]
    assert reg.resolved_ts == 200


def test_writer_field_map_rename_chain():
    reg = SchemaRegistry()
    reg.apply_ddl(100, "rename_column", "speaker", old_column="role")
    reg.apply_ddl(200, "rename_column", "actor", old_column="speaker")
    cur = reg.snapshot_at(10**9)
    maps = reg.writer_field_map(cur)
    # a payload written at version 0 used 'role'; at 100 used 'speaker'
    assert maps[0]["actor"] == "role"
    assert maps[100]["actor"] == "speaker"
    assert maps[200]["actor"] == "actor"


def test_mount_decodes_payload_and_fills_missing(spark):
    ddl = DDLSpec(commit_ts=1_500, ddl_type="add_column", column="tool_args")
    spec = BinlogSpec(n_events=2_000, ddls=(ddl,))
    reg = SchemaRegistry()
    reg.replay([r.asDict() for r in gen_ddl_log(spark, spec).collect()])
    df = gen_binlog(spark, spec)
    out = mount(df, reg, as_of_ts=spec.max_commit_ts)
    assert mounted_columns(reg, spec.max_commit_ts) == ["role", "text", "tool", "ts", "tool_args"]
    live = out.filter(F.col("op") != "D")
    # old-version events get NULL for the added column; new ones carry it
    assert live.filter("commit_ts <= 1500 AND tool_args IS NOT NULL").count() == 0
    assert live.filter("commit_ts > 1500 AND tool_args IS NULL").count() == 0
    # text round-trips the JSON decode
    bad = live.filter(
        F.col("text") != F.format_string("t %s:%d v%d", "conv_id", "turn_idx", "commit_ts")
    ).count()
    assert bad == 0
    # ts is a real timestamp
    assert dict(out.dtypes)["ts"] == "timestamp"
    # deletes decode to all-NULL payload
    assert out.filter("op = 'D' AND text IS NOT NULL").count() == 0


def test_mount_rename_maps_old_writers(spark):
    ddl = DDLSpec(commit_ts=1_000, ddl_type="rename_column", column="speaker", old_column="role")
    spec = BinlogSpec(n_events=2_000, ddls=(ddl,))
    reg = SchemaRegistry()
    reg.replay([r.asDict() for r in gen_ddl_log(spark, spec).collect()])
    out = mount(gen_binlog(spark, spec), reg, as_of_ts=spec.max_commit_ts)
    assert "speaker" in out.columns and "role" not in out.columns
    # both pre- and post-rename writers populate the renamed column
    assert out.filter("op != 'D' AND speaker IS NULL").count() == 0


def test_mount_defaults(spark):
    ddl = DDLSpec(commit_ts=1_000, ddl_type="add_column", column="quality")
    spec = BinlogSpec(n_events=1_500, ddls=(ddl,))
    reg = SchemaRegistry()
    reg.replay([r.asDict() for r in gen_ddl_log(spark, spec).collect()])
    out = mount(gen_binlog(spark, spec), reg, as_of_ts=spec.max_commit_ts,
                defaults={"quality": "unknown"})
    # default fills rows whose writer schema lacked the column
    # (getDefaultOrZeroValue, mounter.go:909-965)
    assert out.filter("op != 'D' AND commit_ts <= 1000 AND quality != 'unknown'").count() == 0


def test_checksum(spark):
    spec = BinlogSpec(n_events=500)
    df = verify_checksum(gen_binlog(spark, spec))
    assert df.filter(F.col("_checksum").isNull()).count() == 0


def test_checksum_quarantine_in_pipeline(spark, tmp_table_path):
    """P3 wired into the driver loop: corrupt rows are quarantined (counted,
    excluded from the merge); the final state equals the LWW oracle over the
    intact stream."""
    from pyspark.sql import functions as F

    from tests.conftest import assert_df_equal
    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
    from ticdc_spark.streaming.pipeline import (
        Changefeed, ChangefeedConfig, expected_final_state,
    )

    spec = BinlogSpec(n_events=3_000, n_convs=100)
    good = F.md5(F.coalesce(F.col("payload"), F.lit("")))
    bad = F.md5(F.concat(F.coalesce(F.col("payload"), F.lit("")), F.lit("X")))
    corrupt = (F.col("commit_ts") % 11 == 0)
    binlog = gen_binlog(spark, spec).withColumn(
        "checksum", F.when(corrupt, bad).otherwise(good)
    )
    cfg = ChangefeedConfig(n_buckets=4, verify_checksums=True)
    cf = Changefeed(spark, binlog, gen_resolved_log(spark, spec), None,
                    LakeTable(spark, tmp_table_path), cfg)
    stats = cf.run()
    assert stats["quarantined"] == binlog.filter(corrupt).count()
    # oracle: LWW over the intact (non-corrupt) stream only
    want = expected_final_state(
        gen_binlog(spark, spec).filter(~corrupt), cf.registry,
        spec.max_commit_ts, ["conv_id", "turn_idx"],
    )
    assert_df_equal(cf.target.read(), want, ["conv_id", "turn_idx"])


def test_modify_column_registry_and_mixed_batch_decode(spark):
    """ModifyColumn (snapshot.go:412-551): same column id, new type; one
    Arrow batch holding writers of ALL THREE type eras decodes with exact
    CAST semantics (int->long->string)."""
    base = (("role", "string"), ("text", "string"), ("ts", "long"), ("score", "int"))
    reg = SchemaRegistry(base)
    assert reg.apply_ddl(100, "modify_column", "score", col_type="long")
    assert reg.apply_ddl(200, "modify_column", "score", col_type="string")
    cur = reg.snapshot_at(10**9)
    assert dict(cur.fields)["score"] == "string"
    # same column id across the chain
    idx = [n for n, _ in cur.fields].index("score")
    assert cur.col_ids[idx] == reg.snapshot_at(0).col_ids[idx]
    tmap = reg.writer_type_map(cur)
    assert tmap[0]["score"] == "int" and tmap[100]["score"] == "long"
    rows = [
        (50, 49, "I", "c", 0, '{"role":"user","text":"a","ts":1,"score":42}', None, 0, 0),
        (150, 149, "I", "c", 1, '{"role":"user","text":"b","ts":2,"score":5000000123}', None, 100, 0),
        (250, 249, "I", "c", 2, '{"role":"user","text":"c","ts":3,"score":"s-9"}', None, 200, 0),
        (260, 259, "D", "c", 3, None, None, 200, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, "
        "payload string, pre_payload string, schema_version long, partition_id int",
    )
    out = mount(df, reg, as_of_ts=10**9)
    got = {r["turn_idx"]: r["score"] for r in out.collect()}
    assert got == {0: "42", 1: "5000000123", 2: "s-9", 3: None}
    assert dict(out.dtypes)["score"] == "string"


def test_modify_column_guards():
    reg = SchemaRegistry()
    try:
        reg.apply_ddl(100, "modify_column", "nope", col_type="long")
        raised = False
    except ValueError:
        raised = True
    assert raised
