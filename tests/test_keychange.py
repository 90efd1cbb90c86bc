"""Handle-key-changing update split (ShouldSplitUpdateEvent /
trySplitAndSortUpdateEvent, /root/reference/cdc/model/sink.go:1166-1238):
an update whose handle key changed must become delete(old key) +
insert(new key), or the old row stays live and state silently corrupts.
"""

from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.operators.sortdedup import split_key_changing_updates, with_op_rank, lww_dedup
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, expected_final_state

KEY = ["conv_id", "turn_idx"]

SCHEMA = (
    "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, "
    "payload string, pre_payload string, pre_conv_id string, pre_turn_idx int, "
    "schema_version long, partition_id int"
)


def test_split_produces_delete_old_insert_new(spark):
    rows = [
        # insert at key A
        (10, 9, "I", "A", 1, '{"t":"a"}', None, None, None, 0, 0),
        # update that MOVES the row A:1 -> B:2
        (20, 19, "U", "B", 2, '{"t":"b"}', None, "A", 1, 0, 0),
        # plain update (no key change; pre-key NULL)
        (30, 29, "U", "B", 2, '{"t":"c"}', None, None, None, 0, 0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = split_key_changing_updates(df).orderBy("commit_ts", "op")
    got = [(r["commit_ts"], r["op"], r["conv_id"], r["turn_idx"], r["payload"])
           for r in out.collect()]
    assert got == [
        (10, "I", "A", 1, '{"t":"a"}'),
        (20, "D", "A", 1, None),        # delete of the OLD key, payload dropped
        (20, "I", "B", 2, '{"t":"b"}'),  # insert of the NEW key, post-image
        (30, "U", "B", 2, '{"t":"c"}'),
    ]
    assert "pre_conv_id" not in out.columns  # consumed by the split


def test_split_noop_without_pre_key_columns(spark):
    rows = [(10, 9, "U", "A", 1, "p", None, 0, 0)]
    schema = ("commit_ts long, start_ts long, op string, conv_id string, turn_idx int, "
              "payload string, pre_payload string, schema_version long, partition_id int")
    df = spark.createDataFrame(rows, schema)
    out = split_key_changing_updates(df)
    assert out.count() == 1 and out.first()["op"] == "U"


def test_lww_after_split_kills_old_key(spark):
    """The moved-from key must end dead even if older inserts exist there."""
    rows = [
        (10, 9, "I", "A", 1, '{"t":"a"}', None, None, None, 0, 0),
        (20, 19, "U", "B", 2, '{"t":"b"}', None, "A", 1, 0, 0),
    ]
    df = with_op_rank(split_key_changing_updates(spark.createDataFrame(rows, SCHEMA)))
    final = lww_dedup(df, KEY).filter(F.col("op") != "D")
    got = [(r["conv_id"], r["turn_idx"]) for r in final.collect()]
    assert got == [("B", 2)]


def test_engine_replay_with_key_mutating_updates(spark, tmp_table_path):
    """Full pipeline (multi-batch, MOR sink, restart-capable) over a stream
    where 20% of updates moved their key — final state must equal the batch
    LWW oracle over the split-expanded stream."""
    spec = BinlogSpec(n_events=6_000, n_convs=150, key_change_pct=20, n_partitions=4)
    binlog = gen_binlog(spark, spec)
    assert "pre_conv_id" in binlog.columns
    # the generator really does mutate keys
    assert binlog.filter(F.col("pre_conv_id").isNotNull()).count() > 100
    cf = Changefeed(
        spark, binlog, gen_resolved_log(spark, spec), None,
        LakeTable(spark, tmp_table_path), ChangefeedConfig(n_buckets=8),
    )
    cf.run()
    want = expected_final_state(gen_binlog(spark, spec), cf.registry, spec.max_commit_ts, KEY)
    assert_df_equal(cf.target.read(), want, KEY)
