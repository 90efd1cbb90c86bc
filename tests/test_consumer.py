"""MQ consumer-apply (the kafka/pulsar/storage-consumer tool analog,
cmd/kafka-consumer/{writer,event_group}.go): watermark semantics,
at-least-once idempotency, exactly-once re-consume, protocol parity and
claim-check resolution."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.operators.sortdedup import lww_dedup, with_op_rank
from ticdc_spark.sinks.consumer import consume_apply, partition_watermarks
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sinks.mq import (
    dispatch_by_ts,
    encode_craft,
    encode_open_protocol,
    resolved_messages,
    write_claim_check,
)

KEY = ("conv_id", "turn_idx")
COLS = ["conv_id", "turn_idx", "text"]
TYPES = {"conv_id": "string", "turn_idx": "int", "text": "string"}


def _binlog(spark, n=240):
    """Synthetic change stream: unique commit_ts, D every 9th, U every 3rd."""
    return spark.range(n).select(
        (F.lit(1000) + F.col("id") + 1).alias("commit_ts"),
        F.concat(F.lit("c-"), (F.col("id") % 20).cast("string")).alias("conv_id"),
        (F.col("id") % 4).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 9 == 0, "D")
        .when(F.col("id") % 3 == 0, "U")
        .otherwise("I")
        .alias("op"),
    ).withColumn("start_ts", F.col("commit_ts") - 1).withColumn(
        "text",
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("p-"), F.col("commit_ts").cast("string"))),
    )


def _frames(spark, b, flush, n_parts=3, protocol="open", **enc_kw):
    enc_fn = encode_open_protocol if protocol == "open" else encode_craft
    enc = dispatch_by_ts(enc_fn(b, "tdb", "t1", COLS, col_types=TYPES, **enc_kw), n_parts)
    bounds = sorted({flush * i // 2 for i in (1,)} | {flush})
    resolved = spark.createDataFrame(
        [(p, r, i) for p in range(n_parts) for i, r in enumerate(bounds)],
        "partition_id int, resolved_ts long, emit_seq long",
    )
    markers = resolved_messages(resolved, ["tdb_t1"], n_parts)
    cols = ["topic", "partition", "key", "value"]
    if "key" not in enc.columns:  # craft frames carry no message key
        enc = enc.withColumn("key", F.lit(None).cast("string"))
    return enc.select(*cols).unionByName(
        markers.select("topic", "partition", "key")
        .withColumn("value", F.lit(None).cast("string"))
    )


def _expected(b, flush):
    d = lww_dedup(with_op_rank(b.filter(F.col("commit_ts") <= flush)), list(KEY))
    return d.filter(F.col("op") != "D").select(*COLS)


def _state(t):
    return t.read().select(*COLS)


def test_consume_apply_matches_lww_and_holds_tail(spark, tmp_path):
    b = _binlog(spark)
    flush = 1000 + 180  # last 60 events unresolved
    frames = _frames(spark, b, flush)
    t = LakeTable(spark, str(tmp_path / "t"))
    stats = consume_apply(spark, frames, t, COLS, TYPES, key=KEY)
    assert stats["flush_ts"] == flush
    assert stats["held_back"] == 60
    assert stats["batches"] == 2  # one merge per resolved step
    assert_df_equal(_state(t), _expected(b, flush), KEY)


def test_consume_apply_duplicated_frames_idempotent(spark, tmp_path):
    """At-least-once delivery: every frame delivered twice — value-level
    no-op (the REPLACE idempotency, mysql.go:516,533-537)."""
    b = _binlog(spark)
    flush = 1000 + 240
    frames = _frames(spark, b, flush)
    frames = frames.unionAll(frames)
    t = LakeTable(spark, str(tmp_path / "t"))
    consume_apply(spark, frames, t, COLS, TYPES, key=KEY)
    assert_df_equal(_state(t), _expected(b, flush), KEY)


def test_consume_apply_reconsume_skips_batches(spark, tmp_path):
    """Re-running the consumer over the same topic dump is exactly-once:
    every resolved-step batch id is recognized and skipped."""
    b = _binlog(spark)
    flush = 1000 + 240
    frames = _frames(spark, b, flush)
    t = LakeTable(spark, str(tmp_path / "t"))
    s1 = consume_apply(spark, frames, t, COLS, TYPES, key=KEY)
    v1 = t.manifest()["version"]
    s2 = consume_apply(spark, frames, t, COLS, TYPES, key=KEY)
    assert s1["applied"] == 240 and s2["applied"] == 0
    assert t.manifest()["version"] == v1  # no new commits
    assert_df_equal(_state(t), _expected(b, flush), KEY)


def test_consume_apply_silent_partition_blocks_flush(spark, tmp_path):
    """A partition that carries rows but never resolves holds the whole
    fleet at 0 (writer.go getMinWatermark): nothing may be applied, since
    that partition could still deliver an older version of any key."""
    b = _binlog(spark)
    flush = 1000 + 240
    frames = _frames(spark, b, flush)
    # drop partition 2's markers but keep its rows
    t2 = F.get_json_object("key", "$.t").cast("int") == 3
    frames = frames.filter(~(t2 & (F.col("partition") == 2)))
    t = LakeTable(spark, str(tmp_path / "t"))
    stats = consume_apply(spark, frames, t, COLS, TYPES, key=KEY)
    assert stats["flush_ts"] == 0
    assert stats["applied"] == 0
    assert _state(t).count() == 0


def test_consume_apply_craft_protocol_parity(spark, tmp_path):
    b = _binlog(spark)
    flush = 1000 + 180
    frames = _frames(spark, b, flush, protocol="craft")
    t = LakeTable(spark, str(tmp_path / "t"))
    stats = consume_apply(spark, frames, t, COLS, TYPES, key=KEY, protocol="craft")
    assert stats["held_back"] == 60
    assert_df_equal(_state(t), _expected(b, flush), KEY)


def test_consume_apply_claim_check_resolution(spark, tmp_path):
    """Oversized payloads ride the claim-check store; the consumer resolves
    locations BEFORE decoding, so the downstream state carries the FULL
    text (open_protocol_encoder.go:291-302 + consumer resolution)."""
    b = _binlog(spark).withColumn(
        "text",
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .when(F.col("turn_idx") == 2, F.rpad(F.lit("L"), 600, "x"))
        .otherwise(F.concat(F.lit("p-"), F.col("commit_ts").cast("string"))),
    )
    flush = 1000 + 240
    store = str(tmp_path / "claims")
    enc = dispatch_by_ts(
        encode_open_protocol(
            b, "tdb", "t1", COLS, col_types=TYPES,
            large_message_handle="claim-check", max_message_bytes=400,
            claim_check_prefix=store,
        ),
        3,
    )
    write_claim_check(enc, store)
    resolved = spark.createDataFrame(
        [(p, flush, 0) for p in range(3)],
        "partition_id int, resolved_ts long, emit_seq long",
    )
    markers = resolved_messages(resolved, ["tdb_t1"], 3)
    frames = enc.select("topic", "partition", "key", "value").unionByName(
        markers.select("topic", "partition", "key")
        .withColumn("value", F.lit(None).cast("string"))
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    consume_apply(
        spark, frames, t, COLS, TYPES, key=KEY, claim_check_path=store
    )
    assert_df_equal(_state(t), _expected(b, flush), KEY)
    # the oversized rows made it through WITH their full 600-byte payload
    big = t.read().filter(F.length("text") == 600).count()
    assert big > 0


def test_partition_watermarks_absorb_regression(spark):
    """Duplicated/regressed markers fold away (writer.go:436-446)."""
    rows = spark.createDataFrame(
        [("t", 0, '{"ts":50,"t":3}'), ("t", 0, '{"ts":30,"t":3}'),
         ("t", 0, '{"ts":50,"t":3}'), ("t", 1, '{"ts":40,"t":3}')],
        "topic string, partition int, key string",
    ).withColumn("value", F.lit(None).cast("string"))
    wm = {(r["topic"], r["partition"]): r["watermark"]
          for r in partition_watermarks(rows).collect()}
    assert wm == {("t", 0): 50, ("t", 1): 40}
