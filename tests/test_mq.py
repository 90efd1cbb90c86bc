"""K5 MQ codecs + X4 dispatchers (pkg/sink/codec/*, mq/dispatcher/partition/*)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ticdc_spark.sinks.mq import (
    RouteRule,
    decode_open_protocol,
    dispatch_by_columns,
    dispatch_by_index_value,
    dispatch_by_key,
    dispatch_by_table,
    dispatch_by_ts,
    dispatch_default,
    encode_canal_json,
    encode_csv,
    encode_open_protocol,
    route_events,
)

ROWS = [
    (1001, 1000, "I", "conv-a", 1, "hello"),
    (1002, 1001, "U", "conv-a", 1, "hi, there"),  # comma inside a column
    (1003, 1002, "D", "conv-b", 2, None),          # delete: NULL payload
]
SCHEMA = "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, text string"


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_canal_json_roundtrip(spark):
    """from_json(encode(...)) recovers every routed field — the consumer
    contract of the canal-json protocol."""
    enc = encode_canal_json(_df(spark), "transcripts", ["conv_id", "turn_idx", "text"])
    val_schema = T.StructType([
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("data", T.StringType()),
    ])
    dec = enc.select(F.from_json("value", val_schema).alias("v"), "commit_ts")
    rows = {r["commit_ts"]: r["v"] for r in dec.collect()}
    assert rows[1001]["type"] == "INSERT" and rows[1003]["type"] == "DELETE"
    assert all(v["table"] == "transcripts" and v["ts"] == k for k, v in rows.items())
    inner = spark.createDataFrame([(rows[1002]["data"],)], "d string").select(
        F.get_json_object("d", "$[0].text").alias("t")
    ).first()["t"]
    assert inner == "hi, there"


def test_csv_encode_shape_and_nulls(spark):
    enc = encode_csv(_df(spark), "transcripts", ["conv_id", "turn_idx", "text"])
    vals = {r["commit_ts"]: r["value"] for r in enc.collect()}
    assert vals[1001] == "I,transcripts,1001,conv-a,1,hello"
    assert vals[1003] == "D,transcripts,1003,conv-b,2,\\N"  # NULL -> \N


def test_dispatchers(spark):
    enc = encode_csv(_df(spark), "transcripts", ["conv_id", "turn_idx", "text"])
    by_key = dispatch_by_index_value(enc, 16, ["conv_id", "turn_idx"])
    # per-key ordering: the same handle key always lands on one partition
    per_key = by_key.groupBy("conv_id", "turn_idx").agg(
        F.count_distinct("partition").alias("n")
    )
    assert per_key.filter("n > 1").count() == 0
    by_tbl = dispatch_by_table(enc, 16)
    assert by_tbl.select("partition").distinct().count() == 1
    by_ts = dispatch_by_ts(enc, 3)
    assert {r["partition"] for r in by_ts.collect()} == {1001 % 3, 1002 % 3, 1003 % 3}
    for df in (by_key, by_tbl, by_ts):
        assert df.filter("partition < 0 OR partition >= 16").count() == 0


def test_open_protocol_roundtrip(spark):
    """Encode→decode identity for TiCDC's default protocol: key carries
    (ts, scm, tbl, t=1), value carries u/d column maps with sorted names
    (open_protocol_message.go:30-57)."""
    enc = encode_open_protocol(
        _df(spark), "db", "transcripts", ["conv_id", "turn_idx", "text"],
        col_types={"conv_id": "string", "turn_idx": "int", "text": "string"},
    )
    r = {x["commit_ts"]: x for x in enc.collect()}
    assert all(x["topic"] == "db_transcripts" for x in r.values())
    import json

    k = json.loads(r[1001]["key"])
    assert k == {"ts": 1001, "scm": "db", "tbl": "transcripts", "t": 1}
    v = json.loads(r[1001]["value"])
    assert list(v) == ["u"] and sorted(v["u"]) == list(v["u"])  # sorted names
    assert v["u"]["text"] == {"t": 253, "h": False, "v": "hello"}
    assert v["u"]["turn_idx"] == {"t": 3, "h": True, "v": "1"}
    vd = json.loads(r[1003]["value"])
    assert list(vd) == ["d"] and sorted(vd["d"]) == ["conv_id", "turn_idx"]
    dec = decode_open_protocol(enc, ["conv_id", "turn_idx", "text"])
    got = {x["ts"]: x for x in dec.collect()}
    assert got[1002]["text"] == "hi, there" and got[1002]["op_class"] == "UI"
    assert got[1003]["op_class"] == "D" and got[1003]["conv_id"] == "conv-b"
    assert got[1003]["text"] is None


def test_key_columns_default_dispatchers(spark):
    enc = encode_csv(_df(spark), "transcripts", ["conv_id", "turn_idx", "text"])
    # key dispatcher: everything to partition 0 with the fixed message key
    by_k = dispatch_by_key(enc, "pk-1")
    assert {(r["partition"], r["partition_key"]) for r in by_k.collect()} == {(0, "pk-1")}
    # columns dispatcher: rows agreeing on the configured columns co-locate
    by_c = dispatch_by_columns(enc, 16, ["conv_id"])
    per = by_c.groupBy("conv_id").agg(F.count_distinct("partition").alias("n"))
    assert per.filter("n > 1").count() == 0
    # default == table (default.go delegates)
    a = dispatch_default(enc, 16).select("commit_ts", "partition")
    b = dispatch_by_table(enc, 16).select("commit_ts", "partition")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_event_router_first_match_and_topic_expr(spark):
    df = _df(spark).withColumn(
        "table_name",
        F.when(F.col("turn_idx") == 1, "orders").otherwise("audit_log"),
    )
    rules = [
        RouteRule(matcher=("orders",), partition_rule="ts", topic_rule="{schema}_hot"),
        RouteRule(matcher=("audit*",), partition_rule="index-value",
                  topic_rule="{schema}_{table}_v2"),
    ]
    out = route_events(df, rules, 4, "db")
    got = {r["commit_ts"]: (r["topic"], r["partition"]) for r in out.collect()}
    assert got[1001] == ("db_hot", 1001 % 4)  # first rule, ts dispatcher
    assert got[1002] == ("db_hot", 1002 % 4)
    assert got[1003][0] == "db_audit_log_v2"  # wildcard matcher + {table} subst
    assert 0 <= got[1003][1] < 4
    # unmatched table falls back to default (schema_table topic, table hash)
    df2 = _df(spark).withColumn("table_name", F.lit("misc"))
    out2 = route_events(df2, rules, 4, "db")
    assert {r["topic"] for r in out2.collect()} == {"db_misc"}


def test_maxwell_debezium_simple_shapes(spark):
    import json

    from ticdc_spark.sinks.mq import encode_debezium, encode_maxwell, encode_simple

    df = _df(spark)
    mx = {r["commit_ts"]: json.loads(r["value"])
          for r in encode_maxwell(df, "db", "t", ["conv_id", "turn_idx", "text"]).collect()}
    assert mx[1001]["type"] == "insert" and mx[1001]["data"]["text"] == "hello"
    assert mx[1003]["type"] == "delete" and mx[1003]["ts"] == 1003
    dz = {r["commit_ts"]: json.loads(r["value"])
          for r in encode_debezium(df, "db", "t", ["conv_id", "turn_idx", "text"]).collect()}
    assert dz[1001]["payload"]["op"] == "c" and "before" not in dz[1001]["payload"]
    assert dz[1001]["payload"]["after"]["text"] == "hello"
    assert dz[1003]["payload"]["op"] == "d" and "after" not in dz[1003]["payload"]
    sp = {r["commit_ts"]: json.loads(r["value"])
          for r in encode_simple(df, "db", "t", ["conv_id", "turn_idx", "text"]).collect()}
    assert sp[1002]["version"] == 1 and sp[1002]["type"] == "UPDATE"
    assert sp[1002]["data"]["text"] == "hi, there"
    assert sp[1003]["old"]["conv_id"] == "conv-b" and "data" not in sp[1003]


def test_column_selector_rules():
    import pytest as _pt

    from ticdc_spark.sinks.mq import ColumnSelectorRule, select_columns

    rules = [
        ColumnSelectorRule(matcher=("orders",), columns=("conv_id", "turn_idx", "text")),
        ColumnSelectorRule(matcher=("audit*",), columns=("*", "!tool")),
    ]
    cols = ["conv_id", "turn_idx", "text", "tool", "ts"]
    assert select_columns("orders", cols, rules) == ["conv_id", "turn_idx", "text"]
    assert select_columns("audit_log", cols, rules) == ["conv_id", "turn_idx", "text", "ts"]
    # unmatched table: all columns pass through
    assert select_columns("misc", cols, rules) == cols
    # dropping a handle-key column is forbidden (column_selector.go:227)
    bad = [ColumnSelectorRule(matcher=("orders",), columns=("text",))]
    with _pt.raises(ValueError):
        select_columns("orders", cols, bad)


def test_resolved_broadcast_covers_all_topic_partitions(spark):
    from ticdc_spark.sinks.mq import resolved_messages

    resolved = spark.createDataFrame(
        [(p, r, 0) for p in range(2) for r in (10, 20)] + [(0, 30, 0)],
        "partition_id int, resolved_ts long, emit_seq long",
    )
    out = resolved_messages(resolved, ["t1", "t2"], 4).collect()
    # 30 is NOT an achievable frontier (partition 1 never reached it)
    assert {r["resolved_ts"] for r in out} == {10, 20}
    assert len(out) == 2 * 2 * 4  # steps x topics x partitions
    assert all(r["key"] == '{"ts":%d,"t":3}' % r["resolved_ts"] for r in out)


def _lm_df(spark):
    rows = ROWS + [
        (1004, 1003, "I", "conv-c", 3, "x" * 500),   # oversized insert
        (1005, 1004, "U", "conv-c", 3, "y" * 500),   # oversized update
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_large_message_handle_key_only(spark):
    """pkg/config/large_message.go handle-key-only + integration test
    open_protocol_handle_key_only: above max-message-bytes the message
    degrades to handle-key columns and the key carries "ohk": true."""
    import json

    from ticdc_spark.sinks.mq import decode_open_protocol

    enc = encode_open_protocol(
        _lm_df(spark), "db", "transcripts", ["conv_id", "turn_idx", "text"],
        col_types={"conv_id": "string", "turn_idx": "int", "text": "string"},
        large_message_handle="handle-key-only", max_message_bytes=300,
    )
    r = {x["commit_ts"]: x for x in enc.collect()}
    # small messages untouched (no "ohk" in the key at all)
    assert "ohk" not in json.loads(r[1001]["key"])
    assert json.loads(r[1001]["value"])["u"]["text"]["v"] == "hello"
    # oversized: ohk=true, value reduced to handle columns only
    k = json.loads(r[1004]["key"])
    assert k["ohk"] is True and k["ts"] == 1004
    v = json.loads(r[1004]["value"])
    assert sorted(v["u"]) == ["conv_id", "turn_idx"]
    dec = {x["ts"]: x for x in decode_open_protocol(
        enc, ["conv_id", "turn_idx", "text"]).collect()}
    assert dec[1004]["only_handle_key"] and dec[1004]["text"] is None
    assert not dec[1001]["only_handle_key"] and dec[1001]["text"] == "hello"


def test_large_message_claim_check_roundtrip(spark, tmp_path):
    """claim-check (large_message.go + open_protocol_encoder.go:291-302):
    oversized payloads ship to the claim-check store; the MQ message is a
    location message (handle keys + "ccl"); the consumer resolves the
    location back to the FULL row. Store writes are idempotent under
    replay (digest locations)."""
    import json

    from ticdc_spark.sinks.mq import (
        decode_open_protocol, resolve_claim_check, write_claim_check)

    store = str(tmp_path / "claim")
    enc = encode_open_protocol(
        _lm_df(spark), "db", "transcripts", ["conv_id", "turn_idx", "text"],
        col_types={"conv_id": "string", "turn_idx": "int", "text": "string"},
        large_message_handle="claim-check", max_message_bytes=300,
        claim_check_prefix=store,
    )
    write_claim_check(enc, store)
    messages = enc.drop("_claim_location", "_claim_payload")
    # pre-resolution: oversized rows are location messages
    pre = {x["ts"]: x for x in decode_open_protocol(
        messages, ["conv_id", "turn_idx", "text"]).collect()}
    assert pre[1004]["claim_location"].startswith(store)
    assert pre[1004]["text"] is None and pre[1001]["claim_location"] is None
    # the location is resolvable: full payload comes back
    resolved = resolve_claim_check(spark, messages, store)
    post = {x["ts"]: x for x in decode_open_protocol(
        resolved, ["conv_id", "turn_idx", "text"]).collect()}
    assert post[1004]["text"] == "x" * 500 and post[1005]["text"] == "y" * 500
    assert post[1001]["text"] == "hello"  # small rows untouched
    # replay: a second identical batch writes identical digests — resolve
    # still yields exactly one row per message
    write_claim_check(enc, store)
    again = resolve_claim_check(spark, messages, store)
    assert again.count() == messages.count()
    # key restored to the FULL original key (no ccl marker after resolve)
    k = {json.loads(x["key"])["ts"]: json.loads(x["key"])
         for x in again.collect()}
    assert "ccl" not in k[1004]


def test_craft_roundtrip_and_column_groups(spark):
    """Craft stand-in (8th codec): term-dictionary name resolution, typed/
    flagged column groups, update pre-image as an OLD group, delete as an
    OLD group of handle keys — decode recovers everything from the message
    alone."""
    import json

    from ticdc_spark.sinks.mq import decode_craft, encode_craft

    rows = [
        (10, 9, "I", "c1", 0, "hello", None),
        (20, 19, "U", "c1", 0, "world", "hello"),
        (30, 29, "D", "c1", 0, None, None),
    ]
    df = spark.createDataFrame(
        rows, "commit_ts long, start_ts long, op string, conv_id string, "
              "turn_idx int, text string, pre_text string")
    enc = encode_craft(
        df, "db", "t", ["conv_id", "turn_idx", "text"],
        col_types={"conv_id": "string", "turn_idx": "int", "text": "string"},
    ).collect()
    by_ts = {r["commit_ts"]: json.loads(r["value"]) for r in enc}
    # dictionary interns schema/table/columns once; headers refer by id
    assert by_ts[10]["dict"] == ["db", "t", "conv_id", "turn_idx", "text"]
    assert by_ts[10]["h"]["scm"] == 0 and by_ts[10]["h"]["tbl"] == 1
    # insert: one NEW group, handle flags on key columns, null-safe values
    g = by_ts[10]["g"]
    assert len(g) == 1 and g[0]["t"] == 1 and g[0]["f"] == [1, 1, 0]
    assert g[0]["val"] == ["c1", "0", "hello"]
    # delete: one OLD group carrying only handle keys
    gd = by_ts[30]["g"]
    assert len(gd) == 1 and gd[0]["t"] == 2 and gd[0]["val"] == ["c1", "0"]
    dec = {r["ts"]: r for r in decode_craft(
        spark.createDataFrame([(r["value"],) for r in enc], "value string"),
        ["conv_id", "turn_idx", "text"]).collect()}
    assert dec[10]["op_class"] == "UI" and dec[10]["text"] == "hello"
    assert dec[30]["op_class"] == "D" and dec[30]["text"] is None
    assert dec[30]["conv_id"] == "c1" and dec[30]["turn_idx"] == "0"
    assert dec[20]["schema_name"] == "db" and dec[20]["table_name"] == "t"
    # update with pre-image: NEW + OLD groups
    enc2 = encode_craft(
        df.filter("op = 'U'").withColumnRenamed("pre_text", "ptext"),
        "db", "t", ["conv_id", "turn_idx", "text"],
        pre_cols=["conv_id", "turn_idx"],
    ).collect()
    v = json.loads(enc2[0]["value"])
    assert [grp["t"] for grp in v["g"]] == [1, 2]


def test_craft_term_collision_roundtrips(spark):
    """A data column named like the table (or schema) must intern to ONE
    dictionary id — encoder last-wins vs decoder first-match would NULL
    the column silently."""
    from ticdc_spark.sinks.mq import decode_craft, encode_craft

    df = spark.createDataFrame(
        [(1, 0, "I", "c1", 0, "payload-x")],
        "commit_ts long, start_ts long, op string, conv_id string, "
        "turn_idx int, text string")
    enc = encode_craft(df, "db", "text", ["conv_id", "turn_idx", "text"])
    dec = decode_craft(enc, ["conv_id", "turn_idx", "text"]).collect()[0]
    assert dec["text"] == "payload-x" and dec["table_name"] == "text"
    assert dec["conv_id"] == "c1"


def test_kafka_adapter_frame_contract_and_feature_flag(spark):
    """Live-transport adapter (kafka_adapter): every encoder output
    projects onto the EXACT Kafka sink contract (topic string, key/value
    binary, partition int) with values byte-identical to the encoded
    strings; with no connector on the classpath the write entry points
    refuse up front with a clear error instead of a half-configured job."""
    import pytest as _pytest

    from ticdc_spark.sinks.kafka_adapter import (
        kafka_available, to_kafka_frame, write_batch_kafka,
    )
    from ticdc_spark.sinks.mq import dispatch_by_columns, encode_open_protocol

    df = spark.createDataFrame(
        [(10, 9, "I", "c1", 0, "hello"), (20, 19, "D", "c2", 1, None)],
        "commit_ts long, start_ts long, op string, conv_id string, "
        "turn_idx int, text string")
    enc = dispatch_by_columns(
        encode_open_protocol(df, "db", "t", ["conv_id", "turn_idx", "text"]),
        8, ["conv_id"])
    frame = to_kafka_frame(enc)
    assert frame.schema.simpleString() == (
        "struct<topic:string,key:binary,value:binary,partition:int>")
    rows = {bytes(r["key"]).decode(): r for r in frame.collect()}
    src = {r["key"]: r for r in enc.collect()}
    assert set(rows) == set(src)
    for k, r in rows.items():
        assert bytes(r["value"]).decode() == src[k]["value"]
        assert r["partition"] == src[k]["partition"]
    # sandbox has no connector: the flag is honest and the writer refuses
    assert kafka_available(spark) is False
    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        write_batch_kafka(enc, "localhost:9092")


def test_kafka_stream_writer_feature_flag(spark, tmp_path):
    import pytest as _pytest

    from ticdc_spark.sinks.kafka_adapter import stream_writer_kafka
    from ticdc_spark.sinks.mq import encode_open_protocol

    df = spark.readStream.format("rate").load().selectExpr(
        "value AS commit_ts", "value AS start_ts", "'I' AS op",
        "CAST(value AS STRING) AS conv_id", "0 AS turn_idx",
        "'x' AS text")
    enc = encode_open_protocol(df, "db", "t", ["conv_id", "turn_idx", "text"])
    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        stream_writer_kafka(enc, "localhost:9092", str(tmp_path / "ck"))
