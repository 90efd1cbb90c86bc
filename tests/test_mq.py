"""K5 MQ codecs + X4 dispatchers (pkg/sink/codec/*, mq/dispatcher/partition/*)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ticdc_spark.sinks.mq import (
    dispatch_by_index_value,
    dispatch_by_table,
    dispatch_by_ts,
    encode_canal_json,
    encode_csv,
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
