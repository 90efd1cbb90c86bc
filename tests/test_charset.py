"""Charset semantics (charset_gbk / new_ci_collation analogs,
/root/reference/tests/integration_tests/charset_gbk/): the reference
round-trips non-UTF8 upstream columns by decoding them to UTF-8 at the
mounter and guaranteeing byte-exact transport downstream. Our payload is
UTF-8 by construction, so the contract to prove is BYTE-EXACT transport
of the full non-ASCII range — CJK (the GBK repertoire, decoded), emoji
(4-byte UTF-8, outside GBK), combining marks, and JSON-hostile
characters — through every surface: decode → LWW → lake write/read,
restart replay, and the MQ codec roundtrips."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig, expected_final_state

KEY = ["conv_id", "turn_idx"]

# the GBK-decoded repertoire + beyond-GBK codepoints + hostiles
TEXTS = [
    "中文测试数据第一行",                 # CJK (GBK-encodable)
    "テスト データ 〜",                  # Japanese + wave dash (GBK pitfall char)
    "한국어 텍스트",                      # Hangul
    "emoji \U0001F600\U0001F680 beyond GBK",  # 4-byte UTF-8
    "combining á ë marks",
    'json hostile " \\ \n tab\t end',
    "mixed 中文 and ASCII and ¥€£ currency",
    "zero​width and non­breaking",
]


def _binlog(spark):
    rows = []
    for i, t in enumerate(TEXTS):
        payload = None
        rows.append((100 + i, 99 + i, "I", f"c{i}", 0, payload, None, 0, i % 2))
    df = spark.createDataFrame(
        rows,
        "commit_ts long, start_ts long, op string, conv_id string, turn_idx int,"
        " payload string, pre_payload string, schema_version long, partition_id int",
    )
    # build payloads with to_json so escaping is the engine's own
    texts = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TEXTS)], "commit_ts long, t string"
    )
    return (
        df.join(texts, "commit_ts")
        .withColumn(
            "payload",
            F.to_json(F.struct(
                F.lit("user").alias("role"), F.col("t").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                (F.lit(1_700_000_000).cast("long") * 1_000_000).alias("ts"),
            )),
        )
        .drop("t")
    )


def _resolved(spark):
    return spark.createDataFrame(
        [(p, 200, 0) for p in range(2)],
        "partition_id int, resolved_ts long, emit_seq long",
    )


def test_non_ascii_text_roundtrips_pipeline(spark, tmp_path):
    binlog = _binlog(spark)
    cf = Changefeed(
        spark, binlog, _resolved(spark), None,
        LakeTable(spark, str(tmp_path / "t")),
        ChangefeedConfig(changefeed_id="cs", n_buckets=4),
    )
    cf.run()
    got = {r["conv_id"]: r["text"] for r in cf.target.read().collect()}
    for i, t in enumerate(TEXTS):
        assert got[f"c{i}"] == t, (i, got[f"c{i}"])  # byte-exact transport
    want = expected_final_state(binlog, cf.registry, 200, KEY)
    assert_df_equal(cf.target.read(), want, KEY)


@pytest.mark.parametrize("codec", ["open", "craft", "canal", "csv"])
def test_non_ascii_text_roundtrips_mq_codecs(spark, codec):
    from ticdc_spark.sinks import mq

    df = spark.createDataFrame(
        [(100 + i, 99 + i, "I", f"c{i}", 0, t) for i, t in enumerate(TEXTS)],
        "commit_ts long, start_ts long, op string, conv_id string, "
        "turn_idx int, text string",
    )
    cols = ["conv_id", "turn_idx", "text"]
    types = {"conv_id": "string", "turn_idx": "int", "text": "string"}
    if codec == "open":
        enc = mq.encode_open_protocol(df, "db", "t", cols, col_types=types)
        dec = mq.decode_open_protocol(enc, cols)
        got = {r["conv_id"]: r["text"] for r in dec.collect()}
    elif codec == "craft":
        enc = mq.encode_craft(df, "db", "t", cols, col_types=types)
        dec = mq.decode_craft(enc, cols)
        got = {r["conv_id"]: r["text"] for r in dec.collect()}
    elif codec == "canal":
        import json

        enc = mq.encode_canal_json(df, "t", cols)
        got = {}
        for r in enc.collect():
            data = json.loads(json.loads(r["value"])["data"])[0]
            got[data["conv_id"]] = data["text"]
    else:  # csv — op,table,commit_ts,conv_id,turn_idx,text; text is LAST so
        #        a maxsplit parse is byte-exact even for commas/newlines
        enc = mq.encode_csv(df, "t", cols)
        got = {}
        for r in enc.collect():
            parts = r["value"].split(",", 5)
            got[parts[3]] = parts[5]
    for i, t in enumerate(TEXTS):
        assert got[f"c{i}"] == t, (codec, i, got.get(f"c{i}"))
