"""Avro codec + schema-registry stand-in (pkg/sink/codec/avro/*,
mock_schema_registry.go test pattern; avro_basic integration test)."""

import json

import pytest

from tests.test_mq import ROWS, SCHEMA
from ticdc_spark.sinks.avro_registry import (
    SchemaRegistry,
    avro_record_schema,
    decode_avro,
    encode_avro,
)


def test_registry_confluent_semantics():
    """Same schema re-registers as the SAME id (GetCachedOrRegister);
    a changed schema gets a new global id and bumps the subject version;
    ids are resolvable forever (old messages stay decodable)."""
    r = SchemaRegistry()
    s1 = avro_record_schema("t", "default.db", ["a", "b"], {"a": "string", "b": "int"})
    id1 = r.register("topic-value", s1)
    assert r.register("topic-value", s1) == id1  # idempotent
    assert r.latest("topic-value") == (1, id1)
    s2 = avro_record_schema("t", "default.db", ["a", "b", "c"],
                            {"a": "string", "b": "int", "c": "string"})
    id2 = r.register("topic-value", s2)
    assert id2 != id1
    assert r.latest("topic-value") == (2, id2)
    assert r.versions("topic-value") == [id1, id2]
    # evolution: the OLD id still resolves to the old schema
    assert [f["name"] for f in r.get_by_id(id1)["fields"]] == ["a", "b"]
    assert [f["name"] for f in r.get_by_id(id2)["fields"]] == ["a", "b", "c"]
    # ids are global across subjects
    id3 = r.register("other-key", s1)
    assert id3 not in (id1, id2)


def test_avro_envelope_and_tombstone(spark):
    """Every message is framed magic|schema_id|body (confluent framing,
    confluent_schema_registry.go:400-408, JSON-encoded here); deletes are
    key-only tombstones (avro.go:162); nullable columns ride Avro's
    ["null", type] union encoding."""
    reg = SchemaRegistry()
    enc = encode_avro(
        spark.createDataFrame(ROWS, SCHEMA), reg, "db", "transcripts",
        ["conv_id", "turn_idx", "text"],
        col_types={"conv_id": "string", "turn_idx": "int", "text": "string"},
    )
    r = {x["commit_ts"]: x for x in enc.collect()}
    k = json.loads(r[1001]["key"])
    assert k["magic"] == 0 and isinstance(k["schema_id"], int)
    assert list(k["body"]) == ["conv_id", "turn_idx"]  # handle key only
    assert k["body"]["turn_idx"] == {"int": 1}         # union encoding
    v = json.loads(r[1001]["value"])
    assert v["body"]["text"] == {"string": "hello"}
    assert v["schema_id"] != k["schema_id"]
    # delete: value is a NULL tombstone, key still carries the handle
    assert r[1003]["value"] is None
    assert json.loads(r[1003]["key"])["body"]["conv_id"] == {"string": "conv-b"}
    # registry saw exactly key + value subjects
    assert reg.latest("db_transcripts-key")[0] == 1
    assert reg.latest("db_transcripts-value")[0] == 1


def test_avro_roundtrip_and_evolution(spark):
    """decode(encode(x)) == x per schema id; after an add-column
    evolution, old messages decode under the OLD id and new ones under
    the new id (the registry contract consumers rely on)."""
    reg = SchemaRegistry()
    df = spark.createDataFrame(ROWS, SCHEMA)
    enc1 = encode_avro(df, reg, "db", "transcripts",
                       ["conv_id", "turn_idx", "text"],
                       col_types={"conv_id": "string", "turn_idx": "int",
                                  "text": "string"})
    vid1 = reg.latest("db_transcripts-value")[1]
    got = {x["commit_ts"]: x for x in decode_avro(enc1, reg, vid1).collect()}
    assert got[1002]["text"] == "hi, there" and not got[1002]["is_tombstone"]
    assert got[1003]["is_tombstone"] and got[1003]["conv_id"] == "conv-b"
    assert got[1003]["text"] is None
    # evolution: a new column -> new value schema id; both decode correctly
    df2 = df.withColumn("tool", df.text)
    enc2 = encode_avro(df2, reg, "db", "transcripts",
                       ["conv_id", "turn_idx", "text", "tool"],
                       col_types={"conv_id": "string", "turn_idx": "int",
                                  "text": "string", "tool": "string"})
    vid2 = reg.latest("db_transcripts-value")[1]
    assert vid2 != vid1 and reg.latest("db_transcripts-value")[0] == 2
    got2 = {x["commit_ts"]: x for x in decode_avro(enc2, reg, vid2).collect()}
    assert got2[1002]["tool"] == "hi, there"
    # old batch still decodes under its own id
    old = {x["commit_ts"]: x for x in decode_avro(enc1, reg, vid1).collect()}
    assert old[1001]["text"] == "hello"
