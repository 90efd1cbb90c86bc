"""Avro codec + in-repo schema-registry stand-in (K5, the reference's
largest codec module).

TiCDC's avro sink registers per-(topic, key|value) record schemas with a
Confluent/Glue schema registry and frames every Kafka message as
``magic byte 0 | 4-byte schema id | avro-binary body``
(/root/reference/pkg/sink/codec/avro/avro.go,
confluent_schema_registry.go:42,400-408). Deletes are key-only TOMBSTONES
(value = nil, avro.go:162). The reference tests this without a live
registry via an HTTP mock (avro/mock_schema_registry.go) — the pattern
this module reproduces in-process.

Spark-first re-expression:

- :class:`SchemaRegistry` is the mock-registry analog: subject ->
  monotonically versioned schema list with Confluent semantics (same
  schema fingerprint re-registers as the SAME id; a changed schema gets a
  new global id and bumps the subject version).
- The record schema is generated from the table's (name, type) fields
  with the reference's type mapping (columnToAvroSchema, avro.go:689-780:
  int->int, long->long, double->double, everything stringish->string,
  each field nullable-union with "tidb_type" parameters).
- The message body is the JSON ENCODING of the Avro record (Avro defines
  a canonical JSON encoding alongside the binary one) and the frame is a
  JSON envelope {"magic": 0, "schema_id": id, "body": ...} — bytewise
  Confluent framing needs the binary codec, but the JSON encoding keeps
  every structural rule (schema-id envelope, nullable unions, tombstone
  deletes, registry round-trips) text-comparable for the DuckDB oracle.
- Encode/decode are pure Column expressions; registry calls happen ONCE
  per encode on the driver (exactly like the reference's per-schema-epoch
  GetCachedOrRegister), never per row.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AVRO_TYPE = {
    "int": "int",
    "long": "long",
    "bigint": "long",
    "double": "double",
    "string": "string",
    "timestamp": "string",
}


def avro_record_schema(name: str, namespace: str, fields: list,
                       col_types: dict) -> dict:
    """Record schema for a field list (avroSchemaTop, avro.go:342-356):
    every field is a ["null", <type>] union (TiDB columns are nullable),
    with the tidb_type parameter the reference attaches."""
    out = []
    for c in fields:
        t = _AVRO_TYPE.get(col_types.get(c, "string"), "string")
        out.append({
            "name": c,
            "type": ["null", {"type": t, "connect.parameters": {"tidb_type": col_types.get(c, "string")}}],
            "default": None,
        })
    return {"type": "record", "name": name, "namespace": namespace, "fields": out}


class SchemaRegistry:
    """Confluent-registry stand-in (mock_schema_registry.go behavior):
    global monotone ids, per-subject versions, idempotent re-registration
    by canonical schema fingerprint."""

    def __init__(self):
        self._by_fingerprint: dict = {}
        self._by_id: dict = {}
        self._subjects: dict = {}
        self._next_id = 1

    @staticmethod
    def _fingerprint(schema: dict) -> str:
        return hashlib.md5(
            json.dumps(schema, sort_keys=True).encode()
        ).hexdigest()

    def register(self, subject: str, schema: dict) -> int:
        """POST /subjects/<s>/versions semantics: same schema -> same id
        (no new version); changed schema -> new global id + version."""
        fp = self._fingerprint(schema)
        key = (subject, fp)
        if key in self._by_fingerprint:
            return self._by_fingerprint[key]
        sid = self._next_id
        self._next_id += 1
        self._by_fingerprint[key] = sid
        self._by_id[sid] = schema
        self._subjects.setdefault(subject, []).append(sid)
        return sid

    def get_by_id(self, schema_id: int) -> dict:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple:
        ids = self._subjects.get(subject, [])
        if not ids:
            raise KeyError(f"subject {subject!r} not registered")
        return len(ids), ids[-1]

    def versions(self, subject: str) -> list:
        return list(self._subjects.get(subject, []))


def encode_avro(
    df: DataFrame,
    registry: SchemaRegistry,
    database: str,
    table: str,
    data_cols: list,
    col_types: dict | None = None,
    handle_cols: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Avro encoder (avro.go:85-200): registers the key schema (handle
    columns, subject ``<topic>-key``) and value schema (all columns,
    subject ``<topic>-value``), then emits per event

    - key  = envelope(key_schema_id, handle-column record)
    - value = envelope(value_schema_id, full record), or NULL for deletes
      (key-only tombstone, avro.go:162).

    The JSON body encodes Avro's nullable unions the way Avro JSON does:
    a non-null value appears as {"<type>": v}; null stays null."""
    types = col_types or {}
    topic = f"{database}_{table}"
    ns = f"default.{database}"
    key_cols = [c for c in data_cols if c in handle_cols]
    key_id = registry.register(
        f"{topic}-key", avro_record_schema(f"{table}_key", ns, key_cols, types))
    val_id = registry.register(
        f"{topic}-value", avro_record_schema(table, ns, data_cols, types))

    def union_entry(c: str):
        t = _AVRO_TYPE.get(types.get(c, "string"), "string")
        cast_t = {"int": "int", "long": "long", "double": "double"}.get(t, "string")
        return F.when(
            F.col(c).isNull(), F.lit(None).cast(f"struct<{t}:{cast_t}>")
        ).otherwise(F.struct(F.col(c).cast(cast_t).alias(t))).alias(c)

    key_body = F.struct(*[union_entry(c) for c in key_cols])
    val_body = F.struct(*[union_entry(c) for c in data_cols])
    key = F.to_json(F.struct(
        F.lit(0).alias("magic"), F.lit(key_id).alias("schema_id"),
        key_body.alias("body"),
    ))
    value = F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(
        F.to_json(F.struct(
            F.lit(0).alias("magic"), F.lit(val_id).alias("schema_id"),
            val_body.alias("body"),
        ))
    )
    return df.select(
        F.lit(topic).alias("topic"), key.alias("key"), value.alias("value"),
        "commit_ts", "op", *handle_cols,
    )


def decode_avro(df: DataFrame, registry: SchemaRegistry,
                value_schema_id: int) -> DataFrame:
    """Consumer half (avro/decoder.go:85-120): resolve the schema by the
    envelope's id, then extract every field through its nullable union. A
    NULL value is a delete tombstone; its columns come from the key."""
    schema = registry.get_by_id(value_schema_id)
    cols = []
    for f in schema["fields"]:
        c = f["name"]
        t = f["type"][1]["type"]
        cols.append(
            F.coalesce(
                F.get_json_object("value", f"$.body.{c}.{t}"),
                F.get_json_object("key", f"$.body.{c}.{t}"),
            ).alias(c)
        )
    passthrough = [c for c in ("commit_ts",) if c in df.columns]
    return df.select(
        *passthrough,
        F.get_json_object("key", "$.schema_id").cast("int").alias("key_schema_id"),
        F.get_json_object("value", "$.schema_id").cast("int").alias("value_schema_id"),
        F.col("value").isNull().alias("is_tombstone"),
        *cols,
    )
