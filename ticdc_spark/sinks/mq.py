"""MQ sink codecs + partition dispatchers + event router (K5/X4), Spark-first.

TiCDC serializes row-change events into message-queue payloads through
pluggable codecs (/root/reference/pkg/sink/codec/: open protocol,
canal-json, csv, ...) and routes each message to a topic + Kafka partition
through an event router (/root/reference/cdc/sink/dmlsink/mq/dispatcher/
event_router.go) holding per-matcher partition dispatchers
(dispatcher/partition/{default,table,index_value,key,columns,ts}.go).

Spark re-expression: a codec is a pure Column expression producing the
message (key, value) strings — JVM-side `to_json`/`concat_ws` inside
whole-stage codegen, NO per-row Python — and a dispatcher is a hash/pmod
Column over the configured dispatch key. The output DataFrame
(topic, partition, key, value) is exactly what a Kafka writer consumes —
:mod:`ticdc_spark.sinks.kafka_adapter` projects it onto the live
`format("kafka")` sink contract behind a connector feature flag; in this
sandbox the encoded frame itself is the oracle-checked product.

Encoders implemented — ALL 8 of the reference's protocols: the JSON/text
family below, plus avro (with the in-repo schema-registry stand-in,
sinks/avro_registry.py) and craft (JSON-comparable rendering of its
term-dictionary/column-group columnar layout — encode_craft/decode_craft
in this module):

- open-protocol (TiCDC's default MQ protocol,
  pkg/sink/codec/open/open_protocol_encoder.go + internal/message_key.go):
  JSON key {"ts","scm","tbl","t":1} and JSON value {"u":{col:{...}}} for
  insert/update (+"p" pre-image when provided), {"d":{...}} for delete;
  column entries carry {"t": mysql type byte, "h": handle-key flag,
  "v": value}, sorted by column name (sortColumnArrays,
  open_protocol_message.go:30-51).
- canal-json (pkg/sink/codec/canal/canal_json_message.go): one JSON object
  per event with type INSERT/UPDATE/DELETE, ts, and the column data.
- csv (pkg/sink/codec/csv/csv_message.go:43-55): operation code
  I/U/D, table name, commit-ts, then the column values.
- maxwell (pkg/sink/codec/maxwell/maxwell_message.go:27-37):
  {"database","table","type","ts","data"[,"old"]}.
- debezium-JSON (pkg/sink/codec/debezium/codec.go:531-591): the
  {"payload":{"source","op" c|u|d,"ts_ms","before","after"}} envelope.
- simple (pkg/sink/codec/simple): flat JSON DML message —
  {"schema","table","type","commitTs","data"} (bootstrap/schema messages
  are registry-coupled and omitted).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OP_WORD = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}

# mysql type bytes for the open-protocol column entries (the subset the
# transcript payload uses; pkg/sink/codec/internal/column.go:48-70)
_MYSQL_TYPE = {"string": 253, "int": 3, "long": 8, "double": 5, "timestamp": 7}


def _op_word():
    return (
        F.when(F.col("op") == "I", "INSERT")
        .when(F.col("op") == "U", "UPDATE")
        .otherwise("DELETE")
    )


def encode_canal_json(df: DataFrame, table: str, data_cols: list,
                      handle_cols: tuple = ("conv_id", "turn_idx")) -> DataFrame:
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
    key = F.to_json(F.struct(*[F.col(c) for c in handle_cols]))
    return df.select(
        F.lit(table).alias("topic"), key.alias("key"), value.alias("value"),
        "commit_ts", *handle_cols,
    )


def encode_csv(df: DataFrame, table: str, data_cols: list,
               handle_cols: tuple = ("conv_id", "turn_idx")) -> DataFrame:
    """CSV codec row: op,table,commit_ts,col1,col2,... with NULLs encoded
    as \\N (csv_message.go:43-55 field order)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in data_cols]
    value = F.concat_ws(",", F.col("op"), F.lit(table),
                        F.col("commit_ts").cast("string"), *cols)
    return df.select(
        F.lit(table).alias("topic"), value.alias("value"),
        "commit_ts", *handle_cols,
    )


def _op_columns_entry(cols: list, types: dict, handle_cols: tuple) -> object:
    """{col: {"t": type byte, "h": handle flag, "v": string value}}, column
    names in SORTED order (to_json preserves struct field order; sorting
    here mirrors sortColumnArrays, open_protocol_message.go:30-51)."""
    entries = []
    for c in sorted(cols):
        entries.append(
            F.struct(
                F.lit(_MYSQL_TYPE.get(types.get(c, "string"), 253)).alias("t"),
                F.lit(c in handle_cols).alias("h"),
                F.col(c).cast("string").alias("v"),
            ).alias(c)
        )
    return F.struct(*entries)


def encode_open_protocol(
    df: DataFrame,
    schema: str,
    table: str,
    data_cols: list,
    handle_cols: tuple = ("conv_id", "turn_idx"),
    col_types: dict | None = None,
    pre_cols: list | None = None,
    large_message_handle: str = "none",
    max_message_bytes: int | None = None,
    claim_check_prefix: str | None = None,
) -> DataFrame:
    """Open protocol, TiCDC's default MQ codec
    (pkg/sink/codec/open/open_protocol_encoder.go):

    - message key: {"ts": commit-ts, "scm": schema, "tbl": table, "t": 1}
      (internal/message_key.go:25-30; t=1 is MessageTypeRow,
      cdc/model/sink.go:45-46)
    - message value: {"u": cols} for insert/update (+"p": pre-image columns
      when ``pre_cols`` given), {"d": cols} for delete
      (open_protocol_message.go:53-57 messageRow).

    Large-message handling (pkg/config/large_message.go:22-27; size check
    maxMessageBytes, open_protocol_encoder.go:101-140): when the encoded
    (key + value) exceeds ``max_message_bytes``,

    - ``handle-key-only``: re-encode with ONLY the handle-key columns and
      set ``"ohk": true`` in the message key (internal/message_key.go:32);
    - ``claim-check``: ship the FULL {key, value} envelope to the
      claim-check store (see :func:`write_claim_check`) and emit a
      LOCATION message — handle-key-only columns plus ``"ccl"`` in the key
      (message_key.go:35; open_protocol_encoder.go:291-302). Locations are
      a DETERMINISTIC digest of the payload, so a replayed batch
      re-derives identical locations (idempotent store writes).

    All of it stays pure Column expressions — the size check, the
    degraded re-encode and the location digest are one codegen projection;
    no per-row Python."""
    types = col_types or {}
    key_fields = [
        F.col("commit_ts").alias("ts"),
        F.lit(schema).alias("scm"),
        F.lit(table).alias("tbl"),
        F.lit(1).alias("t"),
    ]
    key = F.to_json(F.struct(*key_fields))
    row = _op_columns_entry(data_cols, types, handle_cols)
    handle_row = _op_columns_entry(
        [c for c in data_cols if c in handle_cols], types, handle_cols
    )
    value = F.when(
        F.col("op") == "D",
        # a delete carries only the handle-key columns (the reference's
        # large-message handle-key mode is the general delete shape here:
        # post-image columns of a delete are unknown to the stream)
        F.to_json(F.struct(handle_row.alias("d"))),
    ).otherwise(
        F.to_json(
            F.struct(row.alias("u"), *(
                [_op_columns_entry(pre_cols, types, handle_cols).alias("p")]
                if pre_cols else []
            ))
        )
    )
    extra: list = []
    if large_message_handle != "none":
        if max_message_bytes is None:
            raise ValueError("large_message_handle requires max_message_bytes")
        oversized = (F.length(key) + F.length(value)) > F.lit(max_message_bytes)
        degraded_value = F.when(
            F.col("op") == "D", F.to_json(F.struct(handle_row.alias("d")))
        ).otherwise(F.to_json(F.struct(handle_row.alias("u"))))
        if large_message_handle == "handle-key-only":
            ohk_key = F.to_json(F.struct(*key_fields, F.lit(True).alias("ohk")))
            key = F.when(oversized, ohk_key).otherwise(key)
            value = F.when(oversized, degraded_value).otherwise(value)
        elif large_message_handle == "claim-check":
            if not claim_check_prefix:
                raise ValueError("claim-check requires claim_check_prefix")
            location = F.concat(
                F.lit(claim_check_prefix.rstrip("/") + "/"),
                F.md5(F.concat_ws("\x1f", key, value)),
                F.lit(".json"),
            )
            ccl_key = F.to_json(F.struct(*key_fields, location.alias("ccl")))
            envelope = F.to_json(
                F.struct(key.alias("key"), value.alias("value"))
            )
            extra = [
                F.when(oversized, location).alias("_claim_location"),
                F.when(oversized, envelope).alias("_claim_payload"),
            ]
            key = F.when(oversized, ccl_key).otherwise(key)
            value = F.when(oversized, degraded_value).otherwise(value)
        else:
            raise ValueError(f"unknown large_message_handle: {large_message_handle!r}")
    return df.select(
        F.lit(f"{schema}_{table}").alias("topic"),
        key.alias("key"), value.alias("value"),
        "commit_ts", "op", *handle_cols, *extra,
    )


def decode_open_protocol(df: DataFrame, data_cols: list,
                         keep_cols: tuple = ()) -> DataFrame:
    """Consumer-side identity for the roundtrip oracle: re-extract ts /
    schema / table / op / column values FROM the encoded strings (the
    decoder half, open_protocol_message.go:171-195). Surfaces the
    large-message markers: ``only_handle_key`` (key "ohk",
    open_protocol_decoder.go:210) and ``claim_location`` (key "ccl",
    :204 — resolve with :func:`resolve_claim_check` BEFORE decoding to
    recover the full row). ``keep_cols`` pass frame-level columns (e.g.
    the MQ partition) through to the decoded rows — the consumer-apply
    path needs them for watermark eligibility."""
    op = (
        F.when(F.get_json_object("value", "$.d").isNotNull(), "D")
        .otherwise(F.lit("UI"))
    )
    out = df.select(
        *keep_cols,
        F.get_json_object("key", "$.ts").cast("long").alias("ts"),
        F.get_json_object("key", "$.scm").alias("schema_name"),
        F.get_json_object("key", "$.tbl").alias("table_name"),
        op.alias("op_class"),
        F.coalesce(
            F.get_json_object("key", "$.ohk").cast("boolean"), F.lit(False)
        ).alias("only_handle_key"),
        F.get_json_object("key", "$.ccl").alias("claim_location"),
        *[
            F.coalesce(
                F.get_json_object("value", f"$.u.{c}.v"),
                F.get_json_object("value", f"$.d.{c}.v"),
            ).alias(c)
            for c in data_cols
        ],
    )
    return out


_CRAFT_VERSION = 1
_CRAFT_GROUP_NEW = 1   # columnGroupTypeNew (craft/model.go:30-31)
_CRAFT_GROUP_OLD = 2   # columnGroupTypeOld
_CRAFT_FLAG_HANDLE = 1  # HandleKeyFlag bit


def encode_craft(
    df: DataFrame,
    schema: str,
    table: str,
    data_cols: list,
    handle_cols: tuple = ("conv_id", "turn_idx"),
    col_types: dict | None = None,
    pre_cols: list | None = None,
) -> DataFrame:
    """Craft codec STAND-IN — a JSON-comparable rendering of craft's
    columnar layout (pkg/sink/codec/craft/craft_encoder.go,
    craft/model.go). The wire format proper is a length-prefixed Go binary
    spec (size tables + varint arrays + buffer pool); what this stand-in
    preserves is craft's SEMANTIC structure, which is what distinguishes
    it from the row-shaped codecs:

    - a TERM DICTIONARY interning schema/table/column names once per
      message; the body refers to names by integer id
      (model.go termDictionary);
    - HEADERS carrying (ts, type, schema-id, table-id)
      (model.go Headers);
    - COLUMN GROUPS — type 0x1 = new values, 0x2 = old values — each a
      STRUCT-OF-ARRAYS: name ids, mysql type bytes, flag bits (handle-key
      = 1), stringified values with JSON null for NULL (craft's
      nullInt64 analog).

    Inserts/updates emit the NEW group (plus an OLD group when
    ``pre_cols`` is given); deletes emit an OLD group with the handle-key
    columns (the pre-image our stream carries — same convention as the
    open codec here). Pure Column expressions throughout."""
    types = col_types or {}
    # intern each term ONCE (first occurrence wins): a column sharing its
    # name with the schema or table must resolve to the SAME id the
    # decoder's array_position (first match) finds
    term_dict = list(dict.fromkeys([schema, table, *data_cols]))
    did = {s: i for i, s in enumerate(term_dict)}

    def group(gtype: int, cols: list):
        return F.struct(
            F.lit(gtype).alias("t"),
            F.array(*[F.lit(did[c]) for c in cols]).alias("n"),
            F.array(*[F.lit(_MYSQL_TYPE.get(types.get(c, "string"), 253))
                      for c in cols]).alias("ty"),
            F.array(*[F.lit(_CRAFT_FLAG_HANDLE if c in handle_cols else 0)
                      for c in cols]).alias("f"),
            F.array(*[F.col(c).cast("string") for c in cols]).alias("val"),
        )

    hcols = [c for c in data_cols if c in handle_cols]
    new_groups = (
        [group(_CRAFT_GROUP_NEW, data_cols)]
        + ([group(_CRAFT_GROUP_OLD, pre_cols)] if pre_cols else [])
    )
    value = F.when(
        F.col("op") == "D",
        F.to_json(F.struct(
            F.lit(_CRAFT_VERSION).alias("v"),
            F.array(*[F.lit(s) for s in term_dict]).alias("dict"),
            F.struct(F.col("commit_ts").alias("ts"), F.lit(1).alias("t"),
                     F.lit(did[schema]).alias("scm"),
                     F.lit(did[table]).alias("tbl")).alias("h"),
            F.array(group(_CRAFT_GROUP_OLD, hcols)).alias("g"),
        )),
    ).otherwise(
        F.to_json(F.struct(
            F.lit(_CRAFT_VERSION).alias("v"),
            F.array(*[F.lit(s) for s in term_dict]).alias("dict"),
            F.struct(F.col("commit_ts").alias("ts"), F.lit(1).alias("t"),
                     F.lit(did[schema]).alias("scm"),
                     F.lit(did[table]).alias("tbl")).alias("h"),
            F.array(*new_groups).alias("g"),
        ))
    )
    return df.select(
        F.lit(f"{schema}_{table}").alias("topic"),
        value.alias("value"), "commit_ts", "op", *handle_cols,
    )


_CRAFT_SCHEMA = (
    "v int, dict array<string>, "
    "h struct<ts: long, t: int, scm: int, tbl: int>, "
    "g array<struct<t: int, n: array<int>, ty: array<int>, "
    "f: array<int>, val: array<string>>>"
)


def decode_craft(df: DataFrame, data_cols: list,
                 keep_cols: tuple = ()) -> DataFrame:
    """Consumer half of the craft stand-in (craft/craft_decoder.go): parse
    the message, resolve schema/table through the term dictionary, pick
    the NEW column group when present (else the OLD group — a delete),
    and recover each requested column's value via its dictionary id. All
    name resolution comes from the MESSAGE itself, not from encoder
    state."""
    m = F.from_json(F.col("value"), _CRAFT_SCHEMA)
    # F.get is 0-based and null-safe (ANSI element_at raises out-of-bounds)
    grp = F.coalesce(
        F.get(F.filter(m["g"], lambda g: g["t"] == _CRAFT_GROUP_NEW), F.lit(0)),
        F.get(m["g"], F.lit(0)),
    )
    cols = []
    for c in data_cols:
        cid = F.array_position(m["dict"], c) - 1
        pos = F.array_position(grp["n"], cid.cast("int"))
        cols.append(
            F.when(pos > 0, F.get(grp["val"], (pos - 1).cast("int")))
            .otherwise(F.lit(None).cast("string")).alias(c)
        )
    has_new = F.size(F.filter(m["g"], lambda g: g["t"] == _CRAFT_GROUP_NEW)) > 0
    return df.select(
        *keep_cols,
        m["h"]["ts"].alias("ts"),
        F.get(m["dict"], m["h"]["scm"]).alias("schema_name"),
        F.get(m["dict"], m["h"]["tbl"]).alias("table_name"),
        F.when(has_new, "UI").otherwise("D").alias("op_class"),
        *cols,
    )


def write_claim_check(messages: DataFrame, path: str) -> None:
    """Persist oversized payload envelopes to the claim-check store
    (pkg/sink/kafka/claimcheck — its external storage writes one object
    per message; the Spark-scale analog is ONE keyed dataset write per
    batch, location -> envelope, instead of a per-row object PUT storm).
    Locations are payload digests, so replaying a batch overwrites
    identical content — idempotent."""
    (
        messages.filter(F.col("_claim_location").isNotNull())
        .select(F.col("_claim_location").alias("location"),
                F.col("_claim_payload").alias("payload"))
        .write.mode("append").parquet(path)
    )


def resolve_claim_check(spark, messages: DataFrame, path: str) -> DataFrame:
    """Consumer half (open_protocol_decoder.go:204-218 +
    common.UnmarshalClaimCheckMessage): for messages whose key carries a
    ``ccl`` location, fetch the stored {key, value} envelope and swap the
    full pair back in; everything else passes through untouched."""
    store = (
        spark.read.parquet(path)
        .withColumnRenamed("location", "_cc_loc")
        .dropDuplicates(["_cc_loc"])  # replays write identical content
    )
    ccl = F.get_json_object("key", "$.ccl")
    out = messages.withColumn("_cc_loc", ccl).join(
        store, on="_cc_loc", how="left"
    )
    return (
        out.withColumn(
            "key",
            F.coalesce(F.get_json_object("payload", "$.key"), F.col("key")),
        )
        .withColumn(
            "value",
            F.coalesce(F.get_json_object("payload", "$.value"), F.col("value")),
        )
        .drop("_cc_loc", "payload")
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


def dispatch_default(df: DataFrame, n_partitions: int, table_col: str = "topic") -> DataFrame:
    """default dispatcher = the table dispatcher
    (dispatcher/partition/default.go:48-59 delegates to TableDispatcher)."""
    return dispatch_by_table(df, n_partitions, table_col)


def dispatch_by_ts(df: DataFrame, n_partitions: int) -> DataFrame:
    """ts dispatcher: round-robin by commit-ts (dispatcher/partition/ts.go)."""
    return df.withColumn(
        "partition", F.pmod(F.col("commit_ts"), F.lit(n_partitions)).cast("int")
    )


def dispatch_by_key(df: DataFrame, partition_key: str) -> DataFrame:
    """key dispatcher: every event to partition 0 with a FIXED configured
    message key (dispatcher/partition/key.go:35-37 returns (0, key))."""
    return df.withColumn("partition", F.lit(0).cast("int")).withColumn(
        "partition_key", F.lit(partition_key)
    )


def dispatch_by_columns(df: DataFrame, n_partitions: int, columns: list,
                        schema_col=None, table_col: str = "topic") -> DataFrame:
    """columns dispatcher: hash of (schema, table) + each configured
    column's (name, value) — rows agreeing on those columns co-locate
    (dispatcher/partition/columns.go:46-76; hasher is xxhash64 here rather
    than crc32, same co-location property)."""
    parts = [schema_col if schema_col is not None else F.lit(""), F.col(table_col)]
    for c in columns:
        parts += [F.lit(c), F.col(c).cast("string")]
    return df.withColumn(
        "partition", F.pmod(F.xxhash64(*parts), F.lit(n_partitions)).cast("int")
    )


# ---------------- event router (event_router.go) ----------------


@dataclass(frozen=True)
class RouteRule:
    """One dispatch rule: tables matching ``matcher`` (full-match regexes)
    route to ``topic_rule`` (with {schema}/{table} substitution,
    pkg/cmd/util/helper_test.go:191-192 expression forms) using
    ``partition_rule`` (default|table|index-value|ts|columns|key)."""

    matcher: tuple = ("*",)
    partition_rule: str = "default"
    topic_rule: str = "{schema}_{table}"
    columns: tuple = ()          # for partition_rule == "columns"
    partition_key: str = ""      # for partition_rule == "key"


def _matcher_to_regex(pat: str) -> str:
    # the reference uses MySQL-style table filters; '*' wildcard only
    import re as _re

    return "".join(".*" if ch == "*" else _re.escape(ch) for ch in pat)


def route_events(
    df: DataFrame,
    rules: list,
    n_partitions: int,
    schema: str,
    table_col: str = "table_name",
    key_cols: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Route every event to (topic, partition) by the FIRST matching rule
    (event_router.go:90-110 matcher semantics). Pure Column logic: the rule
    chain compiles to nested CASE WHEN over rlike matchers — one codegen
    projection regardless of rule count, no per-table driver loop."""
    tname = F.col(table_col)
    topic = None
    part = None
    for r in rules:
        cond = F.lit(False)
        for pat in r.matcher:
            cond = cond | tname.rlike("^" + _matcher_to_regex(pat) + "$")
        t_expr = F.lit(r.topic_rule.replace("{schema}", schema))
        if "{table}" in r.topic_rule:
            pieces = r.topic_rule.replace("{schema}", schema).split("{table}")
            t_expr = F.concat_ws("", F.lit(pieces[0]), tname,
                                 *[F.lit(p) for p in pieces[1:]])
        if r.partition_rule in ("default", "table"):
            p_expr = F.pmod(F.xxhash64(tname), F.lit(n_partitions))
        elif r.partition_rule in ("index-value", "rowid"):
            p_expr = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_partitions))
        elif r.partition_rule == "ts":
            p_expr = F.pmod(F.col("commit_ts"), F.lit(n_partitions))
        elif r.partition_rule == "columns":
            parts = [F.lit(schema), tname]
            for c in r.columns:
                parts += [F.lit(c), F.col(c).cast("string")]
            p_expr = F.pmod(F.xxhash64(*parts), F.lit(n_partitions))
        elif r.partition_rule == "key":
            p_expr = F.lit(0)
        else:
            raise ValueError(f"unknown partition rule {r.partition_rule!r}")
        topic = F.when(cond, t_expr) if topic is None else topic.when(cond, t_expr)
        part = F.when(cond, p_expr) if part is None else part.when(cond, p_expr)
    # unmatched tables fall back to the default rule (event_router.go
    # appends a default matcher covering all tables)
    topic = topic.otherwise(F.concat_ws("_", F.lit(schema), tname))
    part = part.otherwise(F.pmod(F.xxhash64(tname), F.lit(n_partitions)))
    return df.withColumn("topic", topic).withColumn("partition", part.cast("int"))


def encode_maxwell(df: DataFrame, database: str, table: str, data_cols: list,
                   pre_cols: list | None = None,
                   handle_cols: tuple = ("conv_id", "turn_idx")) -> DataFrame:
    """Maxwell codec (pkg/sink/codec/maxwell/maxwell_message.go:27-37):
    {"database","table","type" insert|update|delete,"ts","data":{...}
    [,"old":{...}]} — the update's "old" map carries the pre-image. Pure
    Column to_json; a delete's data carries the handle key (the stream has
    no post-image for deletes)."""
    mtype = (
        F.when(F.col("op") == "I", "insert")
        .when(F.col("op") == "U", "update")
        .otherwise("delete")
    )
    data = F.struct(*[F.col(c).cast("string").alias(c) for c in data_cols])
    parts = [
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        mtype.alias("type"),
        F.col("commit_ts").alias("ts"),
        data.alias("data"),
    ]
    if pre_cols:
        parts.append(
            F.struct(*[F.col(c).cast("string").alias(c) for c in pre_cols]).alias("old")
        )
    value = F.to_json(F.struct(*parts))
    return df.select(
        F.lit(f"{database}_{table}").alias("topic"), value.alias("value"),
        "commit_ts", "op", *handle_cols,
    )


def encode_debezium(df: DataFrame, database: str, table: str, data_cols: list,
                    pre_cols: list | None = None,
                    handle_cols: tuple = ("conv_id", "turn_idx")) -> DataFrame:
    """Debezium-JSON envelope (pkg/sink/codec/debezium/codec.go:531-591):
    {"payload": {"source": {"db","table"}, "op": c|u|d, "ts_ms",
    "before": ..., "after": ...}} — insert has NULL before, delete has NULL
    after, update carries both when the pre-image is available."""
    row = F.struct(*[F.col(c).cast("string").alias(c) for c in data_cols])
    null_row = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:string" for c in data_cols) + ">"
    )
    op = (
        F.when(F.col("op") == "I", "c")
        .when(F.col("op") == "U", "u")
        .otherwise("d")
    )
    # before/after are REAL nested objects (a NULL one is omitted from the
    # JSON, matching debezium's null before/after)
    pre = (
        F.struct(*[F.col(c).cast("string").alias(c) for c in pre_cols])
        if pre_cols else null_row
    )
    before = F.when(F.col("op") == "I", null_row).otherwise(pre)
    after = F.when(F.col("op") == "D", null_row).otherwise(row)
    payload = F.struct(
        F.struct(F.lit(database).alias("db"), F.lit(table).alias("table")).alias("source"),
        op.alias("op"),
        F.col("commit_ts").alias("ts_ms"),
        before.alias("before"),
        after.alias("after"),
    )
    value = F.to_json(F.struct(payload.alias("payload")))
    return df.select(
        F.lit(f"{database}.{table}").alias("topic"), value.alias("value"),
        "commit_ts", "op", *handle_cols,
    )


def encode_simple(df: DataFrame, database: str, table: str, data_cols: list,
                  schema_version: int = 0,
                  handle_cols: tuple = ("conv_id", "turn_idx")) -> DataFrame:
    """Simple-protocol DML message (pkg/sink/codec/simple/message.go:471-501):
    {"version":1,"database","table","type" INSERT|UPDATE|DELETE,"commitTs",
    "schemaVersion","data":{...}} for insert/update, "old" instead of
    "data" for delete (Data is insert/update-only, Old carries the
    delete's image per the reference struct). Bootstrap/DDL messages are
    registry-coupled and omitted."""
    row = F.struct(*[F.col(c).cast("string").alias(c) for c in data_cols])
    handle = F.struct(*[
        F.col(c).cast("string").alias(c) for c in handle_cols
        if c in data_cols
    ])
    base = [
        F.lit(1).alias("version"),
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        _op_word().alias("type"),
        F.col("commit_ts").alias("commitTs"),
        F.lit(schema_version).alias("schemaVersion"),
    ]
    value = F.when(
        F.col("op") == "D", F.to_json(F.struct(*base, handle.alias("old")))
    ).otherwise(F.to_json(F.struct(*base, row.alias("data"))))
    return df.select(
        F.lit(f"{database}_{table}").alias("topic"), value.alias("value"),
        "commit_ts", "op", *handle_cols,
    )


@dataclass(frozen=True)
class ColumnSelectorRule:
    """Column selector (cdc/sink/dmlsink/mq/transformer/columnselector/
    column_selector.go:30-135): tables matching ``matcher`` emit only the
    columns matching ``columns`` patterns ('*' wildcard; '!' prefix
    negates). Handle-key columns may never be deselected (VerifyColumn
    :227 — the dispatcher and consumer resolution depend on them)."""

    matcher: tuple = ("*",)
    columns: tuple = ("*",)


def select_columns(table: str, data_cols: list, rules: list,
                   handle_cols: tuple = ("conv_id", "turn_idx")) -> list:
    """Resolve the emitted column list for one table against the FIRST
    matching selector rule — the config-time half of the reference's
    ColumnSelector.Apply (the per-event half is just feeding the reduced
    list to an encoder). Raises if a rule would drop a handle-key column."""
    import re as _re

    def _m(pat, name):
        return _re.fullmatch(_matcher_to_regex(pat), name) is not None

    for r in rules:
        if not any(_m(p, table) for p in r.matcher):
            continue
        keep = []
        for c in data_cols:
            pos = any(_m(p, c) for p in r.columns if not p.startswith("!"))
            neg = any(_m(p[1:], c) for p in r.columns if p.startswith("!"))
            if pos and not neg:
                keep.append(c)
        dropped_handles = [c for c in handle_cols if c in data_cols and c not in keep]
        if dropped_handles:
            raise ValueError(
                f"column selector would drop handle-key columns {dropped_handles} "
                f"of table {table!r} (column_selector.go:227 forbids it)"
            )
        return keep
    return list(data_cols)


def resolved_messages(resolved_log: DataFrame, topics: list, n_partitions: int) -> DataFrame:
    """Resolved-ts broadcast messages: when the global frontier advances,
    an open-protocol resolved message ({"ts": r, "t": 3} — t=3 is
    MessageTypeResolved, open_protocol_message.go:115-119) is sent to
    EVERY partition of EVERY topic so consumers can advance their
    watermark (mq worker broadcast semantics). One row per
    (frontier step, topic, partition)."""
    from ticdc_spark.sources.frontier import per_partition_resolved

    # a resolved value r is an achievable global frontier once EVERY
    # partition has advanced to >= r — r <= min over partitions of
    # max(resolved_ts) (frontier_steps semantics). A partition may step
    # PAST r without ever emitting r itself; requiring the exact value from
    # every partition would wrongly suppress the broadcast.
    steps = (
        resolved_log.select("resolved_ts").distinct()
        .crossJoin(
            per_partition_resolved(resolved_log)
            .agg(F.min("resolved_ts").alias("_floor"))
        )
        .filter(F.col("resolved_ts") <= F.col("_floor"))
        .select("resolved_ts")
    )
    t = F.explode(F.array(*[F.lit(x) for x in topics])).alias("topic")
    p = F.explode(F.sequence(F.lit(0), F.lit(n_partitions - 1))).alias("partition")
    return (
        steps.select("resolved_ts", t)
        .select("resolved_ts", "topic", p)
        .select(
            "topic",
            F.col("partition").cast("int").alias("partition"),
            F.to_json(
                F.struct(F.col("resolved_ts").alias("ts"), F.lit(3).alias("t"))
            ).alias("key"),
            "resolved_ts",
        )
    )
