"""Mounter: decode raw change events into typed rows — vectorized.

TiCDC's mounter turns a RawKVEntry into a RowChangedEvent by decoding the
value bytes against the schema snapshot at commit_ts - 1 and filling
defaults for columns missing from the event
(/root/reference/cdc/entry/mounter.go:129-230, datum2Column :402-451,
defaults :909-965). It runs 16 parallel workers
(/root/reference/cdc/entry/mounter_group.go:49-148).

Spark re-expression: ONE Arrow-batched pandas UDF per micro-batch (the
per-row work mandate) returning a struct of the current payload schema;
worker parallelism is Spark's task parallelism. Type casts happen
natively (JVM-side) after the UDF: the UDF emits strings/longs only, so
the Python hot loop is just JSON parsing over Arrow batches.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ticdc_spark.plans.schema_registry import SchemaRegistry, SchemaSnapshot


def _decode_udf(current: SchemaSnapshot, writer_maps: dict):
    """Build the pandas UDF for one micro-batch. ``writer_maps`` is
    {writer_version: {current_field: writer_field}} (small dict captured in
    the closure — the broadcast-dict pattern)."""
    names = [n for n, _ in current.fields]
    # UDF-internal transport types: strings for everything except longs
    udf_schema = T.StructType(
        [
            T.StructField(n, T.LongType() if t in ("long", "bigint") else T.StringType(), True)
            for n, t in current.fields
        ]
    )

    def decode(payload: pd.Series, version: pd.Series) -> pd.DataFrame:
        parsed = payload.map(lambda s: json.loads(s) if isinstance(s, str) else None)
        cols = {}
        vmaps = version.map(lambda v: writer_maps.get(int(v), {}))
        for n in names:
            cols[n] = [
                (d.get(m.get(n)) if (d is not None and m.get(n) is not None) else None)
                for d, m in zip(parsed, vmaps)
            ]
        return pd.DataFrame(cols)

    return F.pandas_udf(decode, returnType=udf_schema)


def mount(
    df: DataFrame,
    registry: SchemaRegistry,
    as_of_ts: int,
    payload_col: str = "payload",
    version_col: str = "schema_version",
    defaults: dict | None = None,
) -> DataFrame:
    """Decode ``payload`` (JSON string, writer-versioned) into typed
    columns of the snapshot at ``as_of_ts``.

    Inside one barrier-delimited sub-batch every event decodes against the
    same sink snapshot (the driver loop splits batches at DDL commit-ts),
    but each event's *writer* schema may be any version <= its own
    commit_ts - 1; the per-event ``schema_version`` column selects the
    right field mapping, mirroring snapshot-at-CRTs-1
    (cdc/entry/mounter.go:173).

    Columns absent from an event get the column default or NULL
    (getDefaultOrZeroValue, mounter.go:909-965) — pass ``defaults``.
    Delete events (payload NULL) yield an all-NULL struct; MERGE only
    needs their keys.
    """
    current = registry.snapshot_at(as_of_ts)
    writer_maps = registry.writer_field_map(current)
    udf = _decode_udf(current, writer_maps)
    out = df.withColumn("_m", udf(F.col(payload_col), F.col(version_col)))
    for n, t in current.fields:
        col = F.col(f"_m.{n}")
        if t == "timestamp":
            col = F.timestamp_micros(col.cast("long"))
        elif n == "ts" and t == "long":
            # transcript convention: ts travels as epoch micros
            col = F.timestamp_micros(col)
            t = "timestamp"
        else:
            col = col.cast({"string": "string", "int": "int", "long": "long",
                            "bigint": "long", "double": "double"}[t])
        if defaults and n in defaults:
            col = F.coalesce(col, F.lit(defaults[n]))
        out = out.withColumn(n, col)
    return out.drop("_m", payload_col, "pre_payload", version_col)


def mounted_columns(registry: SchemaRegistry, as_of_ts: int) -> list:
    """Payload column names after mount at a given snapshot."""
    return [n for n, _ in registry.snapshot_at(as_of_ts).fields]


def verify_checksum(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Integrity check analog (cdc/entry/mounter.go:453-523): attach a
    64-bit payload checksum; a sink can quarantine rows whose recomputed
    checksum mismatches a transported one. Native xxhash64 — no UDF."""
    return df.withColumn("_checksum", F.xxhash64(F.coalesce(F.col(payload_col), F.lit(""))))
