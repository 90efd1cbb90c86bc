"""Deterministic, lazily-partitioned synthetic binlog generator.

Models TiCDC's change-event stream (`RawKVEntry`,
/root/reference/cdc/model/kv.go:82-95) specialized to the transcript payload:
one row per change event with (commit_ts, start_ts, op, conv_id, turn_idx,
payload JSON, schema_version, partition_id), plus a per-partition
resolved-ts marker stream (`OpTypeResolved`, kv.go:26-34) and a DDL event
stream (`DDLEvent`, /root/reference/cdc/model/sink.go:1025-1040).

Scale posture: everything derives from ``spark.range`` + pure column
expressions (xxhash64-seeded pseudo-randomness) — no driver-side
materialization, so the same generator produces 10^4 events for pytest and
10^10 events on a cluster by changing one integer.

Contract upheld (kv.go:59-66): within a partition, once resolved-ts ``r``
is emitted, no later event has ``commit_ts <= r``. Events ARE
out-of-commit-ts-order inside each unresolved block (a deterministic
coprime permutation scrambles arrival order), mirroring the sorter's input
regime (cdc/processor/sourcemanager/sorter/pebble/event_sorter.go:140-168).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DDLSpec:
    """One schema-change event (scope per BASELINE.json: add/rename column)."""

    commit_ts: int
    ddl_type: str  # 'add_column' | 'rename_column' | 'drop_column' | 'truncate_table'
    column: str | None = None  # column added/dropped, or new name for rename
    old_column: str | None = None  # rename source
    col_type: str = "string"
    table_name: str | None = None  # None = global (applies to every table)

    def query(self) -> str:
        tbl = self.table_name or "transcripts"
        if self.ddl_type == "add_column":
            return f"ALTER TABLE {tbl} ADD COLUMN {self.column} {self.col_type.upper()}"
        if self.ddl_type == "rename_column":
            return f"ALTER TABLE {tbl} RENAME COLUMN {self.old_column} TO {self.column}"
        if self.ddl_type == "drop_column":
            return f"ALTER TABLE {tbl} DROP COLUMN {self.column}"
        if self.ddl_type == "modify_column":
            return f"ALTER TABLE {tbl} MODIFY COLUMN {self.column} {self.col_type.upper()}"
        if self.ddl_type == "truncate_table":
            return f"TRUNCATE TABLE {tbl}"
        if self.ddl_type == "create_table":
            return f"CREATE TABLE {tbl}"
        if self.ddl_type == "drop_table":
            return f"DROP TABLE {tbl}"
        if self.ddl_type == "rename_table":
            return f"RENAME TABLE {self.old_column} TO {tbl}"
        raise ValueError(f"unknown ddl_type {self.ddl_type}")


@dataclass(frozen=True)
class BinlogSpec:
    """Generator parameters. Deterministic for a fixed spec."""

    n_events: int = 10_000
    n_convs: int = 200
    n_turns: int = 8
    n_partitions: int = 4
    base_ts: int = 1_000
    block: int = 1_000  # resolved-ts emitted every `block` commit-ts units
    delete_pct: int = 5
    update_pct: int = 45
    # percent of UPDATE events whose handle key changed (pre-image key rides
    # in pre_conv_id/pre_turn_idx; the engine must split them into D+I —
    # cdc/model/sink.go:1166-1238)
    key_change_pct: int = 0
    hot_frac: float = 0.0  # fraction of events funneled onto n_hot convs
    n_hot: int = 3
    seed: int = 42
    ddls: tuple[DDLSpec, ...] = field(default_factory=tuple)

    @property
    def max_commit_ts(self) -> int:
        return self.base_ts + self.n_events

    @property
    def n_blocks(self) -> int:
        return (self.n_events + self.block - 1) // self.block


def _h(col, seed: int):
    return F.xxhash64(col, F.lit(seed))


# multiplier used to permute arrival order inside a block. PRIME, so it is
# coprime with (and the permutation a bijection for) every block size below
# 40,507 — a composite here silently duplicates commit_ts for block sizes
# sharing a factor, breaking the generator's unique-commit_ts contract.
_PERM = 40_507


def gen_binlog(spark: SparkSession, spec: BinlogSpec, parallelism: int | None = None) -> DataFrame:
    """Change-event stream. Row order of the DataFrame = arrival order."""
    import math

    if math.gcd(_PERM, spec.block) != 1:
        raise ValueError(
            f"block={spec.block} shares a factor with the permutation "
            f"multiplier {_PERM}; the in-block permutation would not be a "
            "bijection (duplicate commit_ts)"
        )
    n_parts = parallelism or spark.sparkContext.defaultParallelism
    df = spark.range(0, spec.n_events, numPartitions=n_parts)
    i = F.col("id")
    blk = (i / spec.block).cast("long")
    pos = i % spec.block
    blk_size = F.least(F.lit(spec.block), F.lit(spec.n_events) - blk * spec.block)
    # permuted position within the block → out-of-order arrival, unique
    # commit_ts; identity on a partial last block (bijection needs
    # gcd(_PERM, blk_size) == 1, guaranteed only for the full block size)
    pos_p = F.when(blk_size == spec.block, (pos * _PERM) % blk_size).otherwise(pos)
    commit_ts = (F.lit(spec.base_ts) + blk * spec.block + pos_p + 1).alias("commit_ts")

    conv_idx = F.pmod(_h(i, spec.seed + 1), F.lit(spec.n_convs))
    if spec.hot_frac > 0:
        is_hot = F.pmod(_h(i, spec.seed + 2), F.lit(1_000_000)) < int(spec.hot_frac * 1_000_000)
        conv_idx = F.when(is_hot, F.pmod(_h(i, spec.seed + 3), F.lit(spec.n_hot))).otherwise(conv_idx)
    conv_id = F.format_string("conv-%06d", conv_idx).alias("conv_id")

    turn_idx = F.pmod(_h(i, spec.seed + 4), F.lit(spec.n_turns)).cast("int").alias("turn_idx")
    u = F.pmod(_h(i, spec.seed + 5), F.lit(100))
    op = (
        F.when(u < spec.delete_pct, "D")
        .when(u < spec.delete_pct + spec.update_pct, "U")
        .otherwise("I")
        .alias("op")
    )

    df = df.select(i, commit_ts, conv_id, turn_idx, op)

    # schema_version = commit_ts of the newest DDL strictly before this event's
    # write (snapshot-at-CRTs-1 rule, cdc/entry/mounter.go:173)
    ver = F.lit(0).cast("long")
    for d in sorted(spec.ddls, key=lambda d: d.commit_ts):
        ver = F.when(F.col("commit_ts") > d.commit_ts, F.lit(d.commit_ts)).otherwise(ver)
    df = df.withColumn("schema_version", ver)

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(_h(i, spec.seed + 6), F.lit(4)) + 1).cast("int"),
    )
    text = F.format_string("t %s:%d v%d", F.col("conv_id"), F.col("turn_idx"), F.col("commit_ts"))
    tool = F.when(role == "tool", F.lit("search")).otherwise(F.lit(None).cast("string"))
    ts_us = (F.lit(1_700_000_000) + F.col("commit_ts")) * F.lit(1_000_000)

    fields: list[tuple[str, object]] = [("role", role), ("text", text), ("tool", tool), ("ts", ts_us)]
    payload = F.to_json(F.struct(*[c.alias(n) for n, c in fields]))
    # each DDL changes the writer schema for events with schema_version >= its ts
    for d in sorted(spec.ddls, key=lambda d: d.commit_ts):
        if d.ddl_type == "add_column":
            fields = fields + [(d.column, F.format_string(f"{d.column}-%d", F.col("commit_ts")))]
        elif d.ddl_type == "rename_column":
            fields = [(d.column if n == d.old_column else n, c) for n, c in fields]
        elif d.ddl_type == "drop_column":
            fields = [(n, c) for n, c in fields if n != d.column]
        elif d.ddl_type == "truncate_table":
            continue  # data unchanged; the incarnation change is sink-side
        payload = F.when(
            F.col("schema_version") >= d.commit_ts,
            F.to_json(F.struct(*[c.alias(n) for n, c in fields])),
        ).otherwise(payload)

    df = (
        df.withColumn("start_ts", F.col("commit_ts") - 1 - F.pmod(_h(i, spec.seed + 7), F.lit(5)))
        .withColumn("payload", F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(payload))
        .withColumn("pre_payload", F.lit(None).cast("string"))
        .withColumn(
            "partition_id",
            F.pmod(F.xxhash64(F.col("conv_id"), F.lit(spec.seed + 8)), F.lit(spec.n_partitions)).cast("int"),
        )
    )
    if spec.key_change_pct > 0:
        kc = (F.col("op") == "U") & (
            F.pmod(_h(i, spec.seed + 9), F.lit(100)) < spec.key_change_pct
        )
        pre_conv = F.format_string(
            "conv-%06d", F.pmod(_h(i, spec.seed + 10), F.lit(spec.n_convs))
        )
        pre_turn = F.pmod(_h(i, spec.seed + 11), F.lit(spec.n_turns)).cast("int")
        df = df.withColumn(
            "pre_conv_id", F.when(kc, pre_conv).otherwise(F.lit(None).cast("string"))
        ).withColumn(
            "pre_turn_idx", F.when(kc, pre_turn).otherwise(F.lit(None).cast("int"))
        )
        return df.drop("id").select(
            "commit_ts", "start_ts", "op", "conv_id", "turn_idx",
            "payload", "pre_payload", "pre_conv_id", "pre_turn_idx",
            "schema_version", "partition_id",
        )
    return df.drop("id").select(
        "commit_ts", "start_ts", "op", "conv_id", "turn_idx",
        "payload", "pre_payload", "schema_version", "partition_id",
    )


def gen_resolved_log(spark: SparkSession, spec: BinlogSpec) -> DataFrame:
    """Per-partition resolved-ts markers at every block boundary.

    Frontier semantics: the global watermark is min over partitions
    (cdc/puller/frontier/frontier.go:31-37,75-77).
    """
    blocks = spark.range(1, spec.n_blocks + 1).select(
        (F.lit(spec.base_ts) + F.col("id") * spec.block).alias("resolved_ts"),
        F.col("id").alias("emit_seq"),
    )
    parts = spark.range(spec.n_partitions).select(F.col("id").cast("int").alias("partition_id"))
    return parts.crossJoin(blocks).select("partition_id", "resolved_ts", "emit_seq")


def gen_ddl_log(spark: SparkSession, spec: BinlogSpec) -> DataFrame:
    """DDL event stream (cdc/puller/ddl_puller.go analog, tiny by nature)."""
    rows = [
        (d.commit_ts, d.ddl_type, d.query(), d.column, d.old_column, d.col_type,
         d.commit_ts, d.table_name)
        for d in sorted(spec.ddls, key=lambda d: d.commit_ts)
    ]
    schema = (
        "commit_ts long, ddl_type string, query string, column string, "
        "old_column string, col_type string, schema_version long, table_name string"
    )
    return spark.createDataFrame(rows, schema=schema)
