"""Gap-based sessionization of event/transcript streams.

Two implementations of the same semantics (a new session starts when the
gap since the previous event of the same key exceeds ``gap``):

- :func:`sessionize_batch` — native window functions (lag + running sum),
  fully shuffle-parallel by key, used for bounded replays and as the
  correctness oracle. This is the plan you want at 100 TB: one hash
  exchange on the key, no Python.
- :func:`sessionize_stream` — Structured Streaming with
  ``applyInPandasWithState``: per-key state (last event ts, running session
  index) carried ACROSS micro-batches, the custom-stateful-operator pattern
  (GroupState, Arrow-batched). Contract: micro-batches arrive in event-time
  order per key (a resolved-ts/WAL tail satisfies this); within a batch
  events are sorted before assignment.

The reference has no sessionizer (it replicates rows); this operator is
part of the training-data-pipeline surface (conversation/session windows
over transcript streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize_batch(df: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
                     gap_seconds: int = 1800) -> DataFrame:
    """(key, session_idx, n_events, session_start, session_end) per session.
    Deterministic tie-break on (ts, event_id) when present."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + ([F.col("event_id")] if "event_id" in df.columns else [])
    w = W.partitionBy(key_col).orderBy(*order)
    if dict(df.dtypes)[ts_col].startswith("timestamp"):
        ts_u = F.unix_micros(F.col(ts_col).cast("timestamp"))
    else:
        ts_u = F.col(ts_col).cast("long") * F.lit(1_000_000)
    gap_u = gap_seconds * 1_000_000
    new_sess = (
        F.when(F.lag(ts_u).over(w).isNull(), 1)
        .when(ts_u - F.lag(ts_u).over(w) > gap_u, 1)
        .otherwise(0)
    )
    sessed = df.withColumn("_new", new_sess).withColumn(
        "session_idx", F.sum("_new").over(w).cast("long")
    )
    return sessed.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


_STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.LongType()),      # epoch MICROS of newest event
    T.StructField("session_idx", T.LongType()),
    T.StructField("open_n", T.LongType()),       # events so far in the open session
    T.StructField("open_start", T.LongType()),   # its start (epoch MICROS)
])


def _out_schema(key_field: T.StructField, ts_type: T.DataType) -> T.StructType:
    return T.StructType([
        key_field,
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", ts_type),
        T.StructField("session_end", ts_type),
    ])


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> None:
    """Drain all available event files (Trigger.AvailableNow), assigning
    session ids with applyInPandasWithState; per-session aggregates are
    appended to ``out_dir`` as they UPDATE (last write per (key, session)
    wins — re-aggregate or LWW downstream)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(events_dir)
    is_ts = dict(stream.dtypes)[ts_col] == "timestamp"
    key_field = T.StructField(key_col, stream.schema[key_col].dataType)
    out_schema = _out_schema(key_field, stream.schema[ts_col].dataType)

    gap_us = gap_seconds * 1_000_000

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

        (last_ts, idx, open_n, open_start) = (
            state.get if state.exists else (None, 0, 0, None)
        )
        prev_open_idx = idx if last_ts is not None else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col, kind="mergesort")
        # MICROSECOND precision throughout — bit-for-bit the batch twin's
        # unix_micros comparison (sub-second gaps near the threshold must
        # agree between the two implementations)
        ts_us = (
            rows[ts_col].astype("int64") // 1_000
            if is_ts else rows[ts_col].astype("int64") * 1_000_000
        ).astype("Int64")
        # vectorized gap rule: diff against the previous event (the carried
        # last_ts seeds position 0), cumsum numbers the sessions — no
        # per-row Python even for a hot key with millions of events
        prev = ts_us.shift(1)
        if last_ts is not None:
            prev.iloc[0] = last_ts
        new_sess = (prev.isna() | ((ts_us - prev) > gap_us)).astype("int64")
        sess_ids = (new_sess.cumsum() + idx).astype("int64")
        rows = rows.assign(_s=sess_ids.to_numpy(), _t=ts_us.astype("int64").to_numpy())
        agg = rows.groupby("_s").agg(
            n_events=("_t", "size"),
            start_us=("_t", "min"),
            end_us=("_t", "max"),
        ).reset_index()
        # a session continuing from earlier batches accumulates its carried
        # count and keeps its original start
        if prev_open_idx is not None and (agg["_s"] == prev_open_idx).any():
            m = agg["_s"] == prev_open_idx
            agg.loc[m, "n_events"] += open_n
            agg.loc[m, "start_us"] = min(int(agg.loc[m, "start_us"].iloc[0]), open_start)
        # the (possibly new) open session is the one with the max idx
        tail = agg.loc[agg["_s"].idxmax()]
        state.update((int(ts_us.iloc[-1]), int(sess_ids.iloc[-1]),
                      int(tail["n_events"]), int(tail["start_us"])))
        if is_ts:
            agg["session_start"] = pd.to_datetime(agg["start_us"], unit="us")
            agg["session_end"] = pd.to_datetime(agg["end_us"], unit="us")
        else:
            agg["session_start"] = agg["start_us"] // 1_000_000
            agg["session_end"] = agg["end_us"] // 1_000_000
        agg[key_col] = key[0]
        agg["n_events"] = agg["n_events"].astype("int64")
        yield agg.rename(columns={"_s": "session_idx"})[
            [key_col, "session_idx", "n_events", "session_start", "session_end"]
        ]

    sessed = stream.groupBy(key_col).applyInPandasWithState(
        assign, out_schema, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )

    def sink(batch_df, epoch_id):
        # append the update log; read_sessions resolves last-image-wins
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir or f"{out_dir}_ckpt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_sessions(spark: SparkSession, out_dir: str, key_col: str = "user_id") -> DataFrame:
    """Resolve the streamed session log: a session updated across batches
    appears multiple times — the LAST image per (key, session_idx) wins
    (max n_events, since counts only grow)."""
    raw = spark.read.parquet(out_dir)
    return raw.groupBy(key_col, "session_idx").agg(
        F.max("n_events").alias("n_events"),
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
    )
