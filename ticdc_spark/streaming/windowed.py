"""Watermarked windowed aggregation over event streams.

The CDC core never needs event-time watermarks (resolved-ts bounds batches
— SURVEY §2.9 W9), but the training-data-pipeline surface does: tumbling
per-window counts over transcript/event streams where LATE events (behind
the watermark) must be dropped and windows FINALIZED exactly once.

Spark-native: ``withWatermark`` + ``F.window`` + append output mode — state
for a window is freed once the watermark passes its end, so state size is
O(active windows × keys), independent of stream length. The batch twin
(plain groupBy over the same window expression) is the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts_batch(df: DataFrame, ts_col: str = "ts",
                          window: str = "10 minutes",
                          key_col: str | None = None) -> DataFrame:
    keys = [F.window(F.col(ts_col), window).alias("w")] + ([key_col] if key_col else [])
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_events"))
    cols = [F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end")]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n_events")


def windowed_counts_stream(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    key_col: str | None = None,
) -> None:
    """Drain available files (Trigger.AvailableNow) through a watermarked
    tumbling-window count; APPEND mode emits each window exactly once, when
    the watermark passes its end. Events later than ``watermark`` behind
    the max seen event time are dropped — the late-data contract."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    keys = [F.window(F.col(ts_col), window).alias("w")] + ([key_col] if key_col else [])
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = [F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end")]
    if key_col:
        cols.append(F.col(key_col))
    q = (
        agg.select(*cols, "n_events")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
