"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): `decode_image` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder exercises the
real Spark-side plumbing — schema, batch shape, partitioning — end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, feat array<float>"
)


def synth_media(spark: SparkSession, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes),
    lazily generated from spark.range. Derivation is md5-based — a
    PORTABLE hash both Spark and DuckDB compute identically, so an external
    SQL oracle can rebuild the exact table (xxhash64 would be Spark-only)."""
    df = spark.range(n)
    hexc = F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{seed}")))
    a1 = F.ascii(F.substring(hexc, 1, 1))
    a2 = F.ascii(F.substring(hexc, 2, 1))
    a3 = F.ascii(F.substring(hexc, 3, 1))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (a1 % 3 + 1).cast("int")
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (a2 * 16 % 1024 + 64).cast("int")).alias("width"),
        F.when(kind == "image", (a3 * 12 % 768 + 64).cast("int")).alias("height"),
        F.when(kind != "image", (a2 * 997 % 60_000 + 1000).cast("long")).alias("duration_ms"),
        # 8 x 32 hex chars = 256 payload bytes
        F.encode(F.repeat(hexc, 8), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes, fake: bool = False) -> list:
    """Stub decode kernel. Real deployment: PIL/opencv decode → pixel
    tensor. Here: deterministic fake features derived from the bytes."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv — not available in this container; "
            "pass fake=True to exercise the pipeline with deterministic fake features"
        )
    acc = 2166136261
    for b in payload[:256]:
        acc = ((acc ^ b) * 16777619) & 0xFFFFFFFF
    return [((acc >> (i * 4)) & 0xF) / 15.0 for i in range(8)]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    The partitioning story: media is processed where it lives (no shuffle);
    the UDF is pure per-row so Spark's task parallelism is the fan-out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p if p is not None else b"", fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "checksum": pdf["payload"].map(
                        lambda p: sum(p[:64]) if p is not None else 0
                    ),
                    "feat": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: the TARGET geometry is computed natively (JVM-side
    integer math — aspect-preserving clamp of the longest side), so the
    only per-pixel work left for the (stubbed) kernel is the resample
    itself. Output carries (media_id, width, height, new_width, new_height,
    payload) — feed to :func:`resize_images`."""
    scale_needed = F.greatest(F.col("width"), F.col("height")) > max_side
    ratio = F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double")
    return media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height",
        F.when(scale_needed, F.ceil(F.col("width") * ratio)).otherwise(F.col("width"))
        .cast("int").alias("new_width"),
        F.when(scale_needed, F.ceil(F.col("height") * ratio)).otherwise(F.col("height"))
        .cast("int").alias("new_height"),
        "payload",
    )


def resize_images(media: DataFrame, max_side: int = 256, fake: bool = True) -> DataFrame:
    """mapInPandas resample: Arrow batches in/out, no shuffle (images are
    processed where they live). The pixel kernel is stubbed like
    decode_image — real deployment swaps in PIL/opencv resample; the fake
    emits a deterministic payload of the right byte budget so downstream
    sizing/partitioning logic is exercised for real."""
    planned = resize_plan(media, max_side)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resampling requires PIL/opencv — not in this container; "
                    "pass fake=True to exercise the plumbing"
                )
            out_payload = [
                (p[: max(1, int(len(p) * (nw * nh) / max(w * h, 1)))] if p else b"")
                for p, w, h, nw, nh in zip(
                    pdf["payload"], pdf["width"], pdf["height"],
                    pdf["new_width"], pdf["new_height"],
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["new_width"],
                    "height": pdf["new_height"],
                    "payload": out_payload,
                }
            )

    return planned.mapInPandas(
        op, schema="media_id long, width int, height int, payload binary"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode sample timestamps natively
    (JVM-side), leaving only the per-frame decode to the (stubbed) UDF."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames
