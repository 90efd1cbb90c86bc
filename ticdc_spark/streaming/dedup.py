"""Streaming exact-dedup twin: cross-batch first-wins classification.

The batch-incremental operator (``textops.delta_exact_dedup``) classifies
one delta batch against a base-corpus hash index. A continuously-tailing
deployment wants the same classification as documents ARRIVE — this module
is that twin: ``applyInPandasWithState`` keyed by content hash keeps ONE
tiny state row per distinct text (the kept representative's doc_id), so
every arriving document is labeled ``unique`` / ``dup_in_delta`` (a
smaller doc_id in the same micro-batch won) / ``dup_of_base`` (an earlier
batch already ingested the content) with the SAME statuses and the SAME
representative choice as iterating delta_exact_dedup batch by batch —
``tests/test_stream_dedup.py`` proves the equivalence on shared input.

Scale shape: state is O(distinct texts) split across the state store's
hash partitions — two narrow columns per distinct document, the exact
index delta_exact_dedup's docstring tells a deployment to maintain; the
per-batch cost is one keyed state lookup per group, no rescan of any
prior text. Arrow-batched state function (no per-row Python).

Reference anchor: the processor's per-key sink state lifecycle
(/root/reference/cdc/processor/sinkmanager/manager.go:489-663) — the same
keep-one-row-per-key, advance-on-arrival contract, applied to content
hashes instead of table spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("first_doc_id", T.LongType())])

_OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("dup_of", T.LongType()),
])


def _classify(key, pdfs, state: GroupState):
    import pandas as pd

    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        first = int(state.get[0])
        out = pd.DataFrame({
            "doc_id": rows["doc_id"],
            "status": "dup_of_base",
            "dup_of": first,
        })
    else:
        m = int(rows["doc_id"].min())
        out = pd.DataFrame({
            "doc_id": rows["doc_id"],
            "status": (rows["doc_id"] == m).map(
                {True: "unique", False: "dup_in_delta"}
            ),
            "dup_of": rows["doc_id"].map(lambda d: None if d == m else m),
        })
        state.update((m,))
    yield out


def dedup_stream(spark: SparkSession, in_dir: str, out_dir: str,
                 checkpoint_dir: str, schema: T.StructType | None = None,
                 text_col: str = "text", max_files_per_trigger: int = 1,
                 await_termination: bool = True):
    """Tail a document directory and append the per-document dedup
    classification to ``out_dir`` (parquet), exactly-once via the
    streaming checkpoint. Batch boundaries are arrival boundaries —
    the same contract the driver-loop incremental dedup has."""
    schema = schema or T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(text_col, T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
        .select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
    )
    labeled = stream.groupBy("text_hash").applyInPandasWithState(
        _classify, _OUT_SCHEMA, _STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        labeled.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def read_dedup(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
