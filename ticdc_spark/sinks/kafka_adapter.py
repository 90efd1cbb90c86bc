"""Live-transport adapter: encoded MQ frames → Spark's Kafka sink.

The codecs/dispatchers/router in :mod:`ticdc_spark.sinks.mq` produce the
exact (topic, partition, key, value) frame a Kafka producer consumes — the
reference's worker batches the same tuples to a live producer
(/root/reference/cdc/sink/dmlsink/mq/worker.go:327). This sandbox has no
broker or spark-sql-kafka connector, so the adapter is FEATURE-FLAGGED:

- :func:`to_kafka_frame` (always available, tested) projects any encoded
  message DataFrame onto the Kafka sink's column contract — ``topic``
  string, ``key``/``value`` binary, optional ``partition`` int — so the
  frame is provably writable the moment a connector exists;
- :func:`kafka_available` probes the JVM for the connector class;
- :func:`write_batch_kafka` / :func:`stream_writer_kafka` wire the frame
  into ``format("kafka")`` writers, refusing up front (clear error, no
  half-configured job) when the connector is absent.

Exactly-once note: Kafka's producer gives at-least-once; the reference
relies on consumer-side idempotency for MQ sinks (resolved-ts watermarks +
key-ordered messages), and the same holds here — the encoded frames carry
commit-ts so any consumer can apply the LWW rule this engine's own lake
sink uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_FORMAT = "kafka"


def to_kafka_frame(messages: DataFrame) -> DataFrame:
    """Project an encoded message DataFrame (any mq.py encoder output,
    optionally dispatched/routed) onto the Kafka sink contract:
    ``topic: string``, ``key: binary`` (if present), ``value: binary``,
    ``partition: int`` (if present). Extra columns are dropped — the sink
    rejects unknown columns."""
    cols = [F.col("topic").cast("string").alias("topic")]
    if "key" in messages.columns:
        cols.append(F.col("key").cast("binary").alias("key"))
    cols.append(F.col("value").cast("binary").alias("value"))
    if "partition" in messages.columns:
        cols.append(F.col("partition").cast("int").alias("partition"))
    return messages.select(*cols)


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector is not on the classpath — add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via spark.jars."
            "packages to enable the live Kafka sink (the encoded frame "
            "itself is broker-independent and fully oracle-verified)"
        )


def write_batch_kafka(messages: DataFrame, bootstrap_servers: str,
                      options: dict | None = None) -> None:
    """One-shot produce of a batch of encoded messages."""
    _require_kafka(messages.sparkSession)
    w = (
        to_kafka_frame(messages).write.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", bootstrap_servers)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save()


def stream_writer_kafka(messages: DataFrame, bootstrap_servers: str,
                        checkpoint_dir: str, options: dict | None = None):
    """Configured (not started) streaming writer for a streaming message
    frame — the caller owns trigger/start so it composes with the engine's
    foreachBatch drivers."""
    _require_kafka(messages.sparkSession)
    w = (
        to_kafka_frame(messages).writeStream.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    return w
