"""SparkSession factory tuned for the CDC pipeline.

Local-mode testing stands in for a multi-executor cluster; every knob here
is one that transfers (AQE, shuffle partitions sized to cores, Arrow on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ticdc_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession.

    cores=None → local[*]. Shuffle partitions default to the core count:
    the pipeline's shuffles (dedup agg, merge write) are sized per
    micro-batch, not per 200-partition default.
    """
    # make the package importable in executor python workers regardless of
    # the driver's launch directory (closures may reference repo modules)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(":"):
        os.environ["PYTHONPATH"] = f"{repo_root}:{pp}" if pp else repo_root

    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or os.cpu_count() or 8

    # Pin GC/JIT thread counts: the JVM defaults them to ncpus, and on
    # shared/virtualized kernels a 32-thread parallel GC degenerates into a
    # futex storm (measured here: a pure-CPU job ran 3-5x slower at
    # local[32] until GC threads were pinned). Harmless on real hardware.
    # Overridable per-run for experiments without touching code.
    java_opts = os.environ.get(
        "TICDC_SPARK_JAVA_OPTS",
        "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2 -XX:CICompilerCount=2",
    )

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("TICDC_SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
