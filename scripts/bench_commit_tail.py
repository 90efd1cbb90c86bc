"""Commit-tail scaling evidence: per-window wall time vs TABLE COUNT.

The reference targets 100k tables per node
(docs/design/2022-03-16-ticdc-db-sorter.md:177-181). The round-3 engine ran
a homogeneous window as ONE Spark job but then did O(N tables) serial
driver work per window (N manifest rewrites + renames + sidecar appends).
Round 4 replaces that with ONE feed-journal append per window and
amortized group folds (ticdc_spark/sinks/journal.py).

This bench holds TOTAL event volume constant and sweeps the table count
(same WAL bytes, same windows, same dedup shuffle — the only variable is
per-table overhead). Done-criterion: per-window wall time near-flat in N.

Prints one JSON line. Run: python scripts/bench_commit_tail.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ticdc_spark.session import get_spark
from ticdc_spark.sinks.lake import LakeTable
from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
from ticdc_spark.streaming.multi import MultiTableChangefeed
from ticdc_spark.streaming.pipeline import ChangefeedConfig

TOTAL_EVENTS = int(os.environ.get("CT_EVENTS", "500000"))
COUNTS = [int(x) for x in os.environ.get("CT_TABLES", "8,64,256").split(",")]


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("ct-bench", cores=cpus, shuffle_partitions=cpus)
    spec = BinlogSpec(n_events=TOTAL_EVENTS, n_convs=TOTAL_EVENTS // 50,
                      n_turns=16, block=TOTAL_EVENTS // 8, n_partitions=4)
    work = tempfile.mkdtemp(prefix="ticdc_ct_bench_")
    try:
        base = gen_binlog(spark, spec)
        resolved = gen_resolved_log(spark, spec)
        wal_path = os.path.join(work, "wal")
        # one physical WAL; the table split is a pure column so every sweep
        # point reads identical bytes
        base.write.parquet(wal_path)
        wal = spark.read.parquet(wal_path)

        # warm JVM/codegen so the first sweep point isn't penalized
        MultiTableChangefeed(
            spark, wal.withColumn("table_name", F.lit("w0")), resolved, None,
            table_factory=lambda t: LakeTable(spark, os.path.join(work, "warm", t)),
            config=ChangefeedConfig(changefeed_id="warm", n_buckets=4,
                                    compact_every=10**9),
            tables=["w0"],
        ).run()

        results = {}
        for n in COUNTS:
            tables = [f"t{i:04d}" for i in range(n)]
            binlog = wal.withColumn(
                "table_name",
                F.concat(F.lit("t"), F.lpad(
                    F.pmod(F.xxhash64("conv_id"), F.lit(n)).cast("string"), 4, "0")),
            )
            tag = f"n{n}"
            t0 = time.time()
            mt = MultiTableChangefeed(
                spark, binlog, resolved, None,
                table_factory=lambda t, tag=tag: LakeTable(
                    spark, os.path.join(work, tag, t)),
                config=ChangefeedConfig(changefeed_id=tag, n_buckets=4,
                                        compact_every=10**9),
                tables=tables,
            )
            s = mt.run()
            wall = time.time() - t0
            assert s["events"] == TOTAL_EVENTS, s
            results[n] = {
                "tables": n,
                "wall_sec": round(wall, 2),
                "windows": s["windows"],
                "sec_per_window": round(wall / max(s["windows"], 1), 3),
            }
        base_spw = results[COUNTS[0]]["sec_per_window"]
        print(json.dumps({
            "events_total": TOTAL_EVENTS,
            "cpus": cpus,
            "sweep": list(results.values()),
            "per_window_flatness": {
                str(n): round(results[n]["sec_per_window"] / base_spw, 2)
                for n in COUNTS
            },
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
