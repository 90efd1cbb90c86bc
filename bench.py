"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline = full CDC engine replay throughput (events/sec) of a synthetic
transcript binlog scaled to the sf dir, plus per-query timings for the
operator inventory at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ticdc_spark.session import get_spark

# queries benchmarked individually (a representative slice; the full
# inventory runs in the correctness gate)
BENCH_QUERIES = [
    "lww_final_state",
    "total_order_rank",
    "safe_mode_split",
    "txn_assembly",
    "global_frontier",
    "mount_decode_props",
    "schema_asof_version",
    "stream_window_counts",
    "doc_exact_dedup",
    "doc_minhash_bands",
    "doc_neardup_pairs",
    "doc_simhash16",
    "emb_cosine_topk",
    "emb_neardup_pairs",
]


def bench_engine_replay(spark, n_events: int, n_convs: int, block: int) -> dict:
    """Full pipeline: generate → resolved-bounded micro-batches →
    pandas-UDF mount → LWW dedup → MERGE into the lake table."""
    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
    from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig

    spec = BinlogSpec(n_events=n_events, n_convs=n_convs, n_turns=16, block=block,
                      n_partitions=8)
    work = tempfile.mkdtemp(prefix="ticdc_bench_")
    try:
        binlog = gen_binlog(spark, spec)
        resolved = gen_resolved_log(spark, spec)
        cf = Changefeed(
            spark, binlog, resolved, None, LakeTable(spark, os.path.join(work, "t")),
            ChangefeedConfig(changefeed_id="bench", n_buckets=32),
        )
        t0 = time.time()
        stats = cf.run()
        dt = time.time() - t0
        return {"events": stats["events"], "sec": dt, "events_per_sec": stats["events"] / dt,
                "merges": stats["merges"]}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.01  # non-sfN dir name: assume small-scale
    spark = get_spark("ticdc-bench", cores=cpus, shuffle_partitions=cpus)

    from ticdc_spark.queries import QUERIES

    timings = {}
    total = 0.0

    # headline: engine replay scaled to sf (sf0.1 → 2M events)
    n_events = max(int(20_000_000 * sf), 100_000)
    r = bench_engine_replay(spark, n_events=n_events, n_convs=max(n_events // 50, 100),
                            block=max(n_events // 10, 10_000))
    timings["cdc_engine_replay"] = round(r["sec"], 3)
    total += r["sec"]

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        _ = n

    out = {
        "metric": "cdc_replay_plus_operator_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "engine_replay_events": r["events"],
        "engine_replay_events_per_sec": round(r["events_per_sec"], 1),
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
