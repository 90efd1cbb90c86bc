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
    "emb_rp_lsh",
    "emb_ivf_topk",
    "emb_neardup_pairs",
    "user_sessions",
    "mq_csv_encode",
    "key_change_split",
    "doc_global_shuffle",
    "doc_line_dedup",
    "doc_bpe_encode",
    "salted_skew_join",
    "event_asof_enrich",
    "doc_chunk",
    "emb_semdedup",
    "doc_substring_dedup",
    "doc_lm_score",
    "tr_preference_pairs",
    "emb_pq_topk",
    "tr_context_fit",
    "tr_tool_call_audit",
    "tr_loss_mask",
    "doc_mixture_plan",
    "emb_ivfpq_topk",
    "tr_turn_dedup",
    "doc_corpus_rollup",
    "doc_tfidf_topk",
    "event_range_join",
    "doc_length_quantiles",
    "conv_neardup",
    "cdc_lake_changelog",
]


def bench_engine_replay(spark, n_events: int, n_convs: int, block: int,
                        sink_mode: str = "mor") -> dict:
    """Full pipeline: generate → resolved-bounded micro-batches →
    LWW dedup → pandas-UDF mount → exactly-once sink commit.
    sink_mode 'mor' (append deltas + compaction — the production ingest
    path) or 'cow' (rewrite affected buckets per batch)."""
    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
    from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig

    spec = BinlogSpec(n_events=n_events, n_convs=n_convs, n_turns=16, block=block,
                      n_partitions=8)
    work = tempfile.mkdtemp(prefix="ticdc_bench_")
    try:
        # materialize the WAL once (untimed) — the replay reads a real log
        # with commit_ts pushdown, as it would in production
        wal = os.path.join(work, "wal")
        gen_binlog(spark, spec).write.parquet(wal)
        binlog = spark.read.parquet(wal)
        resolved = gen_resolved_log(spark, spec)
        cf = Changefeed(
            spark, binlog, resolved, None, LakeTable(spark, os.path.join(work, "t")),
            ChangefeedConfig(changefeed_id=f"bench-{sink_mode}", n_buckets=32,
                             sink_mode=sink_mode, compact_every=8),
        )
        t0 = time.time()
        stats = cf.run()
        dt = time.time() - t0
        return {"events": stats["events"], "sec": dt, "events_per_sec": stats["events"] / dt,
                "merges": stats["merges"]}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_multi_table_replay(spark, n_tables: int, events_per_table: int) -> dict:
    """Fleet replay: N tables through ONE MultiTableChangefeed — per window
    one WAL scan + one dedup exchange + one write job + one journal append
    for all tables (the single-pass commit tail, streaming/multi.py)."""
    from dataclasses import replace as _dc_replace

    from pyspark.sql import functions as F

    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
    from ticdc_spark.streaming.multi import MultiTableChangefeed
    from ticdc_spark.streaming.pipeline import ChangefeedConfig

    spec = BinlogSpec(n_events=events_per_table,
                      n_convs=max(events_per_table // 50, 100), n_turns=16,
                      block=max(events_per_table // 4, 20_000), n_partitions=8)
    work = tempfile.mkdtemp(prefix="ticdc_bench_mt_")
    try:
        parts = [
            gen_binlog(spark, _dc_replace(spec, seed=100 + i))
            .withColumn("table_name", F.lit(f"tbl_{i}"))
            for i in range(n_tables)
        ]
        wal_df = parts[0]
        for p in parts[1:]:
            wal_df = wal_df.unionByName(p)
        wal = os.path.join(work, "wal")
        wal_df.write.parquet(wal)
        mt = MultiTableChangefeed(
            spark, spark.read.parquet(wal), gen_resolved_log(spark, spec), None,
            table_factory=lambda t: LakeTable(spark, os.path.join(work, t)),
            config=ChangefeedConfig(changefeed_id="bench-mt", n_buckets=32),
            tables=[f"tbl_{i}" for i in range(n_tables)],
        )
        t0 = time.time()
        stats = mt.run()
        dt = time.time() - t0
        return {"events": stats["events"], "sec": dt, "tables": n_tables,
                "events_per_sec": stats["events"] / dt,
                "write_jobs": stats.get("write_jobs", 0),
                "windows": stats["windows"]}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_pipeline_blackhole(spark, n_events: int) -> dict:
    """K6 blackhole-sink analog: generate → dedup → mount, no sink — pure
    pipeline throughput (the reference benchmarks its pipeline the same way,
    /root/reference/cdc/sink/dmlsink/blackhole/)."""
    from ticdc_spark.functions.mount import mount
    from ticdc_spark.operators.sortdedup import lww_dedup, with_op_rank
    from ticdc_spark.plans.schema_registry import SchemaRegistry
    from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog

    spec = BinlogSpec(n_events=n_events, n_convs=max(n_events // 50, 100), n_turns=16,
                      block=max(n_events // 10, 20_000), n_partitions=8)
    reg = SchemaRegistry()
    t0 = time.time()
    out = mount(lww_dedup(with_op_rank(gen_binlog(spark, spec)), stats=False),
                reg, spec.max_commit_ts)
    n = out.count()
    dt = time.time() - t0
    return {"rows": n, "sec": dt, "events_per_sec": n_events / dt}


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

    # headline: engine replay scaled to sf (sf0.1 → 4M events, MOR ingest).
    # loadavg before/after makes a host-contention outlier self-evident in
    # the recorded numbers (the r2 headline was one).
    load_pre = os.getloadavg()[0]
    n_events = max(int(40_000_000 * sf), 200_000)
    r = bench_engine_replay(spark, n_events=n_events, n_convs=max(n_events // 50, 100),
                            block=max(n_events // 10, 20_000), sink_mode="mor")
    load_post = os.getloadavg()[0]
    timings["cdc_engine_replay"] = round(r["sec"], 3)
    total += r["sec"]
    # CoW MERGE comparison at quarter size
    r_cow = bench_engine_replay(spark, n_events=n_events // 4,
                                n_convs=max(n_events // 200, 100),
                                block=max(n_events // 40, 20_000), sink_mode="cow")
    timings["cdc_engine_replay_cow"] = round(r_cow["sec"], 3)
    total += r_cow["sec"]
    # fleet replay: 8 tables through the single-pass multi feed at half the
    # single-table volume (per-table volume = n_events/16)
    r_mt = bench_multi_table_replay(spark, n_tables=8,
                                    events_per_table=max(n_events // 16, 25_000))
    timings["cdc_engine_replay_multi"] = round(r_mt["sec"], 3)
    total += r_mt["sec"]
    r_bh = bench_pipeline_blackhole(spark, n_events)
    timings["cdc_pipeline_blackhole"] = round(r_bh["sec"], 3)
    total += r_bh["sec"]

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
        "multi_table_replay": {
            "tables": r_mt["tables"], "events": r_mt["events"],
            "events_per_sec": round(r_mt["events_per_sec"], 1),
            "windows": r_mt["windows"], "write_jobs": r_mt["write_jobs"],
        },
        "blackhole_events_per_sec": round(r_bh["events_per_sec"], 1),
        "cpus": cpus,
        "loadavg_pre": round(load_pre, 2),
        "loadavg_post": round(load_post, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
