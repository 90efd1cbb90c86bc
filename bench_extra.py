"""Round-6 profiling harness. bench.py is FROZEN for measurement; every
extra measurement (noop-sink isolation per guide §1.4, min-of-N repeats,
per-query loadavg brackets, engine-replay phase breakdown, plan capture)
lives here and is cited from OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py queries  [sf_dir] [repeats] [q1 q2 ...]
  python bench_extra.py replay   [n_events] [mor|cow]
  python bench_extra.py explain  <out_dir> [sf_dir] [q1 q2 ...]
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


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("ticdc-bench-extra", cores=cpus, shuffle_partitions=cpus)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(argv):
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    repeats = int(argv[1]) if len(argv) > 1 else 3
    names = argv[2:]
    spark = _spark()
    from ticdc_spark.queries import QUERIES

    if not names:
        from bench import BENCH_QUERIES

        names = BENCH_QUERIES
    out = {}
    for name in names:
        fn = QUERIES[name]
        samples = []
        la0 = os.getloadavg()[0]
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bx:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()  # same action as the frozen bench
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples,
                     "loadavg": [round(la0, 2), round(os.getloadavg()[0], 2)]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


def cmd_replay(argv):
    """Engine-replay phase breakdown at a given event count (bench shape:
    MOR, empty table -> bootstrap span). Times each stage with the noop
    sink so the computation is isolated from the real sink write."""
    n_events = int(argv[0]) if argv else 4_000_000
    sink_mode = argv[1] if len(argv) > 1 else "mor"
    spark = _spark()
    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog, gen_resolved_log
    from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig

    spec = BinlogSpec(n_events=n_events, n_convs=max(n_events // 50, 100),
                      n_turns=16, block=max(n_events // 10, 20_000),
                      n_partitions=8)
    work = tempfile.mkdtemp(prefix="ticdc_bx_")
    phases = {}
    try:
        t0 = time.time()
        wal = os.path.join(work, "wal")
        gen_binlog(spark, spec).write.parquet(wal)
        phases["gen_wal_untimed"] = round(time.time() - t0, 3)
        binlog = spark.read.parquet(wal)

        from pyspark.sql import functions as F

        from ticdc_spark.functions.mount import mount
        from ticdc_spark.operators.sortdedup import lww_dedup, with_op_rank
        from ticdc_spark.plans.schema_registry import SchemaRegistry

        reg = SchemaRegistry()

        def _phase(name, df, repeats=2):
            times = []
            for _ in range(repeats):
                spark.sparkContext.setJobDescription(f"bx:replay-{name}")
                t0 = time.time()
                _noop(df)
                times.append(round(time.time() - t0, 3))
            phases[name] = times

        prepared = with_op_rank(binlog).drop("pre_payload", "op")
        # A: scan + prepare (filters/splits/op-rank) — the zero-shuffle floor
        _phase("scan_prepare_noop", prepared)
        # B: pure payload shuffle, no aggregate — isolates exchange bytes
        _phase("shuffle_only_noop",
               prepared.repartition(int(spark.conf.get(
                   "spark.sql.shuffle.partitions")), "conv_id", "turn_idx"))
        # C: + LWW dedup (the one exchange + sort-agg of the engine)
        _phase("dedup_noop", lww_dedup(prepared, stats=True))
        # D: + mount
        _phase("dedup_mount_noop",
               mount(lww_dedup(prepared, stats=True), reg, spec.max_commit_ts))

        # phase D: the full engine run (real sink)
        spark.sparkContext.setJobDescription("bx:replay-full")
        cf = Changefeed(
            spark, binlog, gen_resolved_log(spark, spec), None,
            LakeTable(spark, os.path.join(work, "t")),
            ChangefeedConfig(changefeed_id=f"bx-{sink_mode}", n_buckets=32,
                             sink_mode=sink_mode, compact_every=8),
        )
        t0 = time.time()
        stats = cf.run()
        phases["full_run"] = round(time.time() - t0, 3)
        phases["events"] = stats["events"]
        phases["events_per_sec"] = round(stats["events"] / phases["full_run"], 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    phases["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps({"n_events": n_events, "sink_mode": sink_mode,
                      "phases": phases}))


def cmd_multi(argv):
    """Fleet replay at driver-bench shape (bench.py:104) with parametrized
    table count / events per table, reporting wall time and write jobs."""
    n_tables = int(argv[0]) if argv else 8
    events_per_table = int(argv[1]) if len(argv) > 1 else 2_500_000
    spark = _spark()
    from bench import bench_multi_table_replay

    la0 = os.getloadavg()[0]
    r = bench_multi_table_replay(spark, n_tables, events_per_table)
    r["loadavg"] = [round(la0, 2), round(os.getloadavg()[0], 2)]
    print(json.dumps(r))


def cmd_explain(argv):
    out_dir = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    names = argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    spark = _spark()
    from ticdc_spark.queries import QUERIES

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    {"queries": cmd_queries, "replay": cmd_replay, "multi": cmd_multi,
     "explain": cmd_explain}[cmd](sys.argv[2:])
