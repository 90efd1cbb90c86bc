"""Evidence that the MOR read path costs O(delta), not O(table).

Builds a bucketed lake table with a large base and a small (1%) delta,
then times three plans over identical data:

  1. delta-scoped read (the engine's read(): broadcast delta-key anti/semi
     join, LWW only over contested keys)       -> ~base-scan cost
  2. base-only read after compaction           -> the floor (pure scan)
  3. full-base LWW (the round-1 plan: groupBy over base ∪ delta,
     shuffling EVERY base row)                 -> the O(table) anti-pattern

Prints one JSON line. Run standalone: python scripts/bench_mor_read.py
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

N_BASE = int(os.environ.get("MOR_BASE_ROWS", "2000000"))
DELTA_FRAC = float(os.environ.get("MOR_DELTA_FRAC", "0.01"))
KEY = ["conv_id", "turn_idx"]
FIELDS = [("conv_id", "string"), ("turn_idx", "int"), ("text", "string")]


def mk_rows(spark, n, commit_base, text_tag):
    return spark.range(n).select(
        F.format_string("conv-%08d", (F.col("id") / 16).cast("long")).alias("conv_id"),
        (F.col("id") % 16).cast("int").alias("turn_idx"),
        F.format_string(f"{text_tag}-%d", F.col("id")).alias("text"),
        F.lit("I").alias("op"),
        (F.lit(commit_base) + F.col("id")).alias("_commit_ts"),
        (F.lit(commit_base) - 1 + F.col("id")).alias("_start_ts"),
        F.lit(3).cast("int").alias("_op_rank"),
        F.lit(0).cast("int").alias("_deleted"),
    )


def timed(df):
    df.count()  # warm: codegen JIT + shuffle-service setup out of the timing
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("mor-read-bench", cores=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="mor_read_bench_")
    try:
        t = LakeTable(spark, os.path.join(work, "t"))
        # bucketed delta layout: this bench measures the read-side trade
        # (the ingest-side cost of the layout is measured in the replay
        # probe — see BENCH/OPERATORS.md; the engine default is flat)
        t.create(key=KEY, fields=FIELDS, n_buckets=32, with_order_cols=True,
                 delta_layout="bucketed")
        t.append_delta(mk_rows(spark, N_BASE, 1_000, "base"), "seed")
        t.compact(drop_tombstones=True)  # establish the bucketed base

        n_delta = int(N_BASE * DELTA_FRAC)
        # delta updates a 1% slice of existing keys with newer commit-ts
        t.append_delta(
            mk_rows(spark, n_delta, 10_000_000, "upd"), "delta1"
        )

        base_only_after = None
        sec_scoped, n1 = timed(t.read())  # delta-scoped (engine plan)

        # the round-1 anti-pattern, reconstructed: LWW over base ∪ delta
        m = t.manifest()
        files = []
        for info in m["buckets"].values():
            files.extend(info["files"])
        for d in m["deltas"]:
            files.extend(d["files"])
        allrows = spark.read.parquet(*files)
        ordc = F.struct("_commit_ts", "_start_ts", "_op_rank")
        payload = [c for c in allrows.columns if c not in KEY]
        full = (
            allrows.groupBy(*KEY)
            .agg(F.max_by(F.struct(*payload), ordc).alias("_w"))
            .select(*KEY, *[F.col(f"_w.{c}").alias(c) for c in payload])
            .filter(F.col("_deleted") != 1)
        )
        sec_full, n2 = timed(full)

        t.compact(drop_tombstones=True)
        sec_base, n3 = timed(t.read())
        base_only_after = sec_base

        # ---- single-bucket point read between compactions: bucketed delta
        # layout (file-level pruning) vs the legacy unbucketed layout
        # (scan ALL deltas, re-derive the bucket) ----
        for i in range(8):
            t.append_delta(mk_rows(spark, n_delta, 20_000_000 + i * n_delta, f"u{i}"),
                           f"delta-b{i}")
        sec_bucketed, nb = timed(t.read(buckets=[5]))
        t_legacy = LakeTable(spark, os.path.join(work, "t"))
        _orig = t_legacy.manifest

        def _legacy_manifest(version=None):
            m = _orig(version)
            for d in m.get("deltas", []):
                d.pop("buckets", None)
            return m

        t_legacy.manifest = _legacy_manifest
        sec_legacy, nl = timed(t_legacy.read(buckets=[5]))
        assert nb == nl, (nb, nl)

        assert n1 == n2 == n3, (n1, n2, n3)
        print(json.dumps({
            "base_rows": N_BASE,
            "delta_rows": n_delta,
            "read_delta_scoped_sec": round(sec_scoped, 2),
            "read_full_lww_sec": round(sec_full, 2),
            "read_base_only_sec": round(base_only_after, 2),
            "delta_scoped_overhead_vs_pure_scan": round(sec_scoped / base_only_after, 2),
            "full_lww_overhead_vs_pure_scan": round(sec_full / base_only_after, 2),
            "single_bucket_read_bucketed_delta_sec": round(sec_bucketed, 2),
            "single_bucket_read_legacy_delta_sec": round(sec_legacy, 2),
            "bucketed_delta_speedup": round(sec_legacy / max(sec_bucketed, 1e-9), 2),
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
