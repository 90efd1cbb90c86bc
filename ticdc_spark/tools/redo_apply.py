"""Disaster-recovery replay — the redo-apply analog.

The reference ships a standalone tool that replays the redo log into a
sink to recover a changefeed after a disaster (`cdc redo apply
--sink-uri ...`, /root/reference/pkg/cmd/redo/apply.go,
/root/reference/pkg/applier/redo.go). SURVEY §2 (W4) argues the durable
source WAL replaces the redo log in this engine — every committed window
is reproducible from the WAL + resolved log alone — so the DR tool here
replays the WAL itself:

- **rebuild**: point it at a FRESH target directory and it reconstructs
  the changefeed state up to ``--until`` (default: the source's global
  frontier). Replaying to the crashed target's checkpoint provably
  reproduces its table bit-for-bit (pytest: tests/test_redo_apply.py).
- **resume-style apply**: point it at a RESTORED backup of the target
  (consistent at its manifest checkpoint) and it replays only
  ``(checkpoint, until]`` — the exactly-once recognition built into every
  sink entry point makes the overlap a no-op, exactly as the reference's
  applier relies on sink idempotency (applier/redo.go consistent-ts
  gating).

Usage::

    python -m ticdc_spark.tools.redo_apply \
        --wal /path/wal.parquet --resolved /path/resolved.parquet \
        --ddl /path/ddl.json --target /path/rebuilt_table \
        [--until TS] [--changefeed-id cf-dr] [--sink-mode mor|cow]

``--ddl`` is a JSON list of DDL rows (the engine's ddl_log schema); omit
it for DDL-free feeds.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cap(binlog, resolved_log, ddl_log, until):
    """Cap the replay frontier: events and resolved steps above the bound
    do not exist for this apply (the [checkpoint, resolved] window of the
    reference tool)."""
    binlog = binlog.filter(F.col("commit_ts") <= int(until))
    resolved_log = resolved_log.filter(F.col("resolved_ts") <= int(until))
    if isinstance(ddl_log, list):
        ddl_log = [d for d in ddl_log if int(d["commit_ts"]) <= int(until)]
    elif ddl_log is not None:
        ddl_log = ddl_log.filter(F.col("commit_ts") <= int(until))
    return binlog, resolved_log, ddl_log


def redo_apply(
    spark: SparkSession,
    binlog: DataFrame,
    resolved_log: DataFrame,
    ddl_log,
    target_path: str,
    config=None,
    until: int | None = None,
) -> dict:
    """Replay the WAL into ``target_path`` up to resolved-ts ``until``
    (None = everything currently resolved). The target may be fresh (full
    rebuild) or a restored copy (idempotent catch-up from its own
    checkpoint). Returns the run stats; the caller can compare
    ``LakeTable(spark, target_path).read()`` against the original."""
    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.streaming.pipeline import Changefeed, ChangefeedConfig

    config = config or ChangefeedConfig(changefeed_id="cf-dr")
    if until is not None:
        binlog, resolved_log, ddl_log = _cap(binlog, resolved_log, ddl_log, until)
    cf = Changefeed(
        spark, binlog, resolved_log, ddl_log,
        LakeTable(spark, target_path), config,
    )
    return cf.run()


def redo_apply_multi(
    spark: SparkSession,
    binlog: DataFrame,
    resolved_log: DataFrame,
    ddl_log,
    target_root: str,
    tables: list | None = None,
    config=None,
    until: int | None = None,
    table_col: str = "table_name",
) -> dict:
    """Fleet disaster recovery: rebuild EVERY table of a multi-table feed
    under ``target_root`` (one subdirectory per table) by replaying the
    shared WAL through the single-pass driver — same semantics as
    :func:`redo_apply`, N tables at a time, including lifecycle DDL
    (create/drop/rename/exchange replay exactly as the original feed
    applied them)."""
    from ticdc_spark.sinks.lake import LakeTable
    from ticdc_spark.streaming.multi import MultiTableChangefeed
    from ticdc_spark.streaming.pipeline import ChangefeedConfig
    import os

    config = config or ChangefeedConfig(changefeed_id="cf-dr")
    if until is not None:
        binlog, resolved_log, ddl_log = _cap(binlog, resolved_log, ddl_log, until)
    mt = MultiTableChangefeed(
        spark, binlog, resolved_log, ddl_log,
        table_factory=lambda t: LakeTable(spark, os.path.join(target_root, t)),
        config=config,
        tables=tables,
        table_col=table_col,
    )
    return mt.run()


def main(argv=None) -> int:
    from ticdc_spark.session import get_spark
    from ticdc_spark.streaming.pipeline import ChangefeedConfig

    ap = argparse.ArgumentParser(
        description="Rebuild a changefeed target by replaying the source WAL "
                    "(disaster-recovery twin of `cdc redo apply`)")
    ap.add_argument("--wal", required=True, help="binlog parquet dir")
    ap.add_argument("--resolved", required=True, help="resolved-log parquet dir")
    ap.add_argument("--ddl", help="JSON file: list of ddl_log rows")
    ap.add_argument("--target", required=True, help="lake table dir to (re)build")
    ap.add_argument("--until", type=int, help="replay bound (resolved-ts); "
                                              "default: everything resolved")
    ap.add_argument("--changefeed-id", default="cf-dr")
    ap.add_argument("--sink-mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--multi", action="store_true",
                    help="fleet mode: the WAL carries table_name and "
                         "--target is the ROOT (one subdir per table)")
    args = ap.parse_args(argv)

    spark = get_spark(f"redo-apply-{args.changefeed_id}")
    ddl_rows = None
    if args.ddl:
        with open(args.ddl) as f:
            ddl_rows = json.load(f)
    cfg = ChangefeedConfig(changefeed_id=args.changefeed_id,
                           sink_mode=args.sink_mode,
                           n_buckets=args.n_buckets)
    fn = redo_apply_multi if args.multi else redo_apply
    stats = fn(
        spark,
        spark.read.parquet(args.wal),
        spark.read.parquet(args.resolved),
        ddl_rows,
        args.target,
        config=cfg,
        until=args.until,
    )
    print(json.dumps({"target": args.target, **{k: stats[k] for k in
                      ("merges", "events", "checkpoint") if k in stats}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
