"""Changefeed management surface — the API/owner analog.

The reference exposes changefeed lifecycle over an HTTP v2 API backed by
etcd state and an elected owner (create/pause/resume/remove/list:
/root/reference/cdc/api/v2/changefeed.go; the state machine:
/root/reference/cdc/model/changefeed.go:83-146 — normal/stopped/failed/
finished; owner election: /root/reference/cdc/capture/capture.go:443).
In the Spark-first design the driver IS the owner (no election — Spark
already gives the driver singleton semantics), so what remains is the
management OBJECT: durable feed registry + state machine + tick loop.

``ChangefeedManager`` provides exactly that, programmatically:

- ``create(feed_id, ...)`` registers a feed (state ``normal``) in a JSON
  registry under the manager root — a restarted manager lists the same
  feeds with the same states (the etcd-durability analog; the feeds' DATA
  positions live in their own lake manifests, which already resume
  exactly-once, so the registry holds only control-plane state).
- ``pause`` / ``resume`` flip ``normal`` <-> ``stopped`` with the same
  legality rules as the reference state machine (only a running feed can
  pause; stopped OR failed feeds can resume — resume clears the error).
- ``tick()`` advances every ``normal`` (or retrying ``warning``) feed by
  one driver round (bounded by ``max_merges_per_tick`` so one feed cannot
  starve the rest — the owner-tick fairness analog); a feed whose run
  raises enters ``warning`` and is RETRIED on subsequent ticks (the
  feedStateManager backoff analog — changefeed_error /
  kafka_sink_error_resume integration tests) until ``max_retries``
  consecutive errors, after which it is ``failed`` hard; other feeds keep
  going either way. A successful run clears the error and the counter.
- ``remove(feed_id)`` forgets the feed (replicated data retained, as the
  reference's removal semantics).
- ``list()`` returns each feed's state, checkpoint and error.

The data-plane wiring (WAL slice, resolved log, DDL, target factory) is
supplied by the caller at create/attach time; the registry persists only
identifiers + config facts the caller echoes back at attach, never
DataFrames.
"""

from __future__ import annotations

import json
import os
import time
import uuid

STATES = ("normal", "warning", "stopped", "failed", "finished")


class ChangefeedManager:
    def __init__(self, root: str, max_retries: int = 3):
        self.root = root
        # consecutive run() errors a feed may accumulate before the owner
        # stops retrying and fails it hard (feedStateManager's retry
        # budget; cdc/owner/feed_state_manager.go)
        self.max_retries = max_retries
        os.makedirs(root, exist_ok=True)
        self.registry_path = os.path.join(root, "changefeeds.json")
        self._feeds: dict = {}      # feed_id -> control-plane record
        self._engines: dict = {}    # feed_id -> attached engine (Changefeed/MultiTableChangefeed)
        if os.path.exists(self.registry_path):
            with open(self.registry_path) as f:
                self._feeds = json.load(f)

    # ---------------- durability ----------------

    def _save(self) -> None:
        tmp = self.registry_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(self._feeds, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.registry_path)

    # ---------------- lifecycle (changefeed.go:83-146 legality) ----------------

    def create(self, feed_id: str, engine=None, note: str | None = None) -> dict:
        """Register a feed in state ``normal``. ``engine`` (optional here,
        required before tick) is any object with ``run(max_merges...)`` and
        a checkpoint: a ``Changefeed`` or ``MultiTableChangefeed``."""
        if feed_id in self._feeds:
            raise ValueError(f"changefeed {feed_id!r} already exists")
        rec = {"state": "normal", "created_at": time.time(), "error": None,
               "note": note, "checkpoint_ts": 0, "consecutive_errors": 0}
        self._feeds[feed_id] = rec
        self._save()
        if engine is not None:
            self._engines[feed_id] = engine
        return dict(rec)

    def attach(self, feed_id: str, engine) -> None:
        """Re-bind the data-plane engine after a manager restart (the
        registry survives; DataFrames do not)."""
        if feed_id not in self._feeds:
            raise KeyError(feed_id)
        self._engines[feed_id] = engine

    def pause(self, feed_id: str) -> None:
        rec = self._feeds[feed_id]
        if rec["state"] not in ("normal", "warning"):
            raise ValueError(
                f"cannot pause changefeed in state {rec['state']!r} "
                "(only a running feed pauses — changefeed.go state rules)")
        rec["state"] = "stopped"
        self._save()

    def resume(self, feed_id: str) -> None:
        rec = self._feeds[feed_id]
        if rec["state"] not in ("stopped", "failed"):
            raise ValueError(
                f"cannot resume changefeed in state {rec['state']!r}")
        rec["state"] = "normal"
        rec["error"] = None
        rec["consecutive_errors"] = 0
        self._save()

    def remove(self, feed_id: str) -> None:
        """Forget the feed (replicated data retained, like the reference)."""
        self._feeds.pop(feed_id, None)
        self._engines.pop(feed_id, None)
        self._save()

    def list(self) -> list:
        out = []
        for fid in sorted(self._feeds):
            rec = dict(self._feeds[fid])
            rec["changefeed_id"] = fid
            rec["attached"] = fid in self._engines
            out.append(rec)
        return out

    def state(self, feed_id: str) -> str:
        return self._feeds[feed_id]["state"]

    # ---------------- the owner tick ----------------

    def _engine_checkpoint(self, engine) -> int:
        ck = getattr(engine, "checkpoint", None)
        if callable(ck):  # MultiTableChangefeed
            return int(ck())
        tgt = getattr(engine, "target", None)
        if tgt is not None and tgt.exists():
            return int(tgt.checkpoint["resolved_ts"])
        return 0

    def tick(self, max_merges_per_tick: int | None = None) -> dict:
        """One owner round: advance every ``normal`` attached feed.
        ``max_merges_per_tick`` bounds each feed's work so one backlogged
        feed cannot starve the rest (owner-tick fairness). A feed whose
        run raises is marked ``failed`` (error recorded, visible in
        list()); the tick continues with the remaining feeds. A feed that
        reaches its source frontier with nothing left to do reports
        synced=True in the result."""
        results: dict = {}
        for fid in sorted(self._feeds):
            if self._feeds[fid]["state"] not in ("normal", "warning"):
                continue
            engine = self._engines.get(fid)
            if engine is None:
                results[fid] = {"skipped": "not attached"}
                continue
            try:
                if max_merges_per_tick is None:
                    stats = engine.run()
                else:
                    # dispatch by SIGNATURE, not by probing with TypeError —
                    # a TypeError raised inside run() must surface as the
                    # feed's real error, not trigger a blind re-run
                    import inspect

                    try:
                        params = inspect.signature(engine.run).parameters
                    except (TypeError, ValueError):
                        params = {}
                    if "max_merges_per_table" in params:
                        stats = engine.run(
                            max_merges_per_table=max_merges_per_tick)
                    else:
                        stats = engine.run(max_merges_per_tick)
                ckpt = self._engine_checkpoint(engine)
                self._feeds[fid]["checkpoint_ts"] = ckpt
                if self._feeds[fid]["state"] == "warning":
                    # recovered: the error was transient (sink_retry /
                    # kafka_sink_error_resume posture)
                    self._feeds[fid]["state"] = "normal"
                    self._feeds[fid]["error"] = None
                self._feeds[fid]["consecutive_errors"] = 0
                synced = getattr(engine, "is_synced", None)
                finished = bool(getattr(engine, "is_finished", False))
                if finished:
                    # terminal state (changefeed.go: finished feeds never
                    # pause/resume and are skipped by subsequent ticks)
                    self._feeds[fid]["state"] = "finished"
                results[fid] = {
                    "merges": stats.get("merges", 0),
                    "events": stats.get("events", 0),
                    "checkpoint_ts": ckpt,
                    "synced": bool(synced()) if callable(synced) else None,
                    "finished": finished,
                }
            except Exception as e:  # noqa: BLE001 — feed isolation is the point
                rec = self._feeds[fid]
                rec["consecutive_errors"] = rec.get("consecutive_errors", 0) + 1
                rec["error"] = f"{type(e).__name__}: {e}"
                if rec["consecutive_errors"] >= self.max_retries:
                    # retry budget exhausted: fail hard (terminal until an
                    # operator resumes it)
                    rec["state"] = "failed"
                    results[fid] = {"failed": str(e)}
                else:
                    # transient-error posture: keep retrying on later ticks
                    rec["state"] = "warning"
                    results[fid] = {"retrying": str(e),
                                    "attempt": rec["consecutive_errors"]}
        self._save()
        return results

    def run_until_synced(self, max_ticks: int = 100,
                         max_merges_per_tick: int | None = None) -> int:
        """Tick until every normal feed is synced (or max_ticks). Returns
        the tick count."""
        for i in range(max_ticks):
            res = self.tick(max_merges_per_tick)
            live = [r for r in res.values()
                    if "failed" not in r and "skipped" not in r]
            if all("retrying" not in r and r.get("synced") in (True, None)
                   and r.get("merges", 0) == 0 for r in live) or not live:
                return i + 1
        return max_ticks
