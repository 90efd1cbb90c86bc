"""Watermarked tumbling-window counts: append-mode finalization + late-data
drop, checked against the batch twin."""

import datetime as dt
import os

from pyspark.sql import functions as F

from ticdc_spark.streaming.windowed import windowed_counts_batch, windowed_counts_stream

SCHEMA = "user_id long, ts timestamp, event_id long"
BASE = dt.datetime(2024, 1, 1)


def _t(minutes, seconds=0):
    return BASE + dt.timedelta(minutes=minutes, seconds=seconds)


def test_windowed_stream_finalizes_and_drops_late(spark, tmp_path):
    wave1 = [
        (1, _t(1), 0), (1, _t(4), 1),          # window [0,10)
        (2, _t(12), 2),                          # window [10,20)
        (1, _t(55), 3),                          # advances watermark to 25
    ]
    wave2 = [
        (1, _t(58), 4),                          # window [50,60)
        (2, _t(3), 5),                           # LATE: 3 min << watermark 25 -> dropped
        (1, _t(120), 6),                         # advances watermark to 90: finalizes <=90
    ]
    ev = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(ev)
    for i, wave in enumerate([wave1, wave2]):
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.parquet(f"{ev}/w{i}")
        windowed_counts_stream(
            spark, f"{ev}/w*", SCHEMA, out, ck,
            ts_col="ts", window="10 minutes", watermark="30 minutes",
        )
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # finalized windows: [0,10) and [10,20) after wave1's watermark? no —
    # append emits once watermark (max_ts - 30min) passes window END:
    # wave1 watermark = 25 -> [0,10) and [10,20) finalize; wave2 watermark
    # = 90 -> [50,60) finalizes. [120,130) stays open (never emitted).
    want_batch = windowed_counts_batch(
        spark.createDataFrame(wave1 + [wave2[0], wave2[2]], SCHEMA),
        ts_col="ts", window="10 minutes",
    )
    want = {
        (r["window_start"], r["n_events"])
        for r in want_batch.collect()
        if r["window_end"] <= _t(90)
    }
    assert got == want, f"\ngot={sorted(got)}\nwant={sorted(want)}"
    # the late event (ts=3min, behind the 25-min watermark) left no trace:
    # window [0,10) counts 2, not 3
    counts = {r["window_start"].minute: r["n_events"]
              for r in spark.read.parquet(out).collect()
              if r["window_start"] < _t(10)}
    assert counts == {0: 2}
