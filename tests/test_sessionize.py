"""Gap-based sessionization: the applyInPandasWithState streaming operator
must produce exactly the batch window-function answer, with state (open
session count/start) carried across micro-batches."""

import os

from ticdc_spark.streaming.sessionize import read_sessions, sessionize_batch, sessionize_stream

SCHEMA = "user_id long, ts long, event_id long"
GAP = 100


def _events(spark):
    """3 users; sessions engineered to SPAN batch boundaries (batch = one
    file, split at event 6/12)."""
    rows = []
    eid = 0
    for u in range(3):
        t = 1000 + u
        for s in range(4):           # 4 sessions per user
            for i in range(3 + u):   # 3..5 events per session
                rows.append((u, t, eid)); eid += 1
                t += 10               # intra-session gap 10 <= GAP
            t += GAP + 50             # inter-session gap > GAP
    return rows


def test_stream_equals_batch(spark, tmp_path):
    rows = sorted(_events(spark), key=lambda r: r[1])  # global ts order
    chunks = [rows[0:12], rows[12:24], rows[24:]]
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    out_dir = str(tmp_path / "sessions")
    # files land in event-time order — the stream contract
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            f"{events_dir}/part{i}", mode="overwrite"
        )
        sessionize_stream(
            spark, f"{events_dir}/part*", SCHEMA, out_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            key_col="user_id", ts_col="ts", gap_seconds=GAP,
        )
    got = read_sessions(spark, out_dir).orderBy("user_id", "session_idx")
    want = sessionize_batch(
        spark.createDataFrame(rows, SCHEMA), key_col="user_id",
        ts_col="ts", gap_seconds=GAP,
    ).orderBy("user_id", "session_idx")
    g = [tuple(r) for r in got.collect()]
    w = [tuple(r) for r in want.collect()]
    assert g == w, f"\ngot={g}\nwant={w}"
    # sanity: sessions really did span batches (an update log > final set)
    assert spark.read.parquet(out_dir).count() > len(w) - 1


def test_batch_sessionize_gap_law(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (1, 50, 1), (1, 151, 2), (1, 200, 3), (2, 0, 4)],
        SCHEMA,
    )
    s = {(r["user_id"], r["session_idx"]): (r["n_events"], r["session_start"], r["session_end"])
         for r in sessionize_batch(df, ts_col="ts", gap_seconds=100).collect()}
    assert s[(1, 1)] == (2, 0, 50)      # 0,50 in one session
    assert s[(1, 2)] == (2, 151, 200)   # 151 starts a new one (gap 101)
    assert s[(2, 1)] == (1, 0, 0)


def test_stream_equals_batch_subsecond_timestamps(spark, tmp_path):
    """Sub-second gaps near the threshold (e.g. 1800.05s) must land on the
    SAME side of the gap rule in both twins — the stream kernel tracks
    microseconds, not floored seconds — and streamed session bounds keep
    sub-second precision."""
    import datetime as dt

    TS_SCHEMA = "user_id long, ts timestamp, event_id long"
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 0),
        (1, base + dt.timedelta(seconds=1799, microseconds=950_000), 1),  # in
        (1, base + dt.timedelta(seconds=3600, microseconds=50_000), 2),   # out: 1800.1s
        (1, base + dt.timedelta(seconds=3600, microseconds=123_456), 3),  # in
    ]
    events_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    os.makedirs(events_dir)
    for i, chunk in enumerate([rows[:2], rows[2:]]):
        spark.createDataFrame(chunk, TS_SCHEMA).coalesce(1).write.parquet(
            f"{events_dir}/p{i}", mode="overwrite"
        )
        sessionize_stream(
            spark, f"{events_dir}/p*", TS_SCHEMA, out_dir,
            checkpoint_dir=str(tmp_path / "ck"), ts_col="ts", gap_seconds=1800,
        )
    got = [tuple(r) for r in read_sessions(spark, out_dir)
           .orderBy("user_id", "session_idx").collect()]
    want = [tuple(r) for r in sessionize_batch(
        spark.createDataFrame(rows, TS_SCHEMA), ts_col="ts", gap_seconds=1800)
        .orderBy("user_id", "session_idx").collect()]
    assert got == want, f"\ngot={got}\nwant={want}"
    # two sessions; bounds keep microsecond precision
    assert len(got) == 2
    assert got[1][3].microsecond == 50_000 and got[1][4].microsecond == 123_456
