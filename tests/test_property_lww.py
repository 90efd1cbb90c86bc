"""Hypothesis property tests for the order law and batching invariance.

Mirrors the reference's randomized sorter tests
(cdc/puller/memorysorter/entry_sorter_test.go:28 TestEntrySorterRandomly,
:184 TestEventLess): for ANY event multiset and ANY batching into
resolved windows, the engine's final state equals the one-shot batch LWW.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ticdc_spark.operators.sortdedup import OP_RANK, lww_dedup, with_op_rank

COLS = "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, payload string"


def _events_strategy():
    event = st.tuples(
        st.integers(min_value=1, max_value=30),     # commit_ts
        st.integers(min_value=0, max_value=5),      # start offset
        st.sampled_from(["I", "U", "D"]),
        st.sampled_from(["a", "b", "c"]),           # conv_id
        st.integers(min_value=0, max_value=1),      # turn_idx
    )
    return st.lists(event, min_size=1, max_size=40)


def _dedupe_order_ties(raw):
    """One txn never writes the same row twice at one (commit, start, op)."""
    seen, out = set(), []
    for i, (c, so, op, conv, turn) in enumerate(raw):
        k = (conv, turn, c, c - 1 - so, op)
        if k in seen:
            continue
        seen.add(k)
        out.append((c, c - 1 - so, op, conv, turn, f"p{i}"))
    return out


def _py_lww(rows):
    best = {}
    for c, s, op, conv, turn, payload in rows:
        k = (conv, turn)
        o = (c, s, OP_RANK[op])
        if k not in best or o > best[k][0]:
            best[k] = (o, (c, s, op, payload))
    return {k: v[1] for k, v in best.items()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events_strategy())
def test_lww_matches_model(spark, raw):
    rows = _dedupe_order_ties(raw)
    df = with_op_rank(spark.createDataFrame(rows, COLS))
    got = {
        (r["conv_id"], r["turn_idx"]): (r["commit_ts"], r["start_ts"], r["op"], r["payload"])
        for r in lww_dedup(df, ["conv_id", "turn_idx"]).collect()
    }
    assert got == _py_lww(rows)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events_strategy(), st.integers(min_value=1, max_value=4))
def test_windowed_lww_equals_global(spark, raw, n_windows):
    """Resolved-window batching invariance: LWW per commit-ts window, then
    LWW across window winners == one-shot LWW over everything. This is the
    algebraic property the micro-batch MERGE relies on."""
    rows = _dedupe_order_ties(raw)
    if not rows:
        return
    lo, hi = 0, max(r[0] for r in rows)
    step = max(1, (hi - lo) // n_windows + 1)
    winners = []
    for w0 in range(lo, hi + 1, step):
        batch = [r for r in rows if w0 < r[0] <= w0 + step]
        if batch:
            winners.extend(_py_lww(batch).items())
    refold = {}
    for k, (c, s, op, payload) in winners:
        o = (c, s, OP_RANK[op])
        if k not in refold or o > refold[k][0]:
            refold[k] = (o, (c, s, op, payload))
    assert {k: v[1] for k, v in refold.items()} == _py_lww(rows)
