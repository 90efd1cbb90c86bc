"""Order-law and LWW tests, mirroring the reference's randomized sorter
property tests (cdc/puller/memorysorter/entry_sorter_test.go:28,127 and the
event-order law cdc/model/mounter.go:115-140 / TestEventLess)."""

import random

from pyspark.sql import functions as F

from ticdc_spark.operators.skew import detect_heavy_keys, salted_two_phase_lww
from ticdc_spark.operators.sortdedup import assemble_txns, lww_dedup, split_updates, with_op_rank
from ticdc_spark.sources.binlog_gen import BinlogSpec, gen_binlog

COLS = "commit_ts long, start_ts long, op string, conv_id string, turn_idx int, payload string, pre_payload string"


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _py_lww(rows):
    """Reference implementation of the order law in plain Python."""
    rank = {"D": 1, "U": 2, "I": 3}
    best = {}
    for r in rows:
        k = (r[3], r[4])
        o = (r[0], r[1], rank[r[2]])
        if k not in best or o > best[k][0]:
            best[k] = (o, r)
    return {k: v[1] for k, v in best.items()}


def test_lww_dedup_matches_python_oracle_randomized(spark):
    rnd = random.Random(7)
    rows, seen = [], set()
    for i in range(3_000):
        conv = f"c{rnd.randrange(20)}"
        turn = rnd.randrange(4)
        commit = rnd.randrange(50)  # heavy ties on commit_ts
        start = commit - rnd.randrange(1, 4)
        op = rnd.choice(["I", "U", "D"])
        # a real txn never modifies the same row twice at the same
        # (commit_ts, start_ts): full order-key ties per key can't occur
        if (conv, turn, commit, start, op) in seen:
            continue
        seen.add((conv, turn, commit, start, op))
        rows.append((commit, start, op, conv, turn, f"p{i}", None))
    rnd.shuffle(rows)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["commit_ts"], r["start_ts"], r["op"], r["payload"])
        for r in lww_dedup(with_op_rank(_df(spark, rows))).collect()
    }
    want = {k: (v[0], v[1], v[2], v[5]) for k, v in _py_lww(rows).items()}
    assert got == want


def test_tie_break_delete_update_insert(spark):
    # same (commit_ts, start_ts): insert wins over update wins over delete
    rows = [
        (10, 9, "D", "c1", 0, "del", None),
        (10, 9, "I", "c1", 0, "ins", None),
        (10, 9, "U", "c1", 0, "upd", None),
        (10, 9, "D", "c2", 0, "del", None),
        (10, 9, "U", "c2", 0, "upd", None),
    ]
    got = {(r["conv_id"]): r["payload"] for r in lww_dedup(with_op_rank(_df(spark, rows))).collect()}
    assert got == {"c1": "ins", "c2": "upd"}


def test_salted_two_phase_equivalent(spark):
    spec = BinlogSpec(n_events=5_000, n_convs=5, n_turns=2, hot_frac=0.8)
    df = with_op_rank(gen_binlog(spark, spec))
    a = {tuple(r) for r in lww_dedup(df).collect()}
    b = {tuple(r) for r in salted_two_phase_lww(df, ["conv_id", "turn_idx"]).collect()}
    assert a == b


def test_split_updates_safe_mode(spark):
    rows = [
        (5, 4, "U", "c1", 0, "new5", "old5"),   # <= replicating_ts → split
        (20, 19, "U", "c1", 1, "new20", "old20"),  # after → kept
        (6, 5, "I", "c1", 2, "i6", None),
    ]
    out = split_updates(_df(spark, rows), replicating_ts=10).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r["conv_id"], r["turn_idx"]), []).append((r["op"], r["payload"]))
    assert sorted(by_key[("c1", 0)]) == [("D", "old5"), ("I", "new5")]
    assert by_key[("c1", 1)] == [("U", "new20")]
    assert by_key[("c1", 2)] == [("I", "i6")]


def test_txn_assembly(spark):
    rows = [
        (10, 8, "I", "c1", 0, "a", None),
        (10, 8, "U", "c1", 1, "b", None),
        (10, 8, "D", "c1", 2, None, "c"),
        (12, 11, "I", "c2", 0, "d", None),
    ]
    got = {(r["start_ts"], r["commit_ts"]): (r["n_rows"], r["n_insert"], r["n_update"], r["n_delete"])
           for r in assemble_txns(_df(spark, rows)).collect()}
    assert got == {(8, 10): (3, 1, 1, 1), (11, 12): (1, 1, 0, 0)}


def test_detect_heavy_keys(spark):
    spec = BinlogSpec(n_events=4_000, n_convs=100, hot_frac=0.5, n_hot=2)
    heavy = detect_heavy_keys(gen_binlog(spark, spec), ["conv_id"], threshold=400)
    names = {r["conv_id"] for r in heavy.collect()}
    assert 1 <= len(names) <= 3  # the hot convs and nothing else


def test_salted_join_equals_plain_join(spark):
    """Salting must be invisible in the result: planted 100x skew on one
    key, salted join == plain join row-for-row, inner and left."""
    from pyspark.sql import functions as F

    from ticdc_spark.operators.skew import detect_heavy_keys, salted_join

    fact = spark.range(1200).select(
        F.when(F.col("id") < 1000, F.lit(7)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(40).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"),
    )
    heavy = detect_heavy_keys(fact, ["k"], threshold=100)
    assert [r["k"] for r in heavy.collect()] == [7]
    for how in ("inner", "left"):
        got = sorted(
            salted_join(fact, dim, ["k"], heavy, n_salts=4, how=how).collect(),
            key=lambda r: (r["k"], r["v"]),
        )
        want = sorted(fact.join(dim, ["k"], how).collect(),
                      key=lambda r: (r["k"], r["v"]))
        assert got == want


def test_salted_join_spreads_hot_key(spark):
    """The hot key's fact rows must actually land on multiple salts (the
    whole point); cold keys stay on salt 0 and are never replicated."""
    from pyspark.sql import functions as F

    from ticdc_spark.operators.skew import detect_heavy_keys, salted_join

    fact = spark.range(1000).select(F.lit(1).cast("long").alias("k"),
                                    F.col("id").alias("v"))
    dim = spark.range(2).select(F.col("id").cast("long").alias("k"),
                                F.lit("x").alias("name"))
    heavy = detect_heavy_keys(fact, ["k"], threshold=10)
    out = salted_join(fact, dim, ["k"], heavy, n_salts=8)
    assert out.count() == 1000  # dim replication adds no output rows
