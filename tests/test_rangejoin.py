"""Bucketized range join: containment semantics, bucket independence, and
the no-nested-loop plan property."""

from pyspark.sql import functions as F

from ticdc_spark.operators.rangejoin import range_join


def _ev(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "event_id long")


def _iv(spark, rows):
    return spark.createDataFrame(rows, "iv long, lo long, hi long")


def _pairs(df):
    return sorted((r["event_id"], r["iv"]) for r in df.collect())


def test_range_join_containment_half_open(spark):
    ev = _ev(spark, [0, 5, 10, 15, 20])
    iv = _iv(spark, [(1, 0, 10), (2, 10, 20)])
    out = _pairs(range_join(ev, iv, ts_col="event_id", bucket=4))
    # lo inclusive, hi exclusive: 10 belongs to interval 2 only; 20 to none
    assert out == [(0, 1), (5, 1), (10, 2), (15, 2)]


def test_range_join_overlapping_intervals_multi_match(spark):
    ev = _ev(spark, [7])
    iv = _iv(spark, [(1, 0, 10), (2, 5, 15), (3, 8, 9)])
    out = _pairs(range_join(ev, iv, ts_col="event_id", bucket=3))
    assert out == [(7, 1), (7, 2)]


def test_range_join_result_independent_of_bucket_size(spark):
    ev = _ev(spark, list(range(0, 100, 7)))
    iv = _iv(spark, [(i, i * 9, i * 9 + 25) for i in range(10)])
    base = _pairs(range_join(ev, iv, ts_col="event_id", bucket=1))
    for b in (2, 5, 13, 64, 1000):
        assert _pairs(range_join(ev, iv, ts_col="event_id", bucket=b)) == base


def test_range_join_empty_and_degenerate_intervals(spark):
    ev = _ev(spark, [3])
    iv = _iv(spark, [(1, 3, 3), (2, 4, 2), (3, 3, 4)])
    out = _pairs(range_join(ev, iv, ts_col="event_id", bucket=10))
    assert out == [(3, 3)]  # hi <= lo matches nothing


def test_range_join_equi_keys_compose(spark):
    ev = spark.createDataFrame([(5, "a"), (5, "b")], "event_id long, k string")
    iv = spark.createDataFrame([(1, 0, 10, "a")], "iv long, lo long, hi long, k string")
    out = range_join(ev, iv, ts_col="event_id", bucket=4, by=["k"]).collect()
    assert [(r["event_id"], r["iv"], r["k"]) for r in out] == [(5, 1, "a")]


def test_range_join_plan_is_equi_join_never_nested_loop(spark):
    ev = _ev(spark, list(range(50)))
    iv = _iv(spark, [(i, i * 10, i * 10 + 30) for i in range(5)])
    plan = range_join(ev, iv, ts_col="event_id", bucket=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # a real equi-join node on the bucket key
