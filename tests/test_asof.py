"""General as-of join: point-in-time enrichment semantics + plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from ticdc_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), 1),   # exactly at v1 -> inclusive
            ("u1", _ts("2024-01-01 05:00:00"), 2),   # between v1 and v2
            ("u1", _ts("2024-01-02 00:00:00"), 3),   # after v2
            ("u2", _ts("2024-01-01 00:30:00"), 4),   # u2 has one version
            ("u3", _ts("2024-01-05 00:00:00"), 5),   # u3 has NO version
            ("u1", _ts("2023-12-31 00:00:00"), 6),   # before any version
        ],
        ["uid", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), "v1"),
            ("u1", _ts("2024-01-01 12:00:00"), "v2"),
            ("u2", _ts("2024-01-01 00:00:00"), "w1"),
        ],
        ["uid", "vts", "tag"],
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    got = {r["eid"]: r["tag"]
           for r in asof_join(left, right, by="uid", left_ts="ts").collect()}
    assert got == {1: "v1", 2: "v1", 3: "v2", 4: "w1", 5: None, 6: None}


def test_asof_join_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    got = asof_join(left, right, by="uid", left_ts="ts", how="inner")
    assert sorted(r["eid"] for r in got.collect()) == [1, 2, 3, 4]


def test_asof_join_keeps_left_schema_plus_payload(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, by="uid", left_ts="ts")
    assert out.columns == ["uid", "ts", "eid", "vts", "tag"]
    assert out.count() == left.count()  # left join never multiplies rows


def test_asof_join_plan_has_no_join_node(spark):
    """The scale property: union + window, NOT a range join — the plan
    must contain exactly one exchange and no join operator at all."""
    left, right = _frames(spark)
    plan = asof_join(left, right, by="uid", left_ts="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1
