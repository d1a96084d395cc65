"""asof_join edge semantics: backward-inclusive match, NULL before the
first right row, key isolation, and plan shape (single exchange, no range
join)."""

import datetime as dt

from pyspark.sql import functions as F

from tsprofiler_spark.operators.asof import asof_join

T0 = dt.datetime(2025, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", 1, _ts(0)),    # before any right row -> NULL
            ("a", 2, _ts(5)),    # exactly on a right ts -> inclusive match
            ("a", 3, _ts(7)),    # between rights -> latest before
            ("a", 4, _ts(99)),   # far after the last right -> last right
            ("b", 5, _ts(6)),    # other key: only sees its own rights
        ],
        "k string, turn int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(5), 50.0),
            ("a", _ts(6), 60.0),
            ("b", _ts(1), 10.0),
        ],
        "k string, bucket_start timestamp, v double",
    )
    out = {
        r.turn: r.v_asof
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out == {1: None, 2: 50.0, 3: 60.0, 4: 60.0, 5: 10.0}


def test_asof_plan_is_window_shaped(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.col("id").alias("turn"),
        (F.lit(T0) + F.make_interval(mins=F.col("id").cast("int"))).alias("ts"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).cast("string").alias("k"),
        (F.lit(T0) + F.make_interval(mins=(F.col("id") * 3).cast("int"))).alias("bucket_start"),
        F.rand(1).alias("v"),
    )
    df = asof_join(left, right, on=["k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # union-window form: no join node at all, let alone a range/cartesian one
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") - plan.count("ReusedExchange") <= 1
    assert df.count() == 100
