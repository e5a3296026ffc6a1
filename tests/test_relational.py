"""As-of join + top-k-per-group operator semantics on hand-built frames
(the oracle suite covers them against DuckDB at fixture scale)."""

import datetime

from pyspark.sql import functions as F

from graphydb_spark.operators.relational import asof_join, topk_per_group


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(5))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(10), 100), ("u", _ts(15), 101)],
        "user_id string, ts timestamp, view_id long")
    out = {r["event_id"]: r["view_id_matched"]
           for r in asof_join(left, right, on="user_id",
                              right_cols=("view_id",)).collect()}
    assert out == {1: 100,   # equal ts matches (inclusive)
                   2: 101,   # latest earlier row wins
                   3: None}  # nothing at-or-before → null


def test_asof_multiple_keys_isolated(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "b", _ts(10))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(1), 7)], "user_id string, ts timestamp, view_id long")
    out = {r["event_id"]: r["view_id_matched"]
           for r in asof_join(left, right, on="user_id",
                              right_cols=("view_id",)).collect()}
    assert out == {1: 7, 2: None}


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i, float(i)) for i in range(5)] + [("g2", 9, 1.0)],
        "k string, id long, v double")
    out = topk_per_group(df, ["k"], [F.col("v").desc(), F.col("id")], k=2)
    rows = {(r["k"], r["id"], r["rn"]) for r in out.collect()}
    assert rows == {("g1", 4, 1), ("g1", 3, 2), ("g2", 9, 1)}
