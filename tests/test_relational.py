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


def test_range_join_equals_naive_inequality(spark):
    """Metamorphic: bucketed range join == naive inequality join on a
    randomized frame (boundary timestamps included)."""
    import random
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 4), round(rng.uniform(0, 600), 3))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, k long, t double")
    from graphydb_spark.operators.relational import range_join
    left = df.select("id", "k", F.col("t").alias("lts"))
    right = df.select(F.col("id").alias("rid"), "k",
                      F.col("t").alias("rts"))
    got = {(r["id"], r["rid"])
           for r in range_join(left, right, on="k",
                               window_s=60.0).collect()}
    naive = left.join(right, "k").where(
        (F.col("rts") > F.col("lts")) & (F.col("rts") <= F.col("lts") + 60))
    want = {(r["id"], r["rid"]) for r in naive.collect()}
    assert got == want and got


def test_range_join_exact_boundaries(spark):
    left = spark.createDataFrame([(1, "u", 100.0)],
                                 "id long, k string, lts double")
    right = spark.createDataFrame(
        [(10, "u", 100.0), (11, "u", 100.5), (12, "u", 160.0),
         (13, "u", 160.0001), (14, "v", 101.0)],
        "rid long, k string, rts double")
    from graphydb_spark.operators.relational import range_join
    got = {r["rid"] for r in
           range_join(left, right, on="k", window_s=60.0).collect()}
    assert got == {11, 12}   # strict lower bound, inclusive upper, key-scoped


def test_salted_join_equals_plain_join(spark):
    """Metamorphic: salted join row-multiset == plain join (skewed key)."""
    from graphydb_spark.operators.relational import salted_join
    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(500)],
        "id long, k string")
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k10", 3), ("nope", 4)],
        "k string, v long")
    got = sorted((r["id"], r["k"], r["v"])
                 for r in salted_join(left, right, "k", salt=8).collect())
    want = sorted((r["id"], r["k"], r["v"])
                  for r in left.join(right, "k").collect())
    assert got == want and len(got) > 500


def test_cap_group_size_drops_only_oversized_groups(spark):
    """The quadratic-blowup guard: rows of groups larger than the cap
    disappear; every other row survives untouched."""
    from graphydb_spark.operators.relational import cap_group_size
    rows = ([("small", i) for i in range(3)]
            + [("big", i) for i in range(10)]
            + [("exact", i) for i in range(5)])
    df = spark.createDataFrame(rows, "g string, v int")
    out = cap_group_size(df, "g", 5)
    got = {(r["g"], r["v"]) for r in out.collect()}
    assert {g for g, _ in got} == {"small", "exact"}
    assert len(got) == 8


def _ts(s):
    import datetime
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_asof_directions_hand_checked(spark):
    """backward / forward / nearest on a fixture where every case
    differs: exact tie, closer-later, closer-earlier, no-earlier,
    no-later, empty key."""
    from graphydb_spark.operators.relational import asof_join
    left = spark.createDataFrame(
        [(1, "a", _ts(10)),   # right at 10 exists -> tie: all match 10
         (2, "a", _ts(14)),   # 10 (d4) vs 17 (d3): nearest=17, back=10
         (3, "a", _ts(5)),    # before first: back=null, fwd=10, nearest=10
         (4, "a", _ts(30)),   # after last: back=17, fwd=null, nearest=17
         (5, "b", _ts(10))],  # no right rows at all
        "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(10), 100), ("a", _ts(17), 170)],
        "k string, ts timestamp, rid long")

    def run(direction):
        out = asof_join(left, right, on="k", right_cols=("rid",),
                        direction=direction)
        return {r["event_id"]: r["rid_matched"] for r in out.collect()}

    assert run("backward") == {1: 100, 2: 100, 3: None, 4: 170, 5: None}
    assert run("forward") == {1: 100, 2: 170, 3: 100, 4: None, 5: None}
    # nearest: exact-distance tie (event 6 below) goes backward
    assert run("nearest") == {1: 100, 2: 170, 3: 100, 4: 170, 5: None}
    tie = spark.createDataFrame(
        [(6, "a", _ts(13))],   # 10 (d3) vs 17 (d4) -> backward
        "event_id long, k string, ts timestamp")
    out = asof_join(tie, right, on="k", right_cols=("rid",),
                    direction="nearest")
    assert out.collect()[0]["rid_matched"] == 100
    mid = spark.createDataFrame(
        [(7, "a", _ts(13) )],
        "event_id long, k string, ts timestamp")
    # equidistant: 13.5 is not representable with int seconds; use 13 vs
    # right at 9 and 17 -> d4 both -> tie -> backward
    right2 = spark.createDataFrame(
        [("a", _ts(9), 90), ("a", _ts(17), 170)],
        "k string, ts timestamp, rid long")
    out2 = asof_join(mid, right2, on="k", right_cols=("rid",),
                     direction="nearest")
    assert out2.collect()[0]["rid_matched"] == 90


def test_asof_nearest_string_timestamps(spark):
    """Regression: direction='nearest' must accept the string/date ts
    columns backward/forward already handle (distance goes through a
    timestamp cast, not a raw double cast)."""
    from graphydb_spark.operators.relational import asof_join
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:14")],
        "event_id long, k string, ts string")
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:00:10", 100),
         ("a", "2024-01-01 00:00:17", 170)],
        "k string, ts string, rid long")
    out = asof_join(left, right, on="k", right_cols=("rid",),
                    direction="nearest")
    assert out.collect()[0]["rid_matched"] == 170


def test_resample_locf_fills_gaps_and_elects_latest(spark):
    from graphydb_spark.operators.relational import resample_locf
    dt = datetime.datetime
    rows = [
        # user "a": two obs in hour 0 (election by ts then id), gap at
        # hour 1-2, obs at hour 3
        (1, "a", dt(2024, 1, 1, 0, 10), 10.0),
        (2, "a", dt(2024, 1, 1, 0, 50), 20.0),
        (3, "a", dt(2024, 1, 1, 3, 0), 30.0),
        # user "b": single observation → single grid row
        (4, "b", dt(2024, 1, 1, 5, 0), 99.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double")
    out = resample_locf(df, "user_id", "ts", "value",
                        unit="hour", tiebreak="event_id")
    got = {(r["user_id"], r["bucket_ts"].hour): (r["value"], r["filled"])
           for r in out.collect()}
    assert got == {
        ("a", 0): (20.0, False),   # latest-in-bucket election
        ("a", 1): (20.0, True),    # carried forward
        ("a", 2): (20.0, True),
        ("a", 3): (30.0, False),
        ("b", 5): (99.0, False),
    }


def test_resample_locf_tiebreak_on_equal_ts(spark):
    from graphydb_spark.operators.relational import resample_locf
    t = datetime.datetime(2024, 1, 1, 0, 30)
    df = spark.createDataFrame(
        [(1, "a", t, 1.0), (2, "a", t, 2.0)],
        "event_id long, user_id string, ts timestamp, value double")
    out = resample_locf(df, "user_id", "ts", "value",
                        unit="hour", tiebreak="event_id").collect()
    assert len(out) == 1 and out[0]["value"] == 2.0  # higher id wins


def test_transition_matrix_counts_and_probs(spark):
    from graphydb_spark.operators.relational import transition_matrix
    dt = datetime.datetime
    rows = [  # user a: v->c->v ; user b: v->c
        (1, "a", dt(2024, 1, 1, 0, 0), "view"),
        (2, "a", dt(2024, 1, 1, 0, 1), "click"),
        (3, "a", dt(2024, 1, 1, 0, 2), "view"),
        (4, "b", dt(2024, 1, 1, 0, 0), "view"),
        (5, "b", dt(2024, 1, 1, 0, 1), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, "
              "event_type string")
    got = {(r["state"], r["next_state"]): (r["cnt"], r["prob"])
           for r in transition_matrix(df, "user_id", "ts", "event_type",
                                      tiebreak="event_id").collect()}
    assert got == {("view", "click"): (2, 1.0),
                   ("click", "view"): (1, 1.0)}


def test_profile_columns_single_pass(spark):
    from graphydb_spark.operators.relational import profile_columns
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 5.5), (2, "b", 5.5)],
        "k long, s string, v double")
    got = {r["col_name"]: (r["n_nulls"], r["n_distinct"],
                           r["min_value"], r["max_value"])
           for r in profile_columns(df).collect()}
    assert got == {"k": (0, 2, "1", "2"),
                   "s": (1, 2, "a", "b"),
                   "v": (1, 1, "5.5", "5.5")}
    # all columns profile in ONE aggregate over the source (no
    # per-column re-scan): exactly one scan node in the plan
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("scan existingrdd") <= 1


def test_apply_cdc_semantics(spark):
    from graphydb_spark.operators.relational import apply_cdc
    snap = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k long, v double, s string")
    feed = spark.createDataFrame(
        [(2, 1, "D", None, None),          # delete 2
         (3, 1, "U", 31.0, "c1"),          # update 3 ...
         (3, 2, "U", 32.0, "c2"),          # ... seq 2 wins
         (4, 1, "I", 40.0, "d"),           # insert new key
         (5, 2, "D", None, None),          # insert-then-delete:
         (5, 1, "I", 50.0, "e")],          # net effect = absent
        "k long, seq int, op string, v double, s string")
    got = {r["k"]: (r["v"], r["s"])
           for r in apply_cdc(snap, feed, "k", "seq").collect()}
    assert got == {1: (10.0, "a"),         # untouched passes through
                   3: (32.0, "c2"),
                   4: (40.0, "d")}


def test_histogram_dense_bins_and_edge_rule(spark):
    from graphydb_spark.operators.relational import histogram
    df = spark.createDataFrame([(float(v),) for v in
                                [0, 1, 2, 5, 9, 10, 10]], "v double")
    got = {r["bin"]: (r["lo"], r["hi"], r["n"])
           for r in histogram(df, "v", bins=5).collect()}
    assert len(got) == 5                       # dense spine
    assert got[0] == (0.0, 2.0, 2)             # 0, 1
    assert got[1] == (2.0, 4.0, 1)             # 2
    assert got[2] == (4.0, 6.0, 1)             # 5
    assert got[3] == (6.0, 8.0, 0)             # empty bin present
    assert got[4] == (8.0, 10.0, 3)            # 9 + the two max values


def test_winsorize_clamps_tails(spark):
    from graphydb_spark.operators.relational import winsorize
    vals = [float(v) for v in range(1, 100)] + [10000.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "event_id long, value double")
    out = {r["event_id"]: r["value_winsorized"]
           for r in winsorize(df, "value").collect()}
    assert out[99] < 10000.0                   # outlier clamped
    assert out[50] == 51.0                     # body untouched
    assert max(out.values()) == out[99]


def test_interval_lookup_bands(spark):
    from graphydb_spark.operators.relational import interval_lookup
    ranges = spark.createDataFrame(
        [(0.0, 1.0, "a"), (1.0, 10.0, "b"), (50.0, 60.0, "c")],
        "lo double, hi double, band string")
    df = spark.createDataFrame(
        [(1, 0.5), (2, 1.0), (3, 9.99), (4, 20.0), (5, 55.0)],
        "event_id long, value double")
    got = {r["event_id"]: r["band"]
           for r in interval_lookup(df, ranges, "value",
                                    key_cols=["event_id"]).collect()}
    assert got == {1: "a", 2: "b",        # half-open: 1.0 -> band b
                   3: "b", 4: None,       # gap keeps nulls
                   5: "c"}                # wide-band bucket explode works


def test_interval_lookup_empty_ranges(spark):
    from graphydb_spark.operators.relational import interval_lookup
    ranges = spark.createDataFrame([], "lo double, hi double, band string")
    df = spark.createDataFrame([(1, 5.0)], "event_id long, value double")
    out = interval_lookup(df, ranges, "value",
                          key_cols=["event_id"]).collect()
    assert len(out) == 1 and out[0]["band"] is None
