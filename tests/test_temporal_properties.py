"""Property-based differential tests (hypothesis) for the temporal
operators: random event streams vs brute-force Python models of the
same semantics — the reference's own randomized-differential test
strategy (SURVEY.md §5) applied to the beyond-parity surface."""

#: full-tier only (round 10 tiering): property/fuzz suite, not part
#: of the driver-window default run
pytestmark = __import__("pytest").mark.slowtier

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphydb_spark.operators.relational import (resample_locf,
                                                 transition_matrix)

BASE = datetime.datetime(2024, 1, 1)


events = st.lists(
    st.tuples(st.integers(0, 2),            # key
              st.integers(0, 30),           # offset hours*4 (15-min grid)
              st.integers(0, 9)),           # value/state selector
    min_size=1, max_size=25)


def _rows(ev):
    return [(i, f"k{k}", BASE + datetime.timedelta(minutes=15 * q), float(v))
            for i, (k, q, v) in enumerate(ev)]


def _locf_model(rows):
    """Brute-force LOCF on the driver."""
    per_key = {}
    for eid, k, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        per_key.setdefault(k, {})
        cur = per_key[k].get(b)
        # election: latest (ts, event_id) wins
        if cur is None or (ts, eid) > cur[0]:
            per_key[k][b] = ((ts, eid), v)
    out = {}
    for k, buckets in per_key.items():
        lo, hi = min(buckets), max(buckets)
        t, last = lo, None
        while t <= hi:
            if t in buckets:
                last = buckets[t][1]
                out[(k, t)] = (last, False)
            else:
                out[(k, t)] = (last, True)
            t += datetime.timedelta(hours=1)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ev=events)
def test_resample_locf_matches_bruteforce(spark, ev):
    rows = _rows(ev)
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double")
    got = {(r["user_id"], r["bucket_ts"]): (r["value"], r["filled"])
           for r in resample_locf(df, "user_id", "ts", "value",
                                  unit="hour",
                                  tiebreak="event_id").collect()}
    assert got == _locf_model(rows)


def _transition_model(rows):
    per_key = {}
    for eid, k, ts, v in rows:
        per_key.setdefault(k, []).append(((ts, eid), str(v)))
    counts = {}
    for seq in per_key.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals = {}
    for (a, _), c in counts.items():
        totals[a] = totals.get(a, 0) + c
    return {k: (c, round(c / totals[k[0]], 6))
            for k, c in counts.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ev=events)
def test_transition_matrix_matches_bruteforce(spark, ev):
    rows = [(i, k, ts, str(int(v))) for i, k, ts, v in _rows(ev)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, "
              "event_type string")
    got = {(r["state"], r["next_state"]): (r["cnt"], r["prob"])
           for r in transition_matrix(df, "user_id", "ts", "event_type",
                                      tiebreak="event_id").collect()}
    assert got == _transition_model(
        [(i, k, ts, int(v)) for i, k, ts, v in rows])


changes_feed = st.lists(
    st.tuples(st.integers(0, 6),             # key
              st.integers(1, 5),             # seq
              st.sampled_from(["I", "U", "D"]),
              st.integers(0, 99)),           # payload value
    min_size=0, max_size=20, unique_by=lambda t: (t[0], t[1]))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(feed=changes_feed)
def test_apply_cdc_matches_bruteforce(spark, feed):
    from graphydb_spark.operators.relational import apply_cdc
    snap_rows = [(k, float(k * 10)) for k in range(4)]   # keys 0-3 exist
    snap = spark.createDataFrame(snap_rows, "k long, v double")
    if feed:
        chg = spark.createDataFrame(
            [(k, s, op, float(v)) for k, s, op, v in feed],
            "k long, seq int, op string, v double")
    else:
        chg = spark.createDataFrame([], "k long, seq int, op string, "
                                        "v double")
    got = {r["k"]: r["v"] for r in apply_cdc(snap, chg, "k", "seq")
           .collect()}
    # brute force: highest-seq change per key wins
    want = {k: v for k, v in snap_rows}
    latest = {}
    for k, s, op, v in feed:
        if k not in latest or s > latest[k][0]:
            latest[k] = (s, op, float(v))
    for k, (_, op, v) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


range_tables = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 10)),  # lo, width
    min_size=1, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=range_tables,
       vals=st.lists(st.integers(-5, 60), min_size=1, max_size=15))
def test_interval_lookup_matches_bruteforce(spark, raw, vals):
    from graphydb_spark.operators.relational import interval_lookup
    # make ranges non-overlapping by laying them end to end
    ranges, cur = [], 0
    for lo_off, width in raw:
        lo = cur + lo_off
        ranges.append((float(lo), float(lo + width), f"b{len(ranges)}"))
        cur = lo + width
    rdf = spark.createDataFrame(ranges, "lo double, hi double, band string")
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "event_id long, value double")
    got = {r["event_id"]: r["band"]
           for r in interval_lookup(df, rdf, "value",
                                    key_cols=["event_id"]).collect()}
    want = {}
    for i, v in enumerate(vals):
        want[i] = None
        for lo, hi, b in ranges:
            if lo <= v < hi:
                want[i] = b
                break
    assert got == want
