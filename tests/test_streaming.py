"""Structured Streaming smoke tests (memory sink, processAllAvailable) +
batch/stream equivalence for the windowed aggregations."""

import pytest
from pyspark.sql import functions as F

from graphydb_spark.streaming.windows import (sessionize,
                                              stream_tumbling_counts,
                                              tumbling_counts)


@pytest.fixture(scope="module")
def events(spark):
    from graphydb_spark.sources.tpch_graph import load_tables
    return load_tables(spark, "/root/testdata/sf0.001")["events"]


def test_tumbling_counts_batch(events):
    out = tumbling_counts(events, "1 hour")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == events.count()


def test_sessionize_batch(events):
    out = sessionize(events, gap_minutes=30)
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    assert all(r["n_sessions"] >= 1 for r in rows)


def test_stream_tumbling_equals_batch(spark, events, tmp_path):
    """The streaming twin over the same rows produces the same counts —
    append-mode with watermark closes all windows once data is exhausted
    except the final one, so compare on complete mode."""
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    agg = (spark.readStream.format("parquet").schema(schema).load(src)
           .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
           .agg(F.count("*").alias("n"))
           .select(F.col("w.start").alias("wstart"), "event_type", "n"))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("t_stream_win").start())
    try:
        q.processAllAvailable()
        got = {(r["wstart"], r["event_type"]): r["n"]
               for r in spark.sql("SELECT * FROM t_stream_win").collect()}
    finally:
        q.stop()
    want = {(r["wstart"], r["event_type"]): r["n"]
            for r in tumbling_counts(events, "1 hour").collect()}
    assert got == want


def test_stream_helper_builds(spark, events, tmp_path):
    src = str(tmp_path / "events_stream2")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    agg = stream_tumbling_counts(spark, src, schema)
    assert agg.isStreaming


def test_stream_graph_upserts_merge(spark, tmp_path):
    """Streaming upsert ingest: two files with overlapping uids — the
    store must end with latest-mtime-wins per uid."""
    import json as _json
    from graphydb_spark.graph import NODE_SCHEMA
    from graphydb_spark.streaming.windows import stream_graph_upserts

    src = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    batch1 = [("u1", "Person", 0.0, 1.0, _json.dumps({"name": "old"})),
              ("u2", "Person", 0.0, 1.0, _json.dumps({"name": "two"}))]
    batch2 = [("u1", "Person", 0.0, 2.0, _json.dumps({"name": "new"})),
              ("u3", "Person", 0.0, 1.0, _json.dumps({"name": "three"}))]
    spark.createDataFrame(batch1 + batch2, NODE_SCHEMA) \
        .write.mode("overwrite").parquet(src)
    q = stream_graph_upserts(spark, src, store)
    q.awaitTermination(120)
    out = {r["uid"]: r for r in spark.read.parquet(f"{store}/nodes").collect()}
    assert set(out) == {"u1", "u2", "u3"}
    assert out["u1"]["mtime"] == 2.0
    assert _json.loads(out["u1"]["props"])["name"] == "new"


def test_stateful_sessionize_equals_batch(spark, events, tmp_path):
    """applyInPandasWithState sessionizer over one micro-batch must agree
    with the batch lag+cumsum sessionizer on final per-user totals."""
    from graphydb_spark.streaming.windows import stream_sessionize_stateful
    src = str(tmp_path / "events_state")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = stream_sessionize_stateful(spark, src, schema, gap_minutes=30)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("t_state_sess").start())
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM t_state_sess").collect()
    finally:
        q.stop()
    # latest emitted row per user = final totals
    got = {}
    for r in rows:
        got[r["user_id"]] = (r["n_sessions"], r["n_events"])
    want = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in sessionize(events, gap_minutes=30).collect()}
    assert got == want


def test_stream_interval_join_equals_batch(spark, events, tmp_path):
    """Watermarked stream-stream interval join over the same rows must
    produce exactly the batch interval join's pairs (append mode; with
    availableNow exhausted input, every in-band pair is emitted)."""
    from graphydb_spark.streaming.windows import (interval_join,
                                                  stream_interval_join)
    src = str(tmp_path / "ev_join")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    joined = stream_interval_join(spark, src, src, schema,
                                  lower_s=1, upper_s=120)
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("t_stream_ij").start())
    try:
        q.processAllAvailable()
        got = {(r["user_id"], r["left_id"], r["right_id"])
               for r in spark.sql("SELECT * FROM t_stream_ij").collect()}
    finally:
        q.stop()
    want = {(r["user_id"], r["left_id"], r["right_id"])
            for r in interval_join(events, events,
                                   lower_s=1, upper_s=120).collect()}
    assert got == want and len(want) > 0


def test_stream_dedup_within_watermark(spark, events, tmp_path):
    """dropDuplicatesWithinWatermark over a doubled input keeps one row
    per key — equal to batch dropDuplicates on the same keys."""
    from graphydb_spark.streaming.windows import stream_dedup
    src = str(tmp_path / "ev_dup")
    doubled = events.unionByName(events)
    doubled.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    dd = stream_dedup(spark, src, schema, keys=["event_id"],
                      watermark="1 hour")
    q = (dd.writeStream.outputMode("append").format("memory")
         .queryName("t_stream_dd").start())
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT COUNT(*) AS n FROM t_stream_dd").first()["n"]
        n_ids = spark.sql(
            "SELECT COUNT(DISTINCT event_id) AS n FROM t_stream_dd"
        ).first()["n"]
    finally:
        q.stop()
    assert n == n_ids == events.select("event_id").distinct().count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data handling: with a 10-minute watermark, an event arriving
    (in a later micro-batch) 2 hours behind the advanced watermark must
    NOT reopen its closed window in append mode."""
    import datetime as dt
    src = str(tmp_path / "late_events")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, event_type string"
    rows1 = [(i, base + dt.timedelta(minutes=i), "a") for i in range(60)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    agg = (spark.readStream.format("parquet").schema(
               spark.read.parquet(src).schema)
           .option("maxFilesPerTrigger", "1").load(src)
           .withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "30 minutes").alias("w"))
           .agg(F.count("*").alias("n"))
           .select(F.col("w.start").alias("wstart"), "n"))
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("t_late").start())
    try:
        q.processAllAvailable()
        # second batch: one on-time event (advances watermark past all
        # old windows) and one 2-hours-late event for the FIRST window
        rows2 = [(100, base + dt.timedelta(minutes=180), "a"),
                 (101, base + dt.timedelta(minutes=5), "a")]
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r["wstart"]: r["n"]
               for r in spark.sql("SELECT * FROM t_late").collect()}
    finally:
        q.stop()
    # first window emitted exactly its on-time count — the late event
    # neither reopened it nor produced a second row for the same window
    assert got.get(base) == 30


def test_stream_enrich_equals_batch_join(spark, events, tmp_path):
    """Stream-static enrichment over the same rows equals the batch
    left join; unmatched events survive with nulls."""
    from graphydb_spark.streaming.windows import stream_enrich
    src = str(tmp_path / "events_enrich")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    users = sorted(r["user_id"]
                   for r in events.select("user_id").distinct().collect())
    half = users[: len(users) // 2]                    # rest stay unmatched
    dim = spark.createDataFrame(
        [(u, f"tier{u % 3}") for u in half], "user_id long, tier string")
    out = stream_enrich(spark, src, schema, dim, on="user_id")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("t_enrich").start())
    try:
        q.processAllAvailable()
        got = {(r["event_id"], r["tier"])
               for r in spark.sql("SELECT event_id, tier FROM t_enrich")
               .collect()}
    finally:
        q.stop()
    want = {(r["event_id"], r["tier"])
            for r in events.join(dim, "user_id", "left")
            .select("event_id", "tier").collect()}
    assert got == want and any(t is None for _, t in got)


def test_interval_join_fractional_second_bounds(spark):
    """Review regression (r5): fractional-second band bounds must round
    to µs — int() truncation both shifted the bounds AND let the
    residual span exceed the bucket width, silently dropping pairs
    whose right row fell in the middle bucket a 2-bucket explode never
    visits."""
    from graphydb_spark.streaming.windows import interval_join
    rows = [(1, 1, "2024-01-01 00:00:00.000000"),
            (2, 1, "2024-01-01 00:00:01.050000"),   # +1.05 s
            (3, 1, "2024-01-01 00:00:01.500000"),   # +1.50 s
            (4, 1, "2024-01-01 00:00:02.000000"),   # +2.00 s
            (5, 1, "2024-01-01 00:00:02.500000")]   # +2.50 s (outside)
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string") \
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {(r.left_id, r.right_id) for r in
           interval_join(ev, ev, lower_s=0.9, upper_s=2.0).collect()}
    # from event 1: partners at +1.05, +1.50, +2.00 (NOT +2.50)
    assert {(1, 2), (1, 3), (1, 4)} <= got
    assert (1, 5) not in got
    # brute-force twin over every pair
    import itertools
    ts = {r[0]: r[2] for r in rows}
    from datetime import datetime
    t = {k: datetime.fromisoformat(v).timestamp() for k, v in ts.items()}
    want = {(a, b) for a, b in itertools.product(t, t)
            if 0.9 <= t[b] - t[a] <= 2.0}
    assert got == want


def test_stream_upserts_preserve_pstruct_and_demote_trust(spark, tmp_path):
    """Round-5 verdict #1: streaming ingest into a store written by a
    PROMOTED graph must (a) keep the typed pstruct shadow on every
    pre-existing row through the merge, and (b) demote the persisted
    auto_pstruct trust so a later open→save can never resume inference
    over the un-type-checked streamed rows (the streaming twin of
    test_bulk_upsert_demotes_promotion_trust)."""
    import json as _json
    from graphydb_spark.graph import Graph, NODE_SCHEMA
    from graphydb_spark.streaming.windows import stream_graph_upserts

    g = Graph(spark)
    na = g.Node("P", name="a", age=1)
    na.save()
    nb = g.Node("P", name="b", age=2)
    nb.save()                                     # promoted: age long
    store = str(tmp_path / "pstore")
    g.write(store)
    assert "pstruct" in spark.read.parquet(f"{store}/nodes").columns

    # stream a row whose age CONFLICTS with the promoted long type
    src = str(tmp_path / "pincoming")
    spark.createDataFrame(
        [("P:c", "P", 0.0, 3.0,
          _json.dumps({"name": "c", "age": "not-a-number"}))],
        NODE_SCHEMA).write.mode("overwrite").parquet(src)
    q = stream_graph_upserts(spark, src, store)
    q.awaitTermination(120)

    # (a) pstruct preserved: pre-existing rows keep non-null typed shadows
    out = spark.read.parquet(f"{store}/nodes")
    assert "pstruct" in out.columns
    typed = {r["uid"]: r["pstruct"] for r in out.collect()}
    assert typed[na.uid] is not None and typed[na.uid]["age"] == 1
    assert typed[nb.uid] is not None and typed[nb.uid]["age"] == 2

    # (b) persisted trust demoted: reopen must NOT resume inference
    g2 = Graph.open(spark, store)
    assert g2._auto_pstruct["node"] is False
    assert g2._pstruct_demoted["node"] is True
    g2.Node("P", name="d", zz=9).save()           # conform, not promote
    assert "zz" not in str(g2.nodes_df.schema["pstruct"].dataType)
    # typed predicates still see every type-checked row...
    assert g2.fetch("(p:P)", WHERE="p.data.age = 1", COUNT=True) == 1
    # ...and the streamed + new rows stay reachable via the JSON path
    assert g2.fetch("(p:P)", WHERE="p.data.name = 'c'", COUNT=True) == 1
    assert g2.fetch("(p:P)", WHERE="p.data.zz = '9'", COUNT=True) == 1
    assert g2.fetch("(p:P)", COUNT=True) == 4
