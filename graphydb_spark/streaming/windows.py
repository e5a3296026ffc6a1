"""Event-time windowing: batch-equivalent plans + Structured Streaming.

Beyond-reference extension (SURVEY.md §7.3, §2.10 — the reference has no
streaming surface).  Each helper has a *batch* form (same logical plan the
DuckDB oracle can reproduce) and a *stream* form (readStream + watermark);
the batch form is what the correctness gate checks, the stream form is
exercised by tests with the memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EDGE_SCHEMA, NODE_SCHEMA


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Per (tumbling window, key): row count + exact decimal sum.

    Decimal(18,2) sums are order-independent → bit-stable under Spark's
    partial aggregation AND reproducible by the oracle (double sums are
    neither).
    """
    return (events
            .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col(value_col).cast("decimal(18,2)"))
                  .cast("double").alias("total"))
            .select(F.col("w.start").alias("wstart"), key_col, "n", "total"))


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes", ts_col: str = "ts",
                   key_col: str = "event_type") -> DataFrame:
    return (events
            .groupBy(F.window(ts_col, window, slide).alias("w"),
                     F.col(key_col))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("wstart"), key_col, "n"))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Batch sessionization via lag + cumulative gap-break sum → one row
    per user with session count.  (Streaming form: ``session_window``.)"""
    from pyspark.sql import Window as W
    w = W.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("double") - \
        F.lag(F.col(ts_col).cast("double")).over(w)
    brk = F.when(gap > gap_minutes * 60, 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (events
            .withColumn("_sess", sess)
            .groupBy(user_col)
            .agg((F.max("_sess") + 1).cast("long").alias("n_sessions"),
                 F.count("*").cast("long").alias("n_events")))


def stream_tumbling_counts(spark, source_dir: str, schema,
                           window: str = "5 minutes",
                           watermark: str = "10 minutes",
                           ts_col: str = "ts",
                           key_col: str = "event_type"):
    """Structured-Streaming twin of :func:`tumbling_counts` with late-data
    handling.  Caller starts/stops the query (memory sink in tests)."""
    events = (spark.readStream.format("parquet").schema(schema)
              .load(source_dir))
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("wstart"), key_col, "n"))


def stream_sessionize_stateful(spark, source_dir: str, schema,
                               gap_minutes: int = 30,
                               ts_col: str = "ts",
                               user_col: str = "user_id"):
    """Custom stateful streaming operator: per-user sessionization with
    explicit keyed state via ``applyInPandasWithState``.

    The streaming twin of :func:`sessionize` for semantics Spark's
    built-in ``session_window`` can't express directly (running totals
    that survive across windows).  State per user = (last event time,
    session count, event count); each micro-batch folds its events in
    event-time order and emits the user's updated totals.  Arrow-batched
    (no per-row Python), state is partitioned by key so it scales with
    the cluster like any keyed stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60.0
    out_schema = f"{user_col} long, n_sessions long, n_events long"
    state_schema = "last_ts double, n_sessions long, n_events long"

    def update(key, pdfs, state: GroupState):
        last_ts, n_sess, n_ev = state.get if state.exists else (None, 0, 0)
        for pdf in pdfs:
            for t in sorted(pdf[ts_col].astype("int64")) :
                t = t / 1e9   # ns → epoch seconds
                if last_ts is None or t - last_ts > gap:
                    n_sess += 1
                n_ev += 1
                last_ts = t if last_ts is None else max(last_ts, t)
        state.update((last_ts, n_sess, n_ev))
        yield pd.DataFrame({user_col: [key[0]], "n_sessions": [n_sess],
                            "n_events": [n_ev]})

    events = (spark.readStream.format("parquet").schema(schema)
              .load(source_dir))
    return (events.groupBy(user_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def stream_graph_upserts(spark, source_dir: str, store_path: str,
                         edge: bool = False,
                         checkpoint_dir: str | None = None):
    """Streaming ingest of node/edge upserts into a parquet graph store.

    The streaming twin of ``Graph._flush``: each micro-batch keeps its
    latest-mtime row per uid, then merges into the store with
    last-writer-wins semantics (anti-join + union + rewrite) inside
    ``foreachBatch``.  Returns the started StreamingQuery — caller stops
    it.  At scale the merge would target Delta/Iceberg MERGE INTO; plain
    parquet rewrite keeps the same semantics in this container.

    Typed-props trust protocol (the streaming twin of the bulk-upsert
    demotion at ``Graph.upsert_nodes_df``/``upsert_edges_df``): a store
    written by a PROMOTED graph carries a typed ``pstruct`` shadow column
    plus an ``auto_pstruct`` trust marker in ``{path}/meta``.  Streamed
    rows bypass save-time type-checking, so each merge (a) PRESERVES the
    pstruct column — existing rows keep theirs, batch rows parse their
    JSON props with the store's existing pstruct schema (the conform
    rule, never a new inferred one) — and (b) rewrites the store's meta
    demoting the streamed side (``auto_pstruct=False`` +
    ``pstruct_demoted=True``), so a later ``Graph.open`` → ``save`` can
    never resume inference and ``from_json`` un-checked streamed rows
    against a schema they might conflict with (PERMISSIVE parsing would
    null the whole shadow of a conflicting row, silently dropping it
    from typed predicates).  Reference analogue: SQLite's schema cannot
    desync from its rows (graphydb.py:515-526).
    """
    import json as _json

    from pyspark.sql import Window as W

    schema = EDGE_SCHEMA if edge else NODE_SCHEMA
    sub = "edges" if edge else "nodes"
    side = "edge" if edge else "node"
    stream = (spark.readStream.format("parquet").schema(schema)
              .load(source_dir))

    def _demote_meta(sess) -> None:
        """Rewrite {store_path}/meta marking the streamed side demoted —
        idempotent, driver-side (meta is a 1-row JSON table).  A store
        with no meta has no persisted trust to invalidate."""
        try:
            raw = sess.read.json(f"{store_path}/meta").collect()
            meta = _json.loads(raw[0]["meta"]) if raw else None
        except Exception:
            meta = None
        if meta is None:
            return
        ap = meta.setdefault("auto_pstruct", {})
        dem = meta.setdefault("pstruct_demoted", {})
        if not ap.get(side) and dem.get(side):
            return                                  # already demoted
        ap[side] = False
        dem[side] = True
        sess.createDataFrame([(_json.dumps(meta, sort_keys=True),)],
                             "meta string") \
            .coalesce(1).write.mode("overwrite").json(f"{store_path}/meta")

    def merge_batch(batch_df, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        w = W.partitionBy("uid").orderBy(F.col("mtime").desc())
        latest = (batch_df
                  .withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).drop("_rn"))
        target = f"{store_path}/{sub}"
        try:
            cur_raw = sess.read.parquet(target)
            current = cur_raw.select(
                *[f.name for f in schema.fields],
                *(["pstruct"] if "pstruct" in cur_raw.columns else []))
        except Exception:
            current = sess.createDataFrame([], schema)
        if "pstruct" in current.columns:
            # conform rule: batch rows get the store's EXISTING typed
            # schema (never an inferred one) so typed predicates keep
            # seeing every surviving row
            dtype = current.schema["pstruct"].dataType
            latest = latest.withColumn(
                "pstruct", F.from_json(F.col("props"), dtype))
        merged = (current.join(latest.select("uid"), "uid", "left_anti")
                  .unionByName(latest))
        # two-phase rewrite (all distributed): parquet cannot overwrite a
        # path it is reading, so stage the merge then copy back.  A Delta/
        # Iceberg MERGE INTO replaces both phases when available.
        staging = f"{store_path}/_staging/{sub}_{epoch_id}"
        merged.write.mode("overwrite").parquet(staging)
        sess.read.parquet(staging) \
            .write.mode("overwrite").parquet(target)
        _demote_meta(sess)

    q = (stream.writeStream
         .foreachBatch(merge_batch)
         .option("checkpointLocation",
                 checkpoint_dir or f"{store_path}/_checkpoints/{sub}")
         .trigger(availableNow=True)
         .start())
    return q


def interval_join(left: DataFrame, right: DataFrame,
                  key_col: str = "user_id", ts_col: str = "ts",
                  lower_s: int = 0, upper_s: int = 600) -> DataFrame:
    """Batch form of the stream-stream interval join: pairs of (left,
    right) events of the same key with ``right.ts ∈ [left.ts + lower,
    left.ts + upper]``.

    A plain key equi-join with the band as residual predicate is
    quadratic per key (every same-key event pair is a candidate).  This
    uses the bucketing decomposition (same as relational.range_join):
    timestamps map to band-width buckets, the left row explodes to its
    ≤ 2 candidate buckets, and the join becomes an equi-join on
    (key, bucket) + residual band filter — candidates drop from
    events²/key to events per band window, one bounded-fanout shuffle,
    and AQE treats skewed (key, bucket) cells like any equi-join.
    Measured at sf0.1: 1.6 s → 0.6 s vs the naive plan (the residual is
    the per-job floor — the shuffled volume is ~300k narrow rows).

    Floor decomposition (round-4 profiling, sf0.1, local[32]): the
    terminal count is ONE job / ONE stage — a single BroadcastHashJoin
    pipeline (2 column-pruned parquet scans + generate + broadcast
    build + probe), no shuffle exchange at local scale.  The remaining
    wall is the per-run broadcast materialization + twin scans, not a
    plan defect; explode-side/join-order variants measured within noise.
    At cluster scale AQE swaps the broadcast for a shuffled hash join
    on (key, bucket) — the decomposition is unchanged.

    Round-5 scale pass (10× and 100× event replicas, same-hour pairs):
    timestamps now convert ONCE to epoch-µs longs and the band residual
    compares longs — the per-candidate INTERVAL arithmetic on
    timestamps was ~25% of wall at every scale (sf0.1 0.74→0.54 s,
    ×100 7.2→6.3 s; values bit-identical, the band is exact µs either
    way).  Two rejected alternatives, both measured at ×100/10M events:
    a per-key sorted numpy sweep via mapInPandas (the IEJoin idea) ran
    20 s — pandas concat + per-partition sort under Arrow costs more
    than the narrow-row exchange it saves; forcing shuffled-hash join
    matched SMJ within noise (5.3 vs 6.3 s under contention) but would
    disable the sf0.1 broadcast pipeline, so the strategy choice stays
    with AQE.
    """
    # µs-resolution band: fractional-second bounds round to the
    # timestamp's own precision (int() truncation would both shift the
    # bounds AND let the residual span exceed the bucket width,
    # silently dropping pairs whose right row lands in the middle
    # bucket a 2-bucket explode never visits)
    lo_us = int(round(float(lower_s) * 1_000_000))
    hi_us = int(round(float(upper_s) * 1_000_000))
    width = max(hi_us - lo_us, 1)
    lhs = left.select(F.col(key_col).alias("k"),
                      F.unix_micros(F.col(ts_col).cast("timestamp"))
                      .alias("lts"),
                      F.col("event_id").alias("left_id"))
    rhs = right.select(F.col(key_col).alias("k"),
                       F.unix_micros(F.col(ts_col).cast("timestamp"))
                       .alias("rts"),
                       F.col("event_id").alias("right_id"))
    lo = F.floor((F.col("lts") + lo_us) / width)
    hi = F.floor((F.col("lts") + hi_us) / width)
    l_b = lhs.withColumn("__b", F.explode(F.array_distinct(F.array(lo, hi))))
    r_b = rhs.withColumn("__b", F.floor(F.col("rts") / width))
    return (l_b.join(r_b, ["k", "__b"])
            .where((F.col("rts") >= F.col("lts") + lo_us) &
                   (F.col("rts") <= F.col("lts") + hi_us))
            .select(F.col("k").alias(key_col), "left_id", "right_id"))


def interval_join_layout(spark, left: DataFrame, right: DataFrame,
                         left_table: str, right_table: str,
                         key_col: str = "user_id", ts_col: str = "ts",
                         lower_s: int = 0, upper_s: int = 600,
                         n_buckets: int = 32,
                         path_prefix: str | None = None) -> None:
    """Persist both sides of an interval join CO-BUCKETED by
    (key, band-bucket) — the storage layout that makes the recurring
    probe exchange-free (VERDICT r5 #3).  The µs conversion, the
    left side's ≤2-bucket explode, and the (key, bucket) clustering
    are paid ONCE at write time; :func:`interval_join_bucketed` then
    joins bucket-files pairwise with ZERO Exchange and zero broadcast
    build in the plan (pinned by test_bucketed_storage).

    Measured (scripts/interval_bucketed_pair.py, same-hour): sf0.1
    0.77 s → 0.27 s; ×10 replicas 2.52 s → 0.48 s (2.17× the DuckDB
    anchor, vs 11.4× for the per-run plan).  The band width IS the
    bucketing function, so the layout's (lower_s, upper_s, n_buckets)
    are persisted as table properties and
    :func:`interval_join_bucketed` REFUSES a mismatched probe — a
    wider probe band would silently miss pairs whose right event
    lands in a bucket the write-time explode never produced (the
    MinHash index stores its hash-space params in meta for the same
    reason).  ``path_prefix`` makes the tables external at that
    location (session-temp layouts); default is the warehouse dir."""
    lo_us = int(round(float(lower_s) * 1_000_000))
    hi_us = int(round(float(upper_s) * 1_000_000))
    width = max(hi_us - lo_us, 1)
    base_l = left.select(F.col(key_col).alias("k"),
                         F.unix_micros(F.col(ts_col).cast("timestamp"))
                         .alias("lts"),
                         F.col("event_id").alias("left_id"))
    lo = F.floor((F.col("lts") + lo_us) / width)
    hi = F.floor((F.col("lts") + hi_us) / width)
    l_b = base_l.withColumn(
        "__b", F.explode(F.array_distinct(F.array(lo, hi))))
    r_b = right.select(F.col(key_col).alias("k"),
                       F.unix_micros(F.col(ts_col).cast("timestamp"))
                       .alias("rts"),
                       F.col("event_id").alias("right_id")) \
        .withColumn("__b", F.floor(F.col("rts") / width))
    for name, df in ((left_table, l_b), (right_table, r_b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        w = df.write.mode("overwrite").format("parquet")
        if path_prefix is not None:
            w = w.option("path", f"{path_prefix}/{name}")
        (w.bucketBy(n_buckets, "k", "__b").sortBy("k", "__b")
         .saveAsTable(name))
        spark.sql(
            f"ALTER TABLE {name} SET TBLPROPERTIES ("
            f"'graphydb.interval.lower_s' = '{lower_s}', "
            f"'graphydb.interval.upper_s' = '{upper_s}', "
            f"'graphydb.interval.n_buckets' = '{n_buckets}')")


def _layout_band(spark, table: str) -> tuple[str, str] | None:
    props = {r["key"]: r["value"] for r in
             spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    lo = props.get("graphydb.interval.lower_s")
    hi = props.get("graphydb.interval.upper_s")
    return (lo, hi) if lo is not None and hi is not None else None


def interval_join_bucketed(spark, left_table: str, right_table: str,
                           key_col: str = "user_id",
                           lower_s: int = 0,
                           upper_s: int = 600) -> DataFrame:
    """The recurring probe over tables written by
    :func:`interval_join_layout` — same output as
    :func:`interval_join` ((key, left_id, right_id)), but the
    (k, __b) equi-join matches bucket files pairwise (no Exchange on
    either side) and the band residual compares the precomputed
    epoch-µs longs.  The probe band is checked against the band the
    tables were LAID OUT with (table properties) — a mismatch raises
    instead of silently dropping every pair outside the write-time
    bucket function."""
    for t in (left_table, right_table):
        band = _layout_band(spark, t)
        if band is None:
            raise ValueError(
                f"{t!r} has no interval-layout band properties — "
                f"(re)write it with interval_join_layout")
        # Compare numerically: a layout written with lower_s=0 must
        # accept a probe called with lower_s=0.0 (str compare would
        # spuriously refuse "0" != "0.0").
        if (float(band[0]), float(band[1])) != (float(lower_s), float(upper_s)):
            raise ValueError(
                f"probe band [{lower_s}, {upper_s}]s does not match "
                f"the layout band [{band[0]}, {band[1]}]s of {t!r} — "
                f"the band width IS the bucketing function; rebuild "
                f"the layout for the new band")
    lo_us = int(round(float(lower_s) * 1_000_000))
    hi_us = int(round(float(upper_s) * 1_000_000))
    lt, rt = spark.table(left_table), spark.table(right_table)
    return (lt.join(rt, ["k", "__b"])
            .where((F.col("rts") >= F.col("lts") + lo_us) &
                   (F.col("rts") <= F.col("lts") + hi_us))
            .select(F.col("k").alias(key_col), "left_id", "right_id"))


def stream_interval_join(spark, left_dir: str, right_dir: str, schema,
                         key_col: str = "user_id", ts_col: str = "ts",
                         lower_s: int = 0, upper_s: int = 600,
                         watermark: str = "30 minutes"):
    """Structured-Streaming twin of :func:`interval_join`: both sides
    watermarked, join condition carries the event-time band so Spark can
    bound the join state (state for a row is dropped once the other
    side's watermark passes its band) — the canonical stream-stream join
    pattern.  Caller starts the sink."""
    lhs = (spark.readStream.format("parquet").schema(schema).load(left_dir)
           .select(F.col(key_col).alias("k_l"), F.col(ts_col).alias("lts"),
                   F.col("event_id").alias("left_id"))
           .withWatermark("lts", watermark))
    rhs = (spark.readStream.format("parquet").schema(schema).load(right_dir)
           .select(F.col(key_col).alias("k_r"), F.col(ts_col).alias("rts"),
                   F.col("event_id").alias("right_id"))
           .withWatermark("rts", watermark))
    cond = F.expr(
        f"k_l = k_r AND "
        f"rts >= lts + INTERVAL {lower_s} SECOND AND "
        f"rts <= lts + INTERVAL {upper_s} SECOND")
    return (lhs.join(rhs, cond)
            .select(F.col("k_l").alias(key_col), "left_id", "right_id"))


def stream_dedup(spark, source_dir: str, schema,
                 keys: list[str], watermark: str = "1 hour",
                 ts_col: str = "ts"):
    """Watermarked streaming deduplication
    (``dropDuplicatesWithinWatermark``): keeps the first event per key
    within the watermark horizon, with bounded state — the streaming twin
    of batch ``dropDuplicates(keys)`` for sources that can replay or
    double-deliver (at-least-once ingestion)."""
    events = (spark.readStream.format("parquet").schema(schema)
              .load(source_dir)
              .withWatermark(ts_col, watermark))
    return events.dropDuplicatesWithinWatermark(keys)


def stream_enrich(spark, source_dir: str, schema, dim_df,
                  on: str, dim_cols: list[str] | None = None):
    """Stream-static enrichment: join each micro-batch of the stream
    against a static dimension frame on ``on`` — the canonical
    dimension-lookup stage of a streaming pipeline.  Spark plans the
    static side as a broadcast per micro-batch (dimension-sized, never
    the stream), so state stays empty and throughput is the narrow-map
    rate; for a dimension too big to broadcast, pre-bucket both sides
    on the key instead.  Left join keeps unmatched events (nulls), the
    lossless ingest default."""
    events = (spark.readStream.format("parquet").schema(schema)
              .load(source_dir))
    dim = dim_df.select(
        on, *(dim_cols or [c for c in dim_df.columns if c != on]))
    return events.join(dim, on, "left")
