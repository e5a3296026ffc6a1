"""Round-10 optimization guards.

1. probe_fts_table pins its two exchanges (df window on token, score
   agg on uid) to a probe-proportional width instead of the session
   shuffle conf — a point probe must not pay 25-32 near-empty tasks.
2. quality_filter's token walk is compute-once: a ``where(keep)``
   consumer must NOT re-derive the split+lower walk once per rule
   inside a pushed-down filter (the measured 6× clone that serialized
   the ×10 corpus_pipeline), and the walk must stay ABOVE a spread
   exchange rather than being pushed below it into the scan.
3. spread_scan_by_bytes sizes from UNCOMPRESSED footer bytes: no-op on
   a bench-scale corpus, proportional width beyond it, untouched
   shuffled inputs.
"""
import pytest
from pyspark.sql import functions as F

from graphydb_spark.operators import persisted_index
from graphydb_spark.operators.pipeline import quality_filter
from graphydb_spark.operators.text import spread_scan_by_bytes


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"the quick brown fox is one of many and jumps to a "
                f"lazy dog in the field for fun on day {i} with joy " * 2,
             "en", 100)
            for i in range(60)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")


def test_fts_probe_exchanges_are_probe_width(spark, corpus, tmp_path):
    path = str(tmp_path / "fts")
    persisted_index.build_fts_table(corpus, path, ["text"],
                                    id_col="doc_id")
    df = persisted_index.probe_fts_table(spark, path, ["quick", "dog"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly two exchanges, both user-pinned (REPARTITION_BY_NUM is
    # never AQE-coalesced and never the session conf width); a tiny
    # probe gets width 1, which renders as SinglePartition.  The window
    # and the agg must REUSE them: a conf-width ENSURE_REQUIREMENTS
    # exchange appearing here means the pin was lost.
    assert plan.count("REPARTITION_BY_NUM") == 2, plan
    assert plan.count("Exchange") == 2, plan
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    assert plan.count("Exchange SinglePartition") == 2, plan
    # values: the probe still scores
    assert df.count() > 0


def test_quality_filter_token_walk_not_cloned_into_filter(spark, corpus):
    out = quality_filter(corpus).where(F.col("keep")).select("doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the tokenize walk appears exactly once (the compute-once
    # projection); a pushed filter re-deriving it per rule shows up as
    # 5+ occurrences of the split(lower( chain
    assert plan.count("split(lower(") == 1, plan
    # and the filter still applies (semantics unchanged)
    assert out.count() == corpus.count()  # synthetic corpus all passes


def test_quality_filter_walk_stays_above_spread_exchange(spark, corpus):
    spread = corpus.repartition(4)  # stand-in for the spread exchange
    out = quality_filter(spread).where(F.col("keep")).select("doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    walk_at = plan.index("split(lower(")
    ex_at = plan.index("RoundRobinPartitioning")
    # plan text is top-down: the walk (above) prints BEFORE the
    # round-robin exchange (below) — pushdown must not invert them
    assert walk_at < ex_at, plan


def test_quality_filter_values_unchanged_by_compute_once(spark):
    rows = [(1, "the a of and to in is for on with many good tokens "
                "indeed quite long enough to pass the gate", "en", 90),
            (2, "x", "en", 1),
            (3, None, "en", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    got = {r["doc_id"]: (r["ok_tokens"], r["ok_avg_len"], r["ok_symbols"],
                         r["ok_stopwords"], r["keep"])
           for r in quality_filter(df, min_tokens=5).collect()}
    assert got[1] == (True, True, True, True, True)
    assert got[2][0] is False and got[2][4] is False


def test_spread_by_bytes_noop_small_and_untouched_shuffled(spark, corpus):
    small = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    assert spread_scan_by_bytes(small) is small          # tiny → no-op
    shuffled = corpus.repartition(2, "doc_id")
    assert spread_scan_by_bytes(shuffled) is shuffled    # exchange guard


def test_spread_by_bytes_proportional(spark, tmp_path):
    # ~9 MB of uncompressed text in one file → width ≈ bytes/2MB + 1,
    # capped at defaultParallelism.  Distinct per-row text so parquet's
    # dictionary encoding cannot collapse it (the width proxy is the
    # footer's encoded-page byte size).
    rows = [(i, f"tok {i} " * 2500) for i in range(500)]
    p = str(tmp_path / "big")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_scan_by_bytes(df)
    par = spark.sparkContext.defaultParallelism
    w = out.rdd.getNumPartitions()
    assert w > 1 and w <= par, w
