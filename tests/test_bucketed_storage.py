"""Bucketed storage: co-located node-edge joins need no exchange."""

import pytest
from pyspark.sql import functions as F

from graphydb_spark.graph import Graph
from graphydb_spark.sources.tpch_graph import tpch_graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    g = tpch_graph(spark, SF, cache=False)
    names = g.write_bucketed(
        n_buckets=4, node_table="t_nodes_b", edge_table="t_edges_b")
    yield Graph.from_tables(spark, *names)
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """nodes.uid = edges.startuid with both sides bucketed on the key and
    broadcast disabled: the sort-merge join must read bucket files
    pairwise — zero Exchange operators in the physical plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.nodes_df.join(
            bucketed.edges_df,
            bucketed.nodes_df.uid == bucketed.edges_df.startuid)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_graph_answers_fetch(bucketed):
    out = bucketed.fetch(
        "(n:Nation) <(fn:FromNation)- [c:Customer]",
        'n.data.n_name = "NATION_3"', as_df=True)
    assert out.count() > 0


def test_bucketed_roundtrip_preserves_rows(spark, bucketed):
    g0 = tpch_graph(spark, SF, cache=False)
    assert bucketed.nodes_df.count() == g0.nodes_df.count()
    assert bucketed.edges_df.count() == g0.edges_df.count()


def test_interval_join_bucketed_equals_per_run_plan(spark, tmp_path):
    """The co-bucketed interval-join layout (VERDICT r5 #3): the probe
    over interval_join_layout tables returns the identical pair set as
    the per-run interval_join, and with broadcast disabled its plan has
    ZERO Exchange — the (k, band-bucket) equi-join reads bucket files
    pairwise."""
    from graphydb_spark.streaming.windows import (interval_join,
                                                  interval_join_bucketed,
                                                  interval_join_layout)
    ev = spark.createDataFrame(
        [(i, i % 7, 1_700_000_000 + (i * 37) % 3600)
         for i in range(500)],
        "event_id long, user_id long, epoch long").select(
        "event_id", "user_id",
        F.timestamp_seconds("epoch").alias("ts"))
    want = sorted(map(tuple, interval_join(
        ev, ev, lower_s=1, upper_s=120).collect()))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        interval_join_layout(spark, ev, ev, "t_ij_l", "t_ij_r",
                             lower_s=1, upper_s=120, n_buckets=4,
                             path_prefix=str(tmp_path))
        probe = interval_join_bucketed(spark, "t_ij_l", "t_ij_r",
                                       lower_s=1, upper_s=120)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = sorted(map(tuple, probe.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("t_ij_l", "t_ij_r"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    assert want and got == want


def test_interval_join_bucketed_band_mismatch_is_loud(spark, tmp_path):
    """A probe band different from the layout's must raise — the band
    width IS the bucketing function, so a wider probe would silently
    miss pairs (code-review r6 finding #1); and a table without the
    layout properties is refused."""
    from graphydb_spark.streaming.windows import (interval_join_bucketed,
                                                  interval_join_layout)
    ev = spark.createDataFrame(
        [(i, i % 3, 1_700_000_000 + i * 13) for i in range(60)],
        "event_id long, user_id long, epoch long").select(
        "event_id", "user_id",
        F.timestamp_seconds("epoch").alias("ts"))
    try:
        interval_join_layout(spark, ev, ev, "t_ijm_l", "t_ijm_r",
                             lower_s=1, upper_s=120, n_buckets=2,
                             path_prefix=str(tmp_path))
        with pytest.raises(ValueError, match="band"):
            interval_join_bucketed(spark, "t_ijm_l", "t_ijm_r",
                                   lower_s=1, upper_s=240)
        # matching band still works
        assert interval_join_bucketed(
            spark, "t_ijm_l", "t_ijm_r",
            lower_s=1, upper_s=120).count() >= 0
        # mixed numeric types of the SAME band must not refuse: a
        # layout written with ints accepts a float-typed probe
        # (ADVICE r6 — compare compares numerically, "120.0" != "120"
        # as strings was a spurious mismatch)
        assert interval_join_bucketed(
            spark, "t_ijm_l", "t_ijm_r",
            lower_s=1.0, upper_s=120.0).count() >= 0
        # a table with no layout properties is refused
        spark.range(3).selectExpr("id AS k", "id AS __b", "id AS lts",
                                  "id AS left_id") \
            .write.mode("overwrite").option(
                "path", str(tmp_path / "bare")).saveAsTable("t_ijm_bare")
        with pytest.raises(ValueError, match="no interval-layout"):
            interval_join_bucketed(spark, "t_ijm_bare", "t_ijm_r",
                                   lower_s=1, upper_s=120)
    finally:
        for t in ("t_ijm_l", "t_ijm_r", "t_ijm_bare"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
