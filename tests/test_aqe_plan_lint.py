"""AQE-conf plan-audit lint (VERDICT r8 #5).

The parallelismFirst lesson: ``spark.sql.adaptive.coalescePartitions.
parallelismFirst=false`` (set round 2, reverted round 8) silently
collapsed high-cardinality final aggregates onto ONE task whenever the
shuffle was under the 64 MB advisory — invisible at sf0.1, a measured
3.5× regression at ×10 (tpch_q3).  No check tied global Spark confs to
plan shape, so the defect survived six rounds.

This lint pins the failure signature mechanically:

1. conf lint — the session must not set parallelismFirst=false;
2. behavioral probe — a synthetic high-cardinality aggregate whose
   shuffle lands in the danger window (a few MB .. 64 MB) must keep a
   parallel final stage after AQE coalescing;
3. teeth check — the SAME probe under a ``newSession`` with the bad
   conf MUST collapse, proving the lint turns red if the conf is ever
   flipped back (newSession shares the context but owns its SQLConf).

Why a SYNTHETIC probe and not a headline query: at sf0.1 every
headline aggregate's shuffle is under ~2 MB, so BOTH confs coalesce
to one task and the anchor cannot distinguish them (measured:
dedup_exact/line_dedup/events_window/group_count all read 1 final
partition under either conf at sf0.1) — which is exactly how the
defect stayed invisible for six rounds.  The headline-scale guard is
the ×10 ratio-growth audit (scripts/sf1_pair.py --all, the round-8
protocol that caught tpch_q3); this lint pins the MECHANISM at pytest
scale by putting the shuffle in the danger window deliberately.

``df.rdd.getNumPartitions()`` executes the adaptive plan and reports
the FINAL stage's partitioning — exactly the task count the defect
collapsed (valid only for plans whose last stage IS the aggregate;
a trailing orderBy+limit legitimately reads 1).
"""
from pyspark.sql import functions as F


def _probe(session):
    """~1.5M-group aggregate: map-output sits well under the 64 MB
    advisory but far over coalescing's 1 MB minimum — the window where
    parallelismFirst=false collapses to ONE task and the default keeps
    ~shuffle_bytes/1MB tasks."""
    return (session.range(2_000_000)
            .groupBy((F.col("id") % 1_500_000).alias("k"))
            .agg(F.count("*").alias("n")))


def test_parallelism_first_conf_not_flipped(spark):
    got = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    assert got != "false", (
        "parallelismFirst=false re-entered the session confs — this "
        "was the round-2..7 latent 3.5x defect (see session.py)")


def test_high_cardinality_agg_keeps_parallel_final_stage(spark):
    par = spark.sparkContext.defaultParallelism
    shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = _probe(spark).rdd.getNumPartitions()
    # the defect signature is a collapse to 1; the healthy default
    # yields ~shuffle_bytes/1MB tasks.  min(par, shuffle)/4 keeps the
    # bound robust to compression-ratio drift while still failing the
    # collapsed plan by a wide margin.
    floor = max(2, min(par, shuf) // 4)
    assert n >= floor, (
        f"final aggregate stage coalesced to {n} task(s) "
        f"(defaultParallelism={par}, shuffle={shuf}) — the tpch_q3 "
        f"defect signature; audit the AQE confs")


def test_lint_has_teeth_under_flipped_conf(spark):
    bad = spark.newSession()
    bad.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
    n_bad = _probe(bad).rdd.getNumPartitions()
    n_good = _probe(spark).rdd.getNumPartitions()
    assert n_bad < max(2, min(spark.sparkContext.defaultParallelism,
                              int(spark.conf.get(
                                  "spark.sql.shuffle.partitions"))) // 4)
    assert n_good > n_bad, (n_good, n_bad)
