"""Round-10 job-timeline profiler: per-job submission/completion times.

For each named bench query, runs the bench protocol's warm-ups, then ONE
instrumented count() under a job group with the UI enabled, and prints the
job timeline from the UI REST API (/api/v1/.../jobs): per-job wall, the
gaps between jobs, and how much of the query wall is covered by
overlapping job execution vs driver-side gaps (Catalyst, AQE re-planning,
broadcast relation building on the driver).

Usage: python scripts/job_timeline.py [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def _ts(s: str) -> float:
    # UI REST timestamps: "2026-08-18T04:00:00.123GMT"
    return datetime.strptime(s.replace("GMT", "+0000"),
                             "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


def main() -> None:
    names = sys.argv[1:] or ["two_hop", "three_hop", "group_count",
                             "tpch_q5", "tpch_q3", "order_limit"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from graphydb_spark.session import get_spark as _gs  # conf parity
    # Build the SAME session as bench.py but with the UI on for the REST
    # timeline (ui overhead is per-event microseconds; fine for shape work)
    import graphydb_spark.session as sess_mod
    builder_src_spark = _gs  # noqa: F841  (documentational)
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("job_timeline")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4099")
             .getOrCreate())
    # apply the rest of the engine conf on top (mirrors get_spark flags)
    for k, v in [("spark.sql.shuffle.partitions", str(max(cpus, 8))),
                 ("spark.sql.adaptive.enabled", "true"),
                 ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
                 ("spark.sql.adaptive.skewJoin.enabled", "true"),
                 ("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"),
                 ("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                  "true"),
                 ("spark.sql.session.timeZone", "UTC")]:
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    from graphydb_spark.queries import QUERIES
    from graphydb_spark.session import tune_shuffle_for_input
    from graphydb_spark.sources.tpch_graph import tpch_graph

    g = tpch_graph(spark, sf_dir)
    g.nodes_df.count()
    tune_shuffle_for_input(spark, g.edges_df.count())

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"
    sc = spark.sparkContext

    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()
        fn(spark, sf_dir).count()
        # timed min-of-3 for reference
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        # instrumented run
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = [j for j in _get(f"{base}/jobs")
                if j.get("jobGroup") == name]
        jobs.sort(key=lambda j: j["jobId"])
        if not jobs:
            print(f"\n== {name}: best={best:.3f} wall={wall:.3f} (no jobs)")
            continue
        t_first = min(_ts(j["submissionTime"]) for j in jobs)
        print(f"\n== {name}: best={best:.3f}s instr_wall={wall:.3f}s "
              f"jobs={len(jobs)}")
        covered: list[tuple[float, float]] = []
        for j in jobs:
            s = _ts(j["submissionTime"]) - t_first
            e = _ts(j["completionTime"]) - t_first
            covered.append((s, e))
            print(f"  job {j['jobId']:4d} "
                  f"[{s*1000:7.1f} .. {e*1000:7.1f} ms] "
                  f"dur={(e-s)*1000:6.1f} ms stages={len(j['stageIds'])} "
                  f"tasks={j['numTasks']} {j.get('description','')[:40]}")
        # union of job intervals vs wall
        covered.sort()
        merged = []
        for s, e in covered:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        in_jobs = sum(e - s for s, e in merged)
        last_end = max(e for _, e in covered)
        print(f"  union(job intervals)={in_jobs*1000:.1f} ms; "
              f"first-submit→last-complete={last_end*1000:.1f} ms; "
              f"wall outside jobs={max(0.0, wall-in_jobs)*1000:.1f} ms "
              f"(pre-submit Catalyst + inter-job AQE replanning)")
    spark.stop()


if __name__ == "__main__":
    main()
