"""Round-9 optimization profiler: per-query wall + scheduler decomposition.

For each bench query, runs the EXACT bench protocol (2 untimed warm-ups,
min of 3 timed ``count()``s) and, on one extra instrumented run, collects
from the status tracker: job count, stage count, task count, and summed
task wall (executorRunTime is not exposed via the PySpark tracker, so we
report numTasks / numStages — the scheduling-floor signal; each Spark job
costs ~40-70 ms of driver round-trip locally, so ``jobs * 0.05`` is a
lower bound on irreducible per-run latency at sf0.1).

Usage: python scripts/opt_profile.py [out.json] [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphydb_spark import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_profile.json"
    from bench import BENCH_QUERIES
    names = sys.argv[2:] or BENCH_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="opt_profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from graphydb_spark.queries import QUERIES
    from graphydb_spark.session import tune_shuffle_for_input
    from graphydb_spark.sources.tpch_graph import tpch_graph

    g = tpch_graph(spark, sf_dir)
    g.nodes_df.count()
    tune_shuffle_for_input(spark, g.edges_df.count())

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()
        fn(spark, sf_dir).count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        # instrumented extra run under a job group
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall_instr = time.perf_counter() - t0
        jobs = tracker.getJobIdsForGroup(name) or []
        stages = 0
        tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                stages += len(info.stageIds)
                for s in info.stageIds:
                    si = tracker.getStageInfo(s)
                    if si:
                        tasks += si.numTasks
        sc.setJobGroup(None, None)
        results[name] = {
            "best_sec": round(best, 4),
            "instr_sec": round(wall_instr, 4),
            "jobs": len(jobs),
            "stages": stages,
            "tasks": tasks,
        }
        print(f"{name}: best={best:.3f}s jobs={len(jobs)} "
              f"stages={stages} tasks={tasks}", flush=True)

    total = round(sum(r["best_sec"] for r in results.values()), 4)
    with open(out_path, "w") as fh:
        json.dump({"total_best_sec": total, "queries": results}, fh, indent=1)
    print(f"TOTAL(best): {total}s -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
