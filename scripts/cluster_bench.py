"""Cluster-mode bench pair (VERDICT r8 #2): the 33-query headline set
under REAL executor JVMs vs the same-hour local[32] reading.

CLUSTER_SMOKE proved correctness across executor boundaries; nothing
yet priced them.  This script runs bench.py's exact protocol
(bench.run_bench — ONE shared implementation, so the two sides cannot
drift) twice, sequentially, same hour:

1. ``local-cluster[4,8,4096]`` — 4 worker JVMs × 8 cores, 4 GiB each:
   every shuffle serializes over real sockets, every Arrow batch
   crosses a process boundary, every broadcast ships to 4 JVMs.  The
   session comes from get_spark(master=...) so every other conf is
   byte-identical to the local baseline's;
2. ``local[32]`` via a bench.py subprocess (fresh process so
   pid-keyed standing-index paths don't collide), with
   SPARK_GRAFT_CPUS/DRIVER_MEM pinned — an exported env var must not
   turn the topology pair into a conf-drift pair.

Output: ONE JSON line {cluster, local, ratio, flagged} where flagged
lists queries whose cluster/local ratio exceeds 1.5× the set's median
ratio — each gets a named serialization audit in the committed
artifact.

Run: python scripts/cluster_bench.py   (~15-25 min; idle host only —
never concurrently with anything, the bench-host-noise rule)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import run_bench
    from graphydb_spark import get_spark

    spark = get_spark(app="graphydb_spark_cluster_bench", cpus=32,
                      master="local-cluster[4,8,4096]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    cluster = run_bench(spark, SF_DIR)
    cluster_wall = round(time.perf_counter() - t0, 1)
    spark.stop()

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_CPUS="32", SPARK_GRAFT_DRIVER_MEM="8g")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "..", "bench.py")],
        capture_output=True, text=True, env=env, check=True)
    local = json.loads(proc.stdout.strip().splitlines()[-1])["queries"]

    ratio = {n: round(cluster[n] / local[n], 3) for n in cluster
             if local.get(n)}
    med = statistics.median(ratio.values())
    flagged = sorted((n for n, r in ratio.items() if r > 1.5 * med),
                     key=lambda n: -ratio[n])
    print(json.dumps({
        "metric": "cluster_bench_pair",
        "sf_dir": SF_DIR,
        "topology": "local-cluster[4,8,4096] vs local[32]",
        "cluster_total": round(sum(cluster.values()), 3),
        "local_total": round(sum(local.values()), 3),
        "median_ratio": round(med, 3),
        "cluster": cluster, "local": local, "ratio": ratio,
        "flagged_over_1p5x_median": flagged,
        "cluster_wall_sec": cluster_wall,
    }))


if __name__ == "__main__":
    main()
