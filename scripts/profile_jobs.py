"""Count Spark jobs + stages per headline query (structural, timing-free).

Usage: python scripts/profile_jobs.py [query ...]

The job floor is the round-trip count: each Spark job costs ~50-70 ms of
scheduler latency locally, so a query that could be one job but runs as
four pays 3x the floor for nothing.  This script runs each query once
(warm) and reports how many jobs/stages the *second* run launches.
"""
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from graphydb_spark import queries as Q  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main(names):
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.QUERIES
    for name in names:
        fn = reg[name]
        fn(spark, SF_DIR).collect()          # warm: caches, file listing
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None) or []
        nbefore = len(before)
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        df = fn(spark, SF_DIR)
        df.collect()
        jobs = tracker.getJobIdsForGroup(name) or []
        stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                stages += len(info.stageIds)
        print(f"{name}: jobs={len(jobs)} stages={stages}")
        sc.setJobGroup(None, None)
    spark.stop()


if __name__ == "__main__":
    names = sys.argv[1:] or ["two_hop", "three_hop", "group_count",
                             "one_hop", "fts_term", "order_limit",
                             "degree_supplier"]
    main(names)
