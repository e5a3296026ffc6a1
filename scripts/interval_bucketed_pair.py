"""interval_join_events bucketed-layout experiment (VERDICT r5 #3).

The batch interval join's plan is already exchange-free at local[32]
(one BroadcastHashJoin pipeline — PLANS.md), so the open question is
whether a CO-BUCKETED STORAGE layout — both sides pre-bucketed and
sorted by (user_id, time_bucket), the join running bucket-file-pairwise
with zero Exchange AND zero broadcast build — closes the remaining gap
to DuckDB's shared-memory IEJoin, or whether that gap is the per-job
floor (scan + twin decode + residual) that a layout cannot remove.

Protocol (same-hour, same host, min of 3 after 1 warm-up each):
  a. current plan: interval_join(events, events) at $SPARK_GRAFT_SF_DIR
  b. bucketed probe: the SAME logical join reading two catalog tables
     bucketed+sorted by (k, __b) — the explode and µs conversion are
     absorbed into the untimed layout build (the standing-index
     treatment: layout is indexing), broadcast disabled so the
     bucketed SortMergeJoin actually runs bucket-pairwise
  c. bucketed probe with broadcast left on (AQE picks)
  d. DuckDB anchor: the committed oracle SQL on the same parquet

Run:  python scripts/interval_bucketed_pair.py [replication]
`replication` (default 1) unions N shifted copies of events on BOTH
sides — the ×10 path of the committed sf1_pair protocol.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

LOWER_S, UPPER_S = 1, 120
LO_US = LOWER_S * 1_000_000
HI_US = UPPER_S * 1_000_000
WIDTH = HI_US - LO_US
N_BUCKETS = 32


def events(spark, sf_dir, repl):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "user_id", "ts")
    if repl > 1:
        parts = [ev.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
            "ts") for i in range(repl)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    return ev


def timed(fn, n=3):
    fn()                                    # warm-up
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main():
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ev = events(spark, sf_dir, repl)

    from graphydb_spark.streaming.windows import interval_join
    cur = lambda: interval_join(ev, ev, key_col="user_id", ts_col="ts",
                                lower_s=LOWER_S, upper_s=UPPER_S).count()
    t_current = timed(cur)

    # ---- untimed layout build: both sides bucketed by (k, __b)
    base = ev.select(F.col("user_id").alias("k"),
                     F.unix_micros(F.col("ts").cast("timestamp"))
                     .alias("us"), "event_id")
    lo = F.floor((F.col("us") + LO_US) / WIDTH)
    hi = F.floor((F.col("us") + HI_US) / WIDTH)
    l_b = (base.withColumn("__b",
                           F.explode(F.array_distinct(F.array(lo, hi))))
           .select("k", "__b", F.col("us").alias("lts"),
                   F.col("event_id").alias("left_id")))
    r_b = base.select("k", F.floor(F.col("us") / WIDTH).alias("__b"),
                      F.col("us").alias("rts"),
                      F.col("event_id").alias("right_id"))
    import shutil
    for name, df in (("ij_left_bucketed", l_b), ("ij_right_bucketed", r_b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # DROP on a managed table whose files a previous session left
        # behind does not clean the warehouse dir — remove it explicitly
        shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)
        (df.write.mode("overwrite").format("parquet")
         .bucketBy(N_BUCKETS, "k", "__b").sortBy("k", "__b")
         .saveAsTable(name))
    lt, rt = spark.table("ij_left_bucketed"), spark.table("ij_right_bucketed")
    joined = (lt.join(rt, ["k", "__b"])
              .where((F.col("rts") >= F.col("lts") + LO_US) &
                     (F.col("rts") <= F.col("lts") + HI_US))
              .select("k", "left_id", "right_id"))

    def bucketed_probe():
        return joined.count()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    t_bucketed_smj = timed(bucketed_probe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    t_bucketed_aqe = timed(bucketed_probe)

    # sanity: same result
    assert joined.count() == interval_join(
        ev, ev, key_col="user_id", ts_col="ts",
        lower_s=LOWER_S, upper_s=UPPER_S).count()

    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute(
        f"CREATE VIEW base_events AS SELECT event_id, user_id, ts "
        f"FROM '{sf_dir}/events.parquet'")
    union = " UNION ALL ".join(
        f"SELECT event_id + {i * 10_000_000} AS event_id, "
        f"user_id + {i * 1_000_000} AS user_id, ts FROM base_events"
        for i in range(repl))
    con.execute(f"CREATE TEMP TABLE events AS {union}")
    duck_sql = """
      SELECT COUNT(*) FROM events a JOIN events b
      ON a.user_id = b.user_id
      AND b.ts >= a.ts + INTERVAL 1 SECOND
      AND b.ts <= a.ts + INTERVAL 120 SECOND"""
    t_duck = timed(lambda: con.execute(duck_sql).fetchall())

    print(json.dumps({
        "replication": repl,
        "rows": ev.count(),
        "current_plan_sec": t_current,
        "bucketed_smj_sec": t_bucketed_smj,
        "bucketed_aqe_sec": t_bucketed_aqe,
        "bucketed_exchanges_in_plan": n_exchange,
        "duckdb_sec": t_duck,
        "ratio_current": round(t_current / t_duck, 2),
        "ratio_bucketed": round(min(t_bucketed_smj, t_bucketed_aqe)
                                / t_duck, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
