"""DuckDB side of the headline benchmark: times each bench query's
oracle SQL on the same parquet fixtures (min of 3 after one warm-up),
so BASELINE.md's single-node anchor can be re-measured on demand on the
same host/hour as a bench.py run.

Run: python scripts/duck_bench.py            (env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH_QUERIES
from graphydb_spark.queries import ORACLES

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        sql = ORACLES.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm-up (OS cache, plan)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "duckdb_oracle_bench_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
