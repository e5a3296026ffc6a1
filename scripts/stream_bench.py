"""Structured-Streaming throughput probe (not part of bench.py's headline
set — DuckDB has no streaming twin to compare against).

Replays the sf events table through the parquet streaming source in
bounded micro-batches (maxFilesPerTrigger) into the tumbling-count and
stateful-sessionize operators, and reports end-to-end rows/sec from the
query progress metrics.  Run: python scripts/stream_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphydb_spark import get_spark
from graphydb_spark.streaming.windows import (stream_sessionize_stateful,
                                              stream_tumbling_counts)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="stream_bench",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from graphydb_spark.sources.tpch_graph import load_tables
    batch = load_tables(spark, sf_dir)["events"]
    schema = batch.schema
    n_src = batch.count()

    # split the source into multiple files so maxFilesPerTrigger yields
    # several micro-batches (steady-state, not one giant batch)
    src = tempfile.mkdtemp(prefix="stream_src_")
    batch.repartition(16).write.mode("overwrite").parquet(src)

    out = {}
    for name, factory in [
        ("tumbling_counts",
         lambda: stream_tumbling_counts(spark, src, schema)),
        ("sessionize_stateful",
         lambda: stream_sessionize_stateful(spark, src, schema)),
    ]:
        df = factory()
        q = (df.writeStream.format("memory").queryName(f"m_{name}")
             .outputMode("update")
             .option("checkpointLocation",
                     tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
             .trigger(availableNow=True)
             .option("maxFilesPerTrigger", "4")
             .start())
        t0 = time.perf_counter()
        q.awaitTermination()
        wall = time.perf_counter() - t0
        rows = sum(p["numInputRows"] for p in q.recentProgress)
        out[name] = {"rows": rows, "sec": round(wall, 3),
                     "rows_per_sec": round((rows or n_src) / wall)}
    shutil.rmtree(src, ignore_errors=True)
    print(json.dumps({"metric": "streaming_throughput", "sf_dir": sf_dir,
                      "queries": out}))


if __name__ == "__main__":
    main()
