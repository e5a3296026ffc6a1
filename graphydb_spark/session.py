"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[N], AQE on,
shuffle partitions ≈ cores, UTC so DuckDB-oracle timestamp comparisons are
stable).  On a real cluster the same builder flags hold; only master/memory
change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "graphydb_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
