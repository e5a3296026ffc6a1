"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[N], AQE on,
shuffle partitions ≈ cores, UTC so DuckDB-oracle timestamp comparisons are
stable).  On a real cluster the same builder flags hold; only master/memory
change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tune_shuffle_for_input(spark: SparkSession, approx_rows: int,
                           rows_per_partition: int = 50_000) -> None:
    """Set shuffle parallelism proportional to input size.

    The right number of shuffle partitions is data-proportional, not
    machine-proportional: ~50k rows (→ tens of MB) per partition keeps
    every partition comfortably in memory at any scale; on a 1000-executor
    cluster the same formula yields thousands of partitions, on sf0.1
    locally it yields 8-16 and avoids paying scheduling overhead for empty
    tasks.  AQE still coalesces/ splits at runtime — this just sets a sane
    starting point.  (AQE itself stays on at every scale: a controlled
    same-JVM A/B at sf0.1 shows its per-stage scheduling cost is within
    run noise once the JIT is warm — earlier measurements attributing
    ~0.3 s/query to AQE were confounded by JVM warm-up order.)
    """
    cores = spark.sparkContext.defaultParallelism
    n = max(8, min(approx_rows // rows_per_partition + 1, cores * 4))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))


def _ship_package(spark: SparkSession) -> None:
    """Make ``graphydb_spark`` importable on executor Python workers.

    Pandas-UDF/``mapInPandas`` closures defined inside the package pickle
    by *reference* (module + qualname), so every worker must be able to
    ``import graphydb_spark``.  That holds by accident when the driver's
    cwd is the repo root, and breaks otherwise (observed: driver script
    run from another directory).  Shipping a zip via ``addPyFile`` is the
    same mechanism a real cluster deploy uses — workers get the package
    regardless of their filesystem layout.
    """
    import hashlib
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # key the archive on package content, not the pid: pid reuse (or a
    # long-lived process that edits the package between sessions) must
    # not ship a stale zip to executors
    h = hashlib.md5()
    for root, dirs, files in sorted(os.walk(pkg_dir)):
        dirs.sort()
        for fn in sorted(f for f in files if f.endswith(".py")):
            path = os.path.join(root, fn)
            h.update(path.encode())
            with open(path, "rb") as fh:
                h.update(fh.read())
    zip_base = os.path.join(tempfile.gettempdir(),
                            f"graphydb_spark_pkg_{h.hexdigest()[:16]}")
    if not os.path.exists(zip_base + ".zip"):
        tmp = tempfile.mkdtemp()
        staged = shutil.make_archive(
            os.path.join(tmp, "pkg"), "zip",
            os.path.dirname(pkg_dir), "graphydb_spark")
        os.replace(staged, zip_base + ".zip")  # atomic vs concurrent builds
        shutil.rmtree(tmp, ignore_errors=True)
    spark.sparkContext.addPyFile(zip_base + ".zip")


def get_spark(app: str = "graphydb_spark", cpus: int | None = None,
              master: str | None = None) -> SparkSession:
    """``master`` overrides the local[cpus] default (e.g.
    ``local-cluster[4,8,4096]`` for the cluster bench pair) while
    keeping every other conf IDENTICAL — a hand-copied builder block
    drifts silently the next time a conf changes (review r9 #5: the
    parallelismFirst flip happened exactly that way this round)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder
        .master(master or f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # celebrity-node protection for graph pattern chains: AQE's
        # skew-join split stays on, and we let it apply even when the
        # split breaks a downstream stage's co-partitioning — pattern
        # chains join a DIFFERENT key at every hop, so the preserved
        # partitioning is rarely reusable anyway and the extra exchange
        # it may introduce is bounded by the straggler it removes
        # (regression-tested in test_plan_shapes on a power-law graph)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # keep Spark's default parallelismFirst=true: AQE coalesces tiny
        # post-shuffle partitions but never below defaultParallelism.
        # The round-2..7 setting (false, "respect advisory size") was
        # measured costing 3.5x on high-cardinality final aggregates at
        # x10 scale — tpch_q3's 1.5M-group agg compresses to ~24 MB of
        # shuffle bytes, so the 64 MB advisory coalesced it onto ONE
        # task (4.8 s -> 1.39 s with the flip; sf0.1 queries unchanged,
        # round-8 A/B in BASELINE.md).  At genuine cluster scale
        # post-shuffle partitions exceed the advisory size and the two
        # settings converge — the false setting only ever bites
        # CPU-heavy small-byte stages, which is exactly the wrong place
        # to lose parallelism.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed tables (Graph.write_bucketed) land here, not in cwd
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/graphydb_spark_warehouse"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    _ship_package(spark)
    return spark
