"""Executor-boundary smoke: the ANN/Arrow/broadcast core under
``local-cluster[2,2,2048]`` (VERDICT r7 #2).

Everything else in the repo runs single-JVM ``local[N]``, where executor
"workers" share the driver's process, filesystem view, and Python
interpreter — so a pickling bug in a mapInPandas closure, a missing
executor-side package import (``_ship_package``), or driver-only state
leaking into a task closure would never surface.  ``local-cluster``
launches REAL separate executor JVMs with their own Python workers: the
package zip must actually ship, every closure must actually pickle, and
every Arrow batch actually crosses a process boundary.

Covers the paths the verdict named:

- ``ivf_batch_probe`` (registry) — chunked closure-matrix ANN serving,
  multi-chunk localCheckpoint + union fold, vs its DuckDB oracle.
- ``knn_cosine`` (registry) + a direct ``knn_join`` run — the Arrow
  closure-matrix kernel, numpy brute-force checked.
- ``lsh_probe`` (registry) — persisted MinHash index probe, vs oracle.
- ``two_hop`` (registry) — the broadcast chain fetch, vs oracle.
- ``pixel_stats`` (registry) — multimodal Arrow decoder, vs oracle.
- ``stream_dedup_ingest`` — foreachBatch with MinHash + IVF gates,
  exact planted bookkeeping.

Run: python scripts/cluster_smoke.py     (~3 min; one JSON line)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
SF_DIR = os.environ.get("CLUSTER_SMOKE_SF", "/root/testdata/sf0.001")
REGISTRY_NAMES = ["two_hop", "knn_cosine", "lsh_probe",
                  "ivf_batch_probe", "pixel_stats"]


def cluster_session() -> SparkSession:
    spark = (
        SparkSession.builder
        .master("local-cluster[2,2,2048]")
        .appName("cluster_smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from graphydb_spark.session import _ship_package
    _ship_package(spark)
    return spark


def _canon(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return str(v)


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    norm = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return hashlib.md5(str(norm).encode()).hexdigest(), len(norm)


def registry_vs_oracle(spark) -> dict:
    import __spark_entry__ as em
    qs, osql = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    out = {}
    for name in REGISTRY_NAMES:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        gh, gn = _hash([tuple(r) for r in df.collect()], df.columns)
        cur = con.execute(osql[name])
        wh, wn = _hash(cur.fetchall(), [d[0] for d in cur.description])
        out[name] = {"rows": gn, "match": gh == wh and gn == wn,
                     "sec": round(time.perf_counter() - t0, 2)}
        assert out[name]["match"], (name, gn, wn)
    con.close()
    return out


def knn_join_direct(spark) -> dict:
    """knn_join's mapInPandas closure matrix across a REAL process
    boundary, brute-force checked in numpy on the driver."""
    import numpy as np

    from graphydb_spark.operators.similarity import knn_join
    n, dim, k = 400, 8, 3
    rows = [(i, [float((i * 7 + d * 3) % 13) - 6.0 for d in range(dim)])
            for i in range(n)]
    left = spark.createDataFrame(
        rows[:50], "vec_id long, embedding array<double>")
    right = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    t0 = time.perf_counter()
    got = knn_join(left, right, k=k).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rn, r.vec_id))
    Q = np.array([v for _, v in rows[:50]])
    C = np.array([v for _, v in rows])
    cos = (Q @ C.T) / (np.linalg.norm(Q, axis=1)[:, None]
                       * np.linalg.norm(C, axis=1)[None, :])
    ok = True
    for qi in range(50):
        order = sorted(range(n), key=lambda j: (-cos[qi, j], j))[:k]
        ok &= [v for _, v in sorted(by_q[qi])] == order
    assert ok, "knn_join disagrees with numpy brute force"
    return {"rows": len(got), "match": ok,
            "sec": round(time.perf_counter() - t0, 2)}


def stream_gate(spark) -> dict:
    """stream_dedup_ingest end to end on real executors: MinHash +
    embedding gates, exact planted survivors."""
    from graphydb_spark.operators import persisted_index as PI
    from graphydb_spark.sources.snapshot import read_snapshot
    d = tempfile.mkdtemp(prefix="cluster_smoke_")
    try:
        docs = spark.createDataFrame(
            [(i, f"corpus document number {i} about topic {i % 5} "
                 f"with unique suffix {i * 17}") for i in range(30)],
            "doc_id long, text string")
        idx, ivf = os.path.join(d, "mh"), os.path.join(d, "ivf")
        kept_t = os.path.join(d, "kept")
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        PI.build_minhash_index(docs, idx)
        PI.build_ivf_table(spark.createDataFrame(
            [(i, [float(i * 10 + 1), 2.0, -3.0, 0.5]) for i in range(30)],
            "vec_id long, embedding array<double>"), ivf, k=4, iters=1)
        batch = spark.createDataFrame(
            [(100, "corpus document number 7 about topic 2 "
                   "with unique suffix 119",          # shingle dup of 7
              [77.0, -3.0, 5.0, 1.0]),
             (101, "novel phrasing on columnar formats entirely",
              [71.0, 2.0, -3.0, 0.5]),                # emb dup of vec 7
             (102, "genuinely new words about shuffle services",
              [9.0, -9.0, 9.0, -9.0])],
            "doc_id long, text string, embedding array<double>")
        batch.write.mode("append").parquet(src)
        t0 = time.perf_counter()
        q = PI.stream_dedup_ingest(spark, src, batch.schema, idx, kept_t,
                                   ckpt, threshold=0.9, ivf_path=ivf,
                                   cos_threshold=0.999, nprobe=4)
        q.awaitTermination(300)
        kept = {r.doc_id for r in read_snapshot(spark, kept_t).collect()}
        assert kept == {102}, kept
        return {"kept": sorted(kept), "match": True,
                "sec": round(time.perf_counter() - t0, 2)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    spark = cluster_session()
    out = {"metric": "cluster_smoke", "master": "local-cluster[2,2,2048]",
           "sf_dir": SF_DIR}
    out["registry"] = registry_vs_oracle(spark)
    out["knn_join_direct"] = knn_join_direct(spark)
    out["stream_dedup_ingest"] = stream_gate(spark)
    # counted AFTER the workload (executors register asynchronously);
    # includes the driver endpoint, so 3 == driver + 2 executor JVMs
    out["jvm_endpoints"] = (spark.sparkContext._jsc.sc()
                            .getExecutorMemoryStatus().size())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
