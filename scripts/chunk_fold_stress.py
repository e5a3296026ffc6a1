"""Many-chunk serving stress for the union-depth guard (VERDICT r7 #5).

Forces probe_ivf_table_batch through a pathological chunk count —
10,000 queries at max_batch=8 → 1,250 chunks — and shows the work
stays FLAT per chunk: without the fold, chunk k's unionByName lineage
is k arms deep and plan construction alone goes quadratic; with
UNION_FOLD_CHUNKS=16 the live plan never exceeds 16 arms, so late
chunks cost what early chunks cost.  Prints per-quartile wall times
(the flatness evidence) and asserts the served result is
value-identical to a single-scan pass on a 500-query subsample.

Run: python scripts/chunk_fold_stress.py      (~3 min; one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphydb_spark import get_spark
from graphydb_spark.operators import persisted_index as PI


def main() -> None:
    spark = get_spark(app="chunk_fold_stress",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="fold_stress_")
    dim, nq, cap = 8, 10_000, 8
    emb = spark.range(50_000).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (F.pmod(F.xxhash64("id", i), 1000)
                               .cast("float") / 100.0 - 5.0)
                    ).alias("embedding"))
    path = os.path.join(d, "ivf")
    PI.build_ivf_table(emb, path, k=8, iters=1)
    queries = spark.range(nq).select(
        F.concat(F.lit("q"), "id").alias("qid"),
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (F.pmod(F.xxhash64(F.col("id") + 7, i), 1000)
                               .cast("double") / 100.0 - 5.0)
                    ).alias("qvec")).localCheckpoint(eager=True)

    # instrument per-chunk wall time by wrapping the chunk iterator
    marks: list[float] = []
    orig = PI._query_chunks

    def timed_chunks(*a, **kw):
        for c in orig(*a, **kw):
            marks.append(time.perf_counter())
            yield c

    PI._query_chunks = timed_chunks
    try:
        t0 = time.perf_counter()
        res = PI.probe_ivf_table_batch(spark, path, queries, k=5,
                                       nprobe=2, max_batch=cap)
        n = res.count()
        total = time.perf_counter() - t0
    finally:
        PI._query_chunks = orig
    # quartile deltas: flat == no union-depth blowup (pre-fold, the
    # 4th quartile's plan builds were ~1000-arm lineages)
    deltas = [marks[i + 1] - marks[i] for i in range(len(marks) - 1)]
    qn = len(deltas) // 4
    quartiles = [round(sum(deltas[i * qn:(i + 1) * qn]), 2)
                 for i in range(4)]

    sub = queries.limit(500).localCheckpoint(eager=True)
    want = sorted(map(tuple, PI.probe_ivf_table_batch(
        spark, path, sub, k=5, nprobe=2).collect()))
    got = sorted(map(tuple,
                     res.join(F.broadcast(sub.select("qid")), "qid")
                     .collect()))
    assert got == want, "chunked result diverged from single-scan"
    print(json.dumps({
        "metric": "chunk_fold_stress", "queries": nq, "max_batch": cap,
        "chunks": len(marks), "rows": n, "total_sec": round(total, 2),
        "quartile_sec": quartiles,
        "fold_width": PI.UNION_FOLD_CHUNKS,
        "subsample_identity": True,
    }))


if __name__ == "__main__":
    main()
