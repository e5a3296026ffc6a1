"""Same-session A/B of the two FTS build shapes (VERDICT ledger #2):

  OLD (shipped): derive postings, run the doc-stats pass as a second
       tokenize+aggregate over the same lineage, then commit_snapshot
       (which stages the final files itself) — the corpus is tokenized
       twice per build.
  NEW (candidate): stage the final files FIRST (_stage_files), derive
       the stats from the just-written parquet (one narrow uid-column
       read + count_distinct), publish with _commit_staged — the
       corpus is tokenized once.

Measured 2026-08-16, 1M docs / 12M postings, local[32], back-to-back
in one JVM (NEW even gets the warmer session):

    OLD two-pass: 34.6 s
    NEW staged:   37.0 s      (identical meta counters both ways)

REJECTED: reading back 12M staged posting rows and shuffling a
count_distinct(uid) costs more than re-running the codegen
explode+count — the stats pass skips the window functions and the
token-sorted write, so the "double tokenize" is ~13% of the build,
not the ×2 the staging intuition assumes.  Together with the round-4
rejection of an in-memory .cache() between the passes (31.6 s vs
26.8 s), both staging alternatives are measured; the two-pass build
stays the deliberate shape (persisted_index._commit_fts_rows).

Run: python scripts/fts_build_ab.py [n_docs]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from graphydb_spark import get_spark
from graphydb_spark.fts import build_index
from graphydb_spark.sources.snapshot import (_commit_staged, _stage_files,
                                             commit_snapshot)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app="fts_build_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    words = F.concat_ws(" ", *[
        F.concat(F.lit("tok"),
                 F.pmod(F.xxhash64(F.col("id") + i),
                        F.lit(100 * (i + 1))).cast("string"))
        for i in range(12)])
    docs = (spark.range(n_docs).repartition(64)
            .select(F.col("id").alias("uid"),
                    F.when(F.col("id") % 100 == 0,
                           F.concat(F.lit("needle haystack "), words))
                    .otherwise(words).alias("text")))
    docs = docs.localCheckpoint(eager=True)

    def derive():
        pos_rows = build_index(docs, ["text"])
        g = W.partitionBy("uid", "field", "token")
        d = W.partitionBy("uid", "field")
        rows = (pos_rows
                .withColumn("tf", F.count("*").over(g))
                .withColumn("head",
                            F.row_number().over(g.orderBy("pos")) == 1)
                .withColumn("doc_len", F.count("*").over(d)))
        return pos_rows, (rows.repartitionByRange(64, "token")
                          .sortWithinPartitions("token"))

    base = tempfile.mkdtemp()
    try:
        t0 = time.perf_counter()
        pos_rows, laid = derive()
        st = (pos_rows.groupBy("uid").agg(F.count("*").alias("doc_len"))
              .agg(F.count("*").alias("n"),
                   F.sum("doc_len").alias("s")).collect()[0])
        meta = {"kind": "fts", "n_docs": int(st["n"]),
                "sum_doclen": int(st["s"])}
        commit_snapshot(laid, os.path.join(base, "old"),
                        mode="overwrite", meta=meta)
        t_old = time.perf_counter() - t0
        print(f"OLD two-pass: {t_old:.1f}s  "
              f"meta={meta['n_docs']},{meta['sum_doclen']}")

        t0 = time.perf_counter()
        _, laid = derive()
        p = os.path.join(base, "new")
        os.makedirs(p, exist_ok=True)
        files, schema_json = _stage_files(laid, p)
        staged = spark.read.parquet(
            *[os.path.join(p, f) for f in files])
        st2 = staged.agg(F.count_distinct("uid").alias("n"),
                         F.count("*").alias("s")).collect()[0]
        meta2 = {"kind": "fts", "n_docs": int(st2["n"]),
                 "sum_doclen": int(st2["s"])}
        _commit_staged(p, files, schema_json, mode="overwrite",
                       meta=meta2)
        t_new = time.perf_counter() - t0
        print(f"NEW staged:   {t_new:.1f}s  "
              f"meta={meta2['n_docs']},{meta2['sum_doclen']}")
        assert (meta["n_docs"], meta["sum_doclen"]) == \
               (meta2["n_docs"], meta2["sum_doclen"])
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
