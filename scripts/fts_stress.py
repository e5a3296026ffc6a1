"""Scale-stress probe for the persisted FTS/BM25 index (round 4): build
the index over a synthetic 1M-doc corpus, then show (a) the manifest
prunes a term probe to a small file subset BEFORE Spark lists anything,
and (b) probe latency is governed by the matched postings, not the
corpus.  Deterministic, seed-free — text is a pure function of doc_id.

Run: python scripts/fts_stress.py [n_docs] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphydb_spark import get_spark
from graphydb_spark.operators.persisted_index import (append_fts_table,
                                                      build_fts_table,
                                                      fts_probe_files,
                                                      probe_fts_table)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app="fts_stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    # ~14 tokens/doc over a graded vocabulary (word i drawn from
    # 100·(i+1) choices); pmod keeps remainders non-negative so every
    # word is one token ('tok-42' would split on the hyphen and plant
    # a stopword-sized 'tok' posting list)
    words = F.concat_ws(" ", *[
        F.concat(F.lit("tok"),
                 F.pmod(F.xxhash64(F.col("id") + i),
                        F.lit(100 * (i + 1))).cast("string"))
        for i in range(12)])
    docs = (spark.range(n_docs).repartition(64)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 100 == 0,
                           F.concat(F.lit("needle haystack "), words))
                    .otherwise(words).alias("text")))
    docs = docs.localCheckpoint(eager=True)

    path = os.path.join(tempfile.mkdtemp(), "fts")
    t0 = time.perf_counter()
    build_fts_table(docs.where("doc_id % 10 > 0"), path, ["text"],
                    n_files=n_files, id_col="doc_id")
    print(f"build[{n_docs:,} docs, {n_files} files]: "
          f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    append_fts_table(spark, path, docs.where("doc_id % 10 = 0"),
                     txn={"source": "stress", "batch": 1})
    print(f"append[10% batch]: {time.perf_counter() - t0:.1f}s")

    for term in ("needle", "tok5"):
        opened, total = fts_probe_files(path, term)
        print(f"probe_files[{term}]: opens {opened}/{total}")

    q = probe_fts_table(spark, path, ["needle", "tok5"])
    q.count()                                    # warm
    t0 = time.perf_counter()
    n = q.count()
    print(f"probe[needle,tok5]: {time.perf_counter() - t0:.2f}s "
          f"rows_out={n}")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
