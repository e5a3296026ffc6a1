"""VERDICT r9 #9: cluster-mode A/B of the verify-join shingle shapes.

Local[32] measured the 2x per-branch shingle RECOMPUTE cheaper than a
shared hash exchange above the walk (0.55 vs 0.95 s, r9).  On a real
cluster the exchange crosses sockets but dedupes the CPU; this re-runs
the same-session A/B under local-cluster[4,8,1024] (real executor JVMs,
real socket shuffles) to see whether the trade inverts.

Variants (value-identical by construction, asserted):
  A (committed): _paired_shingles as shipped — each join branch
    re-evaluates the shingle walk.
  B (shared exchange): one hash-repartitioned shingle frame reused by
    both branches (physical ReuseExchange / AQE stage reuse decide
    whether it actually dedupes).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphydb_spark import get_spark
from graphydb_spark.operators import dedup
from graphydb_spark.operators.dedup import shingled, _spread_small_scan
from graphydb_spark.session import tune_shuffle_for_input

MASTER = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[4,8,1024]"
spark = get_spark(app="cluster_shingle_ab", cpus=32, master=MASTER)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
tune_shuffle_for_input(spark, docs.count())
n = int(spark.conf.get("spark.sql.shuffle.partitions"))

# the bench's candidate pairs: minhash band-join pairs (same shape the
# containment/jaccard bench paths verify)
pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4) \
    .select("id_a", "id_b").localCheckpoint(eager=True)
print(f"# candidate pairs: {pairs.count()}", file=sys.stderr)


def variant_a():
    return dedup.jaccard_verify(docs, pairs, threshold=0.0)


def variant_b():
    sh = shingled(_spread_small_scan(docs), "text", "doc_id", 3) \
        .select(F.col("doc_id"), F.array_distinct("_sh").alias("sh")) \
        .repartition(n, "doc_id")
    out = (pairs
           .join(sh.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("sh", "sh_a"), "id_a")
           .join(sh.withColumnRenamed("doc_id", "id_b")
                   .withColumnRenamed("sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (out.withColumn("jaccard", (inter / union).cast("double"))
               .where(F.col("jaccard") >= 0.0)
               .select("id_a", "id_b", "jaccard"))


assert sorted(map(tuple, variant_a().collect())) == \
       sorted(map(tuple, variant_b().collect())), "variants diverge"


def timed(mk, rounds=5):
    mk().count(); mk().count()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        mk().count()
        best = min(best, time.perf_counter() - t0)
    return best


for label, mk in [("A recompute", variant_a), ("B shared-exchange",
                                               variant_b)] * 2:
    print(f"{MASTER} {label}: {timed(mk):.3f}s")
spark.stop()
