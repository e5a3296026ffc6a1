"""Similarity search over embedding columns (``array<float>``).

Beyond-reference extension (SURVEY.md §7.3).  Two tiers:

* brute-force cosine top-k — exact baseline; one narrow map + one top-k
  (TakeOrdered, no full sort).  Dot products run as JVM ``aggregate``/
  ``zip_with`` fold expressions — sequential fold order makes results
  bit-deterministic (and DuckDB-oracle-reproducible).
* LSH-bucketed ANN (random hyperplanes) — the 100 TB path: vectors are
  bucketed by sign-pattern; queries probe only their bucket (and optional
  neighbor probes), turning O(N) scans into O(N/2^bits).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Sequential-fold dot product (deterministic; JVM-side)."""
    az = F.col(a) if isinstance(a, str) else a
    bz = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(az, bz, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def norm_expr(a: str | F.Column) -> F.Column:
    az = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(
        az, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: str | F.Column, b: str | F.Column) -> F.Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_ids: list | None = None) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    The query vector is inlined as an array literal (broadcast by value);
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
    partition keeps only k rows, no global sort.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    out = emb
    if exclude_ids:
        out = out.where(~F.col(id_col).isin(exclude_ids))
    out = out.withColumn("cosine", cosine_expr(q, F.col(vec_col)))
    return (out.select(id_col, "cosine")
               .orderBy(F.col("cosine").desc(), F.col(id_col))
               .limit(k))


def _random_hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket_col(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-pattern bucket id for random-hyperplane LSH."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot_expr(p, F.col(vec_col)) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)) \
               .otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def ann_index(emb: DataFrame, dim: int, bits: int = 8, seed: int = 42,
              vec_col: str = "embedding") -> tuple[DataFrame, list[list[float]]]:
    """Attach LSH bucket ids; persist/partition by bucket for reuse.

    At scale: ``.repartition("bucket").write.partitionBy("bucket")`` gives
    partition-pruned probes (only 1/2^bits of the data read per query).
    """
    planes = _random_hyperplanes(dim, bits, seed)
    return emb.withColumn("bucket", lsh_bucket_col(vec_col, planes)), planes


def ivf_index(emb: DataFrame, k: int = 16, iters: int = 3,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) ANN index: k-means centroids + per-vector
    cluster assignment.

    Deterministic: centroids init from the k lowest-id vectors; each Lloyd
    round assigns distributed (argmin over k inlined dot-distances) and
    re-averages via a (cluster, dim) explode-aggregate.  Centroids live on
    the driver (k × dim floats); assignments are a DataFrame — at scale,
    write it partitioned by ``cluster`` for partition-pruned probes.
    """
    seed_rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(r[0]) for r in seed_rows]
    dim = len(centroids[0])

    def assign_col(cents: list[list[float]]) -> F.Column:
        # argmin over squared L2 — one struct per centroid, array_min picks
        best = F.array_min(F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(F.array(*[F.lit(float(v)) for v in c]),
                               F.col(vec_col),
                               lambda a, x: (a - x.cast("double"))
                               * (a - x.cast("double"))),
                    F.lit(0.0), lambda acc, v: acc + v).alias("d"),
                F.lit(i).alias("c"))
            for i, c in enumerate(cents)]))
        return best["c"]

    for _ in range(iters):
        assigned = emb.withColumn("cluster", assign_col(centroids))
        means = (assigned
                 .select("cluster", F.posexplode(vec_col).alias("dim", "v"))
                 .groupBy("cluster", "dim").agg(F.avg("v").alias("m"))
                 .collect())
        new_c = [list(c) for c in centroids]
        for r in means:
            new_c[r["cluster"]][r["dim"]] = r["m"]
        centroids = new_c
    return emb.withColumn("cluster", assign_col(centroids)), centroids


def ivf_topk(indexed: DataFrame, centroids: list[list[float]],
             query_vec: list[float], k: int = 10, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Probe the ``nprobe`` nearest clusters, exact cosine re-rank inside."""
    dists = [(i, sum((a - b) ** 2 for a, b in zip(c, query_vec)))
             for i, c in enumerate(centroids)]
    probes = [i for i, _ in sorted(dists, key=lambda t: t[1])[:nprobe]]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = indexed.where(F.col("cluster").isin(probes))
    return (cand.withColumn("cosine", cosine_expr(q, F.col(vec_col)))
                .select(id_col, "cosine")
                .orderBy(F.col("cosine").desc(), F.col(id_col))
                .limit(k))


def ann_topk(indexed: DataFrame, planes: list[list[float]],
             query_vec: list[float], k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding", probe_hamming: int = 1) -> DataFrame:
    """Probe the query's bucket (± buckets within ``probe_hamming`` bit
    flips), then exact cosine re-rank inside the candidate set."""
    qbucket = 0
    for i, plane in enumerate(planes):
        dot = sum(p * q for p, q in zip(plane, query_vec))
        if dot >= 0:
            qbucket |= 1 << i
    probes = {qbucket}
    if probe_hamming >= 1:
        for i in range(len(planes)):
            probes.add(qbucket ^ (1 << i))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = indexed.where(F.col("bucket").isin(list(probes)))
    return (cand.withColumn("cosine", cosine_expr(q, F.col(vec_col)))
                .select(id_col, "cosine")
                .orderBy(F.col("cosine").desc(), F.col(id_col))
                .limit(k))
