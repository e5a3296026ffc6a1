"""Round-9 inherited-state fix: a scalar pandas UDF whose input inlines
a NESTED-capturing-lambda expression (a lambda referencing an enclosing
lambda's variable) is never extracted into ArrowEvalPython by Spark
4.1's ExtractPythonUDFs and dies at runtime with
``[INTERNAL_ERROR] Cannot evaluate expression``.

similarity._udf_input_guard shields every Arrow-UDF array input
(kmeans_assign_arrow, the arrow cosine, _nearest_cells_arrow) so the
upstream alias is never inlined into the UDF input.  This test pins
both the plan shape (EvalPython present) and the end-to-end value path
that originally failed (build_ivf_table's _cell_counts over a
nested-lambda embedding — tests/test_retrieval_pipeline.py's
_fake_embed shape).
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphydb_spark.operators.similarity import (ivf_index,
                                                 kmeans_assign_arrow)


def _nested_lambda_emb(df, dim=4):
    """Embedding column whose inner aggregate lambda references the
    OUTER transform lambda's variable ``d`` — the extraction-killing
    shape."""
    toks = F.filter(F.split(F.lower("chunk_text"), "[^a-z0-9]+"),
                    lambda t: t != "")
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            toks, F.lit(0.0),
            lambda acc, t: acc + F.when(
                F.pmod(F.xxhash64(t), dim) == d, 1.0).otherwise(0.0)))
    vec = F.transform(raw, lambda v: v.cast("float"))
    return df.select(F.col("chunk_uid").alias("vec_id"),
                     vec.alias("embedding"))


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, " ".join(f"w{(i * 17 + j) % 40}" for j in range(20)))
            for i in range(12)]
    df = spark.createDataFrame(rows, "chunk_uid long, chunk_text string")
    return _nested_lambda_emb(df)


def test_assign_over_nested_lambda_embedding(emb):
    cents = [[0.0] * 4, [1.0] * 4]
    q = (emb.withColumn("cluster", kmeans_assign_arrow(cents, "embedding"))
         .groupBy("cluster").agg(F.count("*").alias("n")))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan          # UDF actually extracted
    total = sum(r["n"] for r in q.collect())
    assert total == 12                   # and evaluable end to end


def test_ivf_index_over_nested_lambda_embedding(emb):
    # the original failure path: ivf_index assignment + a count-only
    # aggregate over the UDF column (build_ivf_table._cell_counts)
    assigned, cents = ivf_index(emb, k=2, iters=1)
    counts = {r["cluster"]: r["n"]
              for r in assigned.groupBy("cluster")
              .agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 12


def test_guard_preserves_values_vs_plain_column(spark):
    # same vectors through a PLAIN parquet-style column: assignments
    # must be identical (the guard is value-transparent)
    rows = [(i, [float(i % 3), float((i * 7) % 5)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0.0, 0.0], [2.0, 4.0]]
    got = {r["vec_id"]: r["c"] for r in
           df.select("vec_id", kmeans_assign_arrow(cents, "embedding")
                     .alias("c")).collect()}
    import numpy as np
    C = np.asarray(cents)
    for vid, vec in rows:
        D = ((np.asarray(vec)[None, :] - C) ** 2).sum(axis=1)
        assert got[vid] == int(np.argmin(D))
