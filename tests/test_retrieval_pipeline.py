"""End-to-end retrieval pipeline: the modules composed the way a user
would wire them — chunk → (deterministic) embed → persisted IVF index →
batch ANN serving, and lexical BM25 beside it.

Each stage is unit-tested elsewhere; this file guards the SEAMS: column
contracts between operators, the index surviving a build→probe round
trip through the snapshot layer, and retrieval actually surfacing the
planted document.
"""
import pytest
from pyspark.sql import functions as F

from graphydb_spark.operators.persisted_index import (
    build_ivf_table, probe_ivf_table_batch)
from graphydb_spark.operators.text import chunk_documents


def _fake_embed(df, text_col="chunk_text", id_col="chunk_uid", dim=8):
    """Deterministic stand-in embedder: token-hash bag folded into
    ``dim`` buckets, L2-normalized JVM-side.  Same text → same vector,
    similar token sets → nearby vectors — enough structure for the
    pipeline seams without a model."""
    toks = F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"),
                    lambda t: t != "")
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            toks, F.lit(0.0),
            lambda acc, t: acc + F.when(
                F.pmod(F.xxhash64(t), dim) == d,
                F.when(F.pmod(F.xxhash64(t, F.lit(1)), 2) == 0, 1.0)
                .otherwise(-1.0)).otherwise(0.0)))
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0),
                              lambda a, v: a + v * v))
    vec = F.transform(raw, lambda v: (v / (norm + F.lit(1e-12)))
                      .cast("float"))
    return df.select(F.col(id_col).alias("vec_id"),
                     vec.alias("embedding"))


@pytest.fixture()
def corpus(spark):
    rows = [(i, " ".join(f"w{(i * 17 + j) % 40}" for j in range(90)))
            for i in range(30)]
    # plant one distinctive document
    rows.append((99, "zephyr quokka umbra " * 30))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_embed_index_retrieve(spark, corpus, tmp_path):
    chunks = chunk_documents(corpus, chunk_tokens=32, overlap=8)
    assert {"doc_id", "chunk_id", "chunk_text", "n_tokens"} <= \
        set(chunks.columns)
    # synthetic stable chunk key that survives the index round trip
    chunks = chunks.withColumn(
        "chunk_uid", F.col("doc_id") * 1000 + F.col("chunk_id"))
    emb = _fake_embed(chunks)
    n_chunks = emb.count()
    assert n_chunks > corpus.count()          # overlap produced >1/doc

    p = str(tmp_path / "ivf")
    build_ivf_table(emb, p, k=4, iters=2)

    # query with the planted doc's own text: its chunks must dominate
    qdf = spark.createDataFrame(
        [(0, "zephyr quokka umbra zephyr quokka umbra")],
        "chunk_uid long, chunk_text string")
    qvec = _fake_embed(qdf).collect()[0].embedding
    queries = spark.createDataFrame(
        [("q0", [float(x) for x in qvec])],
        "qid string, qvec array<double>")
    got = probe_ivf_table_batch(spark, p, queries, k=5, nprobe=4) \
        .orderBy("rn").collect()
    assert len(got) == 5
    # top hit is a chunk of doc 99 at cosine ~1.0 (identical tokens)
    assert got[0].vec_id // 1000 == 99
    assert got[0].cosine > 0.99


def test_lexical_and_vector_agree_on_planted_doc(spark, corpus,
                                                 tmp_path):
    """BM25 over the raw docs and ANN over chunk embeddings both rank
    the planted doc first — the hybrid premise the fused query
    (q:hybrid_search) rests on."""
    from graphydb_spark.fts import bm25_scores, build_tf_index
    docs = corpus.select(
        F.concat(F.lit("D"), "doc_id").alias("uid"),
        F.to_json(F.struct("text")).alias("props"))
    idx = build_tf_index(docs, ["text"])
    top = (bm25_scores(idx, ["zephyr", "quokka"])
           .orderBy(F.col("score").desc(), "uid").limit(1).collect())
    assert top[0].uid == "D99"
