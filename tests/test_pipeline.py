"""Unit tests for the training-data pipeline operators (sampling, mixing,
shard packing, PII redaction, quality filtering)."""

import pytest
from pyspark.sql import functions as F

from graphydb_spark.operators.pipeline import (mixture_sample, pack_shards,
                                               pii_redact, quality_filter,
                                               stratified_sample)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i,
             f"src{i % 4}",
             ["en", "de", "fr"][i % 3],
             "the quick brown fox jumps over the lazy dog number %d" % i,
             50 + (i * 7) % 300)
            for i in range(400)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, "
              "n_chars long")


def test_stratified_sample_rates_and_determinism(corpus):
    out = stratified_sample(corpus, "lang", {"en": 1.0, "de": 0.5},
                            key_col="doc_id", default_rate=0.0)
    rows = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    # rate 1.0 keeps every row (the threshold edge case)
    assert by_lang["en"] == 134
    # rate 0.5 keeps about half (hash-uniform; 134 de rows total)
    assert 40 <= by_lang.get("de", 0) <= 95
    # rate 0.0 (default) keeps none
    assert "fr" not in by_lang
    # deterministic: identical on re-run
    again = stratified_sample(corpus, "lang", {"en": 1.0, "de": 0.5},
                              key_col="doc_id", default_rate=0.0)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_mixture_sample_hits_target_proportions(corpus):
    # sources src0..src3, 100 docs each; target 60/20/20 over three of them
    out = mixture_sample(corpus, "source",
                         {"src0": 0.6, "src1": 0.2, "src2": 0.2},
                         key_col="doc_id")
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert set(counts) == {"src0", "src1", "src2"}
    # bottleneck source (src0: needs 0.6 share from 100 rows → cap
    # C=100/0.6) is kept whole; others aim at C*w ≈ 33
    assert counts["src0"] == 100
    for s in ("src1", "src2"):
        assert 20 <= counts[s] <= 50
    total = sum(counts.values())
    assert counts["src0"] / total > 0.5


def test_pack_shards_budget_bound(corpus):
    packed = pack_shards(corpus, "doc_id", "n_chars", budget=1000,
                         partition_col="lang")
    stats = (packed.groupBy("lang", "shard_id")
             .agg(F.sum("n_chars").alias("chars"),
                  F.max("n_chars").alias("biggest")).collect())
    for r in stats:
        # a shard never exceeds budget + one document (boundary overhang)
        assert r["chars"] <= 1000 + r["biggest"]
    # shard ids are dense from 0 within each partition
    for lang in ("en", "de", "fr"):
        ids = sorted(r["shard_id"] for r in stats if r["lang"] == lang)
        assert ids == list(range(len(ids)))


def test_pack_shards_deterministic_layout(corpus):
    a = pack_shards(corpus, "doc_id", "n_chars", budget=1000,
                    partition_col="lang").select("doc_id", "shard_id")
    b = pack_shards(corpus, "doc_id", "n_chars", budget=1000,
                    partition_col="lang").select("doc_id", "shard_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pii_redact_masks_all_three(spark):
    df = spark.createDataFrame(
        [(1, "reach me at jo.doe+x@mail-site.org or 555-123-4567, "
             "server 192.168.0.1 thanks"),
         (2, "no pii here at all")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["redacted"]
           for r in pii_redact(df).collect()}
    assert out[1] == ("reach me at <EMAIL> or <PHONE>, server <IP> thanks")
    assert out[2] == "no pii here at all"


def test_quality_filter_rules(spark):
    long_good = ("the cat sat on the mat and looked at the dog for a while "
                 "then it is time to go home with all of us in the end " * 2)
    df = spark.createDataFrame(
        [(1, long_good),               # passes everything
         (2, "short text"),            # fails token band
         (3, "@@ ## $$ %% ^^ && ** (( )) !! " * 10),  # symbol soup
         (4, " ".join(["internationalization"] * 40))],  # long tokens, no sw
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_tokens"] and not out[2]["keep"]
    assert not out[3]["ok_symbols"] and not out[3]["keep"]
    assert not out[4]["ok_avg_len"] and not out[4]["ok_stopwords"]


def test_unigram_logprob_orders_rarity(spark):
    """Docs made of corpus-frequent tokens must outscore docs of rare
    tokens (the quality signal the LM-perplexity stand-in provides)."""
    from graphydb_spark.operators.pipeline import unigram_logprob
    common = "the cat sat on the mat " * 10
    df = spark.createDataFrame(
        [(1, common), (2, "zyxq wvut srqp onml kjih gfed"),
         (3, common)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[1]["logprob"] > out[2]["logprob"]
    assert out[1]["logprob"] == out[3]["logprob"]  # identical docs tie
    assert out[2]["n_tokens"] == 6


def test_write_training_shards_roundtrip(corpus, tmp_path):
    """Shard writer: partitioned layout, one parquet file per shard dir,
    same (doc, shard) assignment as pack_shards."""
    import glob
    from graphydb_spark.operators.pipeline import write_training_shards
    path = str(tmp_path / "shards")
    write_training_shards(corpus, path, "doc_id", "n_chars",
                          budget=2000, partition_col="lang")
    spark = corpus.sparkSession
    back = spark.read.parquet(path)
    want = pack_shards(corpus, "doc_id", "n_chars", 2000, "lang") \
        .select("doc_id", "lang", "shard_id")
    assert sorted(map(tuple, back.select("doc_id", "lang", "shard_id")
                      .collect())) == sorted(map(tuple, want.collect()))
    for d in glob.glob(f"{path}/lang=*/shard_id=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_global_shuffle_is_seeded_permutation(corpus):
    from graphydb_spark.operators.pipeline import global_shuffle
    a = global_shuffle(corpus, "doc_id", seed="1") \
        .select("doc_id", "shuffle_rank").collect()
    ranks = sorted(r["shuffle_rank"] for r in a)
    assert ranks == list(range(1, 401))          # a true permutation
    again = global_shuffle(corpus, "doc_id", seed="1") \
        .select("doc_id", "shuffle_rank").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, again))
    other = global_shuffle(corpus, "doc_id", seed="2") \
        .select("doc_id", "shuffle_rank").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, other))


def test_train_val_test_split_bands(corpus):
    from graphydb_spark.operators.pipeline import train_val_test_split
    out = train_val_test_split(corpus, "doc_id")
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 300                 # ~90% of 400
    # membership is stable under data growth: a doc keeps its split
    half = train_val_test_split(corpus.where(F.col("doc_id") < 200),
                                "doc_id")
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in half.collect():
        assert full[r["doc_id"]] == r["split"]


def test_pack_sequences_offsets_and_truncation(spark):
    """Docs fill sequences in id order; a boundary-straddling doc joins
    the sequence its first token falls in, with the carried count
    clipped to the sequence end."""
    from graphydb_spark.operators.pipeline import pack_sequences
    rows = [(0, 60), (1, 30), (2, 40), (3, 100), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok int")
    out = {r["doc_id"]: r for r in
           pack_sequences(df, "doc_id", "n_tok", seq_len=100).collect()}
    assert (out[0]["seq_id"], out[0]["offset"], out[0]["n_tok"]) == (0, 0, 60)
    assert (out[1]["seq_id"], out[1]["offset"], out[1]["n_tok"]) == (0, 60, 30)
    # doc 2 starts at 90 → seq 0, truncated to the 10 tokens that fit
    assert (out[2]["seq_id"], out[2]["offset"], out[2]["n_tok"]) == (0, 90, 10)
    assert (out[3]["seq_id"], out[3]["offset"], out[3]["n_tok"]) == (1, 30, 70)
    assert out[4]["seq_id"] == 2
    # untruncated mode reports full counts
    full = {r["doc_id"]: r["n_tok"] for r in
            pack_sequences(df, "doc_id", "n_tok", seq_len=100,
                           truncate=False).collect()}
    assert full[2] == 40 and full[3] == 100


def test_line_dedup_keeps_first_occurrence(spark):
    """A ≥16-char line repeated across (or within) documents survives
    only at its lowest (doc_id, line_no); short lines are never dedup
    candidates; docs reassemble in line order."""
    from graphydb_spark.operators.pipeline import line_dedup
    boiler = "this boilerplate line repeats everywhere"
    rows = [
        (1, f"unique opening sentence one\n{boiler}\nok"),
        (2, f"{boiler}\nanother unique sentence here\nok"),
        (3, f"ok\n{boiler}\n{boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    # doc 1 holds the first occurrence → everything kept
    assert out[1]["clean_text"] == rows[0][1]
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (3, 0)
    # doc 2 loses its copy, keeps its unique line + the short line
    assert out[2]["clean_text"] == "another unique sentence here\nok"
    assert out[2]["n_dropped"] == 1
    # doc 3: both copies dropped (intra-doc repeat too), short line kept
    assert out[3]["clean_text"] == "ok"
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (1, 2)


def test_line_dedup_all_dropped_doc_yields_empty_text(spark):
    from graphydb_spark.operators.pipeline import line_dedup
    long_line = "exactly the same long line in both documents"
    df = spark.createDataFrame(
        [(1, long_line), (2, long_line)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["clean_text"] == long_line
    assert out[2]["clean_text"] == ""
    assert out[2]["n_kept"] == 0


def test_balanced_sample_rates_per_group(spark):
    """Big groups thin toward the target, small groups survive whole,
    and the gate is deterministic (re-run identical)."""
    from graphydb_spark.operators.pipeline import balanced_sample
    rows = ([(i, "big") for i in range(400)]
            + [(1000 + i, "small") for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = balanced_sample(df, "grp", "doc_id", per_group=40)
    got = out.groupBy("grp").count().collect()
    counts = {r["grp"]: r["count"] for r in got}
    assert counts["small"] == 5                     # rate 1 keeps all
    assert 15 <= counts["big"] <= 70                # ~40 of 400 (hash noise)
    again = {r["grp"]: r["count"] for r in
             balanced_sample(df, "grp", "doc_id", per_group=40)
             .groupBy("grp").count().collect()}
    assert again == counts


def test_quantile_sample_buckets_and_rates(spark):
    """Quartile cutpoints: top quartile → head (kept whole at rate 1.0),
    middle half → mid, bottom quartile → tail; gate is deterministic."""
    from graphydb_spark.operators.pipeline import quantile_sample
    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = quantile_sample(df, "score", "doc_id").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["doc_id"])
    # head = scores >= p75 (74.25) → ids 75..99, all kept (rate 1.0)
    assert sorted(by_bucket["head"]) == list(range(75, 100))
    # mid/tail thinned by the hash gate but non-empty and disjoint
    assert 0 < len(by_bucket["mid"]) < 50
    assert 0 < len(by_bucket["tail"]) < 25
    assert not (set(by_bucket["mid"]) & set(by_bucket["tail"]))
    again = quantile_sample(df, "score", "doc_id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_weighted_sample_aes_invariants(spark):
    """A-ES weighted sampling: deterministic, without replacement,
    zero-weight rows lose to any positive weight, and a heavy weight
    beats a light one more often than not across key saltings."""
    from graphydb_spark.operators.pipeline import weighted_sample
    from pyspark.sql import functions as F
    rows = [(i, 1000.0 if i % 10 == 0 else 1.0) for i in range(100)]
    rows += [(900 + i, 0.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, w double")
    top = weighted_sample(df, "w", "k", n=50)
    got = [r["k"] for r in top.collect()]
    assert len(got) == len(set(got)) == 50
    assert not any(k >= 900 for k in got)           # zero weights excluded
    heavy = [k for k in got if k % 10 == 0 and k < 900]
    # the 10 heavy rows have u^(1/1000) ~ 1; all should make a top-50 cut
    assert len(heavy) == 10
    again = [r["k"] for r in weighted_sample(df, "w", "k", n=50).collect()]
    assert got == again                              # deterministic


def test_source_reputation_gates_whole_domains(spark):
    """Domain-level gate: a natural-text source passes, a keyword-soup
    source is dropped wholesale, a tiny source fails min_docs even with
    good text; the corpus filter keeps only kept-source docs."""
    from graphydb_spark.operators.pipeline import (
        filter_by_source_reputation, source_reputation)
    natural = "the cat sat on the mat and the dog is in the house for a while"
    soup = "keyword spam spam buy now click here best cheap deal offer"
    rows = ([(i, natural, "good") for i in range(6)]
            + [(10 + i, soup, "spam") for i in range(6)]
            + [(20, natural, "tiny")])
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = source_reputation(df, min_mean_ratio=0.2, min_docs=3)
    by_src = {r["source"]: (r["kept"], r["n_docs"]) for r in rep.collect()}
    assert by_src["good"] == (True, 6)
    assert by_src["spam"][0] is False
    assert by_src["tiny"] == (False, 1)
    kept = filter_by_source_reputation(df, rep)
    assert {r["source"] for r in kept.collect()} == {"good"}
    assert kept.count() == 6


def test_bigram_logprob_word_order_sensitivity(spark):
    """The claim that justifies the operator: a doc with corpus-typical
    word ORDER outscores a doc with the same unigram histogram but
    scrambled order."""
    from graphydb_spark.operators.pipeline import bigram_logprob
    natural = "the cat sat on the mat"
    rows = [(i, natural) for i in range(8)]
    rows.append((100, natural))                      # in-distribution
    rows.append((101, "mat the on sat cat the"))     # same bag, wrong order
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bigram_logprob"]
           for r in bigram_logprob(df, lam=0.7).collect()}
    assert out[100] > out[101]
    again = {r["doc_id"]: r["bigram_logprob"]
             for r in bigram_logprob(df, lam=0.7).collect()}
    assert out == again                              # deterministic


def test_temperature_mixture_flattens_skew(spark):
    """α=0.5 on a 1600-vs-100 skew: the tail source is kept whole, the
    head thins toward sqrt-proportional share, totals deterministic."""
    from pyspark.sql import functions as F

    from graphydb_spark.operators.pipeline import temperature_mixture
    df = (spark.range(1700)
          .select(F.col("id").alias("doc_id"),
                  F.when(F.col("id") < 1600, "head").otherwise("tail")
                  .alias("source")))
    out = temperature_mixture(df, "source", "doc_id", alpha=0.5)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["tail"] == 100                 # bottleneck kept whole
    # head target = C * w_head / n_head with w ∝ sqrt(n):
    # C = n_tail/w_tail → expected head ≈ 100*sqrt(16) = 400
    assert 320 <= counts["head"] <= 480          # hash-gate tolerance
    # deterministic: rerun produces the identical selection
    again = temperature_mixture(df, "source", "doc_id", alpha=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_grouped_split_keeps_groups_intact(spark):
    from pyspark.sql import functions as F

    from graphydb_spark.operators.pipeline import grouped_split
    df = spark.createDataFrame(
        [(i, f"src{i % 7}") for i in range(700)],
        "doc_id long, source string")
    out = grouped_split(df, "source", val=0.3, test=0.3)
    per_source = (out.groupBy("source")
                  .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_source)   # no group straddles
    assert out.select("split").distinct().count() >= 2


def test_priority_sample_weighted_and_deterministic(spark):
    """Heavier rows must be sampled far more often, and the draw must
    be a pure function of (key, salt) — identical across reruns and
    partitionings."""
    from graphydb_spark.operators.pipeline import priority_sample
    rows = [(i, 1000 if i < 50 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = {r["doc_id"] for r in priority_sample(df, "w", 100).collect()}
    s2 = {r["doc_id"] for r in
          priority_sample(df.repartition(7), "w", 100).collect()}
    assert s1 == s2                      # partitioning-invariant
    heavy = sum(1 for d in s1 if d < 50)
    # 50 rows carry 1000x weight of the other 950: essentially all
    # heavy rows must be drawn
    assert heavy >= 45
    s3 = {r["doc_id"]
          for r in priority_sample(df, "w", 100, salt="other").collect()}
    assert s1 != s3                      # salt changes the draw


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs written in the target slice's vocabulary must outrank
    docs in the off-target vocabulary."""
    from graphydb_spark.operators.pipeline import dsir_select
    from pyspark.sql import functions as F
    tgt_text = "science research method theory data analysis result"
    off_text = "buy cheap deal sale discount offer price shop"
    rows = ([(i, tgt_text, "en") for i in range(10)]
            + [(i + 10, off_text, "xx") for i in range(10)]
            # unlabeled docs, half target-like, half off-target
            + [(100, tgt_text + " extra", "zz"),
               (101, off_text + " extra", "zz")])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    top = [r["doc_id"] for r in
           dsir_select(df, F.col("lang") == "en", n=12).collect()]
    assert 100 in top          # target-like unlabeled doc selected
    assert 101 not in top      # off-target unlabeled doc rejected


def test_token_budget_mixture(spark):
    """Budget semantics: an over-budget source thins to ~its token
    budget in expectation, an under-budget source survives WHOLE, and
    unbudgeted sources drop; the gate is deterministic (same rows on
    re-run)."""
    from graphydb_spark.operators.pipeline import token_budget_mixture
    rows = ([(i, "big", 100) for i in range(2000)]          # 200k tokens
            + [(10_000 + i, "small", 100) for i in range(50)]  # 5k
            + [(20_000 + i, "other", 100) for i in range(50)])
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars int")
    out = token_budget_mixture(
        df, "source", {"big": 20_000.0, "small": 100_000.0}, "doc_id")
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    assert "other" not in by                       # unbudgeted dropped
    assert by["small"] == 50                       # under budget: whole
    # big: rate 0.1 → ~200 docs (binomial; generous band)
    assert 120 <= by["big"] <= 280
    again = token_budget_mixture(
        df, "source", {"big": 20_000.0, "small": 100_000.0}, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == \
           sorted(r.doc_id for r in again.collect())
