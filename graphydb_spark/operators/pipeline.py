"""Training-data pipeline operators: sampling, mixing, packing, redaction.

Beyond-reference extensions (SURVEY.md §7.3) over the driver's
``documents`` table — the corpus-construction steps of an LLM data
pipeline.  Everything is JVM-side built-ins (md5 / regexp_replace /
window cumsum), no Python UDFs, so the operators stay inside
whole-stage codegen and scale linearly; the only shuffles are the
ones the semantics require (a count per stratum, a per-partition sort
for packing).

Determinism contract: all sampling is *hash-gated* — a row's fate is
``md5(key)`` against a rate-derived threshold, so results are identical
across engines, partitionings, reruns, and cluster sizes.  This is the
property `TABLESAMPLE`/`rand()` lack and a training pipeline needs for
stable holdout splits and reproducible mixes.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16-bit hash-prefix space for rate thresholds (4 hex chars)
_HASH_SPACE = 65536


def _hash_prefix(key_col) -> F.Column:
    return F.substring(F.md5(key_col.cast("string")), 1, 4)


def _keeps(key_col, rate_col) -> F.Column:
    """keep ⇔ first 16 bits of md5(key) < floor(rate·2^16).

    The threshold is rendered as a 4-hex-char string with %04x and
    compared lexicographically (hex of a fixed width orders like the
    integer) — portable to any engine with printf-style formatting, no
    hex→int parse needed.  ``rate ≥ 1`` keeps everything (the threshold
    string would be 5 chars and mis-compare, so it is special-cased).
    """
    thresh = F.format_string(
        "%04x", F.floor(rate_col * _HASH_SPACE).cast("int"))
    return (rate_col >= 1.0) | (_hash_prefix(key_col) < thresh)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], key_col: str,
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. per-language rates).

    A narrow filter — no shuffle, no second pass; strata not named in
    ``rates`` get ``default_rate``.
    """
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))) \
                .otherwise(rate)
    return df.where(_keeps(F.col(key_col), rate))


def balanced_sample(df: DataFrame, group_col: str, key_col: str,
                    per_group: int) -> DataFrame:
    """Uniform-coverage sampling: keep ~``per_group`` rows of EVERY
    group — diversity sampling (e.g. over embedding clusters, so a
    dominant content cluster can't drown the tails in a training mix).

    ``rate_g = min(1, per_group / n_g)`` — small groups survive whole,
    big groups thin to the target.  Execution: one tiny count aggregate
    broadcast back, then the hash-gated narrow filter; the corpus is
    never shuffled, so this is 100 TB-safe and reproducible at any
    parallelism.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    rates = counts.select(
        group_col,
        F.least(F.lit(1.0),
                F.lit(float(per_group)) / F.col("_n")).alias("_rate"))
    return (df.join(F.broadcast(rates), group_col)
              .where(_keeps(F.col(key_col), F.col("_rate")))
              .drop("_rate"))


def mixture_sample(df: DataFrame, source_col: str,
                   weights: dict[str, float], key_col: str) -> DataFrame:
    """Down-sample to target source proportions (training-mix step).

    Given target weights ``w_s`` and observed counts ``n_s``, the largest
    mixture achievable without upsampling keeps
    ``r_s = C·w_s/n_s`` rows of source *s*, where ``C = min_s n_s/w_s``
    (the bottleneck source is kept whole).  Execution: one tiny count
    aggregate (broadcast back), then a narrow hash-gated filter — the
    corpus itself is never shuffled, so this is 100 TB-safe.
    """
    total_w = sum(weights.values())
    wmap = F.create_map(*[F.lit(x) for kv in weights.items()
                          for x in (kv[0], float(kv[1]) / total_w)])
    counts = (df.groupBy(source_col).agg(F.count("*").alias("_n"))
                .withColumn("_w", wmap[F.col(source_col)])
                .where(F.col("_w").isNotNull()))
    # cap = min over sources, taken as an empty-frame window on the tiny
    # counts frame (≤ #sources rows): one plan, no separate scalar job —
    # measured 0.49 → 0.29 s at sf0.1 vs a crossJoin(broadcast(agg))
    rates = (counts.withColumn(
        "_cap", F.min(F.col("_n") / F.col("_w")).over(Window.partitionBy()))
        .select(source_col,
                (F.col("_cap") * F.col("_w") / F.col("_n"))
                .alias("_rate")))
    return (df.join(F.broadcast(rates), source_col)
              .where(_keeps(F.col(key_col), F.col("_rate")))
              .drop("_rate"))


def token_budget_mixture(df: DataFrame, source_col: str,
                         budgets: dict[str, float], key_col: str,
                         token_col: str = "n_chars") -> DataFrame:
    """Down-sample each source to a TOKEN budget — how real training
    mixtures are specified ("give me 200 B tokens of web, 30 B of
    code"), versus :func:`mixture_sample`'s proportional doc rates.

    ``rate_s = min(1, budget_s / tokens_s)`` keeps each source's
    expected token mass at its budget (sources under budget survive
    whole; sources absent from ``budgets`` are dropped).  Execution is
    the house shape: one tiny per-source token-sum aggregate broadcast
    back, then the deterministic hash-gated narrow filter — the corpus
    is never shuffled, reproducible at any parallelism, 100 TB-safe.
    Expectation-level budgeting is deliberate: an exact cut needs a
    global running sum (one sort-shuffle — :func:`priority_sample` /
    :func:`pack_shards` territory) and breaks hash-gate determinism
    under appends."""
    bmap = F.create_map(*[F.lit(x) for kv in sorted(budgets.items())
                          for x in (kv[0], float(kv[1]))])
    tot = (df.groupBy(source_col)
             .agg(F.sum(F.col(token_col).cast("double")).alias("_tok"))
             .withColumn("_b", bmap[F.col(source_col)])
             .where(F.col("_b").isNotNull()))
    rates = tot.select(
        source_col,
        F.least(F.lit(1.0), F.col("_b") / F.col("_tok")).alias("_rate"))
    return (df.join(F.broadcast(rates), source_col)
              .where(_keeps(F.col(key_col), F.col("_rate")))
              .drop("_rate"))


def _global_cum_before(df: DataFrame, id_col: str, weight_col) -> DataFrame:
    """Append ``_cum_before`` = running total of ``weight_col`` over the
    global ``id_col`` order, terasort-style: range-partition on the id,
    per-partition window cumsum, per-partition offsets from a
    partition-count-sized aggregate.  Two balanced shuffles; never a
    partitionless window funneling the dataset through one task."""
    w_col = weight_col if isinstance(weight_col, F.Column) \
        else F.col(weight_col)
    sorted_df = (df.withColumn("_w", w_col)
                 .repartitionByRange(F.col(id_col))
                 .sortWithinPartitions(id_col)
                 .withColumn("_pid", F.spark_partition_id())
                 .localCheckpoint(eager=True))
    ptot = sorted_df.groupBy("_pid").agg(F.sum("_w").alias("_t")).collect()
    acc = 0
    offs = []
    for row in sorted(ptot, key=lambda r: r["_pid"]):
        offs.append((row["_pid"], acc))
        acc += row["_t"]
    off_df = df.sparkSession.createDataFrame(offs, "_pid INT, _poff LONG")
    w = (Window.partitionBy("_pid").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (sorted_df.join(F.broadcast(off_df), "_pid")
            .withColumn("_cum_before",
                        F.col("_poff") + F.sum("_w").over(w) - F.col("_w"))
            .drop("_pid", "_poff", "_w"))


def pack_shards(df: DataFrame, id_col: str, token_col,
                budget: int, partition_col: str | None = None) -> DataFrame:
    """Assign rows to fixed-token-budget output shards.

    Rows are laid out in deterministic ``id_col`` order (within
    ``partition_col`` if given — e.g. one shard sequence per language)
    and a shard boundary falls every ``budget`` cumulative tokens:
    ``shard_id = floor(tokens_before_this_row / budget)``.  With inputs
    pre-chunked to ≤ budget (chunk_documents), every shard holds
    budget ± one-chunk tokens — the standard block-packing step that
    turns a document table into training shards.

    With a partition column: one sort-shuffle keyed on it, cumsum as a
    single window pass (AQE splits skewed keys).  Without one, the
    global running total uses the terasort shape (_global_cum_before) —
    a partitionless window would funnel the corpus through one task.
    """
    toks = token_col if isinstance(token_col, F.Column) else F.col(token_col)
    if partition_col is None:
        return (_global_cum_before(df, id_col, toks)
                .withColumn("shard_id",
                            F.floor(F.col("_cum_before") / budget)
                            .cast("long"))
                .drop("_cum_before"))
    w = (Window.partitionBy(partition_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (df.withColumn("_cum", F.sum(toks).over(w))
             .withColumn("shard_id",
                         F.floor((F.col("_cum") - toks) / budget)
                          .cast("long"))
             .drop("_cum"))
    return out


def pii_redact(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Mask emails, North-American phone numbers, and IPv4 addresses.

    Three chained JVM-side ``regexp_replace`` passes (patterns restricted
    to the RE2 ∩ java.util.regex common dialect so the DuckDB oracle can
    replay them verbatim).  A stand-in for model-based PII tagging; at
    scale this is a narrow map over the corpus, no shuffle.
    """
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
    ipv4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
    col = F.col(text_col)
    col = F.regexp_replace(col, email, "<EMAIL>")
    col = F.regexp_replace(col, phone, "<PHONE>")
    col = F.regexp_replace(col, ipv4, "<IP>")
    return df.withColumn(out_col, col)


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", min_chars: int = 16,
               sep: str = "\n") -> DataFrame:
    """C4-style line-level dedup: a line appearing in multiple documents
    survives only at its first corpus occurrence (lowest ``(doc_id,
    line_no)``); every other copy — including repeats inside one
    document — is dropped, and documents are reassembled from their
    surviving lines.  Returns ``(doc_id, clean_text, n_kept,
    n_dropped)``.

    Lines shorter than ``min_chars`` are never dedup candidates (boiler-
    plate blanks/bullets would otherwise vanish corpus-wide except one).

    Scale shape: the winner election shuffles ``(md5, doc_id, line_no)``
    — 48-byte rows, never text; the only wide rows move in the final
    per-document reassembly, partitioned by ``doc_id``.  Both shuffles
    are skew-safe (line-hash keys are near-unique; doc keys are
    bounded by document size).  All JVM built-ins, so the whole op stays
    in whole-stage codegen and the DuckDB oracle replays it verbatim.
    """
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep))
                 .alias("line_no", "line"))
    cand = lines.where(F.length("line") >= min_chars)
    winners = (cand.groupBy(F.md5(F.col("line")).alias("h"))
               .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                   F.col("line_no").alias("p")))
                    .alias("w")))
    flagged = (lines
               .withColumn("h", F.when(F.length("line") >= min_chars,
                                       F.md5(F.col("line"))))
               .join(winners, "h", "left")
               .withColumn("keep",
                           F.col("h").isNull()
                           | ((F.col("w.d") == F.col(id_col))
                              & (F.col("w.p") == F.col("line_no")))))
    kept_struct = F.when(F.col("keep"), F.struct("line_no", "line"))
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept_struct)),
                                 lambda s: s["line"]),
                     sep).alias("clean_text"),
                 F.sum(F.when(F.col("keep"), 1).otherwise(0))
                  .alias("n_kept"),
                 F.sum(F.when(~F.col("keep"), 1).otherwise(0))
                  .alias("n_dropped")))


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_tokens: int = 20, max_tokens: int = 100_000,
                   min_avg_len: float = 2.0, max_avg_len: float = 12.0,
                   max_symbol_ratio: float = 0.10,
                   min_stopword_hits: int = 2) -> DataFrame:
    """Gopher-style rule-based document quality gate.

    Emits per-rule booleans plus an overall ``keep`` — pipelines want the
    per-rule attrition stats, not just the survivors.  Rules (public
    Gopher/C4-style heuristics): token-count band, mean-token-length
    band, symbol-to-char ratio cap, minimum english-stopword hits.
    Pure JVM expressions over one pass of the text column.

    The token array is materialized in its OWN projection (round 9):
    the rules reference it four times, and interpreted HOF expressions
    get no common-subexpression elimination, so an inline ``tokens()``
    re-ran split+lower+filter per reference (the shingled() lesson);
    the multi-referenced non-cheap alias is never inlined back by
    CollapseProject.  Dropped before returning, so the output schema
    is unchanged — and a consumer that prunes the rule columns (e.g. a
    bare count) prunes the token column with them.
    """
    from .text import STOPWORDS, compute_once, tokens

    # temp token column: uniquified against the caller's frame so a
    # pre-existing column of the same name is never silently overwritten
    # and dropped from the output (advice r9)
    tok_col = "_qf_toks"
    while tok_col in df.columns:
        tok_col += "_"
    # compute_once (round 10): without it, a downstream ``where(keep)``
    # lets filter pushdown substitute the alias chain and re-derive the
    # token walk once PER RULE inside the scan's filter (measured: six
    # split+lower+filter walks per row, single-task — the whole ×10
    # corpus_pipeline wall), defeating both the round-9 single-tokenize
    # projection and any spread exchange above the scan.
    df = df.withColumn(tok_col, compute_once(tokens(F.col(text_col))))
    toks = F.col(tok_col)
    n = F.size(toks)
    avg_len = (F.length(F.concat_ws("", toks)) /
               F.greatest(n, F.lit(1))).cast("double")
    symbols = F.length(F.regexp_replace(
        F.col(text_col), r"[A-Za-z0-9\s]", ""))
    sym_ratio = (symbols /
                 F.greatest(F.length(F.col(text_col)), F.lit(1))
                 ).cast("double")
    swarr = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(swarr, t)))

    rules = {
        "ok_tokens": (n >= min_tokens) & (n <= max_tokens),
        "ok_avg_len": (avg_len >= min_avg_len) & (avg_len <= max_avg_len),
        "ok_symbols": sym_ratio <= max_symbol_ratio,
        "ok_stopwords": sw_hits >= min_stopword_hits,
    }
    out = df
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep).drop(tok_col)


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Self-trained unigram LM score per document: mean log10 token
    probability with add-one smoothing over the corpus vocabulary — the
    cheap stand-in for LM-perplexity quality filtering (CCNet-style);
    low scores flag keyword soup and gibberish.

    Execution: one corpus-wide token count (map-side combined), the
    frequency table broadcasts back (vocabulary ≪ corpus at any scale),
    one per-doc aggregation.  Per-token logprobs are rounded to 6 dp
    and summed as DECIMAL so the per-doc mean is order-independent —
    bit-stable under Spark's partial aggregation AND replayable by an
    engine-independent SQL twin (double summation order is neither).
    """
    from .text import tokens

    toks = (df.select(id_col, F.explode(tokens(F.col(text_col)))
                      .alias("tok")))
    # materialize the vocabulary once: without this the corpus is
    # re-tokenized for the frequency table, again for its totals, and a
    # third time for scoring (three full passes); checkpointed, the
    # totals are a scan of the tiny vocab frame and scoring is the only
    # other corpus pass
    freq = (toks.groupBy("tok").agg(F.count("*").alias("tf"))
            .localCheckpoint(eager=True))
    srow = freq.agg(F.sum("tf").alias("total"),
                    F.count("*").alias("vocab")).collect()[0]
    denom = float((srow["total"] or 0) + (srow["vocab"] or 0)) or 1.0
    lp = (F.round(F.log10((F.col("tf") + 1).cast("double") / denom), 6)
          .cast("decimal(18,6)"))
    scored = (toks
              .join(F.broadcast(freq), "tok")
              .groupBy(id_col)
              .agg(F.round(F.sum(lp).cast("double") / F.count("*"), 6)
                   .alias("logprob"),
                   F.count("*").cast("long").alias("n_tokens")))
    return scored


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lam: float = 0.7) -> DataFrame:
    """Self-trained interpolated bigram LM score per document
    (Jelinek–Mercer smoothing): mean log10 of
    ``λ·p_bigram(w|prev) + (1-λ)·p_unigram(w)`` over the doc's bigram
    positions — a sharper gibberish/boilerplate signal than
    :func:`unigram_logprob` because word ORDER now matters (shuffled
    text keeps its unigram score but craters here).

    ``p_bigram = c(prev,w)/c(prev,·)`` (exact ML from the corpus bigram
    table), ``p_unigram`` add-one smoothed.  Execution: one tokenize
    pass feeds both count tables (map-side combined); scoring joins the
    bigram stream against the bigram/context/unigram tables on narrow
    string keys — plain shuffled equi-joins, so a 100 TB corpus works
    even when the bigram vocabulary outgrows broadcast.  Per-position
    logprobs round to 6 dp and sum as DECIMAL — order-independent,
    bit-stable, SQL-replayable (same idiom as unigram_logprob).
    """
    from .text import tokens

    toksed = (df.select(id_col, tokens(F.col(text_col)).alias("_t"))
              .where(F.size("_t") >= 2)
              .localCheckpoint(eager=True))
    # gram expansion stays the interpreted transform/element_at walk: a
    # posexplode+lead window twin (the _sig_rows 'window' shape) was
    # A/B'd round 9 and measured WORSE here (0.78-0.86 s → 0.90-1.62 s
    # same-session) — the grams feed three shuffled joins, so the
    # window's extra exchange+sort outweighs the lambda cost it saves,
    # unlike the probe-signing path where the window reuses the
    # aggregation's own partitioning.
    grams = (toksed.select(
        id_col,
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("_t") - 1),
            lambda i: F.struct(
                F.element_at(F.col("_t"), i).alias("prev"),
                F.element_at(F.col("_t"), i + 1).alias("cur"))))
        .alias("g"))
        .select(id_col, "g.prev", "g.cur"))
    uni = (toksed.select(F.explode("_t").alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("tf"))
           .localCheckpoint(eager=True))
    srow = uni.agg(F.sum("tf").alias("total"),
                   F.count("*").alias("vocab")).collect()[0]
    denom = float((srow["total"] or 0) + (srow["vocab"] or 0)) or 1.0
    bi = (grams.groupBy("prev", "cur").agg(F.count("*").alias("bc"))
          .localCheckpoint(eager=True))
    ctx = bi.groupBy("prev").agg(F.sum("bc").alias("cc"))
    p = (F.lit(float(lam)) * F.col("bc").cast("double") / F.col("cc")
         + F.lit(1.0 - float(lam))
         * (F.col("tf") + 1).cast("double") / F.lit(denom))
    lp = F.round(F.log10(p), 6).cast("decimal(18,6)")
    return (grams
            .join(bi, ["prev", "cur"])
            .join(ctx, "prev")
            .join(uni.withColumnRenamed("tok", "cur"), "cur")
            .groupBy(id_col)
            .agg(F.round(F.sum(lp).cast("double") / F.count("*"), 6)
                 .alias("bigram_logprob"),
                 F.count("*").cast("long").alias("n_bigrams")))


def quantile_sample(df: DataFrame, score_col: str, key_col: str,
                    rates: tuple[float, float, float] = (1.0, 0.5, 0.1)
                    ) -> DataFrame:
    """CCNet-style quality-bucketed sampling: the exact 25th/75th score
    percentiles split the corpus into head (top quartile) / middle /
    tail bands, each kept at its own deterministic hash-gated rate —
    keep the most-natural text whole, thin the noise.

    Adds ``bucket`` and filters to the kept rows.  Execution: ONE
    single-column exact-percentile aggregate (narrow: only the score
    shuffles) joined back as a 1-row broadcast, then the hash-gated
    narrow filter — the corpus itself is never shuffled.  0.25/0.75 are
    exactly representable doubles and the score is pre-rounded by its
    producer, so the cutpoints (and therefore the band of every row)
    reproduce bit-for-bit in any engine with interpolated quantiles.
    """
    cuts = df.agg(F.expr(
        f"percentile({score_col}, array(0.25, 0.75))").alias("_cs"))
    r_head, r_mid, r_tail = (float(r) for r in rates)
    bucket = (F.when(F.col(score_col) >= F.col("_cs")[1], "head")
               .when(F.col(score_col) >= F.col("_cs")[0], "mid")
               .otherwise("tail"))
    rate = (F.when(F.col("bucket") == "head", r_head)
             .when(F.col("bucket") == "mid", r_mid)
             .otherwise(r_tail))
    return (df.join(F.broadcast(cuts))
              .withColumn("bucket", bucket)
              .where(_keeps(F.col(key_col), rate))
              .drop("_cs"))


def source_reputation(df: DataFrame, source_col: str = "source",
                      text_col: str = "text",
                      min_mean_ratio: float = 0.05,
                      min_docs: int = 1) -> DataFrame:
    """Domain/source-level quality gating — the URL-level stage of the
    published web-corpus recipes (C4 / RefinedWeb filter whole domains,
    not just documents): per-source document count and mean stopword
    ratio, with ``kept`` false for sources below ``min_mean_ratio`` or
    ``min_docs`` → ``(source, n_docs, mean_ratio, kept)``.

    The mean is the quantized-integer mean (round(r·1e9) → exact BIGINT
    sum → one double divide), bit-stable at any parallelism and
    engine-replayable.  One narrow map + one map-side-combinable
    aggregate on the source key; the result is domain-sized (tiny), so
    :func:`filter_by_source_reputation` applies it as a broadcast
    semi-join — the corpus itself never shuffles.
    """
    from .text import quality_score
    scored = quality_score(df, text_col).select(source_col,
                                                "stopword_ratio")
    q = F.round(F.col("stopword_ratio") * 1e9).cast("long")
    stats = (scored.groupBy(source_col)
             .agg(F.count("*").cast("long").alias("n_docs"),
                  (F.sum(q).cast("double")
                   / (F.lit(1e9) * F.count("*"))).alias("mean_ratio")))
    return stats.withColumn(
        "kept", (F.col("mean_ratio") >= min_mean_ratio)
                & (F.col("n_docs") >= min_docs))


def filter_by_source_reputation(df: DataFrame, reputation: DataFrame,
                                source_col: str = "source") -> DataFrame:
    """Drop every document of a not-kept source (broadcast semi-join;
    the corpus stays unshuffled)."""
    keep = reputation.where(F.col("kept")).select(source_col)
    return df.join(F.broadcast(keep), source_col, "left_semi")


def weighted_sample(df: DataFrame, weight_col, key_col: str,
                    n: int) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis–Spirakis A-ES reservoir, PIS 2006): each row draws a
    uniform ``u ∈ [0,1)`` from the first 60 bits of ``md5(key)`` and
    scores ``u^(1/w)``; the global top-``n`` scores are the sample —
    inclusion probability proportional to weight, exactly the
    distributed one-pass weighted reservoir.

    Returns ``(key, weight, score)`` for the selected rows.  Execution:
    a narrow map + TakeOrdered top-n (each partition keeps ≤ n rows, no
    global sort, corpus never shuffled) — the same plan shape at 100 TB.
    Rows with non-positive weight score 0 and lose every comparison.
    ``weight_col`` may be a name or a Column expression (e.g. a token
    count).  Cross-engine determinism: u is hash-derived and the rank
    key is ``round(score, 12)`` with the row key as tiebreak — libm
    ``pow`` is only 1-ulp-reproducible across engines, so ranking on
    the quantized score (ties broken by key) keeps the selected SET
    identical even when the last bits of pow() differ; only a true
    value sitting within 1 ulp of a 0.5e-12 rounding boundary could
    diverge.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    from .text import hash60
    u = (hash60(F.col(key_col).cast("string")).cast("double")
         / F.lit(float(1 << 60)))
    score = F.when(w > 0, F.pow(u, F.lit(1.0) / w.cast("double"))) \
             .otherwise(F.lit(0.0))
    return (df.select(F.col(key_col),
                      w.cast("double").alias("weight"),
                      score.alias("score"))
              .orderBy(F.round(F.col("score"), 12).desc(), F.col(key_col))
              .limit(n))


def write_clustered(df: DataFrame, path: str, sort_cols: list[str],
                    num_files: int | None = None) -> None:
    """Cluster-sorted parquet layout for data skipping — the 100 TB
    substitute for a secondary index.

    Range-partitions the frame on ``sort_cols`` and sorts within each
    partition, so every output file (and parquet row group) covers a
    tight, non-overlapping value range.  Parquet footers carry min/max
    stats per row group; any engine (Spark, DuckDB, Trino) prunes files
    and row groups whose range can't match a predicate on the cluster
    key — a selective range scan reads O(selectivity) bytes instead of
    the whole corpus.  ``repartitionByRange`` samples the key
    distribution, so skew produces balanced files, not one hot file.
    """
    out = (df.repartitionByRange(num_files, *sort_cols) if num_files
           else df.repartitionByRange(*sort_cols))
    (out.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite").parquet(path))


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          token_col, budget: int,
                          partition_col: str | None = None) -> None:
    """Materialize token-budget shards as a partitioned parquet dataset:
    ``path/[partition=…/]shard_id=N/`` with ONE file per shard, rows in
    ``id_col`` order inside each file (training readers stream shards
    sequentially; a shard split across many small files defeats the
    packing).

    The repartition keys on (partition, shard) so each output directory
    is written by exactly one task; ``sortWithinPartitions`` restores
    document order after the shuffle.  This is the standard
    distributed-writer layout — at cluster scale every shard file is
    written in parallel, no driver involvement.
    """
    packed = pack_shards(df, id_col, token_col, budget, partition_col)
    keys = ([partition_col] if partition_col else []) + ["shard_id"]
    (packed
     .repartition(*[F.col(k) for k in keys])
     .sortWithinPartitions(id_col)
     .write.mode("overwrite").partitionBy(*keys).parquet(path))


def global_shuffle(df: DataFrame, key_col: str, seed: str = "0") -> DataFrame:
    """Deterministic corpus-order randomization: ``shuffle_rank`` =
    dense position under ``md5(seed ‖ key)`` ordering.  Training wants
    documents in a reproducible pseudo-random order decorrelated from
    ingestion order; keying the sort on a seeded hash gives the same
    permutation on any engine/cluster/partitioning, and changing the
    seed reshuffles.

    Execution is the classic terasort shape: range-partition on the
    hash, sort within partitions, then turn per-partition positions
    into global ranks by adding per-partition offsets (a
    partition-count-sized aggregate collected to the driver — NOT a
    partitionless window, which would funnel the whole dataset through
    one task).  ``monotonically_increasing_id`` on the sorted frame
    encodes (partition, position) as ``pid·2³³ + pos``, so the rank is
    pure arithmetic; ranks are globally correct for any split points
    because range partitions are themselves ordered.
    """
    h = F.md5(F.concat(F.lit(str(seed) + ":"),
                       F.col(key_col).cast("string")))
    sorted_df = (df.withColumn("_h", h)
                 .repartitionByRange(F.col("_h"), F.col(key_col))
                 .sortWithinPartitions("_h", key_col)
                 .withColumn("_mid", F.monotonically_increasing_id())
                 .localCheckpoint(eager=True))
    pid = F.shiftright("_mid", 33)
    pos = F.col("_mid").bitwiseAND((1 << 33) - 1)
    counts = (sorted_df.groupBy(pid.alias("_pid"))
              .agg(F.count("*").alias("_n"))
              .collect())                      # one row per partition
    acc = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_n"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_pid INT, _off LONG")
    return (sorted_df
            .withColumn("_pid", pid.cast("int"))
            .join(F.broadcast(off_df), "_pid")
            .withColumn("shuffle_rank",
                        (F.col("_off") + pos + 1).cast("long"))
            .drop("_h", "_mid", "_pid", "_off"))


def train_val_test_split(df: DataFrame, key_col: str,
                         val: float = 0.05, test: float = 0.05) -> DataFrame:
    """Hash-banded holdout split: ``split`` ∈ {train, val, test} by the
    16-bit md5 prefix of the key — stable across reruns, engines, and
    data growth (a document keeps its split forever; new documents
    distribute proportionally).  Pure narrow map; band edges are
    compile-time hex literals so any engine replays them with a string
    compare (no hex→int parsing)."""
    import math

    val_t = f"{math.ceil(val * _HASH_SPACE):04x}"
    test_t = f"{math.ceil((val + test) * _HASH_SPACE):04x}"
    p = _hash_prefix(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(p < val_t, "val")
         .when(p < test_t, "test")
         .otherwise("train"))


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   seq_len: int, truncate: bool = True) -> DataFrame:
    """Sequence packing: concatenate documents (in deterministic id
    order) into fixed ``seq_len``-token training sequences, emitting one
    row per (sequence, document) with the document's token offset inside
    its sequence — the metadata a packed-attention loader needs to mask
    cross-document attention.

    Boundary documents (straddling a multiple of ``seq_len``) belong to
    the sequence their FIRST token falls in; with ``truncate`` the
    carried token count is clipped to the sequence end (the standard
    drop-remainder packing), else the full count is reported.

    The global running token total is computed terasort-style (the same
    shape as global_shuffle): range-partition on the id, per-partition
    window cumsum, plus per-partition token offsets from a
    partition-count-sized aggregate — never a partitionless window
    funneling the corpus through one task.
    """
    base = _global_cum_before(
        df.select(F.col(id_col), F.col(token_col).alias("n_tok")),
        id_col, "n_tok")
    cum = F.col("_cum_before")
    out = base.select(
        F.col(id_col), F.col("n_tok"),
        F.floor(cum / seq_len).cast("long").alias("seq_id"),
        (cum % seq_len).cast("long").alias("offset"))
    kept = F.least(F.col("n_tok"),
                   F.lit(seq_len) - F.col("offset")) if truncate \
        else F.col("n_tok")
    return out.select(id_col, "seq_id", "offset",
                      kept.cast("long").alias("n_tok"))


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = 16) -> F.Column:
    """Z-order (Morton) interleave key over ``cols``: each column
    min-max-normalizes to a ``bits``-bit integer rank, and the bits
    interleave into one BIGINT.  Sorting by this key clusters the data
    on ALL the columns at once, so parquet min/max footer pruning works
    for predicates on any of them — the multi-dimensional upgrade of
    :func:`write_clustered`'s single-key layout (what lakehouse engines
    call Z-ORDER BY).

    One tiny min/max aggregate per call (collected; broadcast as
    literals); the key itself is a pure codegen expression.
    """
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} columns × {bits} bits = {len(cols) * bits} "
            "interleave bits — exceeds the 63 usable bits of the BIGINT "
            "key (shiftleft would wrap mod 64); lower bits or cols")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    scaled = []
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
                    * F.lit((1 << bits) - 1)).cast("long"))
        scaled.append(q)
    # interleave: output bit (b*len + i) takes bit b of column i
    key = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, q in enumerate(scaled):
            key = key + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i)
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   num_files: int, bits: int = 16) -> None:
    """Write parquet Z-ordered on ``cols``: range-partition + sort by
    the Morton key so each file covers a tight hyper-rectangle — range
    predicates on ANY of the z-columns prune files via footer min/max
    stats (verified in tests by reading the footers back)."""
    key = zorder_key(df, cols, bits)
    (df.withColumn("__z", key)
       .repartitionByRange(num_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def compact_table(spark, path: str, target_file_mb: int = 128) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(bytes / target)`` files (the lakehouse OPTIMIZE maintenance
    pass — streaming ingests and fine-grained merges strand thousands
    of tiny files whose per-file open/footer cost dominates scans at
    100 TB).  Returns the new file count.

    Failure contract: the rewrite stages into a sibling directory, so a
    failed WRITE never touches the table.  The swap itself is two
    renames (plain filesystems have no atomic directory swap): a crash
    between them leaves the data intact in ``<path>.__old`` +
    ``<path>.__compacting`` (never lost, manual rename recovers), and a
    failed second rename is rolled back automatically.  On a real
    deployment, readers racing the swap should go through a catalog /
    table format — this is the maintenance primitive, not a lock
    manager."""
    import math
    import shutil

    root = Path(path)
    n_bytes = sum(p.stat().st_size
                  for p in root.rglob("*.parquet") if p.is_file())
    n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
    staged = str(root.with_name(root.name + ".__compacting"))
    (spark.read.parquet(path).repartition(n_files)
     .write.mode("overwrite").parquet(staged))
    backup = root.with_name(root.name + ".__old")
    shutil.rmtree(backup, ignore_errors=True)
    root.rename(backup)
    try:
        Path(staged).rename(root)
    except OSError:
        backup.rename(root)        # roll the table back into place
        raise
    shutil.rmtree(backup)
    return n_files


def temperature_mixture(df: DataFrame, source_col: str, key_col: str,
                        alpha: float = 0.7) -> DataFrame:
    """Temperature-scaled mixture sampling: target weights derive from
    the observed counts themselves, ``w_s ∝ n_s^α`` (the multilingual
    rebalancing rule of mBERT/XLM-R/mT5 — α<1 flattens head sources and
    upweights the tail), then the bottleneck-C down-sampling of
    :func:`mixture_sample` applies.

    Determinism across engines: ``n^α`` quantizes to an integer at 1e-6
    (exact BIGINT sum for the normalizer, so the weight normalization is
    order-free), and the final per-source rate rounds to 6 dp before the
    md5 hash gate.  Same scale contract: one tiny count aggregate
    broadcast back; the corpus never shuffles.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    wq = F.round(F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
                 * F.lit(1e6)).cast("long")
    tot = Window.partitionBy()
    rates = (counts.withColumn("_wq", wq)
             .withColumn("_wn", F.col("_wq").cast("double")
                         / F.sum("_wq").over(tot).cast("double"))
             .withColumn("_cap",
                         F.min(F.col("_n") / F.col("_wn")).over(tot))
             .select(source_col,
                     F.round(F.col("_cap") * F.col("_wn") / F.col("_n"),
                             6).alias("_rate")))
    return (df.join(F.broadcast(rates), source_col)
            .where(_keeps(F.col(key_col), F.col("_rate")))
            .drop("_rate"))


def grouped_split(df: DataFrame, group_col: str,
                  val: float = 0.05, test: float = 0.05) -> DataFrame:
    """Leakage-safe holdout split: the hash band is computed on
    ``group_col`` instead of the row key, so EVERY row of a group (all
    documents of one source/domain, all near-dup cluster members, all
    chunks of one document) lands in the same split — the
    GroupShuffleSplit rule that keeps eval honest when rows within a
    group are correlated (per-row splits leak near-copies of training
    rows into validation).

    Same contract as :func:`train_val_test_split`: stable across
    reruns/engines/data growth, pure narrow map, no shuffle."""
    return train_val_test_split(df, group_col, val=val, test=test)


def priority_sample(df: DataFrame, weight_col, n: int,
                    key_col: str = "doc_id",
                    salt: str = "ps") -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    ``q = w / u`` with ``u`` a hash-derived uniform, and the sample is
    the global top-n by priority — heavier rows win proportionally
    more often, yet the draw is a pure function of (key, salt).

    Engine-portability: ``u`` comes from the shared md5-based
    :func:`~graphydb_spark.operators.text.hash60` ladder and the
    priority is ``w * 2^60 / (h+1)`` — an exact int→double conversion,
    one exact power-of-two scaling, and ONE correctly-rounded IEEE
    division, so Spark and the SQL oracle rank identically (no libm,
    no RNG state).  Determinism also makes the sample REPRODUCIBLE and
    re-runnable incrementally — the property a 100 TB pipeline needs
    (a reshuffle or retry cannot change the draw).

    Scale shape: narrow map to compute priorities + TakeOrdered top-n
    (each partition keeps <= n candidates; no global sort shuffle).
    """
    from .text import hash60
    h = hash60(F.concat(F.lit(salt + ":"),
                        F.col(key_col).cast("string")))
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    q = (w.cast("double") * F.lit(float(1 << 60))
         / (h + F.lit(1)).cast("double"))
    # NO rounding: the raw priority is bit-identical across engines
    # (exact conversions + one correctly-rounded division), whereas
    # round(double, 6) at 1e10 magnitude differs in the last ulp
    # between round implementations
    return (df.withColumn("priority", q)
              .orderBy(F.col("priority").desc(), F.col(key_col))
              .limit(n))


def dsir_select(df: DataFrame, is_target, n: int,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    NeurIPS 2023), unigram feature space: score every document by the
    log importance ratio ``sum_t [log p_target(t) - log p_general(t)]``
    between an add-one-smoothed unigram model of the TARGET slice
    (``is_target`` boolean column expression) and one of the whole
    corpus, then keep the top-n — the standard cheap way to tilt a
    100 TB crawl toward a high-quality target domain.

    Execution: ONE token pass builds both models (conditional counts in
    the same aggregation); the frequency table broadcasts back; scoring
    is the only other corpus pass.  Per-token log-ratio terms round to
    6 dp DECIMAL before the per-doc sum, so the score is order-
    independent and SQL-replayable (same ladder as unigram_logprob).
    """
    from .text import tokens

    toks = (df.select(id_col, is_target.alias("_tgt"),
                      F.explode(tokens(F.col(text_col))).alias("tok")))
    freq = (toks.groupBy("tok")
            .agg(F.count("*").alias("tf_all"),
                 F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
                 .alias("tf_tgt"))
            .localCheckpoint(eager=True))
    srow = freq.agg(F.sum("tf_all").alias("ta"),
                    F.sum("tf_tgt").alias("tt"),
                    F.count("*").alias("v")).collect()[0]
    vocab = srow["v"] or 0
    denom_all = float((srow["ta"] or 0) + vocab) or 1.0
    denom_tgt = float((srow["tt"] or 0) + vocab) or 1.0
    term = (F.round(F.log10((F.col("tf_tgt") + 1).cast("double")
                            / denom_tgt), 6).cast("decimal(18,6)")
            - F.round(F.log10((F.col("tf_all") + 1).cast("double")
                              / denom_all), 6).cast("decimal(18,6)"))
    scored = (toks.join(F.broadcast(freq), "tok")
              .groupBy(id_col)
              .agg(F.sum(term).cast("decimal(28,6)").alias("_r"),
                   F.count("*").cast("long").alias("n_tokens")))
    return (scored.select(id_col, "n_tokens",
                          (F.round(F.col("_r").cast("double"), 6)
                           + F.lit(0.0)).alias("log_ratio"))
            .orderBy(F.col("log_ratio").desc(), F.col(id_col))
            .limit(n))
