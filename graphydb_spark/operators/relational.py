"""Relational extension operators Spark lacks as single primitives.

The reference has no window functions or temporal joins at all
(/root/reference/graphydb.py — SURVEY.md §2.5 "Window functions: none");
these are the beyond-parity additions a large-scale analytics engine
needs, built purely from shuffle-aware DataFrame compositions:

* ``asof_join`` — backward as-of (nearest-earlier) join, the canonical
  event-stream enrichment.  Implemented as union-tag + last-ignore-nulls
  window: ONE shuffle on the key (no range-explosion cross join, no
  per-key driver loop), which is the scalable shape — a range join would
  blow up on hot keys and a broadcast works only for tiny right sides.
* ``topk_per_group`` — rank-k selection per key via ``row_number``; the
  partial top-k runs map-side inside the window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: tuple = (), suffix: str = "_matched",
              direction: str = "backward") -> DataFrame:
    """As-of join: each left row picks, per ``on`` key, the right row with

    * ``direction='backward'`` — greatest ``right_ts`` ≤ ``left_ts``
      (the canonical event-stream enrichment),
    * ``direction='forward'``  — smallest ``right_ts`` ≥ ``left_ts``,
    * ``direction='nearest'``  — smaller absolute time difference of the
      two (ties go backward — deterministic, matching pandas
      ``merge_asof`` tolerance-free semantics),

    or nulls when no candidate exists.  The pandas/kdb as-of family on a
    distributed plan.

    Ties inside ``right`` on (key, ts) must be resolved by the caller
    (e.g. pre-aggregate) — duplicate timestamps would make "the" as-of row
    ambiguous in any engine.

    Scale: both sides shuffle once on ``on`` (``nearest`` runs the
    backward and forward passes back to back — two window scans on the
    SAME partitioning, so the second pass reuses the exchange); the
    window scan is a single ordered pass per key partition.  Skewed keys
    behave like any other window aggregation (AQE cannot split a window
    partition — salt the key upstream if one key dominates).
    """
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts,
                             right_cols, suffix)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    fwd = direction == "forward"
    lcols = [c for c in left.columns]
    # side codes order right rows before left at equal ts for backward
    # (inclusive ≤ via last() over preceding) and after left for forward
    # (inclusive ≥ via first() over following)
    rside = 2 if fwd else 0
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
          for c in right_cols])
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ats"),
        F.lit(rside).alias("__side"),
        *[F.col(c).alias(c + suffix) for c in right_cols])
    u = l.unionByName(r)
    base = Window.partitionBy(on).orderBy("__ats", "__side")
    if fwd:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)   # noqa: E731
    for c in right_cols:
        u = u.withColumn(c + suffix, pick(c + suffix))
    return u.where(F.col("__side") == 1).drop("__ats", "__side")


def _asof_nearest(left: DataFrame, right: DataFrame, on: str,
                  left_ts: str, right_ts: str, right_cols: tuple,
                  suffix: str) -> DataFrame:
    """Nearest as-of = backward pass + forward pass + per-row choice by
    absolute time distance (ties backward)."""
    # distance needs arithmetic; go through timestamp first so string/
    # date ts columns (which backward/forward accept via ordering) work
    # here too — numeric columns round-trip unchanged
    def _num(c):
        return F.col(c).cast("timestamp").cast("double")

    r2 = right.withColumn("__rts", _num(right_ts))
    rc = tuple(right_cols) + ("__rts",)
    b = asof_join(left, r2, on, left_ts, right_ts, rc,
                  suffix="__b", direction="backward")
    bf = asof_join(b, r2, on, left_ts, right_ts, rc,
                   suffix="__f", direction="forward")
    lts = _num(left_ts)
    db = lts - F.col("__rts__b")
    df_ = F.col("__rts__f") - lts
    use_b = F.col("__rts__f").isNull() | \
        (F.col("__rts__b").isNotNull() & (db <= df_))
    out = bf
    for c in right_cols:
        out = out.withColumn(
            c + suffix,
            F.when(use_b, F.col(c + "__b")).otherwise(F.col(c + "__f")))
    drop = [c + s for c in rc for s in ("__b", "__f")]
    return out.drop(*drop)


def topk_per_group(df: DataFrame, keys: list[str], order_by: list,
                   k: int, rank_col: str = "rn") -> DataFrame:
    """Top-k rows per group (deterministic given a total order in
    ``order_by``).  ``row_number`` + filter — Spark evaluates the rank
    inside the per-partition sort, so only k rows per key survive the
    window stage."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w).cast("long"))
              .where(F.col(rank_col) <= k))


def range_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str = "lts", right_ts: str = "rts",
               window_s: float = 60.0) -> DataFrame:
    """Forward range join: pairs (l, r) with the same ``on`` key and
    ``l.left_ts < r.right_ts ≤ l.left_ts + window_s`` (timestamps as
    epoch-second doubles).

    Open-source Spark has no range-join strategy — a naive inequality
    join plans as a per-key cross product (quadratic on hot keys).  This
    is the standard bucketing decomposition: each side maps its timestamp
    to a bucket of width ``window_s``; a match can only sit in the left
    row's own bucket or the next one, so the left side expands to exactly
    2 (bucket, row) candidates and the join is a plain equi-join on
    (key, bucket) + a residual filter.  One bounded-fanout shuffle, AQE
    handles skew like any equi-join.
    """
    b = F.lit(window_s)
    l = left.withColumn(
        "__b", F.explode(F.array(
            F.floor(F.col(left_ts) / b), F.floor(F.col(left_ts) / b) + 1)))
    r = right.withColumn("__b", F.floor(F.col(right_ts) / b))
    return (l.join(r, [on, "__b"])
             .where((F.col(right_ts) > F.col(left_ts))
                    & (F.col(right_ts) <= F.col(left_ts) + b))
             .drop("__b"))


def salted_join(left: DataFrame, right: DataFrame, on,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-mitigating equi-join: the (large, possibly skewed) left side
    scatters each row into one of ``salt`` sub-buckets; the right side
    replicates ``salt`` ways, so a hot key's rows spread over ``salt``
    tasks instead of one straggler.

    Use when AQE's skew-join split can't help: broadcast-ineligible right
    sides with a dominant key, or as the pre-shuffle for skewed window/
    aggregation partitions.  Result is row-identical to a plain join (the
    salt column is internal).
    """
    keys = on if isinstance(on, list) else [on]
    l = left.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l.join(r, keys + ["__salt"], how).drop("__salt")


def cap_group_size(df: DataFrame, group_col, max_size: int) -> DataFrame:
    """Drop every row belonging to a group larger than ``max_size``.

    The quadratic-blowup guard for self-join/pair-expansion operators
    (the within-group pair count is n(n-1)/2, so a single 10k-item
    group emits 5e7 pairs and sinks the stage): cap the group size
    before the join, mirroring the ``max_bucket`` guard in
    :func:`graphydb_spark.operators.dedup.minhash_lsh_pairs`.

    One aggregation over the grouping key + one semi-join back — the
    aggregate is map-side combinable and the oversized-group frame it
    produces is tiny (only outliers), so the guard costs far less than
    the explosion it prevents.  Deterministic: the same groups are
    dropped on any engine, so a SQL oracle can replay the cap with a
    ``HAVING COUNT(*) <= max_size`` semi-join.
    """
    keys = group_col if isinstance(group_col, list) else [group_col]
    small = (df.groupBy(*keys).agg(F.count("*").alias("__n"))
             .where(F.col("__n") <= max_size)
             .select(*keys))
    return df.join(small, keys, "left_semi")


def resample_locf(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                  unit: str = "hour", tiebreak: str | None = None,
                  bucket_col: str = "bucket_ts",
                  filled_col: str = "filled") -> DataFrame:
    """Time-series resample to a dense per-key grid with last-observation-
    carried-forward gap filling (the timeseries-DB "hypertable rollup +
    locf" shape; neither exists in the reference — SURVEY.md §2.5/§2.10).

    Per ``key_col``: truncate ``ts_col`` to ``unit`` buckets, elect the
    latest observation inside each bucket (order by ts then ``tiebreak``
    descending — the tiebreak makes the election deterministic when two
    observations share a timestamp), generate the dense bucket grid
    spanning the key's own [min, max] range, and forward-fill missing
    buckets from the most recent earlier observation.  ``filled_col``
    marks carried rows.  The first grid row per key is always a real
    observation, so no leading nulls exist.

    Scale shape: the in-bucket election is a ``max(struct(ts, tiebreak,
    value))`` hash aggregate — map-side combinable (each input partition
    pre-elects before the shuffle), strictly cheaper than a sort-based
    row_number window at any scale; the span aggregate and fill window
    shuffle on the key only.  The grid explode is bounded by
    time-range/unit per key, never global.  The value column passes
    through untouched (no float arithmetic), so a SQL oracle
    hash-matches exactly.
    """
    parts = [F.col(ts_col)]
    if tiebreak is not None:
        parts.append(F.col(tiebreak))
    parts.append(F.col(value_col))
    bucketed = df.withColumn("__b", F.date_trunc(unit, F.col(ts_col)))
    latest = (bucketed.groupBy(key_col, "__b")
              .agg(F.max(F.struct(*parts)).alias("__m"))
              .select(key_col, "__b",
                      F.col(f"__m.{value_col}").alias("__obs")))
    # span straight off the raw frame (map-side-combinable min/max agg)
    # so the election subtree is planned once, not once per consumer
    span = bucketed.groupBy(key_col).agg(F.min("__b").alias("__lo"),
                                         F.max("__b").alias("__hi"))
    grid = span.select(
        key_col,
        F.explode(F.sequence(
            "__lo", "__hi", F.expr(f"INTERVAL 1 {unit}"))).alias("__b"))
    w_fill = (Window.partitionBy(key_col).orderBy("__b")
              .rowsBetween(Window.unboundedPreceding, 0))
    return (grid.join(latest, [key_col, "__b"], "left")
            .withColumn(filled_col, F.col("__obs").isNull())
            .withColumn(value_col,
                        F.last("__obs", ignorenulls=True).over(w_fill))
            .select(key_col, F.col("__b").alias(bucket_col),
                    value_col, filled_col))


def transition_matrix(df: DataFrame, key_col: str, ts_col: str,
                      state_col: str, tiebreak: str | None = None
                      ) -> DataFrame:
    """First-order Markov transition counts/probabilities over per-key
    event sequences: for each key, order events by (ts, tiebreak) and
    count (state → next_state) adjacencies; ``prob`` is row-normalized
    per source state (rounded to 6 dp).

    The sequential-pattern primitive (clickstream analysis, curriculum
    ordering, session modeling).  One window shuffle on the key builds
    the lag pairs; the count is map-side combinable; the normalizing
    sum runs over the tiny (state × state) count frame.  Deterministic
    given a tiebreak that totals the order within a key.
    """
    order = [F.col(ts_col)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (df.select(F.col(state_col).alias("state"),
                       F.lead(F.col(state_col)).over(w).alias("next_state"))
             .where(F.col("next_state").isNotNull()))
    counts = pairs.groupBy("state", "next_state").agg(
        F.count("*").alias("cnt"))
    wt = Window.partitionBy("state")
    return counts.withColumn(
        "prob", F.round(F.col("cnt") / F.sum("cnt").over(wt), 6))


def profile_columns(df: DataFrame, cols: list[str] | None = None
                    ) -> DataFrame:
    """Single-pass column profiler (the ANALYZE/data-quality primitive a
    pipeline runs before trusting a new snapshot): one row per column
    with ``(col_name, n_nulls, n_distinct, min_value, max_value)`` —
    min/max rendered as strings so the output schema is uniform.

    ONE aggregation job for every column together (Catalyst plans the
    distinct counts via a single expand — no per-column scans); the
    result is k rows pivoted long via an exploded struct array.  On
    100 TB this is the cheapest full-scan statistic pass possible:
    map-side partial aggregation, no shuffle of row data.
    """
    cols = list(cols or df.columns)
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .cast("long").alias(f"__n_{i}"),
            F.countDistinct(F.col(c)).alias(f"__d_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    pieces = [F.struct(F.lit(c).alias("col_name"),
                       F.col(f"__n_{i}").alias("n_nulls"),
                       F.col(f"__d_{i}").alias("n_distinct"),
                       F.col(f"__min_{i}").alias("min_value"),
                       F.col(f"__max_{i}").alias("max_value"))
              for i, c in enumerate(cols)]
    return (row.select(F.explode(F.array(*pieces)).alias("s"))
            .select("s.*"))


def apply_cdc(snapshot: DataFrame, changes: DataFrame, key_col: str,
              seq_col: str, op_col: str = "op") -> DataFrame:
    """Apply a change-data-capture feed to a snapshot: per key, the
    highest-``seq_col`` change wins — ``D`` deletes the key, ``I``/``U``
    replace the row with the change's payload columns; keys without
    changes pass through.  The lakehouse MERGE/CDC-apply primitive (and
    the table-shaped generalization of the graph's last-writer-wins
    upsert merge).

    One map-side-combinable ``max(struct(seq, payload...))`` aggregate
    elects the winning change per key (no sort window), then one full
    outer join against the snapshot — both shuffles key-local, so a
    100 TB snapshot merges against a feed of any size without ever
    sorting either side globally.  ``seq_col`` must totally order each
    key's changes (engines would otherwise disagree on "latest").
    """
    payload = [c for c in changes.columns
               if c not in (key_col, seq_col, op_col)]
    elected = (changes.groupBy(key_col)
               .agg(F.max(F.struct(F.col(seq_col), F.col(op_col),
                                   *[F.col(c) for c in payload]))
                    .alias("__w")))
    win = elected.select(
        key_col, F.col(f"__w.{op_col}").alias("__op"),
        *[F.col(f"__w.{c}").alias(f"__new_{c}") for c in payload])
    out = snapshot.join(win, key_col, "full_outer")
    keep = F.col("__op").isNull() | (F.col("__op") != "D")
    cols = [F.col(key_col)]
    for c in snapshot.columns:
        if c == key_col:
            continue
        if c in payload:
            cols.append(F.when(F.col("__op").isNotNull(),
                               F.col(f"__new_{c}"))
                        .otherwise(F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    return out.where(keep).select(*cols)


def histogram(df: DataFrame, col: str, bins: int = 10,
              lo: float | None = None, hi: float | None = None
              ) -> DataFrame:
    """Equi-width histogram of a numeric column → ``(bin, lo, hi, n)``
    (empty bins included — a plottable profile, not a sparse count).

    Bounds default to the observed min/max (one tiny aggregate).  The
    binning is a pure codegen expression + one map-side-combinable
    count; the dense bin spine comes from a ``sequence`` explode over
    the bins constant.  Values exactly at ``hi`` fold into the last
    bin (the standard closed-right-edge rule).
    """
    if lo is None or hi is None:
        row = df.agg(F.min(F.col(col).cast("double")).alias("lo"),
                     F.max(F.col(col).cast("double")).alias("hi")) \
                .collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    width = (hi - lo) / bins or 1.0
    b = F.least(F.lit(bins - 1),
                F.floor((F.col(col).cast("double") - F.lit(lo))
                        / F.lit(width)).cast("long"))
    counts = (df.where(F.col(col).isNotNull()
                       & (F.col(col).cast("double") >= lo)
                       & (F.col(col).cast("double") <= hi))
              .groupBy(b.alias("bin")).agg(F.count("*").alias("n")))
    spine = (df.sparkSession.range(bins)
             .select(F.col("id").alias("bin")))
    return (spine.join(counts, "bin", "left")
            .select("bin",
                    F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6)
                    .alias("lo"),
                    F.round(F.lit(lo) + (F.col("bin") + 1)
                            * F.lit(width), 6).alias("hi"),
                    F.coalesce("n", F.lit(0)).cast("long").alias("n")))


def winsorize(df: DataFrame, col: str, lower_pct: float = 0.01,
              upper_pct: float = 0.99,
              out_col: str | None = None) -> DataFrame:
    """Winsorization (percentile clipping): values below the
    ``lower_pct`` exact percentile clamp up to it, above ``upper_pct``
    clamp down — the outlier-robust normalization step before scoring/
    training on heavy-tailed metrics.  One exact-percentile aggregate
    (linear interpolation, the engine-portable definition shared with
    the percentile queries), then a narrow clamp map — no shuffle of
    the data itself."""
    row = df.agg(
        F.expr(f"percentile({col}, {lower_pct!r})").alias("lo"),
        F.expr(f"percentile({col}, {upper_pct!r})").alias("hi")) \
        .collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])
    return df.withColumn(
        out_col or f"{col}_winsorized",
        F.round(F.least(F.greatest(F.col(col).cast("double"),
                                   F.lit(lo)), F.lit(hi)), 6))


def interval_lookup(df: DataFrame, ranges: DataFrame, value_col: str,
                    key_cols: list[str], lo_col: str = "lo",
                    hi_col: str = "hi",
                    bucket_width: float | None = None) -> DataFrame:
    """Enrich each row with the attributes of the (non-overlapping,
    half-open ``[lo, hi)``) range containing ``value_col`` — the
    IP-to-geo / value-band lookup.  Rows matching no range keep nulls.

    A naive BETWEEN join plans as a nested-loop scan of the range table
    per row; this is the bucket decomposition instead: every range
    explodes into the fixed-width buckets it covers, the probe side
    maps to its single bucket, and the match is a broadcast equi-join
    on the bucket + a residual BETWEEN — candidates per row are bounded
    by ranges-per-bucket, not the range-table size.  Non-overlap means
    at most one range hits, so the matched attributes left-join back
    onto the input by ``key_cols`` (the input's unique key) — no
    window, two joins, the probe side never fans out.  ``bucket_width``
    defaults to the mean range width (wide ranges cost a few extra
    bucket rows on the tiny build side only).
    """
    if bucket_width is None:
        row = ranges.agg(F.avg(F.col(hi_col) - F.col(lo_col))
                         .alias("w")).collect()[0]
        # empty range table -> avg is NULL; any width works (no matches)
        bucket_width = float(row["w"]) if row["w"] else 1.0
    w = F.lit(float(bucket_width))
    r = ranges.withColumn(
        "__b", F.explode(F.sequence(F.floor(F.col(lo_col) / w),
                                    F.floor(F.col(hi_col) / w))))
    v = F.col(value_col).cast("double")
    attr = [c for c in ranges.columns if c not in (lo_col, hi_col)]
    matched = (df.select(*key_cols, value_col)
               .withColumn("__b", F.floor(v / w))
               .join(F.broadcast(r), "__b")
               .where((v >= F.col(lo_col)) & (v < F.col(hi_col)))
               .select(*key_cols, *attr))
    return df.join(matched, key_cols, "left")
