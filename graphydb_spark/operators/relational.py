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
              right_cols: tuple = (), suffix: str = "_matched") -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``right_ts`` ≤ its ``left_ts`` (per ``on`` key), or nulls.

    Ties inside ``right`` on (key, ts) must be resolved by the caller
    (e.g. pre-aggregate) — duplicate timestamps would make "the" as-of row
    ambiguous in any engine.

    Scale: both sides shuffle once on ``on``; the window scan is a single
    ordered pass per key partition.  Skewed keys behave like any other
    window aggregation (AQE cannot split a window partition — salt the
    key upstream if one key dominates).
    """
    lcols = [c for c in left.columns]
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
        F.lit(0).alias("__side"),
        *[F.col(c).alias(c + suffix) for c in right_cols])
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts → inclusive (≤) match
    w = (Window.partitionBy(on).orderBy("__ats", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in right_cols:
        u = u.withColumn(c + suffix,
                         F.last(c + suffix, ignorenulls=True).over(w))
    return u.where(F.col("__side") == 1).drop("__ats", "__side")


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
