"""DataFrame-level uid set algebra — the scale path for SURVEY §2.8.

The driver-side ``NSet``/``ESet`` collections implement the reference's
API; these operators implement the same semantics as pure DataFrame plans
for results too big to collect.  Identity is ``uid``; union keeps the
LEFT operand's row for duplicate uids (the reference's left-preference,
graphydb.py:189-194, 427-447) — note ``unionByName + dropDuplicates``
would NOT guarantee that, hence the explicit source-rank window.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_pref_left(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union by uid, keeping the left frame's row on conflicts (U1)."""
    from pyspark.sql import Window as W
    tagged = (a.withColumn("_src", F.lit(0))
              .unionByName(b.withColumn("_src", F.lit(1))))
    w = W.partitionBy("uid").orderBy("_src")
    return (tagged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn", "_src"))


def intersect_uids(a: DataFrame, b: DataFrame) -> DataFrame:
    """Keys-intersection, values from the left (U2)."""
    return a.join(b.select("uid"), "uid", "left_semi")


def difference_uids(a: DataFrame, b: DataFrame) -> DataFrame:
    """Keys-difference (U3)."""
    return a.join(b.select("uid"), "uid", "left_anti")


def symmetric_difference_uids(a: DataFrame, b: DataFrame) -> DataFrame:
    """U4: (a − b) ∪ (b − a)."""
    return difference_uids(a, b).unionByName(difference_uids(b, a))


def is_subset(a: DataFrame, b: DataFrame) -> bool:
    """U5: every uid of a appears in b (anti-join emptiness)."""
    return difference_uids(a.select("uid"), b).limit(1).count() == 0


def python_filter(df: DataFrame, predicate: Callable[[dict], bool]) -> DataFrame:
    """P7 at scale: keep rows where ``predicate(row_dict)`` is truthy;
    rows whose evaluation RAISES are silently dropped (the reference's
    lambda-filter semantics, graphydb.py:1589-1595).

    Arrow-batched ``mapInPandas`` — the predicate sees plain dicts, the
    transfer stays columnar.  Use expression strings when possible; this
    is the documented slow path.
    """
    import pandas as pd

    schema = df.schema

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            keep = []
            for row in pdf.to_dict("records"):
                try:
                    keep.append(bool(predicate(row)))
                except Exception:
                    keep.append(False)
            yield pdf[pd.Series(keep, index=pdf.index)]

    return df.mapInPandas(run, schema=schema)
