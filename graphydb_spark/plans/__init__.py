"""Plan inspection helpers — the engine's EXPLAIN surface.

The reference's explain is ``fetch(DEBUG=True)`` returning the SQL it
would run (graphydb.py:977-978); we keep that AND expose the physical
plan, since on Spark the physical strategy (broadcast vs sort-merge,
pushed filters, codegen spans) is what decides 100 TB viability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def plan_report(df: DataFrame) -> dict:
    """Quick scale-health signals: pushed filters, broadcast joins,
    codegen coverage."""
    import re
    s = explain_str(df, "formatted")
    return {
        "pushed_filters": "PushedFilters: [" in s and
                          "PushedFilters: []" not in s,
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sortmerge_joins": s.count("SortMergeJoin"),
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", s))),
        "exchanges": s.count("Exchange"),
        "plan": s,
    }
