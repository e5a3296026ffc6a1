"""sf1-scale same-hour Spark/DuckDB pairs for the floor-vs-data question.

The sf0.1 headline pairs leave two open items (VERDICT r4):

- ``interval_join_events`` reads 3.6× its anchor at sf0.1 — the round-4
  profiling attributes the gap to per-run broadcast materialization +
  twin scans (a constant), but only a ≥sf1 pair can show the ratio
  collapsing as data grows.
- ``two_hop``'s "Spark pays a ~50-70 ms scheduling floor that DuckDB
  doesn't" claim rests on the sf0.01↔sf0.1 cross-check; one committed
  sf1 datapoint closes it permanently.

This script materializes a DATA-PROPORTIONAL 10× replica of the sf0.1
fixtures (10 copies of each fact table with disjoint key ranges — key +
rep·10⁷ — so every FK keeps resolving and per-user event density is
unchanged, i.e. output sizes scale exactly 10×), then times both engines
on the SAME parquet with the bench protocols:

- Spark: bench.py's protocol verbatim (graph encode warmed, 2 warm-up
  runs, min of 3 timed ``.count()`` runs).
- DuckDB: duck_bench.py's protocol verbatim (1 warm-up, min of 3 timed
  ``fetchall()`` runs) PLUS a count-wrapped variant (``SELECT COUNT(*)
  FROM (oracle)``) — at 10× the interval join returns ~3M rows and
  fetchall's Python materialization would be charged to DuckDB alone,
  so the compute-only ratio is reported alongside the anchor-protocol
  one.

Run: python scripts/sf1_pair.py      (~4 min; prints one JSON line)

``--retrieval`` (VERDICT r6 #2) switches the query set to the
standing-index retrieval probes — bm25_probe, hybrid_search,
prf_expansion — with the STANDING anchor on both sides: Spark serves
from the session's persisted FTS/IVF snapshot tables (built in the
warm-ups, exactly bench.py's treatment) and DuckDB probes the
duck_bench.py --standing-index temp tables (setup untimed, probes
timed, result-identity to the full oracle asserted).  ``documents``
and ``embeddings`` replicate with disjoint id ranges like the fact
tables, so corpus statistics (N, df, avgdl, IVF cells) scale with the
replica count.  Run at SF1_REPS=10 and SF1_REPS=100 for the ratio
trajectory.

``--all`` (VERDICT r7 #1) runs the ENTIRE bench.py headline set — all
33 queries — at the replica scale, with BOTH DuckDB anchors per query:
the plain oracle (anchor protocol: fetchall, min of 3) plus a
count-wrapped variant (compute-only, so Python materialization of
multi-million-row outputs is not charged to DuckDB alone), and for the
five queries duck_bench.py has standing-index twins, the standing
probe too (setup untimed, multiset identity to the full oracle
asserted INSIDE DuckDB via EXCEPT ALL — sorting 30M-row outputs in
Python would dominate the run).  This closes the "per-family pairs
only" scale-evidence gap: a regression that grows with data on any
unpaired headline query now shows up as a ratio that widens ×1 → ×10.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SF1_REPS", "10"))
OFF = 10_000_000

#: key columns to offset per replica (FK pairs share the offset so the
#: joins keep resolving); every other column is copied verbatim
_REPL = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_COPY = ["region", "nation"]


def build_sf1(dest: str) -> None:
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count()}")
    for t, keys in _REPL.items():
        cols = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + rep * {OFF} AS {c}" if c in keys else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"UNNEST(range({REPS})) AS t(rep)) TO "
            f"'{dest}/{t}.parquet' (FORMAT PARQUET)")
    for t in _COPY:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dest}/{t}.parquet")
    con.close()


def spark_side(sf1_dir: str, names: list[str]) -> dict[str, float]:
    from graphydb_spark import get_spark
    from graphydb_spark.queries import QUERIES
    from graphydb_spark.session import tune_shuffle_for_input
    from graphydb_spark.sources.tpch_graph import tpch_graph

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="sf1_pair", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    g = tpch_graph(spark, sf1_dir)
    g.nodes_df.count()
    tune_shuffle_for_input(spark, g.edges_df.count())
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf1_dir).count()
        fn(spark, sf1_dir).count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn(spark, sf1_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        out[f"{name}_rows"] = n
        print(f"# spark {name}: {out[name]}s rows={n}", file=sys.stderr)
    return out


def _min3(con, q: str, warm: bool = False) -> float:
    """The shared DuckDB timing protocol (review r9 #6): optional
    warm-up, then min of 3 timed fetchall runs — one implementation
    so the anchors cannot drift between modes."""
    if warm:
        con.execute(q).fetchall()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def duck_side(sf1_dir: str, names: list[str],
              standing: bool = False) -> dict[str, float]:
    from graphydb_spark.queries import ORACLES
    con = duckdb.connect()
    con.execute(f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in list(_REPL) + _COPY:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1_dir}/{t}.parquet'")
    plan = {}
    if standing:
        from scripts.duck_bench import standing_index_plan
        plan = standing_index_plan()
        done: set[str] = set()
        for name in names:                      # setup untimed, once
            for ddl in plan[name]["setup"]:
                if ddl not in done:
                    con.execute(ddl)
                    done.add(ddl)
    out: dict[str, float] = {}
    for name in names:
        sql = ORACLES[name]
        # the warm-up run doubles as the identity capture — at ×100
        # the plain oracle costs ~20 s/run, never execute it just to
        # re-fetch rows the timed loop already produced
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        out[name] = _min3(con, sql)
        if standing:
            probe = plan[name]["probe"]
            got = sorted(map(tuple, con.execute(probe).fetchall()))
            if got != want:
                # explicit raise, not assert (ADVICE r8): python -O
                # compiles asserts out, silently skipping the identity
                # gate while still reporting the standing timing
                raise RuntimeError(
                    f"standing-index probe for {name!r} diverged from "
                    f"its full oracle on the replicated corpus")
            out[f"{name}_standing"] = _min3(con, probe)
        else:
            out[f"{name}_countonly"] = _min3(
                con, f"SELECT COUNT(*) FROM ({sql})", warm=True)
    con.close()
    return out


def duck_side_all(sf1_dir: str, names: list[str]) -> dict[str, float]:
    """Both anchors for every headline query: plain oracle (anchor
    protocol) + count-wrapped (compute-only), and the standing probe
    for the five queries that have one.  Standing identity is asserted
    inside DuckDB (EXCEPT ALL both ways == 0 rows) so multi-million-row
    outputs never round-trip through Python for the check."""
    from graphydb_spark.queries import ORACLES
    from scripts.duck_bench import standing_index_plan
    con = duckdb.connect()
    con.execute(f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in list(_REPL) + _COPY:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1_dir}/{t}.parquet'")
    plan = standing_index_plan()
    done: set[str] = set()
    for name in names:
        if name in plan:
            for ddl in plan[name]["setup"]:
                if ddl not in done:
                    con.execute(ddl)
                    done.add(ddl)
    out: dict[str, float] = {}
    for name in names:
        sql = ORACLES[name]
        out[name] = _min3(con, sql, warm=True)
        out[f"{name}_countonly"] = _min3(
            con, f"SELECT COUNT(*) FROM ({sql})", warm=True)
        if name in plan:
            probe = plan[name]["probe"]
            for a, b in ((probe, sql), (sql, probe)):
                extra = con.execute(
                    f"SELECT COUNT(*) FROM (({a}) EXCEPT ALL ({b}))"
                ).fetchone()[0]
                if extra:
                    # explicit raise, not assert (ADVICE r8): python -O
                    # compiles asserts out, silently skipping the gate
                    raise RuntimeError(
                        f"standing-index probe for {name!r} diverged "
                        f"from its full oracle on the replicated corpus")
            out[f"{name}_standing"] = _min3(con, probe)
        print(f"# duckdb {name}: {out[name]}s", file=sys.stderr)
    con.close()
    return out


def duck_side_standing_only(sf1_dir: str,
                            names: list[str]) -> dict[str, float]:
    """The ×100 protocol for the super-linear-oracle holdouts (VERDICT
    r8 #3): their PLAIN oracles cost minutes per run at ×100, so the
    min-of-3 anchor protocol is unaffordable — this mode times ONLY
    the standing-index probe (setup untimed) and asserts identity to
    the plain oracle via ONE execution of each side reduced to
    (COUNT(*), SUM(hash(all columns as VARCHAR))) — an
    order-independent multiset check that never materializes the rows
    in Python and runs the expensive oracle exactly once."""
    from graphydb_spark.queries import ORACLES
    from scripts.duck_bench import standing_index_plan
    con = duckdb.connect()
    con.execute(f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in list(_REPL) + _COPY:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1_dir}/{t}.parquet'")
    plan = standing_index_plan(extended=True)
    done: set[str] = set()
    for name in names:
        for ddl in plan[name]["setup"]:
            if ddl not in done:
                con.execute(ddl)
                done.add(ddl)
    out: dict[str, float] = {}
    for name in names:
        probe, sql = plan[name]["probe"], ORACLES[name]
        cols = [d[0] for d in
                con.execute(f"DESCRIBE {probe}").fetchall()]
        hx = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in cols)

        def digest(q):
            return con.execute(
                f"SELECT COUNT(*), SUM(hash({hx})) FROM ({q})"
            ).fetchone()

        t0 = time.perf_counter()
        want = digest(sql)                    # the ONE plain execution
        plain_once = time.perf_counter() - t0
        got = digest(probe)
        if got != want:
            raise RuntimeError(
                f"standing-index probe for {name!r} diverged from its "
                f"full oracle on the replicated corpus "
                f"(probe {got} vs plain {want})")
        out[f"{name}_standing"] = _min3(con, probe, warm=True)
        out[f"{name}_plain_once"] = round(plain_once, 4)
        out[f"{name}_rows"] = int(want[0])
        print(f"# duckdb standing {name}: {best:.4f}s "
              f"(plain-once {plain_once:.1f}s, {want[0]:,} rows, "
              f"hash-identity OK)", file=sys.stderr)
    con.close()
    return out


def main() -> None:
    retrieval = "--retrieval" in sys.argv
    all_set = "--all" in sys.argv
    standing_only = "--standing-only" in sys.argv
    if standing_only:
        names = ["minhash_pairs", "lsh_probe", "containment_pairs",
                 "resample_locf"]
        sub = os.environ.get("SF1_NAMES")
        if sub:
            names = [n for n in names if n in set(sub.split(","))]
    elif all_set:
        from bench import BENCH_QUERIES
        names = list(BENCH_QUERIES)
        # SF1_NAMES narrows --all to a comma-separated subset — the
        # ×100 runs cover the data-heavy class only (the plain oracles
        # of the heaviest queries cost ~15 min/run at ×100)
        sub = os.environ.get("SF1_NAMES")
        if sub:
            names = [n for n in names if n in set(sub.split(","))]
    elif retrieval:
        names = ["bm25_probe", "hybrid_search", "prf_expansion"]
    else:
        names = ["two_hop", "interval_join_events"]
    dest = os.environ.get("SF1_DIR") or tempfile.mkdtemp(prefix="sf1_")
    made = not os.path.exists(f"{dest}/lineitem.parquet")
    os.makedirs(dest, exist_ok=True)
    try:
        if made:
            t0 = time.perf_counter()
            build_sf1(dest)
            print(f"# built {REPS}x replica at {dest} "
                  f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)
        if standing_only:
            duck = duck_side_standing_only(dest, names)
            spk = spark_side(dest, names)
            ratios_s = {n: round(spk[n] / duck[f"{n}_standing"], 3)
                        for n in names}
            print(json.dumps({
                "metric": "sf_pair_standing_only", "reps": REPS,
                "src": SRC, "spark": spk, "duckdb": duck,
                "ratio_standing": ratios_s,
            }))
            return
        if all_set:
            duck = duck_side_all(dest, names)
            spk = spark_side(dest, names)
            ratios = {n: round(spk[n] / duck[n], 3) for n in names}
            ratios_c = {n: round(spk[n] / duck[f"{n}_countonly"], 3)
                        for n in names}
            ratios_s = {n: round(spk[n] / duck[f"{n}_standing"], 3)
                        for n in names if f"{n}_standing" in duck}
            print(json.dumps({
                "metric": "sf_pair_all_headline", "reps": REPS,
                "src": SRC, "spark": spk, "duckdb": duck,
                "ratio_anchor_protocol": ratios,
                "ratio_countonly": ratios_c,
                "ratio_standing": ratios_s,
            }))
            return
        duck = duck_side(dest, names, standing=retrieval)
        spk = spark_side(dest, names)
        ratios = {n: round(spk[n] / duck[n], 3) for n in names}
        alt_key = "standing" if retrieval else "countonly"
        ratios_a = {n: round(spk[n] / duck[f"{n}_{alt_key}"], 3)
                    for n in names}
        print(json.dumps({
            "metric": ("retrieval_pair" if retrieval else "sf1_pair"),
            "reps": REPS, "src": SRC,
            "spark": spk, "duckdb": duck,
            "ratio_anchor_protocol": ratios,
            (f"ratio_{alt_key}"): ratios_a,
        }))
    finally:
        if not os.environ.get("SF1_DIR"):
            shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    main()
