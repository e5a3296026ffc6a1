"""The --standing-index duck_bench mode must price the SAME query:
every standing probe's result set is identical to its full oracle's
(the temp tables change where index derivation cost lands, never what
is computed).  Pure DuckDB — no Spark session needed."""

import importlib.util
import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_bench_mod():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "duck_bench.py")
    spec = importlib.util.spec_from_file_location("duck_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_standing_probes_equal_full_oracles(duck_bench_mod):
    from graphydb_spark.queries import ORACLES
    con = duckdb.connect()
    for t in duck_bench_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    import re
    # the CORE plan is frozen (existing consumers — --standing-index
    # totals, --all identity checks — were calibrated on it); the
    # round-9 ×100 holdouts ride only the extended plan
    assert set(duck_bench_mod.standing_index_plan()) == {
        "bm25_probe", "lsh_probe", "hybrid_search",
        "interval_join_events", "prf_expansion"}
    plan = duck_bench_mod.standing_index_plan(extended=True)
    assert set(plan) == {"bm25_probe", "lsh_probe", "hybrid_search",
                         "interval_join_events", "prf_expansion",
                         "minhash_pairs", "containment_pairs",
                         "resample_locf"}
    made = set()
    for name, spec in plan.items():
        for ddl in spec["setup"]:
            tbl = re.search(r"CREATE\s+TEMP\s+TABLE\s+(\w+)",
                            ddl).group(1)
            if tbl in made:
                continue
            con.execute(ddl)
            made.add(tbl)
        full = con.execute(ORACLES[name]).fetchall()
        probe = con.execute(spec["probe"]).fetchall()
        assert sorted(map(str, probe)) == sorted(map(str, full)), name
        assert len(probe) > 0, name
    con.close()
