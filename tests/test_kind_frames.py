"""Round-9 plan-size fast path: typed chain links compile against
declared per-kind branch frames instead of the N-branch union
(Graph.declare_kind_frames) — values must be identical, the compiled
SQL must actually reference the branch views, and ANY frame mutation
must invalidate the declaration (a stale branch frame would silently
miss freshly saved rows).
"""
import pytest
from pyspark.sql import functions as F

from graphydb_spark import Graph
from graphydb_spark.sources.tpch_graph import (encode_edge_parts,
                                               encode_node_parts,
                                               load_tables, tpch_graph)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def g(spark):
    return tpch_graph(spark, SF, cache=False)


def test_kind_views_in_compiled_sql(g):
    sql, _ = g.fetch(
        "(r:Region) <(ir:InRegion)- [n:Nation]",
        'r.data.r_name = "ASIA"', DEBUG=True)
    assert "gdb_k_" in sql                    # branch views used
    # every typed link got one (r, ir, n all declare kinds)
    assert sql.count("gdb_k_") >= 3


def test_kind_frames_value_identity(spark, g):
    chain = "(r:Region) <(ir:InRegion)- (n:Nation) <(fn:FromNation)- " \
            "[c:Customer]"
    where = 'r.data.r_name = "ASIA"'
    with_frames = sorted(r["uid"] for r in
                         g.fetch(chain, where, as_df=True)
                         .select("uid").collect())
    # same graph WITHOUT the declaration → union path
    t = load_tables(spark, SF)
    nparts, eparts = encode_node_parts(t), encode_edge_parts(t)

    def union(parts):
        out = None
        for p in parts.values():
            out = p if out is None else out.unionByName(p)
        return out

    g2 = Graph.from_dataframes(spark, union(nparts), union(eparts))
    for kind, (s, e, su, eu) in {
            "InRegion": ("Nation", "Region", True, False),
            "FromNation": ("Customer", "Nation", True, False)}.items():
        g2.declare_integrity(kind, start_kind=s, end_kind=e,
                             start_unique=su, end_unique=eu)
    without = sorted(r["uid"] for r in
                     g2.fetch(chain, where, as_df=True)
                     .select("uid").collect())
    assert with_frames == without and len(with_frames) > 0


def test_mutation_invalidates_kind_frames(spark):
    t = load_tables(spark, SF)
    nparts, eparts = encode_node_parts(t), encode_edge_parts(t)

    def union(parts):
        out = None
        for p in parts.values():
            out = p if out is None else out.unionByName(p)
        return out

    g = Graph.from_dataframes(spark, union(nparts), union(eparts))
    g.declare_kind_frames(nodes=nparts, edges=eparts)
    assert g._node_kind_frames is not None
    n_before = g.fetch("[r:Region]", COUNT=True)
    # save a new Region node: the branch frame is now stale and MUST
    # stop being used.  fetch() flushes pending rows BEFORE building
    # kind views, so the merge's frame reassignment invalidates the
    # declaration ahead of any use.
    g.Node("Region", r_regionkey=99, r_name="ATLANTIS").save()
    assert g.fetch("[r:Region]", COUNT=True) == n_before + 1
    assert g._node_kind_frames is None        # invalidated by the merge
    sql, _ = g.fetch("[r:Region]", DEBUG=True)
    assert "gdb_k_" not in sql                # back on the union view


def test_untyped_links_still_use_the_union(g):
    # an untyped link has no kind → must compile against the union view
    sql, _ = g.fetch("[n]", DEBUG=True)
    assert "gdb_k_" not in sql
    assert g.fetch("[n]", COUNT=True) > 0
