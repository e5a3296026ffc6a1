"""Differential fuzz of the chain compiler's OPTIMIZED plan surface
(VERDICT r6 #7).

fetch() executes exactly the SQL that DEBUG=True returns, so the risk
surface as the compiler grows is not SQL-vs-DataFrame divergence — it
is the OPTIMIZATIONS: redundant-join elimination under declared FK
integrity, uid-only endpoint rewrites, the int-key join rewrite, and
typed-pstruct predicate compilation.  This suite generates random
well-formed chains over the TPC-H graph schema and checks, per chain:

* optimized == naive: the full graph (pstruct + int keys + declared
  integrity — every rewrite armed) returns the same collect-uid set as
  a stripped twin (`from_dataframes` with pstruct/nkey/skey/ekey
  dropped, no integrity declared — the compiler's plain path);
* DEBUG == execution: running the (sql, binds) that DEBUG=True returns
  through spark.sql reproduces the as_df result — locks the explain
  surface to the execution surface.

WHERE predicates are drawn from a pool that is defined identically on
the typed (pstruct) and stringly (get_json_object) paths — string
equality, GLOB, and integer equality on integer-valued JSON fields —
the same restriction test_chain_properties' promotion-parity tests
derive.
"""

#: full-tier only (round 10 tiering): property/fuzz suite, not part
#: of the driver-window default run
pytestmark = __import__("pytest").mark.slowtier

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphydb_spark.graph import Graph
from graphydb_spark.sources.tpch_graph import tpch_graph

SF = "/root/testdata/sf0.001"

#: (edge_kind, start_kind, end_kind) — tpch_graph's declared integrity
SCHEMA = [("InRegion", "Nation", "Region"),
          ("FromNation", "Customer", "Nation"),
          ("LocatedIn", "Supplier", "Nation"),
          ("Placed", "Customer", "Order"),
          ("Contains", "Order", "Part"),
          ("SuppliedBy", "Order", "Supplier"),
          ("Did", "User", "Event")]
KINDS = sorted({k for _, s, e in SCHEMA for k in (s, e)})

#: per-kind predicates defined identically typed and stringly
WHERES = {
    "Customer": '{a}.data.c_mktsegment = "BUILDING"',
    "Nation": "{a}.data.n_name GLOB 'NATION_1*'",   # GLOB takes single
    "Part": "{a}.data.p_size = 10",                 # quotes (SQLite
    "Supplier": "{a}.data.s_name GLOB 'Supplier*'",  # parity, chain C2)
}


@pytest.fixture(scope="module")
def graphs(spark):
    g = tpch_graph(spark, SF)
    twin = Graph.from_dataframes(
        spark,
        g.nodes_df.drop("pstruct", "nkey"),
        g.edges_df.drop("pstruct", "skey", "ekey"))
    return g, twin


@st.composite
def chain_specs(draw):
    """A random walk over the schema graph: 1-3 node links joined by
    schema-valid edges in either direction, a collect position, an
    optional suffix at/after the collect node, and optional WHERE /
    PROJECT / ORDER+LIMIT draws."""
    n_nodes = draw(st.integers(1, 3))
    kinds = [draw(st.sampled_from(KINDS))]
    edges = []          # (edge_kind, rightward)
    for _ in range(n_nodes - 1):
        cur = kinds[-1]
        moves = ([(ek, e, True) for ek, s, e in SCHEMA if s == cur]
                 + [(ek, s, False) for ek, s, e in SCHEMA if e == cur])
        if not moves:
            break
        ek, nxt, fwd = draw(st.sampled_from(moves))
        edges.append((ek, fwd))
        kinds.append(nxt)
    n_nodes = len(kinds)
    collect_at = draw(st.integers(0, n_nodes - 1))
    opt_edge = draw(st.one_of(
        st.none(), st.integers(0, max(0, n_nodes - 2))))
    if opt_edge is not None and (n_nodes == 1 or opt_edge < collect_at):
        opt_edge = None
    # WHERE binds to a mandatory-prefix alias whose kind has a pool
    # predicate (optional-side WHERE composes differently by design)
    last_mand = opt_edge if opt_edge is not None else n_nodes - 1
    cands = [i for i in range(last_mand + 1) if kinds[i] in WHERES]
    where_at = draw(st.sampled_from(cands)) if cands and \
        draw(st.booleans()) else None
    project = draw(st.booleans())
    order_limit = draw(st.booleans())
    return kinds, edges, collect_at, opt_edge, where_at, project, \
        order_limit


def render(kinds, edges, collect_at, opt_edge):
    toks = []
    for i, nk in enumerate(kinds):
        body = f"a{i}:{nk}"
        toks.append(f"[{body}]" if i == collect_at else f"({body})")
        if i < len(edges):
            ek, fwd = edges[i]
            opt = "?" if opt_edge is not None and i >= opt_edge else ""
            body = f"e{i}{opt}:{ek}"
            toks.append(f"-({body})>" if fwd else f"<({body})-")
    return " ".join(toks)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=chain_specs())
def test_optimized_plan_equals_naive_and_debug_sql(spark, graphs, spec):
    g, twin = graphs
    kinds, edges, collect_at, opt_edge, where_at, project, order_limit = \
        spec
    chain = render(kinds, edges, collect_at, opt_edge)
    kwargs = {"as_df": True}
    if where_at is not None:
        kwargs["WHERE"] = WHERES[kinds[where_at]].format(a=f"a{where_at}")
    if project:
        kwargs["PROJECT"] = ["uid"]
    if order_limit:
        kwargs["ORDER"] = "uid"
        kwargs["LIMIT"] = 50

    opt_uids = [r["uid"] for r in
                g.fetch(chain, **kwargs).select("uid").collect()]
    naive_uids = [r["uid"] for r in
                  twin.fetch(chain, **kwargs).select("uid").collect()]
    # DISTINCT by uid is the default, so sets are the full comparison;
    # under ORDER+LIMIT the uid tiebreak makes the cut deterministic
    # and the ordered lists must agree too
    assert sorted(opt_uids) == sorted(naive_uids), chain
    if order_limit:
        assert opt_uids == naive_uids, chain

    dbg_kwargs = dict(kwargs)
    dbg_kwargs.pop("as_df")
    sql, binds = g.fetch(chain, DEBUG=True, **dbg_kwargs)
    via_sql = spark.sql(sql, args=binds) if binds else spark.sql(sql)
    sql_uids = [r["uid"] for r in via_sql.select("uid").collect()]
    assert sorted(sql_uids) == sorted(opt_uids), chain
