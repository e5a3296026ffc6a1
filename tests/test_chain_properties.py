"""Property-based tests (hypothesis) for the chain DSL compiler.

Random well-formed chains over the friend graph must (a) parse and
execute, and (b) obey the outer-join laws of the optional-suffix
extension:

* the LEFT-JOIN suffix never filters the mandatory side, so the
  optional query's collect-uid set EQUALS the mandatory-prefix-only
  query's uid set;
* making a suffix optional can only widen the result: inner-join uids
  are a subset of optional uids.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphydb_spark import Graph

from .conftest import build_friend_graph

NODE_KINDS = [None, "Person"]
EDGE_KINDS = [None, "Likes", "Follows"]


@pytest.fixture(scope="module")
def fgraph(spark):
    g = Graph(spark)
    build_friend_graph(g)
    return g


@st.composite
def chains(draw):
    """A well-formed chain of 1-3 node links (0-2 edges), a collect
    position, and an optional-suffix start strictly after it."""
    n_nodes = draw(st.integers(1, 3))
    nodes = [draw(st.sampled_from(NODE_KINDS)) for _ in range(n_nodes)]
    edges = [(draw(st.sampled_from(EDGE_KINDS)),
              draw(st.booleans()))          # True = rightward
             for _ in range(n_nodes - 1)]
    collect_at = draw(st.integers(0, n_nodes - 1))
    # optional suffix starts at an edge strictly after the collect node
    # (or nowhere); edge i sits between node i and node i+1
    opt_edge = draw(st.one_of(
        st.none(), st.integers(0, max(0, n_nodes - 2))))
    if opt_edge is not None and (n_nodes == 1 or opt_edge < collect_at):
        opt_edge = None
    return nodes, edges, collect_at, opt_edge


def render(nodes, edges, collect_at, opt_edge):
    toks = []
    for i, nk in enumerate(nodes):
        body = f"n{i}" + (f":{nk}" if nk else "")
        toks.append(f"[{body}]" if i == collect_at else f"({body})")
        if i < len(edges):
            ek, right = edges[i]
            opt = "?" if opt_edge is not None and i >= opt_edge else ""
            body = f"e{i}{opt}" + (f":{ek}" if ek else "")
            toks.append(f"-({body})>" if right else f"<({body})-")
    return " ".join(toks)


def uids(g, chain):
    df = g.fetch(chain, as_df=True)
    return {r["uid"] for r in df.select("uid").collect()}


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(chains())
def test_chain_laws(fgraph, spec):
    nodes, edges, collect_at, opt_edge = spec
    inner = render(nodes, edges, collect_at, None)
    inner_uids = uids(fgraph, inner)

    if opt_edge is None:
        # plain chains at minimum must execute and return uid-keyed rows
        assert all(isinstance(u, str) for u in inner_uids)
        return

    optional = render(nodes, edges, collect_at, opt_edge)
    opt_uids = uids(fgraph, optional)
    # law 1: inner ⊆ optional (outer join only widens)
    assert inner_uids <= opt_uids
    # law 2: optional == mandatory prefix alone (LEFT JOIN never filters)
    prefix = render(nodes[:opt_edge + 1], edges[:opt_edge],
                    collect_at, None)
    assert opt_uids == uids(fgraph, prefix)
