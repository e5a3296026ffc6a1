"""Port of CompleteGraphTests: K10 digraph incl. self-loops
(/root/reference/tests/test_graphdb.py:163-208, FIXTURES.md §2)."""

import pytest

from graphydb_spark import Graph, NSet

from .conftest import build_complete_graph


@pytest.fixture(scope="module")
def kg(spark):
    g = Graph(spark)
    nodes = build_complete_graph(g, n=10)
    return g, nodes


def test_stats(kg):
    g, _ = kg
    s = g.stats
    assert s["nodes"] == 10 and s["edges"] == 100
    assert s["edgekinds"] == {"E": 100}


def test_neighbor_closure(kg):
    """Every node neighbors every node — incl. itself via its self-loop
    (tests/test_graphdb.py:184-191)."""
    g, nodes = kg
    n0 = nodes[0]
    assert n0.bothN(COUNT=True) == 10
    assert len(n0.outN()) == 10
    assert len(n0.inN()) == 10


def test_self_loop_theta_on_nodes(kg):
    """Self-loops via cross-link predicate n1.uid == n2.uid
    (tests/test_graphdb.py:193-203)."""
    g, _ = kg
    res = g.fetch("(n1) -(e)> [n2]", "n1.uid == n2.uid")
    assert len(res) == 10


def test_self_loop_theta_on_edge(kg):
    g, _ = kg
    res = g.fetch("-[e]>", "e.startuid == e.enduid")
    assert len(res) == 10
    assert all(e["startuid"] == e["enduid"] for e in res)


def test_four_node_chain_reaches_all(kg):
    """3-edge/4-node chain still reaches all nodes
    (tests/test_graphdb.py:205-208)."""
    g, _ = kg
    res = g.fetch("(n1) -(e1)> (n2) -(e2)> (n3) -(e3)> [n4]")
    assert len(res) == 10


def test_degree_counts(kg):
    g, nodes = kg
    n0 = nodes[0]
    assert len(n0.outE()) == 10
    assert len(n0.inE()) == 10
    # self-loop counted once in the both-direction union (19 distinct edges)
    assert n0.bothE(COUNT=True) == 19


def test_set_traversal_dedups_selfloops(kg):
    g, nodes = kg
    ns = NSet(nodes[:3])
    # all 30 out-edges from 3 nodes, every node reachable
    assert ns.outE(COUNT=True) == 30
    assert ns.outN(COUNT=True) == 10
