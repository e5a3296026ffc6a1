"""Redundant-join elimination: FK-declared, unobserved node links leave
the join tree; results must be identical with and without declarations."""

from graphydb_spark.chain import Link, eliminable_links, parse_chain
from graphydb_spark.sources.tpch_graph import tpch_graph

SF = "/root/testdata/sf0.001"
INTEGRITY = {"Placed": ("Customer", "Order"), "Contains": ("Order", "Part")}


def test_detection_basic():
    links = parse_chain("[c:Customer] -(pl:Placed)> (o:Order)")
    assert eliminable_links(links, "", set(), INTEGRITY) == {"o"}


def test_detection_blocked_by_reference():
    links = parse_chain("[c:Customer] -(pl:Placed)> (o:Order)")
    assert eliminable_links(links, "COUNT(o.uid)", set(), INTEGRITY) == set()
    # alias must match as a word: 'oo.' is not 'o.'
    assert eliminable_links(links, "oo.uid", set(), INTEGRITY) == {"o"}


def test_detection_blocked_by_kind_mismatch():
    links = parse_chain("[c:Customer] -(pl:Placed)> (o:Part)")
    assert eliminable_links(links, "", set(), INTEGRITY) == set()


def test_detection_blocked_by_fts_and_collect():
    links = parse_chain("[c:Customer] -(pl:Placed)> (o:Order)")
    assert eliminable_links(links, "", {"o"}, INTEGRITY) == set()
    links2 = parse_chain("(c:Customer) -(pl:Placed)> [o:Order]")
    # o is collected → kept; c itself is unobserved + FK-guaranteed → drops
    assert eliminable_links(links2, "", set(), INTEGRITY) == {"c"}


def test_detection_untyped_edge_gives_no_guarantee():
    links = parse_chain("[c:Customer] -(pl)> (o:Order)")
    assert eliminable_links(links, "", set(), INTEGRITY) == set()


def test_results_unchanged_by_elimination(spark):
    """Metamorphic: same fetch on the same data with and without the FK
    declarations must return the same uid set."""
    g = tpch_graph(spark, SF, cache=False)
    chain = "[c:Customer] -(pl:Placed)> (o:Order) -(ct:Contains)> (p:Part)"
    where = "CAST(p.data.p_size AS INT) = 10"
    with_elim = {r["uid"] for r in g.fetch(chain, where, as_df=True)
                 .select("uid").collect()}
    g._edge_integrity = {}
    without = {r["uid"] for r in g.fetch(chain, where, as_df=True)
               .select("uid").collect()}
    assert with_elim == without and with_elim


def test_eliminated_sql_drops_relation(spark):
    g = tpch_graph(spark, SF, cache=False)
    sql, _ = g.fetch("[c:Customer] -(pl:Placed)> (o:Order)", DEBUG=True)
    assert " AS o " not in sql + " "
    # declared-kind junction compiles to the int-key join
    assert "pl.skey = c.nkey" in sql


def test_interior_and_terminal_chain_elimination(spark):
    g = tpch_graph(spark, SF, cache=False)
    sql, _ = g.fetch(
        "[c1:Customer,other] -(p1:Placed)> (o1:Order) -(ct1:Contains)> "
        "(pt:Part) <(ct2:Contains)- (o2:Order) <(p2:Placed)- (c2:Customer)",
        "c1.uid < c2.uid", other="c2.uid", DEBUG=True)
    for gone in ("o1", "pt", "o2"):
        assert f" AS {gone} " not in sql + " "
    # edges chain through the eliminated nodes' continuation columns
    # (int-key form: the junction kinds are declared on both sides)
    assert "ct1.skey = p1.ekey" in sql
    assert "ct2.ekey = ct1.ekey" in sql


def test_optional_edge_guarantee_cannot_eliminate():
    """An optional edge's FK guarantee must not justify dropping a
    mandatory node join: when the optional edge is null the node's
    existence filter still applies.  With the edge mandatory, the same
    node IS eliminable."""
    links = parse_chain("[c:Customer] -(pl:Placed)> (o:Order) "
                        "-(ct?:Contains)> (p)")
    # 'o' is flanked by mandatory Placed (guarantees end=Order) → still
    # eliminable; 'p' is in the optional suffix → never eliminable
    assert eliminable_links(links, "", set(), INTEGRITY) == {"o"}
    # integrity declared ONLY for the optional edge: nothing eliminable
    only_opt = {"Contains": ("Order", "Part")}
    assert eliminable_links(links, "", set(), only_opt) == set()


def test_uid_only_reference_eliminates_node_join(spark):
    """A node observed ONLY through alias.uid reads the uid off the
    adjacent edge endpoint (o.uid = pl.enduid) and its join disappears —
    but only under a declared FK (without it, the node join must stay:
    it filters dangling edges)."""
    from graphydb_spark import Graph
    g = Graph(spark)
    g.declare_integrity("Placed", "Customer", "Order")
    c = g.Node("Customer", name="c")
    c.save()
    o1, o2 = g.Node("Order", n=1), g.Node("Order", n=2)
    o1.save(), o2.save()
    g.Edge(c, "Placed", o1).save()
    g.Edge(c, "Placed", o2).save()

    sql, _ = g.fetch("[c:Customer,nord] -(pl:Placed)> (o:Order)",
                     GROUP="c.uid", nord="COUNT(o.uid)", DEBUG=True)
    assert " o " not in f" {sql} " and "AS o" not in sql
    assert "pl.enduid" in sql
    out = g.fetch("[c:Customer,nord] -(pl:Placed)> (o:Order)",
                  GROUP="c.uid", nord="COUNT(o.uid)", as_df=True).collect()
    assert len(out) == 1 and out[0]["nord"] == 2

    # WHERE on o.uid also rewrites and eliminates
    sql2, _ = g.fetch("[c:Customer] -(pl:Placed)> (o:Order)",
                      f"o.uid = '{o1.uid}'", DEBUG=True)
    assert "AS o" not in sql2 and "pl.enduid" in sql2
    assert g.fetch("[c:Customer] -(pl:Placed)> (o:Order)",
                   f"o.uid = '{o1.uid}'", COUNT=True) == 1

    # any non-uid observation keeps the join
    sql3, _ = g.fetch("[c:Customer,kinds] -(pl:Placed)> (o:Order)",
                      GROUP="c.uid", kinds="COUNT(o.kind)", DEBUG=True)
    assert "AS o" in sql3

    # no declared integrity → no elimination (the join filters dangling)
    g2 = Graph(spark)
    c2 = g2.Node("Customer", name="c")
    c2.save()
    sql4, _ = g2.fetch("[c:Customer,nord] -(pl:Placed)> (o:Order)",
                       GROUP="c.uid", nord="COUNT(o.uid)", DEBUG=True)
    assert "AS o" in sql4


def test_project_uid_only_eliminates_collect_join(spark):
    """PROJECT=['uid'] + declared FK: the collect node table leaves the
    plan; uid reads off the adjacent edge endpoint; results match the
    unprojected fetch + .select('uid')."""
    g = tpch_graph(spark, SF, cache=False)
    chain = "(r:Region) <(ir:InRegion)- (n:Nation) <(fn:FromNation)- [c:Customer]"
    where = 'r.data.r_name = "ASIA"'
    sql, _ = g.fetch(chain, where, PROJECT=["uid"], DEBUG=True)
    assert " AS c " not in sql + " "
    assert "fn.skey" in sql            # int-key dedup + uid reconstruction
    projected = {r["uid"] for r in
                 g.fetch(chain, where, as_df=True, PROJECT=["uid"]).collect()}
    baseline = {r["uid"] for r in
                g.fetch(chain, where, as_df=True).select("uid").collect()}
    assert projected == baseline and projected


def test_project_uid_only_distinct_false_keeps_multiplicity(spark):
    """Without DISTINCT the eliminated-collect path must preserve one row
    per matched path (edge endpoints repeat)."""
    g = tpch_graph(spark, SF, cache=False)
    chain = "(o:Order) <(pl:Placed)- [c:Customer]"
    n_paths = g.fetch(chain, as_df=True, DISTINCT=False,
                      PROJECT=["uid"]).count()
    n_edges = g.edges_df.where("kind = 'Placed'").count()
    assert n_paths == n_edges


def test_project_subset_columns_no_elimination(spark):
    """A wider PROJECT keeps the collect join but narrows the output."""
    g = tpch_graph(spark, SF, cache=False)
    df = g.fetch("(r:Region) <(ir:InRegion)- [n:Nation]", as_df=True,
                 PROJECT=["uid", "props"])
    assert df.columns == ["uid", "props"]
    sql, _ = g.fetch("(r:Region) <(ir:InRegion)- [n:Nation]",
                     PROJECT=["uid", "props"], DEBUG=True)
    assert " AS n " in sql + " "


def test_project_guards(spark):
    import pytest
    from graphydb_spark.items import GraphydbError
    g = tpch_graph(spark, SF, cache=False)
    with pytest.raises(GraphydbError, match="as_df"):
        g.fetch("(c:Customer)", PROJECT=["uid"])
    with pytest.raises(GraphydbError, match="uid"):
        g.fetch("(c:Customer)", as_df=True, PROJECT=["props"])
    with pytest.raises(GraphydbError, match="not available"):
        g.fetch("(c:Customer)", as_df=True, PROJECT=["uid", "nope"])


def test_project_count_uses_edge_key(spark):
    """COUNT + PROJECT composes; and the projected COUNT equals the
    unprojected one."""
    g = tpch_graph(spark, SF, cache=False)
    chain = "[c:Customer] -(pl:Placed)> (o:Order)"
    assert g.fetch(chain, COUNT=True) == \
        g.fetch(chain, COUNT=True, PROJECT=["uid"])


def test_project_with_order_keeps_collect_join(spark):
    """Regression: ORDER + PROJECT=['uid'] must not eliminate the
    collect join (the DISTINCT select list could not carry the ORDER
    expression) — it compiles with the join kept and still runs."""
    g = tpch_graph(spark, SF, cache=False)
    chain = "[c:Customer] -(pl:Placed)> (o:Order)"
    sql, _ = g.fetch(chain, ORDER="uid", PROJECT=["uid"], DEBUG=True)
    assert " AS c " in sql + " "
    out = g.fetch(chain, ORDER="uid", LIMIT=5, as_df=True, PROJECT=["uid"])
    assert out.count() == 5


def test_project_debug_varlength(spark):
    """Regression: PROJECT + DEBUG composes on variable-length chains
    exactly like on fixed-length ones."""
    g = tpch_graph(spark, SF, cache=False)
    sqls = g.fetch("(r:Region) <(e*1..2:InRegion)- [n]", DEBUG=True,
                   PROJECT=["uid"])
    assert isinstance(sqls, list) and len(sqls) == 2
