"""Parser/compiler unit tests (no Spark session needed)."""

import pytest

from graphydb_spark.chain import (compile_fetch_sql, glob_to_rlike,
                                  parse_chain, rewrite_expr,
                                  rewrite_json_paths)
from graphydb_spark.items import GraphydbError


def test_parse_simple_node():
    links = parse_chain("(n)")
    assert len(links) == 1
    assert links[0].alias == "n" and links[0].ltype == "node"
    assert links[0].collect  # right-most collects by default


def test_parse_kinds_and_collect():
    links = parse_chain("[p:Person,strength] -(e:Drinks)> (d:Drink)")
    p, e, d = links
    assert (p.alias, p.kind, p.collect, p.extras) == ("p", "Person", True,
                                                      ["strength"])
    assert (e.alias, e.ltype, e.kind) == ("e", "redge", "Drinks")
    assert (d.alias, d.kind, d.collect) == ("d", "Drink", False)


def test_parse_left_edge():
    links = parse_chain("(a) <(e)- (b)")
    assert links[1].ltype == "ledge"


def test_parse_edge_only():
    links = parse_chain("-(e)>")
    assert links[0].is_edge and links[0].collect


def test_parse_errors():
    with pytest.raises(GraphydbError):
        parse_chain("(n) (m)")          # two adjacent nodes
    with pytest.raises(GraphydbError):
        parse_chain("(n) -(e)> (n)")    # duplicate alias
    with pytest.raises(GraphydbError):
        parse_chain("[a] -(e)> [b]")    # two collect links
    with pytest.raises(GraphydbError):
        parse_chain("-(e> (n)")         # malformed token


def test_json_rewrite_nested():
    assert rewrite_json_paths("n.data.a.b = 1") == \
        "get_json_object(n.props, '$.a.b') = 1"


def test_glob_rewrite():
    out = glob_to_rlike("n.uid GLOB 'B?b*'")
    assert "RLIKE" in out and "B" in out


def test_group_concat_rewrite():
    out = rewrite_expr("GROUP_CONCAT(n.data.name)")
    assert out.startswith("array_join(sort_array(collect_list(")


def test_compile_join_directions():
    sql = compile_fetch_sql(parse_chain("(a) -(e)> (b)"), "N", "E")
    assert "e.startuid = a.uid" in sql and "b.uid = e.enduid" in sql
    sql = compile_fetch_sql(parse_chain("(a) <(e)- (b)"), "N", "E")
    assert "e.enduid = a.uid" in sql and "b.uid = e.startuid" in sql


def test_compile_int_key_joins():
    ep = {"Placed": ("Customer", "Order")}
    # both junction kinds statically known → int64 join keys
    sql = compile_fetch_sql(parse_chain("[c:Customer] -(e:Placed)> (o:Order)"),
                            "N", "E", edge_endpoints=ep)
    assert "e.skey = c.nkey" in sql and "o.nkey = e.ekey" in sql
    # untyped node link → kind unknown → uid string join on that junction
    sql = compile_fetch_sql(parse_chain("[c] -(e:Placed)> (o:Order)"),
                            "N", "E", edge_endpoints=ep)
    assert "e.startuid = c.uid" in sql and "o.nkey = e.ekey" in sql
    # untyped edge → no endpoint metadata → string joins throughout
    sql = compile_fetch_sql(parse_chain("[c:Customer] -(e)> (o:Order)"),
                            "N", "E", edge_endpoints=ep)
    assert "e.startuid = c.uid" in sql and "o.uid = e.enduid" in sql
    # kind mismatch at the junction (Placed ends at Order, not Part):
    # keep the string join — correctly empty, never wrongly matched
    sql = compile_fetch_sql(parse_chain("[c:Customer] -(e:Placed)> (p:Part)"),
                            "N", "E", edge_endpoints=ep)
    assert "p.uid = e.enduid" in sql
    # no metadata at all → unchanged legacy SQL
    sql = compile_fetch_sql(parse_chain("[c:Customer] -(e:Placed)> (o:Order)"),
                            "N", "E")
    assert "e.startuid = c.uid" in sql and "o.uid = e.enduid" in sql


def test_compile_dedup_elision_on_unique_chains():
    ep = {"Placed": ("Customer", "Order"),
          "FromNation": ("Customer", "Nation")}
    uq = {"Placed": (False, True), "FromNation": (True, False)}
    # collect at the right end; edge's right connector (enduid) unique →
    # no fanout → no DISTINCT / GROUP BY dedup in the SQL
    sql = compile_fetch_sql(parse_chain("(c:Customer) -(e:Placed)> [o:Order]"),
                            "N", "E", edge_endpoints=ep, edge_unique=uq)
    assert "DISTINCT" not in sql and "GROUP BY" not in sql
    # walking the NON-unique direction (customer → its many orders):
    # dedup must stay
    sql = compile_fetch_sql(parse_chain("[c:Customer] -(e:Placed)> (o:Order)"),
                            "N", "E", edge_endpoints=ep, edge_unique=uq)
    assert "GROUP BY" in sql or "DISTINCT" in sql
    # ledge form: '<(f:FromNation)-' right connector is startuid (unique)
    sql = compile_fetch_sql(
        parse_chain("(n:Nation) <(f:FromNation)- [c:Customer]"),
        "N", "E", edge_endpoints=ep, edge_unique=uq)
    assert "DISTINCT" not in sql and "GROUP BY" not in sql
    # undeclared edge kind → conservative, dedup stays
    sql = compile_fetch_sql(parse_chain("(c:Customer) -(e)> [o:Order]"),
                            "N", "E", edge_endpoints=ep, edge_unique=uq)
    assert "GROUP BY" in sql or "DISTINCT" in sql
    # COUNT on a no-fanout chain drops the DISTINCT aggregate
    sql = compile_fetch_sql(parse_chain("(c:Customer) -(e:Placed)> [o:Order]"),
                            "N", "E", count=True,
                            edge_endpoints=ep, edge_unique=uq)
    assert "COUNT(o.nkey)" in sql


def test_compile_count():
    # single link: uid already unique → DISTINCT elided
    sql = compile_fetch_sql(parse_chain("(n)"), "N", "E", count=True)
    assert "COUNT(n.uid)" in sql
    # multi link: join can fan out → DISTINCT required
    sql = compile_fetch_sql(parse_chain("[n] -(e)> (m)"), "N", "E", count=True)
    assert "COUNT(DISTINCT n.uid)" in sql
    # non-count multi-link dedup compiles to GROUP BY uid with MIN
    # representatives (uid is the frame PK, so it's row-DISTINCT with a
    # narrower shuffle key and prunable column aggregates)
    sql = compile_fetch_sql(parse_chain("(n) -(e)> (m)"), "N", "E")
    assert "GROUP BY m.uid" in sql and "MIN(m.props) AS props" in sql
    # but an extra referencing another alias forces full-row DISTINCT
    sql = compile_fetch_sql(parse_chain("[n,x] -(e)> (m)"), "N", "E",
                            extras={"x": "e.uid"})
    assert sql.startswith("SELECT DISTINCT")


def test_extras_must_have_expression():
    with pytest.raises(GraphydbError):
        compile_fetch_sql(parse_chain("[n,x]"), "N", "E")


def test_varlength_expansion_shapes():
    """-(e*1..3:K)> expands to 1/2/3-hop chains with anonymous
    intermediates; endpoints and collect survive verbatim."""
    from graphydb_spark.chain import expand_varlength
    out = expand_varlength("[a:Person] -(e*1..3:Knows)> (b:Person)")
    assert len(out) == 3
    assert out[0] == "[a:Person] -(e__1_1:Knows)> (b:Person)"
    assert out[1] == ("[a:Person] -(e__2_1:Knows)> (e__v2_1) "
                      "-(e__2_2:Knows)> (b:Person)")
    assert out[2].count(":Knows") == 3
    # kindless + left arrows + fixed depth
    left = expand_varlength("(x) <(e*2)- [y]")
    assert left == ["(x) <(e__2_1)- (e__v2_1) <(e__2_2)- [y]"]
    # no marker → None
    assert expand_varlength("[a] -(e:K)> (b)") is None


def test_varlength_expansion_errors():
    import pytest
    from graphydb_spark import GraphydbError
    from graphydb_spark.chain import expand_varlength
    with pytest.raises(GraphydbError, match="one variable-length"):
        expand_varlength("(a) -(e*1..2)> (b) -(f*1..2)> (c)")
    with pytest.raises(GraphydbError, match="bounds"):
        expand_varlength("(a) -(e*3..2)> (b)")
    with pytest.raises(GraphydbError, match="exceeds"):
        expand_varlength("(a) -(e*1..99)> (b)")
    with pytest.raises(GraphydbError, match="edges"):
        expand_varlength("(a*1..2) -(e)> (b)")


def test_varlength_fetch_union_semantics(spark):
    """Path p0->p1->p2->p3 (Knows): *1..2 from p0 reaches {p1, p2},
    *1..3 reaches {p1, p2, p3}; a diamond (two length-2 routes to the
    same node) still yields the node once."""
    from graphydb_spark import Graph
    g = Graph(spark)
    ps = {n: g.Node("Person", name=n) for n in
          ("p0", "p1", "p2", "p3", "d1", "d2", "dz")}
    for p in ps.values():
        p.save()
    for s, e in (("p0", "p1"), ("p1", "p2"), ("p2", "p3"),
                 ("p0", "d1"), ("p0", "d2"), ("d1", "dz"), ("d2", "dz")):
        g.Edge(ps[s], "Knows", ps[e]).save()

    def reach(chain, **kw):
        df = g.fetch(chain, 'a.data.name = "p0"', as_df=True, **kw)
        rows = df.collect()
        names = sorted(
            __import__("json").loads(r["props"])["name"] for r in rows)
        return names, len(rows)

    names, n = reach("(a:Person) -(e*1..2:Knows)> [b:Person]")
    assert names == ["d1", "d2", "dz", "p1", "p2"]
    assert n == 5                       # dz via two routes → one row
    names, _ = reach("(a:Person) -(e*1..3:Knows)> [b:Person]")
    assert names == ["d1", "d2", "dz", "p1", "p2", "p3"]
    # COUNT + LIMIT compose
    assert g.fetch("(a:Person) -(e*1..2:Knows)> [b:Person]",
                   'a.data.name = "p0"', COUNT=True) == 5
    assert len(g.fetch("(a:Person) -(e*1..2:Knows)> [b:Person]",
                       'a.data.name = "p0"', LIMIT=2)) == 2
    # hydrated NSet path works too
    items = g.fetch("(a:Person) -(e*1..2:Knows)> [b:Person]",
                    'a.data.name = "p0"')
    assert {i["name"] for i in items} == {"d1", "d2", "dz", "p1", "p2"}


def test_varlength_fetch_guards(spark):
    import pytest
    from graphydb_spark import Graph, GraphydbError
    g = Graph(spark)
    a = g.Node("P", name="a")
    a.save()
    with pytest.raises(GraphydbError, match="cannot be referenced"):
        g.fetch("(a:P) -(e*1..2)> (b)", "e.data.x = 1", as_df=True)
    with pytest.raises(GraphydbError, match="ORDER"):
        g.fetch("(a:P) -(e*1..2)> (b)", ORDER="b.uid", as_df=True)


def test_anti_edge_semantics(spark):
    """-(e!:K)> keeps rows with NO matching suffix: single-hop,
    kind-discriminated, and multi-hop (no COMPLETE path) forms."""
    from graphydb_spark import Graph, GraphydbError
    import pytest
    g = Graph(spark)
    ps = {n: g.Node("Person", name=n) for n in ("a", "b", "c", "loner")}
    d = g.Node("Dog", name="rex")
    for x in (*ps.values(), d):
        x.save()
    g.Edge(ps["a"], "Likes", ps["b"]).save()
    g.Edge(ps["b"], "Likes", ps["c"]).save()
    g.Edge(ps["c"], "Owns", d).save()

    def names(chain):
        return {i["name"] for i in g.fetch(chain)}

    # who likes nobody?
    assert names("[p:Person] -(e!:Likes)> (q:Person)") == {"c", "loner"}
    # who owns nothing?
    assert names("[p:Person] -(e!:Owns)> (x)") == {"a", "b", "loner"}
    # multi-hop: who has NO complete Likes->Owns path?  only b->c->dog
    # completes, so everyone but b survives
    assert names("[p:Person] -(e!:Likes)> (q:Person) -(f:Owns)> (x)") \
        == {"a", "c", "loner"}
    # anti + COUNT composes
    assert g.fetch("[p:Person] -(e!:Likes)> (q:Person)", COUNT=True) == 2
    # guards
    with pytest.raises(GraphydbError, match="DISTINCT"):
        g.fetch("[p:Person] -(e!:Likes)> (q)", DISTINCT=False, as_df=True)
    with pytest.raises(GraphydbError, match="NULL"):
        g.fetch("[p:Person,n] -(e!:Likes)> (q)", n="COUNT(q.uid)",
                as_df=True)
    with pytest.raises(GraphydbError, match="one anti"):
        g.fetch("(a) -(e!:X)> (b) -(f!:Y)> (c)", as_df=True)


def test_item_graph_typed_props_promotion(spark):
    """Item-built graphs get the typed pstruct fast path automatically
    (SURVEY §4.3): a 3-predicate fetch compiles to struct access on the
    precomputed from_json shadow — zero get_json_object in the SQL —
    and native-typed comparison keeps numeric semantics."""
    from graphydb_spark import Graph
    g = Graph(spark)
    for i, name in enumerate(["Ann", "Bob", "Cid", "Dot"]):
        g.Node("P", name=name, age=20 + i * 10, score=0.5 + i).save()
    sql, _ = g.fetch(
        "(p:P)",
        WHERE="p.data.age > 25 AND p.data.score < 3.0 "
              "AND p.data.name != 'Cid'",
        DEBUG=True)
    assert "get_json_object" not in sql
    assert "pstruct" in sql
    out = g.fetch("(p:P)",
                  WHERE="p.data.age > 25 AND p.data.score < 3.0 "
                        "AND p.data.name != 'Cid'")
    assert sorted(n["name"] for n in out) == ["Bob"]
    # numeric compare is NATIVE (age is a long in the shadow): age > 9
    # must match 20-50, not lexicographic-string behavior
    assert g.fetch("(p:P)", WHERE="p.data.age > 9", COUNT=True) == 4


def test_item_graph_dynamic_typing_poisons_field(spark):
    """A field with conflicting value types across rows (SQLite dynamic
    typing) is never promoted — its references stay on the JSON path and
    keep working; consistently-typed fields still promote."""
    from graphydb_spark import Graph
    g = Graph(spark)
    g.Node("P", name="a", tag=1).save()
    g.Node("P", name="b", tag="one").save()     # tag flips type: poison
    g.Node("P", name="c", tag=3).save()
    sql, _ = g.fetch("(p:P)", WHERE="p.data.tag = 'one'", DEBUG=True)
    assert "get_json_object" in sql             # tag fell back to JSON
    assert g.fetch("(p:P)", WHERE="p.data.tag = 'one'", COUNT=True) == 1
    # name stayed promoted despite the poisoned sibling
    sql2, _ = g.fetch("(p:P)", WHERE="p.data.name = 'a'", DEBUG=True)
    assert "get_json_object" not in sql2
    # int-valued rows still reachable via the JSON path (stringly, the
    # get_json_object semantics a poisoned field keeps)
    assert g.fetch("(p:P)", WHERE="p.data.tag = '1'", COUNT=True) == 1


def test_item_graph_pstruct_widens_int_to_double(spark):
    """int-then-float values on one field widen the shadow to double
    instead of poisoning (both are JSON numbers)."""
    from graphydb_spark import Graph
    g = Graph(spark)
    g.Node("P", name="a", w=1).save()
    g.Node("P", name="b", w=2.5).save()
    sql, _ = g.fetch("(p:P)", WHERE="p.data.w > 1.0", DEBUG=True)
    assert "get_json_object" not in sql
    assert g.fetch("(p:P)", WHERE="p.data.w > 1.0", COUNT=True) == 1


def test_hydration_guard_refuses_oversized_frontier(spark, monkeypatch):
    """Driver-side item hydration is bounded: past MAX_HYDRATE_ROWS the
    engine refuses with the as_df route spelled out instead of OOMing
    mid-collect; as_df/COUNT stay unbounded (distributed)."""
    from graphydb_spark import Graph
    from graphydb_spark.graph import GraphydbError
    g = Graph(spark)
    nodes = [g.Node("P", name=f"n{i}").save() for i in range(6)]
    for i in range(5):
        g.Edge(nodes[0], "E", nodes[i + 1]).save()
    monkeypatch.setattr(Graph, "MAX_HYDRATE_ROWS", 3)
    with pytest.raises(GraphydbError, match="as_df"):
        g.fetch("(p:P)")
    with pytest.raises(GraphydbError, match="as_df"):
        g.traverse([nodes[0]["uid"]], "out", nodes=True)
    assert g.fetch("(p:P)", as_df=True).count() == 6      # unbounded
    assert g.fetch("(p:P)", COUNT=True) == 6
    monkeypatch.setattr(Graph, "MAX_HYDRATE_ROWS", 1_000_000)
    assert len(g.fetch("(p:P)")) == 6


def test_bulk_loaded_graph_never_promotes(spark):
    """Bulk-loaded stores hold rows the promotion never type-checked —
    a save on such a graph must NOT infer a pstruct (a conflicting
    pre-existing row would have its whole shadow nulled by from_json's
    corrupt-record semantics and silently vanish from predicates on
    consistent fields)."""
    import json as _json
    from graphydb_spark import Graph
    nodes = spark.createDataFrame(
        [("P:1", "P", 0.0, 0.0, _json.dumps({"name": "y", "tag": "one"}))],
        "uid string, kind string, ctime double, mtime double, props string")
    edges = spark.createDataFrame(
        [], "uid string, kind string, startuid string, enduid string, "
            "ctime double, mtime double, props string")
    g = Graph.from_dataframes(spark, nodes, edges)
    g.Node("P", name="x", tag=1).save()          # tag conflicts with row 1
    sql, _ = g.fetch("(p:P)", WHERE="p.data.name = 'y'", DEBUG=True)
    assert "pstruct" not in sql                  # stayed on the JSON path
    assert g.fetch("(p:P)", WHERE="p.data.name = 'y'", COUNT=True) == 1
    assert g.fetch("(p:P)", WHERE="p.data.name = 'x'", COUNT=True) == 1
