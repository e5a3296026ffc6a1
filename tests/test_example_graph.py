"""Port of ExampleGraphTests: change log, guarded delete, undo
(/root/reference/tests/test_graphdb.py:210-281, FIXTURES.md §3)."""

import pytest

from graphydb_spark import Graph, GraphydbError

from .conftest import build_example_graph


@pytest.fixture()
def eg(graph):
    items = build_example_graph(graph)
    return graph, items


def test_change_log_count(eg):
    """11 creation change records after setup (tests/test_graphdb.py:242-244)."""
    g, _ = eg
    assert g.nchanges == 11


def test_guarded_delete_raises(eg):
    g, it = eg
    with pytest.raises(GraphydbError):
        it["bob"].delete()          # bob still has edges


def test_json_predicate_query(eg):
    g, _ = eg
    res = g.fetch("[p:Person,strength] -(e:Drinks)> (d:Drink)",
                  'd.data.sort = "Coffee"', strength="e.data.strength")
    by_name = {n["name"]: n["_strength"] for n in res}
    assert set(by_name) == {"Anne", "Bob", "Charlie"}
    assert by_name["Anne"] == "strong"


def test_numeric_json_predicate(eg):
    g, _ = eg
    res = g.fetch("(p:Person)", "p.data.age > 21")
    assert sorted(n["name"] for n in res) == ["Anne", "Charlie"]


def test_undo_modify(eg):
    g, it = eg
    anne = it["anne"]
    anne["age"] = 23
    anne.save()
    assert g.nchanges == 12
    g.undo()
    assert g.nchanges == 11
    assert g.getuid(anne.uid)["age"] == 22


def test_undo_add_node(eg):
    g, _ = eg
    extra = g.Node("Person", name="Temp").save()
    assert g.exists(extra.uid)
    g.undo()
    assert not g.exists(extra.uid)
    assert g.nchanges == 11


def test_undo_add_edge(eg):
    g, it = eg
    e = g.Edge(it["anne"], "Likes", it["charlie"]).save()
    assert g.fetch("-(e:Likes)>", COUNT=True) == 3
    g.undo()
    assert g.fetch("-(e:Likes)>", COUNT=True) == 2
    assert not g.exists(e.uid)


def test_undo_delete_edge(eg):
    g, _ = eg
    edge = g.fetch("-(e:Likes)>").one()
    edge.delete()
    assert g.fetch("-(e:Likes)>", COUNT=True) == 1
    g.undo()
    assert g.fetch("-(e:Likes)>", COUNT=True) == 2


def test_undo_cascade_delete(eg):
    """Disconnect-delete groups all its changes into one batch; a single
    undo restores node and incident edges (tests/test_graphdb.py:250-281)."""
    g, it = eg
    bob = it["bob"]
    before = g.stats
    bob.delete(disconnect=True)
    s = g.stats
    assert s["nodes"] == before["nodes"] - 1
    assert s["edges"] == before["edges"] - 4   # 2 Likes->bob + 2 bob Drinks
    g.undo()
    s2 = g.stats
    assert s2["nodes"] == before["nodes"] and s2["edges"] == before["edges"]
    assert g.getuid(bob.uid)["nickname"] == "Bobby"


def test_undo_batched_runs_mixed_batch(eg):
    """One batch mixing adds, repeated-uid modifies, and a delete — the
    batched undo (runs split on kind switches AND repeated uids) must
    restore exactly the pre-batch state, like the per-record path
    would (VERDICT r7 #8)."""
    g, it = eg
    anne, charlie = it["anne"], it["charlie"]
    before = g.stats
    deleted_edge = g.fetch("-(e:Drinks)>").one()
    deleted_props = dict(deleted_edge.data())

    from graphydb_spark.items import generate_uid
    b = generate_uid()
    x = g.Node("Person", name="Mixed")
    g.save_node(x, batch=b)                      # add
    anne["age"] = 23
    g.save_node(anne, batch=b)                   # mod
    anne["age"] = 24
    g.save_node(anne, batch=b)                   # mod, SAME uid -> split
    g.delete_edge(deleted_edge, batch=b)         # del
    e = g.Edge(x, "Likes", charlie)
    g.save_edge(e, batch=b)                      # add again (kind switch)

    assert g.getuid(anne.uid)["age"] == 24
    g.undo()
    s = g.stats
    assert s["nodes"] == before["nodes"]
    assert s["edges"] == before["edges"]
    assert not g.exists(x.uid) and not g.exists(e.uid)
    assert g.getuid(anne.uid)["age"] == 22
    restored = g.getuid(deleted_edge.uid)
    assert {k: restored[k] for k in deleted_props} == deleted_props


def test_bulk_save_journaled_modify_prefetch(eg):
    """A journaled bulk_save of EXISTING items prefetches old values
    with one join instead of per-item uid lookups — the diffs (and
    therefore undo) must be identical to per-item saves: modifies
    journal old->new, re-saves of clean items no-op, brand-new items
    journal as pure adds."""
    g, it = eg
    anne, bob = it["anne"], it["bob"]
    anne["age"] = 40
    bob["nickname"] = "Robert"
    fresh = g.Node("Person", name="BulkFresh")
    n_before = g.nchanges
    batch = g.bulk_save([anne, bob, fresh, it["charlie"]])  # charlie clean
    assert g.nchanges == n_before + 3
    chunk = [c for c in g.lastchanges()]
    assert all(c.get("batch") == batch for c in chunk)
    by_uid = {c["uid"]: c for c in chunk}
    assert by_uid[anne.uid]["-"]["age"] == 22      # prefetched old value
    assert by_uid[anne.uid]["+"]["age"] == 40
    assert by_uid[bob.uid]["-"]["nickname"] == "Bobby"
    assert "-" not in by_uid[fresh.uid]            # pure add
    g.undo()
    assert g.getuid(anne.uid)["age"] == 22
    assert g.getuid(bob.uid)["nickname"] == "Bobby"
    assert not g.exists(fresh.uid)
    assert g.nchanges == n_before


def test_edge_endpoint_check(eg):
    g, _ = eg
    with pytest.raises(GraphydbError):
        g.Edge("NOSUCHUID1", "Likes", "NOSUCHUID2").save()


def test_settings_cache_roundtrip(graph):
    """SimpleTests parity (tests/test_graphdb.py:11-25)."""
    graph.savesetting("k", {"a": [1, 2], "b": "x"})
    assert graph.getsetting("k") == {"a": [1, 2], "b": "x"}
    assert graph.getsetting("missing", 42) == 42
    graph.cache("ck", [1, "two"])
    assert graph.cached("ck") == [1, "two"]
    with pytest.raises(KeyError):
        graph.cached("nope")


def test_copy_new_uid(eg):
    g, it = eg
    anne2 = it["anne"].copy(newuid=True)
    assert anne2.uid != it["anne"].uid
    assert anne2["name"] == "Anne"


def test_copy_default_keeps_uid(eg):
    """Reference default (graphydb.py:1260): copy() is a same-uid handle."""
    g, it = eg
    anne2 = it["anne"].copy()
    assert anne2.uid == it["anne"].uid
    assert anne2["name"] == "Anne"


def test_deepcopy_isolates_nested_values(eg):
    g, it = eg
    anne = it["anne"]
    anne["tags"] = ["a", "b"]
    shallow = anne.copy()
    deep = anne.deepcopy()
    anne["tags"].append("c")
    assert shallow["tags"] == ["a", "b", "c"]   # shares the list
    assert deep["tags"] == ["a", "b"]           # isolated
    assert deep.uid == anne.uid
    assert anne.deepcopy(newuid=True).uid != anne.uid


def test_discard_and_set_changed(eg):
    g, it = eg
    anne = it["anne"].copy()
    anne["nickname"] = "Ann"
    assert anne.discard("nickname") is anne
    assert "nickname" not in anne
    anne.discard("nickname")  # absent key is a no-op (graphydb.py:1229)
    anne.setChanged(False)
    assert not anne.changed
    anne.setChanged(True)
    assert anne.changed


def test_set_graph_and_fts_shims(eg):
    g, it = eg
    loose = type(it["anne"])(kind="Person", name="Zoe")
    loose.graph = None
    assert loose.setGraph(g, changed=False) is loose
    assert loose.graph is g and not loose.changed
    # derived-index shims return self so ported reference code chains
    assert loose.updatefts(name="Zoe") is loose
    assert loose.deletefts() is loose


def test_deletechange_prunes_one_record(eg):
    g, it = eg
    before = g.nchanges
    anne = it["anne"]
    anne["mood"] = "curious"
    anne.save()
    assert g.nchanges == before + 1
    last_id = g.lastchanges()[-1]["id"]
    g.deletechange(last_id)
    assert g.nchanges == before
    assert all(c["id"] != last_id for c in g.lastchanges())


def test_as_of_change_snapshot(spark):
    """Beyond-reference time travel: as_of_change(k) reconstructs the
    state right after change k on a NEW graph, leaving the original and
    its log untouched (the reference can only destructively undo)."""
    from graphydb_spark import Graph
    g = Graph(spark)
    n1 = g.Node("P", name="one")
    n1.save()
    k = g.nchanges
    g.Node("P", name="two").save()
    e = g.Edge(n1, "Self", n1)
    e.save()
    n1["name"] = "one-renamed"
    n1.save()

    snap = g.as_of_change(k)
    assert snap.stats["nodes"] == 1 and snap.stats["edges"] == 0
    assert snap.getuid(n1["uid"])["name"] == "one"
    assert snap.nchanges == k
    # original untouched
    assert g.stats["nodes"] == 2 and g.stats["edges"] == 1
    assert g.getuid(n1["uid"])["name"] == "one-renamed"
    # pre-history snapshot is empty
    empty = g.as_of_change(0)
    assert empty.stats["nodes"] == 0 and empty.stats["edges"] == 0


def test_as_of_change_preserves_behavioral_config(spark):
    """The snapshot must behave like the graph it was taken from: FTS
    field lists and declared edge integrity travel with it (a snapshot
    that silently FTS-matches nothing, or silently drops join
    elimination, is not a snapshot)."""
    from graphydb_spark import Graph
    g = Graph(spark)
    g.declare_integrity("Wrote", "Author", "Doc")
    a = g.Node("Author", name="Grace Hopper")
    a.save()
    d = g.Node("Doc", title="compilers and subroutines")
    d.save()
    g.Edge(a, "Wrote", d).save()
    g.resetfts(nodefields=["name", "title"])
    k = g.nchanges

    snap = g.as_of_change(k)
    assert snap.edge_integrity == g.edge_integrity
    assert snap._fts_node_fields == g._fts_node_fields
    # an FTS fetch on the snapshot finds the same node the live graph does
    live = g.fetch("[d:Doc]", FTS="compilers", as_df=True).count()
    got = snap.fetch("[d:Doc]", FTS="compilers", as_df=True).count()
    assert live == 1 and got == 1


def test_where_on_optional_alias_rejected(spark):
    """A WHERE predicate over an optional link would run after the LEFT
    JOIN and silently turn it inner — same guard class as the FTS one."""
    import pytest
    from graphydb_spark import Graph, GraphydbError
    g = Graph(spark)
    c = g.Node("Customer", name="c")
    c.save()
    with pytest.raises(GraphydbError, match="optional"):
        g.fetch("[c:Customer] -(pl?:Placed)> (o)",
                "pl.data.x = 1", as_df=True)


def test_k_core_warns_when_not_converged(spark):
    """A peel loop cut off before the fixpoint must say so (the result
    is a superset of the true k-core), not silently return."""
    import warnings
    from graphydb_spark.operators.graph_algos import k_core
    # a 6-node pendant chain peels ~one endpoint layer per round at k=2
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)],
        "startuid string, enduid string")
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(7)], "uid string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        k_core(nodes, edges, k=2, max_iter=1)
        assert any("fixpoint" in str(x.message) for x in w)


def test_original_and_renew(spark):
    """Parity with graphydb.py:1141-1163 and the reference undo_change
    fixture (test_graphdb.py:257-264): original() reads persisted state;
    renew() discards local edits in place, keeps transient _ keys, and
    records no change item."""
    from graphydb_spark import Graph
    g = Graph(spark)
    bob = g.Node("Person", name="Bob", nickname="Bobby")
    bob.save()

    # original() reflects the store, not unsaved local edits
    bob["nickname"] = "Bobs The Impaler"
    assert bob.original()["nickname"] == "Bobby"
    bob.save()
    assert bob.original()["nickname"] == "Bobs The Impaler"
    g.undo()
    assert bob.original()["nickname"] == "Bobby"

    # renew(): local edits discarded, _ keys survive, no change recorded
    bob["nickname"] = "unsaved-edit"
    bob["_score"] = 0.75
    n_before = g.nchanges
    out = bob.renew()
    assert out is bob
    assert bob["nickname"] == "Bobby"
    assert bob["_score"] == 0.75
    assert not bob.changed
    assert g.nchanges == n_before

    # exists property (graphydb.py:1129-1139)
    assert bob.exists
    ghost = g.Node("Person", name="ghost")
    assert not ghost.exists


def test_cascade_delete_hub_vectorized(spark):
    """Cascade delete of a 10k-edge hub must be O(1) Spark jobs, not
    O(degree): the incident set is journaled from one collect and
    removed with one pushed-down filter."""
    from graphydb_spark import Graph
    from graphydb_spark.graph import NODE_SCHEMA, EDGE_SCHEMA
    import time as _t

    g = Graph(spark)
    hub = g.Node("Hub", name="hub")
    hub.save()
    n = 10_000
    now = _t.time()
    nodes = [(f"SPOKE{i:020d}", "Spoke", now, now, "{}") for i in range(n)]
    g.upsert_nodes_df(spark.createDataFrame(nodes, NODE_SCHEMA))
    edges = [(f"E{i:023d}", "Link", hub.uid, f"SPOKE{i:020d}",
              now, now, '{"startuid": "%s"}' % hub.uid)
             for i in range(n)]
    g.upsert_edges_df(spark.createDataFrame(edges, EDGE_SCHEMA), check=False)
    assert g.stats["edges"] == n

    t0 = _t.time()
    hub.delete(disconnect=True, setchange=False)
    elapsed = _t.time() - t0
    assert g.stats["edges"] == 0
    assert g.stats["nodes"] == n  # spokes survive
    # O(degree) jobs took minutes; the vectorized path is a few seconds
    assert elapsed < 30, f"cascade took {elapsed:.1f}s — not vectorized?"


def test_cascade_delete_journals_and_undoes(spark):
    """The vectorized cascade still writes one change record per edge
    under one batch, and undo() restores node + edges atomically."""
    from graphydb_spark import Graph
    g = Graph(spark)
    hub = g.Node("Hub", name="h")
    hub.save()
    spokes = [g.Node("S", i=i) for i in range(3)]
    for s in spokes:
        s.save()
        g.Edge(hub, "L", s).save()
    before = g.nchanges
    hub.delete(disconnect=True)
    # 3 edge deletes + 1 node delete in the same batch
    assert g.nchanges == before + 4
    batches = {c.get("batch") for c in g.lastchanges()}
    assert len(batches) == 1
    assert g.stats["edges"] == 0 and g.stats["nodes"] == 3
    g.undo()
    assert g.stats["edges"] == 3 and g.stats["nodes"] == 4
