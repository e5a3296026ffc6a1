"""DataFrame-level set algebra + bulk upsert + metadata persistence."""

import json

import pytest
from pyspark.sql import functions as F

from graphydb_spark import Graph, GraphydbError
from graphydb_spark.graph import NODE_SCHEMA
from graphydb_spark.operators import setops

from .conftest import build_friend_graph


def _frame(spark, rows):
    return spark.createDataFrame(
        [(u, "Person", 0.0, 0.0, json.dumps({"v": v})) for u, v in rows],
        NODE_SCHEMA)


def test_union_pref_left(spark):
    a = _frame(spark, [("u1", "left"), ("u2", "a")])
    b = _frame(spark, [("u1", "right"), ("u3", "b")])
    out = {r["uid"]: json.loads(r["props"])["v"]
           for r in setops.union_pref_left(a, b).collect()}
    assert out == {"u1": "left", "u2": "a", "u3": "b"}


def test_intersect_difference_symdiff(spark):
    a = _frame(spark, [("u1", 1), ("u2", 2)])
    b = _frame(spark, [("u2", 9), ("u3", 3)])
    assert {r["uid"] for r in setops.intersect_uids(a, b).collect()} == {"u2"}
    assert {r["uid"] for r in setops.difference_uids(a, b).collect()} == {"u1"}
    assert {r["uid"] for r in
            setops.symmetric_difference_uids(a, b).collect()} == {"u1", "u3"}
    assert setops.is_subset(_frame(spark, [("u2", 0)]), a)
    assert not setops.is_subset(b, a)


def test_python_filter_drops_raising_rows(spark):
    df = spark.createDataFrame(
        [(1, '{"age": 30}'), (2, '{"age": 10}'), (3, '{}')],
        "id long, props string")

    def pred(row):
        return json.loads(row["props"])["age"] > 20   # KeyError on id=3

    out = [r["id"] for r in setops.python_filter(df, pred).collect()]
    assert out == [1]


def test_bulk_upsert_nodes(graph, spark):
    build_friend_graph(graph)
    incoming = _frame(spark, [("u_new", 1)])
    anne_uid = graph.fetch("(n)", 'n.data.name = "Anne"').one().uid
    overwrite = spark.createDataFrame(
        [(anne_uid, "Person", 0.0, 99.0, json.dumps({"name": "Anne2"}))],
        NODE_SCHEMA)
    graph.upsert_nodes_df(incoming.unionByName(overwrite))
    assert graph.stats["nodes"] == 7
    assert graph.getuid(anne_uid)["name"] == "Anne2"


def test_bulk_upsert_edges_checks_endpoints(graph, spark):
    build_friend_graph(graph)
    bad = spark.createDataFrame(
        [("e_x", "Likes", "NOPE1", "NOPE2", 0.0, 0.0, "{}")],
        "uid string, kind string, startuid string, enduid string, "
        "ctime double, mtime double, props string")
    with pytest.raises(GraphydbError):
        graph.upsert_edges_df(bad)


def test_metadata_persistence_roundtrip(graph, spark, tmp_path):
    build_friend_graph(graph)
    graph.savesetting("theme", {"dark": True})
    graph.cache("warm", [1, 2])
    path = str(tmp_path / "gmeta")
    graph.write(path)
    g2 = Graph.open(spark, path)
    assert g2.getsetting("theme") == {"dark": True}
    assert g2.cached("warm") == [1, 2]
    assert g2.nchanges == graph.nchanges
    # change log survives → undo still works across restarts
    assert g2._fts_node_fields == ["name"]


# ----------------------------------- DataFrame-native ingest (round 9)

def test_ingest_nodes_df_state_equals_bulk_save(spark):
    """VERDICT r8 #6 parity gate: the same logical items through
    ingest_nodes_df (user-shaped DataFrame, executor-side packing) and
    bulk_save (item path) must produce IDENTICAL stored rows — uid,
    kind, times, and the byte-exact sorted-props JSON."""
    ga, gb = Graph(spark), Graph(spark)
    items = [dict(uid=f"n{i}", kind="Person", ctime=1.0, mtime=2.0,
                  name=f"p{i}", age=20 + i) for i in range(6)]
    gb.bulk_save([gb.Node(**it) for it in items], setchange=False)
    df = spark.createDataFrame(
        [(it["uid"], it["kind"], 1.0, 2.0, it["name"], it["age"])
         for it in items],
        "uid string, kind string, ctime double, mtime double, "
        "name string, age long")
    assert ga.ingest_nodes_df(df) is None
    rows_a = {r["uid"]: tuple(r) for r in ga.nodes_df
              .select("uid", "kind", "ctime", "mtime", "props").collect()}
    rows_b = {r["uid"]: tuple(r) for r in gb.nodes_df
              .select("uid", "kind", "ctime", "mtime", "props").collect()}
    assert rows_a == rows_b
    # merge-style upsert: re-ingesting an overlapping frame overwrites
    upd = spark.createDataFrame(
        [("n0", "Person", 1.0, 3.0, "p0x", 99)],
        "uid string, kind string, ctime double, mtime double, "
        "name string, age long")
    ga.ingest_nodes_df(upd)
    assert ga.stats["nodes"] == 6
    assert json.loads({r["uid"]: r["props"] for r in
                       ga.nodes_df.collect()}["n0"])["age"] == 99


def test_ingest_edges_df_endpoint_check_and_props_col(spark):
    """Edges via the props-JSON-column contract + the ONE-anti-join
    endpoint check; a dangling endpoint refuses with samples."""
    g = Graph(spark)
    g.ingest_nodes_df(spark.createDataFrame(
        [("a", "P"), ("b", "P")], "uid string, kind string"))
    edges = spark.createDataFrame(
        [("e1", "Knows", "a", "b", json.dumps({"w": 2}))],
        "uid string, kind string, startuid string, enduid string, "
        "props string")
    g.ingest_edges_df(edges)
    assert g.stats["edges"] == 1
    got = json.loads(g.edges_df.collect()[0]["props"])
    assert got["w"] == 2 and got["startuid"] == "a"
    bad = spark.createDataFrame(
        [("e2", "Knows", "a", "GHOST", "{}")],
        "uid string, kind string, startuid string, enduid string, "
        "props string")
    with pytest.raises(GraphydbError, match="endpoints missing"):
        g.ingest_edges_df(bad)


def test_ingest_journal_batch_record_not_undoable(spark):
    """journal=True appends ONE summary record (no per-item diffs at
    driver scale); undo() of that batch must refuse loudly, and the
    record must surface through lastchanges."""
    g = Graph(spark)
    batch = g.ingest_nodes_df(
        spark.createDataFrame([("x", "K"), ("y", "K")],
                              "uid string, kind string"),
        journal=True)
    assert batch is not None and g.nchanges == 1
    rec = g.lastchanges()[0]
    assert rec["bulk"] == {"side": "nodes", "rows": 2}
    assert rec["batch"] == batch
    with pytest.raises(GraphydbError, match="bulk ingest"):
        g.undo()
    # the refused undo must leave the log intact
    assert g.nchanges == 1


def test_ingest_rejects_ambiguous_props(spark):
    g = Graph(spark)
    both = spark.createDataFrame(
        [("u", "K", "{}", 5)],
        "uid string, kind string, props string, age long")
    with pytest.raises(GraphydbError, match="not both"):
        g.ingest_nodes_df(both)
    with pytest.raises(GraphydbError, match="missing columns"):
        g.ingest_nodes_df(spark.createDataFrame(
            [("u",)], "uid string"))
