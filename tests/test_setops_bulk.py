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
