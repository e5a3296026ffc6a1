"""Connector passthrough: the engine's frames are plain DataFrames, so
any spark.read source (CSV, JSON, JDBC, ...) can feed a Graph via
``from_dataframes`` — evidence for the SURVEY §2.1 formats note."""

import pytest
from pyspark.sql import functions as F

from graphydb_spark.graph import Graph


@pytest.fixture(scope="module")
def tiny_files(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("srcfmt")
    nodes = spark.createDataFrame(
        [("Person:1", "Person", 0.0, 0.0, '{"name": "Ann"}'),
         ("Person:2", "Person", 0.0, 0.0, '{"name": "Bob"}'),
         ("Drink:1", "Drink", 0.0, 0.0, '{"sort": "Coffee"}')],
        "uid string, kind string, ctime double, mtime double, props string")
    edges = spark.createDataFrame(
        [("Likes:1", "Likes", "Person:1", "Person:2", 0.0, 0.0, "{}"),
         ("Drinks:1", "Drinks", "Person:2", "Drink:1", 0.0, 0.0, "{}")],
        "uid string, kind string, startuid string, enduid string, "
        "ctime double, mtime double, props string")
    nodes.write.mode("overwrite").json(str(base / "nodes_json"))
    edges.write.mode("overwrite").json(str(base / "edges_json"))
    nodes.write.mode("overwrite").option("header", True) \
        .csv(str(base / "nodes_csv"))
    edges.write.mode("overwrite").option("header", True) \
        .csv(str(base / "edges_csv"))
    return base


def _check(g):
    likes = g.fetch("(a:Person) -(e:Likes)> [b:Person]", as_df=True)
    assert [r["uid"] for r in likes.collect()] == ["Person:2"]
    coffee = g.fetch(
        "[p:Person] -(d:Drinks)> (k:Drink)",
        'k.data.sort = "Coffee"', as_df=True)
    assert [r["uid"] for r in coffee.collect()] == ["Person:2"]


def test_graph_from_json_source(spark, tiny_files):
    g = Graph.from_dataframes(
        spark,
        spark.read.json(str(tiny_files / "nodes_json")),
        spark.read.json(str(tiny_files / "edges_json")))
    _check(g)


def test_graph_from_csv_source(spark, tiny_files):
    schema_n = ("uid string, kind string, ctime double, mtime double, "
                "props string")
    schema_e = ("uid string, kind string, startuid string, enduid string, "
                "ctime double, mtime double, props string")
    g = Graph.from_dataframes(
        spark,
        spark.read.schema(schema_n).option("header", True)
             .csv(str(tiny_files / "nodes_csv")),
        spark.read.schema(schema_e).option("header", True)
             .csv(str(tiny_files / "edges_csv")))
    _check(g)


def test_graph_from_orc_source(spark, tiny_files, tmp_path):
    """ORC round-trip: Spark's built-in columnar alternative to parquet
    reads straight into the graph (predicate pushdown included)."""
    from graphydb_spark import Graph
    nodes = spark.read.json(str(tiny_files / "nodes_json"))
    edges = spark.read.json(str(tiny_files / "edges_json"))
    nodes.write.mode("overwrite").orc(str(tmp_path / "nodes_orc"))
    edges.write.mode("overwrite").orc(str(tmp_path / "edges_orc"))
    g = Graph.from_dataframes(
        spark, spark.read.orc(str(tmp_path / "nodes_orc")),
        spark.read.orc(str(tmp_path / "edges_orc")))
    assert g.stats["nodes"] == nodes.count()
    assert g.fetch("(n)", COUNT=True) == nodes.count()
    plan = (spark.read.orc(str(tmp_path / "nodes_orc"))
            .where("uid = 'X'")._jdf.queryExecution()
            .executedPlan().toString())
    assert "PushedFilters" in plan or "pushed" in plan.lower()
