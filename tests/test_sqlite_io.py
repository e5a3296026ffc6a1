"""SQLite interop: the reference's on-disk format round-trips.

Fixture files are built directly with stdlib sqlite3 against the
reference DDL (graphydb.py:521-525) — byte-for-byte what the reference
writes via apsw — so these tests prove a reference user's existing .db
opens here, and our export opens there.
"""
import json
import os
import sqlite3

import pytest

from graphydb_spark import Graph
from graphydb_spark.sources.sqlite_io import (
    export_graph, import_graph, import_shards, read_shards)
from tests.conftest import build_friend_graph

REF_DDL = """
    CREATE TABLE nodes(uid TEXT PRIMARY KEY, kind TEXT,
        ctime REAL, mtime REAL, data TEXT);
    CREATE TABLE edges(uid TEXT PRIMARY KEY, kind TEXT,
        startuid TEXT NOT NULL REFERENCES nodes(uid),
        enduid TEXT NOT NULL REFERENCES nodes(uid),
        ctime REAL, mtime REAL, data TEXT);
    CREATE TABLE settings(key TEXT PRIMARY KEY, value TEXT);
    CREATE TABLE cache(key TEXT PRIMARY KEY, value TEXT);
    CREATE TABLE changes(id INTEGER PRIMARY KEY AUTOINCREMENT,
        change TEXT);
"""


def _make_ref_db(path, people=("Anne", "Bob", "Charlotte"),
                 likes=(("Anne", "Bob"), ("Bob", "Charlotte")),
                 mtime=100.0):
    """Write a reference-shaped .db: data JSON in the reference's
    insertion order (NOT sorted) to prove import canonicalizes."""
    conn = sqlite3.connect(path)
    conn.executescript(REF_DDL)
    uids = {}
    for i, name in enumerate(people):
        uid = f"N{i:025d}"
        uids[name] = uid
        data = {"name": name, "uid": uid, "kind": "Person",
                "ctime": 50.0, "mtime": mtime}
        conn.execute(
            "INSERT INTO nodes(uid, kind, ctime, mtime, data) "
            "VALUES(?,?,?,?,?)",
            (uid, "Person", 50.0, mtime, json.dumps(data)))
    for j, (s, e) in enumerate(likes):
        uid = f"E{j:025d}"
        data = {"uid": uid, "kind": "Likes", "startuid": uids[s],
                "enduid": uids[e], "ctime": 50.0, "mtime": mtime,
                "weight": j + 1}
        conn.execute(
            "INSERT INTO edges(uid, startuid, kind, enduid, ctime, "
            "mtime, data) VALUES(?,?,?,?,?,?,?)",
            (uid, uids[s], "Likes", uids[e], 50.0, mtime,
             json.dumps(data)))
    conn.execute("INSERT INTO settings(key, value) VALUES(?,?)",
                 ("GraphyDB version", json.dumps("0.8.15")))
    conn.execute("INSERT INTO cache(key, value) VALUES(?,?)",
                 ("hot", json.dumps({"a": 1})))
    # one add-change for the first node, reference vocabulary
    change = {"uid": uids[people[0]],
              "+": {"name": people[0], "uid": uids[people[0]],
                    "kind": "Person", "ctime": 50.0, "mtime": mtime},
              "time": 60.0, "rev": "r1"}
    conn.execute("INSERT INTO changes(change) VALUES(?)",
                 (json.dumps(change),))
    conn.commit()
    conn.close()
    return uids


def test_import_reference_db(spark, tmp_path):
    db = str(tmp_path / "ref.db")
    uids = _make_ref_db(db)
    g = import_graph(spark, db)
    assert g.stats["nodes"] == 3 and g.stats["edges"] == 2
    anne = g.getuid(uids["Anne"])
    assert anne["name"] == "Anne" and anne["kind"] == "Person"
    # props canonicalized: fetch + JSON filter works on imported rows
    ns = g.fetch("(n)", WHERE="n.data.name = 'Bob'")
    assert len(ns) == 1 and ns[0]["uid"] == uids["Bob"]
    # settings/cache/changes all travel
    assert g.getsetting("GraphyDB version") == "0.8.15"
    assert g.cached("hot") == {"a": 1}
    assert g.nchanges == 1


def test_import_change_log_is_undoable(spark, tmp_path):
    db = str(tmp_path / "ref.db")
    uids = _make_ref_db(db)
    g = import_graph(spark, db)
    g.undo()  # the imported '+' change: undo deletes Anne
    from graphydb_spark.items import GraphydbError
    with pytest.raises(GraphydbError):
        g.getuid(uids["Anne"])
    assert g.stats["nodes"] == 2


def test_export_reference_compatible(spark, tmp_path):
    g = Graph(spark)
    build_friend_graph(g)
    out = str(tmp_path / "out.db")
    export_graph(g, out)
    conn = sqlite3.connect(out)
    # schema is the reference DDL (table + column names)
    cols = [r[1] for r in conn.execute("PRAGMA table_info(edges)")]
    assert cols == ["uid", "kind", "startuid", "enduid",
                    "ctime", "mtime", "data"]
    n_nodes = conn.execute("SELECT COUNT(*) FROM nodes").fetchone()[0]
    n_edges = conn.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
    assert (n_nodes, n_edges) == (6, 10)
    # data JSON carries the full item dict, as the reference expects
    row = conn.execute(
        "SELECT uid, kind, data FROM nodes LIMIT 1").fetchone()
    data = json.loads(row[2])
    assert data["uid"] == row[0] and data["kind"] == row[1]
    assert "name" in data
    # version marker present (reference writes one on reset)
    v = conn.execute(
        "SELECT value FROM settings WHERE key='GraphyDB version'"
    ).fetchone()
    assert v is not None
    conn.close()


def test_roundtrip_identical(spark, tmp_path):
    g = Graph(spark)
    build_friend_graph(g)
    g.savesetting("theme", {"dark": True})
    out = str(tmp_path / "rt.db")
    export_graph(g, out)
    g2 = import_graph(spark, out)
    assert g2.stats["nodes"] == g.stats["nodes"]
    assert g2.stats["edges"] == g.stats["edges"]
    assert g2.getsetting("theme") == {"dark": True}
    # full value-level equality of the node set
    a = {r.uid: r.props for r in g.nodes_df.collect()}
    b = {r.uid: r.props for r in g2.nodes_df.collect()}
    assert a == b
    # change log survives the round trip with ids intact
    assert [c["id"] for c in g2._changes] == [c["id"] for c in g._changes]
    # and the re-import still answers pattern queries identically
    q1 = {n["uid"] for n in g.fetch("(p) -(e:Likes)> (q)",
                                    WHERE="q.data.name = 'Bob'")}
    q2 = {n["uid"] for n in g2.fetch("(p) -(e:Likes)> (q)",
                                     WHERE="q.data.name = 'Bob'")}
    assert q1 == q2


def test_export_refuses_overwrite(spark, tmp_path):
    g = Graph(spark)
    out = str(tmp_path / "x.db")
    export_graph(g, out)
    with pytest.raises(FileExistsError):
        export_graph(g, out)
    export_graph(g, out, overwrite=True)  # explicit opt-in works


def test_read_shards_distributed(spark, tmp_path):
    paths = []
    for i in range(4):
        p = str(tmp_path / f"shard{i}.db")
        _make_ref_db(p, people=(f"P{i}a", f"P{i}b"),
                     likes=((f"P{i}a", f"P{i}b"),))
        paths.append(p)
    nodes = read_shards(spark, paths, edge=False)
    got = nodes.collect()
    assert len(got) == 8
    assert {r.shard for r in got} == {f"shard{i}.db" for i in range(4)}


def test_import_shards_latest_wins(spark, tmp_path):
    # same uids in both shards; shard B has newer mtime -> B's props win
    pa = str(tmp_path / "a.db")
    pb = str(tmp_path / "b.db")
    _make_ref_db(pa, mtime=100.0)
    _make_ref_db(pb, mtime=200.0)
    # rewrite one node's name in shard B to observe which copy survives
    conn = sqlite3.connect(pb)
    (uid, data) = conn.execute(
        "SELECT uid, data FROM nodes LIMIT 1").fetchone()
    d = json.loads(data)
    d["name"] = "RENAMED"
    conn.execute("UPDATE nodes SET data=? WHERE uid=?",
                 (json.dumps(d), uid))
    conn.commit()
    conn.close()
    g = import_shards(spark, [pa, pb])
    assert g.stats["nodes"] == 3 and g.stats["edges"] == 2  # deduped
    assert g.getuid(uid)["name"] == "RENAMED"


def test_import_shards_error_on_conflict(spark, tmp_path):
    pa = str(tmp_path / "a.db")
    pb = str(tmp_path / "b.db")
    _make_ref_db(pa)
    _make_ref_db(pb)
    with pytest.raises(ValueError, match="uid collision"):
        import_shards(spark, [pa, pb], on_conflict="error")


def test_import_shards_disjoint_error_ok(spark, tmp_path):
    pa = str(tmp_path / "a.db")
    pb = str(tmp_path / "b.db")
    _make_ref_db(pa, people=("X1", "X2"), likes=(("X1", "X2"),))
    # distinct uid space for shard B
    conn = sqlite3.connect(pb)
    conn.executescript(REF_DDL)
    data = {"uid": "Z" * 25, "kind": "Person", "name": "solo",
            "ctime": 1.0, "mtime": 1.0}
    conn.execute(
        "INSERT INTO nodes(uid, kind, ctime, mtime, data) "
        "VALUES(?,?,?,?,?)",
        (data["uid"], "Person", 1.0, 1.0, json.dumps(data)))
    conn.commit()
    conn.close()
    g = import_shards(spark, [pa, pb], on_conflict="error")
    assert g.stats["nodes"] == 3


def test_empty_db_imports(spark, tmp_path):
    p = str(tmp_path / "empty.db")
    conn = sqlite3.connect(p)
    conn.executescript(REF_DDL)
    conn.commit()
    conn.close()
    g = import_graph(spark, p)
    assert g.stats["nodes"] == 0 and g.stats["edges"] == 0
    assert g.nchanges == 0


def test_fts_config_roundtrip(spark, tmp_path):
    """The reference's FTS config is the fts5 table's column list —
    export creates+populates it (reference MATCH works on our file),
    import recovers it (n_fts fetches work on their file)."""
    g = Graph(spark)
    build_friend_graph(g)          # resetfts(nodefields=["name"])
    out = str(tmp_path / "fts.db")
    export_graph(g, out)
    conn = sqlite3.connect(out)
    # the reference-side query: MATCH over the virtual table
    hits = conn.execute(
        "SELECT uid FROM nodefts WHERE nodefts MATCH 'Anne'").fetchall()
    assert len(hits) == 1
    anne_uid = hits[0][0]
    row = conn.execute("SELECT data FROM nodes WHERE uid = ?",
                       (anne_uid,)).fetchone()
    assert json.loads(row[0])["name"] == "Anne"
    conn.close()
    # our-side query on the re-import: FTS fetch works immediately
    g2 = import_graph(spark, out)
    assert g2._fts_node_fields == ["name"]
    res = g2.fetch("(n)", n_fts="Anne")
    assert len(res) == 1 and res[0]["name"] == "Anne"


def test_import_without_fts_tables(spark, tmp_path):
    db = str(tmp_path / "nofts.db")
    _make_ref_db(db)
    g = import_graph(spark, db)
    assert g._fts_node_fields == [] and g._fts_edge_fields == []


def test_import_rejects_non_graphydb_files(spark, tmp_path):
    junk = str(tmp_path / "junk.db")
    with open(junk, "wb") as f:
        f.write(b"not a sqlite file at all padding padding")
    with pytest.raises(ValueError, match="not a SQLite file"):
        import_graph(spark, junk)
    other = str(tmp_path / "other.db")
    sqlite3.connect(other).executescript("CREATE TABLE foo(x);")
    with pytest.raises(ValueError, match="not a graphydb database"):
        import_graph(spark, other)
    with pytest.raises(FileNotFoundError):
        import_graph(spark, str(tmp_path / "missing.db"))


def test_roundtrip_nasty_values(spark, tmp_path):
    """JSON edge cases survive export -> import: unicode, nested
    structures, floats, negative zero, big ints, quotes/newlines."""
    g = Graph(spark)
    nasty = {
        "unicode": "h\u00e9llo w\u00f6rld \u4e2d\u6587 \U0001F600",
        "nested": {"a": [1, 2, {"b": None}], "c": {"d": [[]]}},
        "float": 3.141592653589793, "negzero": -0.0,
        "bigint": 2**62, "quote": "it's \"quoted\"\nnew line",
        "emptystr": "", "emptylist": [],
        "bool": True, "none": None,
    }
    n = g.Node("Nasty", **nasty).save()
    out = str(tmp_path / "nasty.db")
    export_graph(g, out)
    g2 = import_graph(spark, out)
    item = g2.getuid(n["uid"])
    for key, want in nasty.items():
        assert item[key] == want, key


def test_graph_open_sqlite_classmethod(spark, tmp_path):
    """Graph.open_sqlite mirrors the reference's Graph(path) idiom."""
    db = str(tmp_path / "ref.db")
    uids = _make_ref_db(db)
    g = Graph.open_sqlite(spark, db)
    assert g.stats["nodes"] == 3
    assert g.getuid(uids["Anne"])["name"] == "Anne"


def test_import_promotes_typed_props(spark, tmp_path):
    """Import-time typed-props promotion is sound (every row passes
    through the driver): predicates on consistently-typed fields
    compile to pstruct access, conflicting fields stay on the JSON
    path, and results match either way."""
    from graphydb_spark import Graph
    from graphydb_spark.sources.sqlite_io import export_graph
    src = Graph(spark)
    src.Node("P", name="a", age=30, tag=1).save()
    src.Node("P", name="b", age=41, tag="one").save()   # tag conflicts
    db = str(tmp_path / "g.db")
    export_graph(src, db)
    g = Graph.open_sqlite(spark, db)
    sql, _ = g.fetch("(p:P)", WHERE="p.data.age > 35", DEBUG=True)
    assert "pstruct" in sql and "$.age" not in sql
    assert g.fetch("(p:P)", WHERE="p.data.age > 35", COUNT=True) == 1
    sql2, _ = g.fetch("(p:P)", WHERE="p.data.tag = 'one'", DEBUG=True)
    assert "get_json_object" in sql2                    # poisoned field
    assert g.fetch("(p:P)", WHERE="p.data.tag = 'one'", COUNT=True) == 1


def test_import_trust_resumes_inference_on_saves(spark, tmp_path):
    """An imported graph's full-corpus inference marks the schema
    trusted: later saves keep inferring NEW typed fields (instead of
    freezing), the import-time poison set persists, and both survive a
    parquet write/reopen cycle."""
    from graphydb_spark import Graph
    from graphydb_spark.sources.sqlite_io import export_graph
    src = Graph(spark)
    src.Node("P", name="a", age=30, tag=1).save()
    src.Node("P", name="b", age=41, tag="one").save()   # tag poisoned
    db = str(tmp_path / "g2.db")
    export_graph(src, db)
    g = Graph.open_sqlite(spark, db)
    g.Node("P", name="c", age=50, score=9.5).save()     # new field
    sql, _ = g.fetch("(p:P)", WHERE="p.data.score > 1.0", DEBUG=True)
    assert "get_json_object" not in sql and "pstruct" in sql
    assert g.fetch("(p:P)", WHERE="p.data.score > 1.0", COUNT=True) == 1
    g.Node("P", name="d", tag=2).save()                 # tag stays poisoned
    sql2, _ = g.fetch("(p:P)", WHERE="p.data.tag = 'one'", DEBUG=True)
    assert "get_json_object" in sql2
    assert g.fetch("(p:P)", WHERE="p.data.tag = 'one'", COUNT=True) == 1
    # trust survives the parquet roundtrip too
    store = str(tmp_path / "store")
    g.write(store)
    g2 = Graph.open(spark, store)
    g2.Node("P", name="e", level=3).save()
    sql3, _ = g2.fetch("(p:P)", WHERE="p.data.level = 3", DEBUG=True)
    assert "get_json_object" not in sql3
    assert g2.fetch("(p:P)", WHERE="p.data.level = 3", COUNT=True) == 1
