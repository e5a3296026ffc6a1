"""SQLite interop: read/write the reference's on-disk format.

The reference engine IS a SQLite file (graphydb.py:489-525): five
tables —

    nodes(uid TEXT PK, kind TEXT, ctime REAL, mtime REAL, data TEXT)
    edges(uid TEXT PK, kind TEXT, startuid TEXT, enduid TEXT,
          ctime REAL, mtime REAL, data TEXT)
    settings(key TEXT PK, value TEXT)          -- JSON values
    cache(key TEXT PK, value TEXT)             -- JSON values
    changes(id INTEGER PK AUTOINCREMENT, change TEXT)  -- JSON diffs

``data`` holds the FULL cleaned item dict as JSON (uid/kind/ctime/mtime
included, ``_``-prefixed transients stripped — graphydb.py:1325,1502),
which is exactly our ``props`` column's contract (graph.py:_item_to_row),
so import/export is a column mapping, not a re-serialization.

A user of the reference switching to this engine brings their existing
``.db`` files through :func:`import_graph`; :func:`export_graph` writes
a file the reference itself can open (same DDL, same JSON shapes), so
the migration is reversible.

Scale design: one SQLite file is a single-node artifact by construction
(the reference's stated design point is ~10k items, README.org:7), so
the driver-side read in :func:`import_graph` is the right tool for its
own data.  Fleets of shard files — the realistic "we outgrew SQLite"
shape, one .db per tenant/device/day — go through
:func:`import_shards`, which moves the ENTIRE decode to executors: the
driver never opens a database, just distributes paths; each task reads
its shard with stdlib sqlite3 and emits Arrow batches.  Adding shards
scales linearly with cluster width.

Only stdlib ``sqlite3`` + ``json`` are used (the reference needs apsw;
the FILE format is plain SQLite, readable by either).
"""
from __future__ import annotations

import json
import os
import sqlite3
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from ..graph import EDGE_SCHEMA, NODE_SCHEMA, Graph

__all__ = ["import_graph", "export_graph", "import_shards"]

_NODE_COLS = ("uid", "kind", "ctime", "mtime", "props")
_EDGE_COLS = ("uid", "kind", "startuid", "enduid", "ctime", "mtime", "props")


def _normalize_props(data_json: Optional[str]) -> Optional[str]:
    """Reference ``data`` JSON -> our canonical ``props`` (sorted keys).

    The bytes differ between engines (the reference dumps in insertion
    order); canonicalizing on import keeps our engine's invariant that
    equal items have equal ``props`` strings (graph.py:_item_to_row uses
    ``sort_keys=True``), which the exact-dedup and diff paths rely on.
    """
    if data_json is None:
        return None
    return json.dumps(json.loads(data_json), sort_keys=True)


def _read_items(conn: sqlite3.Connection, table: str,
                edge: bool) -> list[tuple]:
    cols = ("uid, kind, startuid, enduid, ctime, mtime, data" if edge
            else "uid, kind, ctime, mtime, data")
    rows = []
    for r in conn.execute(f"SELECT {cols} FROM {table}"):
        *head, data = r
        rows.append(tuple(head) + (_normalize_props(data),))
    return rows


def import_graph(spark: SparkSession, path: str) -> Graph:
    """Open a reference-format SQLite graph file as a :class:`Graph`.

    Everything round-trips: items (with their original uids and
    timestamps), settings, cache, and the change log — ``g.undo()``
    works immediately on imported history, because the reference's
    change JSON (graphydb.py:572-603) uses the same ``+``/``-``/patch
    diff vocabulary as ours (items.py:diff_items).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        try:
            have = {r[0] for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'")}
        except sqlite3.DatabaseError as e:
            raise ValueError(f"{path!r} is not a SQLite file: {e}") from e
        missing = {"nodes", "edges", "settings", "cache",
                   "changes"} - have
        if missing:
            raise ValueError(
                f"{path!r} is not a graphydb database: missing "
                f"table(s) {sorted(missing)} (expected the reference "
                "schema, graphydb.py:521-525)")
        node_rows = [(u, k, c, m, p) for (u, k, c, m, p)
                     in _read_items(conn, "nodes", edge=False)]
        edge_rows = [(u, k, s, e, c, m, p) for (u, k, s, e, c, m, p)
                     in _read_items(conn, "edges", edge=True)]
        settings = {k: json.loads(v) for k, v in
                    conn.execute("SELECT key, value FROM settings")}
        cache = {k: json.loads(v) for k, v in
                 conn.execute("SELECT key, value FROM cache")}
        changes = []
        for cid, cjson in conn.execute(
                "SELECT id, change FROM changes ORDER BY id"):
            rec = json.loads(cjson)
            rec["id"] = int(cid)  # the AUTOINCREMENT id is the key our
            changes.append(rec)   # undo/as_of machinery orders by
        # the reference stores its FTS config as the fts5 virtual
        # table's column list (graphydb.py:638-658); without restoring
        # it an imported graph's n_fts= fetches silently match nothing
        fts_node = _fts_fields(conn, "nodefts")
        fts_edge = _fts_fields(conn, "edgefts")
    finally:
        conn.close()

    nodes_df = spark.createDataFrame(node_rows, NODE_SCHEMA) \
        if node_rows else spark.createDataFrame([], NODE_SCHEMA)
    edges_df = spark.createDataFrame(edge_rows, EDGE_SCHEMA) \
        if edge_rows else spark.createDataFrame([], EDGE_SCHEMA)
    # typed-props promotion is SOUND here — unlike save-time promotion
    # on a bulk-loaded graph, every row passed through this driver
    # import, so the inferred schema saw every value (conflicts poison
    # to the JSON path).  Imported graphs get the same columnar
    # predicate fast path as item-built ones; because every row WAS
    # type-checked, the schema+poison pair is marked trusted
    # (auto_pstruct) so later saves keep INFERRING new fields instead
    # of freezing — and the trust survives write/reopen via graph meta.
    from pyspark.sql import functions as SF
    from pyspark.sql import types as ST
    auto: dict = {}
    poisons: dict = {}
    for df_name, side, rows_p in (
            ("nodes_df", "node", (r[-1] for r in node_rows)),
            ("edges_df", "edge", (r[-1] for r in edge_rows))):
        poison: set = set()
        fields = Graph._infer_pstruct_fields(rows_p, poison)
        poisons[side] = poison
        # every row passed through this pass → the side is trusted even
        # when nothing was promotable (all-container / all-conflicting
        # props): later saves must resume inference, not freeze
        auto[side] = True
        if fields:
            dtype = ST.StructType(
                [ST.StructField(k, fields[k], True)
                 for k in sorted(fields)])
            if df_name == "nodes_df":
                nodes_df = nodes_df.withColumn(
                    "pstruct", SF.from_json("props", dtype))
            else:
                edges_df = edges_df.withColumn(
                    "pstruct", SF.from_json("props", dtype))
    g = Graph.from_dataframes(spark, nodes_df, edges_df)
    g._restore_pstruct_state({"auto_pstruct": auto,
                              "pstruct_poison": {k: sorted(v) for k, v
                                                 in poisons.items()}})
    g._settings = settings
    g._cache = cache
    g._changes = changes
    g._change_seq = max((c["id"] for c in changes), default=0)
    g._fts_node_fields = fts_node
    g._fts_edge_fields = fts_edge
    return g


def _fts_fields(conn: sqlite3.Connection, table: str) -> list[str]:
    """Column list of an fts5 virtual table, minus the UNINDEXED uid —
    i.e. the reference's indexed-field config, recovered from schema."""
    row = conn.execute(
        "SELECT 1 FROM sqlite_master WHERE name = ?", (table,)).fetchone()
    if row is None:
        return []
    return sorted(r[1] for r in conn.execute(f"PRAGMA table_info({table})")
                  if r[1] != "uid")


def export_graph(graph: Graph, path: str,
                 overwrite: bool = False) -> None:
    """Write a :class:`Graph` to a SQLite file the REFERENCE can open.

    Emits the exact DDL of graphydb.py:521-525 and the same value
    shapes: ``data`` = full cleaned item JSON, settings/cache values
    JSON-encoded, change JSON without the ``id`` key (it lives in the
    AUTOINCREMENT column; rows are inserted in id order so the column
    reproduces our sequence).  Sets the reference's ``GraphyDB
    version`` marker if the graph doesn't already carry one, since the
    reference writes it on every reset (graphydb.py:530).
    """
    graph._flush()
    if os.path.exists(path):
        if not overwrite:
            raise FileExistsError(path)
        os.remove(path)
    conn = sqlite3.connect(path)
    try:
        conn.executescript("""
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
        """)
        # the reference's FTS index is an fts5 virtual table per item
        # class (graphydb.py:638-658); recreate + populate them so an
        # exported file answers the reference's MATCH queries directly
        nfts = _create_fts(conn, "nodefts", graph._fts_node_fields)
        efts = _create_fts(conn, "edgefts", graph._fts_edge_fields)
        # toLocalIterator: one partition in driver memory at a time, so
        # the export streams instead of collecting the whole graph
        for row in graph.nodes_df.select(*_NODE_COLS).toLocalIterator():
            conn.execute(
                "INSERT INTO nodes(uid, kind, ctime, mtime, data) "
                "VALUES(?,?,?,?,?)",
                (row.uid, row.kind, row.ctime, row.mtime, row.props))
            if nfts:
                _fts_insert(conn, "nodefts", graph._fts_node_fields,
                            row.uid, row.props)
        for row in graph.edges_df.select(*_EDGE_COLS).toLocalIterator():
            conn.execute(
                "INSERT INTO edges(uid, startuid, kind, enduid, ctime, "
                "mtime, data) VALUES(?,?,?,?,?,?,?)",
                (row.uid, row.startuid, row.kind, row.enduid,
                 row.ctime, row.mtime, row.props))
            if efts:
                _fts_insert(conn, "edgefts", graph._fts_edge_fields,
                            row.uid, row.props)
        settings = dict(graph._settings)
        settings.setdefault("GraphyDB version", "spark-export")
        for k, v in settings.items():
            conn.execute("INSERT INTO settings(key, value) VALUES(?,?)",
                         (k, json.dumps(v)))
        for k, v in graph._cache.items():
            conn.execute("INSERT INTO cache(key, value) VALUES(?,?)",
                         (k, json.dumps(v)))
        for rec in sorted(graph._changes, key=lambda c: c["id"]):
            body = {k: v for k, v in rec.items() if k != "id"}
            conn.execute("INSERT INTO changes(id, change) VALUES(?,?)",
                         (rec["id"], json.dumps(body)))
        conn.commit()
    finally:
        conn.close()


def _create_fts(conn: sqlite3.Connection, table: str,
                fields: list[str]) -> bool:
    """CREATE VIRTUAL TABLE ... USING fts5 per the reference's DDL.
    Returns False (skipping population) when the graph has no fields
    configured or this sqlite3 build lacks FTS5."""
    if not fields:
        return False
    cols = ",".join(fields) + ",uid UNINDEXED"
    try:
        conn.execute(
            f"CREATE VIRTUAL TABLE IF NOT EXISTS {table} "
            f"USING fts5({cols});")
        return True
    except sqlite3.OperationalError:
        return False


def _fts_insert(conn: sqlite3.Connection, table: str, fields: list[str],
                uid: str, props: Optional[str]) -> None:
    data = json.loads(props) if props else {}
    vals = [data.get(f) for f in fields]
    if all(v is None for v in vals):
        return
    cols = ", ".join(list(fields) + ["uid"])
    marks = ",".join("?" * (len(fields) + 1))
    # non-string JSON values are stored as their JSON text (true/false,
    # {"k": 1}) to match the reference's FTS row content — Python str()
    # would write 'True' / "{'k': 1}" and diverge MATCH results
    conn.execute(f"INSERT INTO {table}({cols}) VALUES({marks})",
                 [None if v is None
                  else v if isinstance(v, str)
                  else json.dumps(v) for v in vals] + [uid])


def _shard_schema(edge: bool):
    from pyspark.sql import types as T
    base = EDGE_SCHEMA if edge else NODE_SCHEMA
    # copy — StructType.add mutates in place, and base is the module-level
    # schema every Graph constructor reads
    return T.StructType(list(base.fields)
                        + [T.StructField("shard", T.StringType(), True)])


def read_shards(spark: SparkSession, paths: list[str],
                edge: bool) -> DataFrame:
    """Distributed scan over many reference-format .db shard files.

    The driver ships only the path list; every task opens its shard
    read-only with stdlib sqlite3 and yields Arrow batches
    (``mapInPandas``), so decode parallelism = min(#shards, cores) and
    no shard's rows ever pass through the driver.  A ``shard`` column
    records provenance (the input filename) for lineage filters.
    """
    import pandas as pd  # executor-side

    table = "edges" if edge else "nodes"
    cols = list(_EDGE_COLS if edge else _NODE_COLS)
    out_schema = _shard_schema(edge)

    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for p in pdf["path"]:
                conn = sqlite3.connect(f"file:{p}?mode=ro", uri=True)
                try:
                    rows = _read_items(conn, table, edge)
                finally:
                    conn.close()
                out = pd.DataFrame(rows, columns=cols)
                out["shard"] = os.path.basename(p)
                yield out[cols + ["shard"]]

    paths_df = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(min(len(paths), 256) or 1)
    return paths_df.mapInPandas(scan, schema=out_schema)


def import_shards(spark: SparkSession, paths: list[str],
                  on_conflict: str = "latest",
                  materialize: bool = True) -> Graph:
    """Union a fleet of reference .db shards into ONE :class:`Graph`.

    ``on_conflict`` resolves uid collisions across shards:
    ``"latest"`` keeps the row with the greatest ``mtime`` (ties broken
    by shard name, deterministic); ``"error"`` raises if any uid
    appears in more than one shard.  Resolution is a window-free
    groupBy(max_by) — one shuffle on uid, no driver involvement.

    Settings/cache/changes are per-shard operational state, not graph
    data; a merged graph starts with empty KV stores and a fresh change
    log (documented divergence — there is no meaningful merge order
    for independent shards' AUTOINCREMENT histories).

    ``materialize`` (default) localCheckpoints the merged frames: a
    fleet import is one-time ingest, and without it EVERY downstream
    action re-opens every shard file and re-runs the conflict shuffle
    (measured 2× the whole import per action at 64 shards).  Pass
    False only to stream the frames straight into your own sink.
    """
    from pyspark.sql import functions as F

    if not paths:
        raise ValueError("import_shards needs at least one path")
    if on_conflict not in ("latest", "error"):
        raise ValueError(f"unknown on_conflict: {on_conflict!r}")

    def dedup(df: DataFrame, edge: bool) -> DataFrame:
        if on_conflict == "error":
            clash = (df.groupBy("uid").count().where(F.col("count") > 1)
                     .select("uid").limit(5).collect())
            if clash:
                raise ValueError(
                    "uid collision across shards: "
                    + ", ".join(r.uid for r in clash))
            return df.drop("shard")
        cols = list(_EDGE_COLS if edge else _NODE_COLS)
        # sort keys lead the struct under distinct names (mtime rides in
        # the payload too — duplicate field names make s.mtime ambiguous)
        packed = F.struct(F.col("mtime").alias("_mt"),
                          F.col("shard").alias("_sh"),
                          *[F.col(c) for c in cols]).alias("s")
        win = (df.select("uid", packed).groupBy("uid")
               .agg(F.max("s").alias("s")))
        return win.select(*[F.col(f"s.{c}").alias(c) for c in cols])

    nodes = dedup(read_shards(spark, paths, edge=False), edge=False)
    edges = dedup(read_shards(spark, paths, edge=True), edge=True)
    if materialize:
        nodes = nodes.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
    return Graph.from_dataframes(spark, nodes, edges)
