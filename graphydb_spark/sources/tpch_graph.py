"""Deterministic graph encoding of the driver's TPC-H-ish parquet tables.

Implements the FIXTURES.md §5 mapping: each dimension/fact row becomes a
node ``uid = '<Kind>:<natural key>'``, foreign keys become typed edges, all
non-key columns land in the ``props`` JSON document.  ``ctime = mtime = 0.0``
so results are bit-deterministic across runs (FIXTURES.md §5).

Everything here is pure DataFrame expressions (``concat``/``to_json``/
``struct``) — no UDFs, fully codegen-able, scales linearly with input;
the unions are narrow maps over each source table so no shuffle happens
until a downstream query asks for one.

Timestamps are stored in props as epoch-seconds doubles (cast) to keep the
JSON stable and DuckDB-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph

TABLE_NAMES = ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings")


_TABLE_CACHE: dict = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # Memoized per (session, dir): spark.read.parquet does a file listing
    # and footer read on every call — ~50-80 ms × 10 tables of pure
    # driver-side overhead per query if not reused.  DataFrames are
    # immutable plans, so sharing them across queries is free.
    ck = (id(spark), sf_dir)
    if ck in _TABLE_CACHE:
        return _TABLE_CACHE[ck]
    # events.ts has shipped as TIMESTAMP(NANOS) (readable only as long
    # behind the legacy flag), as plain int64 nanos, and as timestamp[us]
    # across fixture generations — normalize whatever arrives to a µs
    # session-TZ timestamp (session TZ is pinned UTC, so this matches
    # DuckDB's naive-timestamp reading of the same file).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
           for t in TABLE_NAMES}
    ts_type = dict(out["events"].dtypes)["ts"]
    if ts_type == "bigint":  # raw nanos
        out["events"] = out["events"].withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    elif ts_type != "timestamp":  # timestamp_ntz → session-TZ timestamp
        out["events"] = out["events"].withColumn(
            "ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[ck] = out
    return out


def _uid(kind: str, key_col) -> F.Column:
    return F.concat(F.lit(kind + ":"), key_col.cast("string"))


def _node(df: DataFrame, kind: str, key: str, prop_cols: dict) -> DataFrame:
    """prop_cols: name → Column (already cast as desired).

    Besides the JSON ``props`` document, each branch carries a typed
    ``pstruct`` column of the same fields.  Branch unions merge these by
    name (missing fields → null), and Catalyst's SimplifyExtractValueOps
    folds ``pstruct.field`` back to the source parquet column — so
    JSON-path predicates compile to columnar scans with pushed filters
    instead of per-row JSON parses (the 100 TB access path).

    ``nkey`` is the raw integer natural key behind the uid: within one
    kind, ``uid = '<Kind>:' || nkey`` is a bijection, so chain joins whose
    endpoint kinds are both declared can equi-join on the int64 instead of
    hashing the concatenated string (chain.py int-key join rewrite).
    """
    own = [c.alias(n) for n, c in prop_cols.items()]
    return df.select(
        _uid(kind, F.col(key)).alias("uid"),
        F.lit(kind).alias("kind"),
        F.lit(0.0).alias("ctime"),
        F.lit(0.0).alias("mtime"),
        F.to_json(F.struct(*own)).alias("props"),
        F.struct(*own).alias("pstruct"),
        F.col(key).cast("long").alias("nkey"),
    )


def _edge(df: DataFrame, kind: str, uid_col, start_col, end_col,
          prop_cols: dict | None = None,
          skey=None, ekey=None) -> DataFrame:
    """``skey``/``ekey``: raw integer keys behind startuid/enduid (the
    int-key join fast path, see :func:`_node`)."""
    if prop_cols:
        own = [c.alias(n) for n, c in prop_cols.items()]
        props = F.to_json(F.struct(*own))
        pstruct = F.struct(*own)
    else:
        props = F.lit("{}")
        pstruct = F.struct(F.lit(None).cast("string").alias("_empty"))
    return df.select(
        uid_col.alias("uid"),
        F.lit(kind).alias("kind"),
        start_col.alias("startuid"),
        end_col.alias("enduid"),
        F.lit(0.0).alias("ctime"),
        F.lit(0.0).alias("mtime"),
        props.alias("props"),
        pstruct.alias("pstruct"),
        (skey if skey is not None else F.lit(None)).cast("long").alias("skey"),
        (ekey if ekey is not None else F.lit(None)).cast("long").alias("ekey"),
    )


def _knode(df: DataFrame, kind: str, key: str, prop_cols: dict):
    """``(kind, branch)`` pair — the kind string is spelled ONCE, in the
    builder call, and the branch dict key comes from the same string.  A
    parallel literal kind list zipped positionally onto the parts (the
    pre-r10 shape) would silently mis-map kind → branch after an
    insert/reorder in one list; typed links would then return zero rows
    with no error because compile_fetch_sql still emits the kind
    predicate (advice r9)."""
    return kind, _node(df, kind, key, prop_cols)


def _kedge(df: DataFrame, kind: str, *args, **kwargs):
    """Edge twin of :func:`_knode`."""
    return kind, _edge(df, kind, *args, **kwargs)


def _align_pstruct(parts: list[DataFrame]) -> list[DataFrame]:
    """Pad every branch's ``pstruct`` to one canonical merged schema
    (union of all branches' fields, first-seen order, nulls elsewhere).

    Doing the padding explicitly keeps each branch a single flat
    projection; iterated ``unionByName(allowMissingColumns=True)`` would
    instead re-wrap the struct once per union and the nested rebuilds
    blow up analysis time with 9 branches.
    """
    merged: dict = {}
    for p in parts:
        for f in p.schema["pstruct"].dataType.fields:
            prev = merged.setdefault(f.name, f.dataType)
            if prev != f.dataType:
                raise ValueError(
                    f"pstruct field {f.name!r} has conflicting types: "
                    f"{prev} vs {f.dataType}")
    aligned = []
    for p in parts:
        own = {f.name for f in p.schema["pstruct"].dataType.fields}
        cols = [(F.col("pstruct").getField(nm).cast(dt) if nm in own
                 else F.lit(None).cast(dt)).alias(nm)
                for nm, dt in merged.items()]
        aligned.append(p.withColumn("pstruct", F.struct(*cols)))
    return aligned


def encode_node_parts(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """kind → aligned branch frame (the union's disjoint summands).
    Exposed separately (round 9) so the Graph can declare per-kind
    frames and typed chain links compile against one branch instead of
    the 9-branch union — see Graph.declare_kind_frames."""
    c = F.col
    parts = [
        _knode(t["region"], "Region", "r_regionkey",
              {"r_regionkey": c("r_regionkey"), "r_name": c("r_name")}),
        _knode(t["nation"], "Nation", "n_nationkey",
              {"n_nationkey": c("n_nationkey"), "n_name": c("n_name"),
               "n_regionkey": c("n_regionkey")}),
        _knode(t["customer"], "Customer", "c_custkey",
              {"c_custkey": c("c_custkey"), "c_name": c("c_name"),
               "c_nationkey": c("c_nationkey"), "c_acctbal": c("c_acctbal"),
               "c_mktsegment": c("c_mktsegment")}),
        _knode(t["supplier"], "Supplier", "s_suppkey",
              {"s_suppkey": c("s_suppkey"), "s_name": c("s_name"),
               "s_nationkey": c("s_nationkey"), "s_acctbal": c("s_acctbal")}),
        _knode(t["part"], "Part", "p_partkey",
              {"p_partkey": c("p_partkey"), "p_name": c("p_name"),
               "p_brand": c("p_brand"), "p_type": c("p_type"),
               "p_size": c("p_size"), "p_retailprice": c("p_retailprice")}),
        _knode(t["orders"], "Order", "o_orderkey",
              {"o_orderkey": c("o_orderkey"), "o_custkey": c("o_custkey"),
               "o_orderstatus": c("o_orderstatus"),
               "o_totalprice": c("o_totalprice"),
               "o_orderdate": c("o_orderdate").cast("timestamp").cast("double"),
               "o_orderpriority": c("o_orderpriority")}),
        _knode(t["documents"], "Document", "doc_id",
              {"doc_id": c("doc_id"), "text": c("text"), "lang": c("lang"),
               "source": c("source"), "n_chars": c("n_chars")}),
        _knode(t["events"].select("user_id").distinct(), "User", "user_id",
              {"user_id": c("user_id")}),
        _knode(t["events"], "Event", "event_id",
              {"event_id": c("event_id"), "event_type": c("event_type"),
               "value": c("value"), "ts": c("ts").cast("double"),
               "user_id": c("user_id")}),
    ]
    kinds = [k for k, _ in parts]
    return dict(zip(kinds, _align_pstruct([p for _, p in parts])))


def encode_nodes(t: dict[str, DataFrame]) -> DataFrame:
    parts = list(encode_node_parts(t).values())
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def encode_edge_parts(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """kind → edge branch frame (see :func:`encode_node_parts`)."""
    return _encode_edge_parts(t)


def encode_edges(t: dict[str, DataFrame]) -> DataFrame:
    parts = list(_encode_edge_parts(t).values())
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _encode_edge_parts(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    from pyspark.sql import Window as W
    c = F.col
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixtures —
    # disambiguate with a deterministic row_number so edge uids stay unique
    # (uid uniqueness is a storage invariant, graphydb.py:1019-1044).
    # One window shuffle at encode time; ordering by the remaining columns
    # makes the assignment reproducible.
    li = t["lineitem"].withColumn(
        "_rn", F.row_number().over(
            W.partitionBy("l_orderkey", "l_linenumber")
             .orderBy("l_partkey", "l_suppkey", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")))
    li_uid_tail = F.concat(c("l_orderkey").cast("string"), F.lit(":"),
                           c("l_linenumber").cast("string"), F.lit(":"),
                           c("_rn").cast("string"))
    li_props = {
        "l_orderkey": c("l_orderkey"), "l_partkey": c("l_partkey"),
        "l_suppkey": c("l_suppkey"), "l_linenumber": c("l_linenumber"),
        "l_quantity": c("l_quantity"), "l_extendedprice": c("l_extendedprice"),
        "l_discount": c("l_discount"), "l_tax": c("l_tax"),
        "l_returnflag": c("l_returnflag"), "l_linestatus": c("l_linestatus"),
        "l_shipdate": c("l_shipdate").cast("timestamp").cast("double"),
    }
    parts = [
        _kedge(t["nation"], "InRegion",
              _uid("InRegion", c("n_nationkey")),
              _uid("Nation", c("n_nationkey")),
              _uid("Region", c("n_regionkey")),
              skey=c("n_nationkey"), ekey=c("n_regionkey")),
        _kedge(t["customer"], "FromNation",
              _uid("FromNation", c("c_custkey")),
              _uid("Customer", c("c_custkey")),
              _uid("Nation", c("c_nationkey")),
              skey=c("c_custkey"), ekey=c("c_nationkey")),
        _kedge(t["supplier"], "LocatedIn",
              _uid("LocatedIn", c("s_suppkey")),
              _uid("Supplier", c("s_suppkey")),
              _uid("Nation", c("s_nationkey")),
              skey=c("s_suppkey"), ekey=c("s_nationkey")),
        _kedge(t["orders"], "Placed",
              _uid("Placed", c("o_orderkey")),
              _uid("Customer", c("o_custkey")),
              _uid("Order", c("o_orderkey")),
              skey=c("o_custkey"), ekey=c("o_orderkey")),
        _kedge(li, "Contains",
              F.concat(F.lit("Contains:"), li_uid_tail),
              _uid("Order", c("l_orderkey")),
              _uid("Part", c("l_partkey")),
              li_props,
              skey=c("l_orderkey"), ekey=c("l_partkey")),
        _kedge(li, "SuppliedBy",
              F.concat(F.lit("SuppliedBy:"), li_uid_tail),
              _uid("Order", c("l_orderkey")),
              _uid("Supplier", c("l_suppkey")),
              skey=c("l_orderkey"), ekey=c("l_suppkey")),
        _kedge(t["events"], "Did",
              _uid("Did", c("event_id")),
              _uid("User", c("user_id")),
              _uid("Event", c("event_id")),
              {"event_type": c("event_type"), "value": c("value"),
               "ts": c("ts").cast("double")},
              skey=c("user_id"), ekey=c("event_id")),
    ]
    kinds = [k for k, _ in parts]
    return dict(zip(kinds, _align_pstruct([p for _, p in parts])))


_GRAPH_CACHE: dict = {}


def tpch_graph(spark: SparkSession, sf_dir: str, cache: bool = True) -> Graph:
    """Build (and memoize per session+dir) the encoded Graph.

    The node/edge frames stay LAZY (no .persist()): each union branch
    carries its kind as a literal, so a ``kind = 'X'`` filter constant-folds
    every other branch to false and Catalyst prunes it — a chain query
    scans only the parquet files it actually references.  Measured faster
    than a materialized cache even at sf0.1, and it is the only viable
    shape at 100 TB (partition-pruned scans, no duplicated copy).
    """
    key = (id(spark), sf_dir)
    if cache and key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    t = load_tables(spark, sf_dir)
    nparts, eparts = encode_node_parts(t), encode_edge_parts(t)

    def _union(parts):
        out = None
        for p in parts.values():
            out = p if out is None else out.unionByName(p)
        return out

    g = Graph.from_dataframes(spark, _union(nparts), _union(eparts))
    # typed chain links compile against the single-kind branch frames
    # (round 9): same rows, ~10x smaller analyzed plans per action
    g.declare_kind_frames(nodes=nparts, edges=eparts)
    # TPC-H foreign keys hold by construction → declare them so fetch can
    # drop provably redundant node joins from multi-hop patterns
    # (start_kind, end_kind, start_unique, end_unique): uniqueness is the
    # FK shape — e.g. exactly one FromNation edge per customer, exactly
    # one Placed edge per order.  Contains/SuppliedBy are genuinely
    # many-many (an order has many lineitems, a part is in many).
    for kind, (s, e, su, eu) in {
        "InRegion": ("Nation", "Region", True, False),
        "FromNation": ("Customer", "Nation", True, False),
        "LocatedIn": ("Supplier", "Nation", True, False),
        "Placed": ("Customer", "Order", False, True),
        "Contains": ("Order", "Part", False, False),
        "SuppliedBy": ("Order", "Supplier", False, False),
        "Did": ("User", "Event", False, True),
    }.items():
        g.declare_integrity(kind, start_kind=s, end_kind=e,
                            start_unique=su, end_unique=eu)
    if cache:
        _GRAPH_CACHE[key] = g
    return g
