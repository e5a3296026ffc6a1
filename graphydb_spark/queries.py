"""The declared query catalog: SURVEY.md §2 inventory as runnable queries.

Each entry is ``name → (spark_fn, oracle_sql | None)``:

* ``spark_fn(spark, sf_dir) → DataFrame`` — the engine path (graph fetch /
  operator / SQL escape hatch).
* ``oracle_sql`` — ANSI SQL DuckDB runs on the raw parquet views
  (``region nation customer supplier part orders lineitem events documents
  embeddings``) producing the same rows, column names, and types.  ``None``
  for non-SQL-expressible ops (iterative algorithms) → driver records a
  rows-only check.

Determinism ground rules (why the SQL looks the way it does):
* money/value sums go through DECIMAL(18,2) (order-independent, exact) and
  are cast to DOUBLE at the very end on both sides;
* top-k queries carry a uid/id tiebreak so the selected row set is unique;
* md5 is the portable hash (same hex in Spark and DuckDB);
* the tokenizer is lower + split on non-alphanumeric in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import (dedup, graph_algos, persisted_index, relational,
                        similarity, text)
from .sources.tpch_graph import load_tables, tpch_graph
from .streaming.windows import sessionize, tumbling_counts

# --------------------------------------------------------------------------
# helpers

_NODE_KINDS_SQL = """
SELECT 'Region' AS kind, COUNT(*) AS n FROM region
UNION ALL SELECT 'Nation', COUNT(*) FROM nation
UNION ALL SELECT 'Customer', COUNT(*) FROM customer
UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'Part', COUNT(*) FROM part
UNION ALL SELECT 'Order', COUNT(*) FROM orders
UNION ALL SELECT 'Document', COUNT(*) FROM documents
UNION ALL SELECT 'User', COUNT(DISTINCT user_id) FROM events
UNION ALL SELECT 'Event', COUNT(*) FROM events
"""

_EDGE_KINDS_SQL = """
SELECT 'InRegion' AS kind, COUNT(*) AS n FROM nation
UNION ALL SELECT 'FromNation', COUNT(*) FROM customer
UNION ALL SELECT 'LocatedIn', COUNT(*) FROM supplier
UNION ALL SELECT 'Placed', COUNT(*) FROM orders
UNION ALL SELECT 'Contains', COUNT(*) FROM lineitem
UNION ALL SELECT 'SuppliedBy', COUNT(*) FROM lineitem
UNION ALL SELECT 'Did', COUNT(*) FROM events
"""

_TOKENIZE_DUCK = "string_split_regex(lower({col}), '[^a-z0-9]+')"

# Shared CTE chain: minhash candidate pairs → undirected edge closure
# (used by the dedup_clusters oracle and the dedup_resolve oracle that
# builds on it; the trailing SELECT differs per query).
_CLUSTER_CTES = """toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
          FROM documents
        ), sh AS (
          SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
                i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
                AS mh
          FROM toks WHERE len(ws) >= 3
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id
        ), dedges(a, b) AS (
          SELECT id_a, id_b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ), dnodes(id) AS (SELECT DISTINCT a FROM dedges),
        reach(src, dst) AS (
          SELECT id, id FROM dnodes
          UNION
          SELECT r.src, e.b FROM reach r JOIN dedges e ON e.a = r.dst
        )"""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"]


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# IVF-blocked embeddings (memoized per session × sf_dir): the deterministic
# k-means assignment that turns every pairwise-embedding query below from
# an O(n²) cross join into a block-diagonal same-cell join — O(Σ n_c²)
# with n_c ≈ n/k, the SemDeDup blocking shape.  All consumers share k=8,
# iters=2 so their oracles share the same unrolled-Lloyd CTE chain
# (_ivf_ctes), which replays the identical centroid trajectory.
_IVFB_CACHE: dict = {}
_IVFB_K, _IVFB_ITERS = 8, 2


def _ivfb_full(spark, sf_dir):
    """(assigned, centroids) of the session-shared deterministic
    k=8/iters=2 k-means over embeddings — computed ONCE per
    (session, sf_dir) and shared by the pairwise-embedding family AND
    the persisted-IVF build (closes the r4 ledger note about the two
    families each running the identical k-means)."""
    key = (id(spark), sf_dir)
    got = _IVFB_CACHE.get(key)
    if got is None:
        indexed, cents = similarity.ivf_index(_emb(spark, sf_dir),
                                              k=_IVFB_K,
                                              iters=_IVFB_ITERS)
        got = (indexed.localCheckpoint(eager=True), cents)
        _IVFB_CACHE[key] = got
    return got


def _ivf_blocked(spark, sf_dir):
    return _ivfb_full(spark, sf_dir)[0]


def _register_raw(spark, sf_dir):
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# --------------------------------------------------------------------------
# graph-core queries (SURVEY §2.1-§2.8 over the FIXTURES §5 encoding)

def q_node_kind_counts(spark, sf_dir):
    """S14 stats: node totals per kind."""
    g = tpch_graph(spark, sf_dir)
    return g.nodes_df.groupBy("kind").agg(F.count("*").alias("n"))


def q_edge_kind_counts(spark, sf_dir):
    g = tpch_graph(spark, sf_dir)
    return g.edges_df.groupBy("kind").agg(F.count("*").alias("n"))


def q_filter_json(spark, sf_dir):
    """P3/P4: JSON-path predicate on a node scan."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch("(c:Customer)", 'c.data.c_mktsegment = "BUILDING"',
                   as_df=True).select("uid")


def q_filter_glob(spark, sf_dir):
    """C2: GLOB translation (case-sensitive wildcard match)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch("(c:Customer)", "c.uid GLOB 'Customer:1?'",
                   as_df=True).select("uid")


def q_one_hop(spark, sf_dir):
    """J1: node-edge-node equi-join with JSON predicate + typed extra."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "(c:Customer) -(e:Placed)> [o:Order,total]",
        "CAST(o.data.o_totalprice AS DOUBLE) > 300000",
        total="CAST(o.data.o_totalprice AS DOUBLE)",
        as_df=True).select("uid", "total")


def q_two_hop(spark, sf_dir):
    """J3: 2-hop chain with leftward edges (region → its customers).

    PROJECT=['uid'] + the declared FromNation FK eliminate the customer
    node join entirely — the plan scans region + two edge kinds and
    never touches the (largest) node table."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "(r:Region) <(ir:InRegion)- (n:Nation) <(fn:FromNation)- [c:Customer]",
        'r.data.r_name = "ASIA"', as_df=True, PROJECT=["uid"])


def q_three_hop(spark, sf_dir):
    """J3: customer→order→part chain, DISTINCT-by-uid collect (A3).
    PROJECT=['uid'] elides the customer node join (uid reads off the
    Placed edge's int start key; dedup groups on the int64)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "[c:Customer] -(pl:Placed)> (o:Order) -(ct:Contains)> (p:Part)",
        "CAST(p.data.p_size AS INT) = 10", as_df=True, PROJECT=["uid"])


def q_group_count(spark, sf_dir):
    """A2: GROUP BY with aggregate extra (orders per customer)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "[c:Customer,ordercount] -(pl:Placed)> (o:Order)",
        GROUP="c.uid", ordercount="COUNT(o.uid)",
        as_df=True).select("uid", "ordercount")


def q_order_limit(spark, sf_dir):
    """O1+O2: top-10 orders by totalprice (uid tiebreak)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "[o:Order,total]",
        ORDER="total DESC, uid ASC", LIMIT=10,
        total="CAST(o.data.o_totalprice AS DOUBLE)",
        as_df=True).select("uid", "total")


def q_count_distinct(spark, sf_dir):
    """A1: COUNT(DISTINCT uid) of customers having orders."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch("[c:Customer] -(pl:Placed)> (o:Order)",
                   COUNT=True, as_df=True)


def q_traverse_out(spark, sf_dir):
    """J9: set-anchored frontier traversal as ONE join (users 0-4 → their
    events)."""
    g = tpch_graph(spark, sf_dir)
    frontier = spark.createDataFrame(
        [(f"User:{i}",) for i in range(5)], "uid string")
    hit = (g.edges_df.where(F.col("kind") == "Did")
           .join(frontier.withColumnRenamed("uid", "startuid"), "startuid")
           .select(F.col("enduid").alias("uid")).distinct())
    return hit


def q_degree_supplier(spark, sf_dir):
    """A5: both-direction degree per supplier node.  The declared
    endpoint-kind map turns the uid-prefix restriction into a literal
    kind filter (branch-pruned scan) + int-key aggregation."""
    g = tpch_graph(spark, sf_dir)
    return graph_algos.degrees(g.edges_df, "both", node_kind="Supplier",
                               endpoint_kinds=g.edge_integrity)


def q_set_difference(spark, sf_dir):
    """U3: customers with no orders (anti-join difference on uid)."""
    g = tpch_graph(spark, sf_dir)
    cust = g.fetch("(c:Customer)", as_df=True).select("uid")
    with_orders = (g.edges_df.where(F.col("kind") == "Placed")
                   .select(F.col("startuid").alias("uid")))
    return cust.join(with_orders, "uid", "left_anti")


def q_set_intersection(spark, sf_dir):
    """U2: BUILDING-segment ∩ acctbal>5000 (semi-join on uid)."""
    g = tpch_graph(spark, sf_dir)
    a = g.fetch("(c:Customer)", 'c.data.c_mktsegment = "BUILDING"',
                as_df=True).select("uid")
    b = g.fetch("(c:Customer)", "CAST(c.data.c_acctbal AS DOUBLE) > 5000",
                as_df=True).select("uid")
    return a.join(b, "uid", "left_semi")


def q_fts_term(spark, sf_dir):
    """F2: FTS term match over Document.text."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts="data", as_df=True).select("uid")


def q_fts_prefix(spark, sf_dir):
    """F2: FTS prefix match ``quer*``."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts="quer*", as_df=True).select("uid")


def q_fts_and(spark, sf_dir):
    """F2: implicit-AND of two terms."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts="data query", as_df=True).select("uid")


def q_sql_escape_hatch(spark, sf_dir):
    """S13: raw SQL over the graph views (edge-kind histogram of
    high-quantity Contains edges)."""
    g = tpch_graph(spark, sf_dir)
    return g.sql("""
        SELECT count(*) AS n
        FROM edges e
        WHERE e.kind = 'Contains'
          AND CAST(get_json_object(e.props, '$.l_quantity') AS DOUBLE) > 45
    """)


def q_offset_page(spark, sf_dir):
    """O2+O3: pagination — second page of the totalprice ranking."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "[o:Order,total]",
        ORDER="total DESC, uid ASC", LIMIT=10, OFFSET=10,
        total="CAST(o.data.o_totalprice AS DOUBLE)",
        as_df=True).select("uid", "total")


def q_group_concat(spark, sf_dir):
    """A2/C: GROUP_CONCAT rewrite (sorted, deterministic) — supplier names
    per nation."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "[n:Nation,snames] <(l:LocatedIn)- (s:Supplier)",
        GROUP="n.uid", snames="GROUP_CONCAT(s.data.s_name)",
        as_df=True).select("uid", "snames")


def q_theta_join(spark, sf_dir):
    """J5: cross-link theta predicate (order worth >100× the customer's
    balance)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "(c:Customer) -(p:Placed)> [o:Order]",
        "CAST(o.data.o_totalprice AS DOUBLE) > "
        "100 * CAST(c.data.c_acctbal AS DOUBLE)",
        as_df=True).select("uid")


def q_param_bind(spark, sf_dir):
    """P6: named parameter binding."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "(c:Customer)",
        ["c.data.c_mktsegment = :seg",
         "CAST(c.data.c_acctbal AS DOUBLE) >= :minbal"],
        seg="MACHINERY", minbal=1000,
        as_df=True).select("uid")


def q_point_lookup(spark, sf_dir):
    """S4: point lookup by uid (bound parameter)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch("(n)", "n.uid = :u", u="Customer:7",
                   as_df=True).select("uid", "kind")


def q_edge_prop_filter(spark, sf_dir):
    """P3 on edge props: parts appearing in returned lineitems."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "(o:Order) -(ct:Contains)> [p:Part]",
        'ct.data.l_returnflag = "R"',
        as_df=True).select("uid").distinct()


def q_fts_or(spark, sf_dir):
    """F2: OR of two terms."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts="data OR stream",
                   as_df=True).select("uid")


def q_fts_not(spark, sf_dir):
    """F2: NOT (docs with 'data' but not 'query')."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts="data NOT query",
                   as_df=True).select("uid")


def q_fts_field(spark, sf_dir):
    """F2: column-restricted match ``lang: en``."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text", "lang"])
    return g.fetch("(d:Document)", d_fts="lang: en",
                   as_df=True).select("uid")


def q_fts_phrase(spark, sf_dir):
    """F2 extension: FTS5-style quoted PHRASE match (adjacent positions
    in the token index).  Oracle replays it as a substring probe on the
    space-joined normalized token stream — equivalent because tokens are
    [a-z0-9]+ joined by single spaces."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts='"table hash"',
                   as_df=True).select("uid")


def q_fts_near(spark, sf_dir):
    """F2 extension: FTS proximity match ``query NEAR/3 table`` (≤ 3
    tokens strictly between, either order — FTS3 infix / FTS5 NEAR()
    semantics).  Compiles to a positional band-join over per-term
    postings; the DuckDB oracle replays it as a positional self-join on
    the same tokenizer."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text"])
    return g.fetch("(d:Document)", d_fts="query NEAR/3 table",
                   as_df=True).select("uid")


def q_fts_colgroup(spark, sf_dir):
    """F2 extension: FTS5 column-group syntax ``{text lang}: en`` —
    the term may match in ANY of the listed fields.  Here: documents
    whose text contains the token 'en' OR whose lang field is 'en'."""
    g = tpch_graph(spark, sf_dir)
    g.resetfts(nodefields=["text", "lang"])
    return g.fetch("(d:Document)", d_fts="{text lang}: en",
                   as_df=True).select("uid")


def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition signals: per-document top-2-gram share
    and duplicated-2-gram share, with the keep decision (top ≤ 0.2 AND
    dup ≤ 0.6).  Explode → per-(doc, gram) count → two ratios; the
    doc id rides the grouping key so partial aggregation collapses
    the gram stream before the shuffle."""
    from .operators.text import repetition_stats
    docs = _docs(spark, sf_dir)
    st = repetition_stats(docs, "doc_id", "text", n=2)
    return st.select(
        "doc_id", "top_frac", "dup_frac",
        ((F.col("top_frac") <= 0.2) & (F.col("dup_frac") <= 0.6))
        .alias("keep"))


def q_hits_authorities(spark, sf_dir):
    """HITS hubs/authorities over the Contains graph (orders are hubs,
    parts authorities): top-10 authorities.  The oracle replays the
    same 5 sum-normalized synchronous rounds unrolled; scores compare
    at 6 dp (float-summation-order tolerance, as pagerank)."""
    g = tpch_graph(spark, sf_dir)
    edges = g.edges_df.where(F.col("kind") == "Contains")
    h = graph_algos.hits(edges, iters=5)
    return (h.select("uid", F.round("authority", 6).alias("authority"))
            .orderBy(F.col("authority").desc(), "uid").limit(10))


def q_link_prediction(spark, sf_dir):
    """Adamic-Adar link prediction between orders sharing parts: score
    = Σ 1/ln(orders-per-shared-part) — rarer co-parts weigh more.
    Junction degrees above 4096 are excluded before the wedge join
    (cap_group_size guard, replayed by the oracle)."""
    g = tpch_graph(spark, sf_dir)
    edges = g.edges_df.where(F.col("kind") == "Contains")
    aa = graph_algos.adamic_adar(edges, max_junction_degree=4096)
    return (aa.orderBy(F.col("aa_score").desc(), "u", "v").limit(20)
            .select("u", "v", "aa_score", "common"))


def q_pack_sequences(spark, sf_dir):
    """Sequence packing: documents concatenated (id order) into
    2048-token training sequences; one row per (sequence, document)
    with the in-sequence offset and the truncated carried token count —
    the cross-document attention-mask metadata a packed loader needs."""
    from .operators.pipeline import pack_sequences
    docs = _docs(spark, sf_dir)
    return pack_sequences(docs, "doc_id", "n_chars", seq_len=2048)


def q_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from customers 0-4 over the Placed/Contains
    graph: rank mass = proximity to the seed customers (the
    related-entities / recommendation primitive).  Top-15 non-seed
    nodes; oracle replays the same 5 unrolled seed-teleport rounds."""
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(F.col("kind").isin("Customer", "Order", "Part"))
    edges = g.edges_df.where(F.col("kind").isin("Placed", "Contains"))
    seeds = [f"Customer:{i}" for i in range(5)]
    pr = graph_algos.personalized_pagerank(nodes, edges, seeds, iters=5)
    return (pr.where(~F.col("uid").isin(seeds))
            .select("uid", F.round("rank", 9).alias("rank"))
            .where(F.col("rank") > 0)
            .orderBy(F.col("rank").desc(), "uid").limit(15))


def q_var_length_reach(spark, sf_dir):
    """Variable-length chain (beyond reference, Cypher *1..2): every
    node within 1-2 out-hops of customers 0-4 — orders + home nations
    at depth 1, their parts + regions at depth 2.  Compiles to a UNION
    of fixed-length join trees, distinct by collect uid."""
    g = tpch_graph(spark, sf_dir)
    seeds = ", ".join(f"'Customer:{i}'" for i in range(5))
    return g.fetch("(c:Customer) -(e*1..2)> [x]",
                   f"c.uid IN ({seeds})", as_df=True).select("uid")


def q_bfs_paths(spark, sf_dir):
    """BFS with path reconstruction from Customer:0 (2 out-hops): every
    reached node with its hop distance and ONE deterministic shortest
    path (min-lexicographic parent route) — the provenance-carrying
    traversal bfs_distances drops."""
    g = tpch_graph(spark, sf_dir)
    seeds = spark.createDataFrame([("Customer:0",)], "uid string")
    return graph_algos.bfs_paths(g.edges_df, seeds, max_depth=2,
                                 direction="out")


def q_empty_orders(spark, sf_dir):
    """Anti-edge chain (beyond reference, Cypher's WHERE NOT exists):
    orders with NO Contains edge — ``-(ct!:Contains)>`` compiles to the
    LEFT-JOIN suffix plus a last-alias IS NULL filter, which Catalyst
    plans as an anti join.  Non-empty on the fixtures (27 / 257 empty
    orders at sf0.001 / sf0.01)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch("[o:Order] -(ct!:Contains)> (p:Part)",
                   as_df=True).select("uid")


def q_sliding_window(spark, sf_dir):
    """Sliding window (1 h window, 30 min slide) counts per type."""
    from .streaming.windows import sliding_counts
    out = sliding_counts(_events(spark, sf_dir), "1 hour", "30 minutes")
    return out.select(F.col("wstart").cast("double").alias("wstart"),
                      "event_type", "n")


def q_bpe_token_count(spark, sf_dir):
    """BPE-ish sub-word unit counting (GPT-2-style pre-tokenizer regex)."""
    return text.bpe_ish_token_count(_docs(spark, sf_dir)) \
        .select("doc_id", "bpe_tokens")


def q_jaccard_pairs(spark, sf_dir):
    """Candidate pairs from MinHash LSH verified with exact 3-shingle
    Jaccard (the LSH-then-verify pipeline)."""
    docs = _docs(spark, sf_dir)
    cand = q_minhash_pairs(spark, sf_dir)
    out = dedup.jaccard_verify(docs, cand, threshold=0.3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_containment_pairs(spark, sf_dir):
    """LSH candidates scored with asymmetric containment both ways —
    the quote/subset detector symmetric Jaccard misses.  FULL oracle
    (exact integer set sizes, 6 dp rounding before the threshold)."""
    docs = _docs(spark, sf_dir)
    cand = q_minhash_pairs(spark, sf_dir)
    from .operators.dedup import containment_pairs
    return containment_pairs(docs, cand, threshold=0.5)


_CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
        i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
        AS mh
  FROM toks WHERE len(ws) >= 3
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id
), shd AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM toks WHERE len(ws) >= 3
), scored AS (
  SELECT id_a, id_b,
         round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / greatest(len(a.s), 1), 6) AS ca,
         round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / greatest(len(b.s), 1), 6) AS cb
  FROM cand JOIN shd a ON a.doc_id = id_a
            JOIN shd b ON b.doc_id = id_b
)
SELECT id_a, id_b, ca AS containment_a, cb AS containment_b
FROM scored WHERE ca >= 0.5 OR cb >= 0.5
"""


# --------------------------------------------------------------------------
# relational headliners (scale/bench anchors; S13 spark.sql parity)

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < '1995-03-15 00:00:00'
  AND l_shipdate  > '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
"""

# Spark-side Q3: same semantics as _Q3_SQL (the DuckDB oracle replays the
# flat form), restructured for scale.  The aggregation is pushed below the
# fact-side join: revenue is grouped by l_orderkey BEFORE joining — exact
# because o_orderkey is unique in co, so the post-join GROUP BY
# (l_orderkey, o_orderdate) partitions rows identically.  At any scale
# this shrinks the fact side to one row per qualifying order before it
# meets the orders side; locally it also means the statically-chosen hash
# build is the genuinely small post-agg side, not a 300k-row raw scan
# (the r02 regression: the compression-blind file-size estimate made the
# planner broadcast filtered lineitem — a single-threaded hash build).
# The only forced hint is on the segment-filtered customer (dim-sized);
# fact tables carry no hints, so at cluster scale every fact join
# degrades to a shuffle join on its own size evidence.
_Q3_SPARK_SQL = """
WITH co AS (
  SELECT /*+ BROADCAST(customer) */ o_orderkey, o_orderdate
  FROM customer JOIN orders ON c_custkey = o_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < '1995-03-15 00:00:00'
),
la AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1 - l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem
  WHERE l_shipdate > '1995-03-15 00:00:00'
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate
FROM la JOIN co ON l_orderkey = o_orderkey
"""

_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01 00:00:00'
  AND l_shipdate < '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_Q3ISH_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


def q_graph_q1(spark, sf_dir):
    """TPC-H Q1 expressed IN the graph DSL over Contains-edge JSON props —
    exercises GROUP with aggregate extras and the compiler's json_tuple
    fusion (one parse per edge for 5 referenced keys)."""
    g = tpch_graph(spark, sf_dir)
    epoch_cut = 904694400.0  # 1998-09-02 UTC
    return g.fetch(
        "-[ct:Contains,l_returnflag,l_linestatus,sum_qty,sum_base_price,"
        "sum_disc_price,count_order]>",
        f"CAST(ct.data.l_shipdate AS DOUBLE) <= {epoch_cut}",
        GROUP="ct.data.l_returnflag, ct.data.l_linestatus",
        l_returnflag="ct.data.l_returnflag",
        l_linestatus="ct.data.l_linestatus",
        sum_qty="CAST(SUM(CAST(ct.data.l_quantity AS DECIMAL(18,2))) "
                "AS DOUBLE)",
        sum_base_price="CAST(SUM(CAST(ct.data.l_extendedprice "
                       "AS DECIMAL(18,2))) AS DOUBLE)",
        sum_disc_price="CAST(SUM(CAST(ct.data.l_extendedprice AS "
                       "DECIMAL(18,2)) * CAST(1 - CAST(ct.data.l_discount "
                       "AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE)",
        count_order="COUNT(ct.uid)",
        as_df=True,
    ).select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "count_order")


def q_tpch_q1(spark, sf_dir):
    _register_raw(spark, sf_dir)
    return spark.sql(_Q1_SQL)


def q_tpch_q6(spark, sf_dir):
    _register_raw(spark, sf_dir)
    return spark.sql(_Q6_SQL)


def q_orders_by_segment(spark, sf_dir):
    _register_raw(spark, sf_dir)
    return spark.sql(_Q3ISH_SQL)


# --------------------------------------------------------------------------
# LLM-pipeline extensions (SURVEY §7.3)

def q_dedup_exact(spark, sf_dir):
    """Exact dedup on content fingerprint (normalized token stream).

    Emits every fingerprint group (not just dups) so the oracle hash-checks
    the md5 fingerprints themselves — a far stronger parity signal than an
    empty dup list."""
    docs = text.fingerprint(_docs(spark, sf_dir))
    return docs.groupBy("fp").agg(F.count("*").alias("n_dups"),
                                  F.min("doc_id").alias("keep_id"))


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs (single-hash band, md5).

    The signature frame is localCheckpointed before the self-join so the
    md5-over-shingles computation runs once, not once per join side."""
    docs = _docs(spark, sf_dir)
    sig = dedup.minhash_signature(docs, num_hashes=1).localCheckpoint()
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sig0"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sig0").alias("s2"))
    return (a.join(b, (F.col("sig0") == F.col("s2")) &
                   (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b"))


def q_top_bigrams(spark, sf_dir):
    """Corpus collocations: top-20 bigrams by frequency (bigram tiebreak).
    One explode + one count — the canonical n-gram statistics shape."""
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda t: t != "")
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, i: F.concat_ws(" ", t, F.get(toks, i + 1)))
    return (docs.select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram").agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("bigram").asc())
            .limit(20))


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: transitive closure over the minhash candidate
    pairs — (doc_id, cluster) with cluster = min doc id in the component,
    i.e. the canonical keep decision of a dedup pipeline."""
    docs = _docs(spark, sf_dir)
    sig = dedup.minhash_signature(docs, num_hashes=1).localCheckpoint()
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sig0"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sig0").alias("s2"))
    pairs = (a.join(b, (F.col("sig0") == F.col("s2")) &
                    (F.col("id_a") < F.col("id_b")))
             .select("id_a", "id_b"))
    return dedup.dedup_clusters(pairs)


def q_dedup_resolve(spark, sf_dir):
    """Near-dup RESOLUTION: keep the best-scoring member of each
    minhash cluster (score = text length here; ties to lowest id) —
    the keep-best policy layered on q_dedup_clusters' closure."""
    docs = _docs(spark, sf_dir)
    sig = dedup.minhash_signature(docs, num_hashes=1).localCheckpoint()
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sig0"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sig0").alias("s2"))
    pairs = (a.join(b, (F.col("sig0") == F.col("s2")) &
                    (F.col("id_a") < F.col("id_b")))
             .select("id_a", "id_b"))
    clusters = dedup.dedup_clusters(pairs)
    return dedup.resolve_duplicates(docs, clusters, F.length("text"))


def q_text_stats(spark, sf_dir):
    """Per-doc token/char stats (JVM-side tokenizer)."""
    return text.with_text_stats(_docs(spark, sf_dir)) \
        .select("doc_id", "n_tokens", "n_chars_obs")


def q_token_count_by_lang(spark, sf_dir):
    return (text.token_counts(_docs(spark, sf_dir), group_col="lang")
            .select("lang", "total_tokens"))


def q_quality_score(spark, sf_dir):
    """Quality signal as exact integer counts (n_stopwords / n_tokens) —
    integer outputs avoid cross-engine float-rounding divergence; the
    ratio form lives in operators.text.quality_score."""
    from .operators.text import STOPWORDS, tokens
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    swarr = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.array_contains(swarr, t)))
         .cast("long").alias("n_stopwords"),
        F.size(toks).cast("long").alias("n_tokens"))


def q_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-5 neighbors of vec_id=0 (deterministic
    sequential-fold arithmetic, rounded to 1e-6)."""
    emb = _emb(spark, sf_dir)
    qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    top = similarity.cosine_topk(emb, list(qv), k=5, exclude_ids=[0])
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_events_window(spark, sf_dir):
    """Event-time tumbling window (1 h) counts+sums per type.

    Window start emitted as epoch seconds (double) — timestamp objects
    round-trip differently across engines; epoch doubles don't."""
    out = tumbling_counts(_events(spark, sf_dir), "1 hour")
    return out.select(F.col("wstart").cast("double").alias("wstart"),
                      "event_type", "n", "total")


def q_sessionize(spark, sf_dir):
    """30-min-gap sessionization per user (lag + cumsum windows)."""
    return sessionize(_events(spark, sf_dir), gap_minutes=30)


#: the wedge pivot is the part: a part in n orders yields n(n-1)/2
#: customer pairs, so one viral part would emit quadratically.  TPC-H
#: part degrees are ~30, far under the cap — never binds at test
#: scale; the oracle replays the same exclusion.
MAX_PART_DEGREE = 4096


def q_copurchase_pairs(spark, sf_dir):
    """Motif/wedge query: distinct customer pairs who ordered the same
    part — a 6-hop chain (c1→o1→part←o2←c2) compiled to ONE Spark SQL
    join tree with a cross-link theta (c1.uid < c2.uid).

    Skew guard: parts whose Contains-degree exceeds MAX_PART_DEGREE are
    excluded from the wedge BEFORE the self-join (one map-side-combined
    aggregation; the hot set is outliers by construction, normally
    empty, and the filter lands on the pt scan side of the join)."""
    g = tpch_graph(spark, sf_dir)
    hot = (g.edges_df.where(F.col("kind") == "Contains")
           .groupBy("enduid").agg(F.count("*").alias("d"))
           .where(F.col("d") > MAX_PART_DEGREE)
           .select("enduid").limit(1000).collect())
    where = ["c1.uid < c2.uid"]
    if hot:
        uids = ", ".join(f"'{r['enduid']}'" for r in hot)
        where.append(f"pt.uid NOT IN ({uids})")
    return g.fetch(
        "[c1:Customer,other] -(p1:Placed)> (o1:Order) -(ct1:Contains)> "
        "(pt:Part) <(ct2:Contains)- (o2:Order) <(p2:Placed)- (c2:Customer)",
        where,
        other="c2.uid",
        as_df=True).select("uid", "other").distinct()


def q_asof_join(spark, sf_dir):
    """Backward as-of join: each click event enriched with the user's most
    recent view event at-or-before it (union-tag + last-ignore-nulls
    window — one shuffle, no range explosion)."""
    ev = _events(spark, sf_dir)
    clicks = (ev.where(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    views = (ev.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("view_id")))
    out = relational.asof_join(clicks, views, on="user_id",
                               right_cols=("view_id",))
    return out.select("event_id", F.col("view_id_matched").alias("view_id"))


def q_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (pandas merge_asof 'nearest'): each
    click picks the view with the smallest |Δt|, ties backward.  Two
    window passes on one key partitioning — no range explosion."""
    ev = _events(spark, sf_dir)
    clicks = (ev.where(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    views = (ev.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("view_id")))
    out = relational.asof_join(clicks, views, on="user_id",
                               right_cols=("view_id",),
                               direction="nearest")
    return out.select("event_id", F.col("view_id_matched").alias("view_id"))


def q_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer by totalprice (row_number window with a
    total-order tiebreak)."""
    orders = load_tables(spark, sf_dir)["orders"]
    out = relational.topk_per_group(
        orders, ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=3)
    return out.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP aggregate (grand total + per-flag + per-flag-status rows) —
    multi-level aggregation in one pass."""
    _register_raw(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")


def q_cube_revenue(spark, sf_dir):
    """CUBE aggregate — all 4 grouping-set combinations in one pass
    (partial aggregation handles the expansion map-side)."""
    _register_raw(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev,
               COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")


def q_percentile_price(spark, sf_dir):
    """Exact interpolated percentiles (median, p90) per order priority —
    order-statistic aggregates the reference cannot express at all."""
    _register_raw(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority,
               ROUND(percentile(o_totalprice, 0.5), 6) AS p50,
               ROUND(percentile(o_totalprice, 0.9), 6) AS p90
        FROM orders GROUP BY o_orderpriority""")


def q_moving_avg_daily(spark, sf_dir):
    """7-day moving average of daily revenue (window frame over an
    ordered date axis).  Daily sums in DECIMAL so the frame aggregation
    is exact and engine-portable; the final divide is one double op."""
    _register_raw(spark, sf_dir)
    return spark.sql("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY CAST(o_orderdate AS DATE)
        )
        SELECT CAST(d AS STRING) AS d,
               CAST(CAST(SUM(rev) OVER w AS DOUBLE)
                    / (COUNT(*) OVER w) AS DOUBLE) AS avg7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""")


def q_range_join_events(spark, sf_dir):
    """Forward range join via bucketing: for each error event, the count
    of same-user clicks in the following 24 h.  Equi-join on
    (user, time-bucket) with bounded 2x fanout — no per-key cross
    product, unlike a naive inequality join."""
    ev = (_events(spark, sf_dir)
          .withColumn("tsd", F.col("ts").cast("double")))
    errors = (ev.where(F.col("event_type") == "error")
              .select("event_id", "user_id", F.col("tsd").alias("lts")))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", F.col("tsd").alias("rts")))
    out = relational.range_join(errors, clicks, on="user_id",
                                window_s=86400.0)
    return (out.groupBy("event_id")
            .agg(F.count("*").alias("n_clicks")))


def q_pivot_status(spark, sf_dir):
    """Pivot (wide aggregation): order counts per priority x status.
    DataFrame ``.pivot`` with an explicit value list, so the output schema
    is fixed at plan time (no extra distinct-values job, and the plan is
    a single partial+final aggregate — no shuffle per pivot column)."""
    orders = load_tables(spark, sf_dir)["orders"]
    out = (orders.groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["F", "O", "P"])
           .agg(F.count(F.lit(1))))
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"))


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS — two independent group-bys in one scan+expand pass
    (the generalization of the reference's single GROUP clause)."""
    _register_raw(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""")


def q_window_rank(spark, sf_dir):
    """Ranking + lag analytics: top-3 orders per priority with the gap to
    the previous order's price.  Window ORDER carries an o_orderkey
    tiebreak so rank/lag are deterministic across engines."""
    from pyspark.sql.window import Window
    orders = load_tables(spark, sf_dir)["orders"]
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
    return (orders
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .withColumn("rnk", F.rank().over(w).cast("long"))
            .withColumn("prev_price", F.lag("o_totalprice").over(w))
            .where(F.col("rnk") <= 3))


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): 3-way join with per-side pushed
    filters, DECIMAL-exact revenue.  Aggregation is pushed below the
    fact join (see _Q3_SPARK_SQL) so the fact table is reduced to one
    row per order before any join; the only broadcast hint is the
    segment-filtered customer (dim-sized)."""
    _register_raw(spark, sf_dir)
    return spark.sql(_Q3_SPARK_SQL)


def q_anti_join_customers(spark, sf_dir):
    """Anti join: customers with no big-ticket order (left_anti against a
    filtered build side — the relational face of the graph set-difference
    in q:set_difference).  The filter lands on the anti-join's build side
    before the shuffle, so the probe never sees disqualified orders."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].where(F.col("o_totalprice") > 400000)
    return (t["customer"]
            .join(big, t["customer"].c_custkey == big.o_custkey,
                  "left_anti")
            .select("c_custkey", "c_name"))


def q_regex_extract(spark, sf_dir):
    """Regex extraction over document text (first engine keyword) —
    JVM-side regexp_extract, no Python in the loop."""
    docs = _docs(spark, sf_dir)
    pat = "(spark|stream|scan|sort)"
    return (docs
            .select("doc_id",
                    F.regexp_extract("text", pat, 1).alias("kw"))
            .where(F.col("kw") != ""))


def q_hash_sample(spark, sf_dir):
    """Deterministic engine-portable sampling: keep rows whose md5(key)
    prefix falls under a threshold (~6.25%).  Unlike TABLESAMPLE this is
    reproducible across engines, partitionings, and reruns — the property
    a training-data pipeline needs for stable holdout splits."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (orders
            .where(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                               1, 2) < "10")
            .select("o_orderkey", "o_totalprice"))


def q_embedding_near_dup(spark, sf_dir):
    """Embedding near-duplicate pairs (cosine ≥ 0.35, rounded before
    thresholding so both engines cut on the same 6-dp value) over the
    IVF-BLOCKED candidate set: pairs are generated by a same-cell
    equi-join on the shared deterministic k-means assignment
    (_ivf_blocked — O(Σ n_c²), never the O(n²) cross join), then the
    exact cosine verifies.  The oracle replays the identical unrolled
    Lloyd chain, so the blocked pair set is engine-reproducible;
    lsh_near_dup is the sibling path with sign-hash candidates."""
    idx = _ivf_blocked(spark, sf_dir)
    a = idx.select("cluster", F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("ea"))
    b = idx.select("cluster", F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("eb"))
    pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
    out = pairs.withColumn(
        "cosine", F.round(similarity.cosine_expr(F.col("ea"),
                                                 F.col("eb")), 6))
    return (out.where(F.col("cosine") >= 0.35)
            .select("id_a", "id_b", "cosine"))


def q_bm25_rank(spark, sf_dir):
    """BM25-ranked retrieval for ['data','query'] over Document.text —
    top 10 with deterministic tie-break (F5 as a first-class ranked
    operator; full SQL-replay oracle)."""
    from .fts import bm25_scores, build_tf_index
    g = tpch_graph(spark, sf_dir)
    docs = g.nodes_df.where(F.col("kind") == "Document")
    idx = build_tf_index(docs, ["text"])
    return (bm25_scores(idx, ["data", "query"])
            .orderBy(F.col("score").desc(), F.col("uid"))
            .limit(10).select("uid"))


def q_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN probe for vec_id=0 — FULL hash oracle: the
    seeded k-means is reproducible by construction (k-lowest-id init,
    lowest-cluster tie-break, order-free quantized Lloyd mean — see
    similarity.ivf_index), so the oracle replays both Lloyd rounds as
    unrolled CTEs and walks the identical centroid trajectory."""
    emb = _emb(spark, sf_dir)
    qv = list(emb.where(F.col("vec_id") == 0)
              .select("embedding").collect()[0][0])
    indexed, cents = similarity.ivf_index(emb, k=8, iters=2)
    top = similarity.ivf_topk(indexed, cents, qv, k=6, nprobe=2)
    return (top.where(F.col("vec_id") != 0)
            .select("vec_id", F.round("cosine", 6).alias("cosine")))


def _ivf_oracle_sql(k: int = 8, iters: int = 2, nprobe: int = 2,
                    topk: int = 6) -> str:
    """DuckDB replay of q_ivf_topk — the engine's k-means unrolled round
    by round (same pattern as the pagerank/k_core unrolled-CTE oracles).

    Reproducibility rests on three shared-by-construction rules:
    seed = the k lowest vec_ids; argmin ties break to the lowest cluster
    id; the Lloyd re-average is the quantized integer mean
    (round(v*1e9) → exact BIGINT sum → one double divide), bit-identical
    at any parallelism in any engine.  Distances and cosines are the same
    sequential left-to-right folds the engine's F.aggregate emits
    (list_sum ≡ fold — already load-bearing for the knn_cosine oracle).
    """
    return _ivf_ctes(k, iters) + f""",
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM e WHERE vec_id = 0),
probe AS (
  SELECT c FROM (
    SELECT c{iters}.c,
           list_sum(list_transform(range(1, len(q.qv)+1),
             i -> (c{iters}.cent[i] - q.qv[i])
                * (c{iters}.cent[i] - q.qv[i]))) AS d
    FROM c{iters}, q) ORDER BY d, c LIMIT {nprobe}),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding)+1),
           i -> q.qv[i] * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(q.qv)+1),
              i -> q.qv[i] * q.qv[i])))
          * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
              i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE))))) AS cos
  FROM e JOIN fin USING (vec_id), q
  WHERE fin.c IN (SELECT c FROM probe))
SELECT vec_id, cosine FROM (
  SELECT vec_id, round(cos, 6) AS cosine
  FROM scored ORDER BY cos DESC, vec_id LIMIT {topk})
WHERE vec_id != 0"""


def _ivf_ctes(k: int, iters: int,
              source: str = "SELECT vec_id, embedding FROM embeddings",
              pfx: str = "", with_kw: bool = True) -> str:
    """The unrolled k-means CTE chain shared by the ivf_topk,
    cluster_balanced, semantic_dedup and pq_topk oracles: seeds →
    per-round (assign, quantized mean, centroid) → final assignment
    ``fin(vec_id, c)``.  ``source`` overrides the corpus CTE (e.g. to
    replay a planted-twin corpus); ``pfx`` namespaces every CTE so
    several chains (one per PQ subspace) compose in one query;
    ``with_kw=False`` drops the leading WITH for chained use."""
    e, fin = f"{pfx}e", f"{pfx}fin"

    def cn(r):
        return f"{pfx}c{r}"

    def dist(c):
        return (f"list_sum(list_transform(range(1, len({e}.embedding)+1), "
                f"i -> ({c}.cent[i] - CAST({e}.embedding[i] AS DOUBLE)) * "
                f"({c}.cent[i] - CAST({e}.embedding[i] AS DOUBLE))))")

    kw = "WITH " if with_kw else ""
    sql = [f"""
{kw}{e} AS ({source}),
{cn(0)} AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
  FROM (SELECT vec_id, embedding FROM {e} ORDER BY vec_id LIMIT {k}))"""]
    for r in range(1, iters + 1):
        p = cn(r - 1)
        a, m = f"{pfx}a{r}", f"{pfx}m{r}"
        sql.append(f""",
{a} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT {e}.vec_id, {p}.c,
           row_number() OVER (PARTITION BY {e}.vec_id
                              ORDER BY {dist(p)}, {p}.c) AS rn
    FROM {e}, {p}) WHERE rn = 1),
{m} AS (
  SELECT {a}.c, t.i AS dim,
         CAST(SUM(CAST(ROUND(CAST({e}.embedding[t.i] AS DOUBLE) * 1e9)
                       AS BIGINT)) AS DOUBLE) / (1e9 * COUNT(*)) AS m
  FROM {a} JOIN {e} USING (vec_id),
       UNNEST(range(1, len({e}.embedding)+1)) AS t(i)
  GROUP BY {a}.c, t.i),
{cn(r)} AS MATERIALIZED (
  SELECT {p}.c, COALESCE(g.cent, {p}.cent) AS cent
  FROM {p} LEFT JOIN (SELECT c, list(m ORDER BY dim) AS cent
                      FROM {m} GROUP BY c) g USING (c))""")
    fc = cn(iters)
    sql.append(f""",
{fin} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT {e}.vec_id, {fc}.c,
           row_number() OVER (PARTITION BY {e}.vec_id
                              ORDER BY {dist(fc)}, {fc}.c) AS rn
    FROM {e}, {fc}) WHERE rn = 1)""")
    return "".join(sql)


def _cluster_balanced_oracle_sql(k: int = 8, iters: int = 2,
                                 per_group: int = 40) -> str:
    """DuckDB replay of q_cluster_balanced: the shared IVF CTE chain
    delivers the engine-identical assignments; the per-cluster rate and
    the md5 hash gate replay pipeline.balanced_sample verbatim."""
    return _ivf_ctes(k, iters) + f""",
counts AS (SELECT c, COUNT(*) AS n FROM fin GROUP BY c),
rates AS (SELECT c, LEAST(1.0, CAST({per_group} AS DOUBLE) / n) AS rate
          FROM counts)
SELECT f.vec_id, f.c AS cluster
FROM fin f JOIN rates USING (c)
WHERE rate >= 1.0
   OR substr(md5(CAST(f.vec_id AS VARCHAR)), 1, 4)
      < printf('%04x', CAST(floor(rate * 65536) AS INT))"""


def q_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM quality score (Jelinek–Mercer λ=0.7) —
    the word-order-sensitive upgrade of unigram_logprob.  FULL oracle:
    exact ML bigram + add-one unigram tables replay in SQL; the 6 dp
    decimal per-position rounding makes the mean order-free."""
    from .operators.pipeline import bigram_logprob
    return bigram_logprob(_docs(spark, sf_dir), lam=0.7)


def _bigram_logprob_oracle_sql(lam: float = 0.7) -> str:
    """The λ literals are rendered with repr() so DuckDB parses the
    SAME doubles the engine computes — in particular 1-λ is
    0.30000000000000004, not 0.3 (a 1-ulp difference that could flip
    the 6 dp rounding on a boundary-sitting position)."""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents WHERE len(list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '')) >= 2),
uni AS (SELECT t.tok, COUNT(*) AS tf FROM toks, UNNEST(ws) AS t(tok)
        GROUP BY 1),
tot AS (SELECT SUM(tf) AS total, COUNT(*) AS vocab FROM uni),
grams AS (
  SELECT doc_id, ws[t.i] AS prev, ws[t.i + 1] AS cur
  FROM toks, UNNEST(range(1, len(ws))) AS t(i)),
bi AS (SELECT prev, cur, COUNT(*) AS bc FROM grams GROUP BY 1, 2),
ctx AS (SELECT prev, SUM(bc) AS cc FROM bi GROUP BY 1)
SELECT g.doc_id,
       ROUND(CAST(SUM(CAST(ROUND(log10(
           {float(lam)!r} * bc / cc
           + {1.0 - float(lam)!r} * (tf + 1) / (total + vocab)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS bigram_logprob,
       COUNT(*)::BIGINT AS n_bigrams
FROM grams g
JOIN bi USING (prev, cur)
JOIN ctx USING (prev)
JOIN uni ON uni.tok = g.cur, tot
GROUP BY 1"""


def q_source_reputation(spark, sf_dir):
    """Domain-level quality gate (C4/RefinedWeb URL-level stage): mean
    stopword ratio + doc count per source, kept = mean ≥ 0.06 ∧ n ≥ 5.
    FULL oracle — the quantized-integer mean reproduces bit-for-bit."""
    from .operators.pipeline import source_reputation
    rep = source_reputation(_docs(spark, sf_dir), min_mean_ratio=0.06,
                            min_docs=5)
    return rep.select("source", "n_docs",
                      F.round("mean_ratio", 9).alias("mean_ratio"), "kept")


_SOURCE_REPUTATION_ORACLE = """
WITH toks AS (
  SELECT source, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
ratio AS (
  SELECT source,
    CAST(len(list_filter(ws, t -> list_contains(
      ['the','a','of','and','to','in','is','for','on','with'], t)))
      AS DOUBLE) / GREATEST(len(ws), 1) AS r
  FROM toks),
stats AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs,
         CAST(SUM(CAST(ROUND(r * 1e9) AS BIGINT)) AS DOUBLE)
           / (1e9 * COUNT(*)) AS mean_ratio
  FROM ratio GROUP BY source)
SELECT source, n_docs, ROUND(mean_ratio, 9) AS mean_ratio,
       (mean_ratio >= 0.06 AND n_docs >= 5) AS kept
FROM stats"""


def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
    over documents, weight = token count: top-50 by u^(1/w) with
    hash-derived u.  FULL oracle — the sample is deterministic, so
    DuckDB replays the identical selection."""
    from .operators.pipeline import weighted_sample
    docs = _docs(spark, sf_dir)
    wt = F.size(text.tokens(F.col("text")))
    top = weighted_sample(docs, wt, "doc_id", n=50)
    return top.select("doc_id", "weight",
                      F.round("score", 6).alias("score"))


_WEIGHTED_SAMPLE_ORACLE = """
WITH wt AS (
  SELECT doc_id,
         CAST(len(list_filter(
           string_split_regex(lower(text),'[^a-z0-9]+'),
           x -> x != '')) AS DOUBLE) AS weight,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0 AS u
  FROM documents)
SELECT doc_id, weight,
       ROUND(CASE WHEN weight > 0 THEN POW(u, 1.0/weight)
                  ELSE 0 END, 6) AS score
FROM wt
ORDER BY ROUND(CASE WHEN weight > 0 THEN POW(u, 1.0/weight)
               ELSE 0 END, 12) DESC,
         doc_id
LIMIT 50"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the embeddings table with
    planted near-dup twins (every 50th vector gets a +0.1-on-dim-0 copy
    at id+100000, cosine ≈ 0.995 to its original — the fixture has no
    natural pairs above 0.48, so exactly the twins are dropped).  FULL
    hash oracle: the shared unrolled-k-means CTE chain runs on the same
    planted corpus, then the within-cluster dominance check replays
    pairwise (lower-id neighbor with cosine ≥ 0.95 ⇒ kept=false)."""
    emb = _emb(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", as_double.alias("embedding"))
    pert = (base.where(F.col("vec_id") % 50 == 0)
            .select((F.col("vec_id") + 100000).alias("vec_id"),
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: F.when(i == 0, x + F.lit(0.1))
                                      .otherwise(x)).alias("embedding")))
    corpus = base.unionByName(pert)
    return similarity.semantic_dedup(corpus, k=8, iters=2, min_cosine=0.95)


_SEMDEDUP_SOURCE = """SELECT vec_id, embedding FROM (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(range(1, len(embedding)+1),
           i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.1
                     ELSE CAST(embedding[i] AS DOUBLE) END)
  FROM embeddings WHERE vec_id % 50 = 0)"""


def _semantic_dedup_oracle_sql(k: int = 8, iters: int = 2,
                               thresh: float = 0.95) -> str:
    """DuckDB replay of q_semantic_dedup: planted corpus → shared
    unrolled k-means → within-cluster lower-id dominance."""
    cos = ("list_sum(list_transform(range(1, len(a.embedding)+1), "
           "i -> a.embedding[i] * b.embedding[i])) "
           "/ (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), "
           "i -> a.embedding[i] * a.embedding[i]))) "
           "* sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), "
           "i -> b.embedding[i] * b.embedding[i]))))")
    return _ivf_ctes(k, iters, source=_SEMDEDUP_SOURCE) + f""",
dom AS (
  SELECT DISTINCT fb.vec_id AS vid
  FROM fin fa JOIN fin fb ON fa.c = fb.c AND fa.vec_id < fb.vec_id
  JOIN e a ON a.vec_id = fa.vec_id
  JOIN e b ON b.vec_id = fb.vec_id
  WHERE {cos} >= {thresh})
SELECT f.vec_id, f.c AS cluster, (d.vid IS NULL) AS kept
FROM fin f LEFT JOIN dom d ON f.vec_id = d.vid"""


def q_cluster_balanced(spark, sf_dir):
    """Diversity sampling over embedding clusters: ~40 vectors kept per
    IVF k-means cluster (small clusters survive whole) — the
    cluster-balanced training-mix step.  FULL hash oracle: the shared
    unrolled-k-means CTE chain reproduces the assignments, then the
    rate + md5 gate replay balanced_sample verbatim."""
    from .operators.pipeline import balanced_sample
    emb = _emb(spark, sf_dir)
    indexed, _ = similarity.ivf_index(emb, k=8, iters=2)
    return (balanced_sample(indexed, "cluster", "vec_id", per_group=40)
            .select("vec_id", "cluster"))


def q_k_hop(spark, sf_dir):
    """Frontier expansion: everything within 2 out-hops of customers 0-9
    (customers → their orders → parts/suppliers on those orders)."""
    g = tpch_graph(spark, sf_dir)
    seeds = spark.createDataFrame(
        [(f"Customer:{i}",) for i in range(10)], "uid string")
    return graph_algos.k_hop(g.edges_df, seeds, k=2, direction="out")


def q_language_id(spark, sf_dir):
    """Stopword-vote language heuristic per doc (SQL-replay oracle from
    the same stopword lists; argmax = max hits, ties to max code)."""
    return text.language_id(_docs(spark, sf_dir)) \
        .select("doc_id", "lang_guess")


def q_connected_components(spark, sf_dir):
    """Iterative label propagation on the Nation/Region subgraph.
    FULL oracle: recursive-CTE transitive closure + min-label."""
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(F.col("kind").isin("Nation", "Region"))
    edges = g.edges_df.where(F.col("kind") == "InRegion")
    return graph_algos.connected_components(nodes, edges, max_iter=6)


def q_triangles_copurchase(spark, sf_dir):
    """Global triangle count of the part co-purchase graph (parts linked
    when some order contains both).  Degree-ranked edge orientation
    bounds the wedge fanout by sqrt(m) per node — the property that
    keeps the self-join alive on power-law co-occurrence graphs."""
    # Explicit numPartitions on the self-join key: AQE would size this
    # stage by its input bytes (lineitem's 2 columns are ~10 MB) and
    # coalesce the join to ~3 tasks, but the join OUTPUT is the per-order
    # pair explosion — parallelize for the work.  One exchange serves
    # both sides of the self-join.
    n_part = spark.sparkContext.defaultParallelism * 2
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey")
          .repartition(n_part, "l_orderkey"))
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").alias("pa"),
                  F.col("b.l_partkey").alias("pb")))
    # no .distinct() here: triangle_count canonicalizes+dedups anyway —
    # a second dedup would be one more full shuffle of the pair stream
    return graph_algos.triangle_count(co, "pa", "pb")


def q_bfs_distance(spark, sf_dir):
    """Minimum hop distance from the ASIA region node over the undirected
    Region-Nation-Customer-Order subgraph, depth ≤ 3 — frontier BFS
    where each round shuffles only the new frontier."""
    t = load_tables(spark, sf_dir)
    seed = (t["region"].where(F.col("r_name") == "ASIA")
            .select(F.concat(F.lit("Region:"),
                             F.col("r_regionkey")).alias("uid")))
    g = tpch_graph(spark, sf_dir)
    edges = g.edges_df.where(
        F.col("kind").isin("InRegion", "FromNation", "Placed"))
    return graph_algos.bfs_distances(edges, seed, max_depth=3,
                                     direction="both")


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part): for EUROPE suppliers
    of size-15 parts, the supplier(s) hitting each part's minimum unit
    price (fixture has no partsupp; unit price = extendedprice/quantity
    from lineitem).  Decorrelated argmin: per-part min as a broadcast
    aggregate joined back — the same two-pass shape the spec's
    correlated subquery decorrelates to."""
    t = load_tables(spark, sf_dir)
    eur_supp = (t["supplier"]
                .join(F.broadcast(
                    t["nation"].join(F.broadcast(t["region"].where(
                        F.col("r_name") == "EUROPE")),
                        F.col("n_regionkey") == F.col("r_regionkey"))),
                    F.col("s_nationkey") == F.col("n_nationkey")))
    offers = (t["lineitem"]
              .join(F.broadcast(t["part"].where(F.col("p_size") == 15)),
                    F.col("l_partkey") == F.col("p_partkey"))
              .join(F.broadcast(eur_supp),
                    F.col("l_suppkey") == F.col("s_suppkey"))
              .select("p_partkey", "s_suppkey", "s_name", "n_name",
                      (F.col("l_extendedprice").cast("decimal(18,6)")
                       / F.col("l_quantity").cast("decimal(18,6)"))
                      .alias("unit_price")))
    mins = (offers.groupBy(F.col("p_partkey").alias("pk"))
            .agg(F.min("unit_price").alias("min_price")))
    return (offers.join(F.broadcast(mins),
                        (F.col("p_partkey") == F.col("pk"))
                        & (F.col("unit_price") == F.col("min_price")))
            .select("p_partkey", "s_suppkey", "s_name", "n_name",
                    F.col("unit_price").cast("double").alias("unit_price")))


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (value concentration): parts whose shipped value
    exceeds 0.05% of total shipped value (partsupp-free: value =
    extendedprice sums from lineitem).  Group, then HAVING against a
    broadcast scalar — two aggregations over one shuffle of the fact."""
    t = load_tables(spark, sf_dir)
    val = (t["lineitem"].groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .alias("value")))
    total = val.agg((F.sum("value") * 0.0005).alias("threshold"))
    return (val.join(F.broadcast(total))
            .where(F.col("value") > F.col("threshold"))
            .select("l_partkey", F.col("value").cast("double")
                    .alias("value")))


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (supplier concentration by part attribute):
    distinct suppliers per (brand, type, size) for three sizes,
    excluding one brand — COUNT(DISTINCT) after a broadcast-pruned
    fact join (supplier link via lineitem, no partsupp)."""
    t = load_tables(spark, sf_dir)
    pp = t["part"].where((F.col("p_brand") != "Brand#13")
                         & F.col("p_size").isin(1, 7, 15))
    return (t["lineitem"]
            .join(F.broadcast(pp),
                  F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct(F.col("l_suppkey"))
                 .alias("supplier_cnt")))


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (excess-stock suppliers): suppliers in one nation
    who shipped more than 50 units of some widget part in 1996
    (partsupp-free restatement keeping the nested-aggregate → semi-join
    topology: inner grouped HAVING feeds a left-semi on the outer)."""
    t = load_tables(spark, sf_dir)
    widget = t["part"].where(F.col("p_name").contains("widget"))
    big = (t["lineitem"]
           .where((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1997-01-01"))
           .join(F.broadcast(widget),
                 F.col("l_partkey") == F.col("p_partkey"))
           .groupBy("l_suppkey", "l_partkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .alias("qty"))
           .where(F.col("qty") > 50)
           .select("l_suppkey"))
    nat = t["nation"].where(F.col("n_name") == "NATION_1")
    return (t["supplier"]
            .join(F.broadcast(nat),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(big, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_suppkey", "s_name"))


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (sole late shipper): suppliers with a late line
    (shipped >60 days after order date) in a finished multi-supplier
    order where NO other supplier shipped late — EXISTS + NOT EXISTS as
    semi/anti joins on the order key (commitdate-free restatement).
    The order-level supplier sets aggregate once; both existence probes
    ride the same grouped frame instead of two fact self-joins."""
    t = load_tables(spark, sf_dir)
    li = (t["lineitem"]
          .join(t["orders"].where(
              F.col("o_orderstatus") == "F"),
              F.col("l_orderkey") == F.col("o_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate") > F.col("o_orderdate")
                   + F.expr("INTERVAL 60 DAYS")).alias("late")))
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(F.when(F.col("late"),
                                              F.col("l_suppkey")))
                      .alias("n_late_supp")))
    sole = per_order.where((F.col("n_supp") > 1)
                           & (F.col("n_late_supp") == 1))
    return (li.where(F.col("late"))
            .join(sole, "l_orderkey", "left_semi")
            .select("l_suppkey").distinct()
            .join(F.broadcast(t["supplier"]),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name"))


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: training docs (doc_id % 20 != 0)
    sharing any 8-gram with the held-out eval slice (doc_id % 20 == 0),
    with hit counts.  The eval fingerprint set broadcasts — the
    training side never shuffles before its per-doc count."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return dedup.ngram_contamination(train, bench, n=8)


def q_decontaminate_spans(spark, sf_dir):
    """Span-level decontamination: the 8-gram eval overlaps found by
    q_contamination are cut out of the training docs (token-exact span
    union) instead of dropping whole documents.  Full oracle: the gram
    fingerprints, span union, and token filtering replay in SQL;
    clean_text is hash-compared."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return dedup.mask_contaminated_spans(train, bench, n=8)


def q_chunk_docs(spark, sf_dir):
    """Context-window packing: 64-token chunks with 16-token overlap.
    Compared by md5 of chunk text (portable, keeps the diff payload
    small); one narrow map stage, no shuffle."""
    out = text.chunk_documents(_docs(spark, sf_dir),
                               chunk_tokens=64, overlap=16)
    return out.select("doc_id", "chunk_id",
                      F.md5("chunk_text").alias("chunk_hash"), "n_tokens")


def q_pagerank_nations(spark, sf_dir):
    """PageRank with a full SQL oracle: the bidirectional Nation↔Region
    graph has no dangling nodes (every node has out-degree ≥ 1 by
    construction), so the dangling-mass term is identically zero and the
    power iteration is expressible as a recursive CTE.  Ranks rounded to
    6 dp on both sides — float-associativity drift is ~1e-12, far below
    the rounding grain, so the value hash is stable."""
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(F.col("kind").isin("Nation", "Region"))
    fwd = g.edges_df.where(F.col("kind") == "InRegion") \
        .select("startuid", "enduid")
    edges = fwd.unionByName(
        fwd.select(F.col("enduid").alias("startuid"),
                   F.col("startuid").alias("enduid")))
    pr = graph_algos.pagerank(nodes, edges, iters=5)
    return pr.select("uid", F.round("rank", 6).alias("rank"))


def q_pagerank_top10(spark, sf_dir):
    """PageRank over the Placed/Contains graph, top-10 nodes.  The
    DuckDB oracle replays the SAME 5 unrolled power iterations
    (dangling-mass scalar per round, damping 0.85, ranks init 1.0);
    ordering is on round(rank, 6) + uid so engine-order float-summation
    noise (~1e-13) cannot flip the comparison."""
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(F.col("kind").isin("Customer", "Order", "Part"))
    edges = g.edges_df.where(F.col("kind").isin("Placed", "Contains"))
    pr = graph_algos.pagerank(nodes, edges, iters=5)
    return (pr.orderBy(F.round("rank", 6).desc(), F.col("uid")).limit(10)
            .select("uid"))


def q_multimodal_features(spark, sf_dir):
    """Binary-column plumbing with a REAL header decoder: payloads are
    complete BMP/PNG/GIF containers synthesized from the documents
    fixture (dims a pure function of n_chars, format cycling by doc_id,
    GIF frame counts 1-4), and extract_features reads format, width,
    height and frame count back out of the actual bytes
    (struct-unpacked IHDR / logical screen descriptor /
    BITMAPINFOHEADER; GIF block walk).  The oracle predicts the same
    values from the construction arithmetic — a wrong parse fails the
    hash."""
    from .operators.multimodal import documents_as_media, extract_features
    media = documents_as_media(_docs(spark, sf_dir))
    return extract_features(media).select(
        "media_id", "fmt", "width", "height", "n_frames")


def q_multimodal_resize(spark, sf_dir):
    """Binary→binary resize stage: scaled dimensions computed from the
    REAL container headers; uncompressed 24-bit BMPs get a REAL
    nearest-neighbor pixel resample (multimodal.resize_bmp), compressed
    formats a byte-proportional stand-in (no codec libs here).  Scale
    math is pure IEEE-double (min(1, 32/max(w,h)), floor) so the SQL
    oracle reproduces the dims bit-exactly from the construction
    arithmetic."""
    from .operators.multimodal import documents_as_media, resize
    media = documents_as_media(_docs(spark, sf_dir))
    return resize(media, max_side=32).select("media_id", "width", "height")


def q_gif_frames(spark, sf_dir):
    """Real GIF frame demux over the media fixture: every 2nd frame of
    each multi-frame GIF becomes a standalone single-frame file.  The
    oracle replays the sampling plan (which media, which frame indices)
    and the emitted byte size (35 = 19-byte header + 15-byte frame
    segment + trailer by construction); byte-level correctness of the
    demux is pinned by the re-decode unit test."""
    from .operators.multimodal import documents_as_media, extract_frames
    media = documents_as_media(_docs(spark, sf_dir))
    return (extract_frames(media, every_n=2)
            .select("media_id", "frame_idx",
                    F.length("frame_payload").cast("long")
                    .alias("frame_bytes")))


def q_audio_features(spark, sf_dir):
    """REAL audio path: synthesized RIFF/WAVE payloads decoded back by
    chunk-walking, energy and zero-crossing statistics computed from
    the actual PCM bytes as exact integers (no float accumulation).
    The oracle recomputes both from the construction formula — a
    mismatch would mean the decoder misread the container."""
    from .operators.multimodal import audio_features, documents_as_audio
    media = documents_as_audio(_docs(spark, sf_dir))
    return audio_features(media)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs, portable md5-hash variant (60-bit
    signature, 4×15-bit LSH bands).  Oracle-checkable end to end: with
    hamming ≤ 3 < bands, pigeonhole guarantees every qualifying pair
    shares a band, so the banded result equals brute-force hamming —
    which is what the DuckDB twin computes."""
    return dedup.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3,
                                    nbits=60, portable=True)


def q_winnow_pairs(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing, Schleimer et al.
    SIGMOD'03): near-dup candidate pairs sharing ≥ 2 selected k-gram
    fingerprints.  The DuckDB twin replays the full algorithm — token
    5-grams, 60-bit md5 hashes, min-of-each-4-window selection — so the
    fingerprint sets match bit-for-bit."""
    return dedup.winnow_pairs(_docs(spark, sf_dir), k=5, window=4,
                              min_shared=2)


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN probe for vec_id=0, full SQL oracle: the seeded
    hyperplanes are deterministic (random.Random(42).gauss), so the
    oracle inlines the same 6×64 plane literals and replays bucket
    assignment (sign bits), hamming≤1 probe-set selection, and the
    double-precision cosine re-rank.  Both sides fold dots in double, so
    6 dp rounding is far above any accumulation-order drift."""
    emb = _emb(spark, sf_dir)
    qv = list(emb.where(F.col("vec_id") == 0)
              .select("embedding").collect()[0][0])
    indexed, planes = similarity.ann_index(emb, dim=len(qv), bits=6)
    top = similarity.ann_topk(indexed, planes, qv, k=5)
    return (top.where(F.col("vec_id") != 0)
            .select("vec_id", F.round("cosine", 6).alias("cosine")))


def _ann_oracle_sql() -> str:
    """DuckDB twin of q_ann_lsh_topk with the seed-42 planes inlined."""
    planes = similarity._random_hyperplanes(dim=64, bits=6, seed=42)
    lits = ["[" + ", ".join(repr(v) for v in p) + "]::DOUBLE[]"
            for p in planes]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product({{v}}, {lit}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits))
    return f"""
        WITH q AS (
          SELECT embedding::DOUBLE[] AS qv FROM embeddings
          WHERE vec_id = 0
        ), base AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 {bucket.format(v='embedding::DOUBLE[]')} AS bucket
          FROM embeddings
        ), qb AS (
          SELECT {bucket.format(v='qv')} AS qbucket FROM q
        ), top AS (
          SELECT b.vec_id,
                 list_dot_product(b.v, q.qv)
                   / (sqrt(list_dot_product(b.v, b.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS cos
          FROM base b, q, qb
          WHERE bit_count(xor(b.bucket::BIGINT, qb.qbucket::BIGINT)) <= 1
          ORDER BY cos DESC, b.vec_id ASC LIMIT 5
        )
        SELECT vec_id, ROUND(cos, 6) AS cosine FROM top
        WHERE vec_id <> 0
    """


def q_lsh_near_dup(spark, sf_dir):
    """Embedding near-dup pairs via multi-table LSH (the scale path the
    O(n²) embedding_near_dup baseline documents).  The fixture has no
    natural near-dups (max pairwise cosine ≈ 0.48), so every 50th vector
    gets a deterministic perturbed twin (+0.1 on dim 0 → cosine ≈ 0.995)
    planted in-query; the oracle replays the perturbation, all four
    seeded hash tables, the candidate join, and the cosine verify."""
    emb = _emb(spark, sf_dir)
    as_double = F.transform(F.col("embedding"),
                            lambda x: x.cast("double"))
    base = emb.select("vec_id", as_double.alias("embedding"))
    pert = (base.where(F.col("vec_id") % 50 == 0)
            .select((F.col("vec_id") + 100000).alias("vec_id"),
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: F.when(i == 0, x + F.lit(0.1))
                                      .otherwise(x)).alias("embedding")))
    corpus = base.unionByName(pert)
    return similarity.lsh_near_dup_pairs(corpus, dim=64, bits=6,
                                         tables=4, min_cosine=0.95)


def _lsh_near_dup_oracle_sql(dim: int = 64, bits: int = 6,
                             tables: int = 4, seed: int = 42,
                             thresh: float = 0.95) -> str:
    """DuckDB twin of q_lsh_near_dup with all four seeded plane sets
    inlined.  Bucket ids use LSB-first bit packing (vs the engine's
    MSB-first fold) — equality collisions are invariant under any
    consistent bit permutation, so the candidate sets are identical.
    The engine's max_bucket=10k cap is not replayed: fixture buckets
    hold ≤ hundreds of vectors, so the cap provably never fires."""
    def bucket(v: str, ps) -> str:
        lits = ["[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
                for p in ps]
        return " + ".join(
            f"(CASE WHEN list_dot_product({v}, {lit}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, lit in enumerate(lits))

    plane_sets = [similarity._random_hyperplanes(dim, bits, seed + t)
                  for t in range(tables)]
    tag = "\n          UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket('v', ps)} AS b FROM corpus"
        for t, ps in enumerate(plane_sets))
    return f"""
        WITH base AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), pert AS (
          SELECT vec_id + 100000 AS vec_id,
                 list_transform(range(1, len(v)+1),
                   i -> CASE WHEN i = 1 THEN v[i] + 0.1 ELSE v[i] END) AS v
          FROM base WHERE vec_id % 50 = 0
        ), corpus AS (
          SELECT * FROM base UNION ALL SELECT * FROM pert
        ), tagged AS (
          {tag}
        ), cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM tagged a JOIN tagged b
            ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM (
          SELECT c.id_a, c.id_b,
                 list_dot_product(x.v, y.v)
                   / (sqrt(list_dot_product(x.v, x.v))
                      * sqrt(list_dot_product(y.v, y.v))) AS cos
          FROM cand c
          JOIN corpus x ON x.vec_id = c.id_a
          JOIN corpus y ON y.vec_id = c.id_b)
        WHERE cos >= {thresh}
    """


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join (the plan
    Catalyst picks for EXISTS; the probe side never duplicates rows)."""
    t = load_tables(spark, sf_dir)
    o, l = t["orders"], t["lineitem"]
    hit = o.join(
        l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi")
    return hit.groupBy("o_orderpriority") \
              .agg(F.count("*").alias("n_orders"))


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5: 6-table join, revenue by nation for one region where the
    supplier and customer share the nation.

    Scale shape: the ASIA-region filter is pushed THROUGH the supplier
    dimension onto the fact table first — lineitem joins the broadcast
    (supplier ⋈ asia-nations) sliver before it ever meets another fact,
    dropping ~4/5 of lineitem ahead of the fact-fact joins.  The orders
    and customer joins carry no hints: the planner sizes them from its
    own evidence (by-estimate broadcast at bench scale, shuffle join
    once the estimate crosses the threshold at cluster scale — the
    self-limiting path, unlike a forced hint).  Only true dimension
    slivers (region, nation, supplier) are broadcast-hinted."""
    t = load_tables(spark, sf_dir)
    dp = (F.col("l_extendedprice").cast("decimal(18,2)")
          * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    asia_nations = (t["nation"]
                    .join(F.broadcast(t["region"].where(
                        F.col("r_name") == "ASIA")),
                        F.col("n_regionkey") == F.col("r_regionkey"))
                    .select("n_nationkey", "n_name"))
    sup_asia = (t["supplier"]
                .join(F.broadcast(asia_nations),
                      F.col("s_nationkey") == F.col("n_nationkey"))
                .select("s_suppkey", "s_nationkey", "n_name"))
    la = (t["lineitem"]
          .join(F.broadcast(sup_asia),
                F.col("l_suppkey") == F.col("s_suppkey"))
          .select("l_orderkey", "s_nationkey", "n_name", dp.alias("dp")))
    return (la
            .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t["customer"], (F.col("o_custkey") == F.col("c_custkey"))
                  & (F.col("s_nationkey") == F.col("c_nationkey")))
            .groupBy("n_name")
            .agg(F.sum("dp").cast("double").alias("revenue")))


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — conditional aggregation over
    a fact-dimension join, one scalar out."""
    t = load_tables(spark, sf_dir)
    dp = (F.col("l_extendedprice").cast("decimal(18,2)")
          * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    j = (t["lineitem"]
         .where((F.col("l_shipdate") >= "1996-01-01")
                & (F.col("l_shipdate") < "1997-01-01"))
         .join(F.broadcast(t["part"]),
               F.col("l_partkey") == F.col("p_partkey")))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", dp)
              .otherwise(F.lit(0).cast("decimal(18,2)")))
         .alias("promo"),
        F.sum(dp).alias("total"))
    return agg.select(
        (F.col("promo").cast("double") * 100.0
         / F.col("total").cast("double")).alias("promo_pct"))


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — HAVING on a grouped fact,
    then a semi-join back to orders/customer.  The heavy group-by happens
    before any join, so only qualifying keys reach the join."""
    t = load_tables(spark, sf_dir)
    big = (t["lineitem"].groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .alias("sum_qty"))
           .where(F.col("sum_qty") > 150))
    return (t["orders"]
            .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(t["customer"],
                  F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "o_orderkey",
                    F.col("sum_qty").cast("double").alias("sum_qty")))


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape: volume shipped between two specific nations
    (supplier nation → customer nation), grouped by year.  Both nation
    filters prune before the fact join; dims broadcast."""
    t = load_tables(spark, sf_dir)
    dp = (F.col("l_extendedprice").cast("decimal(18,2)")
          * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    n1 = t["nation"].where(F.col("n_name") == "NATION_1") \
        .select(F.col("n_nationkey").alias("supp_nk"))
    n2 = t["nation"].where(F.col("n_name") == "NATION_2") \
        .select(F.col("n_nationkey").alias("cust_nk"))
    return (t["lineitem"]
            .join(F.broadcast(t["supplier"].join(
                F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nk"))),
                F.col("l_suppkey") == F.col("s_suppkey"))
            .join(t["orders"],
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(t["customer"].join(
                F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nk")),
                F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(dp).cast("double").alias("revenue")))


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    (l_returnflag = 'R'), with nation — group-heavy join + ordered
    limit with key tiebreak."""
    t = load_tables(spark, sf_dir)
    dp = (F.col("l_extendedprice").cast("decimal(18,2)")
          * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    g = (t["lineitem"].where(F.col("l_returnflag") == "R")
         .join(t["orders"],
               F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("o_custkey").agg(F.sum(dp).alias("rev")))
    return (g.join(t["customer"],
                   F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(t["nation"]),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select(F.col("c_custkey"), F.col("c_name"), F.col("n_name"),
                    F.col("rev").cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))


def q_above_nation_avg(spark, sf_dir):
    """Correlated-subquery shape (customers above their nation's mean
    acctbal), decorrelated to a grouped join.  The comparison multiplies
    through by the count — decimal-exact, no float-division drift."""
    t = load_tables(spark, sf_dir)
    stats = (t["customer"].groupBy(F.col("c_nationkey").alias("nk"))
             .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                  .alias("bal_sum"),
                  F.count("*").alias("cnt")))
    return (t["customer"]
            .join(F.broadcast(stats), F.col("c_nationkey") == F.col("nk"))
            .where(F.col("c_acctbal").cast("decimal(18,2)")
                   * F.col("cnt") > F.col("bal_sum"))
            .select("c_custkey"))


def q_running_total(spark, sf_dir):
    """Cumulative window frame: per-customer running order total in
    order-date order (ROWS UNBOUNDED PRECEDING, orderkey tiebreak,
    decimal accumulation so partial-sum order cannot drift)."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window as W
    w = (W.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (t["orders"]
            .where(F.col("o_custkey") < 100)
            .select("o_custkey", "o_orderkey",
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .over(w).cast("double").alias("running_total")))


def q_ntile_quartiles(spark, sf_dir):
    """NTILE window: suppliers bucketed into acctbal quartiles
    (suppkey tiebreak keeps the bucketing deterministic)."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window as W
    w = W.orderBy(F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return t["supplier"].select(
        "s_suppkey", F.ntile(4).over(w).alias("quartile"))


def q_event_funnel(spark, sf_dir):
    """Funnel conversion: users whose first 'view' precedes their last
    'purchase'.  One conditional aggregation per user — no self-join,
    no window; shuffles exactly once on user_id."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
         .alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
         .alias("last_purchase"))
    return per_user.agg(
        F.count(F.col("first_view")).alias("n_viewers"),
        F.sum(F.when(F.col("first_view") < F.col("last_purchase"), 1)
              .otherwise(0)).cast("long").alias("n_converted"))


def q_event_props_json(spark, sf_dir):
    """P4 over a RAW table (not the graph encoding): JSON-path extraction
    from the events.props varchar column, aggregated per event type."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.count(k).alias("k_cnt"))


def _dp():
    """Discounted-price term, decimal-exact (order-independent sums)."""
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_3's share of STANDARD
    part revenue sold to AMERICA-region customers, per year.  Every
    dimension broadcasts; the conditional numerator folds into the same
    group-by as the denominator (one pass, no self-join)."""
    t = load_tables(spark, sf_dir)
    am_nations = (t["nation"]
                  .join(F.broadcast(t["region"].where(
                      F.col("r_name") == "AMERICA")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                  .select(F.col("n_nationkey").alias("cust_nk")))
    supp_n = (t["supplier"]
              .join(F.broadcast(t["nation"].select(
                  F.col("n_nationkey").alias("snk"),
                  F.col("n_name").alias("supp_nation"))),
                  F.col("s_nationkey") == F.col("snk")))
    j = (t["lineitem"]
         .join(F.broadcast(t["part"].where(F.col("p_type") == "STANDARD")),
               F.col("l_partkey") == F.col("p_partkey"))
         .join(t["orders"].where(
             (F.col("o_orderdate") >= "1995-01-01")
             & (F.col("o_orderdate") < "1997-01-01")),
             F.col("l_orderkey") == F.col("o_orderkey"))
         .join(t["customer"],
               F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(am_nations),
               F.col("c_nationkey") == F.col("cust_nk"))
         .join(F.broadcast(supp_n),
               F.col("l_suppkey") == F.col("s_suppkey")))
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(F.when(F.col("supp_nation") == "NATION_3", _dp())
                       .otherwise(F.lit(0).cast("decimal(18,2)")))
                 .cast("double").alias("nation_rev"),
                 F.sum(_dp()).cast("double").alias("total_rev")))


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): revenue by supplier nation ×
    order year for parts whose name contains 'widget' (fixture has no
    partsupp, so profit = discounted revenue; the join/agg topology — part
    filter pruning the fact, two broadcast dims, two-level group — is
    Q9's).  Ref: graphydb.py:952-1016 fetch compiles multi-table joins
    the same declarative way."""
    t = load_tables(spark, sf_dir)
    supp_n = (t["supplier"]
              .join(F.broadcast(t["nation"].select(
                  F.col("n_nationkey").alias("snk"),
                  F.col("n_name").alias("nation"))),
                  F.col("s_nationkey") == F.col("snk")))
    return (t["lineitem"]
            .join(F.broadcast(t["part"].where(
                F.col("p_name").contains("widget"))),
                F.col("l_partkey") == F.col("p_partkey"))
            .join(t["orders"],
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(supp_n),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.col("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(_dp()).cast("double").alias("sum_profit")))


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (late shipments by priority): lines shipped >30
    days after order date in 1996, split urgent/non-urgent per
    linestatus.  The date filter reaches the lineitem scan; orders
    broadcasts."""
    t = load_tables(spark, sf_dir)
    late = (t["lineitem"]
            .where((F.col("l_shipdate") >= "1996-01-01")
                   & (F.col("l_shipdate") < "1997-01-01"))
            .join(t["orders"],
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (late.groupBy("l_linestatus")
            .agg(F.sum(F.when(urgent, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(urgent, 0).otherwise(1)).cast("long")
                 .alias("low_line_count")))


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT join so
    zero-order customers survive, two-level aggregation.  First group-by
    keys on the FK (pre-aggregates map-side); the histogram group-by is
    tiny."""
    t = load_tables(spark, sf_dir)
    per_cust = (t["customer"]
                .join(t["orders"],
                      F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, return
    the max-revenue supplier(s) via a broadcast join against the 1-row
    max — no rank/window over the whole aggregate."""
    t = load_tables(spark, sf_dir)
    rev = (t["lineitem"]
           .where((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(_dp()).alias("total_rev")))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (rev.join(F.broadcast(top),
                     F.col("total_rev") == F.col("max_rev"))
            .join(F.broadcast(t["supplier"]),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_rev")))


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity revenue): revenue from lines under
    20% of their part's mean quantity, for one brand.  The per-part mean
    is a broadcast aggregate of the same filtered join — decorrelated,
    two passes over a brand-pruned sliver instead of a correlated
    subquery per row."""
    t = load_tables(spark, sf_dir)
    brand_lines = (t["lineitem"]
                   .join(F.broadcast(t["part"].where(
                       F.col("p_brand") == "Brand#13")),
                       F.col("l_partkey") == F.col("p_partkey")))
    avg_q = (brand_lines.groupBy(F.col("l_partkey").alias("pk"))
             .agg(F.avg("l_quantity").alias("avg_qty")))
    return (brand_lines
            .join(F.broadcast(avg_q), F.col("l_partkey") == F.col("pk"))
            .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double") / F.lit(7.0)).alias("avg_yearly")))


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive predicate pushdown): three OR'd
    brand/size/quantity bands over a part-lineitem join.  Catalyst pushes
    the common conjuncts and the per-branch part predicates into the
    scans; the OR evaluates post-join."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(F.broadcast(t["part"]),
                           F.col("l_partkey") == F.col("p_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 15)
           & F.col("l_quantity").between(20, 30)))
    return j.where(band).agg(
        F.sum(_dp()).cast("double").alias("revenue"))


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): rich-but-inactive
    customers per nation — scalar subquery for the positive-balance mean,
    anti join against recent orders, small group-by.  The anti join's
    build side is date-filtered and projected to the key column before
    the shuffle.  ('Inactive' = no order since 2000; the fixture gives
    every customer at least one lifetime order, so the pure NOT-EXISTS
    of spec-Q22 would be the empty set.)"""
    t = load_tables(spark, sf_dir)
    avg_bal = (t["customer"].where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    rich = (t["customer"]
            .join(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("avg_bal")))
    recent = (t["orders"]
              .where(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    inactive = rich.join(recent,
                         F.col("c_custkey") == F.col("o_custkey"),
                         "left_anti")
    return (inactive.groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("totacctbal")))


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language sampling of the corpus (hash-gated
    rates: en 0.8, de 0.5, fr/es 0.25, default 0.1) — the reproducible
    alternative to TABLESAMPLE a training pipeline needs for stable
    splits.  Narrow filter, no shuffle."""
    from .operators.pipeline import stratified_sample
    docs = _docs(spark, sf_dir)
    out = stratified_sample(
        docs, "lang",
        {"en": 0.8, "de": 0.5, "fr": 0.25, "es": 0.25},
        key_col="doc_id", default_rate=0.1)
    return out.select("doc_id", "lang")


def q_mixture_sample(spark, sf_dir):
    """Training-mix construction: down-sample sources to target weights
    (src0:0.5 src1:0.3 src2:0.2), keeping the bottleneck source whole.
    One tiny count aggregate broadcast back; the corpus itself never
    shuffles."""
    from .operators.pipeline import mixture_sample
    docs = _docs(spark, sf_dir)
    out = mixture_sample(docs, "source",
                         {"src0": 0.5, "src1": 0.3, "src2": 0.2},
                         key_col="doc_id")
    return out.select("doc_id", "source")


def q_pack_shards(spark, sf_dir):
    """Token-budget shard packing: lay documents out per language in
    doc_id order, close a shard every 2000 cumulative chars; returns
    per-shard stats.  One per-language sort + window cumsum."""
    from .operators.pipeline import pack_shards
    docs = _docs(spark, sf_dir)
    packed = pack_shards(docs, "doc_id", "n_chars", budget=2000,
                         partition_col="lang")
    return (packed.groupBy("lang", "shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("shard_chars")))


def q_pii_redact(spark, sf_dir):
    """PII masking (emails / phone numbers / IPv4) as chained JVM-side
    regexp_replace.  Synthetic PII derived from doc_id is appended first
    so every row actually exercises all three patterns; the DuckDB twin
    builds and redacts the identical string."""
    from .operators.pipeline import pii_redact
    docs = _docs(spark, sf_dir)
    seeded = docs.withColumn(
        "text",
        F.concat(F.col("text"),
                 F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com or 555-123-4567 at 10.0."),
                 (F.col("doc_id") % 256).cast("string"), F.lit(".7")))
    return pii_redact(seeded).select("doc_id", "redacted")


def q_quality_filter(spark, sf_dir):
    """Gopher-style rule gate with per-rule attrition flags (token band,
    mean token length band, symbol ratio, stopword hits) — one codegen
    pass over the text column."""
    from .operators.pipeline import quality_filter
    docs = _docs(spark, sf_dir)
    return quality_filter(docs).select(
        "doc_id", "ok_tokens", "ok_avg_len", "ok_symbols",
        "ok_stopwords", "keep")


def q_sssp_cost(spark, sf_dir):
    """Weighted single-source shortest paths (Bellman-Ford over
    DataFrames, ≤3 hops from Region:ASIA's node) on the bidirected
    Region–Nation–Customer graph with deterministic synthetic edge
    weights.  Iteration k holds the exact ≤k-hop minimum, which the
    hop-bounded recursive-CTE oracle replays."""
    from .operators.graph_algos import sssp
    t = load_tables(spark, sf_dir)

    def _e(df, ak, acol, bk, bcol, w):
        fwd = df.select(
            F.concat(F.lit(ak + ":"), F.col(acol).cast("string"))
             .alias("src"),
            F.concat(F.lit(bk + ":"), F.col(bcol).cast("string"))
             .alias("dst"),
            w.cast("long").alias("w"))
        rev = df.select(
            F.concat(F.lit(bk + ":"), F.col(bcol).cast("string"))
             .alias("src"),
            F.concat(F.lit(ak + ":"), F.col(acol).cast("string"))
             .alias("dst"),
            w.cast("long").alias("w"))
        return fwd.unionByName(rev)

    edges = _e(t["nation"], "Nation", "n_nationkey", "Region", "n_regionkey",
               F.col("n_nationkey") % 5 + 1) \
        .unionByName(_e(t["customer"], "Customer", "c_custkey",
                        "Nation", "c_nationkey",
                        F.col("c_custkey") % 7 + 1))
    seeds = (t["region"].where(F.col("r_name") == "ASIA")
             .select(F.concat(F.lit("Region:"),
                              F.col("r_regionkey").cast("string"))
                     .alias("uid")))
    return sssp(edges, seeds, max_hops=3).select("uid", "dist")


# Session-lifetime co-bucketed layout for the recurring interval join —
# the standing-pipeline shape (like _retrieval_indexes): the µs
# conversion + bucket explode + (key, bucket) clustering are paid once
# per session, every probe joins bucket files pairwise with zero
# Exchange.  Memoized per (session, sf_dir); bench warm-ups absorb the
# build and the timed runs measure the steady-state probe.
_IJB_CACHE: dict = {}


def _interval_layout(spark, sf_dir):
    key = (id(spark), sf_dir)
    got = _IJB_CACHE.get(key)
    # the cached value is a pair of CATALOG table names, which die with
    # the session that registered them — unlike the path-valued caches
    # (_RIDX/_IVFPQ, whose snapshot files outlive any session).  If
    # CPython recycles id(spark) for a NEW session, or the tables were
    # dropped, the stale names must not be returned (ADVICE r6):
    # verify both exist in THIS session's catalog before trusting.
    if got and all(spark.catalog.tableExists(t) for t in got):
        return got
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile
    from .streaming.windows import interval_join_layout
    # the table NAME carries the session id too: sessions sharing one
    # SparkContext share one catalog, so a (pid, sf)-only name would
    # let a second session's rebuild DROP the tables out from under
    # the first session's already-built DataFrames
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    sid = f"{os.getpid()}_{id(spark):x}_{tag}"
    lt, rt = f"gdb_ij_{sid}_l", f"gdb_ij_{sid}_r"
    ev = _events(spark, sf_dir)
    prefix = os.path.join(tempfile.gettempdir(),
                          f"graphydb_spark_ij_{sid}")
    interval_join_layout(
        spark, ev, ev, lt, rt, key_col="user_id", ts_col="ts",
        lower_s=1, upper_s=120, path_prefix=prefix)
    atexit.register(shutil.rmtree, prefix, ignore_errors=True)
    _IJB_CACHE[key] = (lt, rt)
    return lt, rt


def q_interval_join_events(spark, sf_dir):
    """Event-pair interval join (batch twin of the watermarked
    stream-stream join): same-user event pairs where the right event
    follows the left by 1-120 s, SERVED from the session's co-bucketed
    layout (interval_join_layout — both sides pre-bucketed and sorted
    by (user, band-bucket), built once per session like the retrieval
    indexes): the probe is a bucket-pairwise equi-join with ZERO
    Exchange and a long-comparison band residual.  Result-identical to
    the per-run interval_join plan (same decomposition, layout moved
    to write time); the DuckDB anchor gets the same standing treatment
    in scripts/duck_bench.py --standing-index.  Measured ×1/×10/×100
    pairs in scripts/interval_bucketed_pair.py."""
    from .streaming.windows import interval_join_bucketed
    lt, rt = _interval_layout(spark, sf_dir)
    return interval_join_bucketed(spark, lt, rt, key_col="user_id",
                                  lower_s=1, upper_s=120)


def q_corpus_pipeline(spark, sf_dir):
    """End-to-end corpus construction in ONE lazy DAG: quality gate →
    exact dedup (min doc_id per content fingerprint) → 50% hash-gated
    sample → token-budget shard packing → per-shard stats.  Each stage
    is the already-verified operator; composing them adds no extra
    shuffles beyond the stages' own (the whole pipeline is 2 shuffles:
    the dedup window and the packing sort — filters and fingerprints
    ride the same scan).  The DuckDB twin replays all four stages as a
    CTE chain."""
    from .operators.pipeline import pack_shards, quality_filter
    from .operators.text import fingerprint
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    clean = quality_filter(docs).where(F.col("keep")) \
        .select("doc_id", "lang", "text", "n_chars")
    w = W.partitionBy("fp").orderBy("doc_id")
    deduped = (fingerprint(clean)
               .withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1).drop("_rn", "fp"))
    sampled = deduped.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "8000")
    packed = pack_shards(sampled, "doc_id", "n_chars", budget=4000,
                         partition_col="lang")
    return (packed.groupBy("lang", "shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("shard_chars")))


def q_optional_match(spark, sf_dir):
    """Beyond-reference OPTIONAL MATCH: orders per customer INCLUDING
    zero-order customers — ``-(pl?:Placed)>`` compiles to a LEFT JOIN
    suffix (kind predicate inside ON), which the reference's inner-only
    chain DSL cannot express (its group_count twin silently drops
    customers with no orders)."""
    g = tpch_graph(spark, sf_dir)
    return g.fetch(
        "[c:Customer,ordercount] -(pl?:Placed)> (o)",
        GROUP="c.uid", ordercount="COUNT(pl.uid)",
        as_df=True).select("uid", "ordercount")


#: pair expansion is n(n-1)/2 per basket — one pathological 10k-item
#: basket would emit 5e7 pairs from a single key.  TPC-H baskets hold
#: ≤7 items so the cap never binds at test scale; the oracle SQL
#: replays the same HAVING guard so semantics agree by construction.
MAX_BASKET = 256


def q_basket_lift(spark, sf_dir):
    """Market-basket association metrics for the 20 most co-purchased
    part pairs: support count, confidence and lift from exact integer
    counts (ratios round to 6 dp).  Pair counts ride the order-keyed
    self-join; per-part support broadcasts back.  Baskets larger than
    MAX_BASKET are excluded from pair expansion (quadratic-blowup
    guard, see relational.cap_group_size); support counts and the
    order total stay global."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct())
    n_orders = li.select("o").distinct().count()
    li_cap = relational.cap_group_size(li, "o", MAX_BASKET)
    a, b = li_cap.alias("a"), li_cap.alias("b")
    pairs = (a.join(b, (F.col("a.o") == F.col("b.o"))
                    & (F.col("a.p") < F.col("b.p")))
             .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
             .agg(F.count("*").alias("n_ab")))
    supp = li.groupBy("p").agg(F.count("*").alias("n"))
    sa = supp.select(F.col("p").alias("pa"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("p").alias("pb"), F.col("n").alias("n_b"))
    return (pairs.join(F.broadcast(sa), "pa").join(F.broadcast(sb), "pb")
            .select("pa", "pb", "n_ab",
                    F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6)
                    .alias("confidence"),
                    F.round(F.col("n_ab").cast("double") * n_orders
                            / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("lift"))
            .orderBy(F.col("n_ab").desc(), "pa", "pb").limit(20))


def q_cumulative_users(spark, sf_dir):
    """Daily new + cumulative distinct users.  The scale-correct
    rewrite: a running COUNT(DISTINCT) recounts every prefix
    (quadratic); first-seen-date per user + a cumulative sum of daily
    news is two aggregations and one tiny ordered window."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window as W
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.col("ts").cast("date")).alias("d")))
    daily = firsts.groupBy("d").agg(F.count("*").alias("new_users"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (daily.withColumn("cum_users",
                             F.sum("new_users").over(w).cast("long"))
            .select(F.col("d").cast("string").alias("d"),
                    F.col("new_users").cast("long").alias("new_users"),
                    "cum_users"))


def q_assortativity(spark, sf_dir):
    """Degree assortativity (Newman's r) of the Order-Part bipartite
    graph: Pearson correlation of endpoint degrees over edge stubs.
    Every term (N, Σx, Σxy, Σx²) is an exact integer sum — the single
    final division happens in doubles and rounds to 6 dp, so the SQL
    twin reproduces r bit-exactly.  Two degree aggregations + one
    broadcast-joined pass over the edge list."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct())
    do = li.groupBy("o").agg(F.count("*").alias("do"))
    dp = li.groupBy("p").agg(F.count("*").alias("dp"))
    j = (li.join(F.broadcast(do), "o").join(F.broadcast(dp), "p"))
    s = j.agg(
        (F.count("*") * 2).cast("long").alias("n"),
        F.sum(F.col("do") + F.col("dp")).cast("long").alias("sx"),
        (F.sum(F.col("do") * F.col("dp")) * 2).cast("long").alias("sxy"),
        F.sum(F.col("do") * F.col("do")
              + F.col("dp") * F.col("dp")).cast("long").alias("sxx"))
    return s.select(
        "n",
        F.round((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx"))
                .cast("double")
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6).alias("assortativity"))


def q_transitivity(spark, sf_dir):
    """Global clustering coefficient of the part co-purchase graph:
    3·triangles / wedges from exact integer counts (rounded 6 dp), so
    the SQL twin reproduces the ratio bit-exactly."""
    from .operators.graph_algos import transitivity
    n_part = spark.sparkContext.defaultParallelism * 2
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey")
          .repartition(n_part, "l_orderkey"))
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").alias("pa"),
                  F.col("b.l_partkey").alias("pb")))
    return transitivity(co, "pa", "pb")


def q_k_core(spark, sf_dir):
    """k-core of the Order–Part bipartite graph (k=6): orders with ≥6
    distinct parts that themselves appear in ≥6 surviving orders, to
    fixpoint.  The DuckDB oracle unrolls the peel (idempotent after
    the fixpoint, so over-unrolling is exact); semantics additionally
    pinned by the planted clique-plus-tail unit test."""
    from .operators.graph_algos import k_core
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(F.col("kind").isin("Order", "Part"))
    edges = g.edges_df.where(F.col("kind") == "Contains")
    return k_core(nodes, edges, k=6)


def q_global_shuffle(spark, sf_dir):
    """Deterministic corpus-order randomization: shuffle_rank under
    seeded-hash ordering — terasort-shaped global sort, reproducible on
    any engine/partitioning.  Returns the first 100 positions."""
    from .operators.pipeline import global_shuffle
    docs = _docs(spark, sf_dir)
    return (global_shuffle(docs, "doc_id", seed="42")
            .where(F.col("shuffle_rank") <= 100)
            .select("doc_id", "shuffle_rank"))


def q_train_val_test(spark, sf_dir):
    """Hash-banded holdout split (5% val / 5% test): per-split counts.
    The band edges are hex literals both engines compare as strings."""
    from .operators.pipeline import train_val_test_split
    docs = _docs(spark, sf_dir)
    return (train_val_test_split(docs, "doc_id")
            .groupBy("split").agg(F.count("*").alias("n")))


def q_line_dedup(spark, sf_dir):
    """C4-style line-level dedup over the corpus: documents are first
    line-ified deterministically (8-token lines — the fixture text is
    single-line), then every ≥16-char line that repeats anywhere in the
    corpus survives only at its first (doc_id, line_no) occurrence and
    documents are reassembled from the survivors.  The oracle replays
    the line-ification and the winner election verbatim; clean_text is
    hash-compared, so the gate covers reassembly order too."""
    from .operators.pipeline import line_dedup
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    nlines = F.greatest(
        F.ceil(F.size(toks) / F.lit(8)).cast("int"), F.lit(1))
    lines = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "))
    reshaped = docs.select(
        "doc_id", F.array_join(lines, "\n").alias("text"))
    return line_dedup(reshaped)


def q_ppl_bucket_sample(spark, sf_dir):
    """Quality-bucketed sampling: unigram-LM score quartiles split the
    corpus into head/mid/tail bands kept at 1.0/0.5/0.1 — the CCNet
    perplexity-bucket policy on the engine's own LM scores.  Full
    oracle: the unigram CTE reproduces the (6-dp, order-free) scores,
    quantile_cont the cutpoints, and the md5 gate the kept set."""
    from .operators.pipeline import quantile_sample, unigram_logprob
    docs = _docs(spark, sf_dir)
    scored = unigram_logprob(docs)
    return (quantile_sample(scored, "logprob", "doc_id")
            .select("doc_id", "bucket"))


def q_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-activity week,
    counted per week-offset of subsequent activity — two aggregations
    (first-touch per user broadcasts back over the distinct activity
    weeks).  Week arithmetic stays in whole days / 7 (date_trunc aligns
    Mondays in both engines) so the offsets are integer-exact."""
    ev = _events(spark, sf_dir)
    firsts = (ev.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort")))
    activity = (ev.select("user_id",
                          F.date_trunc("week", F.col("ts")).alias("wk"))
                .distinct())
    return (activity.join(F.broadcast(firsts), "user_id")
            .select(F.col("cohort").cast("date").cast("string")
                    .alias("cohort"),
                    (F.datediff(F.col("wk"), F.col("cohort")) / 7)
                    .cast("int").alias("week_offset"))
            .groupBy("cohort", "week_offset")
            .agg(F.count("*").cast("long").alias("n_users")))


def q_unigram_logprob(spark, sf_dir):
    """LM-perplexity stand-in (CCNet-style quality signal): per-doc mean
    log10 unigram probability, self-trained with add-one smoothing.
    Vocabulary broadcasts back over the token stream; per-token logprobs
    round to 6 dp and sum as DECIMAL so the mean is order-independent —
    replayable exactly by the SQL twin."""
    from .operators.pipeline import unigram_logprob
    return unigram_logprob(_docs(spark, sf_dir)) \
        .select("doc_id", "logprob", "n_tokens")


def q_label_propagation(spark, sf_dir):
    """Community detection by deterministic synchronous label
    propagation (majority label, ties to smallest) on the
    Customer-Nation-Region graph; returns community sizes.  The
    DuckDB oracle replays the same 4 synchronous rounds as unrolled
    CTEs (integer counts + the same argmax tie-break → bit-identical
    on any engine)."""
    from .operators.graph_algos import label_propagation
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(
        F.col("kind").isin("Customer", "Nation", "Region"))
    edges = g.edges_df.where(F.col("kind").isin("FromNation", "InRegion"))
    lp = label_propagation(nodes, edges, iters=4)
    return (lp.groupBy("label").agg(F.count("*").alias("n_members")))


def q_approx_distinct_users(spark, sf_dir):
    """Approximate distinct (HyperLogLog++): distinct users per event
    type at 1% target error.  Sketches merge associatively, so the
    partial aggregation is a fixed-size sketch per partition — the
    cardinality operator that stays cheap at 100 TB where exact
    COUNT(DISTINCT) must shuffle every key.

    Hash-match oracle via BRACKETING: the query emits the exact count
    plus a boolean asserting the HLL estimate lands within 5× the
    target error (the sketch value itself is implementation-specific,
    the bound is not); the oracle replays the exact count and TRUE."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.01)
                 .alias("approx"),
                 F.countDistinct("user_id").alias("n_exact"))
            .select("event_type", "n_exact",
                    ((F.abs(F.col("approx") - F.col("n_exact"))
                      / F.col("n_exact")) <= 0.05).alias("approx_ok")))


def q_approx_percentiles(spark, sf_dir):
    """Approximate percentiles (Greenwald-Khanna sketch) of order value:
    p50/p95/p99 at accuracy 10000.  Same scale story as HLL — bounded
    sketch per partition instead of a global sort.

    Hash-match oracle via BRACKETING: GK at accuracy a guarantees rank
    error ≤ n/a (~15 ranks here); the query asserts each estimate falls
    inside the exact ±0.002-rank-fraction interval (±300 ranks — 20×
    headroom) and emits the booleans + row count; the oracle replays
    TRUE + the count."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000)
        .alias("p"),
        F.expr("percentile(o_totalprice, "
               "array(0.498, 0.502, 0.948, 0.952, 0.988, 0.992))")
        .alias("x"),
        F.count("*").alias("n_orders"))
    p, x = F.col("p"), F.col("x")
    return a.select(
        "n_orders",
        ((x[0] <= p[0]) & (p[0] <= x[1])).alias("p50_ok"),
        ((x[2] <= p[1]) & (p[1] <= x[3])).alias("p95_ok"),
        ((x[4] <= p[2]) & (p[2] <= x[5])).alias("p99_ok"))


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI)

def _pagerank_top10_sql(iters: int = 5, d: float = 0.85) -> str:
    """Unrolled power iteration replaying graph_algos.pagerank exactly:
    ranks init 1.0, per-round dangling-mass scalar, base = 1-d +
    d·dangling/N, contributions rank/outdeg over the raw (non-distinct)
    edge rows."""
    parts = [
        """nodes AS (
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid
          FROM customer
          UNION ALL
          SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) FROM orders
          UNION ALL
          SELECT 'Part:' || CAST(p_partkey AS VARCHAR) FROM part)""",
        """edges AS (
          SELECT 'Customer:' || CAST(o_custkey AS VARCHAR) AS src,
                 'Order:' || CAST(o_orderkey AS VARCHAR) AS dst
          FROM orders
          UNION ALL
          SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
                 'Part:' || CAST(l_partkey AS VARCHAR)
          FROM lineitem)""",
        "odeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT uid, 1.0 AS rank FROM nodes)"]
    for i in range(iters):
        parts.append(f"""d{i} AS MATERIALIZED (
          SELECT COALESCE(SUM(r.rank), 0) AS dm FROM r{i} r
          LEFT JOIN odeg o ON o.src = r.uid WHERE o.src IS NULL)""")
        parts.append(f"""r{i + 1} AS MATERIALIZED (
          SELECT n.uid,
                 (1 - {d}) + {d} * (SELECT dm FROM d{i}) / (SELECT n FROM nn)
                 + {d} * COALESCE(inc.s, 0) AS rank
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS uid, SUM(r.rank / o.deg) AS s
            FROM edges e
            JOIN r{i} r ON r.uid = e.src
            JOIN odeg o ON o.src = e.src
            GROUP BY e.dst) inc ON inc.uid = n.uid)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT uid FROM r{iters} "
              "ORDER BY round(rank, 6) DESC, uid LIMIT 10")


def _label_propagation_sql(iters: int = 4,
                           final: str | None = None) -> str:
    """Unrolled synchronous LPA replaying graph_algos.label_propagation:
    per round every node adopts its neighborhood's most frequent label,
    ties to the smallest label string; isolated nodes keep their uid."""
    parts = [
        """nodes AS (
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid
          FROM customer
          UNION ALL
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'Region:' || CAST(r_regionkey AS VARCHAR) FROM region)""",
        """de AS (
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS src,
                 'Nation:' || CAST(c_nationkey AS VARCHAR) AS dst
          FROM customer
          UNION ALL
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 'Region:' || CAST(n_regionkey AS VARCHAR)
          FROM nation)""",
        """sym AS (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM de
          UNION ALL SELECT dst, src FROM de))""",
        "l0 AS (SELECT uid, uid AS label FROM nodes)"]
    for i in range(iters):
        parts.append(f"""l{i + 1} AS MATERIALIZED (
          SELECT n.uid, COALESCE(b.lab, n.uid) AS label
          FROM nodes n LEFT JOIN (
            SELECT uid, lab FROM (
              SELECT uid, lab,
                     ROW_NUMBER() OVER (PARTITION BY uid
                                        ORDER BY c DESC, lab) AS rn
              FROM (SELECT s.dst AS uid, l.label AS lab, COUNT(*) AS c
                    FROM sym s JOIN l{i} l ON l.uid = s.src
                    GROUP BY s.dst, l.label))
            WHERE rn = 1) b ON b.uid = n.uid)""")
    tail = final if final is not None else (
        f"SELECT label, COUNT(*) AS n_members "
        f"FROM l{iters} GROUP BY label")
    return "WITH " + ",\n".join(parts) + "\n" + tail


def _k_core_sql(k: int = 6, rounds: int = 16) -> str:
    """Unrolled peel replaying graph_algos.k_core: round i keeps nodes
    with ≥ k distinct neighbors in the surviving subgraph.  Peeling is
    idempotent after its fixpoint, so unrolling more rounds than the
    actual peel depth is exact (the engine-side loop warns if 30 rounds
    ever stop short; this fixture peels in far fewer)."""
    parts = ["""e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
          SELECT 'Order:' || CAST(l_orderkey AS VARCHAR) AS src,
                 'Part:' || CAST(l_partkey AS VARCHAR) AS dst
          FROM lineitem
          UNION ALL
          SELECT 'Part:' || CAST(l_partkey AS VARCHAR),
                 'Order:' || CAST(l_orderkey AS VARCHAR)
          FROM lineitem))"""]
    for i in range(rounds):
        parts.append(f"""k{i} AS MATERIALIZED (
          SELECT src AS uid FROM e{i} GROUP BY src HAVING COUNT(*) >= {k})""")
        parts.append(f"""e{i + 1} AS MATERIALIZED (
          SELECT e.src, e.dst FROM e{i} e
          JOIN k{i} a ON a.uid = e.src
          JOIN k{i} b ON b.uid = e.dst)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT DISTINCT src AS uid FROM e{rounds}")


def _hits_sql(iters: int = 5) -> str:
    """Unrolled HITS replaying graph_algos.hits on the Contains graph:
    hub/auth init 1.0 over edge-touched nodes, per-round sum
    normalization via MATERIALIZED scalar CTEs."""
    parts = [
        """edges AS MATERIALIZED (
          SELECT 'Order:' || CAST(l_orderkey AS VARCHAR) AS src,
                 'Part:' || CAST(l_partkey AS VARCHAR) AS dst
          FROM lineitem)""",
        """nodes AS MATERIALIZED (
          SELECT DISTINCT uid FROM (
            SELECT src AS uid FROM edges
            UNION ALL SELECT dst FROM edges))""",
        "h0 AS (SELECT uid, 1.0 AS h FROM nodes)"]
    for i in range(iters):
        parts.append(f"""ar{i} AS MATERIALIZED (
          SELECT n.uid, COALESCE(x.a, 0) AS a
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS uid, SUM(h.h) AS a
            FROM edges e JOIN h{i} h ON h.uid = e.src
            GROUP BY e.dst) x ON x.uid = n.uid)""")
        parts.append(f"""a{i + 1} AS MATERIALIZED (
          SELECT uid, a / (SELECT SUM(a) FROM ar{i}) AS a FROM ar{i})""")
        parts.append(f"""hr{i} AS MATERIALIZED (
          SELECT n.uid, COALESCE(x.h, 0) AS h
          FROM nodes n LEFT JOIN (
            SELECT e.src AS uid, SUM(a.a) AS h
            FROM edges e JOIN a{i + 1} a ON a.uid = e.dst
            GROUP BY e.src) x ON x.uid = n.uid)""")
        parts.append(f"""h{i + 1} AS MATERIALIZED (
          SELECT uid, h / (SELECT SUM(h) FROM hr{i}) AS h FROM hr{i})""")
    return ("WITH " + ",\n".join(parts) + f"""
        SELECT uid, round(a, 6) AS authority FROM a{iters}
        ORDER BY authority DESC, uid LIMIT 10""")


def _ppr_sql(iters: int = 5, d: float = 0.85, n_seeds: int = 5) -> str:
    """Unrolled personalized PageRank replaying
    graph_algos.personalized_pagerank: teleport + dangling mass return
    to the seed customers uniformly."""
    seeds = ", ".join(f"'Customer:{i}'" for i in range(n_seeds))
    parts = [
        """nodes AS MATERIALIZED (
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid
          FROM customer
          UNION ALL
          SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) FROM orders
          UNION ALL
          SELECT 'Part:' || CAST(p_partkey AS VARCHAR) FROM part)""",
        """edges AS MATERIALIZED (
          SELECT 'Customer:' || CAST(o_custkey AS VARCHAR) AS src,
                 'Order:' || CAST(o_orderkey AS VARCHAR) AS dst
          FROM orders
          UNION ALL
          SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
                 'Part:' || CAST(l_partkey AS VARCHAR)
          FROM lineitem)""",
        "odeg AS MATERIALIZED "
        "(SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        f"""ss AS MATERIALIZED (
          SELECT uid, CASE WHEN uid IN ({seeds})
                 THEN 1.0 / {n_seeds} ELSE 0.0 END AS s
          FROM nodes)""",
        "r0 AS (SELECT uid, s AS rank FROM ss)"]
    for i in range(iters):
        parts.append(f"""d{i} AS MATERIALIZED (
          SELECT COALESCE(SUM(r.rank), 0) AS dm FROM r{i} r
          LEFT JOIN odeg o ON o.src = r.uid WHERE o.src IS NULL)""")
        parts.append(f"""r{i + 1} AS MATERIALIZED (
          SELECT n.uid,
                 ss.s * ((1 - {d}) + {d} * (SELECT dm FROM d{i}))
                 + {d} * COALESCE(inc.x, 0) AS rank
          FROM nodes n
          JOIN ss ON ss.uid = n.uid
          LEFT JOIN (
            SELECT e.dst AS uid, SUM(r.rank / o.deg) AS x
            FROM edges e
            JOIN r{i} r ON r.uid = e.src
            JOIN odeg o ON o.src = e.src
            GROUP BY e.dst) inc ON inc.uid = n.uid)""")
    return ("WITH " + ",\n".join(parts) + f"""
        SELECT uid, round(rank, 9) AS rank FROM r{iters}
        WHERE uid NOT IN ({seeds}) AND round(rank, 9) > 0
        ORDER BY rank DESC, uid LIMIT 15""")


def q_resample_locf(spark, sf_dir):
    """Time-series gap-fill: hourly per-user resample of events.value
    with last-observation-carried-forward (the timeseries-DB hypertable
    rollup + locf shape).  FULL oracle: the value column is copied, not
    computed, so doubles hash exactly; the in-bucket election is made
    deterministic by the (ts, event_id) tiebreak."""
    from .operators.relational import resample_locf
    return resample_locf(_events(spark, sf_dir), "user_id", "ts", "value",
                         unit="hour", tiebreak="event_id")


_RESAMPLE_LOCF_ORACLE = """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
latest AS (SELECT user_id, bucket_ts, value AS obs FROM b WHERE rn = 1),
span AS (SELECT user_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
         FROM latest GROUP BY 1),
grid AS (SELECT user_id, g.g AS bucket_ts
         FROM span, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(g))
SELECT g.user_id, g.bucket_ts,
       last_value(l.obs IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket_ts
         ROWS UNBOUNDED PRECEDING) AS value,
       l.obs IS NULL AS filled
FROM grid g LEFT JOIN latest l USING (user_id, bucket_ts)
"""


def q_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k for vec_id=0 (Jégou et al. 2011):
    4 subspaces × 8-centroid codebooks, asymmetric-distance scan over
    the code table only.  FULL oracle: each subspace k-means is the
    shared deterministic unrolled-CTE chain (namespaced per subspace);
    distance-table entries and the ADC sum are sequential double folds
    in both engines, so they agree bitwise."""
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0)
          .select("embedding").collect()[0][0]]
    codes, books = similarity.pq_index(emb, m=4, k=8, iters=2)
    top = similarity.pq_topk(codes, books, qv, k=10)
    return top.select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))


def _pq_oracle_sql(m: int = 4, k: int = 8, iters: int = 2,
                   topk: int = 10, dim: int = 64) -> str:
    """DuckDB replay of q_pq_topk: one namespaced k-means CTE chain per
    subspace (bit-identical centroids/assignments by the same three
    rules as _ivf_oracle_sql), then the ADC table join."""
    sub = dim // m
    chains = "".join(
        ("," if s else "") + _ivf_ctes(
            k, iters,
            source=(f"SELECT vec_id, embedding[{s*sub+1}:{(s+1)*sub}] "
                    f"AS embedding FROM embeddings"),
            pfx=f"s{s}_", with_kw=(s == 0))
        for s in range(m))
    tabs = ",".join(f"""
tab{s} AS (
  SELECT c.c, list_sum(list_transform(range(1, {sub}+1),
    i -> (c.cent[i] - q.qv[{s*sub} + i])
       * (c.cent[i] - q.qv[{s*sub} + i]))) AS d
  FROM s{s}_c{iters} c, q)""" for s in range(m))
    code_joins = " ".join(f"JOIN s{s}_fin USING (vec_id)"
                          for s in range(1, m))
    tab_joins = " ".join(f"JOIN tab{s} t{s} ON t{s}.c = s{s}_fin.c"
                         for s in range(m))
    dist = " + ".join(f"t{s}.d" for s in range(m))
    return chains + f""",
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = 0),{tabs}
SELECT s0_fin.vec_id, round({dist}, 6) AS adc_dist
FROM s0_fin {code_joins} {tab_joins}
ORDER BY {dist}, s0_fin.vec_id LIMIT {topk}"""


def q_random_walks(spark, sf_dir):
    """DeepWalk corpus: 2 seeded walks of length 4 from the 20 lowest
    orders over the symmetrized Contains (order↔part) graph.  FULL
    oracle: walks are hash-driven (md5-hash60 of seed:walk_id:step mod
    degree over sorted distinct neighbors), so SQL replays every step."""
    g = tpch_graph(spark, sf_dir)
    edges = g.edges_df.where(F.col("kind") == "Contains")
    starts = (load_tables(spark, sf_dir)["orders"]
              .orderBy("o_orderkey").limit(20)
              .select(F.concat(F.lit("Order:"),
                               F.col("o_orderkey").cast("string"))
                      .alias("uid")))
    return graph_algos.random_walks(edges, starts, walk_len=4,
                                    walks_per_node=2)


def _random_walks_oracle_sql(walk_len: int = 4, wpn: int = 2,
                             n_starts: int = 20, seed: str = "w") -> str:
    """Unrolled walk steps; each w{t} CTE replays the engine's
    hash-pick (left join keeps walks alive at isolated nodes)."""
    ws = ", ".join(str(i) for i in range(wpn))
    parts = [f"""ed AS (
  SELECT 'Order:' || CAST(l_orderkey AS VARCHAR) AS src,
         'Part:' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
sym AS (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed),
adj AS (SELECT src, list_sort(list_distinct(list(dst))) AS nbrs
        FROM sym GROUP BY src),
starts AS (SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid
           FROM orders ORDER BY o_orderkey LIMIT {n_starts}),
w0 AS (SELECT uid || '#' || CAST(t.w AS VARCHAR) AS walk_id,
              uid AS cur, uid AS path
       FROM starts, UNNEST([{ws}]) AS t(w))"""]
    for t in range(1, walk_len + 1):
        pick = (f"nbrs[1 + CAST((('0x' || substr(md5("
                f"'{seed}:' || walk_id || ':{t}'), 1, 15))::BIGINT "
                f"% len(nbrs)) AS INT)]")
        parts.append(f"""w{t} AS (
  SELECT walk_id,
         CASE WHEN nbrs IS NULL THEN cur ELSE {pick} END AS cur,
         CASE WHEN nbrs IS NULL THEN path
              ELSE path || '>' || {pick} END AS path
  FROM w{t-1} LEFT JOIN adj ON cur = src)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT walk_id, path FROM w{walk_len}")


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (clickstream modeling).  FULL oracle: integer counts,
    (ts, event_id) total order, 6 dp row-normalized probabilities."""
    from .operators.relational import transition_matrix
    return transition_matrix(_events(spark, sf_dir), "user_id", "ts",
                             "event_type", tiebreak="event_id")


_EVENT_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type AS state,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_state
  FROM events),
c AS (SELECT state, next_state, COUNT(*) AS cnt
      FROM seq WHERE next_state IS NOT NULL GROUP BY 1, 2)
SELECT state, next_state, cnt,
       round(cnt / SUM(cnt) OVER (PARTITION BY state), 6) AS prob
FROM c
"""


def q_incremental_dedup(spark, sf_dir):
    """Snapshot-over-snapshot dedup: documents with doc_id < 250 play
    the already-ingested corpus (their md5 fingerprints are the
    persisted index); the rest arrive as the new batch and are tagged
    kept / dup_history / dup_batch.  FULL oracle (pure hash joins)."""
    from .operators.dedup import incremental_dedup
    docs = _docs(spark, sf_dir)
    hist = (docs.where(F.col("doc_id") < 250)
            .select(F.md5("text").alias("content_hash")))
    return incremental_dedup(docs.where(F.col("doc_id") >= 250), hist)


_INCREMENTAL_DEDUP_ORACLE = """
WITH fp AS (SELECT doc_id, md5(COALESCE(text, '')) AS content_hash
            FROM documents WHERE doc_id >= 250),
hist AS (SELECT DISTINCT md5(COALESCE(text, '')) AS content_hash
         FROM documents WHERE doc_id < 250),
first AS (SELECT content_hash, MIN(doc_id) AS first_id
          FROM fp GROUP BY 1)
SELECT fp.doc_id, fp.content_hash,
       CASE WHEN hist.content_hash IS NOT NULL THEN 'dup_history'
            WHEN fp.doc_id != first.first_id THEN 'dup_batch'
            ELSE 'kept' END AS status
FROM fp LEFT JOIN hist USING (content_hash)
JOIN first USING (content_hash)
"""


_PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "ts"]


def q_profile_events(spark, sf_dir):
    """Single-pass column profiler over the raw events table (nulls,
    exact distincts, min/max as strings).  FULL oracle — the profiled
    columns render identically in both engines (ints, strings, 2 dp
    doubles, microsecond timestamps)."""
    from .operators.relational import profile_columns
    return profile_columns(_events(spark, sf_dir), _PROFILE_COLS)


def _profile_events_oracle_sql() -> str:
    aggs = ", ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_{i}, COUNT(DISTINCT {c}) AS d_{i}, "
        f"CAST(MIN({c}) AS VARCHAR) AS mn_{i}, "
        f"CAST(MAX({c}) AS VARCHAR) AS mx_{i}"
        for i, c in enumerate(_PROFILE_COLS))
    sel = "\nUNION ALL ".join(
        f"SELECT '{c}' AS col_name, n_{i} AS n_nulls, d_{i} AS n_distinct, "
        f"mn_{i} AS min_value, mx_{i} AS max_value FROM a"
        for i, c in enumerate(_PROFILE_COLS))
    return f"WITH a AS (SELECT {aggs} FROM events)\n{sel}"


def q_knn_join(spark, sf_dir):
    """Batch k-NN join: exact cosine top-5 of the corpus (vec_id ≥ 10)
    for EACH of the 10 lowest-id query vectors at once.  FULL oracle —
    the same sequential cosine folds as the knn_cosine oracle, ranked
    per query with an id tiebreak."""
    emb = _emb(spark, sf_dir)
    return similarity.knn_join(emb.where(F.col("vec_id") < 10),
                               emb.where(F.col("vec_id") >= 10), k=5)


_KNN_JOIN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
pairs AS (
  SELECT q.query_id, c.vec_id,
         list_sum(list_transform(range(1, len(c.embedding)+1),
           i -> q.qv[i] * CAST(c.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(q.qv)+1),
              i -> q.qv[i] * q.qv[i])))
          * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
              i -> CAST(c.embedding[i] AS DOUBLE)
                 * CAST(c.embedding[i] AS DOUBLE))))) AS cos
  FROM c, q)
SELECT query_id, vec_id, round(cos, 6) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
FROM pairs
QUALIFY rn <= 5
"""


def q_standardize(spark, sf_dir):
    """Z-score feature normalization of the embedding corpus against
    per-dimension quantized-integer stats (bit-reproducible at any
    parallelism).  FULL oracle: the stats CTE replays the exact BIGINT
    sums and the same double formula, element rounding at 6 dp."""
    emb = _emb(spark, sf_dir)
    mean, std = similarity.dim_stats(emb)
    return similarity.standardize(emb, mean, std)


_STANDARDIZE_ORACLE = """
WITH x AS (SELECT vec_id, embedding FROM embeddings),
st AS (
  SELECT t.i AS dim,
    CAST(SUM(CAST(ROUND(CAST(embedding[t.i] AS DOUBLE) * 1e9) AS BIGINT))
         AS DOUBLE) / (1e9 * COUNT(*)) AS m,
    CAST(SUM(CAST(ROUND(CAST(embedding[t.i] AS DOUBLE)
                        * CAST(embedding[t.i] AS DOUBLE) * 1e9) AS BIGINT))
         AS DOUBLE) / (1e9 * COUNT(*)) AS ms
  FROM x, UNNEST(range(1, len(embedding)+1)) AS t(i)
  GROUP BY 1),
sa AS (SELECT list(m ORDER BY dim) AS mean,
              list(CASE WHEN ms - m*m > 0 THEN sqrt(ms - m*m)
                        ELSE 0.0 END ORDER BY dim) AS sd
       FROM st),
zz AS (
  SELECT vec_id,
    list_transform(range(1, len(embedding)+1),
      i -> CASE WHEN sa.sd[i] > 0
                THEN round((CAST(embedding[i] AS DOUBLE) - sa.mean[i])
                           / sa.sd[i], 6)
                ELSE 0.0 END) AS z
  FROM x, sa)
SELECT vec_id, z,
       round(sqrt(list_sum(list_transform(z, v -> v*v))), 6) AS z_norm
FROM zz
"""


def q_jl_projection(spark, sf_dir):
    """Johnson–Lindenstrauss random projection 64 → 16 dims (seeded
    Gaussian planes, 1/√16 scale).  FULL oracle with the plane matrix
    inlined via repr() — the same doubles the engine folds."""
    return similarity.random_projection(_emb(spark, sf_dir),
                                        out_dim=16, in_dim=64, seed=7)


def _jl_oracle_sql(out_dim: int = 16, in_dim: int = 64,
                   seed: int = 7) -> str:
    import math as _math
    planes = similarity._random_hyperplanes(in_dim, out_dim, seed)
    pl = "[" + ", ".join(
        "[" + ", ".join(repr(v) for v in p) + "]" for p in planes) + "]"
    inv = repr(1.0 / _math.sqrt(out_dim))
    return f"""
WITH p AS (SELECT {pl} AS pl),
proj AS (
  SELECT vec_id,
    list_transform(range(1, {out_dim}+1),
      k -> round(list_sum(list_transform(range(1, {in_dim}+1),
             j -> p.pl[k][j] * CAST(e.embedding[j] AS DOUBLE)))
           * {inv}, 6)) AS proj
  FROM embeddings e, p)
SELECT vec_id, proj,
       round(sqrt(list_sum(list_transform(proj, v -> v*v))), 6)
       AS proj_norm
FROM proj"""


def q_dag_layers(spark, sf_dir):
    """Topological layering of the (acyclic) TPC-H graph encoding:
    longest directed path ending at each node.  FULL oracle: the
    recursive-CTE walk enumerates all paths and max-aggregates per
    destination — integer-exact."""
    g = tpch_graph(spark, sf_dir)
    return graph_algos.dag_layers(g.edges_df)


_DAG_LAYERS_ORACLE = """
WITH RECURSIVE e(src, dst) AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR) AS src,
           'Region:' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation
    UNION ALL SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
                     'Nation:' || CAST(c_nationkey AS VARCHAR)
              FROM customer
    UNION ALL SELECT 'Supplier:' || CAST(s_suppkey AS VARCHAR),
                     'Nation:' || CAST(s_nationkey AS VARCHAR)
              FROM supplier
    UNION ALL SELECT 'Customer:' || CAST(o_custkey AS VARCHAR),
                     'Order:' || CAST(o_orderkey AS VARCHAR) FROM orders
    UNION ALL SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
                     'Part:' || CAST(l_partkey AS VARCHAR) FROM lineitem
    UNION ALL SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
                     'Supplier:' || CAST(l_suppkey AS VARCHAR)
              FROM lineitem
    UNION ALL SELECT 'User:' || CAST(user_id AS VARCHAR),
                     'Event:' || CAST(event_id AS VARCHAR) FROM events)),
nodes AS (SELECT src AS uid FROM e UNION SELECT dst FROM e),
walk(uid, len) AS (
  SELECT dst, 1 FROM e
  UNION ALL
  SELECT e.dst, w.len + 1 FROM walk w JOIN e ON e.src = w.uid)
SELECT n.uid, CAST(COALESCE(MAX(w.len), 0) AS BIGINT) AS layer
FROM nodes n LEFT JOIN walk w ON w.uid = n.uid
GROUP BY n.uid
"""


def q_scc(spark, sf_dir):
    """Strongly connected components over the order-ring part graph
    (each order's sorted distinct parts close a directed ring; orders
    sharing a part merge into one SCC).  FULL oracle: the output is
    canonical (scc = min member uid), so the DuckDB side states the
    SPEC — mutual reachability via a transitive-closure CTE — rather
    than replaying the engine's coloring algorithm."""
    from pyspark.sql import Window as W
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_orderkey") < 100)
          .select("l_orderkey", "l_partkey").distinct())
    w = W.partitionBy("l_orderkey").orderBy("l_partkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ring = li.select(
        F.concat(F.lit("Part:"), F.col("l_partkey").cast("string"))
        .alias("startuid"),
        F.concat(F.lit("Part:"),
                 F.coalesce(F.lead("l_partkey").over(w),
                            F.first("l_partkey").over(wf))
                 .cast("string")).alias("enduid"))
    return graph_algos.strongly_connected_components(ring)


_SCC_ORACLE = """
WITH RECURSIVE li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_orderkey < 100),
ring AS (
  SELECT 'Part:' || CAST(p AS VARCHAR) AS src,
         'Part:' || CAST(COALESCE(
             lead(p) OVER (PARTITION BY o ORDER BY p),
             first_value(p) OVER (PARTITION BY o ORDER BY p))
           AS VARCHAR) AS dst
  FROM li),
e AS (SELECT DISTINCT src, dst FROM ring WHERE src != dst),
nodes AS (SELECT DISTINCT src AS uid FROM ring
          UNION SELECT dst FROM ring),
reach(a, b) AS (
  SELECT uid, uid FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b)
SELECT n.uid, MIN(r.a) AS scc
FROM nodes n
JOIN reach r ON r.b = n.uid
JOIN reach r2 ON r2.a = n.uid AND r2.b = r.a
GROUP BY n.uid
"""


def q_temperature_mixture(spark, sf_dir):
    """Temperature-scaled mixture (w_s ∝ n_s^0.7, the mBERT/XLM-R
    multilingual rebalancing rule).  FULL oracle: n^α quantizes to a
    1e-6 integer (exact normalizer sum), the per-source rate rounds to
    6 dp before the md5 hash gate."""
    from .operators.pipeline import temperature_mixture
    out = temperature_mixture(_docs(spark, sf_dir), "source", "doc_id",
                              alpha=0.7)
    return out.select("doc_id", "source")


_TEMPERATURE_MIXTURE_ORACLE = """
WITH counts AS (
  SELECT source, COUNT(*) AS n,
         CAST(ROUND(pow(CAST(COUNT(*) AS DOUBLE), 0.7) * 1e6) AS BIGINT)
         AS wq
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS t FROM counts),
rates AS (
  SELECT source,
         round((SELECT MIN(n / (CAST(wq AS DOUBLE) / CAST(t AS DOUBLE)))
                FROM counts, tot)
               * (CAST(wq AS DOUBLE) / CAST(t AS DOUBLE)) / n, 6) AS rate
  FROM counts, tot)
SELECT d.doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE rate >= 1.0
   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      < printf('%04x', CAST(floor(rate * 65536) AS INT))
"""


def q_negative_samples(spark, sf_dir):
    """Deterministic negative sampling (3 hash-picked non-edges per
    node) over the l_orderkey<50 Contains slice — the link-prediction
    training-pair generator paired with q:random_walks.  FULL oracle:
    canonical row_number indexing + md5-hash60 picks + NOT EXISTS."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_orderkey") < 50))
    edges = li.select(
        F.concat(F.lit("Order:"), F.col("l_orderkey").cast("string"))
        .alias("startuid"),
        F.concat(F.lit("Part:"), F.col("l_partkey").cast("string"))
        .alias("enduid")).distinct()
    return graph_algos.negative_samples(edges, k=3)


_NEGATIVE_SAMPLES_ORACLE = """
WITH e AS (SELECT DISTINCT
             'Order:' || CAST(l_orderkey AS VARCHAR) AS src,
             'Part:' || CAST(l_partkey AS VARCHAR) AS dst
           FROM lineitem WHERE l_orderkey < 50),
nodes AS (SELECT src AS uid FROM e UNION SELECT dst FROM e),
idx AS (SELECT uid, row_number() OVER (ORDER BY uid) - 1 AS i
        FROM nodes),
nn AS (SELECT COUNT(*) AS n FROM idx),
cand AS (
  SELECT x.uid AS src,
         ('0x' || substr(md5('neg:' || x.uid || ':'
                             || CAST(t.k AS VARCHAR)), 1, 15))::BIGINT
         % nn.n AS pick
  FROM idx x, UNNEST([0, 1, 2]) AS t(k), nn),
pairs AS (SELECT DISTINCT c.src, y.uid AS dst
          FROM cand c JOIN idx y ON y.i = c.pick
          WHERE c.src != y.uid),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)
SELECT p.src, p.dst FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM sym s
                  WHERE s.src = p.src AND s.dst = p.dst)
"""


def q_apply_cdc(spark, sf_dir):
    """CDC apply: a synthesized change feed (deletes for keys ≡0 mod
    10, a delete-then-update conflict for ≡1 — the seq-2 update must
    win, inserts under new keys for ≡2) merges onto the orders
    snapshot.  FULL oracle: window replay of the same feed."""
    from .operators.relational import apply_cdc
    o = (load_tables(spark, sf_dir)["orders"]
         .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    k = F.col("o_orderkey")

    def chg(rows, seq, op, tp, st):
        return rows.select(
            k.alias("o_orderkey"), F.lit(seq).alias("seq"),
            F.lit(op).alias("op"), tp.alias("o_totalprice"),
            st.alias("o_orderstatus"))

    nul_d, nul_s = (F.lit(None).cast("double"),
                    F.lit(None).cast("string"))
    feed = (chg(o.where(k % 10 == 0), 1, "D", nul_d, nul_s)
            .unionByName(chg(o.where(k % 10 == 1), 1, "D", nul_d, nul_s))
            .unionByName(chg(o.where(k % 10 == 1), 2, "U",
                             F.col("o_totalprice") + 1000, F.lit("U9")))
            .unionByName(
                o.where(k % 10 == 2).select(
                    (k + 10000000).alias("o_orderkey"),
                    F.lit(1).alias("seq"), F.lit("I").alias("op"),
                    F.col("o_totalprice"), F.lit("N")
                    .alias("o_orderstatus"))))
    return apply_cdc(o, feed, "o_orderkey", "seq")


_APPLY_CDC_ORACLE = """
WITH snap AS (SELECT o_orderkey AS k, o_totalprice AS tp,
                     o_orderstatus AS st FROM orders),
chg AS (
  SELECT o_orderkey AS k, 1 AS seq, 'D' AS op,
         CAST(NULL AS DOUBLE) AS tp, CAST(NULL AS VARCHAR) AS st
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey, 1, 'D', NULL, NULL
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL SELECT o_orderkey, 2, 'U', o_totalprice + 1000, 'U9'
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL SELECT o_orderkey + 10000000, 1, 'I', o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 10 = 2),
win AS (SELECT k, op, tp, st FROM (
  SELECT k, op, tp, st,
         row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
  FROM chg) WHERE rn = 1)
SELECT COALESCE(s.k, w.k) AS o_orderkey,
       CASE WHEN w.op IS NOT NULL THEN w.tp ELSE s.tp END
         AS o_totalprice,
       CASE WHEN w.op IS NOT NULL THEN w.st ELSE s.st END
         AS o_orderstatus
FROM snap s FULL OUTER JOIN win w ON s.k = w.k
WHERE w.op IS NULL OR w.op != 'D'
"""


def q_histogram_values(spark, sf_dir):
    """Equi-width 10-bin histogram of events.value with a dense bin
    spine (empty bins present).  FULL oracle — bounds/width/binning
    replay as the same double expressions."""
    from .operators.relational import histogram
    return histogram(_events(spark, sf_dir), "value", bins=10)


_HISTOGRAM_ORACLE = """
WITH b AS (SELECT MIN(CAST(value AS DOUBLE)) AS blo,
                  MAX(CAST(value AS DOUBLE)) AS bhi FROM events),
p AS (SELECT blo, bhi,
             CASE WHEN (bhi - blo) / 10 = 0 THEN 1.0
                  ELSE (bhi - blo) / 10 END AS w FROM b),
c AS (SELECT LEAST(9, CAST(floor((CAST(value AS DOUBLE) - blo) / w)
                           AS BIGINT)) AS bin,
             COUNT(*) AS n
      FROM events, p
      WHERE value IS NOT NULL AND CAST(value AS DOUBLE) >= blo
        AND CAST(value AS DOUBLE) <= bhi
      GROUP BY 1),
spine AS (SELECT t.b AS bin FROM UNNEST(range(0, 10)) AS t(b))
SELECT s.bin, round(p.blo + s.bin * p.w, 6) AS lo,
       round(p.blo + (s.bin + 1) * p.w, 6) AS hi,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM spine s CROSS JOIN p LEFT JOIN c ON c.bin = s.bin
"""


def q_winsorize_values(spark, sf_dir):
    """p01/p99 winsorization of events.value (outlier-robust clamp).
    FULL oracle: exact linear-interpolation percentiles (the shared
    portable definition), clamp rounded to 6 dp."""
    from .operators.relational import winsorize
    out = winsorize(_events(spark, sf_dir), "value")
    return out.select("event_id", "value_winsorized")


_WINSORIZE_ORACLE = """
WITH p AS (SELECT quantile_cont(value, 0.01) AS lo,
                  quantile_cont(value, 0.99) AS hi FROM events)
SELECT event_id,
       round(LEAST(GREATEST(CAST(value AS DOUBLE), lo), hi), 6)
       AS value_winsorized
FROM events, p
"""


def q_tfidf_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (exact integer tf/df, natural
    log idf, 6 dp, term tiebreak).  FULL oracle."""
    from .operators.text import tfidf_topk
    return tfidf_topk(_docs(spark, sf_dir), k=3)


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'),
          x -> x != '') AS ws FROM documents),
       UNNEST(ws) AS t(term)),
n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
idf AS (SELECT term, ln(CAST((SELECT nd FROM n) AS DOUBLE) / COUNT(*))
               AS idf
        FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 6) AS tfidf
  FROM tf JOIN idf USING (term))
SELECT doc_id, term, tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS BIGINT)
       AS rank
FROM scored
QUALIFY rank <= 3
"""


def q_reciprocity(spark, sf_dir):
    """Reciprocity of the order-ring part graph (2-part orders close
    mutually-reciprocated pairs).  FULL oracle — exact integer counts."""
    from pyspark.sql import Window as W
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_orderkey") < 100)
          .select("l_orderkey", "l_partkey").distinct())
    w = W.partitionBy("l_orderkey").orderBy("l_partkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ring = li.select(
        F.concat(F.lit("Part:"), F.col("l_partkey").cast("string"))
        .alias("startuid"),
        F.concat(F.lit("Part:"),
                 F.coalesce(F.lead("l_partkey").over(w),
                            F.first("l_partkey").over(wf))
                 .cast("string")).alias("enduid"))
    return graph_algos.reciprocity(ring)


_RECIPROCITY_ORACLE = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_orderkey < 100),
ring AS (
  SELECT 'Part:' || CAST(p AS VARCHAR) AS src,
         'Part:' || CAST(COALESCE(
             lead(p) OVER (PARTITION BY o ORDER BY p),
             first_value(p) OVER (PARTITION BY o ORDER BY p))
           AS VARCHAR) AS dst
  FROM li),
e AS (SELECT DISTINCT src, dst FROM ring WHERE src != dst),
rec AS (SELECT COUNT(*) AS nr FROM e
        WHERE EXISTS (SELECT 1 FROM e e2
                      WHERE e2.src = e.dst AND e2.dst = e.src))
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       nr AS n_reciprocated,
       round(nr / (SELECT COUNT(*) FROM e), 6) AS reciprocity
FROM rec
"""


def q_grouped_split(spark, sf_dir):
    """Leakage-safe holdout split: the hash band keys on the SOURCE, so
    every document of a source lands in one split (GroupShuffleSplit).
    FULL oracle — same band-edge hex literals on the group key."""
    from .operators.pipeline import grouped_split
    out = grouped_split(_docs(spark, sf_dir), "source",
                        val=0.2, test=0.2)
    return out.select("doc_id", "source", "split")


_GROUPED_SPLIT_ORACLE = """
SELECT doc_id, source,
       CASE
         WHEN substr(md5(source), 1, 4)
              < printf('%04x', CAST(ceil(0.2 * 65536) AS INT))
           THEN 'val'
         WHEN substr(md5(source), 1, 4)
              < printf('%04x', CAST(ceil(0.4 * 65536) AS INT))
           THEN 'test'
         ELSE 'train'
       END AS split
FROM documents
"""


_VALUE_BANDS = [(0.0, 1.0, "tiny"), (1.0, 2.0, "small"),
                (2.0, 4.0, "low"), (4.0, 8.0, "mid"),
                (8.0, 16.0, "high"), (16.0, 64.0, "big"),
                (64.0, 1024.0, "huge")]


def q_interval_lookup(spark, sf_dir):
    """Value-band enrichment of events via the bucketed interval lookup
    (non-uniform power-of-two bands — the IP-geo shape).  FULL oracle:
    the bands inline as VALUES and DuckDB's BETWEEN join replays the
    same half-open semantics."""
    from .operators.relational import interval_lookup
    ranges = spark.createDataFrame(_VALUE_BANDS,
                                   "lo double, hi double, band string")
    out = interval_lookup(_events(spark, sf_dir), ranges, "value",
                          key_cols=["event_id"])
    return out.select("event_id", "value", "band")


def _interval_lookup_oracle_sql() -> str:
    vals = ", ".join(f"({lo!r}, {hi!r}, '{b}')"
                     for lo, hi, b in _VALUE_BANDS)
    return f"""
WITH bands(lo, hi, band) AS (VALUES {vals})
SELECT e.event_id, e.value, b.band
FROM events e LEFT JOIN bands b
  ON CAST(e.value AS DOUBLE) >= b.lo AND CAST(e.value AS DOUBLE) < b.hi
"""


def q_grouped_percentiles(spark, sf_dir):
    """Exact per-group percentiles (p50/p95/p99 of value per event
    type) — the grouped order-statistics profile.  FULL oracle: both
    engines use linear-interpolation exact percentiles; results round
    to 6 dp."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count("*").alias("n")))


_GROUPED_PERCENTILES_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_degree_distribution(spark, sf_dir):
    """Degree distribution of the co-incidence (Contains) graph: how
    many parts have each order-degree — the power-law profile every
    graph audit starts with.  FULL oracle (pure integer counts)."""
    g = tpch_graph(spark, sf_dir)
    deg = (g.edges_df.where(F.col("kind") == "Contains")
           .groupBy(F.col("enduid").alias("uid"))
           .agg(F.count("*").alias("degree")))
    return (deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))
            .orderBy("degree"))


_DEGREE_DISTRIBUTION_ORACLE = """
WITH deg AS (SELECT l_partkey, COUNT(*) AS degree
             FROM lineitem GROUP BY l_partkey)
SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
"""


def q_modal_event(spark, sf_dir):
    """Each user's most frequent event type (argmax of a grouped count,
    lexicographic tiebreak).  FULL oracle."""
    ev = _events(spark, sf_dir)
    counts = (ev.groupBy("user_id", "event_type")
              .agg(F.count("*").alias("cnt")))
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy(F.col("cnt").desc(),
                                         F.col("event_type"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("modal_event"),
                    "cnt"))


_MODAL_EVENT_ORACLE = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2)
SELECT user_id, event_type AS modal_event, cnt FROM (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM c) WHERE rn = 1
"""


def q_media_pipeline(spark, sf_dir):
    """Composite multimodal DAG (the image-curation analogue of
    corpus_pipeline): synthesize containers → decode real headers →
    gate on pixel area ≥ 400 → thumbnail to 16 px.  FULL oracle: every
    stage's arithmetic (construction formulas, area gate, scale math)
    replays in SQL bit-exactly."""
    from .operators.multimodal import (documents_as_media,
                                       extract_features, resize)
    media = documents_as_media(_docs(spark, sf_dir))
    feats = extract_features(media)
    keep = feats.where(F.col("width") * F.col("height") >= 400)
    kept_media = media.join(keep.select("media_id"), "media_id")
    resized = resize(kept_media, max_side=16)
    return (resized.join(keep.select("media_id", "fmt", "n_frames"),
                         "media_id")
            .select("media_id", "fmt", "width", "height", "n_frames"))


_MEDIA_PIPELINE_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
              ELSE 'gif' END AS fmt,
         4 + n_chars % 60 AS w,
         4 + (n_chars // 7) % 60 AS h,
         CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4 ELSE 1 END AS nf
  FROM documents),
kept AS (SELECT * FROM dims WHERE w * h >= 400),
scaled AS (SELECT media_id, fmt, w, h, nf,
                  LEAST(1.0, 16.0 / GREATEST(w, h)) AS scale
           FROM kept)
SELECT media_id, fmt,
       CAST(GREATEST(1, FLOOR(w * scale)) AS INT) AS width,
       CAST(GREATEST(1, FLOOR(h * scale)) AS INT) AS height,
       CAST(nf AS INT) AS n_frames
FROM scaled
"""


def q_k_truss(spark, sf_dir):
    """4-truss of the part co-purchase graph (orders < 60): edges in
    ≥ 2 triangles survive the peel.  FULL oracle: the peel loop
    unrolls as MATERIALIZED CTE rounds (idempotent past the fixpoint,
    the k_core pattern)."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_orderkey") < 60)
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("x"), li.alias("y")
    edges = (a.join(b, (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
                    & (F.col("x.l_partkey") < F.col("y.l_partkey")))
             .select(F.concat(F.lit("Part:"),
                              F.col("x.l_partkey").cast("string"))
                     .alias("startuid"),
                     F.concat(F.lit("Part:"),
                              F.col("y.l_partkey").cast("string"))
                     .alias("enduid")).distinct())
    return graph_algos.k_truss(edges, k=4)


def _k_truss_oracle_sql(k: int = 4, rounds: int = 8) -> str:
    # edges canonicalized on the STRING uids (LEAST/GREATEST), exactly
    # as the engine does — mixing int-canonical storage with the string
    # '<' of the wedge join would silently miss triangles
    parts = ["""e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(sa, sb) AS a, GREATEST(sa, sb) AS b FROM (
    SELECT 'Part:' || CAST(x.p AS VARCHAR) AS sa,
           'Part:' || CAST(y.p AS VARCHAR) AS sb
    FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM lineitem WHERE l_orderkey < 60) x
    JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM lineitem WHERE l_orderkey < 60) y
      ON x.o = y.o AND x.p < y.p))"""]
    for r in range(1, rounds + 1):
        p = f"e{r-1}"
        parts.append(f"""t{r} AS (
  SELECT w.a AS ta, w.b1 AS tb, w.b2 AS tc
  FROM (SELECT x.a, x.b AS b1, y.b AS b2
        FROM {p} x JOIN {p} y ON x.a = y.a AND x.b < y.b) w
  JOIN {p} z ON z.a = w.b1 AND z.b = w.b2),
s{r} AS (
  SELECT a, b, COUNT(*) AS s FROM (
    SELECT ta AS a, tb AS b FROM t{r}
    UNION ALL SELECT ta, tc FROM t{r}
    UNION ALL SELECT tb, tc FROM t{r}) GROUP BY 1, 2),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {p} e LEFT JOIN s{r} USING (a, b)
  WHERE COALESCE(s, 0) >= {k - 2})""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT a, b FROM e{rounds}")


def q_sentence_stats(spark, sf_dir):
    """Per-document sentence profile (count + mean token length) via a
    regex sentence split — the C4 sentence-level unit of analysis.
    FULL oracle: the same split regex runs in both engines; the mean is
    an exact integer ratio rounded to 6 dp."""
    docs = _docs(spark, sf_dir)
    sents = F.filter(F.split(F.col("text"), r"[.!?]+"),
                     lambda s: F.trim(s) != "")
    n_tokens = F.aggregate(
        sents, F.lit(0),
        lambda acc, s: acc + F.size(F.filter(
            F.split(F.lower(s), "[^a-z0-9]+"), lambda t: t != "")))
    return docs.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.round(n_tokens / F.greatest(F.size(sents), F.lit(1)), 6)
        .alias("mean_sentence_tokens"))


_SENTENCE_STATS_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[.!?]+'),
                     x -> trim(x) != '') AS sents
  FROM documents)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sentences,
       round(COALESCE(list_sum(list_transform(sents,
               x -> len(list_filter(
                 string_split_regex(lower(x), '[^a-z0-9]+'),
                 t -> t != '')))), 0)
             / greatest(len(sents), 1), 6) AS mean_sentence_tokens
FROM s
"""


def q_interarrival_stats(spark, sf_dir):
    """Per-user inter-arrival time profile: mean/max gap seconds
    between consecutive events (lag window, exact microsecond integers
    until the final 6 dp division).  FULL oracle."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (F.unix_micros("ts")
              - F.unix_micros(F.lag("ts").over(w)))
    gaps = (ev.select("user_id", gap_us.alias("g"))
            .where(F.col("g").isNotNull()))
    return (gaps.groupBy("user_id").agg(
        F.round((F.sum("g") / F.count("*")) / 1e6, 6)
        .alias("mean_gap_s"),
        F.round(F.max("g") / 1e6, 6).alias("max_gap_s"),
        F.count("*").alias("n_gaps")))


_INTERARRIVAL_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events)
SELECT user_id,
       round((SUM(g) / COUNT(*)) / 1e6, 6) AS mean_gap_s,
       round(MAX(g) / 1e6, 6) AS max_gap_s,
       COUNT(*) AS n_gaps
FROM g WHERE g IS NOT NULL GROUP BY user_id
"""


def q_pixel_stats(spark, sf_dir):
    """REAL raster decoding under the oracle gate: pixel_stats decodes
    the synthetic BMP rasters (raw BGR read) and PNG rasters (zlib
    inflate + unfilter) and reports exact integer sum/sum-of-squares —
    which the oracle recomputes from the generators' closed-form pixel
    formulas ((7i) mod 256 rows for BMP, (3x+y) mod 256 for PNG).  The
    fixture GIFs carry minimal LZW streams the decoder honestly
    rejects, so their stats are null — also predicted."""
    from .operators.multimodal import documents_as_media, pixel_stats
    media = documents_as_media(_docs(spark, sf_dir))
    return pixel_stats(media)


_PIXEL_STATS_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id, doc_id % 3 AS k,
         4 + n_chars % 60 AS w, 4 + (n_chars // 7) % 60 AS h
  FROM documents),
bmp AS (
  SELECT media_id, 'bmp' AS fmt,
         CAST(3 * w * h AS BIGINT) AS n_px,
         CAST(h * list_sum(list_transform(range(0, 3 * w),
                i -> (7 * i) % 256)) AS BIGINT) AS px_sum,
         CAST(h * list_sum(list_transform(range(0, 3 * w),
                i -> ((7 * i) % 256) * ((7 * i) % 256)))
              AS BIGINT) AS px_sum_sq
  FROM dims WHERE k = 0),
png AS (
  SELECT media_id, 'png' AS fmt,
         CAST(w * h AS BIGINT) AS n_px,
         CAST(list_sum(list_transform(range(0, h), y ->
                list_sum(list_transform(range(0, w), x ->
                  (x * 3 + y) % 256)))) AS BIGINT) AS px_sum,
         CAST(list_sum(list_transform(range(0, h), y ->
                list_sum(list_transform(range(0, w), x ->
                  ((x * 3 + y) % 256) * ((x * 3 + y) % 256)))))
              AS BIGINT) AS px_sum_sq
  FROM dims WHERE k = 1),
gif AS (
  SELECT media_id, 'gif' AS fmt, CAST(NULL AS BIGINT) AS n_px,
         CAST(NULL AS BIGINT) AS px_sum, CAST(NULL AS BIGINT) AS px_sum_sq
  FROM dims WHERE k = 2)
SELECT * FROM bmp UNION ALL SELECT * FROM png UNION ALL SELECT * FROM gif
"""


def q_jpeg_stats(spark, sf_dir):
    """The JPEG decoder under the oracle gate: pixel_stats entropy-
    decodes real baseline JPEGs (Huffman + IDCT) whose DC-only blocks
    follow a closed form — the oracle recomputes the exact cropped
    per-block pixel sums in SQL."""
    from .operators.multimodal import documents_as_jpeg, pixel_stats
    media = documents_as_jpeg(_docs(spark, sf_dir))
    return (pixel_stats(media)
            .select("media_id", "n_px", "px_sum", "px_sum_sq"))


_JPEG_STATS_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id,
         4 + n_chars % 60 AS w, 4 + (n_chars // 7) % 60 AS h
  FROM documents),
blocks AS (
  SELECT media_id, w, h,
         (w + 7) // 8 AS bw, (h + 7) // 8 AS bh
  FROM dims)
SELECT media_id,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(list_sum(list_transform(range(0, bh), by ->
              list_sum(list_transform(range(0, bw), bx ->
                ((17 * bx + 29 * by) % 256)
                * LEAST(8, w - 8 * bx) * LEAST(8, h - 8 * by)))))
            AS BIGINT) AS px_sum,
       CAST(list_sum(list_transform(range(0, bh), by ->
              list_sum(list_transform(range(0, bw), bx ->
                ((17 * bx + 29 * by) % 256)
                * ((17 * bx + 29 * by) % 256)
                * LEAST(8, w - 8 * bx) * LEAST(8, h - 8 * by)))))
            AS BIGINT) AS px_sum_sq
FROM blocks
"""


def q_weekly_trend(spark, sf_dir):
    """Week-over-week order revenue with percent change (lag window
    over a weekly DECIMAL-exact sum) — the period-over-period BI shape.
    FULL oracle; pct rounds to 6 dp, first week is null."""
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("week"))
              .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .alias("_rev")))
    from pyspark.sql import Window as W
    w = W.orderBy("week")
    # pct math in pure IEEE doubles — decimal division SCALE rules
    # differ between engines and flip the 6th dp
    rd = F.col("_rev").cast("double")
    prev = F.lag(rd).over(w)
    return (weekly.select(
        F.col("week").cast("date").alias("week"),
        rd.alias("revenue"),
        F.round((rd - prev) / prev * 100, 6).alias("wow_pct")))


_WEEKLY_TREND_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS week,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1)
SELECT CAST(week AS DATE) AS week, CAST(rev AS DOUBLE) AS revenue,
       round((CAST(rev AS DOUBLE)
              - lag(CAST(rev AS DOUBLE)) OVER (ORDER BY week))
             / lag(CAST(rev AS DOUBLE)) OVER (ORDER BY week) * 100, 6)
       AS wow_pct
FROM weekly
"""


def q_transition_entropy(spark, sf_dir):
    """Shannon entropy of each state's next-event distribution (how
    predictable a user's next action is, per current action).  FULL
    oracle: each -p·log2(p) term rounds to 9 dp DECIMAL before the sum,
    so the aggregation is order-free (the unigram_logprob discipline)."""
    from pyspark.sql import Window as W

    from .operators.relational import transition_matrix
    # reuse the sequencing/counting of transition_matrix so ordering
    # and tiebreak semantics cannot silently diverge from
    # q_event_transitions
    c = transition_matrix(_events(spark, sf_dir), "user_id", "ts",
                          "event_type", tiebreak="event_id") \
        .select("state", "cnt")
    tot = W.partitionBy("state")
    p = F.col("cnt") / F.sum("cnt").over(tot)
    term = F.round(-p * F.log2(p), 9).cast("decimal(18,9)")
    return (c.withColumn("__t", term)
            .groupBy("state")
            .agg(F.round(F.sum("__t").cast("double"), 6)
                 .alias("entropy_bits"),
                 F.count("*").alias("n_successors")))


_TRANSITION_ENTROPY_ORACLE = """
WITH seq AS (
  SELECT event_type AS state,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (SELECT state, nxt, COUNT(*) AS cnt
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT state,
             CAST(ROUND(-(cnt / SUM(cnt) OVER (PARTITION BY state))
                        * log2(cnt / SUM(cnt) OVER (PARTITION BY state)),
                        9) AS DECIMAL(18,9)) AS term
      FROM c)
SELECT state, round(CAST(SUM(term) AS DOUBLE), 6) AS entropy_bits,
       COUNT(*) AS n_successors
FROM t GROUP BY state
"""


def q_pmi_collocations(spark, sf_dir):
    """Top-20 collocations by pointwise mutual information over
    adjacent token pairs (min count 5, the classic collocation
    extractor).  FULL oracle: PMI = log2(N·c_xy/(c_x·c_y)) from exact
    integer counts — one deterministic double per pair."""
    docs = _docs(spark, sf_dir)
    # token array materialized once, bigrams via one zip_with pass —
    # an element_at lambda over the raw tokenizer expression
    # re-tokenizes per element (O(len²) per doc; see q_ngram_novelty)
    ws = docs.select(text.tokens(F.col("text")).alias("ws"))
    grams = F.zip_with(
        F.slice(F.col("ws"), 1,
                F.greatest(F.size("ws") - 1, F.lit(0))),
        F.slice(F.col("ws"), 2,
                F.greatest(F.size("ws") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("x"), b.alias("y")))
    pairs = (ws.select(F.explode(grams).alias("g"))
             .select("g.x", "g.y"))
    # everything derives from the ONE pair-count aggregate: the
    # unigram counts are its margins, N its total (empty-frame window,
    # the mixture_sample idiom) — the corpus tokenizes once (the cxy
    # exchange is identical in every branch, so ReusedExchange shares
    # it at runtime), and no eager count bakes work out of the plan
    from pyspark.sql import Window as W
    cxy = pairs.groupBy("x", "y").agg(F.count("*").alias("cxy"))
    uni = (cxy.select(F.col("x").alias("t"), F.col("cxy").alias("c"))
           .unionByName(cxy.select(F.col("y").alias("t"),
                                   F.col("cxy").alias("c")))
           .groupBy("t").agg(F.sum("c").alias("c")))
    scored = (cxy.withColumn("__n", F.sum("cxy").over(W.partitionBy()))
              .where(F.col("cxy") >= 5)
              .join(uni.select(F.col("t").alias("x"),
                               F.col("c").alias("cx")), "x")
              .join(uni.select(F.col("t").alias("y"),
                               F.col("c").alias("cy")), "y")
              .withColumn("pmi", F.round(F.log2(
                  F.col("__n").cast("double") * F.col("cxy")
                  / (F.col("cx") * F.col("cy"))), 6)))
    return (scored.select("x", "y", "cxy", "pmi")
            .orderBy(F.col("pmi").desc(), "x", "y").limit(20))


_PMI_ORACLE = """
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t != '') AS ws
  FROM documents),
pairs AS (
  SELECT ws[t.i] AS x, ws[t.i + 1] AS y
  FROM toks, UNNEST(range(1, len(ws))) AS t(i)),
cxy AS (SELECT x, y, COUNT(*) AS cxy FROM pairs GROUP BY 1, 2),
uni AS (SELECT t, COUNT(*) AS c FROM (
          SELECT x AS t FROM pairs UNION ALL SELECT y FROM pairs)
        GROUP BY 1),
n AS (SELECT COUNT(*) AS total FROM pairs)
SELECT x, y, cxy,
       round(log2(CAST((SELECT total FROM n) AS DOUBLE) * cxy
                  / (ux.c * uy.c)), 6) AS pmi
FROM cxy JOIN uni ux ON ux.t = x JOIN uni uy ON uy.t = y
WHERE cxy >= 5
ORDER BY pmi DESC, x, y LIMIT 20
"""


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer training: first 6 merge rules learned from the
    documents corpus (Sennrich et al. 2016).  FULL oracle: integer
    pair counts + lexicographic tie-break make every merge choice
    deterministic; the unrolled per-round CTE chain replays the
    identical count→argmax→rewrite loop."""
    from .operators.text import bpe_train
    return bpe_train(_docs(spark, sf_dir), rounds=6)


def q_bpe_tokenize(spark, sf_dir):
    """Train-then-apply: per-document token counts under the 6 learned
    BPE merges (the billed token count a real tokenizer reports).  FULL
    oracle: shared training CTEs + the identical replace chain."""
    from .operators.text import bpe_apply, bpe_train
    docs = _docs(spark, sf_dir)
    merges = [(r["lhs"], r["rhs"])
              for r in bpe_train(docs, rounds=6).collect()]
    return bpe_apply(docs, merges)


def _bpe_ctes(rounds: int = 6, source: str = "documents") -> str:
    """Unrolled BPE rounds: per round a pair-count aggregate over the
    word-frequency dict, a 1-row argmax (ORDER BY cnt DESC, pair), and
    the double-replace merge rewrite (both engines scan left-to-right
    non-overlapping, so the rewrites agree byte-for-byte).  Shared by
    the bpe_train / bpe_tokenize / fertility / pipeline-v3 oracles;
    ``source`` names the (possibly CTE-defined) corpus to train on."""
    parts = [f"""w0 AS MATERIALIZED (
  SELECT array_to_string(string_split(word, ''), ' ') AS seq, freq
  FROM (SELECT t.tok AS word, COUNT(*) AS freq
        FROM (SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x != '') AS ws FROM {source}),
             UNNEST(ws) AS t(tok)
        GROUP BY 1))"""]
    for r in range(1, rounds + 1):
        p = f"w{r-1}"
        parts.append(f"""p{r} AS (
  SELECT syms[i] || ' ' || syms[i+1] AS pair, SUM(freq) AS cnt
  FROM (SELECT string_split(seq, ' ') AS syms, freq FROM {p}),
       UNNEST(range(1, len(syms))) AS t(i)
  GROUP BY 1),
b{r} AS MATERIALIZED (SELECT pair, cnt FROM p{r}
                      ORDER BY cnt DESC, pair LIMIT 1),
w{r} AS MATERIALIZED (
  SELECT trim(replace(replace(' ' || seq || ' ',
           ' ' || (SELECT pair FROM b{r}) || ' ',
           ' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' '),
           ' ' || (SELECT pair FROM b{r}) || ' ',
           ' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ')) AS seq,
         freq
  FROM {p})""")
    return ",\n".join(parts)


def _bpe_train_oracle_sql(rounds: int = 6) -> str:
    sel = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, split_part(pair, ' ', 1) AS lhs, "
        f"split_part(pair, ' ', 2) AS rhs, CAST(cnt AS BIGINT) AS cnt "
        f"FROM b{r}"
        for r in range(1, rounds + 1))
    return "WITH " + _bpe_ctes(rounds) + "\n" + sel


def _bpe_tokenize_oracle_sql(rounds: int = 6) -> str:
    """Replays training (shared CTE chain) then the apply chain: the
    learned pairs land as row columns via a 1-row cross join (lambdas
    capture them), and each word encodes through the same double-replace
    sequence the engine compiles."""
    mrg = ", ".join(f"(SELECT pair FROM b{r}) AS p{r}"
                    for r in range(1, rounds + 1))
    seq = "' ' || array_to_string(string_split(w, ''), ' ') || ' '"
    for r in range(1, rounds + 1):
        pat = f"' ' || p{r} || ' '"
        rep = f"' ' || replace(p{r}, ' ', '') || ' '"
        seq = f"replace(replace({seq}, {pat}, {rep}), {pat}, {rep})"
    return "WITH " + _bpe_ctes(rounds) + f""",
mrg AS (SELECT {mrg})
SELECT doc_id,
       CAST(COALESCE(list_sum(list_transform(ws,
         w -> len(string_split(trim({seq}), ' ')))), 0) AS BIGINT)
       AS n_bpe_tokens
FROM (SELECT doc_id, list_filter(
        string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ws
      FROM documents), mrg"""


def q_zscore_anomaly(spark, sf_dir):
    """Hourly event-count anomaly detection: hours whose count sits
    more than 2 sample standard deviations from the global hourly
    mean.  FULL oracle: mean/std derive from exact BIGINT sums
    (sum n, sum n*n) so the z doubles are bit-identical on both
    engines; one groupBy + one unpartitioned window over the tiny
    hourly frame — the raw events never shuffle twice."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count("*").alias("n")))
    w = W.partitionBy()
    s = F.sum("n").over(w).cast("double")
    ss = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    c = F.count("*").over(w).cast("double")
    z = F.round((F.col("n") - s / c)
                / F.sqrt((ss - s * s / c) / (c - 1)), 6)
    return (hourly.withColumn("z", z)
            .where(F.abs(F.col("z")) > 2)
            .select("hour", "n", "z"))


_ZSCORE_ANOMALY_ORACLE = """
WITH h AS (SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
           FROM events GROUP BY 1),
g AS (SELECT hour, n,
             CAST(SUM(n) OVER () AS DOUBLE) AS s,
             CAST(SUM(n * n) OVER () AS DOUBLE) AS ss,
             CAST(COUNT(*) OVER () AS DOUBLE) AS c
      FROM h),
z AS (SELECT hour, n,
             round((n - s / c) / sqrt((ss - s * s / c) / (c - 1)), 6) AS z
      FROM g)
SELECT hour, n, z FROM z WHERE abs(z) > 2
"""


def q_autocorr_revenue(spark, sf_dir):
    """Lag-1 and lag-7 autocorrelation of daily order revenue (is
    yesterday / the same weekday last week predictive?).  FULL oracle:
    Pearson r computed in closed form from exact DECIMAL sums of the
    lagged pairs — doubles appear only in the final expression, so the
    result is deterministic on both engines."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").alias("rev")))
    w = W.orderBy("day")
    parts = []
    for lag in (1, 7):
        x, y = F.col("rev"), F.col("prev")
        pair = (daily.withColumn("prev", F.lag("rev", lag).over(w))
                .where(F.col("prev").isNotNull())
                .agg(F.count("*").cast("double").alias("c"),
                     F.sum(x).cast("double").alias("sx"),
                     F.sum(y).cast("double").alias("sy"),
                     F.sum((x * y).cast("decimal(38,4)"))
                     .cast("double").alias("sxy"),
                     F.sum((x * x).cast("decimal(38,4)"))
                     .cast("double").alias("sxx"),
                     F.sum((y * y).cast("decimal(38,4)"))
                     .cast("double").alias("syy"))
                .select(F.lit(lag).alias("lag"),
                        F.col("c").cast("bigint").alias("n_days"),
                        F.round((F.col("c") * F.col("sxy")
                                 - F.col("sx") * F.col("sy"))
                                / F.sqrt((F.col("c") * F.col("sxx")
                                          - F.col("sx") * F.col("sx"))
                                         * (F.col("c") * F.col("syy")
                                            - F.col("sy") * F.col("sy"))),
                                6).alias("autocorr")))
        parts.append(pair)
    return parts[0].unionByName(parts[1])


def _autocorr_oracle_sql() -> str:
    sels = []
    for lag in (1, 7):
        sels.append(f"""
SELECT {lag} AS lag, CAST(c AS BIGINT) AS n_days,
       round((c * sxy - sx * sy)
             / sqrt((c * sxx - sx * sx) * (c * syy - sy * sy)), 6)
       AS autocorr
FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS c,
             CAST(SUM(rev) AS DOUBLE) AS sx,
             CAST(SUM(prev) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rev * prev AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(prev * prev AS DECIMAL(38,4))) AS DOUBLE) AS syy
      FROM (SELECT rev, lag(rev, {lag}) OVER (ORDER BY day) AS prev
            FROM daily)
      WHERE prev IS NOT NULL)""")
    return ("""
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DECIMAL(18,2)) AS rev
               FROM orders GROUP BY 1)
""" + " UNION ALL ".join(sels))


def q_benford_digits(spark, sf_dir):
    """Benford's-law profile of order totals: observed leading-digit
    distribution vs the expected log10(1+1/d) — the classic fraud /
    data-quality screen.  FULL oracle: the leading digit comes from the
    exact integer cent value's string form (no cross-engine libm in
    the digit), counts are exact, and the two ratio doubles round at
    6 dp."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (o.where(F.col("o_totalprice") > 0)
              .groupBy(digit.alias("digit"))
              .agg(F.count("*").alias("n")))
    return (counts
            .withColumn("pct", F.round(F.col("n").cast("double")
                                       / F.sum("n").over(
                                           W.partitionBy()), 6))
            .withColumn("benford",
                        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6))
            .select("digit", "n", "pct", "benford"))


_BENFORD_ORACLE = """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         COUNT(*) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS pct,
       round(log10(1.0 + 1.0 / digit), 6) AS benford
FROM c
"""


def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: quartile-code every customer on
    Recency / Frequency / Monetary and count the cells — the marketing
    workhorse.  FULL oracle: each ntile(4) carries a custkey tiebreak
    so the quartile assignment is a total order, and the cell sums are
    DECIMAL-exact."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    per = (o.groupBy("o_custkey")
           .agg(F.max(F.col("o_orderdate").cast("date")).alias("r"),
                F.count("*").alias("f"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("m")))
    rq = F.ntile(4).over(W.orderBy("r", "o_custkey"))
    fq = F.ntile(4).over(W.orderBy("f", "o_custkey"))
    mq = F.ntile(4).over(W.orderBy("m", "o_custkey"))
    coded = per.select(
        F.concat(rq.cast("string"), fq.cast("string"),
                 mq.cast("string")).alias("segment"),
        F.col("m"))
    return (coded.groupBy("segment")
            .agg(F.count("*").alias("n_customers"),
                 F.sum("m").cast("double").alias("monetary")))


_RFM_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS r,
         COUNT(*) AS f,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS m
  FROM orders GROUP BY 1),
coded AS (
  SELECT CAST(ntile(4) OVER (ORDER BY r, o_custkey) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY f, o_custkey) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY m, o_custkey) AS VARCHAR)
         AS segment, m
  FROM per)
SELECT segment, COUNT(*) AS n_customers,
       CAST(SUM(m) AS DOUBLE) AS monetary
FROM coded GROUP BY segment
"""


def q_activity_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands shape (row_number date-offset anchor).  FULL
    oracle: pure integer/date arithmetic, no doubles at all."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    days = (ev.select("user_id", F.col("ts").cast("date").alias("day"))
            .distinct())
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("day"))
    anchored = days.withColumn("anchor", F.date_sub(F.col("day"), rn))
    streaks = (anchored.groupBy("user_id", "anchor")
               .agg(F.count("*").alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").alias("longest"),
                 F.count("*").alias("n_streaks"),
                 F.sum("len").alias("active_days")))


_STREAKS_ORACLE = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
              FROM events),
anchored AS (
  SELECT user_id,
         day - CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY day) AS INTEGER)
         AS anchor
  FROM days),
streaks AS (SELECT user_id, anchor, COUNT(*) AS len
            FROM anchored GROUP BY 1, 2)
SELECT user_id, MAX(len) AS longest, COUNT(*) AS n_streaks,
       SUM(len) AS active_days
FROM streaks GROUP BY user_id
"""


def q_decile_share(spark, sf_dir):
    """Revenue concentration: share of total revenue captured by each
    customer decile (the Lorenz-curve table).  FULL oracle: ntile(10)
    with custkey tiebreak, DECIMAL-exact decile sums, one ratio
    double rounded at 6 dp."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    per = (o.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("rev")))
    d = per.withColumn(
        "decile", F.ntile(10).over(W.orderBy("rev", "o_custkey")))
    by = (d.groupBy("decile")
          .agg(F.count("*").alias("n_customers"),
               F.sum("rev").cast("decimal(28,2)").alias("_drev")))
    tot = F.sum("_drev").over(W.partitionBy())
    return (by.select(
        "decile", "n_customers",
        F.col("_drev").cast("double").alias("revenue"),
        F.round(F.col("_drev").cast("double") / tot.cast("double"), 6)
        .alias("share")))


_DECILE_SHARE_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1),
d AS (SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM per),
by_d AS (SELECT decile, COUNT(*) AS n_customers,
                CAST(SUM(rev) AS DECIMAL(28,2)) AS drev
         FROM d GROUP BY 1)
SELECT decile, n_customers, CAST(drev AS DOUBLE) AS revenue,
       round(CAST(drev AS DOUBLE)
             / CAST(SUM(drev) OVER () AS DOUBLE), 6) AS share
FROM by_d
"""


def q_gini_revenue(spark, sf_dir):
    """Gini coefficient of customer revenue — the single-number
    inequality summary (G = sum((2i-n-1)·x_i) / (n·sum(x)) over the
    value-sorted series).  FULL oracle: rank and both sums are exact
    (BIGINT × DECIMAL), one closed-form double at the end; the
    custkey tiebreak fixes i, and ties in x cannot change the sum."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    per = (o.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("rev")))
    ranked = per.withColumn(
        "i", F.row_number().over(W.orderBy("rev", "o_custkey"))
        .cast("bigint"))
    agg = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum((F.col("i") * F.col("rev")).cast("decimal(38,2)"))
        .cast("double").alias("sir"),
        F.sum("rev").cast("double").alias("sr"))
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round((2.0 * F.col("sir") - (F.col("n") + 1) * F.col("sr"))
                / (F.col("n") * F.col("sr")), 6).alias("gini"))


_GINI_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1),
ranked AS (
  SELECT rev,
         CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT)
         AS i
  FROM per),
a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(i * rev AS DECIMAL(38,2))) AS DOUBLE) AS sir,
             CAST(SUM(rev) AS DOUBLE) AS sr
      FROM ranked)
SELECT CAST(n AS BIGINT) AS n_customers,
       round((2.0 * sir - (n + 1) * sr) / (n * sr), 6) AS gini
FROM a
"""


def q_fingerprint_dups(spark, sf_dir):
    """Token-sort fingerprint canonicalization (record-linkage
    standard): part names that collapse to the same sorted-token key —
    catches exact and word-reordered duplicates.  FULL oracle: pure
    string ops + integer counts."""
    p = load_tables(spark, sf_dir)["part"]
    fp = F.array_join(F.array_sort(F.split(F.col("p_name"), " ")), " ")
    return (p.groupBy(fp.alias("fingerprint"))
            .agg(F.count("*").alias("n_parts"),
                 F.countDistinct("p_name").alias("n_names"))
            .where(F.col("n_parts") > 1))


_FINGERPRINT_DUPS_ORACLE = """
SELECT array_to_string(list_sort(string_split(p_name, ' ')), ' ')
       AS fingerprint,
       COUNT(*) AS n_parts,
       COUNT(DISTINCT p_name) AS n_names
FROM part GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_fuzzy_name_pairs(spark, sf_dir):
    """Blocked fuzzy record linkage: part-name pairs within edit
    distance 2, candidate pairs restricted to a shared last-token
    block (the noun) so the comparison never goes all-pairs — the
    standard blocking+verify shape that scales where naive O(n²)
    cannot.  FULL oracle: levenshtein is the same DP in both engines;
    top-50 carries a full key tiebreak."""
    p = (load_tables(spark, sf_dir)["part"]
         .select("p_partkey", "p_name",
                 F.element_at(F.split(F.col("p_name"), " "), -1)
                 .alias("block")))
    a, b = p.alias("a"), p.alias("b")
    pairs = (a.join(b, (F.col("a.block") == F.col("b.block"))
                    & (F.col("a.p_partkey") < F.col("b.p_partkey")))
             .select(F.col("a.p_partkey").alias("k1"),
                     F.col("b.p_partkey").alias("k2"),
                     F.col("a.p_name").alias("name1"),
                     F.col("b.p_name").alias("name2"),
                     F.levenshtein("a.p_name", "b.p_name").alias("dist"))
             .where((F.col("dist") > 0) & (F.col("dist") <= 2)))
    return pairs.orderBy("dist", "k1", "k2").limit(50)


_FUZZY_NAME_ORACLE = """
WITH t AS (SELECT p_partkey, p_name,
                  string_split(p_name, ' ')[-1] AS block
           FROM part)
SELECT a.p_partkey AS k1, b.p_partkey AS k2,
       a.p_name AS name1, b.p_name AS name2,
       levenshtein(a.p_name, b.p_name) AS dist
FROM t a JOIN t b
  ON a.block = b.block AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
ORDER BY dist, k1, k2 LIMIT 50
"""


def q_lexical_diversity(spark, sf_dir):
    """Per-document lexical diversity: type-token ratio and hapax
    ratio (vocab-richness quality signals for corpus filtering).
    FULL oracle: exact integer counts, ratios round at 6 dp; the
    per-doc token-frequency map never shuffles (doc_id is the group
    key end-to-end)."""
    docs = _docs(spark, sf_dir)
    toks = (docs.select("doc_id", F.explode(text.tokens(F.col("text")))
                        .alias("tok")))
    freq = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (freq.groupBy("doc_id")
            .agg(F.sum("c").alias("n_tokens"),
                 F.count("*").alias("n_types"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                 .alias("n_hapax"))
            .select("doc_id", "n_tokens",
                    F.round(F.col("n_types").cast("double")
                            / F.col("n_tokens"), 6).alias("ttr"),
                    F.round(F.col("n_hapax").cast("double")
                            / F.col("n_tokens"), 6).alias("hapax_ratio")))


_LEXICAL_DIVERSITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
    AS tok
  FROM documents),
freq AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
SELECT doc_id, SUM(c) AS n_tokens,
       round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
       round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS hapax_ratio
FROM freq GROUP BY doc_id
"""


def q_zipf_slope(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary: least-squares slope
    of ln(freq) on ln(rank) for tokens with freq ≥ 2 — the classic
    naturalness check on a training corpus.  FULL oracle: each ln term
    rounds to 9 dp DECIMAL before the sums (order-free, libm-proof),
    slope/intercept emerge from one closed-form double."""
    from pyspark.sql import Window as W
    docs = _docs(spark, sf_dir)
    freq = (docs.select(F.explode(text.tokens(F.col("text")))
                        .alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("c"))
            .where(F.col("c") >= 2))
    ranked = freq.withColumn(
        "r", F.row_number().over(W.orderBy(F.col("c").desc(), "tok")))
    x = F.round(F.log(F.col("r").cast("double")), 9) \
        .cast("decimal(18,9)")
    y = F.round(F.log(F.col("c").cast("double")), 9) \
        .cast("decimal(18,9)")
    terms = ranked.select(
        x.alias("x"), y.alias("y"),
        (x * y).cast("decimal(38,18)").alias("xy"),
        (x * x).cast("decimal(38,18)").alias("xx"))
    agg = terms.agg(F.count("*").cast("double").alias("n"),
                    F.sum("x").cast("double").alias("sx"),
                    F.sum("y").cast("double").alias("sy"),
                    F.sum("xy").cast("double").alias("sxy"),
                    F.sum("xx").cast("double").alias("sxx"))
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return agg.select(
        F.col("n").cast("bigint").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("intercept"))


_ZIPF_ORACLE = """
WITH freq AS (
  SELECT tok, COUNT(*) AS c FROM (
    SELECT unnest(list_filter(
      string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != ''))
      AS tok
    FROM documents)
  GROUP BY 1 HAVING COUNT(*) >= 2),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM freq),
t AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM ranked),
a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
      FROM t)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept
FROM a
"""


def q_mad_outliers(spark, sf_dir):
    """Robust per-nation outlier screen on customer balances: median /
    MAD and the count beyond 3 MADs (the robust z-score).  FULL
    oracle: both engines use linearly-interpolated exact percentiles;
    outputs round at 6 dp."""
    cust = load_tables(spark, sf_dir)["customer"]
    med = (cust.groupBy("c_nationkey")
           .agg(F.expr("percentile(c_acctbal, 0.5)").alias("med")))
    dev = (cust.join(med, "c_nationkey")
           .withColumn("adev", F.abs(F.col("c_acctbal") - F.col("med"))))
    mad2 = (dev.groupBy("c_nationkey")
            .agg(F.expr("percentile(adev, 0.5)").alias("mad")))
    out = (dev.join(mad2, "c_nationkey")
           .groupBy("c_nationkey")
           .agg(F.count("*").alias("n_customers"),
                F.round(F.first("med"), 6).alias("med"),
                F.round(F.first("mad"), 6).alias("mad"),
                F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1)
                      .otherwise(0)).alias("n_outliers")))
    return out


_MAD_ORACLE = """
WITH med AS (SELECT c_nationkey, quantile_cont(c_acctbal, 0.5) AS med
             FROM customer GROUP BY 1),
dev AS (SELECT c.c_nationkey, med,
               abs(c_acctbal - med) AS adev
        FROM customer c JOIN med USING (c_nationkey)),
mad AS (SELECT c_nationkey, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1)
SELECT c_nationkey, COUNT(*) AS n_customers,
       round(any_value(med), 6) AS med,
       round(any_value(d.mad), 6) AS mad,
       SUM(CASE WHEN adev > 3 * d.mad THEN 1 ELSE 0 END) AS n_outliers
FROM dev JOIN mad d USING (c_nationkey)
GROUP BY c_nationkey
"""


def q_scd2_intervals(spark, sf_dir):
    """Type-2 slowly-changing-dimension build: collapse each user's
    event stream into validity intervals of consecutive equal states
    (run-length islands via change-flag cumsum).  FULL oracle: pure
    integer/timestamp arithmetic under a (ts, event_id) total order."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1).otherwise(0)
    grp = F.sum(chg).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow))
    runs = ev.select("user_id", "event_type", "ts",
                     grp.alias("grp"))
    return (runs.groupBy("user_id", "grp")
            .agg(F.min("event_type").alias("state"),
                 F.min("ts").alias("valid_from"),
                 F.max("ts").alias("valid_to"),
                 F.count("*").alias("n_events"))
            .select("user_id", "grp", "state", "valid_from",
                    "valid_to", "n_events"))


_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR event_type != lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged)
SELECT user_id, grp, MIN(event_type) AS state,
       MIN(ts) AS valid_from, MAX(ts) AS valid_to,
       COUNT(*) AS n_events
FROM runs GROUP BY user_id, grp
"""


def q_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: every purchase credited to
    the user's most recent prior click/view ('direct' when none) —
    the carry-forward last_value(IGNORE NULLS) idiom.  FULL oracle:
    (ts, event_id) total order; value sums are DECIMAL-exact."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    marker = F.when(F.col("event_type").isin("click", "view"),
                    F.col("event_type"))
    ch = F.last(marker, ignorenulls=True).over(w)
    purchases = (ev.withColumn("channel", ch)
                 .where(F.col("event_type") == "purchase"))
    return (purchases
            .groupBy(F.coalesce("channel", F.lit("direct"))
                     .alias("channel"))
            .agg(F.count("*").alias("n_purchases"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("total_value")))


_ATTRIBUTION_ORACLE = """
WITH marked AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS channel
  FROM events)
SELECT COALESCE(channel, 'direct') AS channel,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM marked WHERE event_type = 'purchase'
GROUP BY 1
"""


def q_rolling_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct active users per day (the DAU/WAU
    shape).  Distinct-count-over-range-window isn't a window function
    in either engine; the scalable form is a broadcast join of the
    dim-sized day grid onto the distinct (day, user) pairs.  FULL
    oracle: exact integers."""
    ev = _events(spark, sf_dir)
    du = (ev.select(F.col("ts").cast("date").alias("day"), "user_id")
          .distinct())
    days = du.select("day").distinct() \
        .select(F.col("day").alias("as_of"))
    j = du.join(F.broadcast(days),
                (F.col("day") <= F.col("as_of"))
                & (F.col("day") >= F.date_sub(F.col("as_of"), 6)))
    return (j.groupBy("as_of")
            .agg(F.countDistinct("user_id").alias("wau")))


_ROLLING_DISTINCT_ORACLE = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events),
days AS (SELECT DISTINCT day AS as_of FROM du)
SELECT as_of, COUNT(DISTINCT user_id) AS wau
FROM du JOIN days
  ON du.day <= as_of AND du.day >= as_of - 6
GROUP BY as_of
"""


def q_skyline_parts(spark, sf_dir):
    """2-D skyline (Pareto frontier): parts not dominated on
    (price ↓, size ↑).  The naive form is O(n²); this is the
    O(n log n) shape — a 50-row per-size min-price table with a
    strictly-greater cumulative min, broadcast back onto parts — so
    the fact table never self-joins.  FULL oracle: integer sizes,
    exact double price comparisons."""
    from pyspark.sql import Window as W
    p = load_tables(spark, sf_dir)["part"]
    sz = (p.groupBy("p_size")
          .agg(F.min("p_retailprice").alias("minp")))
    wd = W.orderBy(F.col("p_size").desc()) \
        .rowsBetween(W.unboundedPreceding, -1)
    sz = sz.withColumn("min_gt", F.min("minp").over(wd))
    keep = p.join(F.broadcast(sz), "p_size").where(
        (F.col("min_gt").isNull()
         | (F.col("p_retailprice") < F.col("min_gt")))
        & (F.col("p_retailprice") == F.col("minp")))
    return keep.select("p_partkey", "p_name", "p_size",
                       "p_retailprice")


_SKYLINE_ORACLE = """
WITH sz AS (
  SELECT p_size, MIN(p_retailprice) AS minp,
         MIN(MIN(p_retailprice))
           OVER (ORDER BY p_size DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS min_gt
  FROM part GROUP BY p_size)
SELECT p_partkey, p_name, p.p_size, p_retailprice
FROM part p JOIN sz ON p.p_size = sz.p_size
WHERE (min_gt IS NULL OR p_retailprice < min_gt)
  AND p_retailprice = minp
"""


def q_ngram_novelty(spark, sf_dir):
    """Per-document novelty: fraction of its distinct 3-grams first
    introduced by this document (global first-occurrence = min doc_id
    per gram) — the redundancy-growth curve of a crawl.  FULL oracle:
    exact integer counts, ratio rounds at 6 dp."""
    docs = _docs(spark, sf_dir)
    # materialize the token array ONCE: referencing the tokenizer
    # expression inside a higher-order-function lambda re-evaluates the
    # full lower+regex split per element (O(len²) per doc — measured
    # 70× slower at sf0.1); zip_with over the materialized array is
    # one O(len) pass
    ws = docs.select("doc_id", text.tokens(F.col("text")).alias("ws"))
    grams = F.zip_with(
        F.slice(F.col("ws"), 1,
                F.greatest(F.size("ws") - 2, F.lit(0))),
        F.zip_with(
            F.slice(F.col("ws"), 2,
                    F.greatest(F.size("ws") - 2, F.lit(0))),
            F.slice(F.col("ws"), 3,
                    F.greatest(F.size("ws") - 2, F.lit(0))),
            lambda b, c: F.concat_ws(" ", b, c)),
        lambda a, bc: F.concat_ws(" ", a, bc))
    # within-doc dedup happens row-locally (array_distinct) so the
    # exploded (doc, gram) pairs are already distinct — no dedup
    # shuffle; first-occurrence via a window on g reuses the single
    # gram exchange instead of an agg+join pair: 2 shuffles end-to-end
    from pyspark.sql import Window as W
    dg = ws.select("doc_id",
                   F.explode(F.array_distinct(grams)).alias("g"))
    first = F.min("doc_id").over(W.partitionBy("g"))
    return (dg.withColumn("first_doc", first)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(F.when(F.col("first_doc") == F.col("doc_id"),
                              1).otherwise(0)).alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel").cast("double")
                                / F.col("n_grams"), 6)))


_NGRAM_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '') AS ws
  FROM documents),
dg AS (
  SELECT DISTINCT doc_id,
         ws[t.i] || ' ' || ws[t.i + 1] || ' ' || ws[t.i + 2] AS g
  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM dg GROUP BY g)
SELECT doc_id, COUNT(*) AS n_grams,
       SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS n_novel,
       round(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty
FROM dg JOIN first USING (g)
GROUP BY doc_id
"""


def q_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: BM25 text ranking fused with cosine vector
    ranking by Reciprocal Rank Fusion (score = Σ 1/(60+rank), the
    Cormack et al. standard) over the shared doc/vec id space.  FULL
    oracle: RRF uses only ranks, both underlying rankings are already
    oracle-proven deterministic (bm25_rank, knn_cosine), and the two
    1/(60+r) terms are exact-input doubles."""
    from pyspark.sql import Window as W

    from .fts import bm25_scores, build_tf_index
    g = tpch_graph(spark, sf_dir)
    docs = g.nodes_df.where(F.col("kind") == "Document")
    idx = build_tf_index(docs, ["text"])
    bm = (bm25_scores(idx, ["data", "query"])
          .withColumn("r_text", F.row_number().over(
              W.orderBy(F.col("score").desc(), "uid")))
          .where(F.col("r_text") <= 50)
          .select(F.regexp_extract("uid", r"(\d+)$", 1)
                  .cast("bigint").alias("id"), "r_text"))
    emb = _emb(spark, sf_dir)
    qv = list(emb.where(F.col("vec_id") == 0)
              .select("embedding").collect()[0][0])
    cos = (similarity.cosine_topk(emb, qv, k=50, exclude_ids=[0])
           .withColumn("r_vec", F.row_number().over(
               W.orderBy(F.col("cosine").desc(), "vec_id")))
           .select(F.col("vec_id").alias("id"), "r_vec"))
    return (bm.join(cos, "id", "outer")
            .withColumn("rrf", F.round(
                F.coalesce(1.0 / (60 + F.col("r_text")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("r_vec")), F.lit(0.0)),
                9))
            .orderBy(F.col("rrf").desc(), "id").limit(10)
            .select("id", "r_text", "r_vec", "rrf"))


_RRF_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
docs AS (SELECT doc_id, len(ws) AS dl FROM toks WHERE len(ws) > 0),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
tf AS (
  SELECT toks.doc_id, u.tok AS term, COUNT(*) AS tf
  FROM toks, UNNEST(ws) AS u(tok)
  WHERE u.tok IN ('data','query')
  GROUP BY toks.doc_id, u.tok),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, 'Document:' || CAST(tf.doc_id AS VARCHAR) AS uid,
         SUM( ln((s.n - d.df + 0.5)/(d.df + 0.5) + 1.0)
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * docs.dl / s.avgdl))
            ) AS score
  FROM tf JOIN dfreq d USING (term)
       JOIN docs ON docs.doc_id = tf.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id),
tr AS (
  SELECT doc_id AS id, r_text FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, uid) AS r_text
    FROM scored) WHERE r_text <= 50),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cscored AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
         i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
         i -> CAST(e.embedding[i] AS DOUBLE)
            * CAST(e.embedding[i] AS DOUBLE)))))
    AS cos
  FROM embeddings e, q WHERE e.vec_id != 0),
cr AS (
  SELECT vec_id AS id, r_vec FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cos DESC, vec_id) AS r_vec
    FROM cscored) WHERE r_vec <= 50)
SELECT COALESCE(tr.id, cr.id) AS id, r_text, r_vec,
       round(COALESCE(1.0/(60 + r_text), 0.0)
             + COALESCE(1.0/(60 + r_vec), 0.0), 9) AS rrf
FROM tr FULL JOIN cr ON tr.id = cr.id
ORDER BY rrf DESC, id LIMIT 10
"""


def q_mmr_select(spark, sf_dir):
    """MMR diverse top-8 for vec_id=0: distributed cosine prune to a
    24-candidate pool, then the greedy λ·relevance − (1−λ)·redundancy
    selection (two-stage retrieval; pool is constant-sized so the
    rerank tier is O(pool²·dim) regardless of corpus size).  FULL
    oracle: the greedy loop unrolls to one CTE per pick; every cosine
    is the same left-to-right fold on both sides."""
    emb = _emb(spark, sf_dir)
    qv = list(emb.where(F.col("vec_id") == 0)
              .select("embedding").collect()[0][0])
    sel = similarity.mmr_rerank(emb, qv, k=8, pool=24, lam=0.7,
                                exclude_ids=[0])
    rows = [(rank, int(i), round(score, 6), round(c0, 6))
            for rank, i, score, c0 in sel]
    return spark.createDataFrame(
        rows, "rank int, vec_id bigint, mmr double, cos0 double")


def _mmr_oracle_sql(k: int = 8, pool: int = 24, lam: float = 0.7) -> str:
    """DuckDB replay of q_mmr_select: candidate pool + pairwise-cosine
    CTE, then one (max-sim, argmax) CTE pair per greedy round — the
    same unrolled-loop idiom as the ivf/pagerank oracles.  λ and 1−λ
    are emitted as exact double reprs so the score arithmetic is
    bit-identical to the engine's Python floats."""
    la, ula = repr(float(lam)), repr(1.0 - float(lam))
    parts = [f"""
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id = 0),
c0 AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings WHERE vec_id != 0),
scored AS (
  SELECT e.vec_id, e.v,
    list_sum(list_transform(range(1, len(e.v)+1),
                            i -> e.v[i] * q.qe[i]))
    / (sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
                                    i -> q.qe[i] * q.qe[i])))
     * sqrt(list_sum(list_transform(range(1, len(e.v)+1),
                                    i -> e.v[i] * e.v[i])))) AS cos0
  FROM c0 e, q),
cand AS MATERIALIZED (
  SELECT vec_id, v, cos0 FROM scored
  ORDER BY cos0 DESC, vec_id LIMIT {pool}),
pc AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
    list_sum(list_transform(range(1, len(a.v)+1),
                            i -> a.v[i] * b.v[i]))
    / (sqrt(list_sum(list_transform(range(1, len(a.v)+1),
                                    i -> a.v[i] * a.v[i])))
     * sqrt(list_sum(list_transform(range(1, len(b.v)+1),
                                    i -> b.v[i] * b.v[i])))) AS cs
  FROM cand a, cand b WHERE a.vec_id != b.vec_id),
ms1 AS (SELECT vec_id, cos0, CAST(0.0 AS DOUBLE) AS ms FROM cand),
s1 AS MATERIALIZED (
  SELECT vec_id, {la} * cos0 - {ula} * ms AS score, cos0 FROM ms1
  ORDER BY score DESC, vec_id LIMIT 1)"""]
    for r in range(2, k + 1):
        excl = " AND ".join(
            f"m.vec_id != (SELECT vec_id FROM s{j})" for j in range(1, r))
        parts.append(f""",
ms{r} AS (
  SELECT m.vec_id, m.cos0, GREATEST(m.ms, pc.cs) AS ms
  FROM ms{r - 1} m
  JOIN pc ON pc.ia = m.vec_id
         AND pc.ib = (SELECT vec_id FROM s{r - 1})
  WHERE {excl}),
s{r} AS MATERIALIZED (
  SELECT vec_id, {la} * cos0 - {ula} * ms AS score, cos0 FROM ms{r}
  ORDER BY score DESC, vec_id LIMIT 1)""")
    sels = " UNION ALL ".join(
        f"SELECT {r} AS rank, vec_id, round(score, 6) AS mmr, "
        f"round(cos0, 6) AS cos0 FROM s{r}" for r in range(1, k + 1))
    parts.append("\n" + sels)
    return "".join(parts)


def q_silhouette_kmeans(spark, sf_dir):
    """Cluster-quality audit: simplified (centroid-based) silhouette
    per k-means cluster — a = distance to own centroid, b = distance
    to the nearest other centroid, s = (b−a)/b.  FULL oracle: reuses
    the reproducible IVF centroid trajectory (unrolled Lloyd CTEs);
    per-point terms round to 9 dp DECIMAL so the cluster means are
    order-free."""
    from pyspark.sql import Window as W
    emb = _emb(spark, sf_dir)
    _indexed, cents = similarity.ivf_index(emb, k=8, iters=2)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "c int, cent array<double>")
    d2 = F.aggregate(
        F.zip_with(F.col("cent"), F.col("embedding"),
                   lambda c, x: (c - x.cast("double"))
                   * (c - x.cast("double"))),
        F.lit(0.0), lambda a, v: a + v)
    j = (emb.crossJoin(F.broadcast(cdf))
         .select("vec_id", "c", d2.alias("d2")))
    w = W.partitionBy("vec_id").orderBy("d2", "c")
    r = j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    piv = (r.groupBy("vec_id")
           .agg(F.min(F.when(F.col("rn") == 1, F.col("c")))
                .alias("cluster"),
                F.min(F.when(F.col("rn") == 1, F.sqrt("d2"))).alias("a"),
                F.min(F.when(F.col("rn") == 2, F.sqrt("d2"))).alias("b")))
    s = F.when(F.col("b") > 0,
               (F.col("b") - F.col("a")) / F.col("b")).otherwise(F.lit(0.0))
    t = F.round(s, 9).cast("decimal(18,9)")
    return (piv.select("cluster", t.alias("t"))
            .groupBy("cluster")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("t").cast("double") / F.count("*"), 6)
                 .alias("avg_silhouette")))


def _silhouette_oracle_sql(k: int = 8, iters: int = 2) -> str:
    dist = ("list_sum(list_transform(range(1, len(e.embedding)+1), "
            "i -> (c2.cent[i] - CAST(e.embedding[i] AS DOUBLE)) * "
            "(c2.cent[i] - CAST(e.embedding[i] AS DOUBLE))))")
    return _ivf_ctes(k, iters) + f""",
d AS (SELECT e.vec_id, c2.c, {dist} AS d2 FROM e, c2),
r AS (SELECT vec_id, c, d2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2, c) AS rn
      FROM d),
piv AS (SELECT vec_id,
               MIN(CASE WHEN rn = 1 THEN c END) AS cluster,
               MIN(CASE WHEN rn = 1 THEN sqrt(d2) END) AS a,
               MIN(CASE WHEN rn = 2 THEN sqrt(d2) END) AS b
        FROM r WHERE rn <= 2 GROUP BY vec_id),
t AS (SELECT cluster,
             CAST(round(CASE WHEN b > 0 THEN (b - a) / b
                             ELSE 0.0 END, 9) AS DECIMAL(18,9)) AS t
      FROM piv)
SELECT cluster, COUNT(*) AS n,
       round(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS avg_silhouette
FROM t GROUP BY cluster"""


def q_new_vs_returning(spark, sf_dir):
    """Monthly buyer mix: orders split into first-ever-order customers
    vs returning ones (the growth-accounting staple).  FULL oracle:
    first-order month per customer via a min aggregate broadcast back;
    revenue DECIMAL-exact."""
    o = load_tables(spark, sf_dir)["orders"]
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    firsts = (o.groupBy("o_custkey")
              .agg(F.date_trunc("month", F.min("o_orderdate"))
                   .cast("date").alias("first_month")))
    return (o.join(F.broadcast(firsts), "o_custkey")
            .withColumn("month", month)
            .withColumn("buyer_type",
                        F.when(F.col("month") == F.col("first_month"),
                               "new").otherwise("returning"))
            .groupBy("month", "buyer_type")
            .agg(F.countDistinct("o_custkey").alias("n_buyers"),
                 F.count("*").alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("revenue")))


_NEW_VS_RETURNING_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
         AS first_month
  FROM orders GROUP BY 1)
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CASE WHEN CAST(date_trunc('month', o_orderdate) AS DATE)
                 = first_month
            THEN 'new' ELSE 'returning' END AS buyer_type,
       COUNT(DISTINCT o_custkey) AS n_buyers,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       AS revenue
FROM orders JOIN firsts USING (o_custkey)
GROUP BY 1, 2
"""


def q_cohort_ltv(spark, sf_dir):
    """Cumulative lifetime value per acquisition cohort: revenue by
    (first-order month, months-since-acquisition), accumulated along
    the age axis — the LTV curve behind payback analysis.  FULL
    oracle: month offsets are integer-exact; the cumulative sum runs
    over DECIMAL cell totals before the final double cast."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    firsts = (o.groupBy("o_custkey")
              .agg(F.date_trunc("month", F.min("o_orderdate"))
                   .cast("date").alias("cohort")))
    cells = (o.join(F.broadcast(firsts), "o_custkey")
             .select("cohort",
                     F.months_between(
                         F.date_trunc("month", F.col("o_orderdate")),
                         F.col("cohort")).cast("int").alias("age"),
                     F.col("o_totalprice").cast("decimal(18,2)")
                     .alias("rev"))
             .groupBy("cohort", "age")
             .agg(F.count("*").alias("n_orders"),
                  F.sum("rev").cast("decimal(28,2)").alias("_rev")))
    w = (W.partitionBy("cohort").orderBy("age")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (cells.select(
        F.col("cohort").cast("string").alias("cohort"), "age",
        "n_orders",
        F.col("_rev").cast("double").alias("revenue"),
        F.sum("_rev").over(w).cast("double").alias("cum_ltv")))


_COHORT_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort
  FROM orders GROUP BY 1),
cells AS (
  SELECT cohort,
         CAST(datediff('month', CAST(cohort AS TIMESTAMP),
                       date_trunc('month', o_orderdate)) AS INTEGER)
         AS age,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM orders JOIN firsts USING (o_custkey)
  GROUP BY 1, 2)
SELECT CAST(cohort AS VARCHAR) AS cohort, age, n_orders,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
       AS cum_ltv
FROM cells
"""


def q_churn_screen(spark, sf_dir):
    """Churn screen by nation: customers whose last order predates the
    dataset horizon by more than 90 days, with the nation's churn
    rate.  FULL oracle: date arithmetic on exact timestamps, one
    global-max scalar broadcast."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    last = (o.groupBy("o_custkey")
            .agg(F.max(F.col("o_orderdate").cast("date")).alias("last_order")))
    horizon = F.max("last_order").over(W.partitionBy())
    flagged = (last.withColumn(
        "churned",
        F.when(F.datediff(horizon, F.col("last_order")) > 90, 1)
        .otherwise(0)))
    return (flagged.join(c, flagged.o_custkey == c.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_buyers"),
                 F.sum("churned").alias("n_churned"),
                 F.round(F.sum("churned").cast("double")
                         / F.count("*"), 6).alias("churn_rate")))


_CHURN_ORACLE = """
WITH last AS (
  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_order
  FROM orders GROUP BY 1),
flagged AS (
  SELECT o_custkey,
         CASE WHEN datediff('day', last_order, MAX(last_order) OVER ())
                   > 90
              THEN 1 ELSE 0 END AS churned
  FROM last)
SELECT c_nationkey, COUNT(*) AS n_buyers,
       SUM(churned) AS n_churned,
       round(CAST(SUM(churned) AS DOUBLE) / COUNT(*), 6) AS churn_rate
FROM flagged JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def q_seq_copurchase(spark, sf_dir):
    """Sequential pattern mining (order-2): part pairs where a
    customer's later order contains the consequent after an earlier
    order contained the antecedent — top-20 directed sequences.  The
    per-customer purchase lists are capped by the same pair-explosion
    guard as the basket queries (order timelines are short in TPC-H;
    a power-law customer would be dropped, not exploded).  FULL
    oracle: exact integer support counts, full key tiebreak."""
    t = load_tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    purch = (li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                     li.l_orderkey == o.o_orderkey)
             .select("o_custkey", "o_orderdate", "l_partkey")
             .distinct())
    sizes = (purch.groupBy("o_custkey")
             .agg(F.count("*").alias("__n")))
    purch = (purch.join(sizes.where(F.col("__n") <= 256)
                        .select("o_custkey"), "o_custkey"))
    a, b = purch.alias("a"), purch.alias("b")
    seq = (a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
                  & (F.col("a.o_orderdate") < F.col("b.o_orderdate"))
                  & (F.col("a.l_partkey") != F.col("b.l_partkey")))
           .select(F.col("a.o_custkey").alias("cust"),
                   F.col("a.l_partkey").alias("p1"),
                   F.col("b.l_partkey").alias("p2"))
           .distinct())
    return (seq.groupBy("p1", "p2")
            .agg(F.count("*").alias("support"))
            .orderBy(F.col("support").desc(), "p1", "p2").limit(20))


_SEQ_COPURCHASE_ORACLE = """
WITH purch0 AS (
  SELECT DISTINCT o_custkey, o_orderdate, l_partkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
purch AS (
  SELECT * FROM purch0
  WHERE o_custkey IN (SELECT o_custkey FROM purch0
                      GROUP BY o_custkey HAVING COUNT(*) <= 256)),
seq AS (
  SELECT DISTINCT a.o_custkey AS cust, a.l_partkey AS p1,
                  b.l_partkey AS p2
  FROM purch a JOIN purch b
    ON a.o_custkey = b.o_custkey
   AND a.o_orderdate < b.o_orderdate
   AND a.l_partkey != b.l_partkey)
SELECT p1, p2, COUNT(*) AS support
FROM seq GROUP BY p1, p2
ORDER BY support DESC, p1, p2 LIMIT 20
"""


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k) of the part co-purchase graph: edge
    density among nodes of degree > k, for a ladder of thresholds —
    do high-degree parts preferentially co-occur?  FULL oracle: exact
    integer N_k/E_k, one ratio double.  The pair graph is the
    capped/oriented co-purchase projection (deg table is
    node-dimension-sized and broadcasts onto the edges)."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").alias("u"),
                     F.col("b.l_partkey").alias("v"))
             .distinct())
    deg = (edges.select(F.col("u").alias("n"))
           .unionByName(edges.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count("*").alias("d")))
    ks = spark.range(1, 7).select(
        F.expr("shiftleft(1, cast(id as int))").alias("k"))
    nk = (deg.crossJoin(F.broadcast(ks))
          .where(F.col("d") > F.col("k"))
          .groupBy("k").agg(F.count("*").alias("n_rich")))
    ed = (edges
          .join(deg.withColumnRenamed("n", "u")
                .withColumnRenamed("d", "du"), "u")
          .join(deg.withColumnRenamed("n", "v")
                .withColumnRenamed("d", "dv"), "v"))
    ek = (ed.crossJoin(F.broadcast(ks))
          .where((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
          .groupBy("k").agg(F.count("*").alias("e_rich")))
    return (nk.join(ek, "k", "left")
            .select("k", "n_rich",
                    F.coalesce("e_rich", F.lit(0)).alias("e_rich"),
                    F.when(F.col("n_rich") > 1, F.round(
                        2.0 * F.coalesce("e_rich", F.lit(0))
                        / (F.col("n_rich")
                           * (F.col("n_rich") - F.lit(1))), 6))
                    .otherwise(F.lit(0.0)).alias("phi")))


_RICH_CLUB_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (SELECT n, COUNT(*) AS d FROM (
          SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY n),
ks AS (SELECT (1 << CAST(r AS INTEGER)) AS k
       FROM UNNEST(range(1, 7)) AS t(r)),
nk AS (SELECT k, COUNT(*) AS n_rich FROM deg, ks WHERE d > k GROUP BY k),
ek AS (SELECT k, COUNT(*) AS e_rich
       FROM edges
       JOIN deg du ON du.n = edges.u
       JOIN deg dv ON dv.n = edges.v
       CROSS JOIN ks
       WHERE du.d > k AND dv.d > k GROUP BY k)
SELECT nk.k, n_rich, COALESCE(e_rich, 0) AS e_rich,
       CASE WHEN n_rich > 1
            THEN round(2.0 * COALESCE(e_rich, 0)
                       / (n_rich * (n_rich - 1)), 6)
            ELSE 0.0 END AS phi
FROM nk LEFT JOIN ek ON nk.k = ek.k
"""


def q_neighbor_degree(spark, sf_dir):
    """Average-neighbor-degree curve knn(k) over the co-purchase graph
    (the functional form behind the assortativity scalar: do
    high-degree parts attach to high-degree parts?).  FULL oracle:
    per-node neighbor-degree ratios round to 9 dp DECIMAL before the
    per-degree-class mean, so the aggregation is order-free."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey").distinct())
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").alias("u"),
                     F.col("b.l_partkey").alias("v"))
             .distinct())
    und = (edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))))
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    nbr = (und.join(deg.select(F.col("u").alias("v"),
                               F.col("d").alias("dv")), "v")
           .groupBy("u").agg(F.sum("dv").alias("snd")))
    per_node = (deg.join(nbr, "u")
                .select("d", F.round(F.col("snd").cast("double")
                                     / F.col("d"), 9)
                        .cast("decimal(18,9)").alias("t")))
    return (per_node.groupBy("d")
            .agg(F.count("*").alias("n_nodes"),
                 F.round(F.sum("t").cast("double") / F.count("*"), 6)
                 .alias("knn")))


_NEIGHBOR_DEGREE_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
und AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
nbr AS (SELECT und.u, SUM(dv.d) AS snd
        FROM und JOIN deg dv ON dv.u = und.v GROUP BY und.u),
per_node AS (
  SELECT deg.d,
         CAST(round(CAST(snd AS DOUBLE) / deg.d, 9)
              AS DECIMAL(18,9)) AS t
  FROM deg JOIN nbr ON deg.u = nbr.u)
SELECT d, COUNT(*) AS n_nodes,
       round(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS knn
FROM per_node GROUP BY d
"""


def _ewma_weights(alpha: float = 0.2, n: int = 20) -> list[float]:
    return [(1.0 - alpha) ** k for k in range(n)]


def q_ewma_revenue(spark, sf_dir):
    """Exponentially-weighted moving average of daily revenue
    (α = 0.2, 20-day window) — the BI smoothing curve.  FULL oracle:
    the weight ladder is one precomputed double literal shared
    verbatim by both engines (no cross-libm pow), the windowed value
    list is frame-ordered, and numerator/denominator are the same
    left-to-right folds."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("rev")))
    w = W.orderBy("day").rowsBetween(-19, 0)
    arr = F.collect_list("rev").over(w)
    wl = F.lit(_ewma_weights())
    wrev = F.reverse(F.slice(wl, 1, F.size(arr)))
    num = F.aggregate(F.zip_with(arr, wrev, lambda x, wt: x * wt),
                      F.lit(0.0), lambda acc, v: acc + v)
    den = F.aggregate(wrev, F.lit(0.0), lambda acc, v: acc + v)
    return (daily.select("day", "rev",
                         F.round(num / den, 6).alias("ewma")))


def _ewma_oracle_sql(alpha: float = 0.2, n: int = 20) -> str:
    wl = "[" + ", ".join(repr(w) for w in _ewma_weights(alpha, n)) + "]"
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS rev
  FROM orders GROUP BY 1),
win AS (
  SELECT day, rev,
         list(rev) OVER (ORDER BY day
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         AS arr
  FROM daily),
wts AS (SELECT day, rev, arr,
               list_reverse(list_slice({wl}, 1, len(arr))) AS wrev
        FROM win)
SELECT day, rev,
       round(list_sum(list_transform(range(1, len(arr)+1),
                                     i -> arr[i] * wrev[i]))
             / list_sum(wrev), 6) AS ewma
FROM wts
"""


def q_spend_percentile(spark, sf_dir):
    """Customer spend table with percent_rank and cume_dist — the
    window ranking functions not covered elsewhere.  FULL oracle:
    rank over (spend, custkey) is a total order, so both fractions
    are exact-integer ratios."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    per = (o.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("spend")))
    w = W.orderBy("spend", "o_custkey")
    return per.select(
        "o_custkey", F.col("spend").cast("double").alias("spend"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"))


_SPEND_PERCENTILE_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS spend
  FROM orders GROUP BY 1)
SELECT o_custkey, CAST(spend AS DOUBLE) AS spend,
       round(percent_rank() OVER (ORDER BY spend, o_custkey), 9)
       AS pct_rank,
       round(cume_dist() OVER (ORDER BY spend, o_custkey), 9) AS cume
FROM per
"""


def q_ahash_groups(spark, sf_dir):
    """Image near-dup groups by perceptual average-hash over REAL
    decoded PNG rasters (zlib inflate + scanline unfilter on the hot
    path, Arrow-batched).  FULL oracle: the synthetic rasters follow a
    closed pixel form, so SQL recomputes the identical 64-bit
    fingerprint the decoder must produce — decoder correctness is the
    thing under test.  Groups with >1 member are duplicate classes."""
    from .operators.multimodal import ahash, documents_as_media
    pngs = _docs(spark, sf_dir).where(F.col("doc_id") % 3 == 1)
    media = documents_as_media(pngs)
    return (ahash(media)
            .groupBy("ahash")
            .agg(F.count("*").alias("n_images"),
                 F.min("media_id").alias("rep"))
            .where(F.col("n_images") > 1))


_AHASH_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id,
         4 + n_chars % 60 AS w, 4 + (n_chars // 7) % 60 AS h
  FROM documents WHERE doc_id % 3 = 1),
cells AS (
  SELECT media_id,
         ty.y AS y, tx.x AS x,
         ((((tx.x * w) // 8) * 3 + ((ty.y * h) // 8)) % 256) AS px
  FROM dims, UNNEST(range(0, 8)) AS ty(y), UNNEST(range(0, 8)) AS tx(x))
SELECT ahash, COUNT(*) AS n_images, MIN(media_id) AS rep
FROM (SELECT media_id,
             string_agg(CASE WHEN px * 64 > tot THEN '1' ELSE '0' END,
                        '' ORDER BY y, x) AS ahash
      FROM (SELECT media_id, y, x, px,
                   SUM(px) OVER (PARTITION BY media_id) AS tot
            FROM cells)
      GROUP BY media_id)
GROUP BY ahash HAVING COUNT(*) > 1
"""


def q_fk_orphans(spark, sf_dir):
    """Referential-integrity audit: orphan counts for every FK edge in
    the schema (lineitem→orders/part/supplier, orders→customer,
    customer/supplier→nation) — the anti-join data-quality sweep a
    warehouse runs before trusting joins.  FULL oracle: exact counts;
    each anti-join broadcasts the key side when dimension-sized."""
    t = load_tables(spark, sf_dir)

    def orphans(fact, fk, dim, pk, rel):
        return (fact.select(F.col(fk).alias("k"))
                .join(dim.select(F.col(pk).alias("k")), "k", "left_anti")
                .agg(F.lit(rel).alias("relation"),
                     F.count("*").alias("n_orphans")))
    checks = [
        orphans(t["lineitem"], "l_orderkey", t["orders"], "o_orderkey",
                "lineitem->orders"),
        orphans(t["lineitem"], "l_partkey", t["part"], "p_partkey",
                "lineitem->part"),
        orphans(t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey",
                "lineitem->supplier"),
        orphans(t["orders"], "o_custkey", t["customer"], "c_custkey",
                "orders->customer"),
        orphans(t["customer"], "c_nationkey", t["nation"], "n_nationkey",
                "customer->nation"),
        orphans(t["supplier"], "s_nationkey", t["nation"], "n_nationkey",
                "supplier->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


_FK_ORPHANS_ORACLE = """
SELECT 'lineitem->orders' AS relation,
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
       AS n_orphans
UNION ALL SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
UNION ALL SELECT 'lineitem->supplier',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
UNION ALL SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
UNION ALL SELECT 'supplier->nation',
       (SELECT COUNT(*) FROM supplier
        WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
"""


def q_calendar_gaps(spark, sf_dir):
    """Completeness audit: calendar days inside the event span with
    ZERO events (ingestion holes) — dense day spine minus observed
    days.  FULL oracle: pure date arithmetic (sequence vs
    generate_series)."""
    ev = _events(spark, sf_dir)
    span = ev.agg(F.min(F.col("ts").cast("date")).alias("lo"),
                  F.max(F.col("ts").cast("date")).alias("hi"))
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day"))
    seen = (ev.groupBy(F.col("ts").cast("date").alias("day"))
            .agg(F.count("*").alias("n")))
    return (spine.join(seen, "day", "left")
            .select("day",
                    F.coalesce("n", F.lit(0)).alias("n_events"),
                    (F.coalesce("n", F.lit(0)) == 0).alias("is_gap")))


_CALENDAR_GAPS_ORACLE = """
WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS lo,
                     MAX(CAST(ts AS DATE)) AS hi FROM events),
spine AS (SELECT CAST(unnest(generate_series(lo, hi,
                                             INTERVAL 1 DAY)) AS DATE)
          AS day FROM span),
seen AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
         FROM events GROUP BY 1)
SELECT spine.day, COALESCE(n, 0) AS n_events,
       COALESCE(n, 0) = 0 AS is_gap
FROM spine LEFT JOIN seen ON spine.day = seen.day
"""


def q_chisq_independence(spark, sf_dir):
    """χ² test of independence between market segment and order
    priority (are they associated?), plus Cramér's V effect size.
    FULL oracle: observed/expected derive from exact integer margins;
    each cell's (o−e)²/e term rounds to 9 dp DECIMAL before the sum
    (order-free), one closed-form double at the end."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          t["orders"].o_custkey == t["customer"].c_custkey)
         .select("c_mktsegment", "o_orderpriority"))
    cells = (j.groupBy("c_mktsegment", "o_orderpriority")
             .agg(F.count("*").alias("o")))
    rows = F.sum("o").over(W.partitionBy("c_mktsegment"))
    cols = F.sum("o").over(W.partitionBy("o_orderpriority"))
    tot = F.sum("o").over(W.partitionBy())
    e = rows.cast("double") * cols / tot
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 9) \
        .cast("decimal(18,9)")
    agg = (cells.select(term.alias("t"),
                        F.col("c_mktsegment"), F.col("o_orderpriority"),
                        tot.alias("n"))
           .agg(F.sum("t").cast("double").alias("chi2"),
                F.countDistinct("c_mktsegment").alias("r"),
                F.countDistinct("o_orderpriority").alias("c"),
                F.max("n").alias("n")))
    return agg.select(
        F.round("chi2", 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(F.sqrt(F.col("chi2")
                       / (F.col("n")
                          * F.least(F.col("r") - 1, F.col("c") - 1))), 6)
        .alias("cramers_v"))


_CHISQ_ORACLE = """
WITH j AS (SELECT c_mktsegment, o_orderpriority
           FROM orders JOIN customer ON o_custkey = c_custkey),
cells AS (SELECT c_mktsegment, o_orderpriority, COUNT(*) AS o
          FROM j GROUP BY 1, 2),
g AS (SELECT c_mktsegment, o_orderpriority, o,
             SUM(o) OVER (PARTITION BY c_mktsegment) AS rows_m,
             SUM(o) OVER (PARTITION BY o_orderpriority) AS cols_m,
             SUM(o) OVER () AS tot
      FROM cells),
t AS (SELECT c_mktsegment, o_orderpriority, tot,
             CAST(round((o - CAST(rows_m AS DOUBLE) * cols_m / tot)
                        * (o - CAST(rows_m AS DOUBLE) * cols_m / tot)
                        / (CAST(rows_m AS DOUBLE) * cols_m / tot), 9)
                  AS DECIMAL(18,9)) AS term
      FROM g),
a AS (SELECT CAST(SUM(term) AS DOUBLE) AS chi2,
             COUNT(DISTINCT c_mktsegment) AS r,
             COUNT(DISTINCT o_orderpriority) AS c,
             MAX(tot) AS n
      FROM t)
SELECT round(chi2, 6) AS chi2,
       (r - 1) * (c - 1) AS dof,
       round(sqrt(chi2 / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
FROM a
"""


def q_category_entropy(spark, sf_dir):
    """Categorical-column profile: distinct count and Shannon entropy
    for each low-cardinality string column of the order pipeline — the
    profiling pass that flags constant or near-constant columns.  FULL
    oracle: 9 dp decimal-stable entropy terms (the transition_entropy
    discipline)."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    o, c, li = t["orders"], t["customer"], t["lineitem"]
    stacked = (o.select(F.lit("o_orderstatus").alias("col"),
                        F.col("o_orderstatus").alias("val"))
               .unionByName(o.select(F.lit("o_orderpriority").alias("col"),
                                     F.col("o_orderpriority").alias("val")))
               .unionByName(c.select(F.lit("c_mktsegment").alias("col"),
                                     F.col("c_mktsegment").alias("val")))
               .unionByName(li.select(F.lit("l_returnflag").alias("col"),
                                      F.col("l_returnflag").alias("val")))
               .unionByName(li.select(F.lit("l_linestatus").alias("col"),
                                      F.col("l_linestatus").alias("val"))))
    counts = stacked.groupBy("col", "val").agg(F.count("*").alias("n"))
    tot = F.sum("n").over(W.partitionBy("col"))
    p = F.col("n") / tot
    term = F.round(-p * F.log2(p), 9).cast("decimal(18,9)")
    return (counts.withColumn("t", term)
            .groupBy("col")
            .agg(F.count("*").alias("n_distinct"),
                 F.round(F.sum("t").cast("double"), 6)
                 .alias("entropy_bits")))


_CATEGORY_ENTROPY_ORACLE = """
WITH stacked AS (
  SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
  UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer
  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem),
counts AS (SELECT col, val, COUNT(*) AS n FROM stacked GROUP BY 1, 2),
t AS (SELECT col,
             CAST(round(-(n / SUM(n) OVER (PARTITION BY col))
                        * log2(n / SUM(n) OVER (PARTITION BY col)), 9)
                  AS DECIMAL(18,9)) AS term
      FROM counts)
SELECT col, COUNT(*) AS n_distinct,
       round(CAST(SUM(term) AS DOUBLE), 6) AS entropy_bits
FROM t GROUP BY col
"""


def q_survival_curve(spark, sf_dir):
    """User survival curve: fraction of users whose observed lifespan
    (last − first event, days) reaches each day k — retention's
    survival-analysis view.  FULL oracle: lifespans and the
    at-risk/total counts are exact integers; one ratio double."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    lif = (ev.groupBy("user_id")
           .agg(F.datediff(F.max(F.col("ts").cast("date")),
                           F.min(F.col("ts").cast("date")))
                .alias("lifespan")))
    n = F.sum("c").over(
        W.partitionBy().orderBy(F.col("lifespan").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = F.sum("c").over(W.partitionBy())
    per = (lif.groupBy("lifespan").agg(F.count("*").alias("c")))
    return (per.select(F.col("lifespan").alias("day"),
                       n.alias("n_surviving"),
                       F.round(n.cast("double") / tot, 6)
                       .alias("survival")))


_SURVIVAL_ORACLE = """
WITH lif AS (
  SELECT user_id,
         datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
         AS lifespan
  FROM events GROUP BY 1),
per AS (SELECT lifespan, COUNT(*) AS c FROM lif GROUP BY 1)
SELECT lifespan AS day,
       SUM(c) OVER (ORDER BY lifespan DESC
                    ROWS UNBOUNDED PRECEDING) AS n_surviving,
       round(CAST(SUM(c) OVER (ORDER BY lifespan DESC
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / SUM(c) OVER (), 6) AS survival
FROM per
"""


def q_ab_proportion_test(spark, sf_dir):
    """Two-proportion z-test on purchase conversion between user
    buckets (hash-split variants A/B) — the experimentation staple.
    FULL oracle: conversion counts are exact integers, the pooled-z
    closed form is one deterministic double chain."""
    ev = _events(spark, sf_dir)
    per = (ev.groupBy("user_id")
           .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).alias("converted"))
           .withColumn("variant",
                       F.when(F.pmod(F.col("user_id"), 2) == 0, "A")
                       .otherwise("B")))
    g = (per.groupBy("variant")
         .agg(F.count("*").alias("n"),
              F.sum("converted").alias("conv")))
    a = g.where(F.col("variant") == "A").select(
        F.col("n").alias("n1"), F.col("conv").alias("c1"))
    b = g.where(F.col("variant") == "B").select(
        F.col("n").alias("n2"), F.col("conv").alias("c2"))
    j = a.crossJoin(b)
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    pp = (F.col("c1") + F.col("c2")).cast("double") \
        / (F.col("n1") + F.col("n2"))
    se = F.sqrt(pp * (1 - pp)
                * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    z = F.when(se > 0, F.round((p1 - p2) / se, 6))
    return j.select("n1", "c1", "n2", "c2",
                    F.round(p1, 6).alias("rate_a"),
                    F.round(p2, 6).alias("rate_b"),
                    z.alias("z"))


_AB_TEST_ORACLE = """
WITH per AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS converted,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
  FROM events GROUP BY user_id),
g AS (SELECT variant, COUNT(*) AS n, SUM(converted) AS conv
      FROM per GROUP BY 1),
j AS (SELECT a.n AS n1, a.conv AS c1, b.n AS n2, b.conv AS c2
      FROM (SELECT * FROM g WHERE variant = 'A') a,
           (SELECT * FROM g WHERE variant = 'B') b)
SELECT n1, c1, n2, c2,
       round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_a,
       round(CAST(c2 AS DOUBLE) / n2, 6) AS rate_b,
       CASE WHEN sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                      * (1 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                      * (1.0 / n1 + 1.0 / n2)) > 0
            THEN round((CAST(c1 AS DOUBLE) / n1
                        - CAST(c2 AS DOUBLE) / n2)
                       / sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                              * (1 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                              * (1.0 / n1 + 1.0 / n2)), 6)
            END AS z
FROM j
"""


def q_user_trend_slope(spark, sf_dir):
    """Per-user engagement trend: least-squares slope of event value on
    event time (hours since the user's first event) — rising or
    falling usage, per user.  FULL oracle: the per-term x/y values
    round to 9 dp DECIMAL, sums are exact, slope is one closed-form
    double (the zipf_slope discipline, grouped)."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    t0 = F.min("ts").over(W.partitionBy("user_id"))
    x = F.round((F.col("ts").cast("double") - t0.cast("double"))
                / 3600.0, 9).cast("decimal(18,9)")
    y = F.round(F.col("value"), 9).cast("decimal(18,9)")
    terms = ev.select(
        "user_id", x.alias("x"), y.alias("y"),
        (x * y).cast("decimal(38,18)").alias("xy"),
        (x * x).cast("decimal(38,18)").alias("xx"))
    agg = (terms.groupBy("user_id")
           .agg(F.count("*").cast("double").alias("n"),
                F.sum("x").cast("double").alias("sx"),
                F.sum("y").cast("double").alias("sy"),
                F.sum("xy").cast("double").alias("sxy"),
                F.sum("xx").cast("double").alias("sxx"))
           .where(F.col("n") >= 3))
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (agg.where(den != 0)
            .select("user_id", F.col("n").cast("bigint").alias("n_events"),
                    F.round((F.col("n") * F.col("sxy")
                             - F.col("sx") * F.col("sy")) / den, 6)
                    .alias("slope")))


_USER_TREND_ORACLE = """
WITH t AS (
  SELECT user_id,
         CAST(round((epoch(ts)
                     - epoch(MIN(ts) OVER (PARTITION BY user_id)))
                    / 3600.0, 9) AS DECIMAL(18,9)) AS x,
         CAST(round(value, 9) AS DECIMAL(18,9)) AS y
  FROM events),
a AS (SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
      FROM t GROUP BY user_id HAVING COUNT(*) >= 3)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
FROM a WHERE (n * sxx - sx * sx) != 0
"""


def q_readability_scores(spark, sf_dir):
    """Flesch-style readability per document: words/sentence and a
    vowel-group syllable proxy drive the standard 206.835 − 1.015·WPS
    − 84.6·SPW formula — a text-quality gate input.  FULL oracle: all
    three counts are exact integers from shared regexes; one double
    formula rounded at 4 dp."""
    docs = _docs(spark, sf_dir)
    sents = F.filter(F.split(F.col("text"), r"[.!?]+"),
                     lambda s: F.trim(s) != "")
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                     lambda t: t != "")
    syll = F.size(F.filter(
        F.split(F.lower(F.col("text")), "[^aeiou]+"),
        lambda g: g != ""))
    out = docs.select(
        "doc_id",
        F.greatest(F.size(sents), F.lit(1)).cast("long").alias("n_sents"),
        F.greatest(F.size(words), F.lit(1)).cast("long").alias("n_words"),
        syll.cast("long").alias("n_syll"))
    wps = F.col("n_words").cast("double") / F.col("n_sents")
    spw = F.col("n_syll").cast("double") / F.col("n_words")
    return out.select(
        "doc_id", "n_sents", "n_words", "n_syll",
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch"))


_READABILITY_ORACLE = """
WITH c AS (
  SELECT doc_id,
         GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  x -> trim(x) != '')), 1) AS n_sents,
         GREATEST(len(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> x != '')), 1) AS n_words,
         len(list_filter(string_split_regex(lower(text), '[^aeiou]+'),
                         x -> x != '')) AS n_syll
  FROM documents)
SELECT doc_id, n_sents, n_words, n_syll,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
             - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 4) AS flesch
FROM c
"""


def q_abc_classification(spark, sf_dir):
    """ABC inventory classification: parts ranked by revenue, bucketed
    A/B/C at 80%/95% cumulative share (the ops-analytics Pareto
    standard).  FULL oracle: cumulative DECIMAL sums under a
    (rev, partkey) total order; the class boundaries compare exact
    decimals scaled to integers (share·10⁶) so no double boundary
    flips."""
    from pyspark.sql import Window as W
    li = load_tables(spark, sf_dir)["lineitem"]
    per = (li.groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                      * (1 - F.col("l_discount").cast("decimal(8,2)")))
                .cast("decimal(24,4)").alias("rev")))
    w = (W.orderBy(F.col("rev").desc(), "l_partkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = F.sum("rev").over(W.partitionBy())
    cum = F.sum("rev").over(w)
    share = F.round(cum.cast("double") / tot.cast("double"), 9)
    cls = (F.when(share <= 0.8, "A")
           .when(share <= 0.95, "B").otherwise("C"))
    ranked = per.select("l_partkey", "rev", cls.alias("abc_class"))
    return (ranked.groupBy("abc_class")
            .agg(F.count("*").alias("n_parts"),
                 F.sum("rev").cast("double").alias("revenue")))


_ABC_ORACLE = """
WITH per AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(8,2))))
              AS DECIMAL(24,4)) AS rev
  FROM lineitem GROUP BY 1),
ranked AS (
  SELECT l_partkey, rev,
         round(CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(SUM(rev) OVER () AS DOUBLE), 9) AS share
  FROM per)
SELECT CASE WHEN share <= 0.8 THEN 'A'
            WHEN share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts, CAST(SUM(rev) AS DOUBLE) AS revenue
FROM ranked GROUP BY 1
"""


def q_leadtime_percentiles(spark, sf_dir):
    """Fulfillment lead time (order date → ship date, days) p50/p90/p99
    per order priority — the SLA distribution table.  FULL oracle:
    integer day gaps, linearly-interpolated exact percentiles on both
    engines, 6 dp rounding."""
    t = load_tables(spark, sf_dir)
    j = (t["lineitem"].join(t["orders"],
                            F.col("l_orderkey") == F.col("o_orderkey"))
         .select("o_orderpriority",
                 F.datediff(F.col("l_shipdate").cast("date"),
                            F.col("o_orderdate").cast("date"))
                 .alias("lead")))
    return (j.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.expr("percentile(lead, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(lead, 0.9)"), 6).alias("p90"),
                 F.round(F.expr("percentile(lead, 0.99)"), 6).alias("p99")))


_LEADTIME_ORACLE = """
WITH j AS (
  SELECT o_orderpriority,
         datediff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) AS lead
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, COUNT(*) AS n,
       round(quantile_cont(lead, 0.5), 6) AS p50,
       round(quantile_cont(lead, 0.9), 6) AS p90,
       round(quantile_cont(lead, 0.99), 6) AS p99
FROM j GROUP BY 1
"""


def q_discount_quantity_corr(spark, sf_dir):
    """Does discounting move volume?  Pearson correlation of discount
    vs quantity per return-flag segment — closed form from exact
    DECIMAL sums (discount/quantity are exact 2 dp decimals in the
    generator), doubles only at the end."""
    li = load_tables(spark, sf_dir)["lineitem"]
    x = F.col("l_discount").cast("decimal(8,2)")
    y = F.col("l_quantity").cast("decimal(8,2)")
    terms = li.select(
        "l_returnflag", x.alias("x"), y.alias("y"),
        (x * y).cast("decimal(18,4)").alias("xy"),
        (x * x).cast("decimal(18,4)").alias("xx"),
        (y * y).cast("decimal(18,4)").alias("yy"))
    agg = (terms.groupBy("l_returnflag")
           .agg(F.count("*").cast("double").alias("n"),
                F.sum("x").cast("double").alias("sx"),
                F.sum("y").cast("double").alias("sy"),
                F.sum("xy").cast("double").alias("sxy"),
                F.sum("xx").cast("double").alias("sxx"),
                F.sum("yy").cast("double").alias("syy")))
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / F.sqrt((F.col("n") * F.col("sxx")
                  - F.col("sx") * F.col("sx"))
                 * (F.col("n") * F.col("syy")
                    - F.col("sy") * F.col("sy")))
    return agg.select("l_returnflag",
                      F.col("n").cast("bigint").alias("n_lines"),
                      F.round(r, 6).alias("corr"))


_DISCOUNT_QTY_ORACLE = """
WITH t AS (
  SELECT l_returnflag,
         CAST(l_discount AS DECIMAL(8,2)) AS x,
         CAST(l_quantity AS DECIMAL(8,2)) AS y
  FROM lineitem),
a AS (SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(18,4))) AS DOUBLE) AS syy
      FROM t GROUP BY 1)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_lines,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       AS corr
FROM a
"""


def q_weekday_seasonality(spark, sf_dir):
    """Day-of-week seasonality of order revenue: share per weekday and
    the seasonality index (share / uniform).  FULL oracle: DECIMAL
    daily sums; DOW from ISO dayofweek (identical numbering both
    engines via the same formula)."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    dow = F.dayofweek(F.col("o_orderdate").cast("date"))
    per = (o.groupBy(dow.alias("dow"))
           .agg(F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(28,2)").alias("_rev")))
    tot = F.sum("_rev").over(W.partitionBy())
    share = F.col("_rev").cast("double") / tot.cast("double")
    return per.select("dow", "n_orders",
                      F.col("_rev").cast("double").alias("revenue"),
                      F.round(share, 6).alias("share"),
                      F.round(share * 7, 6).alias("seasonality_idx"))


_WEEKDAY_ORACLE = """
WITH per AS (
  SELECT dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS rev
  FROM orders GROUP BY 1)
SELECT dow, n_orders, CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6)
       AS share,
       round(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE)
             * 7, 6) AS seasonality_idx
FROM per
"""


def q_hhi_by_month(spark, sf_dir):
    """Market-concentration time series: Herfindahl–Hirschman index of
    nation revenue shares per month (is revenue concentrating?).
    FULL oracle: per-cell DECIMAL sums; each squared share rounds to
    9 dp DECIMAL before the sum."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .select(F.date_trunc("month", F.col("o_orderdate"))
                 .cast("date").alias("month"),
                 "c_nationkey",
                 F.col("o_totalprice").cast("decimal(18,2)").alias("rev")))
    cells = (j.groupBy("month", "c_nationkey")
             .agg(F.sum("rev").cast("decimal(28,2)").alias("r")))
    tot = F.sum("r").over(W.partitionBy("month"))
    share = F.col("r").cast("double") / tot.cast("double")
    term = F.round(share * share, 9).cast("decimal(18,9)")
    return (cells.withColumn("t", term)
            .groupBy("month")
            .agg(F.count("*").alias("n_nations"),
                 F.round(F.sum("t").cast("double"), 6).alias("hhi")))


_HHI_ORACLE = """
WITH cells AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         c_nationkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS r
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
s AS (SELECT month,
             CAST(r AS DOUBLE)
             / CAST(SUM(r) OVER (PARTITION BY month) AS DOUBLE)
             AS share
      FROM cells),
t AS (SELECT month,
             CAST(round(share * share, 9) AS DECIMAL(18,9)) AS term
      FROM s)
SELECT month, COUNT(*) AS n_nations,
       round(CAST(SUM(term) AS DOUBLE), 6) AS hhi
FROM t GROUP BY month
"""


def q_modularity_lpa(spark, sf_dir):
    """Partition-quality audit: Newman modularity contribution per LPA
    community — e_c/m − (d_c/2m)², the score community detectors
    optimize.  FULL oracle: the deterministic LPA labels replay as
    unrolled CTEs (the label_propagation oracle), and every
    modularity input (m, e_c, d_c) is an exact integer."""
    from .operators.graph_algos import label_propagation
    g = tpch_graph(spark, sf_dir)
    nodes = g.nodes_df.where(
        F.col("kind").isin("Customer", "Nation", "Region"))
    edges = g.edges_df.where(F.col("kind").isin("FromNation", "InRegion"))
    lab = label_propagation(nodes, edges, iters=4).select("uid", "label")
    de = edges.select(F.col("startuid").alias("src"),
                      F.col("enduid").alias("dst"))
    m = de.agg(F.count("*").alias("m"))
    ein = (de.join(lab.withColumnRenamed("uid", "src")
                   .withColumnRenamed("label", "ls"), "src")
           .join(lab.withColumnRenamed("uid", "dst")
                 .withColumnRenamed("label", "ld"), "dst")
           .where(F.col("ls") == F.col("ld"))
           .groupBy(F.col("ls").alias("label"))
           .agg(F.count("*").alias("e_in")))
    sym = (de.unionByName(de.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
           .distinct())
    deg = sym.groupBy(F.col("src").alias("uid")) \
        .agg(F.count("*").alias("d"))
    dc = (lab.join(deg, "uid", "left")
          .groupBy("label")
          .agg(F.count("*").alias("n_members"),
               F.sum(F.coalesce("d", F.lit(0))).alias("d_sum")))
    j = (dc.join(ein, "label", "left").crossJoin(m))
    e = F.coalesce("e_in", F.lit(0))
    half = F.col("d_sum").cast("double") / (2 * F.col("m"))
    return j.select(
        "label", "n_members", e.alias("e_in"), "d_sum",
        F.round(e.cast("double") / F.col("m") - half * half, 9)
        .alias("contribution"))


_MODULARITY_FINAL = """
lab AS (SELECT uid, label FROM l4),
m AS (SELECT COUNT(*) AS m FROM de),
ein AS (SELECT l1.label, COUNT(*) AS e_in
        FROM de JOIN lab l1 ON l1.uid = de.src
                JOIN lab l2 ON l2.uid = de.dst
        WHERE l1.label = l2.label GROUP BY 1),
deg AS (SELECT src AS uid, COUNT(*) AS d FROM sym GROUP BY 1),
dc AS (SELECT label, COUNT(*) AS n_members,
               SUM(COALESCE(d, 0)) AS d_sum
        FROM lab LEFT JOIN deg USING (uid) GROUP BY label)
SELECT dc.label, n_members, COALESCE(e_in, 0) AS e_in, d_sum,
       round(CAST(COALESCE(e_in, 0) AS DOUBLE) / m.m
             - (CAST(d_sum AS DOUBLE) / (2 * m.m))
               * (CAST(d_sum AS DOUBLE) / (2 * m.m)), 9)
       AS contribution
FROM dc LEFT JOIN ein USING (label), m
"""


def q_node_jaccard(spark, sf_dir):
    """Neighborhood Jaccard similarity between parts in the order
    bipartite graph: J = |orders(u) ∩ orders(v)| / |orders(u) ∪
    orders(v)| for co-purchased pairs — top-20.  Intersections come
    from the wedge join (never all-pairs), degrees broadcast back.
    FULL oracle: exact integer set sizes, full key tiebreak."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey").distinct())
    deg = li.groupBy("l_partkey").agg(F.count("*").alias("d"))
    a, b = li.alias("a"), li.alias("b")
    inter = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .groupBy(F.col("a.l_partkey").alias("u"),
                      F.col("b.l_partkey").alias("v"))
             .agg(F.count("*").alias("ix")))
    j = (inter
         .join(deg.select(F.col("l_partkey").alias("u"),
                          F.col("d").alias("du")), "u")
         .join(deg.select(F.col("l_partkey").alias("v"),
                          F.col("d").alias("dv")), "v")
         .select("u", "v", "ix",
                 F.round(F.col("ix").cast("double")
                         / (F.col("du") + F.col("dv") - F.col("ix")), 6)
                 .alias("jaccard")))
    return j.orderBy(F.col("jaccard").desc(), "u", "v").limit(20)


_NODE_JACCARD_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
deg AS (SELECT l_partkey, COUNT(*) AS d FROM li GROUP BY 1),
inter AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS ix
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT u, v, ix,
       round(CAST(ix AS DOUBLE) / (du.d + dv.d - ix), 6) AS jaccard
FROM inter JOIN deg du ON du.l_partkey = u
           JOIN deg dv ON dv.l_partkey = v
ORDER BY jaccard DESC, u, v LIMIT 20
"""


def q_revenue_drawdown(spark, sf_dir):
    """Daily revenue drawdown from the running peak — the
    volatility/health curve (finance's max-drawdown shape applied to
    a revenue series).  FULL oracle: DECIMAL daily sums, running max
    over exact decimals, one ratio double."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").alias("rev")))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    peak = F.max("rev").over(w)
    return daily.select(
        "day", F.col("rev").cast("double").alias("rev"),
        peak.cast("double").alias("peak"),
        F.round((peak - F.col("rev")).cast("double")
                / peak.cast("double"), 6).alias("drawdown"))


_DRAWDOWN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1)
SELECT day, CAST(rev AS DOUBLE) AS rev,
       CAST(MAX(rev) OVER w AS DOUBLE) AS peak,
       round(CAST(MAX(rev) OVER w - rev AS DOUBLE)
             / CAST(MAX(rev) OVER w AS DOUBLE), 6) AS drawdown
FROM daily
WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
"""


def q_bot_screen(spark, sf_dir):
    """Bot/abuse screen: per-user event rate (events per active hour)
    and event-type entropy — high-rate low-entropy users are the
    automation signature.  FULL oracle: exact integer counts, 9 dp
    decimal entropy terms, rate from exact second spans."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    tc = (ev.groupBy("user_id", "event_type")
          .agg(F.count("*").alias("c")))
    totw = W.partitionBy("user_id")
    p = F.col("c") / F.sum("c").over(totw)
    term = F.round(-p * F.log2(p), 9).cast("decimal(18,9)")
    ent = (tc.withColumn("t", term)
           .groupBy("user_id")
           .agg(F.round(F.sum("t").cast("double"), 6).alias("entropy")))
    span = (ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 (F.max(F.col("ts").cast("double"))
                  - F.min(F.col("ts").cast("double"))).alias("span_s")))
    rate = F.col("n_events").cast("double") \
        / F.greatest(F.col("span_s") / 3600.0, F.lit(1.0))
    return (span.join(ent, "user_id")
            .select("user_id", "n_events",
                    F.round(rate, 6).alias("events_per_hour"),
                    "entropy",
                    ((rate > 8) & (F.col("entropy") < 1.5))
                    .alias("flagged")))


_BOT_SCREEN_ORACLE = """
WITH tc AS (SELECT user_id, event_type, COUNT(*) AS c
            FROM events GROUP BY 1, 2),
ent AS (SELECT user_id,
               round(CAST(SUM(term) AS DOUBLE), 6) AS entropy
        FROM (SELECT user_id,
                     CAST(round(-(c / SUM(c) OVER (PARTITION BY user_id))
                                * log2(c / SUM(c) OVER
                                       (PARTITION BY user_id)), 9)
                          AS DECIMAL(18,9)) AS term
              FROM tc)
        GROUP BY user_id),
span AS (SELECT user_id, COUNT(*) AS n_events,
                MAX(epoch(ts)) - MIN(epoch(ts)) AS span_s
         FROM events GROUP BY 1)
SELECT span.user_id, n_events,
       round(CAST(n_events AS DOUBLE)
             / GREATEST(span_s / 3600.0, 1.0), 6) AS events_per_hour,
       entropy,
       (CAST(n_events AS DOUBLE)
        / GREATEST(span_s / 3600.0, 1.0) > 8 AND entropy < 1.5)
       AS flagged
FROM span JOIN ent ON span.user_id = ent.user_id
"""


def q_conversion_latency(spark, sf_dir):
    """Signup→first-purchase latency percentiles (hours) — the
    activation-speed SLA.  FULL oracle: first-event timestamps are
    exact mins, the interpolated percentiles follow the shared
    quantile_cont convention, 6 dp."""
    ev = _events(spark, sf_dir)
    s = (ev.where(F.col("event_type") == "signup")
         .groupBy("user_id")
         .agg(F.min(F.col("ts").cast("double")).alias("t_signup")))
    p = (ev.where(F.col("event_type") == "purchase")
         .groupBy("user_id")
         .agg(F.max(F.col("ts").cast("double")).alias("t_last_purchase"),
              F.min(F.col("ts").cast("double")).alias("t_first_purchase")))
    j = (s.join(p, "user_id")
         .where(F.col("t_first_purchase") >= F.col("t_signup"))
         .select(((F.col("t_first_purchase") - F.col("t_signup"))
                  / 3600.0).alias("lat_h")))
    return j.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(lat_h, 0.5)"), 6).alias("p50_h"),
        F.round(F.expr("percentile(lat_h, 0.9)"), 6).alias("p90_h"))


_CONVERSION_LATENCY_ORACLE = """
WITH s AS (SELECT user_id, MIN(epoch(ts)) AS t_signup
           FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT user_id, MIN(epoch(ts)) AS t_first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
j AS (SELECT (t_first_purchase - t_signup) / 3600.0 AS lat_h
      FROM s JOIN p USING (user_id)
      WHERE t_first_purchase >= t_signup)
SELECT COUNT(*) AS n_converted,
       round(quantile_cont(lat_h, 0.5), 6) AS p50_h,
       round(quantile_cont(lat_h, 0.9), 6) AS p90_h
FROM j
"""


def q_seasonal_naive_backtest(spark, sf_dir):
    """Forecast backtest: the seasonal-naive model (ŷ_d = y_{d−7})
    scored with MAE and MAPE over the daily revenue series — the
    baseline every forecaster must beat.  FULL oracle: absolute
    errors are exact DECIMALs; per-day MAPE terms round to 9 dp
    DECIMAL before the mean."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").alias("rev")))
    w = W.orderBy("day")
    pred = F.lag("rev", 7).over(w)
    scored = (daily.withColumn("pred", pred)
              .where(F.col("pred").isNotNull()))
    abs_err = F.abs(F.col("rev") - F.col("pred"))
    ape = F.round(abs_err.cast("double")
                  / F.col("rev").cast("double"), 9) \
        .cast("decimal(18,9)")
    return (scored.select(abs_err.alias("ae"), ape.alias("ape"))
            .agg(F.count("*").alias("n_days"),
                 F.round(F.sum("ae").cast("double") / F.count("*"), 6)
                 .alias("mae"),
                 F.round(F.sum("ape").cast("double") / F.count("*"), 6)
                 .alias("mape")))


_SEASONAL_NAIVE_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1),
scored AS (
  SELECT rev, lag(rev, 7) OVER (ORDER BY day) AS pred FROM daily),
t AS (SELECT abs(rev - pred) AS ae,
             CAST(round(CAST(abs(rev - pred) AS DOUBLE)
                        / CAST(rev AS DOUBLE), 9)
                  AS DECIMAL(18,9)) AS ape
      FROM scored WHERE pred IS NOT NULL)
SELECT COUNT(*) AS n_days,
       round(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 6) AS mae,
       round(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 6) AS mape
FROM t
"""


def q_basket_diversity(spark, sf_dir):
    """Basket-diversity histogram: distribution of distinct brands per
    order (how mixed are carts?).  FULL oracle: pure integer
    counting, two grouped aggregations."""
    t = load_tables(spark, sf_dir)
    per = (t["lineitem"].join(t["part"],
                              F.col("l_partkey") == F.col("p_partkey"))
           .groupBy("l_orderkey")
           .agg(F.countDistinct("p_brand").alias("n_brands")))
    return (per.groupBy("n_brands")
            .agg(F.count("*").alias("n_orders")))


_BASKET_DIVERSITY_ORACLE = """
WITH per AS (
  SELECT l_orderkey, COUNT(DISTINCT p_brand) AS n_brands
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
SELECT n_brands, COUNT(*) AS n_orders FROM per GROUP BY 1
"""


def q_topk_share_by_nation(spark, sf_dir):
    """Revenue concentration per nation: share captured by each
    nation's top-3 customers — the grouped top-k + conditional-share
    shape.  FULL oracle: rank under a (rev, custkey) total order,
    DECIMAL sums, one ratio double."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    per = (t["orders"].join(t["customer"],
                            F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_nationkey", "o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("rev")))
    rnk = F.row_number().over(
        W.partitionBy("c_nationkey")
        .orderBy(F.col("rev").desc(), "o_custkey"))
    flagged = per.withColumn("topk", rnk <= 3)
    return (flagged.groupBy("c_nationkey")
            .agg(F.count("*").alias("n_customers"),
                 F.sum(F.when(F.col("topk"), F.col("rev"))
                       .otherwise(F.lit(0).cast("decimal(18,2)")))
                 .cast("double").alias("top3_rev"),
                 F.round(F.sum(F.when(F.col("topk"), F.col("rev"))
                               .otherwise(F.lit(0)
                                          .cast("decimal(18,2)")))
                         .cast("double")
                         / F.sum("rev").cast("double"), 6)
                 .alias("top3_share")))


_TOPK_SHARE_ORACLE = """
WITH per AS (
  SELECT c_nationkey, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
flagged AS (
  SELECT c_nationkey, rev,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY rev DESC, o_custkey) <= 3 AS topk
  FROM per)
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN topk THEN rev
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       AS top3_rev,
       round(CAST(SUM(CASE WHEN topk THEN rev
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS top3_share
FROM flagged GROUP BY c_nationkey
"""


def q_return_rate_by_discount(spark, sf_dir):
    """Do discounted lines get returned more?  Return-flag rate per
    discount bucket with lift over the global rate.  FULL oracle:
    buckets from exact cent-scaled discounts, rates as exact-count
    ratios."""
    from pyspark.sql import Window as W
    li = load_tables(spark, sf_dir)["lineitem"]
    bucket = F.round(F.col("l_discount") * 100).cast("int")
    per = (li.groupBy(bucket.alias("disc_pct"))
           .agg(F.count("*").alias("n_lines"),
                F.sum(F.when(F.col("l_returnflag") == "R", 1)
                      .otherwise(0)).alias("n_returned")))
    gr = (F.sum("n_returned").over(W.partitionBy()).cast("double")
          / F.sum("n_lines").over(W.partitionBy()))
    rate = F.col("n_returned").cast("double") / F.col("n_lines")
    return per.select("disc_pct", "n_lines", "n_returned",
                      F.round(rate, 6).alias("return_rate"),
                      F.round(rate / gr, 6).alias("lift"))


_RETURN_RATE_ORACLE = """
WITH per AS (
  SELECT CAST(round(l_discount * 100) AS INTEGER) AS disc_pct,
         COUNT(*) AS n_lines,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         AS n_returned
  FROM lineitem GROUP BY 1)
SELECT disc_pct, n_lines, n_returned,
       round(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate,
       round((CAST(n_returned AS DOUBLE) / n_lines)
             / (CAST(SUM(n_returned) OVER () AS DOUBLE)
                / SUM(n_lines) OVER ()), 6) AS lift
FROM per
"""


def q_price_dispersion(spark, sf_dir):
    """Unit-price dispersion per brand: coefficient of variation of
    price-per-unit — pricing-consistency audit.  FULL oracle: unit
    prices round to 9 dp DECIMAL once, then mean/std come from exact
    decimal sums (closed form)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    t = load_tables(spark, sf_dir)["part"]
    up = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 9) \
        .cast("decimal(18,9)")
    terms = (li.join(t, F.col("l_partkey") == F.col("p_partkey"))
             .select("p_brand", up.alias("x"),
                     (up * up).cast("decimal(38,18)").alias("xx")))
    agg = (terms.groupBy("p_brand")
           .agg(F.count("*").cast("double").alias("n"),
                F.sum("x").cast("double").alias("sx"),
                F.sum("xx").cast("double").alias("sxx")))
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) \
        / (F.col("n") - 1)
    return (agg.where(F.col("n") > 1)
            .select("p_brand", F.col("n").cast("bigint").alias("n_lines"),
                    F.round(mean, 6).alias("mean_unit_price"),
                    F.round(F.sqrt(var) / mean, 6).alias("cv")))


_PRICE_DISPERSION_ORACLE = """
WITH t AS (
  SELECT p_brand,
         CAST(round(l_extendedprice / l_quantity, 9)
              AS DECIMAL(18,9)) AS x
  FROM lineitem JOIN part ON l_partkey = p_partkey),
a AS (SELECT p_brand,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
      FROM t GROUP BY 1 HAVING COUNT(*) > 1)
SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
       round(sx / n, 6) AS mean_unit_price,
       round(sqrt((sxx - sx * sx / n) / (n - 1)) / (sx / n), 6) AS cv
FROM a
"""


def q_ks_statistic(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic comparing account-
    balance distributions of the BUILDING vs MACHINERY segments —
    distribution-drift detection.  FULL oracle: the empirical CDFs are
    exact-count step functions (peer-inclusive RANGE frames handle
    ties identically), D = max |F₁−F₂| is an exact-rational compare."""
    from pyspark.sql import Window as W
    c = load_tables(spark, sf_dir)["customer"]
    pool = (c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select(F.col("c_acctbal").alias("val"),
                    (F.col("c_mktsegment") == "BUILDING")
                    .cast("int").alias("is_a")))
    n1 = F.sum("is_a").over(W.partitionBy())
    n2 = F.sum(1 - F.col("is_a")).over(W.partitionBy())
    wr = (W.orderBy("val")
          .rangeBetween(W.unboundedPreceding, W.currentRow))
    ca = F.sum("is_a").over(wr)
    cb = F.sum(1 - F.col("is_a")).over(wr)
    d = F.abs(ca.cast("double") / n1 - cb.cast("double") / n2)
    return (pool.select(n1.alias("n1"), n2.alias("n2"), d.alias("d"))
            .agg(F.max("n1").alias("n1"), F.max("n2").alias("n2"),
                 F.round(F.max("d"), 6).alias("ks")))


_KS_ORACLE = """
WITH pool AS (
  SELECT c_acctbal AS val,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
t AS (
  SELECT SUM(is_a) OVER () AS n1,
         SUM(1 - is_a) OVER () AS n2,
         abs(CAST(SUM(is_a) OVER w AS DOUBLE) / SUM(is_a) OVER ()
             - CAST(SUM(1 - is_a) OVER w AS DOUBLE)
               / SUM(1 - is_a) OVER ()) AS d
  FROM pool
  WINDOW w AS (ORDER BY val
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT MAX(n1) AS n1, MAX(n2) AS n2, round(MAX(d), 6) AS ks FROM t
"""


def q_mann_whitney(spark, sf_dir):
    """Mann–Whitney U (rank-sum) test between the same two segments,
    with tie-corrected normal approximation — the nonparametric
    location test.  FULL oracle: average ranks are exact .5-step
    decimals, the tie-correction sums are exact integers, z is one
    closed-form double."""
    from pyspark.sql import Window as W
    c = load_tables(spark, sf_dir)["customer"]
    pool = (c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select(F.col("c_acctbal").alias("val"),
                    (F.col("c_mktsegment") == "BUILDING")
                    .cast("int").alias("is_a")))
    # doubled average rank 2·ar = 2·rank + t − 1 stays an exact
    # INTEGER (no cross-engine decimal division); the tie-correction
    # Σ_groups(t³−t) accumulates row-wise as Σ_rows(t²−1)
    rk = F.rank().over(W.orderBy("val"))
    tie = F.count("*").over(W.partitionBy("val"))
    ranked = pool.select(
        "is_a", (2 * rk + tie - 1).alias("ar2"), tie.alias("t"))
    agg = ranked.agg(
        F.sum("is_a").cast("double").alias("n1"),
        F.sum(1 - F.col("is_a")).cast("double").alias("n2"),
        F.sum(F.when(F.col("is_a") == 1, F.col("ar2")).otherwise(0))
        .cast("double").alias("r1x2"),
        F.sum(F.col("t") * F.col("t") - 1).cast("double").alias("tcorr"),
        F.count("*").cast("double").alias("n"))
    u1 = (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)) / 2
    mu = F.col("n1") * F.col("n2") / 2
    var = (F.col("n1") * F.col("n2") / 12) \
        * ((F.col("n") + 1)
           - F.col("tcorr") / (F.col("n") * (F.col("n") - 1)))
    return agg.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        u1.alias("u"),
        F.round((u1 - mu) / F.sqrt(var), 6).alias("z"))


_MANN_WHITNEY_ORACLE = """
WITH pool AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a,
         c_acctbal AS val
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
ranked AS (
  SELECT is_a,
         2 * rank() OVER (ORDER BY val)
         + COUNT(*) OVER (PARTITION BY val) - 1 AS ar2,
         COUNT(*) OVER (PARTITION BY val) AS t
  FROM pool),
a AS (SELECT CAST(SUM(is_a) AS DOUBLE) AS n1,
             CAST(SUM(1 - is_a) AS DOUBLE) AS n2,
             CAST(SUM(CASE WHEN is_a = 1 THEN ar2 ELSE 0 END)
                  AS DOUBLE) AS r1x2,
             CAST(SUM(t * t - 1) AS DOUBLE) AS tcorr,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM ranked)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       (r1x2 - n1 * (n1 + 1)) / 2 AS u,
       round(((r1x2 - n1 * (n1 + 1)) / 2 - n1 * n2 / 2)
             / sqrt((n1 * n2 / 12)
                    * ((n + 1) - tcorr / (n * (n - 1)))), 6) AS z
FROM a
"""


def q_welch_ttest(spark, sf_dir):
    """Welch's t-test + Cohen's d between the two segments' balances —
    the parametric counterpart.  FULL oracle: means/variances from
    exact DECIMAL sums, t/df/d in closed form."""
    c = load_tables(spark, sf_dir)["customer"]
    x = F.col("c_acctbal").cast("decimal(12,2)")
    pool = (c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select((F.col("c_mktsegment") == "BUILDING")
                    .cast("int").alias("is_a"),
                    x.alias("x"),
                    (x * x).cast("decimal(28,4)").alias("xx")))
    g = (pool.groupBy("is_a")
         .agg(F.count("*").cast("double").alias("n"),
              F.sum("x").cast("double").alias("s"),
              F.sum("xx").cast("double").alias("ss")))
    a = g.where(F.col("is_a") == 1).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("ss").alias("ss1"))
    b = g.where(F.col("is_a") == 0).select(
        F.col("n").alias("n2"), F.col("s").alias("s2"),
        F.col("ss").alias("ss2"))
    j = a.crossJoin(b)
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    v1 = (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1")) \
        / (F.col("n1") - 1)
    v2 = (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2")) \
        / (F.col("n2") - 1)
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    t = (m1 - m2) / F.sqrt(se2)
    df = se2 * se2 / ((v1 / F.col("n1")) * (v1 / F.col("n1"))
                      / (F.col("n1") - 1)
                      + (v2 / F.col("n2")) * (v2 / F.col("n2"))
                      / (F.col("n2") - 1))
    sp = F.sqrt(((F.col("n1") - 1) * v1 + (F.col("n2") - 1) * v2)
                / (F.col("n1") + F.col("n2") - 2))
    return j.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(t, 6).alias("t"),
        F.round(df, 6).alias("df"),
        F.round((m1 - m2) / sp, 6).alias("cohens_d"))


_WELCH_ORACLE = """
WITH pool AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_a,
         CAST(c_acctbal AS DECIMAL(12,2)) AS x
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
g AS (SELECT is_a, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS s,
             CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS ss
      FROM pool GROUP BY 1),
j AS (SELECT a.n AS n1, a.s AS s1, a.ss AS ss1,
             b.n AS n2, b.s AS s2, b.ss AS ss2
      FROM (SELECT * FROM g WHERE is_a = 1) a,
           (SELECT * FROM g WHERE is_a = 0) b),
c AS (SELECT n1, n2,
             s1 / n1 AS m1, s2 / n2 AS m2,
             (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
             (ss2 - s2 * s2 / n2) / (n2 - 1) AS v2
      FROM j)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round(m1 - m2, 6) AS mean_diff,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df,
       round((m1 - m2)
             / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)),
             6) AS cohens_d
FROM c
"""


def q_revenue_peaks(spark, sf_dir):
    """Local maxima in the daily revenue series with prominence over
    the centered 7-day mean — spike detection.  FULL oracle: strict
    lag/lead compares on exact DECIMALs; the centered mean divides an
    exact frame sum by its exact frame count."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").alias("rev")))
    w = W.orderBy("day")
    wc = w.rowsBetween(-3, 3)
    prev, nxt = F.lag("rev").over(w), F.lead("rev").over(w)
    cmean = F.sum("rev").over(wc).cast("double") \
        / F.count("*").over(wc)
    return (daily
            .withColumn("prev", prev).withColumn("nxt", nxt)
            .withColumn("cmean", cmean)
            .where(F.col("prev").isNotNull() & F.col("nxt").isNotNull()
                   & (F.col("rev") > F.col("prev"))
                   & (F.col("rev") > F.col("nxt")))
            .select("day", F.col("rev").cast("double").alias("rev"),
                    F.round(F.col("rev").cast("double")
                            - F.col("cmean"), 6).alias("prominence")))


_REVENUE_PEAKS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1),
t AS (
  SELECT day, rev,
         lag(rev) OVER (ORDER BY day) AS prev,
         lead(rev) OVER (ORDER BY day) AS nxt,
         CAST(SUM(rev) OVER wc AS DOUBLE) / COUNT(*) OVER wc AS cmean
  FROM daily
  WINDOW wc AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
SELECT day, CAST(rev AS DOUBLE) AS rev,
       round(CAST(rev AS DOUBLE) - cmean, 6) AS prominence
FROM t
WHERE prev IS NOT NULL AND nxt IS NOT NULL
  AND rev > prev AND rev > nxt
"""


def q_level_shifts(spark, sf_dir):
    """Largest level shifts in daily revenue: |mean of next 7 days −
    mean of prior 7 days| per day, top-5 — the window-contrast
    changepoint heuristic.  FULL oracle: both means are exact frame
    sums over DECIMALs divided by exact counts; full-frame rows
    only."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").alias("rev")))
    w = W.orderBy("day")
    wb = w.rowsBetween(-7, -1)
    wa = w.rowsBetween(0, 6)
    mb = F.sum("rev").over(wb).cast("double") / F.count("*").over(wb)
    ma = F.sum("rev").over(wa).cast("double") / F.count("*").over(wa)
    return (daily
            .withColumn("shift", F.round(F.abs(ma - mb), 6))
            .withColumn("cb", F.count("*").over(wb))
            .withColumn("ca", F.count("*").over(wa))
            .where((F.col("cb") == 7) & (F.col("ca") == 7))
            .select("day", "shift")
            .orderBy(F.col("shift").desc(), "day").limit(5))


_LEVEL_SHIFTS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1),
t AS (
  SELECT day,
         round(abs(CAST(SUM(rev) OVER wa AS DOUBLE)
                   / COUNT(*) OVER wa
                   - CAST(SUM(rev) OVER wb AS DOUBLE)
                     / COUNT(*) OVER wb), 6) AS shift,
         COUNT(*) OVER wb AS cb, COUNT(*) OVER wa AS ca
  FROM daily
  WINDOW wb AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
         wa AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING))
SELECT day, shift FROM t WHERE cb = 7 AND ca = 7
ORDER BY shift DESC, day LIMIT 5
"""


def q_session_event_pairs(spark, sf_dir):
    """Within-session event-type co-occurrence lift: which action
    pairs happen in the same 30-min session more than independence
    predicts.  FULL oracle: session ids replay the gap-break cumsum,
    all probabilities are exact session-count ratios."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") \
        - F.lag(F.col("ts").cast("double")).over(w)
    brk = F.when(gap > 30 * 60, 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0))
    st = (ev.withColumn("sess", sess)
          .select("user_id", "sess", "event_type").distinct())
    nses = (st.select("user_id", "sess").distinct()
            .agg(F.count("*").alias("n_sessions")))
    per = st.groupBy("event_type").agg(F.count("*").alias("c"))
    a, b = st.alias("a"), st.alias("b")
    pairs = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.sess") == F.col("b.sess"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("et_a"),
                      F.col("b.event_type").alias("et_b"))
             .agg(F.count("*").alias("cab")))
    j = (pairs
         .join(per.select(F.col("event_type").alias("et_a"),
                          F.col("c").alias("ca")), "et_a")
         .join(per.select(F.col("event_type").alias("et_b"),
                          F.col("c").alias("cb")), "et_b")
         .crossJoin(nses))
    lift = (F.col("cab").cast("double") * F.col("n_sessions")) \
        / (F.col("ca") * F.col("cb"))
    return j.select("et_a", "et_b", "cab",
                    F.round(lift, 6).alias("lift"))


_SESSION_PAIRS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM (SELECT user_id, event_type, ts, event_id,
               epoch(ts) - lag(epoch(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS gap
        FROM events)),
st AS (SELECT DISTINCT user_id, sess, event_type FROM s),
nses AS (SELECT COUNT(*) AS n_sessions
         FROM (SELECT DISTINCT user_id, sess FROM st)),
per AS (SELECT event_type, COUNT(*) AS c FROM st GROUP BY 1),
pairs AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b, COUNT(*) AS cab
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sess = b.sess
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT et_a, et_b, cab,
       round(CAST(cab AS DOUBLE) * n_sessions / (ca.c * cb.c), 6)
       AS lift
FROM pairs
JOIN per ca ON ca.event_type = et_a
JOIN per cb ON cb.event_type = et_b, nses
"""


def q_ssjoin_exact(spark, sf_dir):
    """EXACT set-similarity self-join (PPJoin-style prefix filtering):
    every document pair with 3-shingle Jaccard >= 0.5, no false
    negatives — the lossless counterpart to q:minhash_pairs (which
    trades recall for speed).  Candidate generation joins only the
    rarest ``n - ceil(t*n) + 1`` shingles of each document (global
    rarest-first order), so the join fan-out is bounded by
    rare-shingle document frequencies, never all-pairs.  The oracle
    is *independent* of the pruning strategy: it computes pair
    intersections with a plain shingle equi-join + count, so a prefix
    filter bug that dropped a true pair would hash-mismatch."""
    return dedup.ssjoin_jaccard(_docs(spark, sf_dir), threshold=0.5)


_SSJOIN_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
        i -> CAST(('0x' || substr(md5(
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))
             AS BIGINT))) AS s
  FROM toks WHERE len(ws) >= 3
), tt AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         count(*) AS i
  FROM tt a JOIN tt b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, round(CAST(i AS DOUBLE)/(na+nb-i), 6) AS jaccard
FROM inter WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.5
"""


def q_closeness_nations(spark, sf_dir):
    """Closeness + harmonic centrality for all 25 Nation nodes over the
    undirected Region-Nation-Customer-Order subgraph, depth <= 3 —
    multi-source labeled BFS where k sources ride the frontier KEY
    (one frame keyed (source, uid)), so 25 sources cost the same
    number of Spark rounds as one.  Exact integer (reached, sum_dist)
    plus two engine-portable IEEE divisions; the harmonic sum is an
    integer ladder scaled by lcm(1..3)=6, so no float accumulation
    order exists anywhere."""
    t = load_tables(spark, sf_dir)
    g = tpch_graph(spark, sf_dir)
    seeds = t["nation"].select(
        F.concat(F.lit("Nation:"), F.col("n_nationkey")).alias("uid"))
    edges = g.edges_df.where(
        F.col("kind").isin("InRegion", "FromNation", "Placed"))
    return graph_algos.closeness_centrality(edges, seeds, max_depth=3,
                                            direction="both")


_CLOSENESS_ORACLE = """
WITH RECURSIVE
ed(a, b) AS (
  SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
         'Region:' || CAST(n_regionkey AS VARCHAR) FROM nation
  UNION ALL
  SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
         'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
  UNION ALL
  SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
         'Nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR),
         'Customer:' || CAST(c_custkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'Customer:' || CAST(o_custkey AS VARCHAR),
         'Order:' || CAST(o_orderkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'Order:' || CAST(o_orderkey AS VARCHAR),
         'Customer:' || CAST(o_custkey AS VARCHAR) FROM orders
),
walk(source, uid, d) AS (
  SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
         'Nation:' || CAST(n_nationkey AS VARCHAR), 0 FROM nation
  UNION
  SELECT w.source, ed.b, w.d + 1 FROM walk w
  JOIN ed ON ed.a = w.uid WHERE w.d < 3
),
md AS (SELECT source, uid, MIN(d) AS d FROM walk GROUP BY 1, 2),
per AS (SELECT source, d, COUNT(*) AS c FROM md WHERE d > 0 GROUP BY 1, 2)
SELECT source, CAST(SUM(c) AS BIGINT) AS reached,
       CAST(SUM(c * d) AS BIGINT) AS sum_dist,
       round(CAST(SUM(c) AS DOUBLE) / SUM(c * d), 6) AS closeness,
       round(SUM(c * (6 // d)) / 6.0, 6) AS harmonic
FROM per GROUP BY source
"""


def _holt_coeffs(T: int = 12, horizons=(1, 2, 3, 4)):
    """Holt's linear trend method (double exponential smoothing,
    alpha=beta=1/2) UNROLLED to exact dyadic-rational coefficients over
    the last T observations: l_t and b_t are linear in y_1..y_t, so the
    h-step forecast l_T + h*b_T is one integer dot product.  Computing
    the coefficients once in ``fractions.Fraction`` and sharing the
    SAME integer ladder with the DuckDB oracle removes every source of
    cross-engine float drift — the recursion never executes at query
    time in either engine.

    Returns (D, {h: [num_1..num_T]}) with coefficient_i = num_i / D.
    """
    from fractions import Fraction
    half = Fraction(1, 2)
    # l/b as coefficient vectors over y_1..y_T (1-indexed at i-1)
    l = [Fraction(0)] * T
    b = [Fraction(0)] * T
    l[0] = Fraction(1)                       # l_1 = y_1
    b[0], b[1] = Fraction(-1), Fraction(1)   # b_1 = y_2 - y_1
    for t in range(1, T):                    # observations y_2..y_T
        prev_l = l[:]
        l = [half * lv + half * bv for lv, bv in zip(l, b)]
        l[t] += half
        b = [half * (lv - pv) + half * bv
             for lv, pv, bv in zip(l, prev_l, b)]
    out = {h: [l[i] + h * b[i] for i in range(T)] for h in horizons}
    denom = 1
    for cs in out.values():
        for c in cs:
            denom = denom * c.denominator // math.gcd(denom, c.denominator)
    return denom, {h: [int(c * denom) for c in cs]
                   for h, cs in out.items()}


_HOLT_T = 12
_HOLT_D, _HOLT_NUMS = _holt_coeffs(_HOLT_T)


def q_holt_forecast(spark, sf_dir):
    """1..4-week-ahead revenue forecast by Holt's linear trend method
    over the last 12 weeks of order revenue.  The smoothing recursion
    is unrolled to an exact integer coefficient ladder (see
    :func:`_holt_coeffs`), so the whole forecast is: weekly DECIMAL
    cents -> pick last 12 -> one broadcast join against 48 literal
    coefficients -> integer dot product -> two IEEE divisions.  Scale:
    the only full-data pass is the weekly aggregation (map-side
    partial); everything after operates on <= 12 rows."""
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("week"))
              .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    * 100).cast("decimal(38,0)").alias("cents")))
    from pyspark.sql import Window as W
    rn = F.row_number().over(W.orderBy(F.col("week").desc()))
    last = (weekly.withColumn("_rn", rn).where(F.col("_rn") <= _HOLT_T)
            .select((F.lit(_HOLT_T + 1) - F.col("_rn")).alias("i"),
                    "cents"))
    coef = spark.createDataFrame(
        [(h, i + 1, _HOLT_NUMS[h][i])
         for h in sorted(_HOLT_NUMS) for i in range(_HOLT_T)],
        "h int, i int, num long")
    return (last.join(F.broadcast(coef), "i")
            .groupBy("h")
            .agg(F.sum(F.col("num") * F.col("cents"))
                  .cast("decimal(38,0)").alias("_s"))
            .select(F.col("h").alias("horizon"),
                    F.round(F.col("_s").cast("double") / _HOLT_D / 100.0,
                            4).alias("forecast")))


def _holt_oracle_sql() -> str:
    vals = ", ".join(f"({h}, {i + 1}, {_HOLT_NUMS[h][i]})"
                     for h in sorted(_HOLT_NUMS) for i in range(_HOLT_T))
    return f"""
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS week,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(38,0)) AS cents
  FROM orders GROUP BY 1
), last AS (
  SELECT {_HOLT_T} + 1 - row_number() OVER (ORDER BY week DESC) AS i,
         cents
  FROM weekly ORDER BY week DESC LIMIT {_HOLT_T}
), coef(h, i, num) AS (VALUES {vals})
SELECT h AS horizon,
       round(CAST(SUM(num * cents) AS DOUBLE) / {_HOLT_D} / 100.0, 4)
       AS forecast
FROM last JOIN coef USING (i) GROUP BY h
"""


def q_priority_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (priority sampling,
    Duffield-Lund-Thorup): 64 orders drawn proportionally to revenue,
    as a pure function of (orderkey, salt) — reproducible across
    reruns, engines, partitionings and retries.  Plan: narrow map to
    integer cents + one md5-derived priority, then TakeOrdered top-64
    (no global sort shuffle)."""
    from .operators import pipeline
    o = load_tables(spark, sf_dir)["orders"]
    w = o.select("o_orderkey",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("cents"))
    return pipeline.priority_sample(w, "cents", 64, key_col="o_orderkey")


_PRIORITY_SAMPLE_ORACLE = """
WITH w AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         CAST(('0x' || substr(md5('ps:' || CAST(o_orderkey AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h
  FROM orders)
SELECT o_orderkey, cents,
       CAST(cents AS DOUBLE) * 1152921504606846976.0
             / CAST(h + 1 AS DOUBLE) AS priority
FROM w ORDER BY priority DESC, o_orderkey LIMIT 64
"""


def q_local_clustering(spark, sf_dir):
    """Per-node local clustering coefficient of the part co-purchase
    graph — 2*tri/(deg*(deg-1)) for every part with degree >= 2.  Same
    degree-ranked orientation as q:triangles_copurchase (wedge work
    bounded O(m^1.5), shuffled data O(m) + true triangle stream).  The
    oracle counts each node's triangles independently via the plain
    three-way edge join, so an orientation/crediting bug cannot
    self-confirm."""
    n_part = spark.sparkContext.defaultParallelism * 2
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey")
          .repartition(n_part, "l_orderkey"))
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").alias("pa"),
                  F.col("b.l_partkey").alias("pb")))
    out = graph_algos.local_clustering(co, "pa", "pb")
    return out.select(F.col("v").alias("l_partkey"), "deg", "tri", "lcc")


_LOCAL_CLUSTERING_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT lo AS v FROM e UNION ALL SELECT hi FROM e) GROUP BY v),
tri3 AS (
  SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
  FROM e ab JOIN e bc ON ab.hi = bc.lo
  JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
pn AS (
  SELECT v, COUNT(*) AS tri FROM (
    SELECT a AS v FROM tri3 UNION ALL SELECT b FROM tri3
    UNION ALL SELECT c FROM tri3) GROUP BY v)
SELECT d.v AS l_partkey, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(pn.tri, 0) AS BIGINT) AS tri,
       round(2.0 * COALESCE(pn.tri, 0) / (d.deg * (d.deg - 1)), 6)
         AS lcc
FROM deg d LEFT JOIN pn ON pn.v = d.v
WHERE d.deg >= 2
"""


def q_seq_triples(spark, sf_dir):
    """Sequential pattern mining, order-3: contiguous event-type
    trigrams along each user's timeline (ordered by ts, event_id — the
    deterministic total order) with support >= 10.  One shuffle: the
    per-user window; the trigram aggregation map-side combines.  The
    PrefixSpan-lite shape for 'what do users do next' funnels."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (ev.select("user_id", "ts", "event_id", "event_type")
         .withColumn("e2", F.lead("event_type", 1).over(w))
         .withColumn("e3", F.lead("event_type", 2).over(w))
         .where(F.col("e3").isNotNull()))
    return (t.groupBy(F.col("event_type").alias("et1"),
                      F.col("e2").alias("et2"),
                      F.col("e3").alias("et3"))
            .agg(F.count("*").alias("support"))
            .where(F.col("support") >= 10))


_SEQ_TRIPLES_ORACLE = """
WITH t AS (
  SELECT event_type AS et1,
         lead(event_type, 1) OVER w AS et2,
         lead(event_type, 2) OVER w AS et3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT et1, et2, et3, COUNT(*) AS support
FROM t WHERE et3 IS NOT NULL
GROUP BY 1, 2, 3 HAVING COUNT(*) >= 10
"""


def q_embedding_covariance(spark, sf_dir):
    """Exact population covariance matrix of the embedding corpus
    (upper triangle, 64x65/2 = 2080 cells) — the X^T X building block
    behind PCA/whitening at corpus scale.  Embeddings quantize to a
    1e-6 integer grid, so every accumulation is EXACT integer math
    (no float summation order anywhere); cov = (n*S_ij - s_i*s_j)
    / n^2 / 1e12 with the numerator in DECIMAL(38,0) and two final
    IEEE divisions.

    Scale shape: the outer products are generated per row by a nested
    JVM ``transform`` over the array (narrow map — NO self-join) and
    collapse in one map-side-combined groupBy on (i, j); only 2080
    keys ever cross the wire.  The moment sums are a second narrow
    pass; dims and the row count broadcast back onto the cell frame."""
    emb = _emb(spark, sf_dir)
    q = emb.select(
        F.transform(F.col("embedding"),
                    lambda x: F.round(x.cast("double") * 1e6)
                    .cast("long")).alias("q"))
    arr = F.col("q")
    outer = F.flatten(F.transform(
        arr, lambda x, i: F.transform(
            F.slice(arr, i + 1, F.size(arr)),
            lambda y, j: F.struct(i.alias("i"),
                                  (i + j).alias("j"),
                                  (x * y).alias("p")))))
    cells = (q.select(F.explode(outer).alias("c"))
             .select("c.i", "c.j", "c.p")
             .groupBy("i", "j")
             .agg(F.sum("p").cast("decimal(38,0)").alias("s_ij")))
    mom = (q.select(F.posexplode("q").alias("i", "v"))
           .groupBy("i").agg(F.sum("v").cast("decimal(38,0)").alias("s")))
    n = emb.count()
    num = (F.lit(n).cast("decimal(38,0)") * F.col("s_ij")
           - F.col("s_i") * F.col("s_j"))
    return (cells
            .join(F.broadcast(mom.select(F.col("i"),
                                         F.col("s").alias("s_i"))), "i")
            .join(F.broadcast(mom.select(F.col("i").alias("j"),
                                         F.col("s").alias("s_j"))), "j")
            .select("i", "j",
                    # + 0.0 folds IEEE -0.0 to +0.0 (a tiny negative
                    # covariance rounds to -0.0 in DuckDB, +0.0 here)
                    (F.round(num.cast("double") / n / n / 1e12, 6)
                     + F.lit(0.0)).alias("cov")))


_EMB_COV_ORACLE = """
WITH q AS (
  SELECT vec_id, CAST(t.i AS INT) AS i,
         CAST(round(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                    * 1e6) AS BIGINT) AS v
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
n AS (SELECT COUNT(DISTINCT vec_id) AS n FROM q),
cells AS (
  SELECT a.i AS i, b.i AS j, SUM(a.v * b.v) AS s_ij
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2),
mom AS (SELECT i, SUM(v) AS s FROM q GROUP BY i)
SELECT c.i, c.j,
       round(CAST(n.n * c.s_ij - mi.s * mj.s AS DOUBLE)
             / n.n / n.n / 1e12, 6) + 0.0 AS cov
FROM cells c
JOIN mom mi ON mi.i = c.i
JOIN mom mj ON mj.i = c.j, n
"""


def q_interval_coverage(spark, sf_dir):
    """Union length of overlapping per-user activity intervals
    (event ts .. ts + value seconds): gaps-and-islands with a running
    max-end — the interval-algebra shape (utilization, SLA coverage,
    dedup of overlapping spans).  Integer epoch seconds end to end;
    one window shuffle on user_id."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir)
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long")
         + F.col("value").cast("long")).alias("e"),
        "event_id")
    w = (W.partitionBy("user_id").orderBy("s", "e", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    run = (iv.withColumn("prev_max_e", F.max("e").over(w))
           .withColumn("covered",
                       F.greatest(
                           F.col("e")
                           - F.greatest(F.col("s"),
                                        F.coalesce(F.col("prev_max_e"),
                                                   F.col("s"))),
                           F.lit(0))))
    return (run.groupBy("user_id")
            .agg(F.sum("covered").cast("long").alias("covered_sec"),
                 F.count("*").alias("n_intervals")))


_INTERVAL_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CAST(floor(value) AS BIGINT) AS e,
         event_id
  FROM events),
run AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv)
SELECT user_id,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(prev_max_e, s)), 0))
            AS BIGINT) AS covered_sec,
       COUNT(*) AS n_intervals
FROM run GROUP BY user_id
"""


def q_betweenness_customers(spark, sf_dir):
    """Source-sampled betweenness centrality (truncated Brandes) over
    the Customer-Order-Part purchase graph from 10 pinned customer
    sources, depth <= 3.  Exact integer shortest-path counts (sigma)
    ride the (source, uid) frontier key; the backward dependency sweep
    accumulates 9 dp DECIMAL terms so layer sums are associative and
    the unrolled-CTE oracle replays them bit-for-bit."""
    t = load_tables(spark, sf_dir)
    g = tpch_graph(spark, sf_dir)
    seeds = (t["customer"].where(F.col("c_custkey") <= 10)
             .select(F.concat(F.lit("Customer:"),
                              F.col("c_custkey")).alias("uid")))
    edges = g.edges_df.where(F.col("kind").isin("Placed", "Contains"))
    return graph_algos.betweenness_sampled(edges, seeds, max_depth=3)


_BETWEENNESS_ORACLE = """
WITH
edd AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT 'Customer:' || CAST(o_custkey AS VARCHAR) AS a,
           'Order:' || CAST(o_orderkey AS VARCHAR) AS b FROM orders
    UNION ALL
    SELECT 'Order:' || CAST(o_orderkey AS VARCHAR),
           'Customer:' || CAST(o_custkey AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
           'Part:' || CAST(l_partkey AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'Part:' || CAST(l_partkey AS VARCHAR),
           'Order:' || CAST(l_orderkey AS VARCHAR) FROM lineitem)),
f0 AS MATERIALIZED (
  SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS source,
         'Customer:' || CAST(c_custkey AS VARCHAR) AS uid,
         CAST(1 AS BIGINT) AS sigma
  FROM customer WHERE c_custkey <= 10),
f1 AS MATERIALIZED (
  SELECT f0.source, edd.b AS uid, CAST(SUM(f0.sigma) AS BIGINT) AS sigma
  FROM f0 JOIN edd ON edd.a = f0.uid
  LEFT JOIN f0 p ON p.source = f0.source AND p.uid = edd.b
  WHERE p.uid IS NULL GROUP BY 1, 2),
f2 AS MATERIALIZED (
  SELECT f1.source, edd.b AS uid, CAST(SUM(f1.sigma) AS BIGINT) AS sigma
  FROM f1 JOIN edd ON edd.a = f1.uid
  LEFT JOIN (SELECT source, uid FROM f0
             UNION SELECT source, uid FROM f1) v
    ON v.source = f1.source AND v.uid = edd.b
  WHERE v.uid IS NULL GROUP BY 1, 2),
f3 AS MATERIALIZED (
  SELECT f2.source, edd.b AS uid, CAST(SUM(f2.sigma) AS BIGINT) AS sigma
  FROM f2 JOIN edd ON edd.a = f2.uid
  LEFT JOIN (SELECT source, uid FROM f0
             UNION SELECT source, uid FROM f1
             UNION SELECT source, uid FROM f2) v
    ON v.source = f2.source AND v.uid = edd.b
  WHERE v.uid IS NULL GROUP BY 1, 2),
sp2 AS MATERIALIZED (
  SELECT f2.source, f2.uid AS v, f3.uid AS w, f2.sigma AS sv,
         f3.sigma AS sw
  FROM f2 JOIN edd ON edd.a = f2.uid
  JOIN f3 ON f3.source = f2.source AND f3.uid = edd.b),
sp1 AS MATERIALIZED (
  SELECT f1.source, f1.uid AS v, f2.uid AS w, f1.sigma AS sv,
         f2.sigma AS sw
  FROM f1 JOIN edd ON edd.a = f1.uid
  JOIN f2 ON f2.source = f1.source AND f2.uid = edd.b),
d2 AS MATERIALIZED (
  SELECT source, v AS uid,
         SUM(CAST(round(CAST(sv AS DOUBLE) / sw * 1.0, 9)
                  AS DECIMAL(18,9))) AS delta
  FROM sp2 GROUP BY 1, 2),
d1 AS MATERIALIZED (
  SELECT sp1.source, sp1.v AS uid,
         SUM(CAST(round(CAST(sp1.sv AS DOUBLE) / sp1.sw
                        * (1.0 + CAST(COALESCE(d2.delta, 0) AS DOUBLE)),
                        9) AS DECIMAL(18,9))) AS delta
  FROM sp1 LEFT JOIN d2 ON d2.source = sp1.source AND d2.uid = sp1.w
  GROUP BY 1, 2),
contrib AS (
  SELECT f1.source, f1.uid,
         COALESCE(d1.delta, CAST(0 AS DECIMAL(18,9))) AS delta
  FROM f1 LEFT JOIN d1 ON d1.source = f1.source AND d1.uid = f1.uid
  UNION ALL
  SELECT f2.source, f2.uid,
         COALESCE(d2.delta, CAST(0 AS DECIMAL(18,9)))
  FROM f2 LEFT JOIN d2 ON d2.source = f2.source AND d2.uid = f2.uid
  UNION ALL
  SELECT source, uid, CAST(0 AS DECIMAL(18,9)) FROM f3)
SELECT uid, round(CAST(SUM(delta) AS DOUBLE), 6) AS betweenness
FROM contrib GROUP BY uid
"""


def q_minhash_recall(spark, sf_dir):
    """Dedup-pipeline QUALITY AUDIT: recall of the MinHash LSH
    candidate generator against the exact prefix-filtered set-
    similarity join at Jaccard >= 0.5 — the measurement that tells a
    100 TB pipeline owner whether the cheap approximate pass is
    missing real duplicates.  Three scalar aggregates broadcast-joined
    into one row; both operand pipelines are the already-oracled
    q:minhash_pairs and q:ssjoin_exact plans."""
    exact = (dedup.ssjoin_jaccard(_docs(spark, sf_dir), threshold=0.5)
             .select("id_a", "id_b"))
    cand = q_minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    hit = exact.join(cand, ["id_a", "id_b"], "left_semi")
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    return (n_exact.crossJoin(F.broadcast(n_cand))
            .crossJoin(F.broadcast(n_hit))
            .select("n_exact", "n_cand", "n_hit",
                    F.round(F.col("n_hit") * 1.0 / F.col("n_exact"), 6)
                     .alias("recall")))


_MINHASH_RECALL_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
        i -> CAST(('0x' || substr(md5(
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))
             AS BIGINT))) AS s
  FROM toks WHERE len(ws) >= 3),
tt AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         count(*) AS i
  FROM tt a JOIN tt b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
exact AS (
  SELECT id_a, id_b FROM inter
  WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.5),
mh AS (
  SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
        i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
        AS mh
  FROM toks WHERE len(ws) >= 3),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mh a JOIN mh b ON a.mh = b.mh AND a.doc_id < b.doc_id),
hit AS (SELECT * FROM exact INTERSECT SELECT * FROM cand)
SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
       (SELECT COUNT(*) FROM cand) AS n_cand,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       round((SELECT COUNT(*) FROM hit) * 1.0
             / (SELECT COUNT(*) FROM exact), 6) AS recall
"""


def q_stratified_topn(spark, sf_dir):
    """EXACTLY-n-per-stratum deterministic sample (the fixed-quota
    complement to rate-based stratified_sample): 20 documents per
    language chosen by hash order — reproducible, partition-invariant,
    and stable under corpus growth *within* the kept set's hash
    prefix.  One window shuffle on the stratum key; at scale the
    row_number cutoff keeps per-task state at n."""
    from pyspark.sql import Window as W
    docs = _docs(spark, sf_dir)
    h = text.hash60(F.concat(F.lit("topn:"),
                             F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(F.col("_h"), F.col("doc_id"))
    return (docs.withColumn("_h", h)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 20)
            .select("lang", "doc_id"))


_STRATIFIED_TOPN_ORACLE = """
WITH h AS (
  SELECT lang, doc_id,
         CAST(('0x' || substr(md5('topn:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS hv
  FROM documents),
r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
           AS rn
  FROM h)
SELECT lang, doc_id FROM r WHERE rn <= 20
"""


def q_funnel_windowed(spark, sf_dir):
    """Time-boxed ordered funnel view -> click -> purchase: for each
    user, the earliest view, then the earliest click strictly after it
    within 72 h, then the earliest purchase strictly after that click
    within 72 h.  Per-step user counts + median step latencies —
    integer epoch seconds throughout.  Plan: three per-user min-
    aggregations over pre-filtered event slivers (each a map-side
    combine), chained with two broadcast-sized joins on user_id."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type",
        F.col("ts").cast("long").alias("t"))
    lim = 72 * 3600
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("t").alias("tv")))
    c = (ev.where(F.col("event_type") == "click")
         .join(v, "user_id")
         .where((F.col("t") > F.col("tv"))
                & (F.col("t") <= F.col("tv") + lim))
         .groupBy("user_id", "tv").agg(F.min("t").alias("tc")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .where((F.col("t") > F.col("tc"))
                & (F.col("t") <= F.col("tc") + lim))
         .groupBy("user_id", "tv", "tc").agg(F.min("t").alias("tp")))
    n_view = v.agg(F.count("*").alias("n_view"))
    n_click = c.agg(F.count("*").alias("n_click"),
                    F.sum(F.col("tc") - F.col("tv")).cast("long")
                    .alias("sum_view_to_click"))
    n_buy = p.agg(F.count("*").alias("n_purchase"),
                  F.sum(F.col("tp") - F.col("tc")).cast("long")
                  .alias("sum_click_to_buy"))
    return (n_view.crossJoin(F.broadcast(n_click))
            .crossJoin(F.broadcast(n_buy))
            .select("n_view", "n_click", "n_purchase",
                    "sum_view_to_click", "sum_click_to_buy",
                    F.round(F.col("n_purchase") * 1.0
                            / F.col("n_view"), 6).alias("conversion")))


_FUNNEL_WINDOWED_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
v AS (
  SELECT user_id, MIN(t) AS tv FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT ev.user_id, v.tv, MIN(ev.t) AS tc
  FROM ev JOIN v ON v.user_id = ev.user_id
  WHERE ev.event_type = 'click' AND ev.t > v.tv
    AND ev.t <= v.tv + 72*3600
  GROUP BY 1, 2),
p AS (
  SELECT ev.user_id, c.tv, c.tc, MIN(ev.t) AS tp
  FROM ev JOIN c ON c.user_id = ev.user_id
  WHERE ev.event_type = 'purchase' AND ev.t > c.tc
    AND ev.t <= c.tc + 72*3600
  GROUP BY 1, 2, 3)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase,
       (SELECT CAST(SUM(tc - tv) AS BIGINT) FROM c)
         AS sum_view_to_click,
       (SELECT CAST(SUM(tp - tc) AS BIGINT) FROM p)
         AS sum_click_to_buy,
       round((SELECT COUNT(*) FROM p) * 1.0
             / (SELECT COUNT(*) FROM v), 6) AS conversion
"""


def q_psi_drift(spark, sf_dir):
    """Population Stability Index per price bucket — the ML-ops drift
    metric between a reference window (orders before 1998) and the
    current window: psi_b = (p_cur - p_b_ref) * ln(p_cur/p_ref).
    libm-proof: every ln runs on an INTEGER count (ln(p_cur/p_ref) =
    ln(n_cur) + ln(N_ref) - ln(n_ref) - ln(N_cur)), each rounded to
    9 dp DECIMAL before any arithmetic; proportions are 9 dp DECIMAL
    ratios; the product is exact.  Buckets present in only one window
    are excluded (standard PSI practice).  One aggregation shuffle on
    (bucket, window) + broadcast scalar totals."""
    o = load_tables(spark, sf_dir)["orders"]
    # explicit 50k-wide buckets (width_bucket is missing in DuckDB 1.0;
    # floor-division is the portable equivalent)
    b = F.least(F.lit(12),
                (F.floor(F.col("o_totalprice").cast("double") / 50000.0)
                 + 1).cast("int"))
    cnt = (o.select(b.alias("bucket"),
                    (F.col("o_orderdate") < F.lit("1998-01-01"))
                    .alias("is_ref"))
           .groupBy("bucket", "is_ref").agg(F.count("*").alias("n")))
    ref = cnt.where(F.col("is_ref")).select(
        "bucket", F.col("n").alias("n_ref"))
    cur = cnt.where(~F.col("is_ref")).select(
        "bucket", F.col("n").alias("n_cur"))
    tot = (cnt.groupBy("is_ref").agg(F.sum("n").alias("t"))
           .groupBy()
           .pivot("is_ref", [True, False]).agg(F.first("t"))
           .select(F.col("true").alias("t_ref"),
                   F.col("false").alias("t_cur")))

    def ln9(c):
        return F.round(F.log(c.cast("double")), 9).cast("decimal(18,9)")

    j = ref.join(cur, "bucket").crossJoin(F.broadcast(tot))
    p_ref = F.round(F.col("n_ref") / F.col("t_ref"), 9) \
        .cast("decimal(18,9)")
    p_cur = F.round(F.col("n_cur") / F.col("t_cur"), 9) \
        .cast("decimal(18,9)")
    lnr = (ln9(F.col("n_cur")) + ln9(F.col("t_ref"))
           - ln9(F.col("n_ref")) - ln9(F.col("t_cur")))
    return (j.select("bucket", "n_ref", "n_cur",
                     ((p_cur - p_ref) * lnr).cast("double").alias("_t"))
            .select("bucket", "n_ref", "n_cur",
                    (F.round(F.col("_t"), 9) + F.lit(0.0))
                    .alias("psi_term")))


_PSI_DRIFT_ORACLE = """
WITH cnt AS (
  SELECT LEAST(12, CAST(floor(CAST(o_totalprice AS DOUBLE) / 50000.0)
                        AS INT) + 1) AS bucket,
         o_orderdate < DATE '1998-01-01' AS is_ref,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
ref AS (SELECT bucket, n AS n_ref FROM cnt WHERE is_ref),
cur AS (SELECT bucket, n AS n_cur FROM cnt WHERE NOT is_ref),
tot AS (
  SELECT SUM(CASE WHEN is_ref THEN n END) AS t_ref,
         SUM(CASE WHEN NOT is_ref THEN n END) AS t_cur FROM cnt)
SELECT bucket, n_ref, n_cur,
       round(CAST(
         (CAST(round(n_cur * 1.0 / t_cur, 9) AS DECIMAL(18,9))
          - CAST(round(n_ref * 1.0 / t_ref, 9) AS DECIMAL(18,9)))
         * (CAST(round(ln(n_cur), 9) AS DECIMAL(18,9))
            + CAST(round(ln(t_ref), 9) AS DECIMAL(18,9))
            - CAST(round(ln(n_ref), 9) AS DECIMAL(18,9))
            - CAST(round(ln(t_cur), 9) AS DECIMAL(18,9)))
         AS DOUBLE), 9) + 0.0 AS psi_term
FROM ref JOIN cur USING (bucket), tot
"""


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (Xie et al. NeurIPS 2023): top-100
    documents by unigram log importance ratio between the English
    target slice and the whole corpus — the cheap domain-tilt selector
    for crawl-scale data.  One token pass builds BOTH add-one models
    (conditional counts in the same aggregation); 6 dp DECIMAL
    log-ratio terms keep the score order-independent."""
    from .operators import pipeline
    return pipeline.dsir_select(_docs(spark, sf_dir),
                                F.col("lang") == "en", n=100)


_DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         unnest(list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x != '')) AS tok
  FROM documents),
freq AS (
  SELECT tok, COUNT(*) AS tf_all,
         SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tf_tgt
  FROM toks GROUP BY tok),
s AS (SELECT SUM(tf_all) + COUNT(*) AS denom_all,
             SUM(tf_tgt) + COUNT(*) AS denom_tgt FROM freq),
scored AS (
  SELECT t.doc_id,
         SUM(CAST(round(log10((f.tf_tgt + 1) * 1.0 / s.denom_tgt), 6)
                  AS DECIMAL(18,6))
             - CAST(round(log10((f.tf_all + 1) * 1.0 / s.denom_all), 6)
                    AS DECIMAL(18,6))) AS r,
         COUNT(*) AS n_tokens
  FROM toks t JOIN freq f USING (tok), s
  GROUP BY t.doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CAST(r AS DOUBLE), 6) + 0.0 AS log_ratio
FROM scored ORDER BY log_ratio DESC, doc_id LIMIT 100
"""


def q_hits_copurchase(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg) over the bipartite
    customer->part purchase graph, 2 unnormalized power iterations —
    every score an exact INTEGER (h = A a, a = A^T h from all-ones),
    ranking-equivalent to the normalized variant and bit-portable to
    the SQL replay.  Two join+sum shuffles per iteration over an
    edge frame partitioned once."""
    t = load_tables(spark, sf_dir)
    cp = (t["orders"].select("o_orderkey", "o_custkey")
          .join(load_tables(spark, sf_dir)["lineitem"]
                .select("l_orderkey", "l_partkey"),
                F.col("o_orderkey") == F.col("l_orderkey"))
          .select(F.concat(F.lit("Customer:"),
                           F.col("o_custkey")).alias("startuid"),
                  F.concat(F.lit("Part:"),
                           F.col("l_partkey")).alias("enduid")))
    return graph_algos.hits_integer(cp, iters=2)


_HITS_ORACLE = """
WITH e AS (
  SELECT DISTINCT 'Customer:' || CAST(o_custkey AS VARCHAR) AS s,
         'Part:' || CAST(l_partkey AS VARCHAR) AS d
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
h1 AS (SELECT s AS uid, COUNT(*) AS h FROM e GROUP BY s),
a1 AS (
  SELECT e.d AS uid, SUM(h1.h) AS a
  FROM e JOIN h1 ON h1.uid = e.s GROUP BY e.d),
h2 AS (
  SELECT e.s AS uid, SUM(a1.a) AS h
  FROM e JOIN a1 ON a1.uid = e.d GROUP BY e.s),
a2 AS (
  SELECT e.d AS uid, SUM(h2.h) AS a
  FROM e JOIN h2 ON h2.uid = e.s GROUP BY e.d)
SELECT COALESCE(h2.uid, a2.uid) AS uid,
       CAST(COALESCE(h2.h, 0) AS BIGINT) AS hub,
       CAST(COALESCE(a2.a, 0) AS BIGINT) AS authority
FROM h2 FULL JOIN a2 ON h2.uid = a2.uid
"""


def q_katz_parts(spark, sf_dir):
    """Truncated Katz centrality (alpha = 1/8, walk lengths <= 3) over
    the directed Customer->Order->Part graph, scaled by 8^3 to an
    exact integer: katz_scaled(v) = sum_k 8^(3-k) * walks_k(v).
    Integer walk-count vectors w_k = A^T w_{k-1} — no float anywhere;
    one keyed join+sum per length."""
    g = tpch_graph(spark, sf_dir)
    edges = g.edges_df.where(F.col("kind").isin("Placed", "Contains"))
    return graph_algos.katz_walks(edges, iters=3, beta_inv=8)


_KATZ_ORACLE = """
WITH e AS (
  SELECT 'Customer:' || CAST(o_custkey AS VARCHAR) AS s,
         'Order:' || CAST(o_orderkey AS VARCHAR) AS d FROM orders
  UNION ALL
  SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
         'Part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
nodes AS (SELECT DISTINCT uid FROM
          (SELECT s AS uid FROM e UNION ALL SELECT d FROM e)),
w1 AS (SELECT d AS uid, COUNT(*) AS w FROM e GROUP BY d),
w2 AS (SELECT e.d AS uid, SUM(w1.w) AS w
       FROM e JOIN w1 ON w1.uid = e.s GROUP BY e.d),
w3 AS (SELECT e.d AS uid, SUM(w2.w) AS w
       FROM e JOIN w2 ON w2.uid = e.s GROUP BY e.d)
SELECT n.uid,
       CAST(64 * COALESCE(w1.w, 0) + 8 * COALESCE(w2.w, 0)
            + COALESCE(w3.w, 0) AS BIGINT) AS katz_scaled
FROM nodes n
LEFT JOIN w1 ON w1.uid = n.uid
LEFT JOIN w2 ON w2.uid = n.uid
LEFT JOIN w3 ON w3.uid = n.uid
"""


def q_item_recommendations(spark, sf_dir):
    """Item-item collaborative filtering, end to end: per-customer
    top-3 part recommendations scored by summed item-item JACCARD
    similarity (rational — no sqrt, unlike cosine, so every term is
    engine-exact) over co-ownership, excluding parts already owned.
    Pipeline: distinct baskets -> capped per-customer pair explosion
    (the dedup.py max-bucket guard pattern) -> cooc >= 2 neighbor
    table -> owned x neighbors scoring join -> anti-join owned ->
    window top-3.  9 dp DECIMAL similarity terms keep the score sum
    order-independent; output restricted to custkey <= 300."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    basket = (t["orders"].select("o_orderkey", "o_custkey")
              .join(t["lineitem"].select("l_orderkey", "l_partkey"),
                    F.col("o_orderkey") == F.col("l_orderkey"))
              .select(F.col("o_custkey").alias("c"),
                      F.col("l_partkey").alias("p"))
              .distinct())
    sz = basket.groupBy("c").agg(F.count("*").alias("nb"))
    capped = basket.join(sz.where(F.col("nb") <= 100).select("c"), "c")
    pop = basket.groupBy("p").agg(F.count("*").alias("pop"))
    a, b = capped.alias("a"), capped.alias("b")
    cooc = (a.join(b, (F.col("a.c") == F.col("b.c"))
                   & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
            .agg(F.count("*").alias("cooc"))
            .where(F.col("cooc") >= 2))
    jac = (cooc
           .join(F.broadcast(pop.select(F.col("p").alias("pa"),
                                        F.col("pop").alias("na"))), "pa")
           .join(F.broadcast(pop.select(F.col("p").alias("pb"),
                                        F.col("pop").alias("nb"))), "pb")
           .select("pa", "pb",
                   F.round(F.col("cooc")
                           / (F.col("na") + F.col("nb") - F.col("cooc")),
                           9).cast("decimal(18,9)").alias("jac")))
    nbrs_all = (jac.select(F.col("pa").alias("p"),
                           F.col("pb").alias("q"), "jac")
                .unionByName(jac.select(F.col("pb").alias("p"),
                                        F.col("pa").alias("q"), "jac")))
    # k-NN item neighborhoods (top-20 per part): the standard item-CF
    # bound that keeps the scoring join fan-out at 20 x owned — without
    # it the owned x neighbors join is unbounded on dense co-purchase
    # graphs (GC-killed the sf0.1 run before this cap)
    wn = W.partitionBy("p").orderBy(F.col("jac").desc(), F.col("q"))
    nbrs = (nbrs_all.withColumn("_nr", F.row_number().over(wn))
            .where(F.col("_nr") <= 20).drop("_nr"))
    scored = (capped.join(nbrs, capped["p"] == nbrs["p"])
              .groupBy("c", "q")
              .agg(F.sum("jac").cast("decimal(28,9)").alias("s"))
              .join(basket.select("c", F.col("p").alias("q")),
                    ["c", "q"], "left_anti"))
    w = W.partitionBy("c").orderBy(F.col("s").desc(), F.col("q"))
    return (scored.where(F.col("c") <= 300)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select(F.col("c").alias("c_custkey"),
                    F.col("q").alias("rec_partkey"),
                    F.round(F.col("s").cast("double"), 6).alias("score")))


_ITEM_RECS_ORACLE = """
WITH basket AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
capped AS (
  SELECT b.* FROM basket b
  JOIN (SELECT c FROM basket GROUP BY c HAVING COUNT(*) <= 100) k
    USING (c)),
pop AS (SELECT p, COUNT(*) AS pop FROM basket GROUP BY p),
cooc AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cooc
  FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
jac AS (
  SELECT pa, pb,
         CAST(round(cooc * 1.0 / (na.pop + nb.pop - cooc), 9)
              AS DECIMAL(18,9)) AS jac
  FROM cooc
  JOIN pop na ON na.p = pa
  JOIN pop nb ON nb.p = pb),
nbrs_all AS (
  SELECT pa AS p, pb AS q, jac FROM jac
  UNION ALL SELECT pb, pa, jac FROM jac),
nbrs AS (
  SELECT p, q, jac FROM (
    SELECT p, q, jac,
           row_number() OVER (PARTITION BY p
                              ORDER BY jac DESC, q) AS nr
    FROM nbrs_all) WHERE nr <= 20),
scored AS (
  SELECT cp.c, n.q, SUM(n.jac) AS s
  FROM capped cp JOIN nbrs n ON n.p = cp.p
  GROUP BY 1, 2),
fresh AS (
  SELECT s.* FROM scored s
  LEFT JOIN basket o ON o.c = s.c AND o.p = s.q
  WHERE o.p IS NULL),
r AS (
  SELECT c, q, s,
         row_number() OVER (PARTITION BY c ORDER BY s DESC, q) AS rn
  FROM fresh WHERE c <= 300)
SELECT c AS c_custkey, q AS rec_partkey,
       round(CAST(s AS DOUBLE), 6) AS score
FROM r WHERE rn <= 3
"""


def q_mis_parts(spark, sf_dir):
    """Luby's maximal independent set over the part co-purchase graph
    with deterministic md5 priorities — the classic parallel
    symmetry-breaking primitive, 6 unrolled rounds (converges in ~4 on
    the fixtures; every node here is edge-incident, so no isolated-
    node special case).  The oracle replays the identical rounds via
    the equivalent NOT-EXISTS-smaller-neighbor formulation."""
    li = load_tables(spark, sf_dir)["lineitem"] \
        .select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").cast("string").alias("pa"),
                  F.col("b.l_partkey").cast("string").alias("pb")))
    out = graph_algos.maximal_independent_set(co, rounds=6,
                                              src_col="pa",
                                              dst_col="pb")
    return out.select(F.col("uid").cast("long").alias("l_partkey"))


def _mis_oracle_sql(rounds: int = 6) -> str:
    pri = lambda c: ("CAST(('0x' || substr(md5('mis:' || " + c +
                     "), 1, 15)) AS BIGINT)")
    ctes = ["""e0 AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT CAST(a.l_partkey AS VARCHAR) AS u,
           CAST(b.l_partkey AS VARCHAR) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)
  GROUP BY u, v)""",
            "a0 AS MATERIALIZED (SELECT DISTINCT u AS uid FROM e0)"]
    for r in range(rounds):
        ctes.append(f"""c{r} AS MATERIALIZED (
  SELECT a.uid FROM a{r} a
  WHERE NOT EXISTS (
    SELECT 1 FROM e{r} e WHERE e.u = a.uid
      AND ({pri('e.v')}, e.v) < ({pri('a.uid')}, a.uid)))""")
        ctes.append(f"""rm{r} AS MATERIALIZED (
  SELECT uid FROM c{r}
  UNION SELECT e.v FROM e{r} e JOIN c{r} c ON c.uid = e.u)""")
        ctes.append(f"""a{r + 1} AS MATERIALIZED (
  SELECT uid FROM a{r} EXCEPT SELECT uid FROM rm{r})""")
        ctes.append(f"""e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e
  JOIN a{r + 1} x ON x.uid = e.u
  JOIN a{r + 1} y ON y.uid = e.v)""")
    sel = "\nUNION ALL ".join(f"SELECT uid FROM c{r}"
                              for r in range(rounds))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT CAST(uid AS BIGINT) AS l_partkey FROM ({sel})")


def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood record linkage (Hernandez-Stolfo 1995):
    sort parts by name, compare each record only to its w=5 following
    neighbors, keep levenshtein(p_name) <= 12 — the windowed
    alternative to hash blocking (catches near-misses that straddle a
    block boundary).  One global sort + a rank-band self-join whose
    fan-out is exactly w per record — never n^2."""
    from pyspark.sql import Window as W
    p = load_tables(spark, sf_dir)["part"].select("p_partkey", "p_name")
    r = p.withColumn("rn", F.row_number().over(
        W.orderBy("p_name", "p_partkey")))
    a, b = r.alias("a"), r.alias("b")
    return (a.join(b, (F.col("b.rn") > F.col("a.rn"))
                   & (F.col("b.rn") <= F.col("a.rn") + 5))
            .where(F.levenshtein("a.p_name", "b.p_name") <= 12)
            .select(F.col("a.p_partkey").alias("key_a"),
                    F.col("b.p_partkey").alias("key_b"),
                    F.levenshtein("a.p_name", "b.p_name").alias("dist")))


_SORTED_NBR_ORACLE = """
WITH r AS (
  SELECT p_partkey, p_name,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rn
  FROM part)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
WHERE levenshtein(a.p_name, b.p_name) <= 12
"""


def q_theil_sen(spark, sf_dir):
    """Robust per-customer spend trend: Theil-Sen estimator (lower
    median of pairwise slopes) over each customer's order timeline —
    outlier-resistant where q:user_trend_slope's OLS is not.
    Customers with 3..40 orders; slopes are one IEEE division of
    integer cents by integer days; the lower-median pick is a pure
    rank selection, so no float accumulation exists."""
    from pyspark.sql import Window as W
    o = (load_tables(spark, sf_dir)["orders"]
         .select("o_custkey",
                 F.datediff(F.col("o_orderdate"),
                            F.lit("1995-01-01")).alias("d"),
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("cents"),
                 "o_orderkey"))
    sz = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    keep = sz.where((F.col("n") >= 3) & (F.col("n") <= 40)) \
        .select("o_custkey")
    ok = o.join(keep, "o_custkey")
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
                    & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
                    & (F.col("a.d") != F.col("b.d")))
             .select(F.col("a.o_custkey").alias("c"),
                     ((F.col("b.cents") - F.col("a.cents"))
                      / (F.col("b.d") - F.col("a.d"))).alias("slope")))
    w = W.partitionBy("c").orderBy("slope")
    ranked = (pairs.withColumn("rn", F.row_number().over(w))
              .withColumn("cnt", F.count("*").over(
                  W.partitionBy("c"))))
    return (ranked.where(F.col("rn")
                   == F.floor((F.col("cnt") + 1) / 2).cast("int"))
            .select(F.col("c").alias("o_custkey"),
                    (F.round(F.col("slope"), 6) + F.lit(0.0))
                    .alias("theil_sen_slope"),
                    F.col("cnt").alias("n_pairs")))


_THEIL_SEN_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS d,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         o_orderkey
  FROM orders),
keep AS (
  SELECT o_custkey FROM o GROUP BY o_custkey
  HAVING COUNT(*) BETWEEN 3 AND 40),
ok AS (SELECT o.* FROM o JOIN keep USING (o_custkey)),
pairs AS (
  SELECT a.o_custkey AS c,
         (b.cents - a.cents) * 1.0 / (b.d - a.d) AS slope
  FROM ok a JOIN ok b
    ON a.o_custkey = b.o_custkey
   AND a.o_orderkey < b.o_orderkey AND a.d <> b.d),
ranked AS (
  SELECT c, slope,
         row_number() OVER (PARTITION BY c ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY c) AS cnt
  FROM pairs)
SELECT c AS o_custkey, round(slope, 6) + 0.0 AS theil_sen_slope,
       cnt AS n_pairs
FROM ranked WHERE rn = CAST(floor((cnt + 1) / 2.0) AS INT)
"""


def q_greedy_cover(spark, sf_dir):
    """Greedy maximum-coverage (the classic (1-1/e) set-cover greedy):
    pick 8 orders in sequence, each maximizing newly-covered parts
    (ties to the lowest orderkey).  Greedy cover is inherently
    sequential — 8 driver-coordinated rounds, each ONE distributed
    anti-join + count aggregation over the order->part frame
    (partitioned once); only the 1-row argmax crosses the driver
    boundary.  The data-selection primitive behind coverage-oriented
    corpus pruning."""
    om = (load_tables(spark, sf_dir)["lineitem"]
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p"))
          .distinct().repartition("p").localCheckpoint(eager=True))
    covered = None
    rows = []
    total = 0
    for r in range(1, 9):
        fresh = om if covered is None else \
            om.join(covered, "p", "left_anti")
        top = (fresh.groupBy("o").agg(F.count("*").alias("gain"))
               .orderBy(F.col("gain").desc(), F.col("o"))
               .limit(1).collect())
        if not top:
            break
        o_key, gain = top[0]["o"], top[0]["gain"]
        total += gain
        rows.append((r, o_key, gain, total))
        new_parts = om.where(F.col("o") == o_key).select("p")
        covered = new_parts if covered is None else \
            covered.unionByName(new_parts).distinct()
        covered = covered.localCheckpoint(eager=True)
    return spark.createDataFrame(
        rows, "round int, o_orderkey long, gain long, covered_total long")


def _greedy_cover_oracle_sql(rounds: int = 8) -> str:
    ctes = ["""om AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)""",
            "c0(p) AS (SELECT CAST(NULL AS BIGINT) WHERE false)"]
    picks = []
    for r in range(1, rounds + 1):
        ctes.append(f"""g{r} AS MATERIALIZED (
  SELECT om.o, COUNT(*) AS gain
  FROM om LEFT JOIN c{r - 1} c ON c.p = om.p
  WHERE c.p IS NULL GROUP BY om.o)""")
        ctes.append(f"""pick{r} AS MATERIALIZED (
  SELECT {r} AS round, o, gain FROM g{r}
  ORDER BY gain DESC, o LIMIT 1)""")
        ctes.append(f"""c{r} AS MATERIALIZED (
  SELECT p FROM c{r - 1}
  UNION SELECT om.p FROM om JOIN pick{r} k ON k.o = om.o)""")
        picks.append(f"SELECT round, o, gain FROM pick{r}")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(round AS INT) AS round, o AS o_orderkey,
       CAST(gain AS BIGINT) AS gain,
       CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS covered_total
FROM ({" UNION ALL ".join(picks)})""")


def q_facility_location(spark, sf_dir):
    """Submodular data selection by the facility-location greedy (the
    coreset/diversity selector used for training-data curation):
    pick 5 embeddings maximizing sum_v max_{s in S} sim(v, s), where
    sim is the non-negative part of the dot product on a 1e-3 integer
    grid — every similarity, marginal gain and objective is an exact
    INTEGER, so the argmax sequence is engine-portable.

    Greedy is inherently sequential: 5 driver-coordinated rounds, each
    one join + sum over the materialized similarity frame and a 1-row
    argmax.  The sim matrix is IVF-BLOCKED (_ivf_blocked, same-cell
    equi-join — O(Σ n_c²), never the O(n²) cross join; out-of-cell
    sims are 0, so each pick covers its own cell): the standard
    blocked facility-location used for corpus-scale curation.  The
    oracle replays the identical unrolled-Lloyd assignment, so the
    blocked sim matrix — and hence the argmax sequence — is
    engine-reproducible."""
    idx = _ivf_blocked(spark, sf_dir)
    q = idx.select("cluster", "vec_id", F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e3).cast("long"))
        .alias("q"))
    a = q.select("cluster", F.col("vec_id").alias("va"),
                 F.col("q").alias("qa"))
    b = q.select("cluster", F.col("vec_id").alias("vb"),
                 F.col("q").alias("qb"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    sims = (a.join(b, "cluster")
            .select("va", "vb", F.greatest(dot, F.lit(0)).alias("s"))
            .repartition("vb").localCheckpoint(eager=True))
    best = q.select(F.col("vec_id").alias("va"),
                    F.lit(0).cast("long").alias("best"))
    rows, obj = [], 0
    for r in range(1, 6):
        top = (sims.join(best, "va")
               .groupBy("vb")
               .agg(F.sum(F.greatest(F.col("s") - F.col("best"),
                                     F.lit(0))).alias("gain"))
               .orderBy(F.col("gain").desc(), F.col("vb"))
               .limit(1).collect())
        pick, gain = top[0]["vb"], top[0]["gain"]
        obj += gain
        rows.append((r, pick, gain, obj))
        # LEFT join: with blocked sims a pick only covers its own
        # cell — vectors elsewhere keep their current best
        sp = sims.where(F.col("vb") == pick) \
            .select("va", F.col("s").alias("sp"))
        best = (best.join(sp, "va", "left")
                .select("va", F.greatest(
                    "best", F.coalesce("sp", F.lit(0))).alias("best"))
                .localCheckpoint(eager=True))
    return spark.createDataFrame(
        rows, "round int, vec_id long, gain long, objective long")


def _facility_location_oracle_sql(rounds: int = 5) -> str:
    # sims are IVF-blocked (same unrolled-Lloyd chain as the engine's
    # _ivf_blocked assignment) — out-of-cell sims are 0, so the best
    # update after each pick is a LEFT join with COALESCE
    ctes = ["""qd AS MATERIALIZED (
  SELECT vec_id, t.i AS i,
         CAST(round(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                    * 1e3) AS BIGINT) AS v
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i))""",
            """sims AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         GREATEST(SUM(a.v * b.v), 0) AS s
  FROM qd a JOIN qd b ON a.i = b.i
       JOIN fin fa ON fa.vec_id = a.vec_id
       JOIN fin fb ON fb.vec_id = b.vec_id AND fb.c = fa.c
  GROUP BY 1, 2)""",
            """b0 AS (SELECT DISTINCT va, CAST(0 AS BIGINT) AS best
  FROM sims)"""]
    picks = []
    for r in range(1, rounds + 1):
        ctes.append(f"""g{r} AS MATERIALIZED (
  SELECT s.vb, SUM(GREATEST(s.s - b.best, 0)) AS gain
  FROM sims s JOIN b{r - 1} b ON b.va = s.va GROUP BY s.vb)""")
        ctes.append(f"""p{r} AS MATERIALIZED (
  SELECT {r} AS round, vb, gain FROM g{r}
  ORDER BY gain DESC, vb LIMIT 1)""")
        ctes.append(f"""b{r} AS MATERIALIZED (
  SELECT b.va, GREATEST(b.best, COALESCE(s.s, 0)) AS best
  FROM b{r - 1} b LEFT JOIN (
    SELECT s.va, s.s FROM sims s JOIN p{r} p ON p.vb = s.vb) s
  ON s.va = b.va)""")
        picks.append(f"SELECT round, vb, gain FROM p{r}")
    return (_ivf_ctes(8, 2) + ",\n" + ",\n".join(ctes) + f"""
SELECT CAST(round AS INT) AS round, vb AS vec_id,
       CAST(gain AS BIGINT) AS gain,
       CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS objective
FROM ({" UNION ALL ".join(picks)})""")


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix — the classic BI triangle: users
    grouped by first-activity WEEK (the events fixture spans ~5
    weeks), retention = share of the cohort active again k weeks
    later.  Exact integer distinct counts; one 9 dp ratio per cell.
    Two shuffles: first-activity min-agg and the (cohort, age)
    distinct-count."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("m"))
    first = ev.groupBy("user_id").agg(F.min("m").alias("cohort"))
    act = (ev.join(first, "user_id")
           .select("user_id", "cohort",
                   (F.datediff(F.col("m").cast("date"),
                               F.col("cohort").cast("date")) / 7)
                   .cast("int").alias("age"))
           .distinct())
    size = (act.where(F.col("age") == 0)
            .groupBy("cohort").agg(F.count("*").alias("n0")))
    cell = act.groupBy("cohort", "age").agg(F.count("*").alias("n"))
    return (cell.join(size, "cohort")
            .select(F.col("cohort").cast("date").alias("cohort"),
                    "age", "n",
                    F.round(F.col("n") / F.col("n0"), 9)
                    .alias("retention")))


_COHORT_RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS m FROM events),
first AS (
  SELECT user_id, MIN(m) AS cohort FROM ev GROUP BY user_id),
act AS (
  SELECT DISTINCT ev.user_id, f.cohort,
         CAST(datediff('day', CAST(f.cohort AS DATE),
                       CAST(ev.m AS DATE)) // 7 AS INT) AS age
  FROM ev JOIN first f USING (user_id)),
size_ AS (
  SELECT cohort, COUNT(*) AS n0 FROM act WHERE age = 0
  GROUP BY cohort),
cell AS (
  SELECT cohort, age, COUNT(*) AS n FROM act GROUP BY 1, 2)
SELECT CAST(c.cohort AS DATE) AS cohort, c.age, c.n,
       round(c.n * 1.0 / s.n0, 9) AS retention
FROM cell c JOIN size_ s USING (cohort)
"""


def q_incremental_agg(spark, sf_dir):
    """Incremental aggregate maintenance — the materialized-view
    algebra: per-segment (count, sum, min, max) computed as BASE
    (orders < 1998) merged with a DELTA batch (orders >= 1998) using
    only the mergeable partial states, never rescanning the base.
    The ORACLE aggregates the full table directly, so the gate proves
    merge(base, delta) == full recompute — the property that makes
    incremental refresh sound at 100 TB."""
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)")).alias("p"),
        F.col("o_orderdate"))

    def part(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("cnt"),
            F.sum("p").cast("decimal(28,2)").alias("s"),
            F.min("p").alias("mn"), F.max("p").alias("mx"))

    base = part(o.where(F.col("o_orderdate") < F.lit("1998-01-01")))
    delta = part(o.where(F.col("o_orderdate") >= F.lit("1998-01-01")))
    merged = (base.unionByName(delta)
              .groupBy("o_orderpriority")
              .agg(F.sum("cnt").cast("long").alias("n_orders"),
                   F.sum("s").cast("decimal(28,2)").alias("total"),
                   F.min("mn").alias("min_price"),
                   F.max("mx").alias("max_price")))
    return merged


_INCREMENTAL_AGG_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
         AS total,
       MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS min_price,
       MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS max_price
FROM orders GROUP BY o_orderpriority
"""


def q_twap_users(spark, sf_dir):
    """Time-weighted average event value per user (the TWAP shape from
    finance/IoT): each observation holds until the user's next event;
    weights are integer seconds, per-term products round to 9 dp
    DECIMAL so the weighted sum is order-free.  One window shuffle."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"),
        F.col("value").alias("v"), "event_id")
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    dt = (F.lead("t").over(w) - F.col("t"))
    seg = (ev.withColumn("dt", dt).where(F.col("dt").isNotNull())
           .select("user_id", "dt",
                   F.round(F.col("v") * F.col("dt"), 9)
                   .cast("decimal(28,9)").alias("vw")))
    return (seg.groupBy("user_id")
            .agg(F.sum("dt").cast("long").alias("span_sec"),
                 F.round(F.sum("vw").cast("double") / F.sum("dt"), 6)
                 .alias("twap")))


_TWAP_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value AS v,
         event_id
  FROM events),
seg AS (
  SELECT user_id,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
           AS dt,
         v
  FROM ev)
SELECT user_id, CAST(SUM(dt) AS BIGINT) AS span_sec,
       round(CAST(SUM(CAST(round(v * dt, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) / SUM(dt), 6) AS twap
FROM seg WHERE dt IS NOT NULL GROUP BY user_id
"""


def q_segment_overlap(spark, sf_dir):
    """Audience-overlap matrix: Jaccard between the user sets of every
    event-type pair — the segment-intersection shape behind audience
    planning.  Exact distinct-user counts; intersections from one
    self-join on user_id (25 cells, map-side combined)."""
    m = _events(spark, sf_dir).select("event_type", "user_id").distinct()
    size = m.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = m.alias("a"), m.alias("b")
    inter = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("et_a"),
                      F.col("b.event_type").alias("et_b"))
             .agg(F.count("*").alias("n_both")))
    return (inter
            .join(F.broadcast(size.select(
                F.col("event_type").alias("et_a"),
                F.col("n").alias("na"))), "et_a")
            .join(F.broadcast(size.select(
                F.col("event_type").alias("et_b"),
                F.col("n").alias("nb"))), "et_b")
            .select("et_a", "et_b", "n_both",
                    F.round(F.col("n_both")
                            / (F.col("na") + F.col("nb")
                               - F.col("n_both")), 6).alias("jaccard")))


_SEGMENT_OVERLAP_ORACLE = """
WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
size_ AS (SELECT event_type, COUNT(*) AS n FROM m GROUP BY 1),
inter AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         COUNT(*) AS n_both
  FROM m a JOIN m b ON a.user_id = b.user_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT et_a, et_b, n_both,
       round(n_both * 1.0 / (sa.n + sb.n - n_both), 6) AS jaccard
FROM inter
JOIN size_ sa ON sa.event_type = et_a
JOIN size_ sb ON sb.event_type = et_b
"""


def q_session_labels(spark, sf_dir):
    """ML training-set construction: one labeled example per session
    (30-min gap sessionization) — features (n_events, distinct types,
    duration) and the binary label 'did the session contain a
    purchase'.  The dataset-building step between raw events and a
    conversion model; one window shuffle + one aggregation."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"),
        "event_type", "event_id")
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    new_s = F.when(
        (F.col("t") - F.lag("t").over(w) > 1800)
        | F.lag("t").over(w).isNull(), 1).otherwise(0)
    sess = (ev.withColumn("ns", new_s)
            .withColumn("sid", F.sum("ns").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow))))
    return (sess.groupBy("user_id", "sid")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("event_type").alias("n_types"),
                 (F.max("t") - F.min("t")).alias("duration_sec"),
                 F.max(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("label")))


_SESSION_LABELS_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_type,
         event_id
  FROM events),
s AS (
  SELECT *, CASE WHEN t - lag(t) OVER w > 1800
                   OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS ns
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
g AS (
  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s)
SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_sec,
       CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS INT) AS label
FROM g GROUP BY user_id, sid
"""


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each labeled
    embedding, the most-similar embedding with a DIFFERENT label
    (integer-grid dot product, ties to lowest id) — the pairs that
    matter for metric learning.  Argmax via one max(struct) aggregate
    over the label-filtered pair stream.  Candidates come from the
    shared IVF blocking (_ivf_blocked, same-cell equi-join — the
    mined negative is the hardest DIFFERENT-label vector in the same
    k-means cell, which is exactly where hard negatives live); the
    oracle replays the identical unrolled-Lloyd assignment, so the
    candidate set is engine-reproducible.  Vectors whose cell holds no
    other label produce no row (both engines agree)."""
    idx = _ivf_blocked(spark, sf_dir)
    q = idx.select("cluster", "vec_id", "label", F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e3).cast("long"))
        .alias("q"))
    a = q.select("cluster", F.col("vec_id").alias("va"),
                 F.col("label").alias("la"), F.col("q").alias("qa"))
    b = q.select("cluster", F.col("vec_id").alias("vb"),
                 F.col("label").alias("lb"), F.col("q").alias("qb"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    best = F.max(F.struct(F.col("s").alias("s"),
                          (-F.col("vb")).alias("negid")))
    return (a.join(b, "cluster")
            .where(F.col("la") != F.col("lb"))
            .select("va", "vb", dot.alias("s"))
            .groupBy("va").agg(best.alias("m"))
            .select(F.col("va").alias("vec_id"),
                    (-F.col("m.negid")).cast("long")
                    .alias("hard_negative"),
                    F.col("m.s").alias("dot_scaled")))


_HARD_NEG_ORACLE = _ivf_ctes(8, 2) + """,
qd AS (
  SELECT vec_id, label, t.i AS i,
         CAST(round(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                    * 1e3) AS BIGINT) AS v
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.v * b.v) AS s
  FROM qd a JOIN qd b ON a.i = b.i AND a.label <> b.label
       JOIN fin fa ON fa.vec_id = a.vec_id
       JOIN fin fb ON fb.vec_id = b.vec_id AND fb.c = fa.c
  GROUP BY 1, 2),
r AS (
  SELECT va, vb, s,
         row_number() OVER (PARTITION BY va ORDER BY s DESC, vb) AS rn
  FROM dots)
SELECT va AS vec_id, vb AS hard_negative, s AS dot_scaled
FROM r WHERE rn = 1
"""


def q_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between discount and quantity over
    lineitem — the robust complement to q:discount_quantity_corr's
    Pearson.  Tie-averaged ranks are carried DOUBLED (rank_avg*2 is an
    exact integer under ties, the q:mann_whitney trick), all moment
    sums are DECIMAL(38,0)-exact, and the only irrational op is sqrt —
    which IEEE 754 requires to be correctly rounded, so it is engine-
    portable where ln/exp are not."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        (F.col("l_discount").cast("decimal(12,2)") * 100)
        .cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"))

    def ranked2(col, alias):
        c = (li.groupBy(col).agg(F.count("*").alias("c")))
        from pyspark.sql import Window as W
        w = W.orderBy(col)
        # doubled average rank of a tie group: 2*min_rank + (c-1)
        return (c.withColumn(
            "_cum", F.sum("c").over(
                w.rowsBetween(W.unboundedPreceding, -1)))
            .select(col,
                    (2 * (F.coalesce(F.col("_cum"), F.lit(0)) + 1)
                     + (F.col("c") - 1)).alias(alias)))
    rx = ranked2("x", "rx2")
    ry = ranked2("y", "ry2")
    j = (li.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y"))
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum("rx2").cast("decimal(38,0)").alias("sx"),
        F.sum("ry2").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("decimal(38,0)")
        .alias("syy"))
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                  .cast("double"))
           * F.sqrt((n * F.col("syy") - F.col("sy") * F.col("sy"))
                    .cast("double")))
    return agg.select(F.col("n").cast("long").alias("n"),
                      F.round(num / den, 6).alias("spearman_rho"))


_SPEARMAN_ORACLE = """
WITH li AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem),
cx AS (SELECT x, COUNT(*) AS c FROM li GROUP BY x),
rx AS (
  SELECT x, 2 * (COALESCE(SUM(c) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + 1) + (c - 1) AS rx2
  FROM cx),
cy AS (SELECT y, COUNT(*) AS c FROM li GROUP BY y),
ry AS (
  SELECT y, 2 * (COALESCE(SUM(c) OVER (ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + 1) + (c - 1) AS ry2
  FROM cy),
j AS (SELECT rx2, ry2 FROM li JOIN rx USING (x) JOIN ry USING (y)),
agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(rx2) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(ry2) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(rx2 * ry2) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(rx2 * rx2) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(ry2 * ry2) AS DECIMAL(38,0)) AS syy
  FROM j)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx
                          AS DOUBLE))
                * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                            AS DOUBLE))), 6) AS spearman_rho
FROM agg
"""


def q_cusum_alarm(spark, sf_dir):
    """CUSUM change detection over daily revenue — the quality-control
    classic, made DECLARATIVE: the recursion S_t = max(0, S_{t-1} +
    x_t - k) equals P_t - min(0, min_{j<=t} P_j) for the drift-adjusted
    prefix sum P, so two window passes (running sum + running min)
    replace the sequential loop — the form that runs on a cluster.
    Integer cents throughout; k = floor(overall daily mean); alarm
    when S exceeds 5x k."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   * 100).cast("long").alias("cents")))
    k = daily.agg(F.floor(F.avg("cents")).cast("long").alias("k"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    run = (daily.crossJoin(F.broadcast(k))
           .withColumn("p", F.sum(F.col("cents") - F.col("k")).over(w))
           .withColumn("pmin",
                       F.least(F.lit(0).cast("long"),
                               F.min("p").over(w))))
    s = F.col("p") - F.col("pmin")
    return (run.select("day", "cents", s.alias("cusum"),
                       (s > 5 * F.col("k")).alias("alarm"))
            .where(F.col("alarm")))


_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
k AS (SELECT CAST(floor(AVG(cents)) AS BIGINT) AS k FROM daily),
run AS (
  SELECT day, cents,
         SUM(cents - k.k) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS p,
         k.k
  FROM daily, k),
s AS (
  SELECT day, cents, k,
         p - LEAST(0, MIN(p) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING)) AS cusum
  FROM run)
SELECT day, cents, CAST(cusum AS BIGINT) AS cusum,
       cusum > 5 * k AS alarm
FROM s WHERE cusum > 5 * k
"""


def q_wilson_intervals(spark, sf_dir):
    """Wilson score 95% confidence interval for the purchase rate per
    user cohort (users bucketed by id % 10) — the interval that stays
    sane at small n where the normal approximation fails.  The only
    irrational op is sqrt (IEEE-correctly-rounded -> engine-portable);
    z is the literal 1.96."""
    ev = _events(spark, sf_dir)
    g = (ev.groupBy((F.col("user_id") % 10).alias("cohort"))
         .agg(F.count("*").alias("n"),
              F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("x")))
    z2 = 1.96 * 1.96
    p = F.col("x") / F.col("n")
    n = F.col("n")
    center = (p + z2 / (2 * n)) / (1 + z2 / n)
    half = (F.lit(1.96) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
            / (1 + z2 / n))
    return g.select("cohort", "n", "x",
                    F.round(center - half, 6).alias("lo"),
                    F.round(center + half, 6).alias("hi"))


_WILSON_ORACLE = """
WITH g AS (
  SELECT user_id % 10 AS cohort, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1)
SELECT cohort, n, x,
       round(((x * 1.0 / n) + 3.8416 / (2 * n)) / (1 + 3.8416 / n)
             - 1.96 * sqrt((x * 1.0 / n) * (1 - x * 1.0 / n) / n
                           + 3.8416 / (4 * n * n)) / (1 + 3.8416 / n),
             6) AS lo,
       round(((x * 1.0 / n) + 3.8416 / (2 * n)) / (1 + 3.8416 / n)
             + 1.96 * sqrt((x * 1.0 / n) * (1 - x * 1.0 / n) / n
                           + 3.8416 / (4 * n * n)) / (1 + 3.8416 / n),
             6) AS hi
FROM g
"""


def q_kendall_nations(spark, sf_dir):
    """Kendall tau-a between two per-nation metrics — revenue rank vs
    customer-count rank: concordant/discordant PAIR COUNTS are exact
    integers over the 25-nation frame (300 pairs), tau = one IEEE
    division.  The rank-agreement check behind 'do our two KPIs order
    segments the same way'."""
    t = load_tables(spark, sf_dir)
    rev = (t["orders"].join(t["customer"],
                            F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_nationkey")
           .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 * 100).cast("long").alias("rev"),
                F.countDistinct("c_custkey").alias("ncust")))
    a, b = rev.alias("a"), rev.alias("b")
    sgn = ((F.col("a.rev") < F.col("b.rev")).cast("int")
           - (F.col("a.rev") > F.col("b.rev")).cast("int")) * \
          ((F.col("a.ncust") < F.col("b.ncust")).cast("int")
           - (F.col("a.ncust") > F.col("b.ncust")).cast("int"))
    pairs = (a.join(b, F.col("a.c_nationkey") < F.col("b.c_nationkey"))
             .select(sgn.alias("s")))
    return (pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias("discordant"))
        .select("n_pairs", "concordant", "discordant",
                F.round((F.col("concordant") - F.col("discordant"))
                        / F.col("n_pairs"), 6).alias("kendall_tau")))


_KENDALL_ORACLE = """
WITH rev AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev,
         COUNT(DISTINCT c_custkey) AS ncust
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey),
pairs AS (
  SELECT (CASE WHEN a.rev < b.rev THEN 1
               WHEN a.rev > b.rev THEN -1 ELSE 0 END)
         * (CASE WHEN a.ncust < b.ncust THEN 1
                 WHEN a.ncust > b.ncust THEN -1 ELSE 0 END) AS s
  FROM rev a JOIN rev b ON a.c_nationkey < b.c_nationkey)
SELECT COUNT(*) AS n_pairs,
       SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS concordant,
       SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS discordant,
       round((SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
              - SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END)) * 1.0
             / COUNT(*), 6) AS kendall_tau
FROM pairs
"""


def q_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes shrinkage of per-part return rates toward the
    Beta(20, 80) prior: shrunk = (x + 20)/(n + 100) — the rational
    form, so every estimate is one exact integer-fed division.  Fixes
    the small-n leaderboard problem (a part returned 1-of-1 must not
    outrank 40-of-100).  Output: top 25 shrunk rates."""
    li = load_tables(spark, sf_dir)["lineitem"]
    g = (li.groupBy("l_partkey")
         .agg(F.count("*").alias("n"),
              F.sum(F.when(F.col("l_returnflag") == "R", 1)
                    .otherwise(0)).alias("x")))
    shrunk = F.round((F.col("x") + 20) / (F.col("n") + 100), 9)
    raw = F.round(F.col("x") / F.col("n"), 9)
    return (g.select("l_partkey", "n", "x", raw.alias("raw_rate"),
                     shrunk.alias("shrunk_rate"))
            .orderBy(F.col("shrunk_rate").desc(), "l_partkey")
            .limit(25))


_EB_SHRINK_ORACLE = """
WITH g AS (
  SELECT l_partkey, COUNT(*) AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, n, x,
       round(x * 1.0 / n, 9) AS raw_rate,
       round((x + 20) * 1.0 / (n + 100), 9) AS shrunk_rate
FROM g ORDER BY shrunk_rate DESC, l_partkey LIMIT 25
"""


def q_sax_symbols(spark, sf_dir):
    """SAX time-series symbolization (Lin et al. 2003): daily revenue
    -> 32 PAA segments (equal day-count buckets via ntile) -> z-score
    against the segment-mean distribution -> 4-symbol alphabet at the
    standard Gaussian breakpoints (-0.6745, 0, 0.6745).  The indexable
    motif/anomaly representation for massive series.  Determinism:
    exact integer cents everywhere before the z-score; mean/std from
    DECIMAL sums with sqrt (IEEE-exact) and one division; breakpoint
    compares are plain IEEE."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   * 100).cast("long").alias("cents")))
    seg = daily.withColumn("seg", F.ntile(32).over(W.orderBy("day")))
    paa = (seg.groupBy("seg")
           .agg(F.min("day").alias("seg_start"),
                F.count("*").alias("n_days"),
                F.sum("cents").cast("decimal(38,0)").alias("s")))
    # segment means as exact rationals scaled by the common denominator
    # lcm(n_days) is overkill — compare means as s/n via cross-exact
    # double division (one op each)
    m = paa.select("seg", "seg_start",
                   (F.col("s").cast("double") / F.col("n_days"))
                   .alias("mean"))
    stats = m.agg(F.count("*").alias("k"),
                  F.sum(F.col("mean")
                        .cast("decimal(28,6)")).alias("sm"),
                  F.sum((F.col("mean") * F.col("mean"))
                        .cast("decimal(38,6)")).alias("sq"))
    mu = F.col("sm").cast("double") / F.col("k")
    var = (F.col("sq").cast("double") / F.col("k")) - mu * mu
    sd = F.sqrt(var)
    z = (F.col("mean") - mu) / sd
    sym = (F.when(z < -0.6745, "a").when(z < 0.0, "b")
           .when(z < 0.6745, "c").otherwise("d"))
    return (m.crossJoin(F.broadcast(stats))
            .select("seg", "seg_start", F.round(z, 6).alias("z"),
                    sym.alias("symbol")))


_SAX_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
seg AS (
  SELECT day, cents, ntile(32) OVER (ORDER BY day) AS seg FROM daily),
paa AS (
  SELECT seg, MIN(day) AS seg_start, COUNT(*) AS n_days,
         CAST(SUM(cents) AS DECIMAL(38,0)) AS s
  FROM seg GROUP BY seg),
m AS (
  SELECT seg, seg_start,
         CAST(s AS DOUBLE) / n_days AS mean
  FROM paa),
stats AS (
  SELECT COUNT(*) AS k,
         SUM(CAST(mean AS DECIMAL(28,6))) AS sm,
         SUM(CAST(mean * mean AS DECIMAL(38,6))) AS sq
  FROM m)
SELECT seg, seg_start,
       round((mean - CAST(sm AS DOUBLE) / k)
             / sqrt(CAST(sq AS DOUBLE) / k
                    - (CAST(sm AS DOUBLE) / k)
                      * (CAST(sm AS DOUBLE) / k)), 6) AS z,
       CASE WHEN (mean - CAST(sm AS DOUBLE) / k)
                 / sqrt(CAST(sq AS DOUBLE) / k
                        - (CAST(sm AS DOUBLE) / k)
                          * (CAST(sm AS DOUBLE) / k)) < -0.6745 THEN 'a'
            WHEN (mean - CAST(sm AS DOUBLE) / k)
                 / sqrt(CAST(sq AS DOUBLE) / k
                        - (CAST(sm AS DOUBLE) / k)
                          * (CAST(sm AS DOUBLE) / k)) < 0.0 THEN 'b'
            WHEN (mean - CAST(sm AS DOUBLE) / k)
                 / sqrt(CAST(sq AS DOUBLE) / k
                        - (CAST(sm AS DOUBLE) / k)
                          * (CAST(sm AS DOUBLE) / k)) < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM m, stats
"""


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the undirected adjacent-token co-occurrence graph (tokens of
    length >= 4), 4 synchronous iterations, top 30.  Every dependency
    term rounds to 9 dp DECIMAL before the neighbor sum and each rank
    update re-rounds to the same grid, so the float-summation order
    never matters and the unrolled-CTE oracle replays bit-for-bit."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(text.tokens(F.col("text")).alias("w"))
    pair = toks.select(F.explode(F.zip_with(
        F.slice(F.col("w"), 1, F.size("w") - 1),
        F.slice(F.col("w"), 2, F.size("w") - 1),
        lambda x, y: F.struct(F.least(x, y).alias("lo"),
                              F.greatest(x, y).alias("hi"))))
        .alias("p")).select("p.lo", "p.hi")
    edges = (pair.where((F.length("lo") >= 4) & (F.length("hi") >= 4)
                        & (F.col("lo") != F.col("hi")))
             .distinct())
    sym = (edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
           .unionByName(edges.select(F.col("hi").alias("u"),
                                     F.col("lo").alias("v")))
           .repartition("u").localCheckpoint(eager=True))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg")) \
        .localCheckpoint(eager=True)
    rank = deg.select(F.col("u").alias("w"),
                      F.lit(1.0).cast("decimal(18,9)").alias("r"))
    for _ in range(4):
        contrib = (sym.join(rank.withColumnRenamed("w", "u"), "u")
                   .join(deg, "u")
                   .select(F.col("v").alias("w"),
                           F.round(F.col("r").cast("double")
                                   / F.col("deg"), 9)
                           .cast("decimal(18,9)").alias("c")))
        rank = (contrib.groupBy("w")
                .agg(F.round(0.15 + 0.85 * F.sum("c").cast("double"), 9)
                     .cast("decimal(18,9)").alias("r"))
                .localCheckpoint(eager=True))
    return (rank.select("w", F.col("r").cast("double").alias("rank"))
            .orderBy(F.col("rank").desc(), "w").limit(30))


def _textrank_oracle_sql(iters: int = 4) -> str:
    ctes = ["""toks AS MATERIALIZED (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS w
  FROM documents)""",
            """edges AS MATERIALIZED (
  SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi FROM (
    SELECT w[CAST(t.i AS INT) + 1] AS a,
           w[CAST(t.i AS INT) + 2] AS b
    FROM toks, UNNEST(range(len(w) - 1)) AS t(i))
  WHERE length(a) >= 4 AND length(b) >= 4 AND a <> b)""",
            """sym AS MATERIALIZED (
  SELECT lo AS u, hi AS v FROM edges
  UNION ALL SELECT hi, lo FROM edges)""",
            """deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM sym GROUP BY u)""",
            """r0 AS MATERIALIZED (
  SELECT u AS w, CAST(1.0 AS DECIMAL(18,9)) AS r FROM deg)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""r{i} AS MATERIALIZED (
  SELECT s.v AS w,
         CAST(round(0.15 + 0.85 * CAST(SUM(
           CAST(round(CAST(p.r AS DOUBLE) / d.deg, 9)
                AS DECIMAL(18,9))) AS DOUBLE), 9) AS DECIMAL(18,9)) AS r
  FROM sym s JOIN r{i - 1} p ON p.w = s.u JOIN deg d ON d.u = s.u
  GROUP BY s.v)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT w, CAST(r AS DOUBLE) AS rank
FROM r{iters} ORDER BY rank DESC, w LIMIT 30""")


def q_isotonic_trend(spark, sf_dir):
    """Isotonic (monotone nondecreasing) regression of weekly revenue
    on time WITHOUT the sequential PAVA loop: the minimax identity
    fit_i = min_{k>=i} max_{j<=i} avg(y_j..y_k) turns the fit into
    interval averages (prefix-sum differences) + a running max along
    j + a per-row min — O(n^2) cells over the DIM-SIZED weekly frame,
    every step a window/groupBy that runs distributed and replays in
    SQL.  Averages are exact integer-cent rationals with one IEEE
    division each; max/min are order-free."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("wk"))
              .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    * 100).cast("long").alias("cents")))
    idx = weekly.withColumn("i", F.row_number().over(W.orderBy("wk")))
    pre = idx.withColumn("p", F.sum("cents").over(
        W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)))
    a = pre.select(F.col("i").alias("j"),
                   (F.col("p") - F.col("cents")).alias("pj1"))
    b = pre.select(F.col("i").alias("k"), F.col("p").alias("pk"))
    cells = (a.join(b, F.col("j") <= F.col("k"))
             .select("j", "k",
                     ((F.col("pk") - F.col("pj1"))
                      / (F.col("k") - F.col("j") + 1)).alias("avg")))
    runmax = F.max("avg").over(
        W.partitionBy("k").orderBy("j")
        .rowsBetween(W.unboundedPreceding, W.currentRow))
    fit = (cells.withColumn("m", runmax)
           .groupBy(F.col("j").alias("i"))
           .agg(F.min("m").alias("fit")))
    return (idx.join(fit, "i")
            .select("i", F.col("wk").cast("date").alias("week"),
                    "cents", F.round("fit", 6).alias("fit")))


_ISOTONIC_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT wk, cents, row_number() OVER (ORDER BY wk) AS i FROM weekly),
pre AS (
  SELECT *, SUM(cents) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS p
  FROM idx),
cells AS (
  SELECT a.i AS j, b.i AS k,
         (b.p - (a.p - a.cents)) * 1.0 / (b.i - a.i + 1) AS avg
  FROM pre a JOIN pre b ON a.i <= b.i),
rm AS (
  SELECT j, k,
         MAX(avg) OVER (PARTITION BY k ORDER BY j
                        ROWS UNBOUNDED PRECEDING) AS m
  FROM cells),
fit AS (SELECT j AS i, MIN(m) AS fit FROM rm GROUP BY j)
SELECT idx.i, CAST(idx.wk AS DATE) AS week, idx.cents,
       round(fit.fit, 6) AS fit
FROM idx JOIN fit ON fit.i = idx.i
"""


def q_exact_median_terasort(spark, sf_dir):
    """EXACT global median (lower) of order value by terasort-shaped
    rank selection: range-partition on the value, per-partition sorted
    cumsum + partition offsets — the scale-correct way to take an
    exact order statistic (a partitionless row_number window funnels
    the table through one task; percentile() aggregates buffer per
    group).  Complements q:approx_percentiles (GK sketch) with the
    exact path."""
    from .operators.pipeline import _global_cum_before
    o = load_tables(spark, sf_dir)["orders"].select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    n = o.count()
    k = (n + 1) // 2
    ranked = _global_cum_before(o, "cents", F.lit(1))
    kth = (ranked.where((F.col("_cum_before") < k)
                        & (k <= F.col("_cum_before") + 1))
           .select("cents"))
    return (kth.agg(F.min("cents").alias("median_cents"))
            .select(F.lit(n).cast("long").alias("n"), "median_cents"))


_EXACT_MEDIAN_ORACLE = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
    AS cents FROM orders),
n AS (SELECT COUNT(*) AS n FROM o)
SELECT n.n,
       (SELECT cents FROM o ORDER BY cents
        LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM n)) AS median_cents
FROM n
"""


def q_frequent_triples(spark, sf_dir):
    """Apriori frequent 3-itemsets over order baskets (support >= 2)
    WITH the Apriori candidate prune: triples are generated only by
    joining frequent PAIRS that share a leading item, then verified
    against the basket — the downward-closure principle that keeps
    candidate volume polynomial at scale (a naive 3-way basket
    self-join explodes cubically).  Exact integer supports."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct()
          .repartition("o").localCheckpoint(eager=True))
    a, b = li.alias("a"), li.alias("b")
    pairs = (a.join(b, (F.col("a.o") == F.col("b.o"))
                    & (F.col("a.p") < F.col("b.p")))
             .groupBy(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
             .agg(F.count("*").alias("s"))
             .where(F.col("s") >= 2)
             .localCheckpoint(eager=True))
    # candidate triples: frequent pairs (x,y), (x,z) with y < z
    cand = (pairs.alias("p1")
            .join(pairs.alias("p2"),
                  (F.col("p1.x") == F.col("p2.x"))
                  & (F.col("p1.y") < F.col("p2.y")))
            .select(F.col("p1.x").alias("x"), F.col("p1.y").alias("y"),
                    F.col("p2.y").alias("z")))
    c = li.alias("c")
    verified = (cand
                .join(a, F.col("a.p") == F.col("x"))
                .join(b, (F.col("b.o") == F.col("a.o"))
                      & (F.col("b.p") == F.col("y")))
                .join(c, (F.col("c.o") == F.col("a.o"))
                      & (F.col("c.p") == F.col("z")))
                .groupBy("x", "y", "z")
                .agg(F.count("*").alias("support"))
                .where(F.col("support") >= 2))
    return verified.select(F.col("x").alias("item1"),
                           F.col("y").alias("item2"),
                           F.col("z").alias("item3"), "support")


_FREQ_TRIPLES_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
tri AS (
  SELECT a.p AS x, b.p AS y, c.p AS z, COUNT(*) AS support
  FROM li a
  JOIN li b ON b.o = a.o AND a.p < b.p
  JOIN li c ON c.o = a.o AND b.p < c.p
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
fp AS (
  SELECT a.p AS x, b.p AS y, COUNT(*) AS s
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT t.x AS item1, t.y AS item2, t.z AS item3, t.support
FROM tri t
JOIN fp p1 ON p1.x = t.x AND p1.y = t.y
JOIN fp p2 ON p2.x = t.x AND p2.y = t.z
"""


def q_ppr_asia(spark, sf_dir):
    """Personalized PageRank from the ASIA region node over the
    undirected Region-Nation-Customer graph, 4 iterations, damping
    0.85 — the seed-anchored relevance ranking behind 'related
    entities'.  Contribution terms and rank updates re-round to the
    9 dp DECIMAL grid each step (the q:textrank_keywords ladder), so
    neighbor-sum order never matters; the restart mass goes entirely
    to the seed."""
    g = tpch_graph(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    seed_uid = "Region:" + str(
        t["region"].where(F.col("r_name") == "ASIA")
        .select("r_regionkey").collect()[0][0])
    edges = g.edges_df.where(F.col("kind").isin("InRegion",
                                                "FromNation"))
    sym = (edges.select(F.col("startuid").alias("u"),
                        F.col("enduid").alias("v"))
           .unionByName(edges.select(F.col("enduid").alias("u"),
                                     F.col("startuid").alias("v")))
           .distinct().repartition("u").localCheckpoint(eager=True))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg")) \
        .localCheckpoint(eager=True)
    rank = deg.select(F.col("u").alias("w"),
                      F.when(F.col("u") == seed_uid, 1.0).otherwise(0.0)
                      .cast("decimal(18,9)").alias("r"))
    for _ in range(4):
        contrib = (sym.join(rank.withColumnRenamed("w", "u"), "u")
                   .join(deg, "u")
                   .select(F.col("v").alias("w"),
                           F.round(F.col("r").cast("double")
                                   / F.col("deg"), 9)
                           .cast("decimal(18,9)").alias("c")))
        inc = contrib.groupBy("w").agg(
            F.sum("c").cast("decimal(28,9)").alias("s"))
        rank = (deg.select(F.col("u").alias("w"))
                .join(inc, "w", "left")
                .select("w", F.round(
                    F.when(F.col("w") == seed_uid, 0.15).otherwise(0.0)
                    + 0.85 * F.coalesce(F.col("s"), F.lit(0))
                    .cast("double"), 9)
                    .cast("decimal(18,9)").alias("r"))
                .localCheckpoint(eager=True))
    return (rank.where(F.col("r") > 0)
            .select("w", F.col("r").cast("double").alias("ppr"))
            .orderBy(F.col("ppr").desc(), "w").limit(40))


def _ppr_oracle_sql(iters: int = 4) -> str:
    ctes = ["""seed AS (
  SELECT 'Region:' || CAST(r_regionkey AS VARCHAR) AS uid
  FROM region WHERE r_name = 'ASIA')""",
            """sym AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR) AS u,
           'Region:' || CAST(n_regionkey AS VARCHAR) AS v FROM nation
    UNION ALL
    SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
           'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
    UNION ALL
    SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
           'Nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR),
           'Customer:' || CAST(c_custkey AS VARCHAR) FROM customer)
  GROUP BY u, v)""",
            """deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM sym GROUP BY u)""",
            """r0 AS MATERIALIZED (
  SELECT u AS w, CAST(CASE WHEN u = (SELECT uid FROM seed)
                           THEN 1.0 ELSE 0.0 END
                      AS DECIMAL(18,9)) AS r
  FROM deg)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""r{i} AS MATERIALIZED (
  SELECT d.u AS w,
         CAST(round(CASE WHEN d.u = (SELECT uid FROM seed)
                         THEN 0.15 ELSE 0.0 END
           + 0.85 * CAST(COALESCE(x.s, 0) AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS r
  FROM deg d LEFT JOIN (
    SELECT s.v AS w, CAST(SUM(CAST(round(CAST(p.r AS DOUBLE) / dd.deg,
                                         9) AS DECIMAL(18,9)))
                          AS DECIMAL(28,9)) AS s
    FROM sym s JOIN r{i - 1} p ON p.w = s.u JOIN deg dd ON dd.u = s.u
    GROUP BY s.v) x ON x.w = d.u)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT w, CAST(r AS DOUBLE) AS ppr
FROM r{iters} WHERE r > 0 ORDER BY ppr DESC, w LIMIT 40""")


def q_maximal_matching(spark, sf_dir):
    """Distributed maximal matching over the part co-purchase graph
    (Luby-style edge competition on md5 priorities, 6 rounds) — the
    matched endpoints are the classic 2-approximate vertex cover.  An
    edge wins a round iff it is the strict (priority, id)-minimum at
    BOTH endpoints, resolved with a per-node two-smallest aggregate
    (no line-graph materialization, no self-join on 'shares an
    endpoint')."""
    li = load_tables(spark, sf_dir)["lineitem"] \
        .select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").cast("string").alias("pa"),
                  F.col("b.l_partkey").cast("string").alias("pb")))
    m = graph_algos.maximal_matching(co, rounds=6,
                                     src_col="pa", dst_col="pb")
    return m.select(F.col("u").cast("long").alias("part_a"),
                    F.col("v").cast("long").alias("part_b"))


def _matching_oracle_sql(rounds: int = 6) -> str:
    pri = ("CAST(('0x' || substr(md5('mm:' || u || '|' || v), 1, 15)) "
           "AS BIGINT)")
    ctes = [f"""a0 AS MATERIALIZED (
  SELECT u, v, {pri} AS p FROM (
    SELECT DISTINCT LEAST(CAST(a.l_partkey AS VARCHAR),
                          CAST(b.l_partkey AS VARCHAR)) AS u,
           GREATEST(CAST(a.l_partkey AS VARCHAR),
                    CAST(b.l_partkey AS VARCHAR)) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey))"""]
    sel = []
    for r in range(rounds):
        ctes.append(f"""inc{r} AS MATERIALIZED (
  SELECT u AS n, p, u, v FROM a{r}
  UNION ALL SELECT v AS n, p, u, v FROM a{r})""")
        ctes.append(f"""m{r} AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT n, u, v,
           row_number() OVER (PARTITION BY n ORDER BY p, u, v) AS rn
    FROM inc{r})
  WHERE rn = 1 GROUP BY u, v HAVING COUNT(*) = 2)""")
        ctes.append(f"""used{r} AS MATERIALIZED (
  SELECT u AS n FROM m{r} UNION SELECT v FROM m{r})""")
        ctes.append(f"""a{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v, e.p FROM a{r} e
  LEFT JOIN used{r} x ON x.n = e.u
  LEFT JOIN used{r} y ON y.n = e.v
  WHERE x.n IS NULL AND y.n IS NULL)""")
        sel.append(f"SELECT u, v FROM m{r}")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(u AS BIGINT) AS part_a, CAST(v AS BIGINT) AS part_b
FROM ({" UNION ALL ".join(sel)})""")


def q_changepoint_sse(spark, sf_dir):
    """Exact single change-point detection by least squares (binary
    segmentation step 1): the split s minimizing SSE_left + SSE_right
    of a two-mean model over weekly revenue.  Every candidate split is
    O(1) from prefix sums (SSE(a..b) = Q - S^2/n with exact DECIMAL Q
    and S), so the whole scan is one window pass + an argmin — no
    per-candidate aggregation, cluster-runnable.  Integer cents; two
    IEEE divisions per candidate; argmin tie-broken by split index."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("wk"))
              .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    * 100).cast("long").alias("y")))
    w = W.orderBy("wk")
    pre = (weekly.withColumn("i", F.row_number().over(w))
           .withColumn("s", F.sum("y").over(
               w.rowsBetween(W.unboundedPreceding, W.currentRow)))
           .withColumn("q", F.sum((F.col("y").cast("decimal(19,0)")
                                   * F.col("y")).cast("decimal(38,0)"))
                        .over(w.rowsBetween(W.unboundedPreceding,
                                            W.currentRow))))
    tot = pre.agg(F.max("i").alias("n"), F.max("s").alias("st"),
                  F.max("q").alias("qt"))
    c = pre.crossJoin(F.broadcast(tot)).where(F.col("i") < F.col("n"))
    sse_l = (F.col("q").cast("double")
             - F.col("s").cast("double") * F.col("s") / F.col("i"))
    sse_r = ((F.col("qt") - F.col("q")).cast("double")
             - (F.col("st") - F.col("s")).cast("double")
             * (F.col("st") - F.col("s"))
             / (F.col("n") - F.col("i")))
    scored = c.select(F.col("i").alias("split"),
                      F.col("wk").cast("date").alias("split_week"),
                      F.round((sse_l + sse_r) / 1e16, 9).alias("sse"))
    best = F.min(F.struct(F.col("sse"), F.col("split"),
                          F.col("split_week")))
    return (scored.agg(best.alias("b"))
            .select(F.col("b.split").alias("split"),
                    F.col("b.split_week").alias("split_week"),
                    F.col("b.sse").alias("sse")))


_CHANGEPOINT_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1),
pre AS (
  SELECT wk, y,
         row_number() OVER (ORDER BY wk) AS i,
         SUM(y) OVER (ORDER BY wk ROWS UNBOUNDED PRECEDING) AS s,
         SUM(y * y) OVER (ORDER BY wk ROWS UNBOUNDED PRECEDING) AS q
  FROM weekly),
tot AS (SELECT MAX(i) AS n, MAX(s) AS st, MAX(q) AS qt FROM pre),
scored AS (
  SELECT i AS split, CAST(wk AS DATE) AS split_week,
         round((CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * s / i
                + CAST(qt - q AS DOUBLE)
                - CAST(st - s AS DOUBLE) * (st - s) / (n - i)) / 1e16,
               9) AS sse
  FROM pre, tot WHERE i < n)
SELECT split, split_week, sse FROM scored
ORDER BY sse, split LIMIT 1
"""


def q_rebalance_audit(spark, sf_dir):
    """Shard-rebalancing audit: fraction of documents that MOVE when a
    17th shard joins, under (a) mod-hashing (expect ~16/17 moved — the
    resharding catastrophe) vs (b) rendezvous/HRW hashing (expect
    ~1/17 — only keys won by the new shard move).  HRW assignment =
    argmax over md5(key, shard) per key, computed as one max(struct)
    aggregate over a 16/17-way generated column — no shuffle of the
    corpus at all (narrow map + final 2-row aggregate).  The property
    that decides whether growing a 100 TB cluster re-reads 94%% or 6%%
    of it."""
    docs = _docs(spark, sf_dir).select("doc_id")

    def hrw(n):
        arr = F.array(*[
            F.struct(
                F.conv(F.substring(F.md5(F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(f"|s{i}"))), 1, 15), 16, 10).cast("long")
                .alias("h"),
                F.lit(i).alias("shard"))
            for i in range(n)])
        return F.array_max(arr)["shard"]

    h = text.hash60(F.col("doc_id").cast("string"))
    scored = docs.select(
        ((h % 16 + 16) % 16).alias("mod16"),
        ((h % 17 + 17) % 17).alias("mod17"),
        hrw(16).alias("hrw16"),
        hrw(17).alias("hrw17"))
    agg = scored.agg(
        F.count("*").alias("total"),
        F.sum((F.col("mod16") != F.col("mod17")).cast("int"))
        .alias("mod_moved"),
        F.sum((F.col("hrw16") != F.col("hrw17")).cast("int"))
        .alias("hrw_moved"))
    return (agg.select(
        "total", "mod_moved", "hrw_moved",
        F.round(F.col("mod_moved") / F.col("total"), 6)
        .alias("mod_moved_frac"),
        F.round(F.col("hrw_moved") / F.col("total"), 6)
        .alias("hrw_moved_frac")))


def _rebalance_oracle_sql() -> str:
    def hrw(n):
        cells = ", ".join(
            "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
            f"'|s{i}'), 1, 15)) AS BIGINT), {i})" for i in range(n))
        return (f"(SELECT shard FROM (VALUES {cells}) AS t(h, shard) "
                "ORDER BY h DESC, shard DESC LIMIT 1)")
    return f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM documents),
scored AS (
  SELECT ((hv % 16) + 16) % 16 AS mod16,
         ((hv % 17) + 17) % 17 AS mod17,
         {hrw(16)} AS hrw16,
         {hrw(17)} AS hrw17
  FROM h)
SELECT COUNT(*) AS total,
       SUM(CASE WHEN mod16 <> mod17 THEN 1 ELSE 0 END) AS mod_moved,
       SUM(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END) AS hrw_moved,
       round(SUM(CASE WHEN mod16 <> mod17 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS mod_moved_frac,
       round(SUM(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS hrw_moved_frac
FROM scored
"""


def q_percolation_curve(spark, sf_dir):
    """Bond-percolation curve of the part co-purchase graph: keep each
    edge with hash-gated probability p in {0.002, 0.01, 0.05}, run
    connected components, report component count + giant-component
    size per p — the robustness/phase-transition probe (how much edge
    loss fragments the graph).  Hash gating makes each subgraph a pure
    function of the edge ids, so the recursive-CTE oracle replays the
    exact same draw."""
    li = load_tables(spark, sf_dir)["lineitem"] \
        .select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").cast("string").alias("u"),
                  F.col("b.l_partkey").cast("string").alias("v"))
          .distinct().localCheckpoint(eager=True))
    gate = text.hash60(F.concat(F.lit("perc:"), F.col("u"),
                                F.lit("|"), F.col("v"))) % 10000
    out = None
    for p in (0.002, 0.01, 0.05):
        kept = co.where(gate < int(p * 10000))
        nodes = (kept.select(F.col("u").alias("uid"))
                 .unionByName(kept.select(F.col("v").alias("uid")))
                 .distinct())
        # near the percolation threshold components are long chains:
        # diameter (and so the label-propagation round count) exceeds
        # the default cap; the changed==0 early exit keeps converged
        # runs cheap
        cc = graph_algos.connected_components(
            nodes, kept.select(F.col("u").alias("startuid"),
                               F.col("v").alias("enduid")),
            max_iter=80)
        stats = (cc.groupBy("component").agg(F.count("*").alias("sz"))
                 .agg(F.count("*").alias("n_components"),
                      F.max("sz").cast("long").alias("giant_size"),
                      F.sum("sz").cast("long").alias("n_nodes"))
                 .select(F.lit(p).alias("p"), "n_components",
                         "giant_size", "n_nodes"))
        out = stats if out is None else out.unionByName(stats)
    return out


def _percolation_oracle_sql() -> str:
    parts = []
    for p in (0.002, 0.01, 0.05):
        t = int(p * 10000)
        parts.append(f"""
SELECT CAST({p} AS DOUBLE) AS p, COUNT(*) AS n_components,
       CAST(MAX(sz) AS BIGINT) AS giant_size,
       CAST(SUM(sz) AS BIGINT) AS n_nodes
FROM (
  WITH RECURSIVE
  kept AS (
    SELECT u, v FROM (
      SELECT DISTINCT CAST(a.l_partkey AS VARCHAR) AS u,
             CAST(b.l_partkey AS VARCHAR) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    WHERE CAST(('0x' || substr(md5('perc:' || u || '|' || v), 1, 15))
               AS BIGINT) % 10000 < {t}),
  sym AS (SELECT u AS a, v AS b FROM kept
          UNION SELECT v, u FROM kept),
  reach(a, b) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b),
  comp AS (
    SELECT a AS uid, LEAST(a, MIN(b)) AS component
    FROM reach GROUP BY a)
  SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)""")
    return " UNION ALL ".join(parts)


def q_simrank_parts(spark, sf_dir):
    """SimRank (Jeh & Widom 2002) between parts on the directed
    Customer -> Order -> Part graph, C = 0.8, two exact iterations.
    Because orders have exactly one in-neighbor (their customer), the
    recursion collapses to closed joins:

      s1(o1,o2) = C                 iff o1 != o2, same customer
      s2(a,b)   = C/(na*nb) * ( |Ia ∩ Ib|
                  + C * #{(o1,o2): o1 != o2, same cust,
                           a ∈ o1, b ∈ o2} )

    (I = containing orders, n = |I|).  Both terms are exact integer
    counts from keyed joins — the scale shape is two co-occurrence
    joins, never a node-pair dense matrix.  Top 50 pairs by s2."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct()
          .localCheckpoint(eager=True))
    oc = (load_tables(spark, sf_dir)["orders"]
          .select(F.col("o_orderkey").alias("o"),
                  F.col("o_custkey").alias("c")))
    n = li.groupBy("p").agg(F.count("*").alias("n"))
    a, b = li.alias("a"), li.alias("b")
    common = (a.join(b, (F.col("a.o") == F.col("b.o"))
                     & (F.col("a.p") < F.col("b.p")))
              .groupBy(F.col("a.p").alias("pa"),
                       F.col("b.p").alias("pb"))
              .agg(F.count("*").alias("shared")))
    # same-customer distinct-order pairs containing (a, b)
    la = li.join(oc, "o").select(F.col("p").alias("pa"),
                                 F.col("o").alias("oa"), "c")
    lb = li.join(oc, "o").select(F.col("p").alias("pb"),
                                 F.col("o").alias("ob"), "c")
    cross = (la.join(lb, "c")
             .where((F.col("oa") != F.col("ob"))
                    & (F.col("pa") < F.col("pb")))
             .groupBy("pa", "pb").agg(F.count("*").alias("xc")))
    pairs = (common.join(cross, ["pa", "pb"], "full")
             .select("pa", "pb",
                     F.coalesce("shared", F.lit(0)).alias("shared"),
                     F.coalesce("xc", F.lit(0)).alias("xc")))
    s2 = (0.8 / (F.col("na") * F.col("nb"))
          * (F.col("shared") + 0.8 * F.col("xc")))
    return (pairs
            .join(F.broadcast(n.select(F.col("p").alias("pa"),
                                       F.col("n").alias("na"))), "pa")
            .join(F.broadcast(n.select(F.col("p").alias("pb"),
                                       F.col("n").alias("nb"))), "pb")
            .select("pa", "pb", "shared", "xc",
                    F.round(s2, 9).alias("simrank2"))
            .orderBy(F.col("simrank2").desc(), "pa", "pb")
            .limit(50))


_SIMRANK_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
oc AS (SELECT o_orderkey AS o, o_custkey AS c FROM orders),
n AS (SELECT p, COUNT(*) AS n FROM li GROUP BY p),
common AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS shared
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
cross_ AS (
  SELECT la.p AS pa, lb.p AS pb, COUNT(*) AS xc
  FROM (SELECT li.p, li.o, oc.c FROM li JOIN oc USING (o)) la
  JOIN (SELECT li.p, li.o, oc.c FROM li JOIN oc USING (o)) lb
    ON la.c = lb.c AND la.o <> lb.o AND la.p < lb.p
  GROUP BY 1, 2),
pairs AS (
  SELECT COALESCE(common.pa, cross_.pa) AS pa,
         COALESCE(common.pb, cross_.pb) AS pb,
         COALESCE(shared, 0) AS shared, COALESCE(xc, 0) AS xc
  FROM common FULL JOIN cross_
    ON common.pa = cross_.pa AND common.pb = cross_.pb)
SELECT pairs.pa, pairs.pb, pairs.shared, pairs.xc,
       round(0.8 / (na.n * nb.n) * (shared + 0.8 * xc), 9)
         AS simrank2
FROM pairs
JOIN n na ON na.p = pairs.pa
JOIN n nb ON nb.p = pairs.pb
ORDER BY simrank2 DESC, pairs.pa, pairs.pb LIMIT 50
"""


def q_corpus_pipeline_v2(spark, sf_dir):
    """Capstone composition of this session's operators in ONE lazy
    DAG: EXACT near-dup removal (prefix-filtered ssjoin -> connected
    components -> keep min id) -> DSIR top-200 domain tilt (models
    trained on the SURVIVORS, not the raw corpus) -> priority sample
    100 weighted by length -> token-budget shard packing -> per-shard
    stats.  Every stage is an already-oracled operator; the whole
    pipeline replays as one CTE chain."""
    from .operators.pipeline import (dsir_select, pack_shards,
                                     priority_sample)
    docs = _docs(spark, sf_dir)
    pairs = dedup.ssjoin_jaccard(docs, threshold=0.5) \
        .select("id_a", "id_b")
    clusters = dedup.dedup_clusters(pairs)
    drop = (clusters.where(F.col("doc_id") != F.col("cluster"))
            .select("doc_id"))
    surv = docs.join(drop, "doc_id", "left_anti")
    chosen = dsir_select(surv, F.col("lang") == "en", n=200) \
        .select("doc_id")
    sel = surv.select("doc_id", "lang", "n_chars") \
        .join(chosen, "doc_id")
    samp = priority_sample(sel, "n_chars", 100).drop("priority")
    packed = pack_shards(samp, "doc_id", "n_chars", budget=2000,
                         partition_col="lang")
    return (packed.groupBy("lang", "shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("shard_chars")))


_PIPELINE_V2_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
        i -> CAST(('0x' || substr(md5(
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))
             AS BIGINT))) AS s
  FROM toks WHERE len(ws) >= 3),
tt AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         count(*) AS i
  FROM tt a JOIN tt b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
pairs AS (
  SELECT id_a, id_b FROM inter
  WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.5),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM r JOIN sym s ON s.a = r.b)
  SELECT * FROM r),
drop_ AS (
  SELECT a AS doc_id FROM reach GROUP BY a
  HAVING a <> LEAST(a, MIN(b))),
surv AS (
  SELECT d.* FROM documents d
  LEFT JOIN drop_ x ON x.doc_id = d.doc_id WHERE x.doc_id IS NULL),
stoks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         unnest(list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x != '')) AS tok
  FROM surv),
freq AS (
  SELECT tok, COUNT(*) AS tf_all,
         SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tf_tgt
  FROM stoks GROUP BY tok),
sden AS (SELECT SUM(tf_all) + COUNT(*) AS denom_all,
                SUM(tf_tgt) + COUNT(*) AS denom_tgt FROM freq),
scored AS (
  SELECT t.doc_id,
         SUM(CAST(round(log10((f.tf_tgt + 1) * 1.0 / sden.denom_tgt),
                        6) AS DECIMAL(18,6))
             - CAST(round(log10((f.tf_all + 1) * 1.0
                                / sden.denom_all), 6)
                    AS DECIMAL(18,6))) AS r
  FROM stoks t JOIN freq f USING (tok), sden
  GROUP BY t.doc_id),
chosen AS (
  SELECT doc_id FROM scored
  ORDER BY round(CAST(r AS DOUBLE), 6) + 0.0 DESC, doc_id LIMIT 200),
sel AS (
  SELECT s.doc_id, s.lang, s.n_chars FROM surv s
  JOIN chosen USING (doc_id)),
samp AS (
  SELECT doc_id, lang, n_chars FROM sel
  ORDER BY CAST(n_chars AS DOUBLE) * 1152921504606846976.0
           / CAST(CAST(('0x' || substr(md5('ps:' ||
               CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1
             AS DOUBLE) DESC, doc_id
  LIMIT 100),
c AS (
  SELECT lang, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM samp)
SELECT lang,
       CAST(floor((cum - n_chars) / 2000) AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_chars
FROM c GROUP BY lang, shard_id
"""


_SHAPLEY_CHANNELS = ("click", "error", "signup", "view")


def _shapley_lattice():
    """(channel, subset_without, subset_with, num, den) rows for the
    exact Shapley value over the fixed 4-channel lattice: weight =
    |S|! (k-|S|-1)! / k!.  Data-independent — generated once in Python
    and shared as literals with the SQL oracle (subsets encoded as
    comma-joined sorted channel strings; '' = empty set)."""
    import itertools
    from math import factorial
    k = len(_SHAPLEY_CHANNELS)
    rows = []
    for c in _SHAPLEY_CHANNELS:
        rest = [x for x in _SHAPLEY_CHANNELS if x != c]
        for r in range(len(rest) + 1):
            for s in itertools.combinations(rest, r):
                num = factorial(len(s)) * factorial(k - len(s) - 1)
                rows.append((c, ",".join(sorted(s)),
                             ",".join(sorted(s + (c,))),
                             num, factorial(k)))
    return rows


def q_shapley_attribution(spark, sf_dir):
    """EXACT Shapley data-driven attribution (the game-theoretic
    alternative to last-touch): the coalition value v(S) is the
    empirical conversion rate of users whose touched pre-purchase
    channel set is exactly S; each channel's Shapley value sums
    |S|!(k-|S|-1)!/k! [v(S+c) - v(S)] over the 4-channel lattice.
    The lattice and factorial weights are data-independent literals
    shared with the oracle; v terms are 9 dp DECIMAL ratios; unseen
    coalitions contribute v = 0.  One aggregation over users + a
    16-row broadcast join."""
    ev = _events(spark, sf_dir)
    touched = (ev.where(F.col("event_type")
                        .isin(*_SHAPLEY_CHANNELS))
               .groupBy("user_id")
               .agg(F.concat_ws(",", F.array_sort(
                   F.collect_set("event_type"))).alias("sset")))
    conv = (ev.where(F.col("event_type") == "purchase")
            .select("user_id").distinct()
            .withColumn("conv", F.lit(1)))
    v = (touched.join(conv, "user_id", "left")
         .groupBy("sset")
         .agg(F.count("*").alias("n"),
              F.sum(F.coalesce("conv", F.lit(0))).alias("x"))
         .select("sset", F.round(F.col("x") / F.col("n"), 9)
                 .cast("decimal(18,9)").alias("v")))
    lat = spark.createDataFrame(
        _shapley_lattice(),
        "channel string, s_without string, s_with string, "
        "num long, den long")
    j = (lat
         .join(v.withColumnRenamed("sset", "s_with")
               .withColumnRenamed("v", "v_with"), "s_with", "left")
         .join(v.withColumnRenamed("sset", "s_without")
               .withColumnRenamed("v", "v_without"), "s_without",
               "left"))
    term = ((F.coalesce(F.col("v_with"),
                        F.lit(0).cast("decimal(18,9)"))
             - F.coalesce(F.col("v_without"),
                          F.lit(0).cast("decimal(18,9)")))
            * F.col("num"))
    # den is the constant k! = 24; divide as ONE double op after the
    # exact decimal sum (engine decimal-division scale rules differ)
    return (j.groupBy("channel")
            .agg(F.sum(term).cast("double").alias("_s"))
            .select("channel",
                    (F.round(F.col("_s") / 24.0, 9) + F.lit(0.0))
                    .alias("shapley")))


def _shapley_oracle_sql() -> str:
    vals = ", ".join(
        f"('{c}', '{sw}', '{swc}', {num}, {den})"
        for c, sw, swc, num, den in _shapley_lattice())
    chans = ", ".join(f"'{c}'" for c in _SHAPLEY_CHANNELS)
    return f"""
WITH touched AS (
  SELECT user_id,
         array_to_string(list_sort(list_distinct(
             list(event_type))), ',') AS sset
  FROM events WHERE event_type IN ({chans})
  GROUP BY user_id),
conv AS (SELECT DISTINCT user_id FROM events
         WHERE event_type = 'purchase'),
v AS (
  SELECT sset,
         CAST(round(SUM(CASE WHEN c.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 9)
              AS DECIMAL(18,9)) AS v
  FROM touched t LEFT JOIN conv c ON c.user_id = t.user_id
  GROUP BY sset),
lat(channel, s_without, s_with, num, den) AS (VALUES {vals}),
j AS (
  SELECT lat.channel, lat.num, lat.den,
         COALESCE(vw.v, CAST(0 AS DECIMAL(18,9))) AS v_with,
         COALESCE(vo.v, CAST(0 AS DECIMAL(18,9))) AS v_without
  FROM lat
  LEFT JOIN v vw ON vw.sset = lat.s_with
  LEFT JOIN v vo ON vo.sset = lat.s_without)
SELECT channel,
       round(CAST(SUM((v_with - v_without) * num) AS DOUBLE) / 24.0,
             9) + 0.0 AS shapley
FROM j GROUP BY channel
"""


def q_attack_robustness(spark, sf_dir):
    """Scale-free fragility probe (Albert-Barabasi): remove 100 parts
    from the co-purchase graph either TARGETED (highest degree, ties
    by key) or RANDOM (hash-selected), and compare the surviving
    component structure — targeted removal shatters hub-dominated
    graphs while random removal barely dents them.  Two CC runs over
    hash-deterministic subgraphs."""
    li = load_tables(spark, sf_dir)["lineitem"] \
        .select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
          .select(F.col("a.l_partkey").cast("string").alias("u"),
                  F.col("b.l_partkey").cast("string").alias("v"))
          .distinct().localCheckpoint(eager=True))
    deg = (co.select(F.col("u").alias("n"))
           .unionByName(co.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count("*").alias("d")))
    from pyspark.sql import Window as W
    targeted = (deg.withColumn("r", F.row_number().over(
        W.orderBy(F.col("d").desc(), F.col("n"))))
        .where(F.col("r") <= 100).select("n"))
    rnd = (deg.withColumn("h", text.hash60(
        F.concat(F.lit("atk:"), F.col("n"))))
        .withColumn("r", F.row_number().over(
            W.orderBy(F.col("h"), F.col("n"))))
        .where(F.col("r") <= 100).select("n"))
    out = None
    for name, rm in (("targeted", targeted), ("random", rnd)):
        kept = (co.join(rm.withColumnRenamed("n", "u"), "u",
                        "left_anti")
                .join(rm.withColumnRenamed("n", "v"), "v",
                      "left_anti"))
        nodes = (kept.select(F.col("u").alias("uid"))
                 .unionByName(kept.select(F.col("v").alias("uid")))
                 .distinct())
        cc = graph_algos.connected_components(
            nodes, kept.select(F.col("u").alias("startuid"),
                               F.col("v").alias("enduid")),
            max_iter=80)
        st = (cc.groupBy("component").agg(F.count("*").alias("sz"))
              .agg(F.count("*").alias("n_components"),
                   F.max("sz").cast("long").alias("giant_size"),
                   F.sum("sz").cast("long").alias("n_nodes"))
              .select(F.lit(name).alias("scenario"), "n_components",
                      "giant_size", "n_nodes"))
        out = st if out is None else out.unionByName(st)
    return out


def _attack_oracle_sql() -> str:
    parts = []
    for name, rmcte in (
        ("targeted", """
  SELECT n FROM (
    SELECT n, row_number() OVER (ORDER BY d DESC, n) AS r FROM deg)
  WHERE r <= 100"""),
        ("random", """
  SELECT n FROM (
    SELECT n, row_number() OVER (ORDER BY
      CAST(('0x' || substr(md5('atk:' || n), 1, 15)) AS BIGINT), n)
      AS r FROM deg)
  WHERE r <= 100""")):
        parts.append(f"""
SELECT '{name}' AS scenario, COUNT(*) AS n_components,
       CAST(MAX(sz) AS BIGINT) AS giant_size,
       CAST(SUM(sz) AS BIGINT) AS n_nodes
FROM (
  WITH RECURSIVE
  co AS (
    SELECT DISTINCT CAST(a.l_partkey AS VARCHAR) AS u,
           CAST(b.l_partkey AS VARCHAR) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
  deg AS (
    SELECT n, COUNT(*) AS d FROM (
      SELECT u AS n FROM co UNION ALL SELECT v FROM co) GROUP BY n),
  rm AS ({rmcte}),
  kept AS (
    SELECT co.u, co.v FROM co
    LEFT JOIN rm x ON x.n = co.u
    LEFT JOIN rm y ON y.n = co.v
    WHERE x.n IS NULL AND y.n IS NULL),
  sym AS (SELECT u AS a, v AS b FROM kept
          UNION SELECT v, u FROM kept),
  reach(a, b) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b),
  comp AS (
    SELECT a AS uid, LEAST(a, MIN(b)) AS component
    FROM reach GROUP BY a)
  SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)""")
    return " UNION ALL ".join(parts)


def q_kappa_langid(spark, sf_dir):
    """Cohen's kappa between the engine's own stopword-vote language
    identifier (q:language_id) and the corpus ground-truth ``lang``
    column — chance-corrected agreement, the honest way to score a
    classifier against labels (accuracy flatters under class
    imbalance).  po/pe from exact integer confusion counts; kappa =
    (po - pe)/(1 - pe) in doubles."""
    guessed = text.language_id(_docs(spark, sf_dir)) \
        .select("doc_id", "lang_guess", "lang")
    conf = guessed.groupBy("lang", "lang_guess") \
        .agg(F.count("*").alias("c"))
    n = F.sum("c")
    agree = F.sum(F.when(F.col("lang") == F.col("lang_guess"),
                         F.col("c")).otherwise(0))
    row = conf.groupBy("lang").agg(F.sum("c").alias("rc"))
    colt = conf.groupBy("lang_guess").agg(F.sum("c").alias("cc"))
    pe_num = (row.join(colt, row["lang"] == colt["lang_guess"])
              .agg(F.sum(F.col("rc") * F.col("cc")).alias("pn")))
    tot = conf.agg(n.alias("n"), agree.alias("agree"))
    return (tot.crossJoin(F.broadcast(pe_num))
            .select("n", "agree",
                    F.round(F.col("agree") / F.col("n"), 9).alias("po"),
                    F.round(F.col("pn") / (F.col("n") * F.col("n")), 9)
                    .alias("pe"),
                    F.round((F.col("agree") / F.col("n")
                             - F.col("pn") / (F.col("n") * F.col("n")))
                            / (1 - F.col("pn")
                               / (F.col("n") * F.col("n"))), 6)
                    .alias("kappa")))


def _kappa_oracle_sql() -> str:
    # reuse the committed language_id oracle as the guess source
    lang_guess = ORACLES["language_id"]
    return f"""
WITH guesses AS ({lang_guess}),
conf AS (
  SELECT d.lang, g.lang_guess, COUNT(*) AS c
  FROM guesses g JOIN documents d USING (doc_id)
  GROUP BY 1, 2),
tot AS (
  SELECT SUM(c) AS n,
         SUM(CASE WHEN lang = lang_guess THEN c ELSE 0 END) AS agree
  FROM conf),
r AS (SELECT lang, SUM(c) AS rc FROM conf GROUP BY lang),
co AS (SELECT lang_guess, SUM(c) AS cc FROM conf GROUP BY lang_guess),
pe AS (
  SELECT SUM(r.rc * co.cc) AS pn
  FROM r JOIN co ON co.lang_guess = r.lang)
SELECT n, agree,
       round(agree * 1.0 / n, 9) AS po,
       round(pn * 1.0 / (n * n), 9) AS pe,
       round((agree * 1.0 / n - pn * 1.0 / (n * n))
             / (1 - pn * 1.0 / (n * n)), 6) AS kappa
FROM tot, pe
"""


def q_boilerplate_lines(spark, sf_dir):
    """Boilerplate detection: verbatim 8-token grams appearing in >= 3
    DISTINCT documents (the C4/RefinedWeb 'repeated span' signal that
    flags headers, footers and templates for removal before
    training).  One explode + per-doc distinct + count — the scan
    shape that works at crawl scale because grams hash-group and
    documents never pair."""
    docs = _docs(spark, sf_dir)
    ws = text.tokens(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_ws") - 7),
        lambda i: F.array_join(F.slice(F.col("_ws"), i, 8), " "))
    g = (docs.select("doc_id", ws.alias("_ws"))
         .where(F.size("_ws") >= 8)
         .select("doc_id", F.explode(grams).alias("gram"))
         .distinct())
    return (g.groupBy("gram")
            .agg(F.count("*").alias("n_docs"))
            .where(F.col("n_docs") >= 3))


_BOILERPLATE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),
         '[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[CAST(t.i AS INT):CAST(t.i AS INT) + 7],
                         ' ') AS gram
  FROM toks, UNNEST(range(1, len(ws) - 6)) AS t(i)
  WHERE len(ws) >= 8)
SELECT gram, COUNT(*) AS n_docs
FROM g GROUP BY gram HAVING COUNT(*) >= 3
"""


def q_heaps_law(spark, sf_dir):
    """Heaps' law fit: distinct-vocabulary growth V(n) ~ K n^beta over
    cumulative document prefixes (by doc_id).  Sample points every 25
    documents; beta from the closed-form regression of ln V on ln n
    with each ln taken on an INTEGER and rounded to 9 dp DECIMAL (the
    zipf_slope ladder) — libm-proof.  The sub-linearity check that a
    natural corpus passes and template spam fails."""
    docs = _docs(spark, sf_dir)
    toks = (docs.select("doc_id",
                        F.explode(text.tokens(F.col("text")))
                        .alias("tok"))
            .groupBy("tok").agg(F.min("doc_id").alias("first_doc")))
    # V(n) = tokens first seen at doc <= n; n from the doc-id grid
    grid = (docs.select("doc_id")
            .where(F.col("doc_id") % 25 == 0))
    vn = (grid.join(toks,
                    toks["first_doc"] <= grid["doc_id"], "left")
          .groupBy(grid["doc_id"].alias("n"))
          .agg(F.count("tok").alias("v"))
          .where(F.col("v") > 0))
    x = F.round(F.log(F.col("n").cast("double") + 1), 9) \
        .cast("decimal(18,9)")
    y = F.round(F.log(F.col("v").cast("double")), 9) \
        .cast("decimal(18,9)")
    t = vn.select(x.alias("x"), y.alias("y"),
                  (x * y).cast("decimal(38,18)").alias("xy"),
                  (x * x).cast("decimal(38,18)").alias("xx"))
    agg = t.agg(F.count("*").cast("double").alias("k"),
                F.sum("x").cast("double").alias("sx"),
                F.sum("y").cast("double").alias("sy"),
                F.sum("xy").cast("double").alias("sxy"),
                F.sum("xx").cast("double").alias("sxx"))
    beta = ((F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx")
               - F.col("sx") * F.col("sx")))
    return agg.select(F.col("k").cast("long").alias("n_points"),
                      F.round(beta, 6).alias("heaps_beta"))


_HEAPS_ORACLE = """
WITH toks AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM (
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
           '[^a-z0-9]+'), x -> x != '')) AS tok
    FROM documents)
  GROUP BY tok),
grid AS (SELECT doc_id AS n FROM documents WHERE doc_id % 25 = 0),
vn AS (
  SELECT g.n, COUNT(t.tok) AS v
  FROM grid g LEFT JOIN toks t ON t.first_doc <= g.n
  GROUP BY g.n HAVING COUNT(t.tok) > 0),
t AS (
  SELECT CAST(round(ln(n + 1.0), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(v * 1.0), 9) AS DECIMAL(18,9)) AS y
  FROM vn),
a AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
  FROM t)
SELECT CAST(k AS BIGINT) AS n_points,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
         AS heaps_beta
FROM a
"""


def q_burstiness_users(spark, sf_dir):
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of each
    user's inter-event gaps: B -> -1 periodic, 0 Poisson, +1 bursty —
    the behavioral fingerprint separating schedulers/bots from humans.
    Integer-second gaps; mu and sigma from exact integer moment sums;
    sqrt is the only irrational (IEEE-exact)."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"), "event_id")
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    gaps = (ev.withColumn("g", F.col("t") - F.lag("t").over(w))
            .where(F.col("g").isNotNull()))
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("k"),
        F.sum("g").cast("decimal(38,0)").alias("s"),
        F.sum((F.col("g").cast("decimal(19,0)") * F.col("g")))
        .cast("decimal(38,0)").alias("q"))
    mu = F.col("s").cast("double") / F.col("k")
    var = (F.col("q").cast("double") / F.col("k")) - mu * mu
    sd = F.sqrt(var)
    return (agg.where(F.col("k") >= 10)
            .select("user_id", F.col("k").alias("n_gaps"),
                    F.round((sd - mu) / (sd + mu), 6)
                    .alias("burstiness")))


_BURSTINESS_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
  FROM events),
gaps AS (
  SELECT user_id,
         t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
           AS g
  FROM ev),
agg AS (
  SELECT user_id, COUNT(*) AS k,
         CAST(SUM(g) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(g AS DECIMAL(19,0)) * g) AS DECIMAL(38,0)) AS q
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id)
SELECT user_id, k AS n_gaps,
       round((sqrt(CAST(q AS DOUBLE) / k
                   - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k))
              - CAST(s AS DOUBLE) / k)
             / (sqrt(CAST(q AS DOUBLE) / k
                     - (CAST(s AS DOUBLE) / k)
                       * (CAST(s AS DOUBLE) / k))
                + CAST(s AS DOUBLE) / k), 6) AS burstiness
FROM agg WHERE k >= 10
"""


_DCG_DISCOUNTS = [1.0 / math.log2(i + 1) for i in range(1, 6)]
_IDCG5 = sum((6 - i) * _DCG_DISCOUNTS[i - 1] for i in range(1, 6))


def q_ndcg_ann(spark, sf_dir):
    """Retrieval-quality audit of the engine's OWN ANN: recall@5 and
    nDCG@5 of the LSH-bucketed probe (q:ann_lsh_topk) against the
    brute-force exact ranking (q:knn_cosine) for the probe query.
    Graded relevance = 6 - exact_rank; position discounts are
    Python-computed log2 literals shared with the oracle (no runtime
    log anywhere).  The measurement that tells you whether the
    approximate index is good enough to replace the exact scan."""
    gt = q_knn_cosine(spark, sf_dir)
    ann = q_ann_lsh_topk(spark, sf_dir)
    from pyspark.sql import Window as W
    rgt = gt.withColumn("rank_gt", F.row_number().over(
        W.orderBy(F.col("cosine").desc(), "vec_id"))).drop("cosine")
    rann = ann.withColumn("pos", F.row_number().over(
        W.orderBy(F.col("cosine").desc(), "vec_id"))).drop("cosine")
    disc = F.array(*[F.lit(d) for d in _DCG_DISCOUNTS])
    j = (rann.join(rgt, "vec_id", "left")
         .select("pos",
                 F.coalesce(6 - F.col("rank_gt"), F.lit(0))
                 .alias("rel"))
         .select((F.col("rel")
                  * F.element_at(disc, F.col("pos"))).alias("g"),
                 (F.col("rel") > 0).cast("int").alias("hit")))
    return (j.agg(F.sum("hit").alias("n_hits"),
                  F.round(F.sum("hit") / 5.0, 6).alias("recall5"),
                  F.round(F.sum("g") / F.lit(_IDCG5), 6)
                  .alias("ndcg5")))


def _ndcg_oracle_sql() -> str:
    discounts = ", ".join(f"({i + 1}, {d!r})"
                          for i, d in enumerate(_DCG_DISCOUNTS))
    return f"""
WITH gt AS ({ORACLES["knn_cosine"]}),
ann AS ({ORACLES["ann_lsh_topk"]}),
rgt AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id)
    AS rank_gt FROM gt),
rann AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id)
    AS pos FROM ann),
disc(pos, d) AS (VALUES {discounts}),
j AS (
  SELECT COALESCE(6 - rgt.rank_gt, 0) AS rel, disc.d
  FROM rann
  LEFT JOIN rgt ON rgt.vec_id = rann.vec_id
  JOIN disc ON disc.pos = rann.pos)
SELECT SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hits,
       round(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) / 5.0, 6)
         AS recall5,
       round(SUM(rel * d) / {_IDCG5!r}, 6) AS ndcg5
FROM j
"""


def q_kfold_groups(spark, sf_dir):
    """Leakage-safe GROUPED 5-fold assignment: every customer's orders
    land in exactly one fold (fold = md5 of the GROUP key), so
    cross-validation never trains on a customer it tests on.  Output:
    per-fold order/customer counts — the distinct-customer total must
    partition (the oracle recomputes it independently)."""
    o = load_tables(spark, sf_dir)["orders"]
    fold = text.hash60(F.concat(F.lit("cv:"),
                                F.col("o_custkey").cast("string"))) % 5
    return (o.select(fold.alias("fold"), "o_orderkey", "o_custkey")
            .groupBy("fold")
            .agg(F.count("*").alias("n_orders"),
                 F.countDistinct("o_custkey").alias("n_customers")))


_KFOLD_ORACLE = """
SELECT CAST(('0x' || substr(md5('cv:' || CAST(o_custkey AS VARCHAR)),
            1, 15)) AS BIGINT) % 5 AS fold,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1
"""


def q_timeseries_cv(spark, sf_dir):
    """Expanding-window temporal cross-validation folds — the CV that
    is SOUND for forecasting (random k-fold leaks the future): three
    cutoffs, train = everything before, test = the following year.
    Output per fold: train/test row counts + revenue, all exact."""
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)")).alias("p"))
    out = None
    for i, cut in enumerate(("1997-01-01", "1998-01-01", "1999-01-01")):
        test_end = f"{int(cut[:4]) + 1}-01-01"
        f = (o.select(
            F.lit(i + 1).alias("fold"),
            (F.col("o_orderdate") < F.lit(cut)).cast("int")
            .alias("is_train"),
            F.when((F.col("o_orderdate") >= F.lit(cut))
                   & (F.col("o_orderdate") < F.lit(test_end)), 1)
            .otherwise(0).alias("is_test"), "p")
            .agg(F.first(F.lit(i + 1)).alias("fold"),
                 F.sum("is_train").alias("n_train"),
                 F.sum("is_test").alias("n_test"),
                 F.sum(F.when(F.col("is_test") == 1, F.col("p"))
                       .otherwise(0)).cast("decimal(28,2)")
                 .alias("test_revenue")))
        out = f if out is None else out.unionByName(f)
    return out


_TSCV_ORACLE = """
SELECT fold,
       SUM(CASE WHEN o_orderdate < cut THEN 1 ELSE 0 END) AS n_train,
       SUM(CASE WHEN o_orderdate >= cut AND o_orderdate < te
                THEN 1 ELSE 0 END) AS n_test,
       CAST(SUM(CASE WHEN o_orderdate >= cut AND o_orderdate < te
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE 0 END) AS DECIMAL(28,2)) AS test_revenue
FROM orders, (VALUES
  (1, DATE '1997-01-01', DATE '1998-01-01'),
  (2, DATE '1998-01-01', DATE '1999-01-01'),
  (3, DATE '1999-01-01', DATE '2000-01-01')) AS f(fold, cut, te)
GROUP BY fold
"""


def q_dispersion_index(spark, sf_dir):
    """Dispersion index (variance-to-mean ratio) of daily counts per
    event type: 1 = Poisson, > 1 overdispersed (burst clusters), < 1
    underdispersed (rate-limited) — the first question about any
    event stream.  Exact integer moment sums; two IEEE divisions."""
    ev = _events(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("day"))
             .agg(F.count("*").alias("c")))
    agg = daily.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"))
    mu = F.col("s").cast("double") / F.col("k")
    var = (F.col("q").cast("double") / F.col("k")) - mu * mu
    return agg.select("event_type", F.col("k").alias("n_days"),
                      F.round(mu, 6).alias("mean_daily"),
                      F.round(var / mu, 6).alias("dispersion"))


_DISPERSION_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT event_type, COUNT(*) AS k, SUM(c) AS s, SUM(c * c) AS q
  FROM daily GROUP BY event_type)
SELECT event_type, k AS n_days,
       round(CAST(s AS DOUBLE) / k, 6) AS mean_daily,
       round((CAST(q AS DOUBLE) / k
              - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k))
             / (CAST(s AS DOUBLE) / k), 6) AS dispersion
FROM agg
"""


def q_did_estimator(spark, sf_dir):
    """Difference-in-differences: change in mean order value for the
    BUILDING segment vs all other segments, before vs after 1998 —
    the workhorse causal estimator when randomization isn't available
    (parallel-trends caveat applies).  Four exact DECIMAL cell means;
    DiD = (T_post - T_pre) - (C_post - C_pre) in doubles."""
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .select((F.col("c_mktsegment") == "BUILDING").alias("treat"),
                 (F.col("o_orderdate") >= F.lit("1998-01-01"))
                 .alias("post"),
                 F.col("o_totalprice").cast("decimal(18,2)")
                 .alias("p")))
    cell = (j.groupBy("treat", "post")
            .agg(F.count("*").alias("n"),
                 F.sum("p").cast("decimal(28,2)").alias("s"))
            .select("treat", "post",
                    (F.col("s").cast("double") / F.col("n"))
                    .alias("m")))
    agg = cell.agg(
        F.sum(F.when(F.col("treat") & F.col("post"),
                     F.col("m"))).alias("tp"),
        F.sum(F.when(F.col("treat") & ~F.col("post"),
                     F.col("m"))).alias("tb"),
        F.sum(F.when(~F.col("treat") & F.col("post"),
                     F.col("m"))).alias("cp"),
        F.sum(F.when(~F.col("treat") & ~F.col("post"),
                     F.col("m"))).alias("cb"))
    return agg.select(
        F.round("tp", 6).alias("treat_post"),
        F.round("tb", 6).alias("treat_pre"),
        F.round("cp", 6).alias("ctrl_post"),
        F.round("cb", 6).alias("ctrl_pre"),
        F.round((F.col("tp") - F.col("tb"))
                - (F.col("cp") - F.col("cb")), 6).alias("did"))


_DID_ORACLE = """
WITH cell AS (
  SELECT c_mktsegment = 'BUILDING' AS treat,
         o_orderdate >= DATE '1998-01-01' AS post,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(28,2)) AS s,
         COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
m AS (SELECT treat, post, CAST(s AS DOUBLE) / n AS m FROM cell),
agg AS (
  SELECT SUM(CASE WHEN treat AND post THEN m END) AS tp,
         SUM(CASE WHEN treat AND NOT post THEN m END) AS tb,
         SUM(CASE WHEN NOT treat AND post THEN m END) AS cp,
         SUM(CASE WHEN NOT treat AND NOT post THEN m END) AS cb
  FROM m)
SELECT round(tp, 6) AS treat_post, round(tb, 6) AS treat_pre,
       round(cp, 6) AS ctrl_post, round(cb, 6) AS ctrl_pre,
       round((tp - tb) - (cp - cb), 6) AS did
FROM agg
"""


def q_littles_law(spark, sf_dir):
    """Little's law audit (L = lambda * W) over user activity spans:
    measured time-average concurrency L (total covered user-seconds /
    horizon) must equal arrival rate (spans / horizon) times mean span
    W — an identity here by construction, so the ratio is exactly 1;
    the value of the query is the operational L, lambda, W
    decomposition every capacity plan starts from.  Integer seconds
    everywhere; three IEEE divisions."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long")
         + F.col("value").cast("long")).alias("e"))
    horizon = ev.agg((F.max("e") - F.min("s")).alias("h"),
                     F.count("*").alias("n"),
                     F.sum(F.col("e") - F.col("s")).cast("long")
                     .alias("busy"))
    return horizon.select(
        "n", F.col("h").alias("horizon_sec"),
        F.round(F.col("busy") / F.col("h"), 6).alias("avg_concurrency"),
        F.round(F.col("n") / F.col("h").cast("double"), 9)
        .alias("arrival_rate"),
        F.round(F.col("busy") / F.col("n").cast("double"), 6)
        .alias("mean_span_sec"))


_LITTLES_ORACLE = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CAST(floor(value) AS BIGINT) AS e
  FROM events),
a AS (
  SELECT MAX(e) - MIN(s) AS h, COUNT(*) AS n,
         CAST(SUM(e - s) AS BIGINT) AS busy
  FROM ev)
SELECT n, h AS horizon_sec,
       round(busy * 1.0 / h, 6) AS avg_concurrency,
       round(n * 1.0 / h, 9) AS arrival_rate,
       round(busy * 1.0 / n, 6) AS mean_span_sec
FROM a
"""


def q_aa_test(spark, sf_dir):
    """A/A experiment sanity check: hash-split customers into two null
    arms and z-test the revenue-per-order difference — a healthy
    randomizer must NOT find an effect (|z| small); a skewed hash or
    leaky split shows up here before any real A/B runs.  Exact DECIMAL
    moment sums per arm; sqrt-only irrationals."""
    o = load_tables(spark, sf_dir)["orders"]
    arm = (text.hash60(F.concat(F.lit("aa:"),
                                F.col("o_custkey").cast("string")))
           % 2).alias("arm")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    g = (o.select(arm, cents.alias("y"))
         .groupBy("arm")
         .agg(F.count("*").alias("n"),
              F.sum("y").cast("decimal(38,0)").alias("s"),
              F.sum((F.col("y").cast("decimal(19,0)") * F.col("y")))
              .cast("decimal(38,0)").alias("q")))
    mu = F.col("s").cast("double") / F.col("n")
    var = (F.col("q").cast("double") / F.col("n")) - mu * mu
    stats = g.select("arm", "n", mu.alias("m"),
                     (var / F.col("n")).alias("vn"))
    a = stats.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("m").alias("m0"),
        F.col("vn").alias("v0"))
    b = stats.where(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("m").alias("m1"),
        F.col("vn").alias("v1"))
    return (a.crossJoin(F.broadcast(b))
            .select("n0", "n1",
                    F.round((F.col("m0") - F.col("m1"))
                            / F.sqrt(F.col("v0") + F.col("v1")), 6)
                    .alias("z"),
                    (F.abs((F.col("m0") - F.col("m1"))
                           / F.sqrt(F.col("v0") + F.col("v1"))) < 3)
                    .alias("healthy")))


_AA_ORACLE = """
WITH g AS (
  SELECT CAST(('0x' || substr(md5('aa:' || CAST(o_custkey AS VARCHAR)),
              1, 15)) AS BIGINT) % 2 AS arm,
         COUNT(*) AS n,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) AS DECIMAL(19,0))
                  * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS DECIMAL(38,0)) AS q
  FROM orders GROUP BY 1),
st AS (
  SELECT arm, n, CAST(s AS DOUBLE) / n AS m,
         (CAST(q AS DOUBLE) / n
          - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / n
           AS vn
  FROM g)
SELECT a.n AS n0, b.n AS n1,
       round((a.m - b.m) / sqrt(a.vn + b.vn), 6) AS z,
       abs((a.m - b.m) / sqrt(a.vn + b.vn)) < 3 AS healthy
FROM st a JOIN st b ON a.arm = 0 AND b.arm = 1
"""


def q_price_elasticity(spark, sf_dir):
    """Log-log price elasticity of demand: OLS slope of ln(quantity)
    on ln(unit price cents) over lineitem — both logs taken on exact
    INTEGERS and rounded to the 9 dp DECIMAL ladder (libm-proof), the
    closed-form slope in doubles.  The one-number summary every
    pricing team asks for first."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").cast("long").alias("qty"),
        ((F.col("l_extendedprice").cast("decimal(18,2)")
          / F.col("l_quantity")).cast("decimal(18,2)") * 100)
        .cast("long").alias("unit_cents"))
    x = F.round(F.log(F.col("unit_cents").cast("double")), 9) \
        .cast("decimal(18,9)")
    y = F.round(F.log(F.col("qty").cast("double")), 9) \
        .cast("decimal(18,9)")
    t = li.where((F.col("qty") > 0) & (F.col("unit_cents") > 0)) \
        .select(x.alias("x"), y.alias("y"),
                (x * y).cast("decimal(38,18)").alias("xy"),
                (x * x).cast("decimal(38,18)").alias("xx"))
    agg = t.agg(F.count("*").cast("double").alias("k"),
                F.sum("x").cast("double").alias("sx"),
                F.sum("y").cast("double").alias("sy"),
                F.sum("xy").cast("double").alias("sxy"),
                F.sum("xx").cast("double").alias("sxx"))
    slope = ((F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return agg.select(F.col("k").cast("long").alias("n"),
                      F.round(slope, 6).alias("elasticity"))


_ELASTICITY_ORACLE = """
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) / l_quantity
                   AS DECIMAL(18,2)) * 100 AS BIGINT) AS unit_cents
  FROM lineitem),
t AS (
  SELECT CAST(round(ln(unit_cents * 1.0), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(qty * 1.0), 9) AS DECIMAL(18,9)) AS y
  FROM li WHERE qty > 0 AND unit_cents > 0),
a AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
  FROM t)
SELECT CAST(k AS BIGINT) AS n,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
         AS elasticity
FROM a
"""


def q_repeat_purchase_fit(spark, sf_dir):
    """Repeat-purchase geometric fit: the distribution of orders per
    customer and the MLE of a geometric model p = 1/mean — the
    zeroth-order BG/NBD stand-in that answers 'how heavy is the
    repeat tail'.  Exact counts; one division."""
    o = load_tables(spark, sf_dir)["orders"]
    per = o.groupBy("o_custkey").agg(F.count("*").alias("k"))
    agg = per.agg(F.count("*").alias("n_customers"),
                  F.sum("k").cast("long").alias("n_orders"),
                  F.max("k").alias("max_orders"))
    return agg.select("n_customers", "n_orders", "max_orders",
                      F.round(F.col("n_customers")
                              / F.col("n_orders").cast("double"), 9)
                      .alias("geometric_p"))


_REPEAT_FIT_ORACLE = """
WITH per AS (
  SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY o_custkey)
SELECT COUNT(*) AS n_customers,
       CAST(SUM(k) AS BIGINT) AS n_orders,
       CAST(MAX(k) AS BIGINT) AS max_orders,
       round(COUNT(*) * 1.0 / SUM(k), 9) AS geometric_p
FROM per
"""


def q_abc_xyz(spark, sf_dir):
    """ABC/XYZ inventory matrix: parts cross-classified by revenue
    volume class (A/B/C = top 20/50/100 cumulative-share cut) and
    demand-variability class (X/Y/Z = weekly CV < 0.5 / < 1.0 / else).
    Output: matrix cell counts — the planner's 9-cell prioritization.
    CV uses exact integer moments + sqrt; cumulative shares are
    DECIMAL-exact."""
    from pyspark.sql import Window as W
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_partkey",
        F.date_trunc("week", F.col("l_shipdate").cast("timestamp"))
        .alias("wk"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    weekly = (li.groupBy("l_partkey", "wk")
              .agg(F.sum("cents").alias("y")))
    m = weekly.groupBy("l_partkey").agg(
        F.count("*").alias("k"),
        F.sum("y").cast("decimal(38,0)").alias("s"),
        F.sum((F.col("y").cast("decimal(19,0)") * F.col("y")))
        .cast("decimal(38,0)").alias("q"))
    mu = F.col("s").cast("double") / F.col("k")
    sd = F.sqrt((F.col("q").cast("double") / F.col("k")) - mu * mu)
    tot = m.agg(F.sum("s").cast("decimal(38,0)").alias("t"))
    w = W.orderBy(F.col("s").desc(), F.col("l_partkey"))
    ranked = (m.crossJoin(F.broadcast(tot))
              .withColumn("cum", F.sum("s").over(
                  w.rowsBetween(W.unboundedPreceding, W.currentRow)))
              .withColumn("share",
                          F.col("cum").cast("double")
                          / F.col("t").cast("double")))
    abc = (F.when(F.col("share") <= 0.2, "A")
           .when(F.col("share") <= 0.5, "B").otherwise("C"))
    cv = sd / mu
    xyz = (F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z"))
    return (ranked.select(abc.alias("abc"), xyz.alias("xyz"))
            .groupBy("abc", "xyz").agg(F.count("*").alias("n_parts")))


_ABC_XYZ_ORACLE = """
WITH li AS (
  SELECT l_partkey,
         date_trunc('week', CAST(l_shipdate AS TIMESTAMP)) AS wk,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM lineitem),
weekly AS (
  SELECT l_partkey, wk, SUM(cents) AS y FROM li GROUP BY 1, 2),
m AS (
  SELECT l_partkey, COUNT(*) AS k,
         CAST(SUM(y) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS q
  FROM weekly GROUP BY l_partkey),
tot AS (SELECT CAST(SUM(s) AS DECIMAL(38,0)) AS t FROM m),
ranked AS (
  SELECT m.*, tot.t,
         SUM(s) OVER (ORDER BY s DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM m, tot),
cls AS (
  SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) <= 0.2
              THEN 'A'
              WHEN CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) <= 0.5
              THEN 'B' ELSE 'C' END AS abc,
         CASE WHEN sqrt(CAST(q AS DOUBLE) / k
                        - (CAST(s AS DOUBLE) / k)
                          * (CAST(s AS DOUBLE) / k))
                   / (CAST(s AS DOUBLE) / k) < 0.5 THEN 'X'
              WHEN sqrt(CAST(q AS DOUBLE) / k
                        - (CAST(s AS DOUBLE) / k)
                          * (CAST(s AS DOUBLE) / k))
                   / (CAST(s AS DOUBLE) / k) < 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM ranked)
SELECT abc, xyz, COUNT(*) AS n_parts FROM cls GROUP BY 1, 2
"""


def q_p_chart(spark, sf_dir):
    """Statistical process control p-chart: daily proportion of
    'error' events with 3-sigma control limits p_bar +-
    3*sqrt(p_bar(1-p_bar)/n_day) and a per-day out-of-control flag
    (all FALSE on the uniform fixture — the limits themselves are what
    the gate verifies).  The Shewhart chart on a stream — exact
    integer counts, sqrt-only irrationals."""
    ev = _events(spark, sf_dir)
    daily = (ev.groupBy(F.col("ts").cast("date").alias("day"))
             .agg(F.count("*").alias("n"),
                  F.sum(F.when(F.col("event_type") == "error", 1)
                        .otherwise(0)).alias("x")))
    tot = daily.agg(F.sum("n").alias("tn"), F.sum("x").alias("tx"))
    j = daily.crossJoin(F.broadcast(tot))
    pbar = F.col("tx") / F.col("tn")
    p = F.col("x") / F.col("n")
    half = 3 * F.sqrt(pbar * (1 - pbar) / F.col("n"))
    return (j.select("day", "n", "x",
                     F.round(p, 6).alias("p"),
                     F.round(pbar - half, 6).alias("lcl"),
                     F.round(pbar + half, 6).alias("ucl"),
                     ((p < pbar - half) | (p > pbar + half))
                     .alias("out_of_control")))


_P_CHART_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1),
tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM daily)
SELECT day, n, x,
       round(x * 1.0 / n, 6) AS p,
       round(tx * 1.0 / tn
             - 3 * sqrt((tx * 1.0 / tn) * (1 - tx * 1.0 / tn) / n),
             6) AS lcl,
       round(tx * 1.0 / tn
             + 3 * sqrt((tx * 1.0 / tn) * (1 - tx * 1.0 / tn) / n),
             6) AS ucl,
       (x * 1.0 / n < tx * 1.0 / tn
          - 3 * sqrt((tx * 1.0 / tn) * (1 - tx * 1.0 / tn) / n)
        OR x * 1.0 / n > tx * 1.0 / tn
          + 3 * sqrt((tx * 1.0 / tn) * (1 - tx * 1.0 / tn) / n))
         AS out_of_control
FROM daily, tot
"""


def q_topk_turnover(spark, sf_dir):
    """Week-over-week turnover of the top-20 revenue parts: Jaccard
    between consecutive weekly leaderboards — the assortment-stability
    metric (1 = frozen catalog, 0 = full churn).  Leaderboards by
    (revenue desc, part) rank; set overlap via one self-join on week+1;
    exact integer intersections."""
    from pyspark.sql import Window as W
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.date_trunc("week", F.col("l_shipdate").cast("timestamp"))
        .cast("date").alias("wk"),
        "l_partkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    wkrev = li.groupBy("wk", "l_partkey").agg(
        F.sum("cents").alias("rev"))
    w = W.partitionBy("wk").orderBy(F.col("rev").desc(), "l_partkey")
    top = (wkrev.withColumn("r", F.row_number().over(w))
           .where(F.col("r") <= 20).select("wk", "l_partkey"))
    nxt = top.select(F.date_add(F.col("wk"), 7).alias("wk"),
                     F.col("l_partkey"))
    inter = (top.join(nxt, ["wk", "l_partkey"])
             .groupBy("wk").agg(F.count("*").alias("n_common")))
    weeks = top.groupBy("wk").agg(F.count("*").alias("n_top"))
    prev = weeks.select(F.date_add(F.col("wk"), 7).alias("wk"),
                        F.col("n_top").alias("n_prev"))
    return (weeks.join(prev, "wk")
            .join(inter, "wk", "left")
            .select("wk",
                    F.coalesce("n_common", F.lit(0)).alias("n_common"),
                    F.round(F.coalesce("n_common", F.lit(0))
                            / (F.col("n_top") + F.col("n_prev")
                               - F.coalesce("n_common", F.lit(0))
                               ).cast("double"), 6)
                    .alias("jaccard")))


_TOPK_TURNOVER_ORACLE = """
WITH li AS (
  SELECT CAST(date_trunc('week', CAST(l_shipdate AS TIMESTAMP))
              AS DATE) AS wk,
         l_partkey,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM lineitem),
wkrev AS (
  SELECT wk, l_partkey, SUM(cents) AS rev FROM li GROUP BY 1, 2),
top AS (
  SELECT wk, l_partkey FROM (
    SELECT wk, l_partkey,
           row_number() OVER (PARTITION BY wk
                              ORDER BY rev DESC, l_partkey) AS r
    FROM wkrev) WHERE r <= 20),
nxt AS (SELECT wk + 7 AS wk, l_partkey FROM top),
inter AS (
  SELECT t.wk, COUNT(*) AS n_common
  FROM top t JOIN nxt n ON n.wk = t.wk AND n.l_partkey = t.l_partkey
  GROUP BY t.wk),
weeks AS (SELECT wk, COUNT(*) AS n_top FROM top GROUP BY wk),
prev AS (SELECT wk + 7 AS wk, n_top AS n_prev FROM weeks)
SELECT w.wk, COALESCE(i.n_common, 0) AS n_common,
       round(COALESCE(i.n_common, 0) * 1.0
             / (w.n_top + p.n_prev - COALESCE(i.n_common, 0)), 6)
         AS jaccard
FROM weeks w JOIN prev p ON p.wk = w.wk
LEFT JOIN inter i ON i.wk = w.wk
"""


def q_logodds_terms(spark, sf_dir):
    """Distinctive-term analysis (Monroe-Colaresi-Quinn log-odds with
    add-one smoothing): which tokens distinguish source src0 from the
    rest of the corpus.  delta = ln((a+1)/(A-a+1)) - ln((b+1)/(B-b+1))
    — every ln runs on an INTEGER and rounds to the 9 dp ladder;
    top 15 per direction by |delta| with token tie-break."""
    docs = _docs(spark, sf_dir)
    toks = (docs.select((F.col("source") == "src0").alias("tgt"),
                        F.explode(text.tokens(F.col("text")))
                        .alias("tok")))
    cnt = (toks.groupBy("tok")
           .agg(F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("a"),
                F.sum(F.when(~F.col("tgt"), 1).otherwise(0))
                .alias("b")))
    tot = cnt.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))

    def ln9(c):
        return F.round(F.log(c.cast("double")), 9) \
            .cast("decimal(18,9)")

    j = cnt.crossJoin(F.broadcast(tot))
    delta = (ln9(F.col("a") + 1)
             - ln9(F.col("ta") - F.col("a") + 1)
             - ln9(F.col("b") + 1)
             + ln9(F.col("tb") - F.col("b") + 1))
    scored = j.select("tok", "a", "b",
                      delta.cast("double").alias("delta"))
    from pyspark.sql import Window as W
    up = scored.withColumn("r", F.row_number().over(
        W.orderBy(F.col("delta").desc(), "tok"))).where(F.col("r") <= 15)
    dn = scored.withColumn("r", F.row_number().over(
        W.orderBy(F.col("delta").asc(), "tok"))).where(F.col("r") <= 15)
    return (up.select("tok", "a", "b",
                      F.round("delta", 6).alias("delta"))
            .unionByName(dn.select("tok", "a", "b",
                                   F.round("delta", 6).alias("delta"))))


_LOGODDS_ORACLE = """
WITH toks AS (
  SELECT source = 'src0' AS tgt,
         unnest(list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x != '')) AS tok
  FROM documents),
cnt AS (
  SELECT tok,
         SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS b
  FROM toks GROUP BY tok),
tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM cnt),
scored AS (
  SELECT tok, a, b,
         CAST(CAST(round(ln(a + 1), 9) AS DECIMAL(18,9))
              - CAST(round(ln(ta - a + 1), 9) AS DECIMAL(18,9))
              - CAST(round(ln(b + 1), 9) AS DECIMAL(18,9))
              + CAST(round(ln(tb - b + 1), 9) AS DECIMAL(18,9))
              AS DOUBLE) AS delta
  FROM cnt, tot)
SELECT tok, a, b, round(delta, 6) AS delta FROM (
  SELECT *, row_number() OVER (ORDER BY delta DESC, tok) AS r
  FROM scored) WHERE r <= 15
UNION ALL
SELECT tok, a, b, round(delta, 6) AS delta FROM (
  SELECT *, row_number() OVER (ORDER BY delta ASC, tok) AS r
  FROM scored) WHERE r <= 15
"""


def q_quota_violations(spark, sf_dir):
    """Rate-limit audit: users exceeding 8 events inside ANY sliding
    24-hour window — the abuse-detection shape, computed with a
    RANGE-frame window count (each event looks back 86400 s) instead
    of a quadratic self-join.  Output: per violating user, the worst
    burst."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"))
    w = (W.partitionBy("user_id").orderBy("t")
         .rangeBetween(-86400, 0))
    r = ev.withColumn("in_hour", F.count("*").over(w))
    return (r.groupBy("user_id")
            .agg(F.max("in_hour").alias("max_burst"))
            .where(F.col("max_burst") > 8))


_QUOTA_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
r AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY t
                        RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
           AS in_hour
  FROM ev)
SELECT user_id, CAST(MAX(in_hour) AS BIGINT) AS max_burst
FROM r GROUP BY user_id HAVING MAX(in_hour) > 8
"""


def q_peak_concurrency(spark, sf_dir):
    """EXACT peak concurrency by sweep line: activity intervals
    (ts .. ts+value s) become +1/-1 endpoint events; the running sum
    over the (time, delta) order is the live concurrency and its max
    is the capacity answer — one sort instead of an interval
    self-join.  Ends sort before starts at the same instant
    (half-open intervals).  Output: the peak and the earliest time
    it is reached."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long")
         + F.col("value").cast("long")).alias("e"))
    pts = (ev.select(F.col("s").alias("t"), F.lit(1).alias("d"))
           .unionByName(ev.select(F.col("e").alias("t"),
                                  F.lit(-1).alias("d"))))
    w = (W.orderBy("t", "d")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = pts.withColumn("c", F.sum("d").over(w))
    best = F.max(F.struct(F.col("c"), (-F.col("t")).alias("negt")))
    return (run.agg(best.alias("b"))
            .select(F.col("b.c").cast("long").alias("peak"),
                    (-F.col("b.negt")).cast("long")
                    .alias("at_epoch_sec")))


_PEAK_ORACLE = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CAST(floor(value) AS BIGINT) AS e
  FROM events),
pts AS (
  SELECT s AS t, 1 AS d FROM ev
  UNION ALL SELECT e, -1 FROM ev),
run AS (
  SELECT t, SUM(d) OVER (ORDER BY t, d
                         ROWS UNBOUNDED PRECEDING) AS c
  FROM pts)
SELECT CAST(MAX(c) AS BIGINT) AS peak,
       CAST(MIN(CASE WHEN c = m THEN t END) AS BIGINT)
         AS at_epoch_sec
FROM run, (SELECT MAX(c) AS m FROM (
  SELECT SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS c
  FROM pts))
"""


def q_hill_tail(spark, sf_dir):
    """Hill estimator of the power-law tail index over order values:
    alpha = k / sum(ln(x_i / x_(k+1))) on the k = 100 largest orders —
    the standard heavy-tail exponent (is the spend distribution
    Pareto-like, and how extreme will the next whale be).  Each ln
    runs on an INTEGER cents value and rounds to the 9 dp ladder; the
    ratio becomes a ladder difference, so no float log of a quotient
    exists."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"].select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"), "o_orderkey")
    r = o.withColumn("rk", F.row_number().over(
        W.orderBy(F.col("cents").desc(), "o_orderkey")))
    topk = r.where(F.col("rk") <= 100)
    pivot = r.where(F.col("rk") == 101).select(
        F.col("cents").alias("xk"))

    def ln9(c):
        return F.round(F.log(c.cast("double")), 9) \
            .cast("decimal(18,9)")

    j = topk.crossJoin(F.broadcast(pivot))
    s = j.agg(F.sum(ln9(F.col("cents"))
                    - ln9(F.col("xk"))).alias("lsum"),
              F.count("*").alias("k"))
    return s.select(F.col("k").cast("long").alias("k"),
                    F.round(F.col("k")
                            / F.col("lsum").cast("double"), 6)
                    .alias("hill_alpha"))


_HILL_ORACLE = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents, o_orderkey,
         row_number() OVER (ORDER BY
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           DESC, o_orderkey) AS rk
  FROM orders),
pv AS (SELECT cents AS xk FROM o WHERE rk = 101),
s AS (
  SELECT COUNT(*) AS k,
         SUM(CAST(round(ln(o.cents * 1.0), 9) AS DECIMAL(18,9))
             - CAST(round(ln(p.xk * 1.0), 9) AS DECIMAL(18,9)))
           AS lsum
  FROM o, pv p WHERE o.rk <= 100)
SELECT CAST(k AS BIGINT) AS k,
       round(k / CAST(lsum AS DOUBLE), 6) AS hill_alpha
FROM s
"""


def q_var_cvar(spark, sf_dir):
    """Historical 99% VaR and CVaR (expected shortfall) of daily
    revenue swings: the day-over-day change distribution's lower
    1% rank-selected quantile, and the exact mean of the tail beyond
    it — the risk pair regulators ask for, in integer cents with one
    rank selection and one tail mean."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   * 100).cast("long").alias("cents")))
    w = W.orderBy("day")
    chg = (daily.withColumn("d", F.col("cents")
                            - F.lag("cents").over(w))
           .where(F.col("d").isNotNull()))
    n = chg.count()
    k = max(1, n // 100)
    ranked = chg.withColumn("rk", F.row_number().over(
        W.orderBy(F.col("d"), F.col("day"))))
    var = ranked.where(F.col("rk") == k).select(
        F.col("d").alias("var_cents"))
    tail = (ranked.where(F.col("rk") <= k)
            .agg(F.count("*").alias("nt"),
                 F.sum("d").cast("long").alias("st")))
    return (tail.crossJoin(F.broadcast(var))
            .select(F.lit(n).cast("long").alias("n_days"),
                    F.col("var_cents"),
                    F.round(F.col("st") / F.col("nt").cast("double"),
                            6).alias("cvar_cents")))


_VAR_CVAR_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
chg AS (
  SELECT day, cents - lag(cents) OVER (ORDER BY day) AS d FROM daily),
v AS (SELECT day, d FROM chg WHERE d IS NOT NULL),
n AS (SELECT COUNT(*) AS n, GREATEST(1, COUNT(*) // 100) AS k FROM v),
ranked AS (
  SELECT d, row_number() OVER (ORDER BY d, day) AS rk FROM v)
SELECT n.n AS n_days,
       (SELECT d FROM ranked, n WHERE rk = n.k) AS var_cents,
       round((SELECT SUM(d) * 1.0 / COUNT(*)
              FROM ranked, n WHERE rk <= n.k), 6) AS cvar_cents
FROM n
"""


def q_jsd_daily_mix(spark, sf_dir):
    """Jensen-Shannon divergence of each day's event-type mix from the
    global mix — the bounded symmetric drift score ([0,1] in bits)
    monitoring pipelines prefer over raw KL (no infinities on missing
    classes).  Every p*log2 term rounds to the 9 dp DECIMAL grid (the
    transition_entropy ladder) before summation."""
    ev = _events(spark, sf_dir)
    d = (ev.groupBy(F.col("ts").cast("date").alias("day"),
                    "event_type")
         .agg(F.count("*").alias("c")))
    dn = d.groupBy("day").agg(F.sum("c").alias("nd"))
    g = d.groupBy("event_type").agg(F.sum("c").alias("cg"))
    gn = g.agg(F.sum("cg").alias("ng"))
    # dense (day x type) grid so classes absent on a day still
    # contribute their q-side mass (that's what keeps JSD finite)
    full = (dn.crossJoin(F.broadcast(g)).crossJoin(F.broadcast(gn))
            .join(d, ["day", "event_type"], "left")
            .select("day",
                    F.coalesce(F.col("c"), F.lit(0)).alias("c"),
                    "nd", "cg", "ng"))
    p2 = F.col("c") / F.col("nd")
    q2 = F.col("cg") / F.col("ng")
    m2 = (p2 + q2) / 2
    tp = F.when(F.col("c") > 0,
                F.round(p2 * F.log2(p2 / m2), 9)
                .cast("decimal(18,9)")) \
        .otherwise(F.lit(0).cast("decimal(18,9)"))
    tq = F.round(q2 * F.log2(q2 / m2), 9).cast("decimal(18,9)")
    return (full.groupBy("day")
            .agg(F.round((F.sum(tp).cast("double")
                          + F.sum(tq).cast("double")) / 2, 6)
                 .alias("jsd_bits"))
            .orderBy(F.col("jsd_bits").desc(), "day").limit(10))


_JSD_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
dn AS (SELECT day, SUM(c) AS nd FROM d GROUP BY day),
g AS (SELECT event_type, SUM(c) AS cg FROM d GROUP BY event_type),
gn AS (SELECT SUM(cg) AS ng FROM g),
grid AS (
  SELECT dn.day, COALESCE(d.c, 0) AS c, dn.nd, g.cg, gn.ng
  FROM dn CROSS JOIN g CROSS JOIN gn
  LEFT JOIN d ON d.day = dn.day AND d.event_type = g.event_type),
t AS (
  SELECT day,
         CASE WHEN c > 0 THEN CAST(round(
           (c * 1.0 / nd)
           * log2((c * 1.0 / nd)
                  / (((c * 1.0 / nd) + (cg * 1.0 / ng)) / 2)), 9)
           AS DECIMAL(18,9))
         ELSE CAST(0 AS DECIMAL(18,9)) END AS tp,
         CAST(round(
           (cg * 1.0 / ng)
           * log2((cg * 1.0 / ng)
                  / (((c * 1.0 / nd) + (cg * 1.0 / ng)) / 2)), 9)
           AS DECIMAL(18,9)) AS tq
  FROM grid)
SELECT day,
       round((CAST(SUM(tp) AS DOUBLE) + CAST(SUM(tq) AS DOUBLE)) / 2,
             6) AS jsd_bits
FROM t GROUP BY day
ORDER BY jsd_bits DESC, day LIMIT 10
"""


def q_cuped_adjustment(spark, sf_dir):
    """CUPED variance reduction (Deng et al. 2013): per-customer
    post-period revenue Y adjusted by pre-period covariate X with
    theta = cov(X,Y)/var(X); reports the variance-reduction ratio
    var(Y_adj)/var(Y) = 1 - rho^2 — the standard lever that makes
    A/B tests 30-50%% cheaper.  All moments are exact DECIMAL sums of
    integer cents; theta and the ratio are a handful of IEEE ops."""
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey",
        (F.col("o_orderdate") >= F.lit("1998-01-01")).alias("post"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    per = (o.groupBy("o_custkey")
           .agg(F.sum(F.when(~F.col("post"), F.col("cents"))
                      .otherwise(0)).cast("long").alias("x"),
                F.sum(F.when(F.col("post"), F.col("cents"))
                      .otherwise(0)).cast("long").alias("y")))
    agg = per.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)").alias("syy"))
    n = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") / n \
        - (F.col("sx").cast("double") / n) \
        * (F.col("sy").cast("double") / n)
    vx = F.col("sxx").cast("double") / n \
        - (F.col("sx").cast("double") / n) ** 2
    vy = F.col("syy").cast("double") / n \
        - (F.col("sy").cast("double") / n) ** 2
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(cov / vx, 9).alias("theta"),
        F.round(1 - (cov * cov) / (vx * vy), 9)
        .alias("var_ratio_after_cuped"))


_CUPED_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < DATE '1998-01-01'
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM orders GROUP BY o_custkey),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
           AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
           AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
           AS syy
  FROM per)
SELECT CAST(n AS BIGINT) AS n_customers,
       round((CAST(sxy AS DOUBLE) / n
              - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
             / (CAST(sxx AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n)
                  * (CAST(sx AS DOUBLE) / n)), 9) AS theta,
       round(1 - ((CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n))
                  * (CAST(sxy AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n)
                       * (CAST(sy AS DOUBLE) / n)))
                 / ((CAST(sxx AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n)
                       * (CAST(sx AS DOUBLE) / n))
                    * (CAST(syy AS DOUBLE) / n
                       - (CAST(sy AS DOUBLE) / n)
                         * (CAST(sy AS DOUBLE) / n))), 9)
         AS var_ratio_after_cuped
FROM a
"""


def q_budget_allocation(spark, sf_dir):
    """Token-budget allocation by quality-per-token greedy: sources
    ranked by mean quality proxy (chars per doc as the stand-in),
    filled into a 200k-char budget in rank order — the knapsack-greedy
    that decides which crawl sources make the training mix.  One
    window cumsum over the SOURCE-level aggregate (dim-sized)."""
    from pyspark.sql import Window as W
    docs = _docs(spark, sf_dir)
    src = (docs.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars")))
    score = (F.col("chars") / F.col("n_docs")).alias("chars_per_doc")
    w = W.orderBy(F.col("chars_per_doc").desc(), F.col("source"))
    ranked = (src.select("source", "n_docs", "chars", score)
              .withColumn("cum_before",
                          F.coalesce(F.sum("chars").over(
                              w.rowsBetween(W.unboundedPreceding, -1)),
                              F.lit(0))))
    taken = F.greatest(
        F.lit(0), F.least(F.col("chars"),
                          F.lit(200000) - F.col("cum_before")))
    return (ranked.select("source", "chars",
                          F.round("chars_per_doc", 6)
                          .alias("chars_per_doc"),
                          taken.cast("long").alias("chars_taken"))
            .where(F.col("chars_taken") > 0))


_BUDGET_ALLOC_ORACLE = """
WITH src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source),
ranked AS (
  SELECT source, n_docs, chars,
         chars * 1.0 / n_docs AS chars_per_doc,
         COALESCE(SUM(chars) OVER (
           ORDER BY chars * 1.0 / n_docs DESC, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM src)
SELECT source, chars, round(chars_per_doc, 6) AS chars_per_doc,
       CAST(GREATEST(0, LEAST(chars, 200000 - cum_before)) AS BIGINT)
         AS chars_taken
FROM ranked
WHERE GREATEST(0, LEAST(chars, 200000 - cum_before)) > 0
"""


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test + Sen's slope on weekly revenue — the
    nonparametric monitoring standard (no linearity or normality
    assumed).  S = sum of pairwise signs and its tie-corrected
    variance are EXACT integers; z applies the +-1 continuity
    correction with sqrt as the only irrational; Sen's slope is the
    lower median of pairwise slopes (rank selection, one division
    each)."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("wk"))
              .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    * 100).cast("long").alias("y")))
    idx = weekly.withColumn("i", F.row_number().over(W.orderBy("wk"))) \
        .localCheckpoint(eager=True)
    a, b = idx.alias("a"), idx.alias("b")
    pairs = (a.join(b, F.col("a.i") < F.col("b.i"))
             .select(((F.col("b.y") > F.col("a.y")).cast("int")
                      - (F.col("b.y") < F.col("a.y")).cast("int"))
                     .alias("sgn"),
                     ((F.col("b.y") - F.col("a.y"))
                      / (F.col("b.i") - F.col("a.i"))).alias("slope")))
    n_row = idx.agg(F.count("*").alias("n"))
    # tie groups for the variance correction
    ties = (idx.groupBy("y").agg(F.count("*").alias("t"))
            .where(F.col("t") > 1)
            .agg(F.coalesce(F.sum(F.col("t") * (F.col("t") - 1)
                                  * (2 * F.col("t") + 5)), F.lit(0))
                 .alias("tie_term")))
    s_agg = pairs.agg(F.sum("sgn").cast("long").alias("s"),
                      F.count("*").alias("n_pairs"))
    med = (pairs.withColumn("rk", F.row_number().over(
        W.orderBy("slope")))
        .crossJoin(F.broadcast(s_agg.select("n_pairs")))
        .where(F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2)
               .cast("int"))
        .select(F.round("slope", 6).alias("sens_slope")))
    j = (s_agg.crossJoin(F.broadcast(n_row))
         .crossJoin(F.broadcast(ties))
         .crossJoin(F.broadcast(med)))
    var = ((F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_term")) / 18.0)
    z = (F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var))
         .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var))
         .otherwise(F.lit(0.0)))
    return j.select(F.col("n").cast("long").alias("n_weeks"),
                    "s", F.round(z, 6).alias("mk_z"), "sens_slope")


_MANN_KENDALL_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1),
idx AS (
  SELECT y, row_number() OVER (ORDER BY wk) AS i FROM weekly),
pairs AS (
  SELECT (CASE WHEN b.y > a.y THEN 1
               WHEN b.y < a.y THEN -1 ELSE 0 END) AS sgn,
         (b.y - a.y) * 1.0 / (b.i - a.i) AS slope
  FROM idx a JOIN idx b ON a.i < b.i),
nn AS (SELECT COUNT(*) AS n FROM idx),
ties AS (
  SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM idx GROUP BY y HAVING COUNT(*) > 1)),
sa AS (SELECT CAST(SUM(sgn) AS BIGINT) AS s, COUNT(*) AS n_pairs
       FROM pairs),
med AS (
  SELECT round(slope, 6) AS sens_slope FROM (
    SELECT slope, row_number() OVER (ORDER BY slope) AS rk FROM pairs),
    sa
  WHERE rk = CAST(floor((sa.n_pairs + 1) / 2.0) AS INT))
SELECT CAST(nn.n AS BIGINT) AS n_weeks, sa.s,
       round(CASE WHEN sa.s > 0 THEN (sa.s - 1)
                    / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                            - ties.tie_term) / 18.0)
                  WHEN sa.s < 0 THEN (sa.s + 1)
                    / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                            - ties.tie_term) / 18.0)
                  ELSE 0.0 END, 6) AS mk_z,
       med.sens_slope
FROM sa, nn, ties, med
"""


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the sign of day-over-day revenue
    moves: is the up/down sequence random or sticky?  Runs, n+ and n-
    are exact integers; the expected-runs mean and variance are
    rational; z needs one sqrt.  Zero-change days drop (standard
    practice)."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   * 100).cast("long").alias("cents")))
    w = W.orderBy("day")
    sgn = (daily.withColumn("d", F.col("cents")
                            - F.lag("cents").over(w))
           .where(F.col("d").isNotNull() & (F.col("d") != 0))
           .select("day", (F.col("d") > 0).cast("int").alias("up")))
    runs = (sgn.withColumn("chg",
                           F.when(F.lag("up").over(w).isNull()
                                  | (F.col("up")
                                     != F.lag("up").over(w)), 1)
                           .otherwise(0))
            .agg(F.sum("chg").cast("long").alias("r"),
                 F.sum("up").cast("long").alias("np"),
                 F.sum(1 - F.col("up")).cast("long").alias("nm")))
    n2 = 2 * F.col("np") * F.col("nm")
    n = F.col("np") + F.col("nm")
    mean = n2 / n + 1
    var = (n2 * (n2 - n)) / (n * n * (n - 1))
    return runs.select("r", "np", "nm",
                       F.round((F.col("r") - mean) / F.sqrt(var), 6)
                       .alias("z"))


_RUNS_TEST_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
sgn AS (
  SELECT day, (d > 0)::INT AS up FROM (
    SELECT day, cents - lag(cents) OVER (ORDER BY day) AS d FROM daily)
  WHERE d IS NOT NULL AND d <> 0),
runs AS (
  SELECT CAST(SUM(chg) AS BIGINT) AS r,
         CAST(SUM(up) AS BIGINT) AS np,
         CAST(SUM(1 - up) AS BIGINT) AS nm
  FROM (
    SELECT up, CASE WHEN lag(up) OVER (ORDER BY day) IS NULL
                      OR up <> lag(up) OVER (ORDER BY day)
               THEN 1 ELSE 0 END AS chg
    FROM sgn))
SELECT r, np, nm,
       round((r - (CAST(2 * np * nm AS DOUBLE) / (np + nm) + 1))
             / sqrt(CAST((2 * np * nm) * (2 * np * nm - (np + nm))
                         AS DOUBLE)
                    / ((np + nm) * (np + nm) * ((np + nm) - 1))),
             6) AS z
FROM runs
"""


def q_durbin_watson(spark, sf_dir):
    """Durbin-Watson statistic of weekly revenue deviations from the
    mean (DW ~ 2 means no lag-1 autocorrelation; < 2 positive, > 2
    negative).  Numerator sum (y_t - y_{t-1})^2 is exact integer math;
    the denominator Q - S^2/n is exact DECIMAL; one final division."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("wk"))
              .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    * 100).cast("long").alias("y")))
    w = W.orderBy("wk")
    d = weekly.withColumn("dy", F.col("y") - F.lag("y").over(w))
    agg = d.agg(
        F.count("*").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)").alias("q"),
        F.sum(F.when(F.col("dy").isNotNull(),
                     F.col("dy").cast("decimal(19,0)") * F.col("dy"))
              .otherwise(0)).cast("decimal(38,0)").alias("num"))
    den = (F.col("q").cast("double")
           - F.col("s").cast("double") * F.col("s").cast("double")
           / F.col("n"))
    return agg.select(F.col("n").cast("long").alias("n_weeks"),
                      F.round(F.col("num").cast("double") / den, 6)
                      .alias("durbin_watson"))


_DW_ORACLE = """
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1),
d AS (SELECT y, y - lag(y) OVER (ORDER BY wk) AS dy FROM weekly),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(y) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS q,
         CAST(SUM(CASE WHEN dy IS NOT NULL
                  THEN CAST(dy AS DECIMAL(19,0)) * dy ELSE 0 END)
              AS DECIMAL(38,0)) AS num
  FROM d)
SELECT CAST(n AS BIGINT) AS n_weeks,
       round(CAST(num AS DOUBLE)
             / (CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
         AS durbin_watson
FROM a
"""


def q_friedman_test(spark, sf_dir):
    """Friedman test: do the 5 market segments keep the same revenue
    ORDER across monthly blocks?  Within-block ranks (ties impossible
    at cent grain in practice; deterministic (revenue, segment)
    tie-break regardless), chi2_F = 12/(n k (k+1)) * sum R_j^2 -
    3 n (k+1) — every term an exact integer until two final IEEE
    ops.  Only blocks containing all 5 segments count (complete
    blocks, the test's requirement)."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .groupBy(F.date_trunc("month", F.col("o_orderdate")
                               .cast("timestamp")).alias("m"),
                  "c_mktsegment")
         .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
               * 100).cast("long").alias("rev")))
    full = (j.groupBy("m").agg(F.count("*").alias("k"))
            .where(F.col("k") == 5).select("m"))
    ranked = (j.join(full, "m")
              .withColumn("r", F.row_number().over(
                  W.partitionBy("m")
                  .orderBy("rev", "c_mktsegment"))))
    rj = ranked.groupBy("c_mktsegment").agg(
        F.sum("r").cast("long").alias("rsum"))
    n = full.count()
    k = 5
    chi = (F.lit(12.0) / (n * k * (k + 1))
           * F.sum(F.col("rsum") * F.col("rsum"))
           - F.lit(3.0) * n * (k + 1))
    return rj.agg(F.lit(n).cast("long").alias("n_blocks"),
                  F.round(chi, 6).alias("friedman_chi2"))


_FRIEDMAN_ORACLE = """
WITH j AS (
  SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS m,
         c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
full_ AS (
  SELECT m FROM j GROUP BY m HAVING COUNT(*) = 5),
ranked AS (
  SELECT j.c_mktsegment,
         row_number() OVER (PARTITION BY j.m
                            ORDER BY j.rev, j.c_mktsegment) AS r
  FROM j JOIN full_ USING (m)),
rj AS (
  SELECT c_mktsegment, CAST(SUM(r) AS BIGINT) AS rsum
  FROM ranked GROUP BY c_mktsegment),
nn AS (SELECT COUNT(*) AS n FROM full_)
SELECT CAST(nn.n AS BIGINT) AS n_blocks,
       round(12.0 / (nn.n * 5 * 6) * SUM(rsum * rsum)
             - 3.0 * nn.n * 6, 6) AS friedman_chi2
FROM rj, nn GROUP BY nn.n
"""


def q_segment_migration(spark, sf_dir):
    """Customer value-segment MIGRATION matrix: spend quartile in the
    1996-1997 window vs in 1998-1999 — who upgraded, who churned
    (quartiles by ntile with (spend, custkey) tie-break; customers
    absent from a window class as 'none').  The period-over-period
    movement table behind retention planning."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey", "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))

    def quartile(lo, hi, alias):
        spend = (o.where((F.col("o_orderdate") >= F.lit(lo))
                         & (F.col("o_orderdate") < F.lit(hi)))
                 .groupBy("o_custkey")
                 .agg(F.sum("cents").cast("long").alias("s")))
        return spend.withColumn(
            alias, F.ntile(4).over(W.orderBy("s", "o_custkey"))) \
            .select("o_custkey", alias)

    q1 = quartile("1996-01-01", "1998-01-01", "q_before")
    q2 = quartile("1998-01-01", "2000-01-01", "q_after")
    j = q1.join(q2, "o_custkey", "full")
    return (j.groupBy(
        F.coalesce(F.col("q_before").cast("string"), F.lit("none"))
        .alias("q_before"),
        F.coalesce(F.col("q_after").cast("string"), F.lit("none"))
        .alias("q_after"))
        .agg(F.count("*").alias("n_customers")))


_MIGRATION_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
q1 AS (
  SELECT o_custkey, ntile(4) OVER (ORDER BY s, o_custkey) AS q_before
  FROM (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS s FROM o
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1998-01-01'
        GROUP BY o_custkey)),
q2 AS (
  SELECT o_custkey, ntile(4) OVER (ORDER BY s, o_custkey) AS q_after
  FROM (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS s FROM o
        WHERE o_orderdate >= DATE '1998-01-01'
          AND o_orderdate < DATE '2000-01-01'
        GROUP BY o_custkey))
SELECT COALESCE(CAST(q_before AS VARCHAR), 'none') AS q_before,
       COALESCE(CAST(q_after AS VARCHAR), 'none') AS q_after,
       COUNT(*) AS n_customers
FROM q1 FULL JOIN q2 USING (o_custkey)
GROUP BY 1, 2
"""


def q_theil_index(spark, sf_dir):
    """Theil T inequality index of customer spend, DECOMPOSED into
    between-nation and within-nation parts (the additivity Gini
    lacks — tells you whether inequality lives across markets or
    inside them).  ln terms expand to integer-ln ladder differences
    (ln x + ln n - ln S); products computed in doubles and rounded to
    9 dp DECIMAL before summation."""
    t = load_tables(spark, sf_dir)
    per = (t["orders"].join(t["customer"],
                            F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("o_custkey", "c_nationkey")
           .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                       * 100).cast("long")).cast("long").alias("x")))
    tot = per.agg(F.count("*").alias("n"),
                  F.sum("x").cast("decimal(38,0)").alias("s"))

    def ln9d(c):
        return F.round(F.log(c.cast("double")), 9)

    j = per.crossJoin(F.broadcast(tot))
    share = F.col("x") * F.col("n").cast("double") \
        / F.col("s").cast("double")
    term = F.round(share * (ln9d(F.col("x")) + ln9d(F.col("n"))
                            - ln9d(F.col("s"))), 9) \
        .cast("decimal(18,9)")
    total_t = (j.agg(F.sum(term).cast("double").alias("tt"),
                     F.first("n").alias("n"))
               .select(F.round(F.col("tt") / F.col("n"), 6)
                       .alias("theil_total")))
    # between-nation component: nations as synthetic individuals
    nat = per.groupBy("c_nationkey").agg(
        F.count("*").alias("nk"),
        F.sum("x").cast("decimal(38,0)").alias("sk"))
    jb = nat.crossJoin(F.broadcast(tot))
    shb = F.col("sk").cast("double") / F.col("s").cast("double")
    termb = F.round(shb * (ln9d(F.col("sk")) + ln9d(F.col("n"))
                           - ln9d(F.col("s")) - ln9d(F.col("nk"))),
                    9).cast("decimal(18,9)")
    between = jb.agg(F.round(F.sum(termb).cast("double"), 6)
                     .alias("theil_between"))
    return (total_t.crossJoin(F.broadcast(between))
            .select("theil_total", "theil_between",
                    F.round(F.col("theil_total")
                            - F.col("theil_between"), 6)
                    .alias("theil_within")))


_THEIL_ORACLE = """
WITH per AS (
  SELECT o_custkey, c_nationkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS DECIMAL(38,0)) AS s
        FROM per),
tt AS (
  SELECT round(CAST(SUM(CAST(round(
           (x * CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
           * (round(ln(x * 1.0), 9) + round(ln(n * 1.0), 9)
              - round(ln(CAST(s AS DOUBLE)), 9)), 9)
           AS DECIMAL(18,9))) AS DOUBLE) / MIN(n), 6) AS theil_total
  FROM per, tot),
nat AS (
  SELECT c_nationkey, COUNT(*) AS nk,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sk
  FROM per GROUP BY 1),
tb AS (
  SELECT round(CAST(SUM(CAST(round(
           (CAST(sk AS DOUBLE) / CAST(s AS DOUBLE))
           * (round(ln(CAST(sk AS DOUBLE)), 9)
              + round(ln(n * 1.0), 9)
              - round(ln(CAST(s AS DOUBLE)), 9)
              - round(ln(nk * 1.0), 9)), 9)
           AS DECIMAL(18,9))) AS DOUBLE), 6) AS theil_between
  FROM nat, tot)
SELECT theil_total, theil_between,
       round(theil_total - theil_between, 6) AS theil_within
FROM tt, tb
"""


def q_growth_contribution(spark, sf_dir):
    """Growth accounting: each nation's exact contribution to total
    revenue growth 1997 -> 1998 (contributions sum to the total delta
    by construction — additivity is the point).  Pure DECIMAL cents;
    the share of growth is the single division per row."""
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .where(F.col("o_orderdate").between("1997-01-01",
                                             "1998-12-31"))
         .groupBy("c_nationkey",
                  F.year(F.col("o_orderdate")).alias("yr"))
         .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                     * 100).cast("long")).cast("long").alias("rev")))
    p = (j.groupBy("c_nationkey")
         .agg(F.sum(F.when(F.col("yr") == 1997, F.col("rev"))
                    .otherwise(0)).cast("long").alias("r97"),
              F.sum(F.when(F.col("yr") == 1998, F.col("rev"))
                    .otherwise(0)).cast("long").alias("r98")))
    tot = p.agg(F.sum(F.col("r98") - F.col("r97")).cast("long")
                .alias("total_delta"))
    return (p.crossJoin(F.broadcast(tot))
            .select("c_nationkey",
                    (F.col("r98") - F.col("r97")).alias("delta_cents"),
                    F.round((F.col("r98") - F.col("r97"))
                            / F.col("total_delta").cast("double"), 6)
                    .alias("share_of_growth")))


_GROWTH_CONTRIB_ORACLE = """
WITH j AS (
  SELECT c_nationkey, EXTRACT(year FROM o_orderdate) AS yr,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
  GROUP BY 1, 2),
p AS (
  SELECT c_nationkey,
         CAST(SUM(CASE WHEN yr = 1997 THEN rev ELSE 0 END) AS BIGINT)
           AS r97,
         CAST(SUM(CASE WHEN yr = 1998 THEN rev ELSE 0 END) AS BIGINT)
           AS r98
  FROM j GROUP BY 1),
tot AS (SELECT CAST(SUM(r98 - r97) AS BIGINT) AS total_delta FROM p)
SELECT c_nationkey, r98 - r97 AS delta_cents,
       round((r98 - r97) * 1.0 / total_delta, 6) AS share_of_growth
FROM p, tot
"""


def q_price_index(spark, sf_dir):
    """Laspeyres and Paasche price indices 1997 -> 1998 over parts
    traded in BOTH years (avg unit price as p, total quantity as q) —
    the econ-textbook pair bracketing true price change.  All sums
    DECIMAL-exact; two final divisions."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_shipdate").between("1997-01-01",
                                             "1998-12-31"))
          .groupBy("l_partkey",
                   F.year(F.col("l_shipdate")).alias("yr"))
          .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"),
               F.sum((F.col("l_extendedprice")
                      .cast("decimal(18,2)") * 100).cast("long"))
               .cast("long").alias("spend")))
    a = li.where(F.col("yr") == 1997).select(
        "l_partkey", F.col("q").alias("q0"),
        F.col("spend").alias("s0"))
    b = li.where(F.col("yr") == 1998).select(
        "l_partkey", F.col("q").alias("q1"),
        F.col("spend").alias("s1"))
    j = a.join(b, "l_partkey")
    # p = spend/q (avg unit cents, rational); index sums use
    # p*q' = spend * q'/q — one division per term, rounded 6 dp
    # DECIMAL so the sums stay order-free
    lp_num = F.round(F.col("s0") / F.col("q0")
                     * F.col("q0"), 6).cast("decimal(28,6)")
    lp_cur = F.round(F.col("s1") / F.col("q1")
                     * F.col("q0"), 6).cast("decimal(28,6)")
    pa_num = F.round(F.col("s0") / F.col("q0")
                     * F.col("q1"), 6).cast("decimal(28,6)")
    pa_cur = F.round(F.col("s1") / F.col("q1")
                     * F.col("q1"), 6).cast("decimal(28,6)")
    agg = j.agg(F.count("*").alias("n_parts"),
                F.sum(lp_num).alias("l0"), F.sum(lp_cur).alias("l1"),
                F.sum(pa_num).alias("p0"), F.sum(pa_cur).alias("p1"))
    return agg.select(
        "n_parts",
        F.round(F.col("l1").cast("double")
                / F.col("l0").cast("double"), 6).alias("laspeyres"),
        F.round(F.col("p1").cast("double")
                / F.col("p0").cast("double"), 6).alias("paasche"))


_PRICE_INDEX_ORACLE = """
WITH li AS (
  SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS spend
  FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
  GROUP BY 1, 2),
a AS (SELECT l_partkey, q AS q0, spend AS s0 FROM li WHERE yr = 1997),
b AS (SELECT l_partkey, q AS q1, spend AS s1 FROM li WHERE yr = 1998),
j AS (SELECT * FROM a JOIN b USING (l_partkey)),
agg AS (
  SELECT COUNT(*) AS n_parts,
         SUM(CAST(round(s0 * 1.0 / q0 * q0, 6) AS DECIMAL(28,6)))
           AS l0,
         SUM(CAST(round(s1 * 1.0 / q1 * q0, 6) AS DECIMAL(28,6)))
           AS l1,
         SUM(CAST(round(s0 * 1.0 / q0 * q1, 6) AS DECIMAL(28,6)))
           AS p0,
         SUM(CAST(round(s1 * 1.0 / q1 * q1, 6) AS DECIMAL(28,6)))
           AS p1
  FROM j)
SELECT n_parts,
       round(CAST(l1 AS DOUBLE) / CAST(l0 AS DOUBLE), 6) AS laspeyres,
       round(CAST(p1 AS DOUBLE) / CAST(p0 AS DOUBLE), 6) AS paasche
FROM agg
"""


def q_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day — daily active users over the
    distinct users of the whole fixture month; the engagement ratio
    product teams watch.  Exact distinct counts; one division."""
    ev = _events(spark, sf_dir)
    dau = (ev.groupBy(F.col("ts").cast("date").alias("day"))
           .agg(F.countDistinct("user_id").alias("dau")))
    mau = ev.agg(F.countDistinct("user_id").alias("mau"))
    return (dau.crossJoin(F.broadcast(mau))
            .select("day", "dau", "mau",
                    F.round(F.col("dau") / F.col("mau"), 6)
                    .alias("stickiness")))


_STICKINESS_ORACLE = """
WITH dau AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1),
mau AS (SELECT COUNT(DISTINCT user_id) AS mau FROM events)
SELECT day, dau, mau, round(dau * 1.0 / mau, 6) AS stickiness
FROM dau, mau
"""


def q_data_contract(spark, sf_dir):
    """Data-contract check suite in ONE pass per table (the
    expectations pattern): domain bounds, non-negativity, referential
    integrity and date-range assertions, each reported as an exact
    violation COUNT (0 = contract holds) — the gate a 100 TB ingest
    runs before promoting a batch."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    o = t["orders"]
    checks = li.agg(
        F.sum((~F.col("l_quantity").between(1, 50)).cast("int"))
        .alias("qty_out_of_domain"),
        F.sum((F.col("l_extendedprice") <= 0).cast("int"))
        .alias("nonpositive_price"),
        F.sum((~F.col("l_discount").between(0.0, 0.11)).cast("int"))
        .alias("discount_out_of_domain"),
        F.sum((F.col("l_shipdate") < F.lit("1995-01-01")).cast("int"))
        .alias("shipdate_before_epoch"))
    orphans = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"),
                       "left_anti")
               .agg(F.count("*").alias("fk_orphan_lineitems")))
    dup = (o.groupBy("o_orderkey").agg(F.count("*").alias("c"))
           .where(F.col("c") > 1)
           .agg(F.count("*").alias("duplicate_orderkeys")))
    return (checks.crossJoin(F.broadcast(orphans))
            .crossJoin(F.broadcast(dup)))


_DATA_CONTRACT_ORACLE = """
SELECT
  (SELECT SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
              THEN 1 ELSE 0 END) FROM lineitem)
    AS qty_out_of_domain,
  (SELECT SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
   FROM lineitem) AS nonpositive_price,
  (SELECT SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.11
              THEN 1 ELSE 0 END) FROM lineitem)
    AS discount_out_of_domain,
  (SELECT SUM(CASE WHEN l_shipdate < DATE '1995-01-01'
              THEN 1 ELSE 0 END) FROM lineitem)
    AS shipdate_before_epoch,
  (SELECT COUNT(*) FROM lineitem l
   LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
   WHERE o.o_orderkey IS NULL) AS fk_orphan_lineitems,
  (SELECT COUNT(*) FROM (
     SELECT o_orderkey FROM orders GROUP BY o_orderkey
     HAVING COUNT(*) > 1)) AS duplicate_orderkeys
"""


_HOUR_TRIG = [(h, math.cos(2 * math.pi * h / 24),
               math.sin(2 * math.pi * h / 24)) for h in range(24)]


def q_hour_concentration(spark, sf_dir):
    """Circular concentration of event times-of-day per event type:
    mean resultant length R in [0,1] (1 = all events at one hour,
    0 = uniform around the clock) — the correct statistic for cyclic
    data where a plain mean of hours is meaningless.  The 24 unit
    vectors are PYTHON-computed literals shared with the oracle (no
    runtime trig); R needs one sqrt."""
    ev = _events(spark, sf_dir)
    trig = F.array(*[F.struct(F.lit(c).alias("c"), F.lit(s).alias("s"))
                     for _, c, s in _HOUR_TRIG])
    h = F.hour(F.col("ts")) + 1
    e = ev.select("event_type",
                  F.element_at(trig, h).alias("t"))
    agg = (e.groupBy("event_type")
           .agg(F.count("*").alias("n"),
                F.round(F.sum(F.round(F.col("t.c"), 9)
                              .cast("decimal(18,9)"))
                        .cast("double"), 9).alias("sc"),
                F.round(F.sum(F.round(F.col("t.s"), 9)
                              .cast("decimal(18,9)"))
                        .cast("double"), 9).alias("ss")))
    r = F.sqrt(F.col("sc") * F.col("sc")
               + F.col("ss") * F.col("ss")) / F.col("n")
    return agg.select("event_type", "n",
                      F.round(r, 6).alias("concentration"))


def _hour_conc_oracle_sql() -> str:
    vals = ", ".join(f"({h}, {c!r}, {s!r})" for h, c, s in _HOUR_TRIG)
    return f"""
WITH trig(h, c, s) AS (VALUES {vals}),
e AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS h FROM events),
agg AS (
  SELECT event_type, COUNT(*) AS n,
         round(CAST(SUM(CAST(round(t.c, 9) AS DECIMAL(18,9)))
                    AS DOUBLE), 9) AS sc,
         round(CAST(SUM(CAST(round(t.s, 9) AS DECIMAL(18,9)))
                    AS DOUBLE), 9) AS ss
  FROM e JOIN trig t ON t.h = e.h
  GROUP BY event_type)
SELECT event_type, n,
       round(sqrt(sc * sc + ss * ss) / n, 6) AS concentration
FROM agg
"""


def q_qte_segments(spark, sf_dir):
    """Quantile treatment effects: p25/p50/p75 order-value gaps
    between the BUILDING segment and the rest — where in the
    distribution the difference lives (means hide it).  Lower-rank
    selection per group; exact integer cents throughout."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .select((F.col("c_mktsegment") == "BUILDING").alias("treat"),
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("cents"), "o_orderkey"))
    w = W.partitionBy("treat").orderBy("cents", "o_orderkey")
    r = (j.withColumn("rk", F.row_number().over(w))
         .withColumn("n", F.count("*").over(W.partitionBy("treat"))))
    qs = None
    for p, name in ((25, "p25"), (50, "p50"), (75, "p75")):
        sel = (r.where(F.col("rk")
                       == F.floor((F.col("n") * p + 99) / 100)
                       .cast("int"))
               .groupBy("treat")
               .agg(F.min("cents").alias("v"))
               .withColumn("q", F.lit(name)))
        qs = sel if qs is None else qs.unionByName(sel)
    a = qs.where(F.col("treat")).select("q", F.col("v").alias("vt"))
    b = qs.where(~F.col("treat")).select("q", F.col("v").alias("vc"))
    return (a.join(b, "q")
            .select("q", F.col("vt").alias("treat_cents"),
                    F.col("vc").alias("ctrl_cents"),
                    (F.col("vt") - F.col("vc")).alias("qte_cents")))


_QTE_ORACLE = """
WITH j AS (
  SELECT c_mktsegment = 'BUILDING' AS treat,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey),
r AS (
  SELECT treat, cents,
         row_number() OVER (PARTITION BY treat
                            ORDER BY cents, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY treat) AS n
  FROM j),
qs AS (
  SELECT treat, q, MIN(cents) AS v FROM (
    SELECT r.*, p.q, p.pp FROM r,
      (VALUES ('p25', 25), ('p50', 50), ('p75', 75)) AS p(q, pp)
    WHERE rk = CAST(floor((n * pp + 99) / 100.0) AS INT))
  GROUP BY treat, q)
SELECT a.q, a.v AS treat_cents, b.v AS ctrl_cents,
       a.v - b.v AS qte_cents
FROM qs a JOIN qs b ON a.q = b.q AND a.treat AND NOT b.treat
"""


def q_conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval for the seasonal-naive
    forecaster (y_hat_d = y_{d-7}): the 90% quantile of absolute
    calibration residuals (first half of days, rank-selected at
    ceil(0.9*(n+1)) — the finite-sample-valid conformal rank) becomes
    the interval half-width; reported with the EMPIRICAL coverage on
    the held-out second half.  Distribution-free validity, all in
    exact integer cents + two divisions."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   * 100).cast("long").alias("y")))
    w = W.orderBy("day")
    r = (daily.withColumn("pred", F.lag("y", 7).over(w))
         .where(F.col("pred").isNotNull())
         .withColumn("ae", F.abs(F.col("y") - F.col("pred")))
         .withColumn("i", F.row_number().over(w))
         .localCheckpoint(eager=True))
    n = r.count()
    half_n = n // 2
    cal = r.where(F.col("i") <= half_n)
    test = r.where(F.col("i") > half_n)
    k = math.ceil(0.9 * (half_n + 1))
    qhat = (cal.withColumn("rk", F.row_number().over(
        W.orderBy("ae", "day")))
        .where(F.col("rk") == k).select(F.col("ae").alias("qhat")))
    cov = (test.crossJoin(F.broadcast(qhat))
           .agg(F.count("*").alias("n_test"),
                F.sum((F.col("ae") <= F.col("qhat")).cast("int"))
                .alias("covered"),
                F.first("qhat").alias("qhat")))
    return cov.select(
        F.lit(half_n).cast("long").alias("n_cal"), "n_test",
        F.col("qhat").alias("interval_halfwidth_cents"),
        F.round(F.col("covered") / F.col("n_test").cast("double"), 6)
        .alias("empirical_coverage"))


def _conformal_oracle_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1),
r AS (
  SELECT day, y, lag(y, 7) OVER (ORDER BY day) AS pred
  FROM daily),
rr AS (
  SELECT day, abs(y - pred) AS ae,
         row_number() OVER (ORDER BY day) AS i
  FROM r WHERE pred IS NOT NULL),
nn AS (SELECT COUNT(*) AS n, COUNT(*) // 2 AS hn FROM rr),
cal AS (SELECT rr.* FROM rr, nn WHERE i <= hn),
qh AS (
  SELECT ae AS qhat FROM (
    SELECT ae, row_number() OVER (ORDER BY ae, day) AS rk FROM cal),
    nn
  WHERE rk = CAST(ceil(0.9 * (hn + 1)) AS INT)),
test AS (SELECT rr.* FROM rr, nn WHERE i > hn)
SELECT (SELECT hn FROM nn) AS n_cal,
       COUNT(*) AS n_test,
       (SELECT qhat FROM qh) AS interval_halfwidth_cents,
       round(SUM(CASE WHEN ae <= (SELECT qhat FROM qh)
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS empirical_coverage
FROM test
"""


_REPLAY_ARMS = ("click", "error", "purchase", "signup", "view")


def q_policy_replay(spark, sf_dir):
    """Offline policy evaluation by the REPLAY estimator (Li et al.
    2011): replay the logged event stream against a greedy policy
    (pick the arm with the best cumulative mean reward so far,
    optimistic for unseen arms, ties to arm order) and average the
    reward over the timesteps where the log happened to play the
    policy's arm — the unbiased off-policy estimate when logging is
    uniform.  Per-arm cumulative stats are conditional window sums
    over the global (ts, event_id) order; matched rewards round to
    9 dp DECIMAL before the mean."""
    from pyspark.sql import Window as W
    ev = (_events(spark, sf_dir)
          .select("event_id", F.col("ts").cast("long").alias("t"),
                  "event_type", F.col("value").alias("r")))
    w = (W.orderBy("t", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    cols = []
    for i, a in enumerate(_REPLAY_ARMS):
        cnt = F.count(F.when(F.col("event_type") == a, 1)).over(w)
        sm = F.sum(F.when(F.col("event_type") == a,
                          F.round(F.col("r"), 9)
                          .cast("decimal(18,9)"))).over(w)
        cols.append(F.struct(
            (cnt == 0).cast("int").alias("unseen"),
            (sm.cast("double") / cnt).alias("mean"),
            F.lit(-i).alias("negidx"),
            F.lit(a).alias("arm")))
    policy = F.greatest(*cols)["arm"]
    scored = ev.withColumn("policy_arm", policy)
    matched = scored.where(F.col("event_type") == F.col("policy_arm"))
    return (matched.agg(
        F.count("*").alias("n_matched"),
        F.round(F.sum(F.round(F.col("r"), 9).cast("decimal(18,9)"))
                .cast("double") / F.count("*"), 6)
        .alias("replay_value"))
        .crossJoin(F.broadcast(ev.agg(F.count("*").alias("n_total"))))
        .select("n_total", "n_matched",
                F.round(F.col("n_matched")
                        / F.col("n_total").cast("double"), 6)
                .alias("match_rate"), "replay_value"))


def _policy_replay_oracle_sql() -> str:
    cum = []
    structs = []
    for i, a in enumerate(_REPLAY_ARMS):
        cum.append(
            f"COUNT(CASE WHEN event_type = '{a}' THEN 1 END) OVER wb "
            f"AS c{i},\n         "
            f"SUM(CASE WHEN event_type = '{a}' THEN "
            f"CAST(round(r, 9) AS DECIMAL(18,9)) END) OVER wb AS s{i}")
        structs.append(
            "{'unseen': (c%d = 0)::INT, "
            "'mean': CAST(s%d AS DOUBLE) / c%d, "
            "'negidx': %d, 'arm': '%s'}" % (i, i, i, -i, a))
    # DuckDB GREATEST rejects structs; list_sort orders struct lists
    # lexicographically, so the last element IS the argmax
    greatest = ("(list_sort(["
                + ", ".join(structs)
                + f"]))[{len(_REPLAY_ARMS)}]")
    return f"""
WITH ev AS (
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         event_type, value AS r
  FROM events),
c AS (
  SELECT *,
         {", ".join(cum)}
  FROM ev
  WINDOW wb AS (ORDER BY t, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
p AS (
  SELECT *, {greatest} AS best
  FROM c),
m AS (
  SELECT * FROM p
  WHERE event_type = best.arm),
tot AS (SELECT COUNT(*) AS n_total FROM ev)
SELECT tot.n_total, COUNT(*) AS n_matched,
       round(COUNT(*) * 1.0 / tot.n_total, 6) AS match_rate,
       round(CAST(SUM(CAST(round(r, 9) AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS replay_value
FROM m, tot GROUP BY tot.n_total
"""


def q_anova_segments(spark, sf_dir):
    """One-way ANOVA of order value across the 5 market segments:
    F statistic + eta-squared effect size from exact DECIMAL moment
    sums (SSB/SSW computed as Q - S^2/n per group and pooled — no
    per-row mean subtraction, one pass).  The k-group generalization
    of q:welch_ttest."""
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .select("c_mktsegment",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("y")))
    g = j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)").alias("q"))
    tot = g.agg(F.sum("n").alias("nt"),
                F.sum("s").cast("decimal(38,0)").alias("st"),
                F.sum("q").cast("decimal(38,0)").alias("qt"),
                F.count("*").alias("k"),
                F.sum((F.col("s").cast("double")
                       * F.col("s").cast("double"))
                      / F.col("n")).alias("ssq_over_n"))
    sst = F.col("qt").cast("double") \
        - (F.col("st").cast("double") * F.col("st").cast("double")
           / F.col("nt"))
    ssb = F.col("ssq_over_n") \
        - (F.col("st").cast("double") * F.col("st").cast("double")
           / F.col("nt"))
    ssw = sst - ssb
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("nt")
                                                - F.col("k")))
    return tot.select(F.col("nt").cast("long").alias("n"),
                      F.col("k").cast("long").alias("k"),
                      F.round(f_stat, 6).alias("f_stat"),
                      F.round(ssb / sst, 9).alias("eta_squared"))


_ANOVA_ORACLE = """
WITH j AS (
  SELECT c_mktsegment,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
g AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(y) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS q
  FROM j GROUP BY 1),
tot AS (
  SELECT SUM(n) AS nt, CAST(SUM(s) AS DECIMAL(38,0)) AS st,
         CAST(SUM(q) AS DECIMAL(38,0)) AS qt, COUNT(*) AS k,
         SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
           AS ssq_over_n
  FROM g)
SELECT CAST(nt AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       round(((ssq_over_n
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
              / (k - 1))
             / (((CAST(qt AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
                 - (ssq_over_n
                    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt))
                / (nt - k)), 6) AS f_stat,
       round((ssq_over_n
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
             / (CAST(qt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt), 9)
         AS eta_squared
FROM tot
"""


def q_degree_powerlaw(spark, sf_dir):
    """Power-law exponent of the co-purchase degree distribution:
    OLS slope of ln(count-of-degree) on ln(degree) — the scale-free
    check on the product graph; integer-ln 9 dp ladder (the zipf
    machinery on degrees)."""
    li = load_tables(spark, sf_dir)["lineitem"] \
        .select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    deg = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                  & (F.col("a.l_partkey") != F.col("b.l_partkey")))
           .select(F.col("a.l_partkey").alias("p"),
                   F.col("b.l_partkey").alias("q")).distinct()
           .groupBy("p").agg(F.count("*").alias("d")))
    hist = deg.groupBy("d").agg(F.count("*").alias("c"))
    x = F.round(F.log(F.col("d").cast("double")), 9) \
        .cast("decimal(18,9)")
    y = F.round(F.log(F.col("c").cast("double")), 9) \
        .cast("decimal(18,9)")
    t = hist.select(x.alias("x"), y.alias("y"),
                    (x * y).cast("decimal(38,18)").alias("xy"),
                    (x * x).cast("decimal(38,18)").alias("xx"))
    agg = t.agg(F.count("*").cast("double").alias("k"),
                F.sum("x").cast("double").alias("sx"),
                F.sum("y").cast("double").alias("sy"),
                F.sum("xy").cast("double").alias("sxy"),
                F.sum("xx").cast("double").alias("sxx"))
    slope = ((F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return agg.select(F.col("k").cast("long").alias("n_degrees"),
                      F.round(slope, 6).alias("powerlaw_slope"))


_DEGREE_PL_ORACLE = """
WITH deg AS (
  SELECT p, COUNT(*) AS d FROM (
    SELECT DISTINCT a.l_partkey AS p, b.l_partkey AS q
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey <> b.l_partkey)
  GROUP BY p),
hist AS (SELECT d, COUNT(*) AS c FROM deg GROUP BY d),
t AS (
  SELECT CAST(round(ln(d * 1.0), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(c * 1.0), 9) AS DECIMAL(18,9)) AS y
  FROM hist),
a AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
  FROM t)
SELECT CAST(k AS BIGINT) AS n_degrees,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
         AS powerlaw_slope
FROM a
"""


def q_basket_entropy_nation(spark, sf_dir):
    """Basket-size diversity per nation: Shannon entropy (bits) of the
    order-size distribution — uniform basket sizes score high, a
    single dominant size low.  9 dp DECIMAL -p*log2(p) ladder terms
    (the category_entropy machinery grouped by nation)."""
    t = load_tables(spark, sf_dir)
    sz = (t["lineitem"].groupBy("l_orderkey")
          .agg(F.count("*").alias("k")))
    j = (t["orders"].join(sz, F.col("o_orderkey") == F.col("l_orderkey"))
         .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
         .groupBy("c_nationkey", "k").agg(F.count("*").alias("c")))
    tot = j.groupBy("c_nationkey").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    term = F.round(-p * F.log2(p), 9).cast("decimal(18,9)")
    return (j.join(tot, "c_nationkey")
            .groupBy("c_nationkey")
            .agg(F.round(F.sum(term).cast("double"), 6)
                 .alias("basket_entropy_bits")))


_BASKET_ENTROPY_ORACLE = """
WITH sz AS (
  SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY 1),
j AS (
  SELECT c_nationkey, k, COUNT(*) AS c
  FROM orders
  JOIN sz ON o_orderkey = l_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
tot AS (SELECT c_nationkey, SUM(c) AS n FROM j GROUP BY 1)
SELECT j.c_nationkey,
       round(CAST(SUM(CAST(round(
         -(j.c * 1.0 / tot.n) * log2(j.c * 1.0 / tot.n), 9)
         AS DECIMAL(18,9))) AS DOUBLE), 6) AS basket_entropy_bits
FROM j JOIN tot USING (c_nationkey)
GROUP BY j.c_nationkey
"""


def q_whale_share(spark, sf_dir):
    """Customer concentration: revenue share of the top 1% of
    customers (the whale curve point every marketplace tracks).
    Rank selection for the cutoff, exact DECIMAL sums, one
    division."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    per = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
              .cast("long")).cast("long").alias("s"))
    n = per.count()
    k = max(1, n // 100)
    r = per.withColumn("rk", F.row_number().over(
        W.orderBy(F.col("s").desc(), "o_custkey")))
    agg = r.agg(
        F.sum("s").cast("decimal(38,0)").alias("total"),
        F.sum(F.when(F.col("rk") <= k, F.col("s")).otherwise(0))
        .cast("decimal(38,0)").alias("whales"))
    return agg.select(
        F.lit(n).cast("long").alias("n_customers"),
        F.lit(k).cast("long").alias("n_whales"),
        F.round(F.col("whales").cast("double")
                / F.col("total").cast("double"), 6)
        .alias("whale_revenue_share"))


_WHALE_ORACLE = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY 1),
nn AS (SELECT COUNT(*) AS n, GREATEST(1, COUNT(*) // 100) AS k
       FROM per),
r AS (
  SELECT s, row_number() OVER (ORDER BY s DESC, o_custkey) AS rk
  FROM per)
SELECT nn.n AS n_customers, nn.k AS n_whales,
       round(CAST(SUM(CASE WHEN rk <= nn.k THEN s ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(s) AS DOUBLE), 6) AS whale_revenue_share
FROM r, nn GROUP BY nn.n, nn.k
"""


def q_trade_flows(spark, sf_dir):
    """Inter-nation trade-flow matrix: revenue from customer-nation i
    buying parts supplied by nation j (the full 25x25 generalization
    of TPC-H Q7's two-nation slice).  Star joins with broadcast dims;
    exact DECIMAL cents."""
    t = load_tables(spark, sf_dir)
    return (t["lineitem"]
            .join(t["orders"].select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(t["customer"]
                              .select("c_custkey", "c_nationkey")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(t["supplier"]
                              .select("s_suppkey",
                                      F.col("s_nationkey")
                                      .alias("supp_nation"))),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.col("c_nationkey").alias("cust_nation"),
                     "supp_nation")
            .agg(F.sum((F.col("l_extendedprice")
                        .cast("decimal(18,2)") * 100).cast("long"))
                 .cast("long").alias("rev_cents"),
                 F.count("*").alias("n_lines")))


_TRADE_FLOWS_ORACLE = """
SELECT c_nationkey AS cust_nation, s_nationkey AS supp_nation,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
"""


def q_supply_concentration(spark, sf_dir):
    """Supply-chain concentration risk: per part TYPE prefix, the HHI
    of supplier revenue shares — which categories depend on one
    supplier.  9 dp DECIMAL share-squared terms; top 10 most
    concentrated."""
    t = load_tables(spark, sf_dir)
    j = (t["lineitem"]
         .join(F.broadcast(t["part"].select(
             "p_partkey",
             F.split(F.col("p_type"), " ").getItem(0).alias("ptype"))),
             F.col("l_partkey") == F.col("p_partkey"))
         .groupBy("ptype", "l_suppkey")
         .agg(F.sum((F.col("l_extendedprice").cast("decimal(18,2)")
                     * 100).cast("long")).cast("long").alias("rev")))
    tot = j.groupBy("ptype").agg(
        F.sum("rev").cast("decimal(38,0)").alias("t"),
        F.count("*").alias("n_suppliers"))
    share = F.col("rev").cast("double") / F.col("t").cast("double")
    term = F.round(share * share, 9).cast("decimal(18,9)")
    return (j.join(tot, "ptype")
            .groupBy("ptype", "n_suppliers")
            .agg(F.round(F.sum(term).cast("double"), 6).alias("hhi"))
            .orderBy(F.col("hhi").desc(), "ptype").limit(10))


_SUPPLY_CONC_ORACLE = """
WITH j AS (
  SELECT string_split(p_type, ' ')[1] AS ptype, l_suppkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2),
tot AS (
  SELECT ptype, CAST(SUM(rev) AS DECIMAL(38,0)) AS t,
         COUNT(*) AS n_suppliers
  FROM j GROUP BY 1)
SELECT j.ptype, tot.n_suppliers,
       round(CAST(SUM(CAST(round(
         (CAST(rev AS DOUBLE) / CAST(t AS DOUBLE))
         * (CAST(rev AS DOUBLE) / CAST(t AS DOUBLE)), 9)
         AS DECIMAL(18,9))) AS DOUBLE), 6) AS hhi
FROM j JOIN tot USING (ptype)
GROUP BY j.ptype, tot.n_suppliers
ORDER BY hhi DESC, j.ptype LIMIT 10
"""


def q_source_dup_matrix(spark, sf_dir):
    """Cross-source duplication matrix: which sources near-duplicate
    which (exact ssjoin pairs lifted to the source level) — the
    provenance view that catches mirror sites and scraped-content
    laundering in a crawl.  Unordered source pairs; exact counts."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    pairs = dedup.ssjoin_jaccard(_docs(spark, sf_dir), threshold=0.5) \
        .select("id_a", "id_b")
    j = (pairs
         .join(docs.select(F.col("doc_id").alias("id_a"),
                           F.col("source").alias("src_a")), "id_a")
         .join(docs.select(F.col("doc_id").alias("id_b"),
                           F.col("source").alias("src_b")), "id_b"))
    return (j.groupBy(F.least("src_a", "src_b").alias("source_lo"),
                      F.greatest("src_a", "src_b").alias("source_hi"))
            .agg(F.count("*").alias("n_dup_pairs")))


_SOURCE_DUP_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
        i -> CAST(('0x' || substr(md5(
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))
             AS BIGINT))) AS s
  FROM toks WHERE len(ws) >= 3),
tt AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         count(*) AS i
  FROM tt a JOIN tt b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
pairs AS (
  SELECT id_a, id_b FROM inter
  WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.5)
SELECT LEAST(da.source, db.source) AS source_lo,
       GREATEST(da.source, db.source) AS source_hi,
       COUNT(*) AS n_dup_pairs
FROM pairs
JOIN documents da ON da.doc_id = id_a
JOIN documents db ON db.doc_id = id_b
GROUP BY 1, 2
"""


def q_backlog_curve(spark, sf_dir):
    """Order-backlog curve: how many orders are OPEN (placed, last
    line not yet shipped) on each day — the operations WIP series, by
    the +1/-1 sweep (q:peak_concurrency generalized to emit the whole
    curve).  Top 15 backlog days; exact integers."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    iv = (t["lineitem"].groupBy("l_orderkey")
          .agg(F.max(F.col("l_shipdate").cast("date")).alias("close"))
          .join(t["orders"].select("o_orderkey",
                                   F.col("o_orderdate").cast("date")
                                   .alias("open")),
                F.col("l_orderkey") == F.col("o_orderkey")))
    pts = (iv.select(F.col("open").alias("d"), F.lit(1).alias("w"))
           .unionByName(iv.select(F.col("close").alias("d"),
                                  F.lit(-1).alias("w")))
           .groupBy("d").agg(F.sum("w").alias("delta")))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    run = pts.withColumn("backlog", F.sum("delta").over(w))
    return (run.select("d", F.col("backlog").cast("long")
                       .alias("open_orders"))
            .orderBy(F.col("open_orders").desc(), "d").limit(15))


_BACKLOG_ORACLE = """
WITH iv AS (
  SELECT o_orderdate AS open_d, MAX(CAST(l_shipdate AS DATE)) AS close
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_orderdate),
pts AS (
  SELECT d, SUM(w) AS delta FROM (
    SELECT CAST(open_d AS DATE) AS d, 1 AS w FROM iv
    UNION ALL SELECT close, -1 FROM iv)
  GROUP BY d),
run AS (
  SELECT d, SUM(delta) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
    AS backlog
  FROM pts)
SELECT d, CAST(backlog AS BIGINT) AS open_orders
FROM run ORDER BY open_orders DESC, d LIMIT 15
"""


def q_ccdf_orders(spark, sf_dir):
    """Complementary CDF of order value at a fixed dollar grid
    (P(X > x) at 1k..256k doubling thresholds) — the log-log
    survival curve read alongside q:hill_tail's exponent.  Exact
    counts, one division per point."""
    o = load_tables(spark, sf_dir)["orders"].select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"))
    thresholds = [1000 * (2 ** i) for i in range(9)]
    grid = F.array(*[F.lit(float(x)) for x in thresholds])
    n = o.count()
    e = o.select(F.explode(grid).alias("x"), "p")
    return (e.groupBy("x")
            .agg(F.sum((F.col("p") > F.col("x")).cast("int"))
                 .alias("n_above"))
            .select(F.col("x").cast("long").alias("threshold"),
                    "n_above",
                    F.round(F.col("n_above") / F.lit(float(n)), 9)
                    .alias("ccdf")))


def _ccdf_oracle_sql() -> str:
    vals = ", ".join(f"({1000 * (2 ** i)})" for i in range(9))
    return f"""
WITH g(x) AS (VALUES {vals}),
n AS (SELECT COUNT(*) AS n FROM orders)
SELECT CAST(g.x AS BIGINT) AS threshold,
       SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) > g.x
           THEN 1 ELSE 0 END) AS n_above,
       round(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) > g.x
                 THEN 1 ELSE 0 END) * 1.0 / MIN(n.n), 9) AS ccdf
FROM orders, g, n GROUP BY g.x
"""


def q_revenue_bridge(spark, sf_dir):
    """Price-volume-mix bridge 1997 -> 1998 (the FP&A decomposition):
    over parts traded both years, delta revenue = price effect
    (q0 * dp) + volume effect (p0 * dq) + cross/mix (dp * dq), which
    sum EXACTLY to the common-parts revenue delta — additivity is the
    audit.  Unit prices are the q:price_index rationals rounded to
    6 dp DECIMAL; all effects are DECIMAL sums."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_shipdate").between("1997-01-01",
                                             "1998-12-31"))
          .groupBy("l_partkey",
                   F.year(F.col("l_shipdate")).alias("yr"))
          .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"),
               F.sum((F.col("l_extendedprice")
                      .cast("decimal(18,2)") * 100).cast("long"))
               .cast("long").alias("spend")))
    a = li.where(F.col("yr") == 1997).select(
        "l_partkey", F.col("q").alias("q0"),
        F.col("spend").alias("s0"))
    b = li.where(F.col("yr") == 1998).select(
        "l_partkey", F.col("q").alias("q1"),
        F.col("spend").alias("s1"))
    j = a.join(b, "l_partkey")
    p0 = F.round(F.col("s0") / F.col("q0"), 6).cast("decimal(28,6)")
    p1 = F.round(F.col("s1") / F.col("q1"), 6).cast("decimal(28,6)")
    price_eff = (F.col("q0").cast("decimal(19,0)") * (p1 - p0)) \
        .cast("decimal(38,6)")
    vol_eff = (p0 * (F.col("q1") - F.col("q0")).cast("decimal(19,0)")) \
        .cast("decimal(38,6)")
    cross_eff = ((p1 - p0)
                 * (F.col("q1") - F.col("q0")).cast("decimal(19,0)")) \
        .cast("decimal(38,6)")
    agg = j.agg(F.count("*").alias("n_parts"),
                F.sum(price_eff).alias("pe"),
                F.sum(vol_eff).alias("ve"),
                F.sum(cross_eff).alias("ce"),
                F.sum(F.col("q1").cast("decimal(19,0)") * p1
                      - F.col("q0").cast("decimal(19,0)") * p0)
                .cast("decimal(38,6)").alias("delta"))
    return agg.select(
        "n_parts",
        F.round(F.col("pe").cast("double") / 100, 2)
        .alias("price_effect"),
        F.round(F.col("ve").cast("double") / 100, 2)
        .alias("volume_effect"),
        F.round(F.col("ce").cast("double") / 100, 2)
        .alias("mix_effect"),
        F.round(F.col("delta").cast("double") / 100, 2)
        .alias("total_delta"))


_REVENUE_BRIDGE_ORACLE = """
WITH li AS (
  SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS spend
  FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
  GROUP BY 1, 2),
a AS (SELECT l_partkey, q AS q0, spend AS s0 FROM li WHERE yr = 1997),
b AS (SELECT l_partkey, q AS q1, spend AS s1 FROM li WHERE yr = 1998),
j AS (
  SELECT CAST(round(s0 * 1.0 / q0, 6) AS DECIMAL(28,6)) AS p0,
         CAST(round(s1 * 1.0 / q1, 6) AS DECIMAL(28,6)) AS p1,
         q0, q1
  FROM a JOIN b USING (l_partkey)),
agg AS (
  SELECT COUNT(*) AS n_parts,
         SUM(CAST(CAST(q0 AS DECIMAL(19,0)) * (p1 - p0)
                  AS DECIMAL(38,6))) AS pe,
         SUM(CAST(p0 * CAST(q1 - q0 AS DECIMAL(19,0))
                  AS DECIMAL(38,6))) AS ve,
         SUM(CAST((p1 - p0) * CAST(q1 - q0 AS DECIMAL(19,0))
                  AS DECIMAL(38,6))) AS ce,
         SUM(CAST(CAST(q1 AS DECIMAL(19,0)) * p1
                  - CAST(q0 AS DECIMAL(19,0)) * p0
                  AS DECIMAL(38,6))) AS delta
  FROM j)
SELECT n_parts,
       round(CAST(pe AS DOUBLE) / 100, 2) AS price_effect,
       round(CAST(ve AS DOUBLE) / 100, 2) AS volume_effect,
       round(CAST(ce AS DOUBLE) / 100, 2) AS mix_effect,
       round(CAST(delta AS DOUBLE) / 100, 2) AS total_delta
FROM agg
"""


def q_dedup_roi(spark, sf_dir):
    """Dedup ROI: bytes the exact + near-dup passes remove from the
    corpus (exact dups keep min-id; ssjoin clusters keep min-id) —
    the headline number that justifies running dedup at all.  Exact
    char sums; one division."""
    docs = _docs(spark, sf_dir)
    exact_drop = (docs.groupBy(F.md5("text").alias("h"))
                  .agg(F.sum("n_chars").alias("s"),
                       F.min("n_chars").alias("keep1"),
                       F.count("*").alias("c"))
                  .agg(F.sum(F.when(F.col("c") > 1,
                                    F.col("s") - F.col("keep1"))
                             .otherwise(0)).cast("long")
                       .alias("exact_chars")))
    pairs = dedup.ssjoin_jaccard(docs, threshold=0.5) \
        .select("id_a", "id_b")
    clusters = dedup.dedup_clusters(pairs)
    near_drop = (clusters.where(F.col("doc_id") != F.col("cluster"))
                 .join(docs, "doc_id")
                 .agg(F.sum("n_chars").cast("long")
                      .alias("near_chars")))
    tot = docs.agg(F.sum("n_chars").cast("long").alias("total_chars"))
    return (tot.crossJoin(F.broadcast(exact_drop))
            .crossJoin(F.broadcast(near_drop))
            .select("total_chars", "exact_chars", "near_chars",
                    F.round((F.col("exact_chars")
                             + F.col("near_chars"))
                            / F.col("total_chars").cast("double"), 6)
                    .alias("savings_ratio")))


_DEDUP_ROI_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
        i -> CAST(('0x' || substr(md5(
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))
             AS BIGINT))) AS s
  FROM toks WHERE len(ws) >= 3),
tt AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
         count(*) AS i
  FROM tt a JOIN tt b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
pairs AS (
  SELECT id_a, id_b FROM inter
  WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.5),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT a, b FROM sym
    UNION SELECT r.a, s.b FROM r JOIN sym s ON s.a = r.b)
  SELECT * FROM r),
drop_ AS (
  SELECT a AS doc_id FROM reach GROUP BY a
  HAVING a <> LEAST(a, MIN(b))),
exact_d AS (
  SELECT CAST(SUM(CASE WHEN c > 1 THEN s - keep1 ELSE 0 END)
              AS BIGINT) AS exact_chars
  FROM (SELECT md5(text) AS h, SUM(n_chars) AS s,
               MIN(n_chars) AS keep1, COUNT(*) AS c
        FROM documents GROUP BY md5(text))),
near_d AS (
  SELECT CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS near_chars
  FROM drop_ JOIN documents d USING (doc_id)),
tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents)
SELECT total_chars, exact_chars, near_chars,
       round((exact_chars + near_chars) * 1.0 / total_chars, 6)
         AS savings_ratio
FROM tot, exact_d, near_d
"""


def q_seasonality_strength(spark, sf_dir):
    """Seasonality strength of daily revenue: eta^2 of month-of-year
    groups (share of variance explained by the seasonal factor) —
    one number answering 'does seasonality matter here'.  Exact
    DECIMAL moments, the q:anova_segments machinery on calendar
    groups."""
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   * 100).cast("long").alias("y")))
    g = (daily.groupBy(F.month("day").alias("m"))
         .agg(F.count("*").alias("n"),
              F.sum("y").cast("decimal(38,0)").alias("s"),
              F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
              .cast("decimal(38,0)").alias("q")))
    tot = g.agg(F.sum("n").alias("nt"),
                F.sum("s").cast("decimal(38,0)").alias("st"),
                F.sum("q").cast("decimal(38,0)").alias("qt"),
                F.sum((F.col("s").cast("double")
                       * F.col("s").cast("double")) / F.col("n"))
                .alias("ssq_over_n"))
    sst = F.col("qt").cast("double") \
        - (F.col("st").cast("double") * F.col("st").cast("double")
           / F.col("nt"))
    ssb = F.col("ssq_over_n") \
        - (F.col("st").cast("double") * F.col("st").cast("double")
           / F.col("nt"))
    return tot.select(F.col("nt").cast("long").alias("n_days"),
                      F.round(ssb / sst, 9)
                      .alias("seasonality_strength"))


_SEASONALITY_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1),
g AS (
  SELECT EXTRACT(month FROM day) AS m, COUNT(*) AS n,
         CAST(SUM(y) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS q
  FROM daily GROUP BY 1),
tot AS (
  SELECT SUM(n) AS nt, CAST(SUM(s) AS DECIMAL(38,0)) AS st,
         CAST(SUM(q) AS DECIMAL(38,0)) AS qt,
         SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS ssq_over_n
  FROM g)
SELECT CAST(nt AS BIGINT) AS n_days,
       round((ssq_over_n
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
             / (CAST(qt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt), 9)
         AS seasonality_strength
FROM tot
"""


def q_quartile_dispersion(spark, sf_dir):
    """Quartile coefficient of dispersion (q3-q1)/(q3+q1) of order
    value per nation — the robust spread measure immune to whales.
    Lower-rank quartile selection per group; exact integer cents."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    j = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .select("c_nationkey",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("cents"), "o_orderkey"))
    w = W.partitionBy("c_nationkey").orderBy("cents", "o_orderkey")
    r = (j.withColumn("rk", F.row_number().over(w))
         .withColumn("n", F.count("*").over(
             W.partitionBy("c_nationkey"))))
    q1 = (r.where(F.col("rk") == F.floor((F.col("n") + 3) / 4)
                  .cast("int"))
          .groupBy("c_nationkey").agg(F.min("cents").alias("q1")))
    q3 = (r.where(F.col("rk") == F.floor((3 * F.col("n") + 3) / 4)
                  .cast("int"))
          .groupBy("c_nationkey").agg(F.min("cents").alias("q3")))
    return (q1.join(q3, "c_nationkey")
            .select("c_nationkey", "q1", "q3",
                    F.round((F.col("q3") - F.col("q1"))
                            / (F.col("q3") + F.col("q1"))
                            .cast("double"), 6).alias("qcd")))


_QCD_ORACLE = """
WITH j AS (
  SELECT c_nationkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM j),
q1 AS (SELECT c_nationkey, MIN(cents) AS q1 FROM r
       WHERE rk = CAST(floor((n + 3) / 4.0) AS INT)
       GROUP BY c_nationkey),
q3 AS (SELECT c_nationkey, MIN(cents) AS q3 FROM r
       WHERE rk = CAST(floor((3 * n + 3) / 4.0) AS INT)
       GROUP BY c_nationkey)
SELECT c_nationkey, q1, q3,
       round((q3 - q1) * 1.0 / (q3 + q1), 6) AS qcd
FROM q1 JOIN q3 USING (c_nationkey)
"""


def q_lines_per_order_trend(spark, sf_dir):
    """Average lines per order by quarter — the basket-size trend as
    an exact rational (integer lines / integer orders) with a 9 dp
    ratio."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].groupBy("l_orderkey").agg(
        F.count("*").alias("k"))
    j = (t["orders"].join(li, F.col("o_orderkey") == F.col("l_orderkey"))
         .groupBy(F.year("o_orderdate").alias("yr"),
                  F.quarter("o_orderdate").alias("qt"))
         .agg(F.count("*").alias("n_orders"),
              F.sum("k").cast("long").alias("n_lines")))
    return j.select("yr", "qt", "n_orders", "n_lines",
                    F.round(F.col("n_lines")
                            / F.col("n_orders").cast("double"), 9)
                    .alias("lines_per_order"))


_LPO_ORACLE = """
WITH li AS (
  SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY 1)
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qt,
       COUNT(*) AS n_orders,
       CAST(SUM(k) AS BIGINT) AS n_lines,
       round(SUM(k) * 1.0 / COUNT(*), 9) AS lines_per_order
FROM orders JOIN li ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


def q_tenure_spend_corr(spark, sf_dir):
    """Does tenure pay?  Pearson correlation between customer tenure
    (days from first order to the dataset horizon) and total spend —
    exact integer inputs, DECIMAL moment sums, sqrt-only
    irrationals."""
    o = load_tables(spark, sf_dir)["orders"]
    horizon = o.agg(F.max(F.col("o_orderdate").cast("date"))
                    .alias("h"))
    per = (o.groupBy("o_custkey")
           .agg(F.min(F.col("o_orderdate").cast("date")).alias("first"),
                F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                       * 100).cast("long")).cast("long").alias("y")))
    j = per.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("h"), F.col("first")).cast("long").alias("x"),
        "y")
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)").alias("syy"))
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                  .cast("double"))
           * F.sqrt((n * F.col("syy") - F.col("sy") * F.col("sy"))
                    .cast("double")))
    return agg.select(F.col("n").cast("long").alias("n_customers"),
                      F.round(num / den, 6).alias("tenure_spend_r"))


_TENURE_CORR_ORACLE = """
WITH h AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS h FROM orders),
per AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1),
j AS (
  SELECT CAST(datediff('day', first, h.h) AS BIGINT) AS x, y
  FROM per, h),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
           AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
           AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
           AS syy
  FROM j)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx
                          AS DOUBLE))
                * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                            AS DOUBLE))), 6) AS tenure_spend_r
FROM a
"""


def q_acf_table(spark, sf_dir):
    """Autocorrelation function table of weekly revenue at lags 1..8
    — the ACF profile that motivates AR model order (one lag is a
    point, eight are a diagnosis).  Each lag is an exact-moment
    Pearson between the series and its shift; one join of the
    dim-sized weekly frame against the literal lag grid."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    weekly = (o.groupBy(F.date_trunc("week", F.col("o_orderdate")
                                     .cast("timestamp")).alias("wk"))
              .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    * 100).cast("long").alias("y")))
    idx = weekly.withColumn("i", F.row_number().over(W.orderBy("wk"))) \
        .select("i", "y").localCheckpoint(eager=True)
    lags = spark.createDataFrame([(l,) for l in range(1, 9)],
                                 "lag int")
    a = idx.select(F.col("i").alias("ia"), F.col("y").alias("ya"))
    b = idx.select(F.col("i").alias("ib"), F.col("y").alias("yb"))
    j = (lags.crossJoin(a)
         .join(b, F.col("ib") == F.col("ia") + F.col("lag")))
    agg = j.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("ya").cast("decimal(38,0)").alias("sx"),
        F.sum("yb").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("ya").cast("decimal(19,0)") * F.col("yb"))
        .cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("ya").cast("decimal(19,0)") * F.col("ya"))
        .cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("yb").cast("decimal(19,0)") * F.col("yb"))
        .cast("decimal(38,0)").alias("syy"))
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                  .cast("double"))
           * F.sqrt((n * F.col("syy") - F.col("sy") * F.col("sy"))
                    .cast("double")))
    return agg.select("lag", F.col("n").cast("long").alias("n_pairs"),
                      F.round(num / den, 6).alias("acf"))


def _acf_oracle_sql() -> str:
    vals = ", ".join(f"({l})" for l in range(1, 9))
    return f"""
WITH weekly AS (
  SELECT date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1),
idx AS (SELECT row_number() OVER (ORDER BY wk) AS i, y FROM weekly),
lags(lag) AS (VALUES {vals}),
j AS (
  SELECT lags.lag, a.y AS ya, b.y AS yb
  FROM lags CROSS JOIN idx a
  JOIN idx b ON b.i = a.i + lags.lag),
agg AS (
  SELECT lag, COUNT(*) AS n,
         CAST(SUM(ya) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(yb) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(ya AS DECIMAL(19,0)) * yb) AS DECIMAL(38,0))
           AS sxy,
         CAST(SUM(CAST(ya AS DECIMAL(19,0)) * ya) AS DECIMAL(38,0))
           AS sxx,
         CAST(SUM(CAST(yb AS DECIMAL(19,0)) * yb) AS DECIMAL(38,0))
           AS syy
  FROM j GROUP BY lag)
SELECT lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx
                          AS DOUBLE))
                * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                            AS DOUBLE))), 6) AS acf
FROM agg
"""


def q_markov_steady_state(spark, sf_dir):
    """Stationary distribution of the per-user event-type Markov chain
    by 8 synchronous power iterations from uniform — where user
    behavior settles long-run.  Row-stochastic probabilities and every
    update re-round to the 9 dp DECIMAL grid (the textrank ladder), so
    the unrolled-CTE oracle replays bit-for-bit."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"),
        "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    tr = (ev.withColumn("nxt", F.lead("event_type").over(w))
          .where(F.col("nxt").isNotNull())
          .groupBy(F.col("event_type").alias("s"),
                   F.col("nxt").alias("d"))
          .agg(F.count("*").alias("c")))
    tot = tr.groupBy("s").agg(F.sum("c").alias("n"))
    p = (tr.join(tot, "s")
         .select("s", "d",
                 F.round(F.col("c") / F.col("n"), 9)
                 .cast("decimal(18,9)").alias("p"))
         .localCheckpoint(eager=True))
    pi = (tot.select(F.col("s").alias("d"))
          .withColumn("pi", F.lit(0.2).cast("decimal(18,9)")))
    for _ in range(8):
        pi = (p.join(pi.select(F.col("d").alias("s"), "pi"), "s")
              .groupBy("d")
              .agg(F.round(F.sum(F.col("pi") * F.col("p"))
                           .cast("double"), 9)
                   .cast("decimal(18,9)").alias("pi"))
              .localCheckpoint(eager=True))
    return pi.select(F.col("d").alias("event_type"),
                     F.col("pi").cast("double").alias("steady_state"))


def _steady_state_oracle_sql(iters: int = 8) -> str:
    ctes = ["""tr AS MATERIALIZED (
  SELECT s, d, COUNT(*) AS c FROM (
    SELECT event_type AS s,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY CAST(floor(epoch(ts))
                                               AS BIGINT), event_id)
             AS d
    FROM events)
  WHERE d IS NOT NULL GROUP BY s, d)""",
            """tp AS MATERIALIZED (
  SELECT tr.s, tr.d,
         CAST(round(tr.c * 1.0 / t.n, 9) AS DECIMAL(18,9)) AS p
  FROM tr JOIN (SELECT s, SUM(c) AS n FROM tr GROUP BY s) t
    ON t.s = tr.s)""",
            """pi0 AS MATERIALIZED (
  SELECT DISTINCT s AS d, CAST(0.2 AS DECIMAL(18,9)) AS pi FROM tr)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""pi{i} AS MATERIALIZED (
  SELECT tp.d,
         CAST(round(CAST(SUM(pi.pi * tp.p) AS DOUBLE), 9)
              AS DECIMAL(18,9)) AS pi
  FROM tp JOIN pi{i - 1} pi ON pi.d = tp.s
  GROUP BY tp.d)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT d AS event_type, CAST(pi AS DOUBLE) AS steady_state
FROM pi{iters}""")


def q_token_burstiness(spark, sf_dir):
    """Church-Gale token burstiness proxy: collection frequency over
    document frequency for the 30 most frequent tokens — cf/df >> 1
    flags bursty topical terms, ~1 flags function words.  Exact
    integer counts, one division."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id",
                       F.explode(text.tokens(F.col("text")))
                       .alias("tok"))
    agg = toks.groupBy("tok").agg(
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"))
    return (agg.select("tok", "cf", "df",
                       F.round(F.col("cf")
                               / F.col("df").cast("double"), 6)
                       .alias("burstiness"))
            .orderBy(F.col("cf").desc(), "tok").limit(30))


_TOKEN_BURST_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
         '[^a-z0-9]+'), x -> x != '')) AS tok
  FROM documents),
agg AS (
  SELECT tok, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
  FROM toks GROUP BY tok)
SELECT tok, cf, df, round(cf * 1.0 / df, 6) AS burstiness
FROM agg ORDER BY cf DESC, tok LIMIT 30
"""


def q_mutual_knn(spark, sf_dir):
    """Mutual nearest-neighbor pairs over the embedding corpus: pairs
    where each vector is the other's top-1 neighbor (integer-grid
    dots, argmax with id tie-break) — the high-precision seed pairs
    used to bootstrap alignment and dedup pipelines.  Neighbors come
    from the shared IVF blocking (_ivf_blocked, same-cell equi-join,
    never the O(n²) cross join): top-1-within-cell is the standard
    blocked-kNN approximation, and mutuality is unaffected for pairs
    that share a cell — the oracle replays the identical unrolled-
    Lloyd assignment so the candidate set is engine-reproducible."""
    idx = _ivf_blocked(spark, sf_dir)
    q = idx.select("cluster", "vec_id", F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e3).cast("long"))
        .alias("q"))
    a = q.select("cluster", F.col("vec_id").alias("va"),
                 F.col("q").alias("qa"))
    b = q.select("cluster", F.col("vec_id").alias("vb"),
                 F.col("q").alias("qb"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    best = F.max(F.struct(F.col("s").alias("s"),
                          (-F.col("vb")).alias("negid")))
    nn = (a.join(b, "cluster").where(F.col("va") != F.col("vb"))
          .select("va", "vb", dot.alias("s"))
          .groupBy("va").agg(best.alias("m"))
          .select(F.col("va"), (-F.col("m.negid")).cast("long")
                  .alias("nn"))
          .localCheckpoint(eager=True))
    r = nn.select(F.col("va").alias("x"), F.col("nn").alias("y"))
    return (r.alias("p")
            .join(r.alias("qq"),
                  (F.col("p.x") == F.col("qq.y"))
                  & (F.col("p.y") == F.col("qq.x")))
            .where(F.col("p.x") < F.col("p.y"))
            .select(F.col("p.x").alias("vec_a"),
                    F.col("p.y").alias("vec_b")))


_MUTUAL_KNN_ORACLE = _ivf_ctes(8, 2) + """,
qd AS (
  SELECT vec_id, t.i AS i,
         CAST(round(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                    * 1e3) AS BIGINT) AS v
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.v * b.v) AS s
  FROM qd a JOIN qd b ON a.i = b.i AND a.vec_id <> b.vec_id
       JOIN fin fa ON fa.vec_id = a.vec_id
       JOIN fin fb ON fb.vec_id = b.vec_id AND fb.c = fa.c
  GROUP BY 1, 2),
nn AS (
  SELECT va AS x, vb AS y FROM (
    SELECT va, vb, row_number() OVER (PARTITION BY va
                                      ORDER BY s DESC, vb) AS rk
    FROM dots) WHERE rk = 1)
SELECT p.x AS vec_a, p.y AS vec_b
FROM nn p JOIN nn q ON p.x = q.y AND p.y = q.x
WHERE p.x < p.y
"""


def q_dead_stock(spark, sf_dir):
    """Dead-stock screen: parts with NO sales in the trailing year of
    the dataset but sales before it — discontinuation candidates.
    One anti-join against the recent window; exact counts + last-sale
    recency."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_partkey", F.col("l_shipdate").cast("date").alias("d"))
    hor = li.agg(F.max("d").alias("h"))
    j = li.crossJoin(F.broadcast(hor))
    recent = (j.where(F.col("d") > F.date_sub(F.col("h"), 365))
              .select("l_partkey").distinct())
    old = (j.where(F.col("d") <= F.date_sub(F.col("h"), 365))
           .groupBy("l_partkey")
           .agg(F.max("d").alias("last_sale"),
                F.count("*").alias("n_lifetime_lines")))
    return (old.join(recent, "l_partkey", "left_anti")
            .select("l_partkey", "last_sale", "n_lifetime_lines"))


_DEAD_STOCK_ORACLE = """
WITH h AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS h FROM lineitem),
recent AS (
  SELECT DISTINCT l_partkey FROM lineitem, h
  WHERE CAST(l_shipdate AS DATE) > h.h - INTERVAL 365 DAY),
old AS (
  SELECT l_partkey, MAX(CAST(l_shipdate AS DATE)) AS last_sale,
         COUNT(*) AS n_lifetime_lines
  FROM lineitem, h
  WHERE CAST(l_shipdate AS DATE) <= h.h - INTERVAL 365 DAY
  GROUP BY 1)
SELECT o.l_partkey, o.last_sale, o.n_lifetime_lines
FROM old o LEFT JOIN recent r ON r.l_partkey = o.l_partkey
WHERE r.l_partkey IS NULL
"""


def q_session_depth_curve(spark, sf_dir):
    """Session-depth survival curve: P(session reaches >= k events)
    for k = 1..10 — the engagement funnel's denominator-safe form.
    Sessionization as in q:session_labels; exact counts."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"), "event_id")
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    new_s = F.when(
        (F.col("t") - F.lag("t").over(w) > 1800)
        | F.lag("t").over(w).isNull(), 1).otherwise(0)
    sess = (ev.withColumn("ns", new_s)
            .withColumn("sid", F.sum("ns").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)))
            .groupBy("user_id", "sid")
            .agg(F.count("*").alias("depth")))
    ks = spark.createDataFrame([(k,) for k in range(1, 11)], "k int")
    tot = sess.count()
    return (ks.crossJoin(sess)
            .groupBy("k")
            .agg(F.sum((F.col("depth") >= F.col("k")).cast("int"))
                 .alias("n_reaching"))
            .select("k", "n_reaching",
                    F.round(F.col("n_reaching") / F.lit(float(tot)), 6)
                    .alias("survival")))


_SESSION_DEPTH_ORACLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
  FROM events),
s AS (
  SELECT *, CASE WHEN t - lag(t) OVER w > 1800
                   OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS ns
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
g AS (
  SELECT user_id,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
sess AS (
  SELECT user_id, sid, COUNT(*) AS depth FROM g GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS n FROM sess),
ks(k) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10))
SELECT k, SUM(CASE WHEN depth >= k THEN 1 ELSE 0 END) AS n_reaching,
       round(SUM(CASE WHEN depth >= k THEN 1 ELSE 0 END) * 1.0
             / MIN(tot.n), 6) AS survival
FROM ks, sess, tot GROUP BY k
"""


def q_price_stickiness(spark, sf_dir):
    """Price stickiness: share of both-year parts whose rounded unit
    price is UNCHANGED 1997 -> 1998, plus up/down move counts — menu-
    cost economics on the catalog.  Unit prices are the q:price_index
    6 dp rationals; comparisons exact."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .where(F.col("l_shipdate").between("1997-01-01",
                                             "1998-12-31"))
          .groupBy("l_partkey",
                   F.year(F.col("l_shipdate")).alias("yr"))
          .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"),
               F.sum((F.col("l_extendedprice")
                      .cast("decimal(18,2)") * 100).cast("long"))
               .cast("long").alias("spend")))
    p = F.round(F.col("spend") / F.col("q"), 6).cast("decimal(28,6)")
    a = li.where(F.col("yr") == 1997).select(
        "l_partkey", p.alias("p0"))
    b = li.where(F.col("yr") == 1998).select(
        "l_partkey", p.alias("p1"))
    j = a.join(b, "l_partkey")
    return j.agg(
        F.count("*").alias("n_parts"),
        F.sum((F.col("p1") == F.col("p0")).cast("int"))
        .alias("unchanged"),
        F.sum((F.col("p1") > F.col("p0")).cast("int")).alias("up"),
        F.sum((F.col("p1") < F.col("p0")).cast("int")).alias("down"),
        F.round(F.sum((F.col("p1") == F.col("p0")).cast("int"))
                / F.count("*"), 6).alias("sticky_share"))


_PRICE_STICKY_ORACLE = """
WITH li AS (
  SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS spend
  FROM lineitem
  WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
  GROUP BY 1, 2),
a AS (SELECT l_partkey,
             CAST(round(spend * 1.0 / q, 6) AS DECIMAL(28,6)) AS p0
      FROM li WHERE yr = 1997),
b AS (SELECT l_partkey,
             CAST(round(spend * 1.0 / q, 6) AS DECIMAL(28,6)) AS p1
      FROM li WHERE yr = 1998),
j AS (SELECT * FROM a JOIN b USING (l_partkey))
SELECT COUNT(*) AS n_parts,
       SUM(CASE WHEN p1 = p0 THEN 1 ELSE 0 END) AS unchanged,
       SUM(CASE WHEN p1 > p0 THEN 1 ELSE 0 END) AS up,
       SUM(CASE WHEN p1 < p0 THEN 1 ELSE 0 END) AS down,
       round(SUM(CASE WHEN p1 = p0 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS sticky_share
FROM j
"""


def q_roc_curve(spark, sf_dir):
    """ROC curve of a deterministic classifier (score = discount,
    outcome = item returned): one (threshold, tpr, fpr) row per
    distinct score.  Scalable shape: the full fact table collapses to
    an 11-row (score, tp, fp) contingency by ONE map-side-combinable
    groupBy; the cumulative window runs on that tiny frame (the
    partitionless window here is over ≤ #distinct-scores rows, not the
    dataset — cf. the q:global_shuffle note).  All counts integer;
    one division at the end."""
    from pyspark.sql import Window as W
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.round(F.col("l_discount") * 100).cast("int").alias("thr_pct"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"))
    by = (li.groupBy("thr_pct")
          .agg(F.sum("y").alias("tp_s"),
               F.sum(1 - F.col("y")).alias("fp_s")))
    tot = by.agg(F.sum("tp_s").alias("pos"), F.sum("fp_s").alias("neg"))
    w = W.orderBy(F.col("thr_pct").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow)
    return (by.withColumn("cum_tp", F.sum("tp_s").over(w))
            .withColumn("cum_fp", F.sum("fp_s").over(w))
            .crossJoin(F.broadcast(tot))
            .select("thr_pct", "cum_tp", "cum_fp",
                    F.round(F.col("cum_tp") / F.col("pos"), 6).alias("tpr"),
                    F.round(F.col("cum_fp") / F.col("neg"), 6).alias("fpr")))


_ROC_ORACLE = """
WITH li AS (
  SELECT CAST(round(l_discount * 100) AS INT) AS thr_pct,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
by_s AS (
  SELECT thr_pct, SUM(y) AS tp_s, SUM(1 - y) AS fp_s
  FROM li GROUP BY 1),
tot AS (SELECT SUM(tp_s) AS pos, SUM(fp_s) AS neg FROM by_s),
cum AS (
  SELECT thr_pct,
         SUM(tp_s) OVER (ORDER BY thr_pct DESC
                         ROWS UNBOUNDED PRECEDING) AS cum_tp,
         SUM(fp_s) OVER (ORDER BY thr_pct DESC
                         ROWS UNBOUNDED PRECEDING) AS cum_fp
  FROM by_s)
SELECT thr_pct, cum_tp, cum_fp,
       round(cum_tp * 1.0 / pos, 6) AS tpr,
       round(cum_fp * 1.0 / neg, 6) AS fpr
FROM cum, tot
"""


def q_pr_curve(spark, sf_dir):
    """Precision-recall curve for the same classifier as q:roc_curve —
    one (threshold, precision, recall) row per distinct score, plus
    the positive-prevalence baseline each precision should beat.
    Same contingency-collapse shape (exact integers, final division
    only)."""
    from pyspark.sql import Window as W
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.round(F.col("l_discount") * 100).cast("int").alias("thr_pct"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"))
    by = (li.groupBy("thr_pct")
          .agg(F.sum("y").alias("tp_s"), F.count("*").alias("n_s")))
    tot = by.agg(F.sum("tp_s").alias("pos"), F.sum("n_s").alias("n"))
    w = W.orderBy(F.col("thr_pct").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow)
    return (by.withColumn("cum_tp", F.sum("tp_s").over(w))
            .withColumn("cum_n", F.sum("n_s").over(w))
            .crossJoin(F.broadcast(tot))
            .select("thr_pct",
                    F.round(F.col("cum_tp") / F.col("cum_n"), 6)
                    .alias("precision"),
                    F.round(F.col("cum_tp") / F.col("pos"), 6)
                    .alias("recall"),
                    F.round(F.col("pos") / F.col("n"), 6)
                    .alias("prevalence")))


_PR_ORACLE = """
WITH li AS (
  SELECT CAST(round(l_discount * 100) AS INT) AS thr_pct,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
by_s AS (
  SELECT thr_pct, SUM(y) AS tp_s, COUNT(*) AS n_s FROM li GROUP BY 1),
tot AS (SELECT SUM(tp_s) AS pos, SUM(n_s) AS n FROM by_s),
cum AS (
  SELECT thr_pct,
         SUM(tp_s) OVER (ORDER BY thr_pct DESC
                         ROWS UNBOUNDED PRECEDING) AS cum_tp,
         SUM(n_s) OVER (ORDER BY thr_pct DESC
                        ROWS UNBOUNDED PRECEDING) AS cum_n
  FROM by_s)
SELECT thr_pct,
       round(cum_tp * 1.0 / cum_n, 6) AS precision,
       round(cum_tp * 1.0 / pos, 6) AS recall,
       round(pos * 1.0 / n, 6) AS prevalence
FROM cum, tot
"""


def q_brier_calibration(spark, sf_dir):
    """Calibration-by-decile + per-bin Brier score for a fixed-weight
    linear scorer p = (45*discount_pct + 9*quantity + 50)/1000 against
    the returned-flag outcome.  The score is built in INTEGER
    milli-units (p_millis) so binning and the (p-y)^2 sums are exact
    decimals on both engines; doubles appear only in the final rounded
    divisions.  One groupBy over the fact table — map-side combinable,
    no shuffle beyond the 10-bin aggregate."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        (F.round(F.col("l_discount") * 100).cast("int") * 45
         + F.col("l_quantity").cast("int") * 9 + 50).alias("p_millis"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"))
    li = li.withColumn("bin", F.floor(F.col("p_millis") / 100).cast("int"))
    p = (F.col("p_millis").cast("decimal(10,6)") / 1000)
    sq = (p - F.col("y")).cast("decimal(16,10)")
    return (li.withColumn("p", p).withColumn("sq", sq * sq)
            .groupBy("bin")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("p") / F.count("*"), 6)
                 .cast("double").alias("mean_pred"),
                 F.round(F.sum("y") / F.count("*"), 6)
                 .cast("double").alias("event_rate"),
                 F.round(F.sum("sq") / F.count("*"), 6)
                 .cast("double").alias("brier")))


_BRIER_ORACLE = """
WITH li AS (
  SELECT CAST(round(l_discount * 100) AS INT) * 45
         + CAST(l_quantity AS INT) * 9 + 50 AS p_millis,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem),
b AS (
  SELECT CAST(floor(p_millis / 100.0) AS INT) AS bin,
         CAST(p_millis AS DECIMAL(10,6)) / 1000 AS p, y
  FROM li)
SELECT bin, COUNT(*) AS n,
       round(SUM(p) * 1.0 / COUNT(*), 6) AS mean_pred,
       round(SUM(y) * 1.0 / COUNT(*), 6) AS event_rate,
       round(SUM(CAST(p - y AS DECIMAL(16,10))
                 * CAST(p - y AS DECIMAL(16,10))) * 1.0 / COUNT(*), 6)
       AS brier
FROM b GROUP BY 1
"""


def q_butterfly_count(spark, sf_dir):
    """Bipartite butterfly census of the customer-part purchase graph:
    edges, wedges (part pairs sharing a customer), and butterflies
    (2x2 bicliques) — the bipartite clustering primitives.

    Scale shape: pairs are generated from the CUSTOMER side only
    (degree ≤ catalog fanout, never part popularity), a degree cap
    mirrors the q:copurchase_pairs skew guard (hot hubs excluded
    identically in both engines — normally empty on TPC-H), and the
    per-pair counts collapse by map-side-combinable groupBys; only the
    wedge stream shuffles."""
    n_part = spark.sparkContext.defaultParallelism * 2
    t = load_tables(spark, sf_dir)
    cp = (t["lineitem"].select("l_orderkey", "l_partkey")
          .join(t["orders"].select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .select(F.col("o_custkey").alias("c"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    deg = cp.groupBy("c").agg(F.count("*").alias("d"))
    keep = deg.where(F.col("d") <= 200)
    cpk = (cp.join(keep.select("c"), "c", "left_semi")
           .repartition(n_part, "c"))
    a, b = cpk.alias("a"), cpk.alias("b")
    pairs = (a.join(b, (F.col("a.c") == F.col("b.c"))
                    & (F.col("a.p") < F.col("b.p")))
             .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
             .agg(F.count("*").alias("s")))
    side = keep.agg(
        F.sum("d").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"))
    bf = pairs.agg(
        F.coalesce(F.sum(F.expr("s * (s - 1) div 2")), F.lit(0))
        .alias("n_butterflies"))
    return side.crossJoin(F.broadcast(bf))


_BUTTERFLY_ORACLE = """
WITH cp AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
deg AS (SELECT c, COUNT(*) AS d FROM cp GROUP BY 1),
keep AS (SELECT c, d FROM deg WHERE d <= 200),
cpk AS (SELECT cp.c, cp.p FROM cp JOIN keep USING (c)),
pairs AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS s
  FROM cpk a JOIN cpk b ON a.c = b.c AND a.p < b.p
  GROUP BY 1, 2)
SELECT (SELECT CAST(SUM(d) AS BIGINT) FROM keep) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM keep)
         AS n_wedges,
       (SELECT CAST(COALESCE(SUM(s * (s - 1) // 2), 0) AS BIGINT)
        FROM pairs) AS n_butterflies
"""


def q_diameter_sweep(spark, sf_dir):
    """Double-sweep diameter lower bound of the Region-Nation-Customer-
    Order graph: BFS from the ASIA region node, hop to the farthest
    node found (ties by uid), BFS again — ecc(far) bounds the true
    diameter from below (exact on trees, and this subgraph is a
    forest of region stars).  Two frontier BFS passes; each round
    shuffles only the new frontier.  The argmax pick is a 1-row
    driver scalar, not a collect of the reach set."""
    t = load_tables(spark, sf_dir)
    seed = (t["region"].where(F.col("r_name") == "ASIA")
            .select(F.concat(F.lit("Region:"),
                             F.col("r_regionkey")).alias("uid")))
    g = tpch_graph(spark, sf_dir)
    edges = g.edges_df.where(
        F.col("kind").isin("InRegion", "FromNation", "Placed"))
    d1 = graph_algos.bfs_distances(edges, seed, max_depth=6,
                                   direction="both")
    far = d1.orderBy(F.col("dist").desc(), F.col("uid")).first()
    seed2 = spark.createDataFrame([(far["uid"],)], "uid string")
    d2 = graph_algos.bfs_distances(edges, seed2, max_depth=8,
                                   direction="both")
    lb = d2.agg(F.max("dist")).first()[0]
    return spark.createDataFrame(
        [(far["uid"], int(far["dist"]), int(lb))],
        "far_uid string, ecc_start int, diameter_lb int")


_DIAMETER_SWEEP_ORACLE = """
WITH RECURSIVE
ed(a, b) AS (
  SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
         'Region:' || CAST(n_regionkey AS VARCHAR) FROM nation
  UNION ALL
  SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
         'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
  UNION ALL
  SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
         'Nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR),
         'Customer:' || CAST(c_custkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'Customer:' || CAST(o_custkey AS VARCHAR),
         'Order:' || CAST(o_orderkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'Order:' || CAST(o_orderkey AS VARCHAR),
         'Customer:' || CAST(o_custkey AS VARCHAR) FROM orders
),
w1(uid, d) AS (
  SELECT 'Region:' || CAST(r_regionkey AS VARCHAR), 0
  FROM region WHERE r_name = 'ASIA'
  UNION
  SELECT ed.b, w1.d + 1 FROM w1 JOIN ed ON ed.a = w1.uid
  WHERE w1.d < 6),
d1 AS (SELECT uid, MIN(d) AS d FROM w1 GROUP BY uid),
far AS (SELECT uid, d FROM d1 ORDER BY d DESC, uid LIMIT 1),
w2(uid, d) AS (
  SELECT uid, 0 FROM far
  UNION
  SELECT ed.b, w2.d + 1 FROM w2 JOIN ed ON ed.a = w2.uid
  WHERE w2.d < 8),
d2 AS (SELECT uid, MIN(d) AS d FROM w2 GROUP BY uid)
SELECT (SELECT uid FROM far) AS far_uid,
       CAST((SELECT d FROM far) AS INT) AS ecc_start,
       CAST((SELECT MAX(d) FROM d2) AS INT) AS diameter_lb
"""


def q_eigenvector_parts(spark, sf_dir):
    """Eigenvector centrality (top 20) of the Part-Supplier bipartite
    supply graph — the classic centrality missing from the katz/
    pagerank/HITS family: influence weighted by neighbors' influence.
    8 unnormalized power-iteration rounds (edge list partitioned once,
    only the node-sized score frame shuffles per round), max-normalized
    at the end; the DuckDB oracle replays the identical unrolled
    recursion.  Ordering on round(score, 6) + uid so float-summation
    noise cannot flip the selection."""
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select(F.concat(F.lit("Part:"), F.col("l_partkey"))
                  .alias("startuid"),
                  F.concat(F.lit("Supplier:"), F.col("l_suppkey"))
                  .alias("enduid"))
          .distinct())
    ev = graph_algos.eigenvector_centrality(li, iters=8)
    return (ev.select("uid", F.round("score", 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("uid")).limit(20))


_EIGENVECTOR_ORACLE = """
WITH RECURSIVE
fwd(a, b) AS (
  SELECT DISTINCT 'Part:' || CAST(l_partkey AS VARCHAR),
         'Supplier:' || CAST(l_suppkey AS VARCHAR) FROM lineitem),
ed(a, b) AS (
  SELECT a, b FROM fwd UNION ALL SELECT b, a FROM fwd),
ev(iter, uid, x) AS (
  SELECT 0, a, 1.0::DOUBLE FROM (SELECT DISTINCT a FROM ed)
  UNION ALL
  SELECT e.iter + 1, ed.b, SUM(e.x)
  FROM ev e JOIN ed ON e.uid = ed.a
  WHERE e.iter < 8
  GROUP BY e.iter + 1, ed.b),
fin AS (SELECT uid, x FROM ev WHERE iter = 8),
m AS (SELECT MAX(x) AS mx FROM fin)
SELECT uid, round(x / mx, 6) AS score
FROM fin, m
ORDER BY score DESC, uid LIMIT 20
"""


def q_unpivot_metrics(spark, sf_dir):
    """Wide→long UNPIVOT (melt): per-region scalar metrics
    (customers, suppliers, account-balance cents) unpivoted to
    (region, metric, value) rows — Spark's native ``unpivot``
    operator, DuckDB's UNION-ALL twin.  Exact integers throughout."""
    t = load_tables(spark, sf_dir)
    nat = t["nation"].select("n_nationkey", "n_regionkey")
    cust = (t["customer"].join(F.broadcast(nat),
                               F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_regionkey").alias("crk"))
            .agg(F.count("*").alias("n_customers"),
                 F.sum((F.col("c_acctbal").cast("decimal(18,2)") * 100)
                       .cast("long")).alias("acctbal_cents")))
    supp = (t["supplier"].join(F.broadcast(nat),
                               F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_regionkey").alias("srk"))
            .agg(F.count("*").alias("n_suppliers")))
    wide = (t["region"].select(F.col("r_regionkey"), F.col("r_name"))
            .join(cust, F.col("r_regionkey") == F.col("crk"), "left")
            .join(supp, F.col("r_regionkey") == F.col("srk"), "left")
            .select("r_name",
                    F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
                    F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
                    F.coalesce("acctbal_cents", F.lit(0))
                    .alias("acctbal_cents")))
    return wide.unpivot("r_name",
                        ["n_customers", "n_suppliers", "acctbal_cents"],
                        "metric", "value")


_UNPIVOT_ORACLE = """
WITH nat AS (SELECT n_nationkey, n_regionkey FROM nation),
cust AS (
  SELECT n_regionkey, COUNT(*) AS n_customers,
         CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS acctbal_cents
  FROM customer JOIN nat ON c_nationkey = n_nationkey GROUP BY 1),
supp AS (
  SELECT n_regionkey, COUNT(*) AS n_suppliers
  FROM supplier JOIN nat ON s_nationkey = n_nationkey GROUP BY 1),
wide AS (
  SELECT r_name,
         COALESCE(n_customers, 0) AS n_customers,
         COALESCE(n_suppliers, 0) AS n_suppliers,
         COALESCE(acctbal_cents, 0) AS acctbal_cents
  FROM region
  LEFT JOIN cust ON r_regionkey = cust.n_regionkey
  LEFT JOIN supp ON r_regionkey = supp.n_regionkey)
SELECT r_name, 'n_customers' AS metric,
       CAST(n_customers AS BIGINT) AS value FROM wide
UNION ALL
SELECT r_name, 'n_suppliers', CAST(n_suppliers AS BIGINT) FROM wide
UNION ALL
SELECT r_name, 'acctbal_cents', CAST(acctbal_cents AS BIGINT) FROM wide
"""


def q_bitmap_distinct(spark, sf_dir):
    """EXACT distinct users per event type via mergeable bitmap words
    (the Druid/ClickHouse bitmap-index trick): user ids chunk into
    32-bit words (word = id div 32, bit = id mod 32), bit_or is the
    mergeable partial aggregate, popcount-sum the final.  Unlike
    count_distinct's expand-dedup-count, the shuffle carries one word
    per (type, id-range-of-32) — dense id spaces compress ~32×, and
    the partial bit_or combines map-side.  Oracle: plain
    COUNT(DISTINCT) — same exact semantics."""
    ev = _events(spark, sf_dir)
    words = (ev.select("event_type",
                       (F.col("user_id") / 32).cast("long").alias("word"),
                       F.expr("shiftleft(CAST(1 AS BIGINT), "
                              "CAST(user_id % 32 AS INT))").alias("bit"))
             .groupBy("event_type", "word")
             .agg(F.expr("bit_or(bit)").alias("bm")))
    return (words.groupBy("event_type")
            .agg(F.sum(F.expr("bit_count(bm)")).alias("n_users")))


_BITMAP_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_croston_demand(spark, sf_dir):
    """Croston's method for intermittent demand, per part brand:
    exponential smoothing (α = 0.1) of nonzero-demand-day sizes and of
    inter-demand intervals; forecast rate = size / interval.  The
    smoothing is a LEFT FOLD over the day-ordered demand sequence —
    identical double-op order in Spark's ``aggregate`` and DuckDB's
    ``list_reduce`` (first element is the classic Croston init), so no
    cross-libm pow and no associativity drift.  Per-brand sequences
    are bounded by the calendar (one element per active day), so the
    collect_list is group-local, never driver-side."""
    t = load_tables(spark, sf_dir)
    d = (t["lineitem"]
         .join(F.broadcast(t["part"].select("p_partkey", "p_brand")),
               F.col("l_partkey") == F.col("p_partkey"))
         .groupBy(F.col("p_brand").alias("brand"),
                  F.col("l_shipdate").cast("date").alias("day"))
         .agg(F.sum(F.col("l_quantity").cast("long")).alias("q")))
    g = (d.groupBy("brand")
         .agg(F.sort_array(F.collect_list(F.struct("day", "q")))
              .alias("arr"),
              F.count("*").alias("n_demand_days")))
    g = (g.withColumn("sizes",
                      F.expr("transform(arr, s -> CAST(s.q AS DOUBLE))"))
         .withColumn("ints", F.expr(
             "transform(sequence(2, size(arr)), i -> CAST(datediff("
             "element_at(arr, i).day, element_at(arr, i-1).day)"
             " AS DOUBLE))")))
    fold = ("aggregate(slice({c}, 2, size({c}) - 1), "
            "element_at({c}, 1), "
            "(acc, x) -> CAST(0.9 AS DOUBLE) * acc"
            " + CAST(0.1 AS DOUBLE) * x)")
    return (g.where(F.col("n_demand_days") >= 2)
            .select("brand", "n_demand_days",
                    F.round(F.expr(fold.format(c="sizes")), 6)
                    .alias("smoothed_size"),
                    F.round(F.expr(fold.format(c="ints")), 6)
                    .alias("smoothed_interval"),
                    F.round(F.expr(fold.format(c="sizes"))
                            / F.expr(fold.format(c="ints")), 6)
                    .alias("demand_rate")))


_CROSTON_ORACLE = """
WITH d AS (
  SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2),
g AS (
  SELECT brand, list(q ORDER BY day) AS sizes,
         list(day ORDER BY day) AS days,
         COUNT(*) AS n_demand_days
  FROM d GROUP BY 1),
i AS (
  SELECT brand, sizes, n_demand_days,
         list_transform(range(2, n_demand_days + 1),
                        i -> CAST(days[i] - days[i-1] AS DOUBLE)) AS ints
  FROM g WHERE n_demand_days >= 2)
SELECT brand, n_demand_days,
       round(list_reduce(sizes, (acc, x) ->
             0.9::DOUBLE * acc + 0.1::DOUBLE * x), 6) AS smoothed_size,
       round(list_reduce(ints, (acc, x) ->
             0.9::DOUBLE * acc + 0.1::DOUBLE * x), 6)
         AS smoothed_interval,
       round(list_reduce(sizes, (acc, x) ->
             0.9::DOUBLE * acc + 0.1::DOUBLE * x)
             / list_reduce(ints, (acc, x) ->
               0.9::DOUBLE * acc + 0.1::DOUBLE * x), 6) AS demand_rate
FROM i
"""


def q_attribution_time_decay(spark, sf_dir):
    """Time-decay multi-touch attribution: each purchase's value is
    split over the user's click/view touches in the prior 7 days with
    rational decay w = 1 / (1 + Δdays) (no cross-libm pow), weights
    normalized per purchase; 'direct' absorbs untouched purchases.
    The touch join is keyed on user_id with a residual time band —
    per-user fanout, no cross join; credit sums are grouped once."""
    ev = _events(spark, sf_dir)
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("pid"),
                         F.col("user_id").alias("pu"),
                         F.col("ts").cast("long").alias("pt"),
                         F.col("value").cast("decimal(18,2)")
                         .alias("val")))
    touches = (ev.where(F.col("event_type").isin("click", "view"))
               .select(F.col("user_id").alias("tu"),
                       F.col("ts").cast("long").alias("tt"),
                       F.col("event_type").alias("channel")))
    j = purchases.join(
        touches, (F.col("pu") == F.col("tu"))
        & (F.col("tt") < F.col("pt"))
        & (F.col("tt") >= F.col("pt") - 7 * 86400))
    wt = 1 / (1 + (F.col("pt") - F.col("tt")) / F.lit(86400.0))
    per = (j.withColumn("w", wt)
           .groupBy("pid", "channel")
           .agg(F.sum("w").alias("w_ch"),
                F.max(F.col("val").cast("double")).alias("val")))
    tot = per.groupBy(F.col("pid").alias("pid2")).agg(
        F.sum("w_ch").alias("w_tot"))
    credited = (per.join(tot, F.col("pid") == F.col("pid2"))
                .select("channel",
                        (F.col("val") * F.col("w_ch") / F.col("w_tot"))
                        .alias("credit")))
    direct = (purchases.join(per.select("pid").distinct(),
                             "pid", "left_anti")
              .select(F.lit("direct").alias("channel"),
                      F.col("val").cast("double").alias("credit")))
    return (credited.unionByName(direct)
            .groupBy("channel")
            .agg(F.round(F.sum("credit"), 4).alias("credited_value")))


_TIME_DECAY_ORACLE = """
WITH purchases AS (
  SELECT event_id AS pid, user_id AS pu,
         CAST(floor(epoch(ts)) AS BIGINT) AS pt,
         CAST(value AS DECIMAL(18,2)) AS val
  FROM events WHERE event_type = 'purchase'),
touches AS (
  SELECT user_id AS tu, CAST(floor(epoch(ts)) AS BIGINT) AS tt,
         event_type AS channel
  FROM events WHERE event_type IN ('click', 'view')),
j AS (
  SELECT pid, channel, val,
         1 / (1 + (pt - tt) / 86400.0) AS w
  FROM purchases JOIN touches
    ON pu = tu AND tt < pt AND tt >= pt - 7 * 86400),
per AS (
  SELECT pid, channel, SUM(w) AS w_ch,
         MAX(CAST(val AS DOUBLE)) AS val
  FROM j GROUP BY 1, 2),
tot AS (SELECT pid, SUM(w_ch) AS w_tot FROM per GROUP BY 1),
credited AS (
  SELECT channel, per.val * w_ch / w_tot AS credit
  FROM per JOIN tot USING (pid)),
direct AS (
  SELECT 'direct' AS channel, CAST(val AS DOUBLE) AS credit
  FROM purchases
  WHERE pid NOT IN (SELECT DISTINCT pid FROM per))
SELECT channel, round(SUM(credit), 4) AS credited_value
FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
GROUP BY 1
"""


def q_moments_by_segment(spark, sf_dir):
    """Distribution profiling per market segment: population skewness
    and excess kurtosis of customer account balances from EXACT
    decimal power sums (cents^k, k ≤ 4, decimal(38,0) — no float
    accumulation, no engine-specific bias correction), doubles only in
    the final moment algebra.  One map-side-combinable groupBy."""
    c = (load_tables(spark, sf_dir)["customer"]
         .select("c_mktsegment",
                 (F.col("c_acctbal").cast("decimal(18,2)") * 100)
                 .cast("decimal(38,0)").alias("v")))
    g = (c.groupBy("c_mktsegment")
         .agg(F.count("*").alias("n"),
              F.sum("v").alias("s1"),
              F.sum(F.col("v") * F.col("v")).alias("s2"),
              F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
              F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v"))
              .alias("s4")))
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3 * m * s2 / n + 2 * m * m * m
    m4 = (s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n
          - 3 * m * m * m * m)
    # variance is ~1e11 cents² — emit it as an EXACT integer
    # ((n·s2 − s1²) div n²) rather than a rounded double: at this
    # magnitude the decimal→double cast can differ by one ulp between
    # engines and flip the rounding (BASELINE.md determinism lessons)
    var_exact = F.expr(
        "(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1) "
        "div (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))")
    return g.select(
        "c_mktsegment", "n",
        var_exact.cast("long").alias("variance_cents2"),
        F.round(m3 / F.sqrt(m2 * m2 * m2), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"))


_MOMENTS_ORACLE = """
WITH c AS (
  SELECT c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS HUGEINT) AS v
  FROM customer),
g AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         SUM(v) AS s1, SUM(v * v) AS s2, SUM(v * v * v) AS s3,
         SUM(v * v * v * v) AS s4
  FROM c GROUP BY 1),
d AS (
  SELECT c_mktsegment, n,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1,
         CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
         CAST(s4 AS DOUBLE) AS s4
  FROM g),
mm AS (
  SELECT c_mktsegment, n, s1 / nd AS m,
         s2 / nd - (s1 / nd) * (s1 / nd) AS m2,
         s3 / nd - 3 * (s1 / nd) * s2 / nd
           + 2 * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m3,
         s4 / nd - 4 * (s1 / nd) * s3 / nd
           + 6 * (s1 / nd) * (s1 / nd) * s2 / nd
           - 3 * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m4
  FROM d)
SELECT mm.c_mktsegment, mm.n,
       CAST((g.n * g.s2 - g.s1 * g.s1) // (g.n * g.n) AS BIGINT)
         AS variance_cents2,
       round(m3 / sqrt(m2 * m2 * m2), 6) AS skewness,
       round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
FROM mm JOIN g ON mm.c_mktsegment = g.c_mktsegment
"""


def q_lorenz_curve(spark, sf_dir):
    """Lorenz curve of customer lifetime spend in deciles: cumulative
    share of revenue held by the bottom d/10 of customers — the curve
    behind q:gini_revenue.  Decile by ntile over exact cent totals
    (ties broken by custkey for a unique assignment); shares are
    integer-cent ratios rounded once."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    spend = (o.groupBy("o_custkey")
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("long")).alias("cents")))
    d = spend.withColumn(
        "decile", F.ntile(10).over(W.orderBy("cents", "o_custkey")))
    per = (d.groupBy("decile")
           .agg(F.sum("cents").alias("c"), F.count("*").alias("n")))
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = per.agg(F.sum("c").alias("t"), F.sum("n").alias("tn"))
    return (per.withColumn("cum_c", F.sum("c").over(w))
            .withColumn("cum_n", F.sum("n").over(w))
            .crossJoin(F.broadcast(tot))
            .select("decile",
                    F.round(F.col("cum_n") / F.col("tn"), 6)
                    .alias("pop_share"),
                    F.round(F.col("cum_c") / F.col("t"), 6)
                    .alias("revenue_share")))


_LORENZ_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
d AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM spend),
per AS (
  SELECT decile, SUM(cents) AS c, COUNT(*) AS n FROM d GROUP BY 1),
tot AS (SELECT SUM(c) AS t, SUM(n) AS tn FROM per),
cum AS (
  SELECT decile,
         SUM(c) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
           AS cum_c,
         SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
           AS cum_n
  FROM per)
SELECT decile, round(cum_n * 1.0 / tn, 6) AS pop_share,
       round(cum_c * 1.0 / t, 6) AS revenue_share
FROM cum, tot
"""


def q_otif_rate(spark, sf_dir):
    """On-time fulfilment rate and mean lateness per order priority
    (the OTIF logistics KPI, restated for the fixture's reduced
    lineitem: on-time = line shipped within 30 days of order date;
    lateness averaged over late lines only).  Exact integer day
    arithmetic; the priority dimension broadcasts onto the fact
    scan — single groupBy, one shuffle of 5 groups."""
    t = load_tables(spark, sf_dir)
    li = (t["lineitem"].select("l_orderkey", "l_shipdate")
          .join(t["orders"].select("o_orderkey", "o_orderdate",
                                   "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .select("o_orderpriority",
                  (F.datediff(F.col("l_shipdate").cast("date"),
                              F.col("o_orderdate").cast("date")) - 30)
                  .alias("late_days")))
    return (li.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines"),
                 F.sum((F.col("late_days") <= 0).cast("int"))
                 .alias("on_time"),
                 F.round(F.sum((F.col("late_days") <= 0).cast("int"))
                         / F.count("*"), 6).alias("otif_rate"),
                 F.round(F.sum(F.when(F.col("late_days") > 0,
                                      F.col("late_days")).otherwise(0))
                         / F.nullif(F.sum((F.col("late_days") > 0)
                                          .cast("int")), F.lit(0)), 6)
                 .alias("mean_late_days")))


_OTIF_ORACLE = """
WITH li AS (
  SELECT o_orderpriority,
         CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) - 30
           AS late_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, COUNT(*) AS n_lines,
       SUM(CASE WHEN late_days <= 0 THEN 1 ELSE 0 END) AS on_time,
       round(SUM(CASE WHEN late_days <= 0 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS otif_rate,
       round(SUM(CASE WHEN late_days > 0 THEN late_days ELSE 0 END)
             * 1.0 / NULLIF(SUM(CASE WHEN late_days > 0 THEN 1
                                     ELSE 0 END), 0), 6)
         AS mean_late_days
FROM li GROUP BY 1
"""


def q_embedding_norm_outliers(spark, sf_dir):
    """Norm-based embedding sanity screen: vectors whose squared norm
    deviates from the corpus median by > 3×MAD (the robust-zscore
    gate run before indexing a vector store).  Norms on the 1e3
    integer grid (q:mutual_knn pattern) so they are EXACT longs; the
    median/MAD order statistics interpolate on .5 grains — exact in
    doubles — so the 3×MAD comparison is engine-stable with no
    rounding at all.  Two tiny broadcast scalars; the corpus is
    scanned twice, never shuffled."""
    emb = _emb(spark, sf_dir)
    sq = F.aggregate(
        F.transform(F.col("embedding"),
                    lambda x: F.round(x.cast("double") * 1e3)
                    .cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    q = emb.select("vec_id", sq.alias("sq_norm"))
    med = q.agg(F.expr("percentile(sq_norm, 0.5)").alias("med"))
    dev = (q.crossJoin(F.broadcast(med))
           .withColumn("ad", F.abs(F.col("sq_norm") - F.col("med"))))
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (dev.crossJoin(F.broadcast(mad))
            .where(F.col("ad") > 3 * F.col("mad"))
            .select("vec_id", "sq_norm", F.col("ad").alias("abs_dev")))


_NORM_OUTLIER_ORACLE = """
WITH q AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(embedding, x ->
              CAST(round(CAST(x AS DOUBLE) * 1e3) AS BIGINT)
              * CAST(round(CAST(x AS DOUBLE) * 1e3) AS BIGINT)))
              AS BIGINT) AS sq_norm
  FROM embeddings),
med AS (SELECT quantile_cont(sq_norm, 0.5) AS med FROM q),
dev AS (SELECT vec_id, sq_norm, abs(sq_norm - med) AS ad FROM q, med),
mad AS (SELECT quantile_cont(ad, 0.5) AS mad FROM dev)
SELECT vec_id, sq_norm, ad AS abs_dev
FROM dev, mad WHERE ad > 3 * mad
"""


def q_seasonal_decomposition(spark, sf_dir):
    """Additive weekday seasonality of daily revenue, classically
    decomposed: centered 7-day moving average as trend, per-weekday
    mean residual as the seasonal index.  EXACT integer path: daily
    cents are longs, the ×7-scaled residual (7·rev − Σ₇) avoids the
    division, and the single double division happens once per weekday
    group.  Full-window days only (count = 7) so edges don't bias."""
    from pyspark.sql import Window as W
    o = load_tables(spark, sf_dir)["orders"]
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                         * 100).cast("long")).alias("rev")))
    w = W.orderBy("day").rowsBetween(-3, 3)
    t = (daily.withColumn("s7", F.sum("rev").over(w))
         .withColumn("n7", F.count("*").over(w))
         .where(F.col("n7") == 7)
         .withColumn("resid7", 7 * F.col("rev") - F.col("s7")))
    return (t.groupBy(F.expr("weekday(day)").alias("wd"))
            .agg(F.count("*").alias("n_days"),
                 F.round(F.sum("resid7") / (7.0 * F.count("*")), 4)
                 .alias("seasonal_cents")))


_SEASONAL_DECOMP_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
t AS (
  SELECT day, rev,
         SUM(rev) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS s7,
         COUNT(*) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS n7
  FROM daily)
SELECT isodow(day) - 1 AS wd, COUNT(*) AS n_days,
       round(SUM(7 * rev - s7) / (7.0 * COUNT(*)), 4)
         AS seasonal_cents
FROM t WHERE n7 = 7 GROUP BY 1
"""


def q_discount_qty_heatmap(spark, sf_dir):
    """2-D pricing heatmap: line count and mean revenue per
    (discount %, quantity decile-bucket) cell — the margin surface
    behind q:price_elasticity.  Exact integer bins, DECIMAL cent
    sums, one map-side-combinable groupBy of ≤ 55 cells."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.round(F.col("l_discount") * 100).cast("int").alias("disc_pct"),
        (F.least(F.col("l_quantity").cast("int") - 1, F.lit(49)) / 10)
        .cast("int").alias("qty_bucket"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    return (li.groupBy("disc_pct", "qty_bucket")
            .agg(F.count("*").alias("n_lines"),
                 F.round(F.sum("cents") / (100.0 * F.count("*")), 4)
                 .alias("mean_revenue")))


_HEATMAP_ORACLE = """
WITH li AS (
  SELECT CAST(round(l_discount * 100) AS INT) AS disc_pct,
         CAST(least(CAST(l_quantity AS INT) - 1, 49) // 10 AS INT)
           AS qty_bucket,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM lineitem)
SELECT disc_pct, qty_bucket, COUNT(*) AS n_lines,
       round(SUM(cents) / (100.0 * COUNT(*)), 4) AS mean_revenue
FROM li GROUP BY 1, 2
"""


def q_equi_depth_bounds(spark, sf_dir):
    """Equi-depth range-partition boundaries: the 15 interior
    16-quantiles of order value in exact cents — what a terasort-shaped
    range partitioner (cf. q:global_shuffle, q:exact_median_terasort)
    feeds its partitioner at scale.  Spark's exact ``percentile``
    aggregate == DuckDB ``quantile_cont``: linear interpolation on
    integer cents is .5-grained and engine-exact, so no rounding is
    needed."""
    o = load_tables(spark, sf_dir)["orders"].select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    fr = [i / 16.0 for i in range(1, 16)]
    pct = o.agg(F.expr(
        "percentile(cents, array({}))".format(
            ", ".join(repr(f) for f in fr))).alias("b"))
    return (pct.select(F.posexplode("b").alias("q16", "boundary_cents"))
            .select((F.col("q16") + 1).alias("q16"), "boundary_cents"))


_EQUI_DEPTH_ORACLE = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
pct AS (
  SELECT quantile_cont(cents, [{fracs}]) AS b FROM o)
SELECT CAST(i AS INT) AS q16, b[CAST(i AS INT)] AS boundary_cents
FROM pct, range(1, 16) t(i)
""".format(fracs=", ".join(repr(i / 16.0) for i in range(1, 16)))


def q_lateness_audit(spark, sf_dir):
    """Streaming watermark audit replayed over the batch log: events
    arrive in event_id order; an event is 'late' when its event time
    lags the running max seen so far by > 10 minutes (i.e. a 10-min
    watermark would have dropped it).  Per event-type: late share and
    max observed lag — the number that sizes
    ``withWatermark`` before deploying the streaming job.  One
    running-max window over arrival order, one groupBy; exact integer
    seconds."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", F.col("ts").cast("long").alias("t"))
    w = (W.orderBy("event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    lag = F.greatest(F.max("t").over(w) - F.col("t"), F.lit(0))
    return (ev.withColumn("lag_s", lag)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum((F.col("lag_s") > 600).cast("int"))
                 .alias("n_late"),
                 F.round(F.sum((F.col("lag_s") > 600).cast("int"))
                         / F.count("*"), 6).alias("late_share"),
                 F.max("lag_s").alias("max_lag_s")))


_LATENESS_ORACLE = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events),
lagged AS (
  SELECT event_type,
         greatest(MAX(t) OVER (ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) - t, 0)
           AS lag_s
  FROM ev)
SELECT event_type, COUNT(*) AS n_events,
       SUM(CASE WHEN lag_s > 600 THEN 1 ELSE 0 END) AS n_late,
       round(SUM(CASE WHEN lag_s > 600 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS late_share,
       MAX(lag_s) AS max_lag_s
FROM lagged GROUP BY 1
"""


def q_id_gaps(spark, sf_dir):
    """Gaps-and-islands over the FINISHED-order key sequence (the
    fixture's full key space is dense, so islands are carved by
    status): contiguous runs found by the key − row_number
    constant-difference trick (one sort, no self-join), gaps read off
    consecutive island borders.  Top 20 widest gaps, ties by start
    key.  Exact integers."""
    from pyspark.sql import Window as W
    o = (load_tables(spark, sf_dir)["orders"]
         .where(F.col("o_orderstatus") == "F")
         .select(F.col("o_orderkey").alias("k")).distinct())
    grp = (F.col("k")
           - F.row_number().over(W.orderBy("k"))).alias("g")
    islands = (o.withColumn("g", grp)
               .groupBy("g")
               .agg(F.min("k").alias("run_start"),
                    F.max("k").alias("run_end")))
    w2 = W.orderBy("run_start")
    return (islands
            .withColumn("next_start", F.lead("run_start").over(w2))
            .where(F.col("next_start").isNotNull())
            .select((F.col("run_end") + 1).alias("gap_start"),
                    (F.col("next_start") - 1).alias("gap_end"),
                    (F.col("next_start") - F.col("run_end") - 1)
                    .alias("gap_len"))
            .orderBy(F.col("gap_len").desc(), F.col("gap_start"))
            .limit(20))


_ID_GAPS_ORACLE = """
WITH o AS (SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE o_orderstatus = 'F'),
isl AS (
  SELECT k, k - row_number() OVER (ORDER BY k) AS g FROM o),
islands AS (
  SELECT g, MIN(k) AS run_start, MAX(k) AS run_end
  FROM isl GROUP BY 1),
gaps AS (
  SELECT run_end + 1 AS gap_start,
         lead(run_start) OVER (ORDER BY run_start) - 1 AS gap_end,
         lead(run_start) OVER (ORDER BY run_start) - run_end - 1
           AS gap_len
  FROM islands)
SELECT gap_start, gap_end, gap_len
FROM gaps WHERE gap_end IS NOT NULL
ORDER BY gap_len DESC, gap_start LIMIT 20
"""


def q_newsvendor_stock(spark, sf_dir):
    """Newsvendor stocking level per brand at critical ratio 0.75
    (binary-exact fraction — the interpolated quantile stays
    engine-exact on integer daily demand), with expected per-day
    shortage and leftover units against that level.  Demand days
    aggregate exactly (longs); the quantile interpolation grain is
    .25 so every comparison and sum below is IEEE-exact — no
    rounding anywhere."""
    t = load_tables(spark, sf_dir)
    d = (t["lineitem"]
         .join(F.broadcast(t["part"].select("p_partkey", "p_brand")),
               F.col("l_partkey") == F.col("p_partkey"))
         .groupBy(F.col("p_brand").alias("brand"),
                  F.col("l_shipdate").cast("date").alias("day"))
         .agg(F.sum(F.col("l_quantity").cast("long")).alias("q")))
    lvl = (d.groupBy("brand")
           .agg(F.expr("percentile(q, 0.75)").alias("stock_level"),
                F.count("*").alias("n_days")))
    j = d.join(lvl, "brand")
    return (j.groupBy("brand")
            .agg(F.max("stock_level").alias("stock_level"),
                 F.max("n_days").alias("n_days"),
                 (F.sum(F.greatest(F.col("q") - F.col("stock_level"),
                                   F.lit(0.0))) / F.max("n_days"))
                 .alias("mean_shortage"),
                 (F.sum(F.greatest(F.col("stock_level") - F.col("q"),
                                   F.lit(0.0))) / F.max("n_days"))
                 .alias("mean_leftover")))


_NEWSVENDOR_ORACLE = """
WITH d AS (
  SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2),
lvl AS (
  SELECT brand, quantile_cont(q, 0.75) AS stock_level,
         COUNT(*) AS n_days
  FROM d GROUP BY 1)
SELECT d.brand, MAX(stock_level) AS stock_level,
       MAX(n_days) AS n_days,
       SUM(greatest(q - stock_level, 0.0)) / MAX(n_days)
         AS mean_shortage,
       SUM(greatest(stock_level - q, 0.0)) / MAX(n_days)
         AS mean_leftover
FROM d JOIN lvl ON d.brand = lvl.brand
GROUP BY 1
"""


def q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch guardrail: users hash-split 50/50 by the
    engine's portable assignment hash (md5 first hex nibble), one
    chi-square GOF statistic per event type + flag vs the 3.841
    critical value (α = .05, df = 1).  The same deterministic
    assignment both engines replay bit-for-bit — the pre-analysis
    sanity check every experimentation platform runs."""
    ev = (_events(spark, sf_dir)
          .select("event_type", "user_id").distinct()
          .withColumn("arm", (F.substring(
              F.md5(F.col("user_id").cast("string")), 1, 1)
              .isin(*"01234567")).cast("int")))
    g = (ev.groupBy("event_type")
         .agg(F.sum("arm").alias("na"),
              F.sum(1 - F.col("arm")).alias("nb")))
    chi = ((F.col("na") - F.col("nb"))
           * (F.col("na") - F.col("nb"))
           / (F.col("na") + F.col("nb")).cast("double"))
    return g.select("event_type", "na", "nb",
                    F.round(chi, 6).alias("chi2"),
                    (chi > 3.841).cast("int").alias("srm_flag"))


_SRM_ORACLE = """
WITH ev AS (
  SELECT DISTINCT event_type, user_id FROM events),
armed AS (
  SELECT event_type,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE 0 END AS arm
  FROM ev),
g AS (
  SELECT event_type, SUM(arm) AS na, SUM(1 - arm) AS nb
  FROM armed GROUP BY 1)
SELECT event_type, na, nb,
       round((na - nb) * (na - nb) / CAST(na + nb AS DOUBLE), 6)
         AS chi2,
       CASE WHEN (na - nb) * (na - nb) / CAST(na + nb AS DOUBLE)
                 > 3.841 THEN 1 ELSE 0 END AS srm_flag
FROM g
"""


def q_power_analysis(spark, sf_dir):
    """A/B test sizing per market segment: observed baseline
    conversion (share of customers with ≥ 10 orders — mid-range at
    every SF since orders/customer is scale-invariant) + required n
    per arm to detect a 2-point absolute lift at α = .05 / power = .8
    — the two-proportion closed form with shared z literals.  sqrt is
    IEEE-correctly-rounded (unlike ln/exp), so the double algebra is
    engine-exact before the final rounding."""
    t = load_tables(spark, sf_dir)
    buyers = (t["orders"].groupBy("o_custkey").agg(F.count("*").alias("no"))
              .where(F.col("no") >= 10).select("o_custkey"))
    c = (t["customer"]
         .join(buyers, F.col("c_custkey") == F.col("o_custkey"), "left")
         .groupBy("c_mktsegment")
         .agg(F.count("*").alias("n_customers"),
              F.sum(F.col("o_custkey").isNotNull().cast("int"))
              .alias("n_buyers")))
    p1 = F.col("n_buyers") / F.col("n_customers").cast("double")
    p2 = p1 + 0.02
    pbar = (p1 + p2) / 2
    za, zb = 1.959963984540054, 0.8416212335729143
    num = (za * F.sqrt(2 * pbar * (1 - pbar))
           + zb * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
    n_req = F.ceil(num * num / (0.02 * 0.02))
    return c.select("c_mktsegment", "n_customers",
                    F.round(p1, 6).alias("baseline_rate"),
                    n_req.cast("long").alias("n_per_arm"))


_POWER_ORACLE = """
WITH buyers AS (SELECT o_custkey FROM orders GROUP BY 1
                HAVING COUNT(*) >= 10),
c AS (
  SELECT c_mktsegment, COUNT(*) AS n_customers,
         SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
           AS n_buyers
  FROM customer LEFT JOIN buyers ON c_custkey = o_custkey
  GROUP BY 1),
p AS (
  SELECT c_mktsegment, n_customers,
         n_buyers / CAST(n_customers AS DOUBLE) AS p1
  FROM c),
num AS (
  SELECT c_mktsegment, n_customers, p1,
         1.959963984540054
           * sqrt(2 * ((p1 + (p1 + 0.02)) / 2)
                  * (1 - (p1 + (p1 + 0.02)) / 2))
         + 0.8416212335729143
           * sqrt(p1 * (1 - p1) + (p1 + 0.02) * (1 - (p1 + 0.02)))
           AS z
  FROM p)
SELECT c_mktsegment, n_customers, round(p1, 6) AS baseline_rate,
       CAST(ceil(z * z / (0.02 * 0.02)) AS BIGINT) AS n_per_arm
FROM num
"""


def q_hypergeom_enrichment(spark, sf_dir):
    """Market-basket enrichment screen: (nation, brand) cells whose
    purchase-line count deviates from the hypergeometric expectation
    by |z| > 2 — the over/under-representation test run on feature
    co-occurrence.  All counts exact integers; mean/variance algebra
    in doubles with an identical operation order on both engines
    (sqrt only — IEEE-exact)."""
    t = load_tables(spark, sf_dir)
    li = (t["lineitem"]
          .join(F.broadcast(t["part"].select("p_partkey", "p_brand")),
                F.col("l_partkey") == F.col("p_partkey"))
          .join(t["orders"].select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .join(F.broadcast(t["customer"]
                            .select("c_custkey", "c_nationkey")),
                F.col("o_custkey") == F.col("c_custkey"))
          .select(F.col("c_nationkey").alias("nation"),
                  F.col("p_brand").alias("brand")))
    cell = li.groupBy("nation", "brand").agg(F.count("*").alias("k"))
    byn = li.groupBy(F.col("nation").alias("n1")).agg(
        F.count("*").alias("n"))
    byb = li.groupBy(F.col("brand").alias("b1")).agg(
        F.count("*").alias("kk"))
    tot = li.agg(F.count("*").alias("nn"))
    j = (cell.join(F.broadcast(byn), F.col("nation") == F.col("n1"))
         .join(F.broadcast(byb), F.col("brand") == F.col("b1"))
         .crossJoin(F.broadcast(tot)))
    m = (F.col("n") * F.col("kk")).cast("double") / F.col("nn")
    frac = F.col("kk") / F.col("nn").cast("double")
    var = (m * (1 - frac)
           * ((F.col("nn") - F.col("n"))
              / (F.col("nn") - F.lit(1.0))))
    z = (F.col("k") - m) / F.sqrt(var)
    return (j.withColumn("z", z)
            .where(F.abs(F.col("z")) > 2)
            .select("nation", "brand", "k", F.round("z", 6).alias("z")))


_HYPERGEOM_ORACLE = """
WITH li AS (
  SELECT c_nationkey AS nation, p_brand AS brand
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey),
cell AS (SELECT nation, brand, COUNT(*) AS k FROM li GROUP BY 1, 2),
byn AS (SELECT nation AS n1, COUNT(*) AS n FROM li GROUP BY 1),
byb AS (SELECT brand AS b1, COUNT(*) AS kk FROM li GROUP BY 1),
tot AS (SELECT COUNT(*) AS nn FROM li),
j AS (
  SELECT nation, brand, k, n, kk, nn,
         CAST(n * kk AS DOUBLE) / nn AS m,
         kk / CAST(nn AS DOUBLE) AS frac
  FROM cell
  JOIN byn ON nation = n1
  JOIN byb ON brand = b1, tot),
zz AS (
  SELECT nation, brand, k,
         (k - m) / sqrt(m * (1 - frac) * ((nn - n) / (nn - 1.0)))
           AS z
  FROM j)
SELECT nation, brand, k, round(z, 6) AS z
FROM zz WHERE abs(z) > 2
"""


def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization of document lengths across sources
    (the batch-effect-removal classic): each source's rank-r value is
    replaced by the pooled value at the proportional pooled rank
    ceil(r·N/Ns), then summarized as a per-(source, decile) mean.
    Deterministic total orders everywhere (ties by doc_id); exact
    integer ranks and sums, one double division at the end."""
    from pyspark.sql import Window as W
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    pooled = (d.select("n_chars", "doc_id")
              .withColumn("pr", F.row_number().over(
                  W.orderBy("n_chars", "doc_id")))
              .select(F.col("pr").alias("target_rank"),
                      F.col("n_chars").alias("norm_value")))
    n_tot = d.count()
    per = (d.withColumn("rs", F.row_number().over(
        W.partitionBy("source").orderBy("n_chars", "doc_id")))
        .withColumn("ns", F.count("*").over(W.partitionBy("source"))))
    mapped = per.withColumn(
        "target_rank",
        F.ceil(F.col("rs") * F.lit(n_tot) / F.col("ns")).cast("int"))
    out = mapped.join(F.broadcast(pooled), "target_rank")
    dec = (F.ceil(F.col("rs") * 10 / F.col("ns"))).cast("int")
    return (out.withColumn("decile", dec)
            .groupBy("source", "decile")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("norm_value") / F.count("*"), 4)
                 .alias("mean_norm_chars")))


_QNORM_ORACLE = """
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
pooled AS (
  SELECT row_number() OVER (ORDER BY n_chars, doc_id) AS target_rank,
         n_chars AS norm_value
  FROM d),
tot AS (SELECT COUNT(*) AS n_tot FROM d),
per AS (
  SELECT source,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rs,
         COUNT(*) OVER (PARTITION BY source) AS ns
  FROM d),
mapped AS (
  SELECT source, rs, ns,
         CAST(ceil(rs * n_tot * 1.0 / ns) AS INT) AS target_rank
  FROM per, tot)
SELECT source, CAST(ceil(rs * 10.0 / ns) AS INT) AS decile,
       COUNT(*) AS n,
       round(SUM(norm_value) * 1.0 / COUNT(*), 4) AS mean_norm_chars
FROM mapped JOIN pooled USING (target_rank)
GROUP BY 1, 2
"""


def q_gains_curve(spark, sf_dir):
    """Cumulative gains chart: customers ranked by account balance
    (the 'model score'), per score-decile the cumulative share of all
    ORDERS captured — how well the score targets actual activity
    (contrast q:lorenz_curve, which ranks by the outcome itself).
    Exact integers, one division per row."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    cnt = (t["orders"].groupBy("o_custkey")
           .agg(F.count("*").alias("n_orders")))
    c = (t["customer"]
         .join(cnt, F.col("c_custkey") == F.col("o_custkey"), "left")
         .select("c_custkey", "c_acctbal",
                 F.coalesce("n_orders", F.lit(0)).alias("n_orders")))
    d = c.withColumn("decile", F.ntile(10).over(
        W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))))
    per = (d.groupBy("decile")
           .agg(F.sum("n_orders").alias("captured"),
                F.count("*").alias("n_customers")))
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding,
                                        W.currentRow)
    tot = per.agg(F.sum("captured").alias("t"))
    return (per.withColumn("cum", F.sum("captured").over(w))
            .crossJoin(F.broadcast(tot))
            .select("decile", "n_customers", "captured",
                    F.round(F.col("cum") / F.col("t"), 6)
                    .alias("cum_gain")))


_GAINS_ORACLE = """
WITH cnt AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
c AS (
  SELECT c_custkey, c_acctbal, COALESCE(n_orders, 0) AS n_orders
  FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
d AS (
  SELECT n_orders,
         ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey)
           AS decile
  FROM c),
per AS (
  SELECT decile, SUM(n_orders) AS captured,
         COUNT(*) AS n_customers
  FROM d GROUP BY 1),
tot AS (SELECT SUM(captured) AS t FROM per)
SELECT decile, n_customers, captured,
       round(SUM(captured) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING)
             * 1.0 / t, 6) AS cum_gain
FROM per, tot
"""


def q_quality_rule_breakdown(spark, sf_dir):
    """Per-rule attrition report for the Gopher-style quality gate
    (q:quality_filter): how many documents fail each rule, and how
    many fail ONLY that rule — the number that tells a pipeline owner
    which rule to tune.  One pass over the corpus, 4-row output."""
    from .operators.pipeline import quality_filter
    qf = quality_filter(_docs(spark, sf_dir))
    rules = ["ok_tokens", "ok_avg_len", "ok_symbols", "ok_stopwords"]
    n_ok = sum(F.col(r).cast("int") for r in rules)
    base = qf.select(*rules, n_ok.alias("n_ok"))
    rows = [
        base.select(
            F.lit(r).alias("rule"),
            (~F.col(r)).cast("int").alias("fail"),
            ((~F.col(r)) & (F.col("n_ok") == 3)).cast("int")
            .alias("sole"))
        for r in rules]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return (u.groupBy("rule")
            .agg(F.sum("fail").alias("n_fail"),
                 F.sum("sole").alias("n_sole_fail")))


_QUALITY_BREAKDOWN_ORACLE = """
WITH t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x != '') AS toks
  FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n,
    length(array_to_string(toks, ''))
      / greatest(len(toks), 1) AS avg_len,
    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
      / greatest(length(text), 1) AS sym_ratio,
    len(list_filter(toks, x -> list_contains(
      ['the','a','of','and','to','in','is','for','on','with'], x)))
      AS sw_hits
  FROM t),
f AS (
  SELECT (n >= 20 AND n <= 100000) AS ok_tokens,
         (avg_len >= 2.0 AND avg_len <= 12.0) AS ok_avg_len,
         (sym_ratio <= 0.10) AS ok_symbols,
         (sw_hits >= 2) AS ok_stopwords
  FROM m),
g AS (
  SELECT *, CAST(ok_tokens AS INT) + CAST(ok_avg_len AS INT)
            + CAST(ok_symbols AS INT) + CAST(ok_stopwords AS INT)
            AS n_ok
  FROM f)
SELECT 'ok_tokens' AS rule,
       SUM(CASE WHEN NOT ok_tokens THEN 1 ELSE 0 END) AS n_fail,
       SUM(CASE WHEN NOT ok_tokens AND n_ok = 3 THEN 1 ELSE 0 END)
         AS n_sole_fail FROM g
UNION ALL
SELECT 'ok_avg_len',
       SUM(CASE WHEN NOT ok_avg_len THEN 1 ELSE 0 END),
       SUM(CASE WHEN NOT ok_avg_len AND n_ok = 3 THEN 1 ELSE 0 END)
FROM g
UNION ALL
SELECT 'ok_symbols',
       SUM(CASE WHEN NOT ok_symbols THEN 1 ELSE 0 END),
       SUM(CASE WHEN NOT ok_symbols AND n_ok = 3 THEN 1 ELSE 0 END)
FROM g
UNION ALL
SELECT 'ok_stopwords',
       SUM(CASE WHEN NOT ok_stopwords THEN 1 ELSE 0 END),
       SUM(CASE WHEN NOT ok_stopwords AND n_ok = 3 THEN 1 ELSE 0 END)
FROM g
"""


def q_token_length_histogram(spark, sf_dir):
    """Power-of-two token-length histogram per source (the context-
    window sizing chart): bucket = floor(log2(n_tokens)) computed by
    the exact bit-length trick (length(bin(n)) − 1 — no libm log near
    power boundaries).  One narrow pass + 2-key groupBy."""
    from .operators.text import tokens
    d = _docs(spark, sf_dir).select(
        "source",
        F.greatest(F.size(tokens(F.col("text"))), F.lit(1)).alias("n"))
    b = (F.length(F.expr("bin(n)")) - 1).alias("log2_bucket")
    return (d.select("source", b)
            .groupBy("source", "log2_bucket")
            .agg(F.count("*").alias("n_docs")))


_TOKEN_HIST_ORACLE = """
WITH d AS (
  SELECT source,
         greatest(len(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> x != '')), 1) AS n
  FROM documents)
SELECT source, CAST(length(bin(n)) - 1 AS INT) AS log2_bucket,
       COUNT(*) AS n_docs
FROM d GROUP BY 1, 2
"""


def q_pack_efficiency_curve(spark, sf_dir):
    """Concat-and-chunk packing audit across context-window sizes
    (512..8192): shards needed, tail-padding utilization, and how
    many documents straddle a shard boundary (get split) — the curve
    that picks a training context length.  Doc order is fixed
    (doc_id); cumulative token offsets via one window; all integers
    exact."""
    from pyspark.sql import Window as W
    from .operators.text import tokens
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n"))
    w = (W.orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = (d.withColumn("endo", F.sum("n").over(w))
         .withColumn("starto", F.col("endo") - F.col("n")))
    sizes = spark.createDataFrame([(512,), (1024,), (2048,), (4096,),
                                   (8192,)], "window_size int")
    j = c.crossJoin(F.broadcast(sizes))
    split = (F.floor(F.col("starto") / F.col("window_size"))
             != F.floor((F.col("endo") - 1) / F.col("window_size")))
    return (j.groupBy("window_size")
            .agg(F.max("endo").alias("total_tokens"),
                 F.ceil(F.max("endo") / F.col("window_size").cast("double"))
                 .cast("long").alias("n_shards"),
                 F.sum(split.cast("int")).alias("n_docs_split"),
                 F.round(F.max("endo")
                         / (F.ceil(F.max("endo")
                                   / F.col("window_size").cast("double"))
                            * F.col("window_size")), 6)
                 .alias("utilization"))
            .select("window_size", "total_tokens", "n_shards",
                    "n_docs_split", "utilization"))


_PACK_CURVE_ORACLE = """
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x != '')) AS n
  FROM documents),
c AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           AS endo
  FROM d),
cc AS (SELECT doc_id, n, endo, endo - n AS starto FROM c),
ws(window_size) AS (VALUES (512), (1024), (2048), (4096), (8192))
SELECT window_size,
       MAX(endo) AS total_tokens,
       CAST(ceil(MAX(endo) / CAST(window_size AS DOUBLE)) AS BIGINT)
         AS n_shards,
       SUM(CASE WHEN (starto // window_size)
                     <> ((endo - 1) // window_size)
                THEN 1 ELSE 0 END) AS n_docs_split,
       round(MAX(endo)
             / (ceil(MAX(endo) / CAST(window_size AS DOUBLE))
                * window_size), 6) AS utilization
FROM cc, ws GROUP BY 1
"""


def q_lang_confusion(spark, sf_dir):
    """Full confusion matrix of the engine's stopword-vote language
    identifier against the corpus labels — the cell-level detail
    behind q:kappa_langid's single-number summary.  Exact counts +
    per-true-row share."""
    from pyspark.sql import Window as W
    guessed = text.language_id(_docs(spark, sf_dir)) \
        .select("lang", "lang_guess")
    conf = (guessed.groupBy("lang", "lang_guess")
            .agg(F.count("*").alias("n")))
    row_tot = F.sum("n").over(W.partitionBy("lang"))
    return conf.select("lang", "lang_guess", "n",
                       F.round(F.col("n") / row_tot, 6)
                       .alias("row_share"))


def _lang_confusion_oracle_sql() -> str:
    return f"""
WITH guesses AS ({ORACLES["language_id"]}),
conf AS (
  SELECT d.lang, g.lang_guess, COUNT(*) AS n
  FROM guesses g JOIN documents d USING (doc_id)
  GROUP BY 1, 2)
SELECT lang, lang_guess, n,
       round(n * 1.0 / SUM(n) OVER (PARTITION BY lang), 6)
         AS row_share
FROM conf
"""


def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary audit of the hash-banded holdout split: for
    val and test, the share of token TYPES and of token OCCURRENCES
    absent from the train-split vocabulary — the split-health number
    that predicts eval perplexity inflation.  Vocabulary membership
    via one left join on the token key; exact integers."""
    from .operators.pipeline import train_val_test_split
    d = train_val_test_split(_docs(spark, sf_dir), "doc_id").select(
        "split", F.explode(text.tokens(F.col("text"))).alias("tok"))
    vocab = (d.where(F.col("split") == "train")
             .select("tok").distinct().withColumn("hit", F.lit(1)))
    rest = d.where(F.col("split") != "train")
    occ = (rest.join(vocab, "tok", "left")
           .groupBy("split")
           .agg(F.count("*").alias("n_tokens"),
                F.sum(F.col("hit").isNull().cast("int"))
                .alias("n_oov_tokens")))
    types = (rest.select("split", "tok").distinct()
             .join(vocab, "tok", "left")
             .groupBy(F.col("split").alias("s2"))
             .agg(F.count("*").alias("n_types"),
                  F.sum(F.col("hit").isNull().cast("int"))
                  .alias("n_oov_types")))
    return (occ.join(types, F.col("split") == F.col("s2"))
            .select("split", "n_types", "n_oov_types",
                    F.round(F.col("n_oov_types") / F.col("n_types"), 6)
                    .alias("type_oov_rate"),
                    "n_tokens", "n_oov_tokens",
                    F.round(F.col("n_oov_tokens") / F.col("n_tokens"), 6)
                    .alias("token_oov_rate")))


_OOV_ORACLE = """
WITH d AS (
  SELECT CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                < printf('%04x', CAST(ceil(0.05 * 65536) AS INT))
             THEN 'val'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                < printf('%04x', CAST(ceil(0.10 * 65536) AS INT))
             THEN 'test'
           ELSE 'train'
         END AS split,
         unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> x != '')) AS tok
  FROM documents),
vocab AS (
  SELECT DISTINCT tok, 1 AS hit FROM d WHERE split = 'train'),
rest AS (SELECT split, tok FROM d WHERE split <> 'train'),
occ AS (
  SELECT split, COUNT(*) AS n_tokens,
         SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS n_oov_tokens
  FROM rest LEFT JOIN vocab USING (tok) GROUP BY 1),
ty AS (
  SELECT split, COUNT(*) AS n_types,
         SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS n_oov_types
  FROM (SELECT DISTINCT split, tok FROM rest)
  LEFT JOIN vocab USING (tok) GROUP BY 1)
SELECT occ.split, n_types, n_oov_types,
       round(n_oov_types * 1.0 / n_types, 6) AS type_oov_rate,
       n_tokens, n_oov_tokens,
       round(n_oov_tokens * 1.0 / n_tokens, 6) AS token_oov_rate
FROM occ JOIN ty ON occ.split = ty.split
"""


def q_split_leakage_check(spark, sf_dir):
    """Split-leakage audit: MinHash near-dup candidate pairs that
    straddle the train/holdout boundary — the contamination
    q:grouped_split exists to prevent, quantified on the naive
    doc-hash split.  One broadcast of the (tiny) split map onto the
    LSH pair stream."""
    from .operators.pipeline import train_val_test_split
    docs = _docs(spark, sf_dir)
    pairs = QUERIES["minhash_pairs"](spark, sf_dir)
    sp = train_val_test_split(docs, "doc_id").select("doc_id", "split")
    j = (pairs
         .join(sp.select(F.col("doc_id").alias("id_a"),
                         F.col("split").alias("split_a")), "id_a")
         .join(sp.select(F.col("doc_id").alias("id_b"),
                         F.col("split").alias("split_b")), "id_b"))
    leak = ((F.col("split_a") == "train")
            != (F.col("split_b") == "train")).cast("int")
    return (j.agg(F.count("*").alias("n_candidate_pairs"),
                  F.sum(leak).alias("n_leaking_pairs"),
                  F.round(F.sum(leak) / F.count("*"), 6)
                  .alias("leak_share")))


def _split_leakage_oracle_sql() -> str:
    return f"""
WITH pairs AS ({ORACLES["minhash_pairs"]}),
sp AS (
  SELECT doc_id,
         CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                < printf('%04x', CAST(ceil(0.05 * 65536) AS INT))
             THEN 'val'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                < printf('%04x', CAST(ceil(0.10 * 65536) AS INT))
             THEN 'test'
           ELSE 'train'
         END AS split
  FROM documents),
j AS (
  SELECT CASE WHEN (a.split = 'train') <> (b.split = 'train')
              THEN 1 ELSE 0 END AS leak
  FROM pairs
  JOIN sp a ON pairs.id_a = a.doc_id
  JOIN sp b ON pairs.id_b = b.doc_id)
SELECT COUNT(*) AS n_candidate_pairs,
       SUM(leak) AS n_leaking_pairs,
       round(SUM(leak) * 1.0 / COUNT(*), 6) AS leak_share
FROM j
"""


def q_shingle_df_histogram(spark, sf_dir):
    """LSH capacity-planning audit: document-frequency histogram of
    3-token shingles in power-of-two buckets (exact bit-length trick,
    no libm log) — the df tail predicts MinHash bucket blowups before
    you run the join (cf. the max_bucket guard in dedup.py).  Shingles
    hash-group once; documents never pair."""
    docs = _docs(spark, sf_dir)
    ws = text.tokens(F.col("text"))
    sh = F.transform(
        F.sequence(F.lit(1), F.size("_ws") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("_ws", i), F.element_at("_ws", i + 1),
            F.element_at("_ws", i + 2)))
    df_counts = (docs.select("doc_id", ws.alias("_ws"))
                 .where(F.size("_ws") >= 3)
                 .select("doc_id", F.explode(sh).alias("g"))
                 .distinct()
                 .groupBy("g").agg(F.count("*").alias("df")))
    b = (F.length(F.expr("bin(df)")) - 1).alias("log2_df")
    return (df_counts.select(b)
            .groupBy("log2_df")
            .agg(F.count("*").alias("n_shingles")))


_SHINGLE_DF_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM toks WHERE len(ws) >= 3),
dfc AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY 1)
SELECT CAST(length(bin(df)) - 1 AS INT) AS log2_df,
       COUNT(*) AS n_shingles
FROM dfc GROUP BY 1
"""


def q_ahash_near_dup(spark, sf_dir):
    """NEAR-duplicate image pairs by perceptual hash: the 64-bit ahash
    (REAL PNG decode on the engine side, q:ahash_groups) banded into
    4×16-bit substrings — same-band candidates only, then exact
    Hamming ≤ 6 verify.  The banded join is the scale story (no
    all-pairs); the oracle recomputes the closed-form hash and replays
    band + verify."""
    from .operators.multimodal import ahash, documents_as_media
    pngs = _docs(spark, sf_dir).where(F.col("doc_id") % 3 == 1)
    h = ahash(documents_as_media(pngs)).select("media_id", "ahash") \
        .localCheckpoint(eager=True)
    bands = h.select(
        "media_id", "ahash",
        F.explode(F.array(*[
            F.concat(F.lit(str(i)), F.lit(":"),
                     F.substring("ahash", i * 16 + 1, 16))
            for i in range(4)])).alias("band"))
    a = bands.select(F.col("media_id").alias("id_a"),
                     F.col("ahash").alias("ha"), "band")
    b = bands.select(F.col("media_id").alias("id_b"),
                     F.col("ahash").alias("hb"), "band")
    cand = (a.join(b, ["band"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "hb").distinct())
    ham = F.expr("size(filter(sequence(1, 64), "
                 "i -> substr(ha, i, 1) != substr(hb, i, 1)))")
    return (cand.withColumn("hamming", ham)
            .where(F.col("hamming") <= 6)
            .select("id_a", "id_b", "hamming"))


_AHASH_NEAR_DUP_ORACLE = """
WITH dims AS (
  SELECT doc_id AS media_id,
         4 + n_chars % 60 AS w, 4 + (n_chars // 7) % 60 AS h
  FROM documents WHERE doc_id % 3 = 1),
cells AS (
  SELECT media_id,
         ty.y AS y, tx.x AS x,
         ((((tx.x * w) // 8) * 3 + ((ty.y * h) // 8)) % 256) AS px
  FROM dims, UNNEST(range(0, 8)) AS ty(y), UNNEST(range(0, 8)) AS tx(x)),
hashes AS (
  SELECT media_id,
         string_agg(CASE WHEN px * 64 > tot THEN '1' ELSE '0' END,
                    '' ORDER BY y, x) AS ahash
  FROM (SELECT media_id, y, x, px,
               SUM(px) OVER (PARTITION BY media_id) AS tot
        FROM cells)
  GROUP BY media_id),
bands AS (
  SELECT media_id, ahash,
         CAST(i AS VARCHAR) || ':'
           || substr(ahash, CAST(i AS INT) * 16 + 1, 16) AS band
  FROM hashes, UNNEST(range(0, 4)) AS t(i)),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.media_id < b.media_id),
ham AS (
  SELECT id_a, id_b,
         len(list_filter(range(1, 65),
             i -> substr(ha, CAST(i AS INT), 1)
                  <> substr(hb, CAST(i AS INT), 1))) AS hamming
  FROM cand)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
FROM ham WHERE hamming <= 6
"""


def q_qq_year_compare(spark, sf_dir):
    """Q-Q table of order values, 1996 vs 1997: both years' exact
    16-quantile ladders side by side with the quantile ratio — the
    distribution-shift diagnostic that shows WHERE two samples differ
    (q:ks_statistic only says how much).  Binary-exact fractions
    (k/16) keep the interpolation engine-exact; cents are integers."""
    o = load_tables(spark, sf_dir)["orders"].select(
        F.year(F.col("o_orderdate")).alias("yr"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    fr = ", ".join(repr(i / 16.0) for i in range(1, 16))
    q = (o.where(F.col("yr").isin(1996, 1997))
         .groupBy("yr")
         .agg(F.expr(f"percentile(cents, array({fr}))").alias("b")))
    e = q.select("yr", F.posexplode("b").alias("q16", "v")) \
        .select("yr", (F.col("q16") + 1).alias("q16"), "v")
    a = e.where(F.col("yr") == 1996).select("q16",
                                            F.col("v").alias("v1996"))
    b = e.where(F.col("yr") == 1997).select(
        F.col("q16").alias("q2"), F.col("v").alias("v1997"))
    return (a.join(b, F.col("q16") == F.col("q2"))
            .select("q16", "v1996", "v1997",
                    F.round(F.col("v1997") / F.col("v1996"), 6)
                    .alias("qratio")))


_QQ_ORACLE = """
WITH o AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM orders),
q AS (
  SELECT yr, quantile_cont(cents, [{fracs}]) AS b
  FROM o WHERE yr IN (1996, 1997) GROUP BY 1),
e AS (
  SELECT yr, CAST(i AS INT) AS q16, b[CAST(i AS INT)] AS v
  FROM q, range(1, 16) t(i))
SELECT a.q16, a.v AS v1996, b.v AS v1997,
       round(b.v / a.v, 6) AS qratio
FROM (SELECT q16, v FROM e WHERE yr = 1996) a
JOIN (SELECT q16, v FROM e WHERE yr = 1997) b USING (q16)
""".format(fracs=", ".join(repr(i / 16.0) for i in range(1, 16)))


def q_substring_spans(spark, sf_dir):
    """Cross-document EXACT shared-substring spans (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" exact-
    substring method, k-gram-chain formulation): every maximal run of
    matching 8-token grams on a (doc_a, doc_b) diagonal is a maximal
    shared token span; spans >= 12 tokens are reported with both start
    offsets.  Scale shape: ONE shuffle on the gram hash; a df/occurrence
    guard (>= 2 docs, <= 16 total occurrences) bounds the position-pair
    fanout per gram the same way dedup.py's max_bucket bounds LSH
    buckets, so boilerplate grams can never go quadratic.  The
    gaps-and-islands merge (pos - row_number on the diagonal) is a
    window over candidate pairs only — the corpus itself never pairs."""
    return dedup.shared_substring_spans(
        _docs(spark, sf_dir), k=8, min_span=12, min_docs=2, max_occ=16)


_SUBSTRING_SPANS_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
gr AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
  FROM toks, UNNEST(range(1, len(ws) - 6)) t(i)
  WHERE len(ws) >= 8),
keep AS (
  SELECT g FROM gr GROUP BY g
  HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= 16),
gk AS (SELECT gr.doc_id, gr.pos, gr.g FROM gr JOIN keep USING (g)),
pairs AS (
  SELECT a.doc_id AS id_a, a.pos AS pa, b.doc_id AS id_b, b.pos AS pb
  FROM gk a JOIN gk b ON a.g = b.g AND a.doc_id < b.doc_id),
isl AS (
  SELECT id_a, id_b, pa, pb,
         pa - ROW_NUMBER() OVER (
           PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS isl
  FROM pairs)
SELECT id_a, id_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
       COUNT(*) + 7 AS span_len
FROM isl GROUP BY id_a, id_b, pa - pb, isl
HAVING COUNT(*) + 7 >= 12
"""


def q_dbscan_embeddings(spark, sf_dir):
    """DBSCAN over the embeddings table (cosine >= 0.32 as the eps-ball,
    minPts 4 including self) with a DETERMINISTIC border rule: core
    points cluster by connected components over core-core eps-edges
    (min-vec_id label); border points adopt the MIN cluster among their
    core neighbors (classic DBSCAN's border assignment is scan-order-
    dependent — min-label makes it engine-portable); the rest is noise
    (cluster -1).  Eps-pairs come from the shared IVF blocking
    (_ivf_blocked, same-cell equi-join — never the O(n²) brute join):
    the core/border/noise derivation only needs the pair list, and the
    oracle replays the identical unrolled-Lloyd assignment so the
    blocked pair set is engine-reproducible (LSH buckets,
    q:lsh_near_dup, are the sibling candidate generator).
    Dot products fold sequentially in double (similarity.cosine_expr ==
    DuckDB list_sum-over-transform, the convention every embedding
    oracle in this file shares)."""
    eps, minpts = 0.32, 4
    idx = _ivf_blocked(spark, sf_dir)
    emb = idx.select(
        "cluster", "vec_id",
        F.transform(F.col("embedding"),
                    lambda x: x.cast("double")).alias("v"))
    a = emb.select("cluster", F.col("vec_id").alias("ia"),
                   F.col("v").alias("va"))
    b = emb.select("cluster", F.col("vec_id").alias("ib"),
                   F.col("v").alias("vb"))
    pairs = (a.join(b, "cluster").where(F.col("ia") < F.col("ib"))
             .where(similarity.cosine_expr("va", "vb") >= eps)
             .select("ia", "ib"))
    nb = (pairs.select(F.col("ia").alias("id"), F.col("ib").alias("nbr"))
          .unionByName(pairs.select(F.col("ib").alias("id"),
                                    F.col("ia").alias("nbr")))
          .localCheckpoint(eager=True))
    deg = nb.groupBy("id").agg(F.count("*").alias("d"))
    core = deg.where(F.col("d") + 1 >= minpts).select("id")
    # ZERO-PADDED uids: the CC min-label runs on strings, and the
    # oracle's MIN() runs on integers — padding makes lexicographic
    # order == numeric order so both engines pick the same label
    vuid = F.format_string("V:%010d", F.col("id"))
    core_edges = (nb.join(core, "id")
                  .join(core.withColumnRenamed("id", "nbr"), "nbr")
                  .select(vuid.alias("startuid"),
                          F.format_string("V:%010d", F.col("nbr"))
                          .alias("enduid")))
    core_nodes = core.select(vuid.alias("uid"))
    cc = graph_algos.connected_components(core_nodes, core_edges)
    comp = cc.select(
        F.regexp_replace("uid", "^V:", "").cast("long").alias("id"),
        F.regexp_replace("component", "^V:", "").cast("long")
        .alias("cluster"))
    core_out = comp.join(core, "id").select(
        "id", F.lit("core").alias("role"), "cluster")
    border = (nb.join(core.withColumnRenamed("id", "nbr"), "nbr")
              .join(core, "id", "left_anti")
              .join(comp.withColumnRenamed("id", "nbr")
                    .withColumnRenamed("cluster", "ncl"), "nbr")
              .groupBy("id")
              .agg(F.min("ncl").alias("cluster"))
              .select("id", F.lit("border").alias("role"), "cluster"))
    assigned = core_out.unionByName(border)
    noise = (emb.select(F.col("vec_id").alias("id"))
             .join(assigned.select("id"), "id", "left_anti")
             .select("id", F.lit("noise").alias("role"),
                     F.lit(-1).cast("long").alias("cluster")))
    return (assigned.unionByName(noise)
            .select(F.col("id").alias("vec_id"), "role", "cluster"))


_DBSCAN_ORACLE = "WITH RECURSIVE " + _ivf_ctes(
    8, 2, pfx="k_", with_kw=False) + """,
e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
p AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib
  FROM e a JOIN e b ON a.vec_id < b.vec_id
       JOIN k_fin fa ON fa.vec_id = a.vec_id
       JOIN k_fin fb ON fb.vec_id = b.vec_id AND fb.c = fa.c
  WHERE list_sum(list_transform(range(1, len(a.v)+1),
                                i -> a.v[i] * b.v[i]))
        / (sqrt(list_sum(list_transform(range(1, len(a.v)+1),
                                        i -> a.v[i] * a.v[i])))
           * sqrt(list_sum(list_transform(range(1, len(b.v)+1),
                                          i -> b.v[i] * b.v[i]))))
        >= 0.32),
nb AS (SELECT ia AS id, ib AS nbr FROM p
       UNION ALL SELECT ib, ia FROM p),
deg AS (SELECT id, COUNT(*) AS d FROM nb GROUP BY 1),
core AS (SELECT id FROM deg WHERE d + 1 >= 4),
ce AS (SELECT nb.id AS a, nb.nbr AS b
       FROM nb JOIN core c1 ON nb.id = c1.id
               JOIN core c2 ON nb.nbr = c2.id),
reach(src, dst) AS (
  SELECT id, id FROM core
  UNION
  SELECT r.src, ce.b FROM reach r JOIN ce ON ce.a = r.dst),
comp AS (SELECT src AS id, MIN(dst) AS cluster FROM reach GROUP BY 1),
core_out AS (
  SELECT id, 'core' AS role, cluster FROM comp),
border AS (
  SELECT nb.id, 'border' AS role, MIN(c.cluster) AS cluster
  FROM nb JOIN comp c ON nb.nbr = c.id
  WHERE nb.id NOT IN (SELECT id FROM core)
  GROUP BY nb.id),
assigned AS (
  SELECT * FROM core_out UNION ALL SELECT * FROM border)
SELECT e.vec_id, COALESCE(a.role, 'noise') AS role,
       CAST(COALESCE(a.cluster, -1) AS BIGINT) AS cluster
FROM e LEFT JOIN assigned a ON e.vec_id = a.id
"""


def q_price_model(spark, sf_dir):
    """Multiple linear regression (2 predictors + intercept) by exact
    normal equations: o_totalprice_cents ~ n_lines + sum_qty per order.
    The nine sufficient statistics (n, Sx1, Sx2, Sy, Sx11, Sx22, Sx12,
    Sx1y, Sx2y) aggregate as EXACT integers (cents/quantities, one
    map-side-combined pass over a lineitem groupBy); the 3x3 Cramer
    solve then runs on identical doubles in both engines — no libm, no
    iteration, so coefficients replay bit-for-bit.  At 100 TB the whole
    model is one partial-aggregate pass: sufficient statistics are the
    canonical distributed-regression shape."""
    t = load_tables(spark, sf_dir)
    per = (t["lineitem"]
           .groupBy("l_orderkey")
           .agg(F.count("*").cast("long").alias("x1"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("long").alias("x2")))
    o = (t["orders"]
         .select("o_orderkey",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("long").alias("y"))
         .join(per, F.col("o_orderkey") == F.col("l_orderkey")))
    s = o.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"), F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"))
    d = {c: F.col(c).cast("double") for c in
         ("n", "sx1", "sx2", "sy", "sx11", "sx22", "sx12", "sx1y",
          "sx2y")}
    det = (d["n"] * (d["sx11"] * d["sx22"] - d["sx12"] * d["sx12"])
           - d["sx1"] * (d["sx1"] * d["sx22"] - d["sx12"] * d["sx2"])
           + d["sx2"] * (d["sx1"] * d["sx12"] - d["sx11"] * d["sx2"]))
    det0 = (d["sy"] * (d["sx11"] * d["sx22"] - d["sx12"] * d["sx12"])
            - d["sx1"] * (d["sx1y"] * d["sx22"] - d["sx12"] * d["sx2y"])
            + d["sx2"] * (d["sx1y"] * d["sx12"] - d["sx11"] * d["sx2y"]))
    det1 = (d["n"] * (d["sx1y"] * d["sx22"] - d["sx12"] * d["sx2y"])
            - d["sy"] * (d["sx1"] * d["sx22"] - d["sx12"] * d["sx2"])
            + d["sx2"] * (d["sx1"] * d["sx2y"] - d["sx1y"] * d["sx2"]))
    det2 = (d["n"] * (d["sx11"] * d["sx2y"] - d["sx1y"] * d["sx12"])
            - d["sx1"] * (d["sx1"] * d["sx2y"] - d["sx1y"] * d["sx2"])
            + d["sy"] * (d["sx1"] * d["sx12"] - d["sx11"] * d["sx2"]))
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(det0 / det, 6).alias("beta0"),
        F.round(det1 / det, 6).alias("beta1"),
        F.round(det2 / det, 6).alias("beta2"))


_PRICE_MODEL_ORACLE = """
WITH per AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS x1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS x2
  FROM lineitem GROUP BY 1),
o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
         x1, x2
  FROM orders JOIN per ON o_orderkey = l_orderkey),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS sx1, CAST(SUM(x2) AS DOUBLE) AS sx2,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x1 * x1) AS DOUBLE) AS sx11,
         CAST(SUM(x2 * x2) AS DOUBLE) AS sx22,
         CAST(SUM(x1 * x2) AS DOUBLE) AS sx12,
         CAST(SUM(x1 * y) AS DOUBLE) AS sx1y,
         CAST(SUM(x2 * y) AS DOUBLE) AS sx2y
  FROM o)
SELECT CAST(n AS BIGINT) AS n,
       round((sy * (sx11 * sx22 - sx12 * sx12)
              - sx1 * (sx1y * sx22 - sx12 * sx2y)
              + sx2 * (sx1y * sx12 - sx11 * sx2y))
             / (n * (sx11 * sx22 - sx12 * sx12)
                - sx1 * (sx1 * sx22 - sx12 * sx2)
                + sx2 * (sx1 * sx12 - sx11 * sx2)), 6) AS beta0,
       round((n * (sx1y * sx22 - sx12 * sx2y)
              - sy * (sx1 * sx22 - sx12 * sx2)
              + sx2 * (sx1 * sx2y - sx1y * sx2))
             / (n * (sx11 * sx22 - sx12 * sx12)
                - sx1 * (sx1 * sx22 - sx12 * sx2)
                + sx2 * (sx1 * sx12 - sx11 * sx2)), 6) AS beta1,
       round((n * (sx11 * sx2y - sx1y * sx12)
              - sx1 * (sx1 * sx2y - sx1y * sx2)
              + sy * (sx1 * sx12 - sx11 * sx2))
             / (n * (sx11 * sx22 - sx12 * sx12)
                - sx1 * (sx1 * sx22 - sx12 * sx2)
                + sx2 * (sx1 * sx12 - sx11 * sx2)), 6) AS beta2
FROM s
"""


def q_mst_trade(spark, sf_dir):
    """Minimum spanning forest of the inter-nation trade graph
    (Borůvka, operators/graph_algos.boruvka_msf): nodes are nations,
    edge weight is the exact undirected revenue-cents flow between the
    pair — the cheapest backbone connecting every trading nation.
    Selection is totally ordered by (w, src, dst), so the forest is
    unique; the DuckDB oracle replays the identical unrolled rounds
    (six — components at least halve per round, 25 nations need five)
    with a recursive-CTE relabel after each.  Borůvka is the MST
    formulation that distributes: O(log n) bulk rounds of
    join + windowed argmin, no union-find on the driver."""
    forest = graph_algos.boruvka_msf(
        _nation_flows(spark, sf_dir), max_rounds=8)
    return forest.select("src", "dst", F.col("w").alias("w_cents"))


def _mst_oracle_sql(rounds: int = 6, negate: bool = False,
                    tail: str | None = None) -> str:
    """Unrolled-Borůvka DuckDB replay of q_mst_trade: per round, a
    recursive-CTE relabel over the forest so far, then the same
    (w, src, dst)-ordered argmin per component.  ``negate`` flips the
    weight sign (maximum-similarity spanning tree); ``tail`` overrides
    the final SELECT (it sees flows/nodes/forest{rounds})."""
    # every multi-referenced CTE is MATERIALIZED: without it DuckDB
    # inlines the chain and forest{r} expands to ~9 copies of
    # forest{r-1} — 9^rounds parquet scans (observed as fd exhaustion)
    sign = "-" if negate else ""
    parts = [f"""
WITH RECURSIVE
flows AS MATERIALIZED (
  SELECT least(ns.n_name, nc.n_name) AS src,
         greatest(ns.n_name, nc.n_name) AS dst,
         {sign}CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_name <> nc.n_name
  GROUP BY 1, 2),
nodes AS MATERIALIZED (
  SELECT src AS uid FROM flows UNION SELECT dst FROM flows),
forest0(src, dst, w) AS MATERIALIZED (
  SELECT src, dst, w FROM flows WHERE 1 = 0)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
fsym{p} AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM forest{p}
  UNION ALL SELECT dst, src FROM forest{p}),
reach{r}(s, d) AS (
  SELECT uid, uid FROM nodes
  UNION
  SELECT t.s, f.b FROM reach{r} t JOIN fsym{p} f ON f.a = t.d),
comp{r} AS MATERIALIZED (
  SELECT s AS uid, MIN(d) AS c FROM reach{r} GROUP BY 1),
er{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w, ka.c AS ca, kb.c AS cb
  FROM flows e JOIN comp{r} ka ON e.src = ka.uid
               JOIN comp{r} kb ON e.dst = kb.uid
  WHERE ka.c <> kb.c),
sym{r} AS (SELECT ca AS c, w, src, dst FROM er{r}
           UNION ALL SELECT cb, w, src, dst FROM er{r}),
sel{r} AS (
  SELECT DISTINCT src, dst, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY c
                              ORDER BY w, src, dst) AS rn
    FROM sym{r}) WHERE rn = 1),
forest{r}(src, dst, w) AS MATERIALIZED (
  SELECT src, dst, w FROM forest{p}
  UNION SELECT src, dst, w FROM sel{r})""")
    parts.append(tail if tail is not None else f"""
SELECT src, dst, w AS w_cents FROM forest{rounds}""")
    return "".join(parts)


def _nation_flows(spark, sf_dir, negate=False):
    """Undirected inter-nation trade edges (src < dst by name, exact
    revenue cents; ``negate`` for maximum-similarity spanning trees)."""
    t = load_tables(spark, sf_dir)
    rev = F.sum((F.col("l_extendedprice").cast("decimal(18,2)")
                 * 100).cast("long")).cast("long")
    return (t["lineitem"]
            .join(t["orders"].select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(t["customer"]
                              .select("c_custkey", "c_nationkey")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(t["supplier"]
                              .select("s_suppkey",
                                      F.col("s_nationkey")
                                      .alias("supp_nk"))),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(t["nation"].select(
                F.col("n_nationkey").alias("supp_nk"),
                F.col("n_name").alias("sn"))), "supp_nk")
            .join(F.broadcast(t["nation"].select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("cn"))), "c_nationkey")
            .where(F.col("sn") != F.col("cn"))
            .groupBy(F.least("sn", "cn").alias("src"),
                     F.greatest("sn", "cn").alias("dst"))
            .agg((-rev if negate else rev).alias("w")))


def q_single_linkage_nations(spark, sf_dir):
    """Single-linkage clustering of nations by trade similarity — the
    classic MST formulation: the maximum-similarity spanning tree
    (Borůvka on negated revenue) IS the single-linkage dendrogram;
    cutting its below-average links yields the clusters.  Cut rule is
    scale-free (edge revenue >= the forest's own mean, exact integer
    sum / count), so the same query is meaningful at every SF.  Labels
    are min-name connected components over the kept backbone edges.
    At 100 TB this is the standard route to single-linkage over
    similarity graphs: MST via O(log n) Borůvka rounds, then one CC —
    never the O(n^2) dendrogram."""
    forest = graph_algos.boruvka_msf(
        _nation_flows(spark, sf_dir, negate=True), max_rounds=8)
    rev = (-F.col("w")).alias("rev")
    mu = forest.agg((F.sum(-F.col("w")).cast("double")
                     / F.count("*")).alias("mu"))
    kept = (forest.crossJoin(F.broadcast(mu))
            .where((-F.col("w")).cast("double") >= F.col("mu"))
            .select(F.col("src").alias("startuid"),
                    F.col("dst").alias("enduid")))
    nodes = (forest.select(F.col("src").alias("uid"))
             .unionByName(forest.select(F.col("dst").alias("uid")))
             .distinct())
    cc = graph_algos.connected_components(nodes, kept)
    return cc.select(F.col("uid").alias("nation"),
                     F.col("component").alias("cluster"))


_SINGLE_LINKAGE_TAIL = """,
kept AS MATERIALIZED (
  SELECT src, dst FROM forest{r}, (
    SELECT CAST(SUM(-w) AS DOUBLE) / COUNT(*) AS mu FROM forest{r})
  WHERE CAST(-w AS DOUBLE) >= mu),
ksym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM kept
  UNION ALL SELECT dst, src FROM kept),
reachk(s, d) AS (
  SELECT uid, uid FROM nodes
  UNION
  SELECT t.s, f.b FROM reachk t JOIN ksym f ON f.a = t.d)
SELECT s AS nation, MIN(d) AS cluster FROM reachk GROUP BY 1"""


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility audit by language: BPE tokens per word and
    characters per BPE token under the corpus-trained merge table —
    the standard multilingual-tokenizer health metric (high fertility
    = the tokenizer fragments that language, inflating its training
    cost per byte).  Shares the trained merges with q:bpe_tokenize;
    all sums are exact integers, the two ratios divide once at the
    end (round 6)."""
    from .operators.text import bpe_apply, bpe_train
    docs = _docs(spark, sf_dir)
    merges = [(r["lhs"], r["rhs"])
              for r in bpe_train(docs, rounds=6).collect()]
    bpe = bpe_apply(docs, merges)
    ws = text.tokens(F.col("text"))
    stats = (docs.select("doc_id", "lang", ws.alias("ws"))
             .select("doc_id", "lang",
                     F.size("ws").cast("long").alias("n_words"),
                     F.aggregate(F.col("ws"), F.lit(0),
                                 lambda a, v: a + F.length(v))
                     .cast("long").alias("n_chars")))
    return (stats.join(bpe, "doc_id")
            .groupBy("lang")
            .agg(F.sum("n_words").alias("words"),
                 F.sum("n_chars").alias("chars"),
                 F.sum("n_bpe_tokens").alias("bpe_tokens"))
            .select("lang",
                    F.col("words").cast("long").alias("words"),
                    F.col("chars").cast("long").alias("chars"),
                    F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
                    F.round(F.col("bpe_tokens") / F.col("words"), 6)
                    .alias("fertility"),
                    F.round(F.col("chars") / F.col("bpe_tokens"), 6)
                    .alias("chars_per_token")))


def _tokenizer_fertility_oracle_sql(rounds: int = 6) -> str:
    """Shared BPE training CTEs + the per-language fertility rollup."""
    mrg = ", ".join(f"(SELECT pair FROM b{r}) AS p{r}"
                    for r in range(1, rounds + 1))
    seq = "' ' || array_to_string(string_split(w, ''), ' ') || ' '"
    for r in range(1, rounds + 1):
        pat = f"' ' || p{r} || ' '"
        rep = f"' ' || replace(p{r}, ' ', '') || ' '"
        seq = f"replace(replace({seq}, {pat}, {rep}), {pat}, {rep})"
    return "WITH " + _bpe_ctes(rounds) + f""",
mrg AS (SELECT {mrg}),
per AS (
  SELECT doc_id, lang, list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
st AS (
  SELECT lang,
         CAST(SUM(len(ws)) AS BIGINT) AS words,
         CAST(SUM(COALESCE(list_sum(list_transform(ws,
              w -> len(w))), 0)) AS BIGINT) AS chars,
         CAST(SUM(COALESCE(list_sum(list_transform(ws,
              w -> len(string_split(trim({seq}), ' ')))), 0)) AS BIGINT)
           AS bpe_tokens
  FROM per, mrg GROUP BY 1)
SELECT lang, words, chars, bpe_tokens,
       round(bpe_tokens / words, 6) AS fertility,
       round(chars / bpe_tokens, 6) AS chars_per_token
FROM st"""


def q_hll_distinct(spark, sf_dir):
    """Portable HyperLogLog, register math in the open (upgrades
    q:approx_distinct_users' bracketing check to a FULL hash-match):
    md5-derived 60-bit hashes split into a register index and a tail
    whose leading-zero rank updates the register (max per bucket —
    one map-side-combinable aggregate; the fixed register table is
    the mergeable sketch a 100 TB rollup ships between executors;
    m=16 here so the fixture's 15-1500 users sit in the raw
    estimate's valid regime, 2^14 in production).  The raw estimate alpha*m^2 / sum(2^-reg) is
    libm-free — powers of two are exact in binary floating point, so
    the harmonic sum and the estimate replay bit-for-bit in any
    engine (the small-range ln() correction is deliberately NOT
    applied: cross-engine libm is the one thing that can't be made
    exact — cf. the croston pow lesson).  Emits exact count alongside
    for the audit."""
    m = 16  # registers; production uses 2^14 — the fixture has only
    # 15-1500 distinct users, and the RAW estimate (no ln() small-range
    # correction — cross-engine libm is unfixable, cf. croston) is only
    # meaningful for n >~ m
    ev = _events(spark, sf_dir)
    h = text.hash60(F.col("user_id").cast("string"))
    bucket = (h % m)
    # shiftright, NOT h/m: double division mangles a 60-bit long
    # beyond 2^53 (the DuckDB twin's // is exact integer division)
    tail = F.shiftright(h, 4)
    blen = F.when(F.col("tail") == 0, F.lit(0)) \
        .otherwise(F.length(F.expr("bin(tail)")))
    rho = (F.lit(56) - blen + 1)
    regs = (ev.select(bucket.alias("b"), tail.alias("tail"))
            .select("b", rho.alias("rho"))
            .groupBy("b").agg(F.max("rho").alias("reg")))
    alpha = 0.673  # Flajolet's m=16 constant
    hsum = (F.sum(F.expr("power(2.0d, -CAST(reg AS DOUBLE))"))
            + (m - F.count("*")))
    sk = regs.agg(
        F.count("*").alias("nonzero_regs"),
        F.round(hsum, 9).alias("harmonic_sum"),
        F.round(F.lit(alpha * m * m) / hsum, 6).alias("raw_estimate"))
    exact = ev.agg(F.count_distinct("user_id").alias("n_exact"))
    return sk.crossJoin(F.broadcast(exact)).select(
        F.lit(m).alias("m"), "nonzero_regs", "harmonic_sum",
        "raw_estimate", "n_exact")


_HLL_ORACLE = """
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM events),
hb AS (
  SELECT h % 16 AS b, h // 16 AS tail FROM h),
regs AS (
  SELECT b, MAX(56 - (CASE WHEN tail = 0 THEN 0
                           ELSE length(bin(tail)) END) + 1) AS reg
  FROM hb GROUP BY 1),
sk AS (
  SELECT COUNT(*) AS nonzero_regs,
         SUM(power(2.0, -CAST(reg AS DOUBLE)))
           + (16 - COUNT(*)) AS hsum
  FROM regs)
SELECT CAST(16 AS INT) AS m, nonzero_regs,
       round(hsum, 9) AS harmonic_sum,
       round(0.673 * 16 * 16 / hsum, 6) AS raw_estimate,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS n_exact
FROM sk
"""


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters, depth 4 x width 256 with
    md5-derived row hashes: per row j the key's bucket is 8 bits of
    md5(j || key); the sketch is the (j, bucket) count table (one
    map-side-combinable aggregate, fixed 1024 cells at any corpus
    size); a key's estimate is the MIN over its four cells — always
    >= the true count, equal for true heavy hitters.  Emits every
    user whose CMS estimate >= 0.2% of total events with the exact
    count beside it (estimate >= exact always; integer-exact both
    engines)."""
    d, wdt = 4, 256
    ev = _events(spark, sf_dir)
    key = F.col("user_id").cast("string")
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (text.hash60(F.concat(F.lit(f"{j}:"), key)) % wdt)
                 .alias("c"))
        for j in range(d)])
    sketch = (ev.select(F.explode(cells).alias("jc"))
              .groupBy("jc.j", "jc.c")
              .agg(F.count("*").alias("n"))
              .localCheckpoint(eager=True))
    total = ev.count()
    thresh = max(1, int(total * 0.002))
    keys = ev.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    kc = keys.select(
        "user_id", "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     (text.hash60(F.concat(
                         F.lit(f"{j}:"),
                         F.col("user_id").cast("string"))) % wdt)
                     .alias("c"))
            for j in range(d)])).alias("jc"))
    est = (kc.join(sketch, (F.col("jc.j") == F.col("j"))
                   & (F.col("jc.c") == F.col("c")))
           .groupBy("user_id", "n_exact")
           .agg(F.min("n").alias("cms_estimate"))
           .where(F.col("cms_estimate") >= thresh))
    return est.select("user_id", "cms_estimate", "n_exact")


_CMS_ORACLE = """
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
cells AS (
  SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 15))
              ::BIGINT % 256 AS c,
         user_id
  FROM ev, UNNEST(range(0, 4)) t(j)),
sketch AS (SELECT j, c, COUNT(*) AS n FROM cells GROUP BY 1, 2),
keys AS (SELECT user_id, COUNT(*) AS n_exact FROM ev GROUP BY 1),
kc AS (
  SELECT k2.user_id, k2.n_exact, t.j,
         ('0x' || substr(md5(CAST(t.j AS VARCHAR) || ':'
                             || CAST(k2.user_id AS VARCHAR)), 1, 15))
           ::BIGINT % 256 AS c
  FROM keys k2, UNNEST(range(0, 4)) t(j)),
est AS (
  SELECT kc.user_id, kc.n_exact, MIN(s.n) AS cms_estimate
  FROM kc JOIN sketch s ON kc.j = s.j AND kc.c = s.c
  GROUP BY 1, 2)
SELECT user_id, cms_estimate, n_exact
FROM est
WHERE cms_estimate >= GREATEST(1, CAST(
  (SELECT COUNT(*) FROM events) * 0.002 AS BIGINT))
"""


_MRE_ITERS = 16


def q_markov_removal_effects(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al.): per-user
    journeys truncated at the first purchase become an absorbing
    chain START -> channels -> {CONV, NULL}; a channel's credit is
    how much the START->CONV absorption probability drops when every
    transition through it is deleted (mass lost, NOT renormalized —
    the standard removal semantics).  Absorption runs as 16 fixed
    synchronous iterations re-rounded to the 9 dp DECIMAL grid
    (q:markov_steady_state's ladder), i.e. 'converts within 16
    steps' — defined, engine-exact semantics with no convergence
    check to diverge on.  All five variants (base + 4 removals) ride
    ONE variant-keyed transition frame, so each iteration is a single
    tiny join + groupBy regardless of channel count."""
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("t"),
        "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    rn = ev.withColumn("rn", F.row_number().over(w))
    firstp = (rn.where(F.col("event_type") == "purchase")
              .groupBy("user_id").agg(F.min("rn").alias("fp")))
    j = rn.join(firstp, "user_id", "left")
    kept = j.where((F.col("fp").isNull()) | (F.col("rn") < F.col("fp")))
    states = (kept.select("user_id", F.col("rn").cast("long").alias("pos"),
                          F.col("event_type").alias("state"))
              .unionByName(
                  j.select("user_id").distinct()
                  .select("user_id", F.lit(0).cast("long").alias("pos"),
                          F.lit("START").alias("state")))
              .unionByName(
                  j.select("user_id", "fp").distinct()
                  .select("user_id",
                          F.lit(1 << 40).cast("long").alias("pos"),
                          F.when(F.col("fp").isNotNull(), "CONV")
                          .otherwise("NULL").alias("state"))))
    w2 = W.partitionBy("user_id").orderBy("pos")
    tr = (states.withColumn("d", F.lead("state").over(w2))
          .where(F.col("d").isNotNull())
          .groupBy(F.col("state").alias("s"), "d")
          .agg(F.count("*").alias("c")))
    tot = tr.groupBy("s").agg(F.sum("c").alias("n"))
    p = (tr.join(tot, "s")
         .select("s", "d", F.round(F.col("c") / F.col("n"), 9)
                 .cast("decimal(18,9)").alias("p")))
    channels = ["click", "error", "signup", "view"]
    variants = (spark.createDataFrame(
        [("base",)] + [(c,) for c in channels], "removed string"))
    pv = (p.crossJoin(F.broadcast(variants))
          .where((F.col("removed") == "base")
                 | ((F.col("s") != F.col("removed"))
                    & (F.col("d") != F.col("removed"))))
          .localCheckpoint(eager=True))
    direct = (pv.where(F.col("d") == "CONV")
              .select("removed", "s", F.col("p").alias("dp")))
    ptrans = pv.where(~F.col("d").isin("CONV", "NULL")) \
        .localCheckpoint(eager=True)
    sts = pv.select("removed", "s").distinct().localCheckpoint(eager=True)
    v = sts.join(direct, ["removed", "s"], "left").select(
        "removed", "s",
        F.coalesce(F.col("dp"), F.lit(0).cast("decimal(18,9)"))
        .alias("v"))
    for _ in range(_MRE_ITERS - 1):
        nb = (ptrans.join(v.select(F.col("removed"),
                                   F.col("s").alias("d"),
                                   F.col("v")), ["removed", "d"])
              .groupBy("removed", "s")
              .agg(F.sum(F.col("p") * F.col("v")).alias("acc")))
        v = (sts.join(direct, ["removed", "s"], "left")
             .join(nb, ["removed", "s"], "left")
             .select("removed", "s",
                     F.round(F.coalesce(F.col("dp").cast("double"),
                                        F.lit(0.0))
                             + F.coalesce(F.col("acc").cast("double"),
                                          F.lit(0.0)), 9)
                     .cast("decimal(18,9)").alias("v"))
             .localCheckpoint(eager=True))
    vstart = v.where(F.col("s") == "START").select(
        "removed", F.col("v").cast("double").alias("p_conv"))
    base = vstart.where(F.col("removed") == "base") \
        .select(F.col("p_conv").alias("p_base"))
    return (vstart.where(F.col("removed") != "base")
            .crossJoin(F.broadcast(base))
            .select(F.col("removed").alias("channel"),
                    F.round("p_conv", 9).alias("p_conv_without"),
                    F.round("p_base", 9).alias("p_conv_base"),
                    F.round(1 - F.col("p_conv") / F.col("p_base"), 6)
                    .alias("removal_effect")))


def _markov_removal_oracle_sql(iters: int = _MRE_ITERS) -> str:
    """Unrolled DuckDB replay of q_markov_removal_effects: same
    variant-keyed transitions, same 9 dp re-rounding per round."""
    head = """
WITH
rn AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                     event_id) AS rn
  FROM events),
firstp AS MATERIALIZED (
  SELECT user_id, MIN(rn) AS fp FROM rn
  WHERE event_type = 'purchase' GROUP BY 1),
jx AS MATERIALIZED (
  SELECT rn.user_id, rn.event_type, rn.rn, firstp.fp
  FROM rn LEFT JOIN firstp USING (user_id)),
states AS MATERIALIZED (
  SELECT user_id, CAST(rn AS BIGINT) AS pos, event_type AS state
  FROM jx WHERE fp IS NULL OR rn < fp
  UNION ALL
  SELECT DISTINCT user_id, 0, 'START' FROM jx
  UNION ALL
  SELECT user_id, CAST(1099511627776 AS BIGINT),
         CASE WHEN fp IS NOT NULL THEN 'CONV' ELSE 'NULL' END
  FROM (SELECT DISTINCT user_id, fp FROM jx)),
tr AS MATERIALIZED (
  SELECT s, d, COUNT(*) AS c FROM (
    SELECT state AS s,
           LEAD(state) OVER (PARTITION BY user_id ORDER BY pos) AS d
    FROM states)
  WHERE d IS NOT NULL GROUP BY 1, 2),
p AS MATERIALIZED (
  SELECT s, d, CAST(round(CAST(c AS DOUBLE) / n, 9) AS DECIMAL(18,9))
           AS p
  FROM tr JOIN (SELECT s, SUM(c) AS n FROM tr GROUP BY 1) USING (s)),
variants(removed) AS (VALUES ('base'), ('click'), ('error'),
                             ('signup'), ('view')),
pv AS MATERIALIZED (
  SELECT removed, s, d, p FROM p, variants
  WHERE removed = 'base' OR (s <> removed AND d <> removed)),
direct AS MATERIALIZED (
  SELECT removed, s, p AS dp FROM pv WHERE d = 'CONV'),
ptrans AS MATERIALIZED (
  SELECT removed, s, d, p FROM pv WHERE d NOT IN ('CONV', 'NULL')),
sts AS MATERIALIZED (SELECT DISTINCT removed, s FROM pv),
v1 AS MATERIALIZED (
  SELECT sts.removed, sts.s,
         CAST(COALESCE(dp, 0) AS DECIMAL(18,9)) AS v
  FROM sts LEFT JOIN direct
    ON sts.removed = direct.removed AND sts.s = direct.s)"""
    rounds = []
    for k in range(2, iters + 1):
        rounds.append(f""",
v{k} AS MATERIALIZED (
  SELECT sts.removed, sts.s,
         CAST(round(COALESCE(CAST(dp AS DOUBLE), 0)
                    + COALESCE(acc, 0), 9) AS DECIMAL(18,9)) AS v
  FROM sts
  LEFT JOIN direct
    ON sts.removed = direct.removed AND sts.s = direct.s
  LEFT JOIN (
    SELECT pt.removed, pt.s, CAST(SUM(pt.p * pv2.v) AS DOUBLE) AS acc
    FROM ptrans pt JOIN v{k-1} pv2
      ON pt.removed = pv2.removed AND pt.d = pv2.s
    GROUP BY 1, 2) nb
    ON sts.removed = nb.removed AND sts.s = nb.s)""")
    tail = f"""
SELECT x.removed AS channel,
       round(CAST(x.v AS DOUBLE), 9) AS p_conv_without,
       round(CAST(b.v AS DOUBLE), 9) AS p_conv_base,
       round(1 - CAST(x.v AS DOUBLE) / CAST(b.v AS DOUBLE), 6)
         AS removal_effect
FROM (SELECT removed, v FROM v{iters}
      WHERE s = 'START' AND removed <> 'base') x,
     (SELECT v FROM v{iters}
      WHERE s = 'START' AND removed = 'base') b"""
    return head + "".join(rounds) + tail


def q_edit_distance_pairs(spark, sf_dir):
    """Character-level edit-distance verification for LSH candidate
    pairs — the precision stage after MinHash recall: exact
    Levenshtein (integer DP, engine-portable) plus the normalized
    similarity 1 - d/max_len.  Runs ONLY on the pruned candidate
    list (the corpus never pairs); the DP is O(len_a * len_b) per
    pair, which is why it must sit behind a candidate generator at
    scale — exactly where fuzzy-dedup pipelines place it."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    cand = q_minhash_pairs(spark, sf_dir)
    j = (cand
         .join(docs.select(F.col("doc_id").alias("id_a"),
                           F.col("text").alias("ta")), "id_a")
         .join(docs.select(F.col("doc_id").alias("id_b"),
                           F.col("text").alias("tb")), "id_b"))
    d = F.levenshtein("ta", "tb")
    mx = F.greatest(F.length("ta"), F.length("tb"))
    return j.select(
        "id_a", "id_b", d.cast("long").alias("edit_distance"),
        F.round(1 - d / F.greatest(mx, F.lit(1)), 6).alias("similarity"))


_EDIT_DISTANCE_ORACLE = """
WITH toks AS (
  SELECT doc_id, text, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
        i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
        AS mh
  FROM toks WHERE len(ws) >= 3
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_distance,
       round(1 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
               / GREATEST(GREATEST(length(x.text), length(y.text)), 1),
             6) AS similarity
FROM cand JOIN documents x ON x.doc_id = id_a
          JOIN documents y ON y.doc_id = id_b
"""


def q_tfidf_cosine_pairs(spark, sf_dir):
    """TF-IDF cosine similarity for LSH candidate pairs — the sparse
    lexical twin of the embedding verify: vectors never materialize;
    the dot product is a sum over SHARED terms only (join the two
    per-doc term frames on the term), normalized by per-doc norms.
    idf uses the libm-free (N/df) weight squared into exact rationals
    before one final double division (ln-free, so the replay is
    bit-exact).  Scale: term frames shuffle once on term; only
    candidate pairs ever meet."""
    docs = _docs(spark, sf_dir)
    cand = q_minhash_pairs(spark, sf_dir).localCheckpoint(eager=True)
    toks = (docs.select("doc_id",
                        F.explode(text.tokens(F.col("text")))
                        .alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # weight = tf * (N/df): exact rational scaled to integers —
    # w_num = tf * N, w_den = df  (cosine is scale-invariant per doc,
    # but N is shared so it cancels; keep tf/df exact rationals via
    # tf * (N // gcd…) — simplest exact form: w = tf / df as the pair
    # (tf, df), dot = sum tf_a*tf_b/(df^2), norms likewise; all sums
    # of exact rationals with denominator df^2 — accumulate as DOUBLE
    # of exact integer ratios (each term's contribution rounds once)
    wt = (tf.join(dfreq, "term")
          .select("doc_id", "term", "tf", "df")
          .localCheckpoint(eager=True))
    # per-term contributions quantize onto the 9 dp DECIMAL grid
    # before summing (the textrank ladder): float-sum ORDER differs
    # between engines, decimal sums of identical per-term values
    # cannot
    contrib = lambda t1, t2, d: F.round(  # noqa: E731
        t1.cast("double") * t2 / (d.cast("double") * d), 9) \
        .cast("decimal(18,9)")
    norm = (wt.groupBy("doc_id")
            .agg(F.sum(contrib(F.col("tf"), F.col("tf"), F.col("df")))
                 .alias("nsq")))
    a = wt.select(F.col("doc_id").alias("id_a"), "term",
                  F.col("tf").alias("tfa"), F.col("df").alias("dfa"))
    b = wt.select(F.col("doc_id").alias("id_b"), "term",
                  F.col("tf").alias("tfb"))
    dots = (cand.join(a, "id_a").join(b, ["id_b", "term"])
            .groupBy("id_a", "id_b")
            .agg(F.sum(contrib(F.col("tfa"), F.col("tfb"),
                               F.col("dfa"))).alias("dot")))
    na = norm.select(F.col("doc_id").alias("id_a"),
                     F.col("nsq").cast("double").alias("na"))
    nb = norm.select(F.col("doc_id").alias("id_b"),
                     F.col("nsq").cast("double").alias("nb"))
    return (dots.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("dot").cast("double")
                            / (F.sqrt("na") * F.sqrt("nb")), 6)
                    .alias("tfidf_cosine")))


_TFIDF_COSINE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
        i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
        AS mh
  FROM toks WHERE len(ws) >= 3
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id
), tf AS (
  SELECT doc_id, t.term, COUNT(*) AS tf
  FROM toks, UNNEST(ws) AS t(term) GROUP BY 1, 2
), dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
wt AS (
  SELECT doc_id, term, tf, df FROM tf JOIN dfreq USING (term)),
nrm AS (
  SELECT doc_id,
         SUM(CAST(round(CAST(tf AS DOUBLE) * tf
                        / (CAST(df AS DOUBLE) * df), 9)
                  AS DECIMAL(18,9))) AS nsq
  FROM wt GROUP BY 1),
dots AS (
  SELECT c.id_a, c.id_b,
         SUM(CAST(round(CAST(a.tf AS DOUBLE) * b.tf
                        / (CAST(a.df AS DOUBLE) * a.df), 9)
                  AS DECIMAL(18,9))) AS dot
  FROM cand c
  JOIN wt a ON a.doc_id = c.id_a
  JOIN wt b ON b.doc_id = c.id_b AND b.term = a.term
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(x.nsq AS DOUBLE))
                * sqrt(CAST(y.nsq AS DOUBLE))), 6) AS tfidf_cosine
FROM dots JOIN nrm x ON x.doc_id = id_a
          JOIN nrm y ON y.doc_id = id_b
"""


def q_corpus_pipeline_v3(spark, sf_dir):
    """Capstone composition of THIS session's operators in one DAG:
    (1) exact verbatim-overlap dedup — drop the higher doc of any
    pair sharing a >= 20-token substring span (Lee et al. exact
    substring, q:substring_spans); (2) near-dup dedup — MinHash
    candidates verified by character edit similarity >= 0.6
    (q:edit_distance_pairs), clustered by connected components, keep
    the min id; (3) BPE-budget shard packing — merges trained on the
    SURVIVORS (not the raw corpus), documents packed into
    4000-BPE-token shards per language (q:tokenizer_fertility's
    counts feeding q:pack_shards' cumsum layout).  Per-shard stats
    out.  Every stage is an already-oracled operator; the whole
    pipeline replays as one CTE chain."""
    from .operators.pipeline import pack_shards
    from .operators.text import bpe_apply, bpe_train
    docs = _docs(spark, sf_dir)
    spans = dedup.shared_substring_spans(docs, k=8, min_span=20)
    drop1 = spans.select(F.col("id_b").alias("doc_id")).distinct()
    s1 = docs.join(drop1, "doc_id", "left_anti") \
        .localCheckpoint(eager=True)
    sig = dedup.minhash_signature(s1, num_hashes=1)
    a = sig.select(F.col("doc_id").alias("id_a"), "sig0")
    b = sig.select(F.col("doc_id").alias("id_b"),
                   F.col("sig0").alias("s2"))
    cand = (a.join(b, (F.col("sig0") == F.col("s2"))
                   & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b"))
    tx = s1.select("doc_id", "text")
    ver = (cand
           .join(tx.select(F.col("doc_id").alias("id_a"),
                           F.col("text").alias("ta")), "id_a")
           .join(tx.select(F.col("doc_id").alias("id_b"),
                           F.col("text").alias("tb")), "id_b")
           .where((1 - F.levenshtein("ta", "tb")
                   / F.greatest(F.greatest(F.length("ta"),
                                           F.length("tb")), F.lit(1)))
                  >= 0.6)
           .select("id_a", "id_b"))
    clusters = dedup.dedup_clusters(ver)
    drop2 = (clusters.where(F.col("doc_id") != F.col("cluster"))
             .select("doc_id"))
    s2f = s1.join(drop2, "doc_id", "left_anti") \
        .localCheckpoint(eager=True)
    merges = [(r["lhs"], r["rhs"])
              for r in bpe_train(s2f, rounds=6).collect()]
    bpe = bpe_apply(s2f, merges)
    packed = pack_shards(
        s2f.select("doc_id", "lang").join(bpe, "doc_id"),
        "doc_id", "n_bpe_tokens", budget=4000, partition_col="lang")
    return (packed.groupBy("lang", "shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_bpe_tokens").cast("long")
                 .alias("shard_tokens")))


def _pipeline_v3_oracle_sql(rounds: int = 6) -> str:
    """One CTE chain replaying all three v3 stages; BPE trains on the
    surviving corpus (s2 CTE) via the shared generator."""
    mrg = ", ".join(f"(SELECT pair FROM b{r}) AS p{r}"
                    for r in range(1, rounds + 1))
    seq = "' ' || array_to_string(string_split(w, ''), ' ') || ' '"
    for r in range(1, rounds + 1):
        pat = f"' ' || p{r} || ' '"
        rep = f"' ' || replace(p{r}, ' ', '') || ' '"
        seq = f"replace(replace({seq}, {pat}, {rep}), {pat}, {rep})"
    head = """
WITH RECURSIVE
toks0 AS MATERIALIZED (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents),
gr AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
  FROM toks0, UNNEST(range(1, len(ws) - 6)) t(i)
  WHERE len(ws) >= 8),
keep AS (
  SELECT g FROM gr GROUP BY g
  HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= 16),
gk AS MATERIALIZED (
  SELECT gr.doc_id, gr.pos, gr.g FROM gr JOIN keep USING (g)),
gpairs AS (
  SELECT a.doc_id AS id_a, a.pos AS pa, b.doc_id AS id_b, b.pos AS pb
  FROM gk a JOIN gk b ON a.g = b.g AND a.doc_id < b.doc_id),
isl AS (
  SELECT id_a, id_b, pa,
         pa - ROW_NUMBER() OVER (
           PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS isl,
         pa - pb AS diag
  FROM gpairs),
spandrop AS MATERIALIZED (
  SELECT DISTINCT id_b AS doc_id FROM isl
  GROUP BY id_a, id_b, diag, isl HAVING COUNT(*) + 7 >= 20),
s1 AS MATERIALIZED (
  SELECT d.* FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM spandrop)),
toks1 AS MATERIALIZED (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ws
  FROM s1),
sh AS MATERIALIZED (
  SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
        i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
        AS mh
  FROM toks1 WHERE len(ws) >= 3),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id),
ver AS MATERIALIZED (
  SELECT id_a, id_b
  FROM cand JOIN s1 x ON x.doc_id = id_a
            JOIN s1 y ON y.doc_id = id_b
  WHERE 1 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
            / GREATEST(GREATEST(length(x.text), length(y.text)), 1)
        >= 0.6),
vsym AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM ver
  UNION SELECT id_b, id_a FROM ver),
vreach(a, b) AS (
  SELECT a, b FROM vsym
  UNION
  SELECT r.a, s.b FROM vreach r JOIN vsym s ON s.a = r.b),
vclust AS MATERIALIZED (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
  FROM vreach GROUP BY 1),
s2 AS MATERIALIZED (
  SELECT s1.* FROM s1
  WHERE s1.doc_id NOT IN (
    SELECT doc_id FROM vclust WHERE doc_id <> cluster)),
"""
    tail = f""",
mrg AS (SELECT {mrg}),
bpec AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST(COALESCE(list_sum(list_transform(ws,
           w -> len(string_split(trim({seq}), ' ')))), 0) AS BIGINT)
           AS nb
  FROM (SELECT doc_id, lang, list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')
          AS ws FROM s2), mrg),
pk AS (
  SELECT lang, doc_id, nb,
         SUM(nb) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM bpec)
SELECT lang, CAST(floor((cum - nb) / 4000.0) AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs, CAST(SUM(nb) AS BIGINT) AS shard_tokens
FROM pk GROUP BY 1, 2"""
    return head + _bpe_ctes(rounds, source="s2") + tail


def q_rec_precision_at_k(spark, sf_dir):
    """Leakage-safe offline evaluation of the item-CF recommender:
    train the co-occurrence neighbors ONLY on pre-1997 baskets,
    recommend top-3 per customer, score against what each customer
    actually first bought in 1997+ (parts not owned before the
    cutoff).  Emits the corpus-level precision@3 and hit-rate —
    the recsys audit loop q:item_recommendations feeds.  Temporal
    split = the grouped_split/ split_leakage_check discipline applied
    to recommendations; identical caps and 9 dp DECIMAL scores keep
    the replay exact."""
    from pyspark.sql import Window as W
    t = load_tables(spark, sf_dir)
    ol = (t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
          .join(t["lineitem"].select("l_orderkey", "l_partkey"),
                F.col("o_orderkey") == F.col("l_orderkey")))
    train = (ol.where(F.col("o_orderdate") < "1997-01-01")
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_partkey").alias("p")).distinct()
             .localCheckpoint(eager=True))
    test = (ol.where(F.col("o_orderdate") >= "1997-01-01")
            .select(F.col("o_custkey").alias("c"),
                    F.col("l_partkey").alias("p")).distinct()
            .join(train, ["c", "p"], "left_anti"))
    sz = train.groupBy("c").agg(F.count("*").alias("nb"))
    capped = train.join(sz.where(F.col("nb") <= 100).select("c"), "c")
    pop = train.groupBy("p").agg(F.count("*").alias("pop"))
    a, b = capped.alias("a"), capped.alias("b")
    cooc = (a.join(b, (F.col("a.c") == F.col("b.c"))
                   & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
            .agg(F.count("*").alias("cooc"))
            .where(F.col("cooc") >= 2))
    jac = (cooc
           .join(F.broadcast(pop.select(F.col("p").alias("pa"),
                                        F.col("pop").alias("na"))), "pa")
           .join(F.broadcast(pop.select(F.col("p").alias("pb"),
                                        F.col("pop").alias("nb"))), "pb")
           .select("pa", "pb",
                   F.round(F.col("cooc")
                           / (F.col("na") + F.col("nb") - F.col("cooc")),
                           9).cast("decimal(18,9)").alias("jac")))
    nbrs_all = (jac.select(F.col("pa").alias("p"),
                           F.col("pb").alias("q"), "jac")
                .unionByName(jac.select(F.col("pb").alias("p"),
                                        F.col("pa").alias("q"), "jac")))
    wn = W.partitionBy("p").orderBy(F.col("jac").desc(), F.col("q"))
    nbrs = (nbrs_all.withColumn("_nr", F.row_number().over(wn))
            .where(F.col("_nr") <= 20).drop("_nr"))
    scored = (capped.join(nbrs, capped["p"] == nbrs["p"])
              .groupBy("c", "q")
              .agg(F.sum("jac").cast("decimal(28,9)").alias("s"))
              .join(train.select("c", F.col("p").alias("q")),
                    ["c", "q"], "left_anti"))
    w = W.partitionBy("c").orderBy(F.col("s").desc(), F.col("q"))
    recs = (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("c", "q"))
    eligible = (recs.select("c").distinct()
                .join(test.select("c").distinct(), "c"))
    hits = (recs.join(test.select("c", F.col("p").alias("q")),
                      ["c", "q"])
            .groupBy("c").agg(F.count("*").alias("h")))
    per_user = (eligible.join(hits, "c", "left")
                .select("c", F.coalesce("h", F.lit(0)).alias("h")))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("h").cast("long").alias("sum_hits"),
        F.round(F.sum("h") / (3 * F.count("*")), 6)
        .alias("precision_at_3"),
        F.round(F.sum(F.when(F.col("h") > 0, 1).otherwise(0))
                / F.count("*"), 6).alias("hit_rate"))


_REC_PRECISION_ORACLE = """
WITH ol AS (
  SELECT o_custkey AS c, l_partkey AS p, o_orderdate
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
train AS (
  SELECT DISTINCT c, p FROM ol
  WHERE o_orderdate < '1997-01-01'),
test AS (
  SELECT DISTINCT t.c, t.p FROM ol t
  LEFT JOIN train tr ON tr.c = t.c AND tr.p = t.p
  WHERE t.o_orderdate >= '1997-01-01' AND tr.p IS NULL),
capped AS (
  SELECT b.* FROM train b
  JOIN (SELECT c FROM train GROUP BY c HAVING COUNT(*) <= 100) k
    USING (c)),
pop AS (SELECT p, COUNT(*) AS pop FROM train GROUP BY p),
cooc AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cooc
  FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
jac AS (
  SELECT pa, pb,
         CAST(round(cooc * 1.0 / (na.pop + nb.pop - cooc), 9)
              AS DECIMAL(18,9)) AS jac
  FROM cooc JOIN pop na ON na.p = pa JOIN pop nb ON nb.p = pb),
nbrs_all AS (
  SELECT pa AS p, pb AS q, jac FROM jac
  UNION ALL SELECT pb, pa, jac FROM jac),
nbrs AS (
  SELECT p, q, jac FROM (
    SELECT p, q, jac,
           row_number() OVER (PARTITION BY p
                              ORDER BY jac DESC, q) AS nr
    FROM nbrs_all) WHERE nr <= 20),
scored AS (
  SELECT cp.c, n.q, SUM(n.jac) AS s
  FROM capped cp JOIN nbrs n ON n.p = cp.p GROUP BY 1, 2),
fresh AS (
  SELECT s.* FROM scored s
  LEFT JOIN train o ON o.c = s.c AND o.p = s.q
  WHERE o.p IS NULL),
recs AS (
  SELECT c, q FROM (
    SELECT c, q,
           row_number() OVER (PARTITION BY c ORDER BY s DESC, q) AS rn
    FROM fresh) WHERE rn <= 3),
eligible AS (
  SELECT DISTINCT r.c FROM recs r
  JOIN (SELECT DISTINCT c FROM test) t ON t.c = r.c),
hits AS (
  SELECT r.c, COUNT(*) AS h
  FROM recs r JOIN test t ON t.c = r.c AND t.p = r.q
  GROUP BY 1),
per_user AS (
  SELECT e.c, COALESCE(h.h, 0) AS h
  FROM eligible e LEFT JOIN hits h ON h.c = e.c)
SELECT COUNT(*) AS n_users,
       CAST(SUM(h) AS BIGINT) AS sum_hits,
       round(SUM(h) * 1.0 / (3 * COUNT(*)), 6) AS precision_at_3,
       round(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*),
             6) AS hit_rate
FROM per_user
"""


def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, account-balance band): how many customers sit in
    equivalence classes smaller than k — the re-identification risk
    screen a training corpus with user-derived fields needs before
    release.  One groupBy for class sizes, one tiny rollup per k.
    Exact integers; the QI banding is width-based (floor to $1000),
    so no rank nondeterminism."""
    t = load_tables(spark, sf_dir)
    qi = (t["customer"]
          .join(F.broadcast(t["nation"].select(
              F.col("n_nationkey").alias("c_nationkey"),
              "n_name")), "c_nationkey")
          .select("n_name", "c_mktsegment",
                  F.floor(F.col("c_acctbal").cast("decimal(18,2)")
                          / 1000).cast("long").alias("bal_band")))
    sizes = (qi.groupBy("n_name", "c_mktsegment", "bal_band")
             .agg(F.count("*").alias("cls")))
    total = qi.count()
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k int")
    return (sizes.crossJoin(F.broadcast(ks))
            .groupBy("k")
            .agg(F.sum(F.when(F.col("cls") < F.col("k"), F.col("cls"))
                       .otherwise(0)).cast("long").alias("n_at_risk"),
                 F.count(F.when(F.col("cls") < F.col("k"), 1))
                 .cast("long").alias("classes_below_k"))
            .select("k", "n_at_risk", "classes_below_k",
                    F.round(F.col("n_at_risk") / F.lit(total), 6)
                    .alias("risk_share")))


_K_ANON_ORACLE = """
WITH qi AS (
  SELECT n_name, c_mktsegment,
         CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / 1000)
              AS BIGINT) AS bal_band
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
sizes AS (
  SELECT n_name, c_mktsegment, bal_band, COUNT(*) AS cls
  FROM qi GROUP BY 1, 2, 3),
ks(k) AS (VALUES (2), (5), (10))
SELECT k,
       CAST(SUM(CASE WHEN cls < k THEN cls ELSE 0 END) AS BIGINT)
         AS n_at_risk,
       CAST(COUNT(CASE WHEN cls < k THEN 1 END) AS BIGINT)
         AS classes_below_k,
       round(SUM(CASE WHEN cls < k THEN cls ELSE 0 END) * 1.0
             / (SELECT COUNT(*) FROM qi), 6) AS risk_share
FROM sizes, ks GROUP BY k
"""


def q_posting_lists(spark, sf_dir):
    """The inverted index AS DATA: per-term posting statistics over
    the documents corpus — document frequency, collection frequency,
    and the posting span (min/max doc id) for the 30 highest-cf
    terms.  This is fts.build_tf_index's shape surfaced as a
    queryable artifact (what a search/RAG pipeline ships to its
    serving tier); one explode + one map-side-combinable aggregate,
    the corpus shuffles once on the term."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id",
                       F.explode(text.tokens(F.col("text")))
                       .alias("term"))
    return (toks.groupBy("term")
            .agg(F.count_distinct("doc_id").alias("df"),
                 F.count("*").alias("cf"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .orderBy(F.col("cf").desc(), "term").limit(30))


_POSTING_LISTS_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')
          AS ws FROM documents),
       UNNEST(ws) AS t(term))
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM toks GROUP BY 1
ORDER BY cf DESC, term LIMIT 30
"""


def q_wasserstein_drift(spark, sf_dir):
    """1-D Wasserstein-1 (earth-mover) distance between the 1996 and
    1997+ order-value distributions, per market segment — the drift
    metric that, unlike PSI (q:psi_drift) and JSD (q:jsd_daily_mix),
    weighs HOW FAR mass moved, not just that bins changed; unlike KS
    (q:ks_statistic) it integrates the whole CDF gap instead of taking
    its sup.  On a $5k bucket grid, W1 = width · Σ_b |F_ref(b) −
    F_cur(b)|, computed EXACTLY: the summand is the BIGINT
    |cum_ref·N_cur − cum_cur·N_ref| (order-free sum), and only the
    final width/(N_ref·N_cur) scaling is IEEE.  Shapes: one
    aggregation on (segment, bucket, window), cumulative sums over the
    per-segment bucket grid (bounded: ≤ ~120 buckets), broadcast
    totals — scales as a pure groupBy."""
    o = load_tables(spark, sf_dir)["orders"]
    c = load_tables(spark, sf_dir)["customer"]
    width = 5000
    rows = (o.join(F.broadcast(c.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
                "o_custkey")
            .select("c_mktsegment",
                    F.floor(F.col("o_totalprice").cast("double")
                            / width).cast("long").alias("b"),
                    (F.col("o_orderdate") < F.lit("1997-01-01"))
                    .alias("is_ref")))
    cnt = (rows.groupBy("c_mktsegment", "b")
           .agg(F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
                .alias("n_ref"),
                F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
                .alias("n_cur")))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("c_mktsegment").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = cnt.select(
        "c_mktsegment", "b",
        F.sum("n_ref").over(w).alias("cum_ref"),
        F.sum("n_cur").over(w).alias("cum_cur"))
    tot = (rows.groupBy("c_mktsegment")
           .agg(F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
                .alias("t_ref"),
                F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
                .alias("t_cur")))
    return (cum.join(F.broadcast(tot), "c_mktsegment")
            .groupBy("c_mktsegment")
            .agg(F.sum(F.abs(F.col("cum_ref") * F.col("t_cur")
                             - F.col("cum_cur") * F.col("t_ref")))
                 .alias("num"),
                 F.min("t_ref").alias("t_ref"),
                 F.min("t_cur").alias("t_cur"))
            .select(F.col("c_mktsegment").alias("segment"),
                    F.col("t_ref").cast("long").alias("n_ref"),
                    F.col("t_cur").cast("long").alias("n_cur"),
                    F.round(F.lit(width) * F.col("num")
                            / (F.col("t_ref").cast("double")
                               * F.col("t_cur").cast("double")), 6)
                    .alias("w1_dollars")))


_WASSERSTEIN_ORACLE = """
WITH rows_ AS (
  SELECT c_mktsegment,
         CAST(FLOOR(CAST(o_totalprice AS DOUBLE) / 5000) AS BIGINT) AS b,
         o_orderdate < DATE '1997-01-01' AS is_ref
  FROM orders JOIN customer ON o_custkey = c_custkey),
cnt AS (
  SELECT c_mktsegment, b,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
  FROM rows_ GROUP BY 1, 2),
cum AS (
  SELECT c_mktsegment, b,
         SUM(n_ref) OVER (PARTITION BY c_mktsegment ORDER BY b
                          ROWS UNBOUNDED PRECEDING) AS cum_ref,
         SUM(n_cur) OVER (PARTITION BY c_mktsegment ORDER BY b
                          ROWS UNBOUNDED PRECEDING) AS cum_cur
  FROM cnt),
tot AS (
  SELECT c_mktsegment,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS t_ref,
         SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS t_cur
  FROM rows_ GROUP BY 1)
SELECT cum.c_mktsegment AS segment,
       CAST(MIN(tot.t_ref) AS BIGINT) AS n_ref,
       CAST(MIN(tot.t_cur) AS BIGINT) AS n_cur,
       ROUND(5000 * SUM(ABS(cum.cum_ref * tot.t_cur
                            - cum.cum_cur * tot.t_ref))
             / (CAST(MIN(tot.t_ref) AS DOUBLE)
                * CAST(MIN(tot.t_cur) AS DOUBLE)), 6) AS w1_dollars
FROM cum JOIN tot USING (c_mktsegment)
GROUP BY 1
"""


def q_weighted_reservoir(spark, sf_dir):
    """Exact-size weighted sampling WITHOUT replacement per group —
    Efraimidis–Spirakis A-Res, the distributed answer when "sample
    exactly k docs per source, probability ∝ length" must be one pass
    (hash-gated Bernoulli — q:weighted_sample — only controls the
    EXPECTED size): each row draws key = -ln(u)/w and the k smallest
    keys win, which provably equals sequential weighted sampling.
    Deterministic + libm-proof: u = (h+1)/2^60 from a 60-bit md5, so
    -ln(u) = ln(2^60) − ln(h+1) computes on the 9 dp integer-ln ladder
    (exact DECIMAL subtraction), and the final key is one IEEE divide
    of that decimal by the weight.  Scale shape: one hash + one
    per-group top-k window (map-side partial TakeOrdered at 100 TB via
    groupBy-min_by alternatives; the window here is per-source)."""
    k = 10
    docs = _docs(spark, sf_dir).select("source", "doc_id", "n_chars")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long")
    ln_u = (F.lit("41.588830834").cast("decimal(18,9)")
            - F.round(F.log((h + 1).cast("double")), 9)
            .cast("decimal(18,9)"))
    key = ln_u.cast("double") / (F.col("n_chars") + 1).cast("double")
    from pyspark.sql.window import Window
    w = Window.partitionBy("source").orderBy(
        F.asc("key"), F.asc("doc_id"))
    return (docs.withColumn("key", key)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("source", "rk", "doc_id",
                    F.col("n_chars").cast("long").alias("n_chars")))


_WEIGHTED_RESERVOIR_ORACLE = """
WITH d AS (
  SELECT source, doc_id, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM documents),
keyed AS (
  SELECT source, doc_id, n_chars,
         CAST(CAST('41.588830834' AS DECIMAL(18,9))
              - CAST(round(ln(CAST(h + 1 AS DOUBLE)), 9)
                     AS DECIMAL(18,9)) AS DOUBLE)
         / CAST(n_chars + 1 AS DOUBLE) AS key
  FROM d)
SELECT source, rk, doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY key ASC, doc_id ASC) AS rk
  FROM keyed)
WHERE rk <= 10
"""


def q_kmv_setops(spark, sf_dir):
    """KMV (bottom-k / theta) sketch set operations — the mergeable
    distinct-count sketch family (Beyer et al. 2007) alongside
    q:hll_distinct and q:cms_heavy_hitters: sets are the click / the
    purchase active (user, day) pairs; each sketch keeps the k=64
    smallest 60-bit md5 hashes; D̂ = (k-1)·2^60 / h_(k) (exact size
    when |S| < k), union = bottom-k of the merged sketch, intersection
    via the Jaccard share of combined-sketch members present in both —
    every number derives from md5 integers + one final IEEE op, so the
    DuckDB oracle replays it bit-for-bit.  Scale shape: the per-set
    bottom-k is a TakeOrdered (partial per partition, k-merge at the
    driver), the element frames are distinct-aggregations — no
    all-pairs anything; a 100 TB set costs one pass."""
    k = 64
    m = F.lit(1152921504606846976)  # 2^60
    ev = load_tables(spark, sf_dir)["events"]

    def hashes(etype):
        e = (ev.where(F.col("event_type") == etype)
             .select(F.concat_ws("|", F.col("user_id"),
                                 F.to_date("ts")).alias("e"))
             .distinct())
        return e.select(F.conv(F.substring(F.md5("e"), 1, 15), 16, 10)
                        .cast("long").alias("h")).distinct()

    def sketch(h, name):
        bot = h.orderBy("h").limit(k)
        return bot.agg(
            F.count("*").alias(f"n_{name}"),
            F.max("h").alias(f"kth_{name}"))

    def est(n, kth):
        # (k-1)*2^60 overflows BIGINT: lift to double FIRST (63*2^60
        # is exactly representable — 6-bit mantissa), one IEEE divide
        return F.when(n < k, n.cast("double")) \
                .otherwise((k - 1) * m.cast("double") / kth)

    ha, hb = hashes("click"), hashes("purchase")
    hu = ha.unionByName(hb).distinct()
    ku = hu.orderBy("h").limit(k)
    shared = (ku.join(ha, "h", "left_semi")
              .join(hb, "h", "left_semi")
              .agg(F.count("*").alias("n_shared")))
    row = (sketch(ha, "a").crossJoin(sketch(hb, "b"))
           .crossJoin(sketch(hu, "u")).crossJoin(shared)
           .crossJoin(ha.agg(F.count("*").alias("exact_a")))
           .crossJoin(hb.agg(F.count("*").alias("exact_b"))))
    eu = est(F.col("n_u"), F.col("kth_u"))
    return row.select(
        F.lit(k).alias("k"),
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.round(est(F.col("n_a"), F.col("kth_a")), 6).alias("est_a"),
        F.round(est(F.col("n_b"), F.col("kth_b")), 6).alias("est_b"),
        F.round(eu, 6).alias("est_union"),
        F.round(F.col("n_shared") / F.col("n_u") * eu, 6)
        .alias("est_inter"))


_KMV_SETOPS_ORACLE = """
WITH ha AS (
  SELECT DISTINCT ('0x' || substr(md5(e), 1, 15))::BIGINT AS h
  FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) || '|'
               || strftime(CAST(ts AS DATE), '%Y-%m-%d') AS e
        FROM events WHERE event_type = 'click')),
hb AS (
  SELECT DISTINCT ('0x' || substr(md5(e), 1, 15))::BIGINT AS h
  FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) || '|'
               || strftime(CAST(ts AS DATE), '%Y-%m-%d') AS e
        FROM events WHERE event_type = 'purchase')),
hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
ka AS (SELECT COUNT(*) AS n_a, MAX(h) AS kth_a
       FROM (SELECT h FROM ha ORDER BY h LIMIT 64)),
kb AS (SELECT COUNT(*) AS n_b, MAX(h) AS kth_b
       FROM (SELECT h FROM hb ORDER BY h LIMIT 64)),
kub AS (SELECT h FROM hu ORDER BY h LIMIT 64),
ku AS (SELECT COUNT(*) AS n_u, MAX(h) AS kth_u FROM kub),
sh AS (SELECT COUNT(*) AS n_shared FROM kub
       WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)),
ex AS (SELECT (SELECT COUNT(*) FROM ha) AS exact_a,
              (SELECT COUNT(*) FROM hb) AS exact_b)
SELECT 64 AS k,
       CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       ROUND(CASE WHEN n_a < 64 THEN CAST(n_a AS DOUBLE)
                  ELSE 63 * CAST(1152921504606846976 AS DOUBLE) / kth_a END, 6) AS est_a,
       ROUND(CASE WHEN n_b < 64 THEN CAST(n_b AS DOUBLE)
                  ELSE 63 * CAST(1152921504606846976 AS DOUBLE) / kth_b END, 6) AS est_b,
       ROUND(CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
                  ELSE 63 * CAST(1152921504606846976 AS DOUBLE) / kth_u END, 6)
         AS est_union,
       ROUND(n_shared / CAST(n_u AS DOUBLE)
             * (CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
                     ELSE 63 * CAST(1152921504606846976 AS DOUBLE) / kth_u END), 6)
         AS est_inter
FROM ka, kb, ku, sh, ex
"""


def q_l_diversity(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2007), the step after
    k-anonymity (q:k_anonymity): a QI class whose SENSITIVE attribute
    is homogeneous leaks the attribute even when the class is large.
    QI = (nation, $1000 balance band), sensitive = market segment;
    for l in {2,3,5}: classes with < l distinct sensitive values, the
    records inside them, and their share.  Exact integers end-to-end
    (distinct counts + one final 6 dp division); two map-side-combined
    aggregations, broadcast dim join — scales as a pure groupBy."""
    t = load_tables(spark, sf_dir)
    qi = (t["customer"]
          .join(F.broadcast(t["nation"].select(
              F.col("n_nationkey").alias("c_nationkey"), "n_name")),
              "c_nationkey")
          .select("n_name",
                  F.floor(F.col("c_acctbal").cast("decimal(18,2)")
                          / 1000).cast("long").alias("bal_band"),
                  "c_mktsegment"))
    cls = (qi.groupBy("n_name", "bal_band")
           .agg(F.countDistinct("c_mktsegment").alias("div"),
                F.count("*").alias("n")))
    total = qi.count()
    ls = spark.createDataFrame([(2,), (3,), (5,)], "l int")
    return (cls.crossJoin(F.broadcast(ls))
            .groupBy("l")
            .agg(F.count(F.when(F.col("div") < F.col("l"), 1))
                 .cast("long").alias("classes_below_l"),
                 F.sum(F.when(F.col("div") < F.col("l"), F.col("n"))
                       .otherwise(0)).cast("long").alias("n_at_risk"))
            .select("l", "classes_below_l", "n_at_risk",
                    F.round(F.col("n_at_risk") / F.lit(total), 6)
                    .alias("risk_share")))


_L_DIVERSITY_ORACLE = """
WITH qi AS (
  SELECT n_name,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) / 1000) AS BIGINT)
           AS bal_band,
         c_mktsegment
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
cls AS (
  SELECT n_name, bal_band,
         COUNT(DISTINCT c_mktsegment) AS div, COUNT(*) AS n
  FROM qi GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS total FROM qi)
SELECT l.l,
       CAST(COUNT(CASE WHEN div < l.l THEN 1 END) AS BIGINT)
         AS classes_below_l,
       CAST(SUM(CASE WHEN div < l.l THEN n ELSE 0 END) AS BIGINT)
         AS n_at_risk,
       ROUND(SUM(CASE WHEN div < l.l THEN n ELSE 0 END)
             / CAST(MIN(tot.total) AS DOUBLE), 6) AS risk_share
FROM cls CROSS JOIN (SELECT UNNEST([2, 3, 5]) AS l) l CROSS JOIN tot
GROUP BY l.l
"""


def q_t_closeness(spark, sf_dir):
    """t-closeness audit (Li et al. 2007): even an l-diverse class
    leaks when its sensitive-value DISTRIBUTION sits far from the
    corpus-wide one.  Per QI class (nation, $1000 balance band): total
    variation distance between the class's market-segment mix and the
    global mix, computed EXACTLY — TVD = Σ|cnt_cs·N − cnt_s·n_c| /
    (2·n_c·N), whose numerator is an order-free BIGINT sum over the
    dense class × segment grid (absent segments contribute cnt_cs=0),
    and only the final division is IEEE.  Top 10 most-skewed classes
    of size ≥ 5.  Shapes: two groupBys + one broadcast of the 5-row
    segment table — scales as a pure aggregation."""
    t = load_tables(spark, sf_dir)
    qi = (t["customer"]
          .join(F.broadcast(t["nation"].select(
              F.col("n_nationkey").alias("c_nationkey"), "n_name")),
              "c_nationkey")
          .select("n_name",
                  F.floor(F.col("c_acctbal").cast("decimal(18,2)")
                          / 1000).cast("long").alias("bal_band"),
                  "c_mktsegment"))
    seg = qi.groupBy("c_mktsegment").agg(F.count("*").alias("cnt_s"))
    n_total = qi.count()
    cs = (qi.groupBy("n_name", "bal_band", "c_mktsegment")
          .agg(F.count("*").alias("cnt_cs")))
    cls = (qi.groupBy("n_name", "bal_band")
           .agg(F.count("*").alias("n_c")))
    dense = (cls.crossJoin(F.broadcast(seg))
             .join(cs, ["n_name", "bal_band", "c_mktsegment"], "left")
             .withColumn("cnt_cs", F.coalesce("cnt_cs", F.lit(0))))
    return (dense.groupBy("n_name", "bal_band")
            .agg(F.min("n_c").alias("n_c"),
                 F.sum(F.abs(F.col("cnt_cs") * n_total
                             - F.col("cnt_s") * F.col("n_c")))
                 .alias("num"))
            .where(F.col("n_c") >= 5)
            .select("n_name", "bal_band",
                    F.col("n_c").cast("long").alias("n"),
                    F.round(F.col("num")
                            / (2.0 * F.col("n_c") * n_total), 6)
                    .alias("tvd"))
            .orderBy(F.desc("tvd"), "n_name", "bal_band").limit(10))


_T_CLOSENESS_ORACLE = """
WITH qi AS (
  SELECT n_name,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) / 1000) AS BIGINT)
           AS bal_band,
         c_mktsegment
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
seg AS (SELECT c_mktsegment, COUNT(*) AS cnt_s FROM qi GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM qi),
cs AS (SELECT n_name, bal_band, c_mktsegment, COUNT(*) AS cnt_cs
       FROM qi GROUP BY 1, 2, 3),
cls AS (SELECT n_name, bal_band, COUNT(*) AS n_c FROM qi GROUP BY 1, 2),
dense AS (
  SELECT cls.n_name, cls.bal_band, cls.n_c, seg.cnt_s,
         COALESCE(cs.cnt_cs, 0) AS cnt_cs
  FROM cls CROSS JOIN seg
  LEFT JOIN cs ON cs.n_name = cls.n_name
             AND cs.bal_band = cls.bal_band
             AND cs.c_mktsegment = seg.c_mktsegment)
SELECT n_name, bal_band, n, tvd FROM (
  SELECT dense.n_name, dense.bal_band,
         CAST(MIN(dense.n_c) AS BIGINT) AS n,
         ROUND(SUM(ABS(dense.cnt_cs * tot.n - dense.cnt_s * dense.n_c))
               / (2.0 * MIN(dense.n_c) * MIN(tot.n)), 6) AS tvd
  FROM dense CROSS JOIN tot
  GROUP BY dense.n_name, dense.bal_band
  HAVING MIN(dense.n_c) >= 5
  ORDER BY tvd DESC, dense.n_name, dense.bal_band LIMIT 10)
"""


def q_video_features(spark, sf_dir):
    """REAL video-container path: synthesized ISO-BMFF/MP4 payloads
    (multimodal.make_mp4 — public MPEG-4 Part 12 box structure) decoded
    back by pure box-walking: mvhd timescale/duration, tkhd 16.16
    dimensions, stts sample-run frame count, all from the actual bytes.
    The oracle recomputes each field from the construction formula — a
    mismatch means the box walker misread the container.  Narrow
    Arrow-batched map, no shuffle — scales as a pure scan."""
    from .operators.multimodal import documents_as_video, video_features
    return video_features(documents_as_video(_docs(spark, sf_dir)))


_VIDEO_FEATURES_ORACLE = """
SELECT doc_id AS media_id, 'mp4' AS fmt,
       CAST(16 + n_chars % 120 AS INT) AS width,
       CAST(16 + (n_chars // 7) % 120 AS INT) AS height,
       CAST(1 + doc_id % 24 AS INT) AS n_frames,
       CAST((1 + doc_id % 24) * 100 AS BIGINT) AS duration_ms
FROM documents
"""


ORACLES: dict[str, str | None] = {
    "video_features": _VIDEO_FEATURES_ORACLE,
    "kmv_setops": _KMV_SETOPS_ORACLE,
    "weighted_reservoir": _WEIGHTED_RESERVOIR_ORACLE,
    "l_diversity": _L_DIVERSITY_ORACLE,
    "t_closeness": _T_CLOSENESS_ORACLE,
    "node_kind_counts": _NODE_KINDS_SQL,
    "edge_kind_counts": _EDGE_KINDS_SQL,
    "filter_json": (
        "SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid "
        "FROM customer WHERE c_mktsegment = 'BUILDING'"),
    "filter_glob": (
        "SELECT uid FROM (SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) "
        "AS uid FROM customer) WHERE uid GLOB 'Customer:1?'"),
    "one_hop": (
        "SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid, "
        "o_totalprice AS total FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 300000"),
    "two_hop": (
        "SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"),
    "three_hop": (
        "SELECT DISTINCT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN part ON p_partkey = l_partkey WHERE p_size = 10"),
    "group_count": (
        "SELECT 'Customer:' || CAST(o_custkey AS VARCHAR) AS uid, "
        "COUNT(*) AS ordercount FROM orders GROUP BY o_custkey"),
    "optional_match": """
        SELECT 'Customer:' || CAST(c.c_custkey AS VARCHAR) AS uid,
               COUNT(o.o_orderkey) AS ordercount
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    "order_limit": (
        "SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid, "
        "o_totalprice AS total FROM orders "
        "ORDER BY total DESC, uid ASC LIMIT 10"),
    "count_distinct": (
        "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders"),
    "traverse_out": (
        "SELECT DISTINCT 'Event:' || CAST(event_id AS VARCHAR) AS uid "
        "FROM events WHERE user_id < 5"),
    "degree_supplier": (
        "SELECT 'Supplier:' || CAST(s.s_suppkey AS VARCHAR) AS uid, "
        "CAST(1 + COALESCE(li.cnt, 0) AS BIGINT) AS degree "
        "FROM supplier s LEFT JOIN (SELECT l_suppkey, COUNT(*) AS cnt "
        "FROM lineitem GROUP BY l_suppkey) li ON s.s_suppkey = li.l_suppkey"),
    "set_difference": (
        "SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid "
        "FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders)"),
    "set_intersection": (
        "SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid "
        "FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000"),
    "fts_term": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE list_contains("
        + _TOKENIZE_DUCK.format(col="text") + ", 'data')"),
    "fts_prefix": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE len(list_filter("
        + _TOKENIZE_DUCK.format(col="text") + ", x -> x LIKE 'quer%')) > 0"),
    "fts_and": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE list_contains("
        + _TOKENIZE_DUCK.format(col="text") + ", 'data') AND list_contains("
        + _TOKENIZE_DUCK.format(col="text") + ", 'query')"),
    "fts_phrase": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE instr(' ' || array_to_string(list_filter("
        + _TOKENIZE_DUCK.format(col="text")
        + ", x -> x != ''), ' ') || ' ', ' table hash ') > 0"),
    "sql_escape_hatch": (
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 45"),
    "graph_q1": _Q1_SQL,
    "tpch_q1": _Q1_SQL,
    "tpch_q6": _Q6_SQL,
    "orders_by_segment": _Q3ISH_SQL,
    "dedup_exact": (
        "SELECT md5(array_to_string(list_filter("
        + _TOKENIZE_DUCK.format(col="text") + ", x -> x != ''), ' ')) AS fp, "
        "COUNT(*) AS n_dups, MIN(doc_id) AS keep_id "
        "FROM documents GROUP BY fp"),
    "minhash_pairs": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
          FROM documents
        ), sh AS (
          SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
                i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
                AS mh
          FROM toks WHERE len(ws) >= 3
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id
    """,
    "top_bigrams": """
        WITH toks AS (
          SELECT list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
                             x -> x != '') AS ws
          FROM documents
        ),
        bg AS (
          SELECT unnest(list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i+1])) AS bigram
          FROM toks
        )
        SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram ASC LIMIT 20
    """,
    "dedup_clusters": ("WITH RECURSIVE " + _CLUSTER_CTES + """
        SELECT src AS doc_id, MIN(dst) AS cluster FROM reach GROUP BY src
    """),
    "dedup_resolve": ("WITH RECURSIVE " + _CLUSTER_CTES + """,
        cl AS (SELECT src AS doc_id, MIN(dst) AS cluster
               FROM reach GROUP BY src),
        scored AS (
          SELECT cl.cluster, cl.doc_id, CAST(length(d.text) AS BIGINT) AS s
          FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
        SELECT cluster, doc_id AS keep_id, s AS best_score, n_members
        FROM (SELECT cluster, doc_id, s,
                     COUNT(*) OVER (PARTITION BY cluster) AS n_members,
                     row_number() OVER (PARTITION BY cluster
                                        ORDER BY s DESC, doc_id) AS rn
              FROM scored)
        WHERE rn = 1
    """),
    "text_stats": (
        "SELECT doc_id, CAST(len(list_filter("
        + _TOKENIZE_DUCK.format(col="text") + ", x -> x != '')) AS BIGINT) "
        "AS n_tokens, CAST(length(text) AS BIGINT) AS n_chars_obs "
        "FROM documents"),
    "token_count_by_lang": (
        "SELECT lang, CAST(SUM(len(list_filter("
        + _TOKENIZE_DUCK.format(col="text") + ", x -> x != ''))) AS BIGINT) "
        "AS total_tokens FROM documents GROUP BY lang"),
    "quality_score": """
        SELECT doc_id,
          CAST(len(list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'),
            x -> list_contains(['the','a','of','and','to','in','is','for',
                                'on','with'], x))) AS BIGINT) AS n_stopwords,
          CAST(len(list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'),
            x -> x != '')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    "knn_cosine": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id,
            list_sum(list_transform(range(1, len(e.embedding)+1),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
                 i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE)))))
            AS cos
          FROM embeddings e, q WHERE e.vec_id != 0
        )
        SELECT vec_id, round(cos, 6) AS cosine
        FROM scored ORDER BY cos DESC, vec_id LIMIT 5
    """,
    "events_window": """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS DOUBLE) AS wstart,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2
    """,
    "sessionize": """
        WITH g AS (
          SELECT user_id, ts,
            CASE WHEN (CAST(epoch_us(ts) AS DOUBLE)
                     - CAST(epoch_us(LAG(ts) OVER
                 (PARTITION BY user_id ORDER BY ts)) AS DOUBLE)) / 1e6 > 1800
                 THEN 1 ELSE 0 END AS brk
          FROM events
        ), s AS (
          SELECT user_id,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess
          FROM g
        )
        SELECT user_id, CAST(MAX(sess) + 1 AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id
    """,
    "offset_page": (
        "SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid, "
        "o_totalprice AS total FROM orders "
        "ORDER BY total DESC, uid ASC LIMIT 10 OFFSET 10"),
    "group_concat": (
        "SELECT 'Nation:' || CAST(s_nationkey AS VARCHAR) AS uid, "
        "string_agg(s_name, ',' ORDER BY s_name) AS snames "
        "FROM supplier GROUP BY s_nationkey"),
    "theta_join": (
        "SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 100 * c_acctbal"),
    "param_bind": (
        "SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid "
        "FROM customer WHERE c_mktsegment = 'MACHINERY' "
        "AND c_acctbal >= 1000"),
    "point_lookup": (
        "SELECT 'Customer:7' AS uid, 'Customer' AS kind"),
    "edge_prop_filter": (
        "SELECT DISTINCT 'Part:' || CAST(l_partkey AS VARCHAR) AS uid "
        "FROM lineitem WHERE l_returnflag = 'R'"),
    "fts_or": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE list_contains("
        + _TOKENIZE_DUCK.format(col="text") + ", 'data') OR list_contains("
        + _TOKENIZE_DUCK.format(col="text") + ", 'stream')"),
    "fts_not": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE list_contains("
        + _TOKENIZE_DUCK.format(col="text")
        + ", 'data') AND NOT list_contains("
        + _TOKENIZE_DUCK.format(col="text") + ", 'query')"),
    "fts_field": (
        "SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid "
        "FROM documents WHERE lower(lang) = 'en'"),
    "sliding_window": """
        WITH w AS (
          SELECT event_type,
                 unnest([
                   CAST(epoch(ts) AS DOUBLE) - (CAST(epoch(ts) AS DOUBLE) % 1800),
                   CAST(epoch(ts) AS DOUBLE) - (CAST(epoch(ts) AS DOUBLE) % 1800) - 1800
                 ]) AS wstart
          FROM events
        )
        SELECT wstart, event_type, COUNT(*) AS n
        FROM w GROUP BY wstart, event_type
    """,
    "bpe_token_count": (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        "'[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS BIGINT) AS bpe_tokens "
        "FROM documents"),
    "jaccard_pairs": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
          FROM documents
        ), sh AS (
          SELECT doc_id, list_min(list_transform(range(1, len(ws)-1),
                i -> md5('0:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))
                AS mh
          FROM toks WHERE len(ws) >= 3
        ), cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.mh = b.mh AND a.doc_id < b.doc_id
        ), shd AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
          FROM toks WHERE len(ws) >= 3
        ), scored AS (
          SELECT id_a, id_b,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                 AS j
          FROM cand JOIN shd a ON a.doc_id = id_a
                    JOIN shd b ON b.doc_id = id_b
        )
        SELECT id_a, id_b, round(j, 6) AS jaccard
        FROM scored WHERE j >= 0.3
    """,
    "k_hop": """
        SELECT 'Customer:' || CAST(c_custkey AS VARCHAR) AS uid
          FROM customer WHERE c_custkey < 10
        UNION
        SELECT 'Order:' || CAST(o_orderkey AS VARCHAR)
          FROM orders WHERE o_custkey < 10
        UNION
        SELECT 'Part:' || CAST(l_partkey AS VARCHAR)
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_custkey < 10
        UNION
        SELECT 'Supplier:' || CAST(l_suppkey AS VARCHAR)
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_custkey < 10
        UNION
        SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR)
          FROM customer WHERE c_custkey < 10
        UNION
        SELECT 'Region:' || CAST(n_regionkey AS VARCHAR)
          FROM nation JOIN customer ON c_nationkey = n_nationkey
          WHERE c_custkey < 10
    """,
    "copurchase_pairs": """
        WITH hot AS (SELECT l_partkey FROM lineitem
                     GROUP BY l_partkey HAVING COUNT(*) > 4096)
        SELECT DISTINCT
               'Customer:' || CAST(o1.o_custkey AS VARCHAR) AS uid,
               'Customer:' || CAST(o2.o_custkey AS VARCHAR) AS other
        FROM lineitem l1
        JOIN lineitem l2 ON l1.l_partkey = l2.l_partkey
        JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
        JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
        WHERE 'Customer:' || CAST(o1.o_custkey AS VARCHAR)
            < 'Customer:' || CAST(o2.o_custkey AS VARCHAR)
          AND l1.l_partkey NOT IN (SELECT l_partkey FROM hot)
    """,
    "asof_join": """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), views AS (
          SELECT user_id, ts, MAX(event_id) AS view_id
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts
        )
        SELECT c.event_id, v.view_id
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    "asof_nearest": """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), views AS (
          SELECT user_id, ts, MAX(event_id) AS view_id
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts
        ), cand AS (
          SELECT c.event_id, c.user_id, c.ts,
                 MAX(CASE WHEN v.ts <= c.ts THEN v.ts END) AS bts,
                 MIN(CASE WHEN v.ts >= c.ts THEN v.ts END) AS fts
          FROM clicks c LEFT JOIN views v ON c.user_id = v.user_id
          GROUP BY 1, 2, 3
        ), chosen AS (
          SELECT event_id, user_id,
                 CASE WHEN fts IS NULL THEN bts
                      WHEN bts IS NULL THEN fts
                      WHEN epoch(ts) - epoch(bts) <= epoch(fts) - epoch(ts)
                      THEN bts ELSE fts END AS cts
          FROM cand
        )
        SELECT ch.event_id, v.view_id
        FROM chosen ch LEFT JOIN views v
          ON v.user_id = ch.user_id AND v.ts = ch.cts
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey)
                     AS rn
          FROM orders) WHERE rn <= 3
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_revenue": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev,
               COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "percentile_price": """
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
        FROM orders GROUP BY o_orderpriority
    """,
    "moving_avg_daily": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY CAST(o_orderdate AS DATE)
        )
        SELECT CAST(d AS STRING) AS d,
               CAST(CAST(SUM(rev) OVER w AS DOUBLE)
                    / (COUNT(*) OVER w) AS DOUBLE) AS avg7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "range_join_events": """
        SELECT a.event_id, COUNT(*) AS n_clicks
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'error' AND b.event_type = 'click'
         AND epoch(b.ts) > epoch(a.ts)
         AND epoch(b.ts) <= epoch(a.ts) + 86400.0
        GROUP BY a.event_id
    """,
    "pivot_status": """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    "window_rank": """
        SELECT * FROM (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 rank() OVER w AS rnk,
                 lag(o_totalprice) OVER w AS prev_price
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rnk <= 3
    """,
    "tpch_q3": _Q3_SQL,
    "anti_join_customers": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000)
    """,
    "regex_extract": """
        SELECT doc_id,
               regexp_extract(text, '(spark|stream|scan|sort)', 1) AS kw
        FROM documents
        WHERE regexp_extract(text, '(spark|stream|scan|sort)', 1) != ''
    """,
    "hash_sample": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '10'
    """,
    # same-cell candidate pairs via the shared unrolled-Lloyd chain
    # (k=8, iters=2 — the _ivf_blocked assignment), then the exact
    # cosine fold — the blocked pair set replays engine-identically
    "embedding_near_dup": _ivf_ctes(8, 2) + """,
        p AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            round(
              list_sum(list_transform(range(1, len(a.embedding)+1),
                i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                      * CAST(a.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1),
                   i -> CAST(b.embedding[i] AS DOUBLE)
                      * CAST(b.embedding[i] AS DOUBLE))))), 6) AS cosine
          FROM e a JOIN e b ON a.vec_id < b.vec_id
               JOIN fin fa ON fa.vec_id = a.vec_id
               JOIN fin fb ON fb.vec_id = b.vec_id AND fb.c = fa.c
        )
        SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.35
    """,
    # stopword-vote replay: hits per (doc, lang) from the same stopword
    # lists, argmax = max hits then max code (the engine's array_max on
    # (hits, code) structs).  The VALUES list is generated from
    # text.STOPWORDS so the two sides can never drift.
    "language_id": """
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '[^\\pL\\pN]+'),
            x -> x != '')) AS tok
          FROM documents
        ),
        sw(code, w) AS (VALUES {sw_values}),
        langs AS (SELECT DISTINCT code FROM sw),
        hits AS (
          SELECT d.doc_id, l.code, COUNT(s.w) AS h
          FROM documents d
          CROSS JOIN langs l
          LEFT JOIN toks t ON t.doc_id = d.doc_id
          LEFT JOIN sw s ON s.code = l.code AND s.w = t.tok
          GROUP BY d.doc_id, l.code
        )
        SELECT doc_id, code AS lang_guess
        FROM (SELECT doc_id, code, ROW_NUMBER() OVER
                (PARTITION BY doc_id ORDER BY h DESC, code DESC) AS rn
              FROM hits)
        WHERE rn = 1
    """.format(sw_values=", ".join(
        f"('{code}','{w}')"
        for code in text.STOPWORDS for w in text.STOPWORDS[code])),
    # full BM25 replay in SQL (k1=1.2, b=0.75, same tokenizer); the
    # rank-10/11 score gap is ~5e-3, far beyond float noise, so the
    # top-10 set is stable across engines
    "bm25_rank": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'),
            x -> x != '') AS ws
          FROM documents
        ),
        docs AS (SELECT doc_id, len(ws) AS dl FROM toks WHERE len(ws) > 0),
        stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
        tf AS (
          SELECT toks.doc_id, u.tok AS term, COUNT(*) AS tf
          FROM toks, UNNEST(ws) AS u(tok)
          WHERE u.tok IN ('data','query')
          GROUP BY toks.doc_id, u.tok
        ),
        dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df
                  FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 SUM( ln((s.n - d.df + 0.5)/(d.df + 0.5) + 1.0)
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * docs.dl / s.avgdl))
                    ) AS score
          FROM tf JOIN dfreq d USING (term)
               JOIN docs ON docs.doc_id = tf.doc_id
               CROSS JOIN stats s
          GROUP BY tf.doc_id
        )
        SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid
        FROM scored
        ORDER BY score DESC, uid ASC LIMIT 10
    """,
    "ivf_topk": _ivf_oracle_sql(),
    "cluster_balanced": _cluster_balanced_oracle_sql(),
    # iterative label propagation in the engine; the oracle replays it as
    # a recursive reachability closure (tiny subgraph: Nation/Region)
    "connected_components": """
        WITH RECURSIVE
        nr_nodes(uid) AS (
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'Region:' || CAST(r_regionkey AS VARCHAR) FROM region
        ),
        nr_edges(a, b) AS (
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 'Region:' || CAST(n_regionkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
                 'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
        ),
        reach(src, dst) AS (
          SELECT uid, uid FROM nr_nodes
          UNION
          SELECT r.src, e.b FROM reach r JOIN nr_edges e ON e.a = r.dst
        )
        SELECT src AS uid, MIN(dst) AS component FROM reach GROUP BY src
    """,
    "pagerank_top10": _pagerank_top10_sql(),
    "contamination": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x != '') AS ws
          FROM documents
        ), grams AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, len(ws) - 6),
                     i -> ('0x' || substr(md5(
                            array_to_string(list_slice(ws, i, i + 7), ' ')
                          ), 1, 15))::BIGINT)) AS fps
            FROM toks), UNNEST(fps) AS t(fp)
        )
        SELECT g.doc_id, COUNT(*)::BIGINT AS n_hits
        FROM grams g
        JOIN (SELECT DISTINCT fp FROM grams WHERE doc_id % 20 = 0) b
          ON g.fp = b.fp
        WHERE g.doc_id % 20 <> 0
        GROUP BY g.doc_id
    """,
    "chunk_docs": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x != '') AS ws
          FROM documents
        ), meta AS (
          SELECT doc_id, ws,
                 CASE WHEN len(ws) <= 64 THEN 0
                      ELSE CAST(CEIL((len(ws) - 64)::DOUBLE / 48) AS INT)
                 END AS i_max
          FROM toks
        )
        SELECT doc_id, i.i AS chunk_id,
               md5(array_to_string(
                   list_slice(ws, i.i * 48 + 1, i.i * 48 + 64), ' '))
                   AS chunk_hash,
               len(list_slice(ws, i.i * 48 + 1, i.i * 48 + 64))::BIGINT
                   AS n_tokens
        FROM meta, UNNEST(range(0, i_max + 1)) AS i(i)
    """,
    "pagerank_nations": """
        WITH RECURSIVE
        ed(a, b) AS (
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 'Region:' || CAST(n_regionkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
                 'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
        ),
        nodes(uid) AS (SELECT DISTINCT a FROM ed),
        deg AS (SELECT a, COUNT(*) AS out_deg FROM ed GROUP BY a),
        pr(iter, uid, rank) AS (
          SELECT 0, uid, 1.0::DOUBLE FROM nodes
          UNION ALL
          SELECT p.iter + 1, n.uid,
                 0.15 + 0.85 * COALESCE(SUM(p.rank / dg.out_deg), 0)
          FROM pr p
          JOIN deg dg ON p.uid = dg.a
          JOIN ed ON p.uid = ed.a
          RIGHT JOIN nodes n ON ed.b = n.uid
          WHERE p.iter < 5
          GROUP BY p.iter + 1, n.uid
        )
        SELECT uid, ROUND(rank, 6) AS rank FROM pr WHERE iter = 5
    """,
    "triangles_copurchase": """
        WITH e AS (
          SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey)
        SELECT COUNT(*)::BIGINT AS n_triangles
        FROM e ab
        JOIN e bc ON ab.hi = bc.lo
        JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi
    """,
    "bfs_distance": """
        WITH RECURSIVE
        ed(a, b) AS (
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 'Region:' || CAST(n_regionkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
                 'Nation:' || CAST(n_nationkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
                 'Nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
          UNION ALL
          SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR),
                 'Customer:' || CAST(c_custkey AS VARCHAR) FROM customer
          UNION ALL
          SELECT 'Customer:' || CAST(o_custkey AS VARCHAR),
                 'Order:' || CAST(o_orderkey AS VARCHAR) FROM orders
          UNION ALL
          SELECT 'Order:' || CAST(o_orderkey AS VARCHAR),
                 'Customer:' || CAST(o_custkey AS VARCHAR) FROM orders
        ),
        walk(uid, d) AS (
          SELECT 'Region:' || CAST(r_regionkey AS VARCHAR), 0
          FROM region WHERE r_name = 'ASIA'
          UNION
          SELECT ed.b, w.d + 1 FROM walk w
          JOIN ed ON ed.a = w.uid WHERE w.d < 3
        )
        SELECT uid, CAST(MIN(d) AS INT) AS dist FROM walk GROUP BY uid
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                    ELSE 'gif' END AS fmt,
               CAST(4 + n_chars % 60 AS INT) AS width,
               CAST(4 + (n_chars // 7) % 60 AS INT) AS height,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4
                         ELSE 1 END AS INT) AS n_frames
        FROM documents
    """,
    "gif_frames": """
        WITH g AS (
          SELECT doc_id AS media_id, 1 + doc_id % 4 AS nf
          FROM documents WHERE doc_id % 3 = 2)
        SELECT media_id, CAST(t.i AS INT) AS frame_idx,
               CAST(35 AS BIGINT) AS frame_bytes
        FROM g, UNNEST(range(0, nf, 2)) AS t(i)
    """,
    "audio_features": """
        WITH m AS (
          SELECT doc_id AS media_id, 200 + n_chars % 600 AS n
          FROM documents
        ), s AS (
          SELECT media_id, n, t.i AS i,
                 (media_id * 31 + t.i * 7) % 256 - 128 AS a
          FROM m, UNNEST(range(0, n)) AS t(i)
        ), f AS (
          SELECT media_id, n, a,
                 LAG(a) OVER (PARTITION BY media_id ORDER BY i) AS pa
          FROM s)
        SELECT media_id, 'wav' AS fmt, 8000 AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
               CAST(SUM(a * a) AS BIGINT) AS sum_sq,
               CAST(SUM(CASE WHEN pa IS NOT NULL
                              AND ((a >= 0) <> (pa >= 0))
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS zero_crossings
        FROM f GROUP BY media_id, n
    """,
    "multimodal_resize": """
        WITH dims AS (
          SELECT doc_id AS media_id,
                 4 + n_chars % 60 AS w,
                 4 + (n_chars // 7) % 60 AS h
          FROM documents
        ), scaled AS (
          SELECT media_id, w, h,
                 LEAST(1.0, 32.0 / GREATEST(w, h)) AS scale
          FROM dims
        )
        SELECT media_id,
               CAST(GREATEST(1, FLOOR(w * scale)) AS INT) AS width,
               CAST(GREATEST(1, FLOOR(h * scale)) AS INT) AS height
        FROM scaled
    """,
    "simhash_pairs": """
        WITH toks AS (
          SELECT doc_id, list_distinct(list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'),
            x -> x != '')) AS ws
          FROM documents
        ), hashes AS (
          SELECT doc_id,
                 ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
          FROM toks, UNNEST(ws) AS t(tok)
        ), votes AS (
          SELECT doc_id, i.i,
                 SUM(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END)
                     AS vote
          FROM hashes CROSS JOIN (SELECT UNNEST(range(60)) AS i) i
          GROUP BY doc_id, i.i
        ), sig AS (
          SELECT doc_id,
                 SUM(CASE WHEN vote > 0 THEN (1::BIGINT << i)
                          ELSE 0 END)::BIGINT AS simhash
          FROM votes GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "ann_lsh_topk": _ann_oracle_sql(),
    "lsh_near_dup": _lsh_near_dup_oracle_sql(),
    "semantic_dedup": _semantic_dedup_oracle_sql(),
    "weighted_sample": _WEIGHTED_SAMPLE_ORACLE,
    "source_reputation": _SOURCE_REPUTATION_ORACLE,
    "bigram_logprob": _bigram_logprob_oracle_sql(),
    "winnow_pairs": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text),'[^a-z0-9]+'),
            x -> x != '') AS ws
          FROM documents
        ), grams AS (
          SELECT doc_id, list_transform(range(1, len(ws)-5+2),
            i -> ('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')),
                                 1, 15))::BIGINT) AS hs
          FROM toks WHERE len(ws) >= 8
        ), sel AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(hs)-4+2), s -> list_min(hs[s:s+3]))) AS sfps
          FROM grams
        ), fps AS (
          SELECT doc_id, f.fp FROM sel, UNNEST(sfps) AS f(fp)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*)::BIGINT AS n_shared
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    "tpch_q4": (
        "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate) "
        "GROUP BY o_orderpriority"),
    "tpch_q5": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "tpch_q14": """
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(1 - l_discount AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
    """,
    "tpch_q18": """
        SELECT c_custkey, o_orderkey, CAST(sum_qty AS DOUBLE) AS sum_qty
        FROM orders
        JOIN (SELECT l_orderkey,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "tpch_q7": """
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      AND n1.n_name = 'NATION_1'
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
                      AND n2.n_name = 'NATION_2'
        GROUP BY l_year
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, n_name,
               CAST(rev AS DOUBLE) AS revenue
        FROM (SELECT o_custkey,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         CAST(1 - l_discount AS DECIMAL(18,2))) AS rev
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_returnflag = 'R'
              GROUP BY o_custkey) g
        JOIN customer ON g.o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "above_nation_avg": """
        SELECT c_custkey
        FROM customer
        JOIN (SELECT c_nationkey AS nk,
                     SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
                     COUNT(*) AS cnt
              FROM customer GROUP BY c_nationkey) s
          ON c_nationkey = s.nk
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > bal_sum
    """,
    "running_total": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_total
        FROM orders WHERE o_custkey < 100
    """,
    "ntile_quartiles": (
        "SELECT s_suppkey, NTILE(4) OVER "
        "(ORDER BY s_acctbal ASC, s_suppkey ASC) AS quartile "
        "FROM supplier"),
    "event_funnel": """
        SELECT COUNT(first_view) AS n_viewers,
               CAST(SUM(CASE WHEN first_view < last_purchase
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM (SELECT user_id,
                     MIN(CASE WHEN event_type = 'view' THEN ts END)
                         AS first_view,
                     MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                         AS last_purchase
              FROM events GROUP BY user_id)
    """,
    "event_props_json": (
        "SELECT event_type, "
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
        "AS BIGINT) AS k_sum, "
        "COUNT(json_extract_string(props, '$.k')) AS k_cnt "
        "FROM events GROUP BY event_type"),
    "tpch_q8": """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                                  CAST(1 - l_discount AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS nation_rev,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1 - l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_rev
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey AND p_type = 'STANDARD'
        JOIN orders   ON l_orderkey = o_orderkey
                     AND o_orderdate >= TIMESTAMP '1995-01-01'
                     AND o_orderdate <  TIMESTAMP '1997-01-01'
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
                     AND r_name = 'AMERICA'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        GROUP BY o_year
    """,
    "tpch_q9": """
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1 - l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
                     AND p_name LIKE '%widget%'
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name, o_year
    """,
    "tpch_q12": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_linestatus
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "tpch_q15": """
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    "tpch_q17": """
        WITH bl AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#13')
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) / 7.0 AS avg_yearly
        FROM bl
        JOIN (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
              FROM bl GROUP BY l_partkey) a
          ON l_partkey = a.pk
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "tpch_q19": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(1 - l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size <= 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#23' AND p_size <= 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q2": """
        WITH offers AS (
          SELECT p_partkey, s_suppkey, s_name, n_name,
                 CAST(l_extendedprice AS DECIMAL(18,6))
                   / CAST(l_quantity AS DECIMAL(18,6)) AS unit_price
          FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_size = 15
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
                     AND r_name = 'EUROPE')
        SELECT p_partkey, s_suppkey, s_name, n_name,
               CAST(unit_price AS DOUBLE) AS unit_price
        FROM offers o
        JOIN (SELECT p_partkey AS pk, MIN(unit_price) AS min_price
              FROM offers GROUP BY p_partkey) m
          ON o.p_partkey = m.pk AND o.unit_price = m.min_price
    """,
    "tpch_q11": """
        WITH val AS (
          SELECT l_partkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
          FROM lineitem GROUP BY l_partkey)
        SELECT l_partkey, CAST(value AS DOUBLE) AS value
        FROM val
        WHERE value > (SELECT SUM(value) * 0.0005 FROM val)
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_size IN (1, 7, 15)
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q20": """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
                   AND n_name = 'NATION_1'
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          JOIN part ON l_partkey = p_partkey
                   AND p_name LIKE '%widget%'
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
    """,
    "tpch_q21": """
        WITH li AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        sole AS (
          SELECT l_orderkey FROM li GROUP BY l_orderkey
          HAVING COUNT(DISTINCT l_suppkey) > 1
             AND COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) = 1)
        SELECT DISTINCT s_suppkey, s_name
        FROM li
        JOIN sole USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE li.late
    """,
    "tpch_q22": """
        SELECT c_nationkey AS nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
    """,
    # hash-gated sampling twins: keep ⇔ 16-bit md5 prefix < floor(rate·2^16)
    # rendered as %04x (fixed-width hex orders like the integer; rate ≥ 1
    # special-cased — its threshold would be 5 chars and mis-compare)
    "stratified_sample": """
        WITH r AS (
          SELECT doc_id, lang,
                 CASE lang WHEN 'en' THEN 0.8 WHEN 'de' THEN 0.5
                           WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.25
                           ELSE 0.1 END AS rate
          FROM documents)
        SELECT doc_id, lang FROM r
        WHERE rate >= 1.0
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < printf('%04x', CAST(floor(rate * 65536) AS INT))
    """,
    "mixture_sample": """
        WITH counts AS (
          SELECT source, COUNT(*) AS n,
                 CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                             WHEN 'src2' THEN 0.2 END AS w
          FROM documents GROUP BY source
        ), kept AS (SELECT * FROM counts WHERE w IS NOT NULL),
        cap AS (SELECT MIN(n / w) AS c FROM kept),
        rates AS (SELECT source, (c * w / n) AS rate FROM kept, cap)
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates USING (source)
        WHERE rate >= 1.0
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < printf('%04x', CAST(floor(rate * 65536) AS INT))
    """,
    "pack_shards": """
        WITH c AS (
          SELECT lang, doc_id, n_chars,
                 SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM documents)
        SELECT lang,
               CAST(floor((cum - n_chars) / 2000) AS BIGINT) AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS shard_chars
        FROM c GROUP BY lang, shard_id
    """,
    "pii_redact": r"""
        SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or 555-123-4567 at 10.0.'
                     || CAST(doc_id % 256 AS VARCHAR) || '.7',
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
              '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g'),
            '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
        FROM documents
    """,
    "sssp_cost": """
        WITH RECURSIVE
        ed(a, b, w) AS (
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 'Region:' || CAST(n_regionkey AS VARCHAR),
                 n_nationkey % 5 + 1 FROM nation
          UNION ALL
          SELECT 'Region:' || CAST(n_regionkey AS VARCHAR),
                 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 n_nationkey % 5 + 1 FROM nation
          UNION ALL
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
                 'Nation:' || CAST(c_nationkey AS VARCHAR),
                 c_custkey % 7 + 1 FROM customer
          UNION ALL
          SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR),
                 'Customer:' || CAST(c_custkey AS VARCHAR),
                 c_custkey % 7 + 1 FROM customer
        ),
        walk(uid, hops, d) AS (
          SELECT 'Region:' || CAST(r_regionkey AS VARCHAR), 0, 0
          FROM region WHERE r_name = 'ASIA'
          UNION ALL
          SELECT ed.b, w.hops + 1, w.d + ed.w FROM walk w
          JOIN ed ON ed.a = w.uid WHERE w.hops < 3
        )
        SELECT uid, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY uid
    """,
    "interval_join_events": """
        SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts + INTERVAL 1 SECOND
         AND b.ts <= a.ts + INTERVAL 120 SECOND
    """,
    "basket_lift": """
        WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                   FROM lineitem),
        small AS (SELECT o FROM e GROUP BY o HAVING COUNT(*) <= 256),
        ec AS (SELECT e.* FROM e JOIN small USING (o)),
        pairs AS (
          SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_ab
          FROM ec a JOIN ec b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2),
        supp AS (SELECT p, COUNT(*) AS n FROM e GROUP BY p),
        tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM e)
        SELECT pa, pb, n_ab,
               round(CAST(n_ab AS DOUBLE) / sa.n, 6) AS confidence,
               round(CAST(n_ab AS DOUBLE) * n_orders / (sa.n * sb.n), 6)
                 AS lift
        FROM pairs
        JOIN supp sa ON sa.p = pa
        JOIN supp sb ON sb.p = pb, tot
        ORDER BY n_ab DESC, pa, pb LIMIT 20
    """,
    "cumulative_users": """
        WITH firsts AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS d
          FROM events GROUP BY user_id),
        daily AS (SELECT d, COUNT(*) AS new_users FROM firsts GROUP BY d)
        SELECT CAST(d AS VARCHAR) AS d,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM daily
    """,
    "assortativity_orders": """
        WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                   FROM lineitem),
        dd AS (
          SELECT e.o, e.p, d1.don AS dor, d2.dpn AS dpr
          FROM e
          JOIN (SELECT o, COUNT(*) AS don FROM e GROUP BY o) d1 USING (o)
          JOIN (SELECT p, COUNT(*) AS dpn FROM e GROUP BY p) d2 USING (p)),
        s AS (
          SELECT CAST(COUNT(*) * 2 AS BIGINT) AS n,
                 CAST(SUM(dor + dpr) AS BIGINT) AS sx,
                 CAST(SUM(dor * dpr) * 2 AS BIGINT) AS sxy,
                 CAST(SUM(dor * dor + dpr * dpr) AS BIGINT) AS sxx
          FROM dd)
        SELECT n,
               round(CAST(n * sxy - sx * sx AS DOUBLE)
                     / (n * sxx - sx * sx), 6) AS assortativity
        FROM s
    """,
    "transitivity_copurchase": """
        WITH e AS (
          SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey),
        tri AS (
          SELECT COUNT(*)::BIGINT AS n_triangles
          FROM e ab
          JOIN e bc ON ab.hi = bc.lo
          JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
        deg AS (
          SELECT v, COUNT(*) AS d FROM (
            SELECT lo AS v FROM e UNION ALL SELECT hi FROM e)
          GROUP BY v),
        w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
              FROM deg)
        SELECT n_triangles, n_wedges,
               round(3.0 * n_triangles / greatest(n_wedges, 1), 6)
                 AS transitivity
        FROM tri, w
    """,
    "global_shuffle": """
        WITH h AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS shuffle_rank
          FROM documents)
        SELECT doc_id, shuffle_rank FROM h WHERE shuffle_rank <= 100
    """,
    "train_val_test": """
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      < printf('%04x', CAST(ceil(0.05 * 65536) AS INT))
                   THEN 'val'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      < printf('%04x', CAST(ceil(0.10 * 65536) AS INT))
                   THEN 'test'
                 ELSE 'train'
               END AS split,
               COUNT(*) AS n
        FROM documents GROUP BY 1
    """,
    "retention_cohorts": """
        WITH firsts AS (
          SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
          FROM events GROUP BY user_id),
        act AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
          FROM events)
        SELECT CAST(CAST(cohort AS DATE) AS VARCHAR) AS cohort,
               CAST(date_diff('day', cohort, wk) / 7 AS INT) AS week_offset,
               COUNT(*) AS n_users
        FROM act JOIN firsts USING (user_id)
        GROUP BY 1, 2
    """,
    "unigram_logprob": """
        WITH tok AS (
          SELECT doc_id,
            unnest(list_filter(
              string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x != '')) AS tok
          FROM documents),
        freq AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok),
        stats AS (SELECT SUM(tf) AS total, COUNT(*) AS vocab FROM freq)
        SELECT doc_id,
          round(CAST(SUM(CAST(round(log10(
                  CAST(tf + 1 AS DOUBLE) / (total + vocab)), 6)
                AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS logprob,
          COUNT(*) AS n_tokens
        FROM tok JOIN freq USING (tok), stats
        GROUP BY doc_id
    """,
    "corpus_pipeline": r"""
        WITH q AS (
          SELECT doc_id, lang, text, n_chars,
            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x != '') AS toks
          FROM documents),
        m AS (
          SELECT doc_id, lang, text, n_chars, toks FROM q
          WHERE len(toks) >= 20 AND len(toks) <= 100000
            AND length(array_to_string(toks, ''))
                / greatest(len(toks), 1) >= 2.0
            AND length(array_to_string(toks, ''))
                / greatest(len(toks), 1) <= 12.0
            AND length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                / greatest(length(text), 1) <= 0.10
            AND len(list_filter(toks, x -> list_contains(
              ['the','a','of','and','to','in','is','for','on','with'], x)))
                >= 2),
        f AS (SELECT doc_id, lang, n_chars,
                     md5(array_to_string(toks, ' ')) AS fp FROM m),
        d AS (SELECT doc_id, lang, n_chars FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                  ORDER BY doc_id) AS rn FROM f) WHERE rn = 1),
        s AS (SELECT * FROM d
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'),
        c AS (SELECT lang, doc_id, n_chars,
                SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM s)
        SELECT lang,
               CAST(floor((cum - n_chars) / 4000) AS BIGINT) AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS shard_chars
        FROM c GROUP BY lang, shard_id
    """,
    "quality_filter": """
        WITH t AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x != '') AS toks
          FROM documents),
        m AS (
          SELECT doc_id, text, len(toks) AS n,
            length(array_to_string(toks, ''))
              / greatest(len(toks), 1) AS avg_len,
            length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              / greatest(length(text), 1) AS sym_ratio,
            len(list_filter(toks, x -> list_contains(
              ['the','a','of','and','to','in','is','for','on','with'], x)))
              AS sw_hits
          FROM t)
        SELECT doc_id,
               (n >= 20 AND n <= 100000) AS ok_tokens,
               (avg_len >= 2.0 AND avg_len <= 12.0) AS ok_avg_len,
               (sym_ratio <= 0.10) AS ok_symbols,
               (sw_hits >= 2) AS ok_stopwords,
               ((n >= 20 AND n <= 100000)
                AND (avg_len >= 2.0 AND avg_len <= 12.0)
                AND (sym_ratio <= 0.10)
                AND (sw_hits >= 2)) AS keep
        FROM m
    """,
    # positional self-join replay of NEAR/3: ≤ 3 tokens strictly between
    # occurrences of the two terms, either order (zip-unnested positions
    # over the same tokenizer as the engine index)
    "fts_near": (
        """
        WITH t AS (
          SELECT doc_id, list_filter("""
        + _TOKENIZE_DUCK.format(col="text") + """, x -> x != '') AS ws
          FROM documents),
        p AS (
          SELECT doc_id, unnest(ws) AS tok,
                 unnest(range(1, len(ws) + 1)) AS pos
          FROM t)
        SELECT DISTINCT 'Document:' || CAST(a.doc_id AS VARCHAR) AS uid
        FROM p a JOIN p b ON a.doc_id = b.doc_id
        WHERE a.tok = 'query' AND b.tok = 'table'
          AND greatest(a.pos, b.pos) - least(a.pos, b.pos) - 1 <= 3
    """),
    "fts_colgroup": (
        """
        SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid
        FROM documents
        WHERE list_contains(list_filter("""
        + _TOKENIZE_DUCK.format(col="text") + """, x -> x != ''), 'en')
           OR list_contains(list_filter("""
        + _TOKENIZE_DUCK.format(col="lang") + """, x -> x != ''), 'en')
    """),
    "label_propagation": _label_propagation_sql(),
    "k_core_orders": _k_core_sql(),
    "repetition_filter": """
        WITH t AS (
          SELECT doc_id, list_filter("""
    + _TOKENIZE_DUCK.format(col="text") + """, x -> x != '') AS ws
          FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i + 1])) AS gram
          FROM t WHERE len(ws) >= 2),
        pg AS (SELECT doc_id, gram, COUNT(*) AS c
               FROM g GROUP BY doc_id, gram),
        st AS (
          SELECT doc_id,
                 round(MAX(c) * 1.0 / SUM(c), 6) AS top_frac,
                 round(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0
                       / SUM(c), 6) AS dup_frac
          FROM pg GROUP BY doc_id)
        SELECT doc_id, top_frac, dup_frac,
               (top_frac <= 0.2 AND dup_frac <= 0.6) AS keep
        FROM st
    """,
    "hits_authorities": _hits_sql(),
    "personalized_pagerank": _ppr_sql(),
    "empty_orders": """
        SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid
        FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """,
    "bfs_paths": """
        WITH e AS MATERIALIZED (
          SELECT 'Customer:' || CAST(o_custkey AS VARCHAR) AS src,
                 'Order:' || CAST(o_orderkey AS VARCHAR) AS dst
          FROM orders
          UNION ALL
          SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
                 'Nation:' || CAST(c_nationkey AS VARCHAR) FROM customer
          UNION ALL
          SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
                 'Part:' || CAST(l_partkey AS VARCHAR) FROM lineitem
          UNION ALL
          SELECT 'Order:' || CAST(l_orderkey AS VARCHAR),
                 'Supplier:' || CAST(l_suppkey AS VARCHAR) FROM lineitem
          UNION ALL
          SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR),
                 'Region:' || CAST(n_regionkey AS VARCHAR) FROM nation),
        d1 AS MATERIALIZED (
          SELECT DISTINCT dst AS uid FROM e WHERE src = 'Customer:0'),
        d2 AS (
          SELECT e.dst AS uid, MIN(e.src) AS par
          FROM e JOIN d1 ON e.src = d1.uid
          WHERE e.dst <> 'Customer:0'
            AND e.dst NOT IN (SELECT uid FROM d1)
          GROUP BY e.dst)
        SELECT 'Customer:0' AS uid, 0 AS dist, ['Customer:0'] AS path
        UNION ALL
        SELECT uid, 1, ['Customer:0', uid] FROM d1
        UNION ALL
        SELECT uid, 2, ['Customer:0', par, uid] FROM d2
    """,
    "var_length_reach": """
        SELECT DISTINCT uid FROM (
          SELECT 'Order:' || CAST(o_orderkey AS VARCHAR) AS uid
          FROM orders WHERE o_custkey BETWEEN 0 AND 4
          UNION ALL
          SELECT 'Nation:' || CAST(c_nationkey AS VARCHAR)
          FROM customer WHERE c_custkey BETWEEN 0 AND 4
          UNION ALL
          SELECT 'Part:' || CAST(l_partkey AS VARCHAR)
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_custkey BETWEEN 0 AND 4
          UNION ALL
          SELECT 'Supplier:' || CAST(l_suppkey AS VARCHAR)
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_custkey BETWEEN 0 AND 4
          UNION ALL
          SELECT 'Region:' || CAST(n_regionkey AS VARCHAR)
          FROM nation JOIN customer ON n_nationkey = c_nationkey
          WHERE c_custkey BETWEEN 0 AND 4
        )
    """,
    "pack_sequences": """
        WITH c AS (
          SELECT doc_id, n_chars,
                 COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
          FROM documents)
        SELECT doc_id,
               CAST(cum // 2048 AS BIGINT) AS seq_id,
               CAST(cum % 2048 AS BIGINT) AS offset,
               CAST(LEAST(n_chars, 2048 - (cum % 2048)) AS BIGINT)
                 AS n_tok
        FROM c
    """,
    "link_prediction": """
        WITH e AS MATERIALIZED (
          SELECT DISTINCT 'Order:' || CAST(l_orderkey AS VARCHAR) AS s,
                 'Part:' || CAST(l_partkey AS VARCHAR) AS z
          FROM lineitem),
        small AS (SELECT z FROM e GROUP BY z HAVING COUNT(*) <= 4096),
        ec AS (SELECT e.* FROM e JOIN small USING (z)),
        deg AS (SELECT z, COUNT(*) AS d FROM ec GROUP BY z
                HAVING COUNT(*) >= 2),
        ew AS (SELECT ec.s, ec.z, 1.0 / ln(deg.d) AS w
               FROM ec JOIN deg USING (z))
        SELECT a.s AS u, b.s AS v,
               round(SUM(a.w), 6) AS aa_score,
               COUNT(*) AS common
        FROM ew a JOIN ew b ON a.z = b.z AND a.s < b.s
        GROUP BY a.s, b.s
        ORDER BY aa_score DESC, u, v LIMIT 20
    """,
    "approx_distinct_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
               TRUE AS approx_ok
        FROM events GROUP BY event_type
    """,
    "approx_percentiles": """
        SELECT COUNT(*) AS n_orders, TRUE AS p50_ok, TRUE AS p95_ok,
               TRUE AS p99_ok
        FROM orders
    """,
    "ppl_bucket_sample": """
        WITH tok AS (
          SELECT doc_id,
            unnest(list_filter(
              string_split_regex(lower(text), '[^a-z0-9]+'),
              x -> x != '')) AS tok
          FROM documents),
        freq AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok),
        stats AS (SELECT SUM(tf) AS total, COUNT(*) AS vocab FROM freq),
        scored AS (
          SELECT doc_id,
            round(CAST(SUM(CAST(round(log10(
                    CAST(tf + 1 AS DOUBLE) / (total + vocab)), 6)
                  AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS logprob
          FROM tok JOIN freq USING (tok), stats
          GROUP BY doc_id),
        cs AS (SELECT quantile_cont(logprob, 0.25) AS c25,
                      quantile_cont(logprob, 0.75) AS c75 FROM scored),
        b AS (
          SELECT doc_id,
                 CASE WHEN logprob >= c75 THEN 'head'
                      WHEN logprob >= c25 THEN 'mid'
                      ELSE 'tail' END AS bucket
          FROM scored, cs),
        r AS (SELECT doc_id, bucket,
                     CASE bucket WHEN 'head' THEN 1.0 WHEN 'mid' THEN 0.5
                                 ELSE 0.1 END AS rate
              FROM b)
        SELECT doc_id, bucket FROM r
        WHERE rate >= 1.0
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < printf('%04x', CAST(floor(rate * 65536) AS INT))
    """,
    "decontaminate_spans": """
        WITH toks AS (
          SELECT doc_id, list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x != '') AS ws
          FROM documents
        ), bench AS (
          SELECT DISTINCT fp FROM (
            SELECT list_distinct(list_transform(
                     range(1, len(ws) - 6),
                     i -> ('0x' || substr(md5(
                            array_to_string(list_slice(ws, i, i + 7), ' ')
                          ), 1, 15))::BIGINT)) AS fps
            FROM toks WHERE doc_id % 20 = 0), UNNEST(fps) AS t(fp)
        ), tr AS (SELECT doc_id, ws FROM toks WHERE doc_id % 20 <> 0),
        tg AS (
          SELECT doc_id, i - 1 AS pos,
                 ('0x' || substr(md5(
                    array_to_string(list_slice(ws, i, i + 7), ' ')
                  ), 1, 15))::BIGINT AS fp
          FROM tr, UNNEST(range(1, len(ws) - 6)) AS t(i)
        ), m AS (SELECT tg.doc_id, tg.pos FROM tg JOIN bench USING (fp)),
        cl AS (
          SELECT doc_id, list(DISTINCT ci) AS cov FROM (
            SELECT DISTINCT m.doc_id, u.ci
            FROM m, UNNEST(range(m.pos, m.pos + 8)) AS u(ci))
          GROUP BY doc_id
        ), kept AS (
          SELECT tr.doc_id, tr.ws,
                 list_filter(range(1, len(tr.ws)+1),
                   i -> NOT list_contains(COALESCE(cl.cov, []), i - 1))
                 AS ki
          FROM tr LEFT JOIN cl USING (doc_id))
        SELECT doc_id,
               COALESCE(array_to_string(list_transform(ki, i -> ws[i]),
                                        ' '), '') AS clean_text,
               CAST(len(ws) - len(ki) AS BIGINT) AS n_masked
        FROM kept
    """,
    "line_dedup": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        resh AS (
          SELECT doc_id,
                 array_to_string(list_transform(
                   range(0, GREATEST(CAST(ceil(len(toks)/8.0) AS INT), 1)),
                   i -> array_to_string(toks[i*8+1 : i*8+8], ' ')),
                   chr(10)) AS text
          FROM t),
        l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM resh),
        lines AS (
          SELECT doc_id, i - 1 AS line_no, ls[i] AS line
          FROM l, UNNEST(range(1, len(ls)+1)) AS s(i)),
        win AS (
          SELECT h, wd, wp FROM (
            SELECT md5(line) AS h, doc_id AS wd, line_no AS wp,
                   row_number() OVER (PARTITION BY md5(line)
                                      ORDER BY doc_id, line_no) AS rn
            FROM lines WHERE length(line) >= 16) WHERE rn = 1),
        flagged AS (
          SELECT li.doc_id, li.line_no, li.line,
                 (length(li.line) < 16
                  OR (w.wd = li.doc_id AND w.wp = li.line_no)) AS keep
          FROM lines li LEFT JOIN win w
            ON length(li.line) >= 16 AND md5(li.line) = w.h)
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
                                   ORDER BY line_no), '') AS clean_text,
               SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
               SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS n_dropped
        FROM flagged GROUP BY doc_id
    """,
    "resample_locf": _RESAMPLE_LOCF_ORACLE,
    "bpe_train": _bpe_train_oracle_sql(),
    "pq_topk": _pq_oracle_sql(),
    "random_walks": _random_walks_oracle_sql(),
    "event_transitions": _EVENT_TRANSITIONS_ORACLE,
    "incremental_dedup": _INCREMENTAL_DEDUP_ORACLE,
    "bpe_tokenize": _bpe_tokenize_oracle_sql(),
    "profile_events": _profile_events_oracle_sql(),
    "knn_join": _KNN_JOIN_ORACLE,
    "containment_pairs": _CONTAINMENT_ORACLE,
    "standardize_embeddings": _STANDARDIZE_ORACLE,
    "jl_projection": _jl_oracle_sql(),
    "dag_layers": _DAG_LAYERS_ORACLE,
    "scc_parts": _SCC_ORACLE,
    "temperature_mixture": _TEMPERATURE_MIXTURE_ORACLE,
    "negative_samples": _NEGATIVE_SAMPLES_ORACLE,
    "apply_cdc": _APPLY_CDC_ORACLE,
    "histogram_values": _HISTOGRAM_ORACLE,
    "winsorize_values": _WINSORIZE_ORACLE,
    "tfidf_keywords": _TFIDF_ORACLE,
    "reciprocity_parts": _RECIPROCITY_ORACLE,
    "grouped_split": _GROUPED_SPLIT_ORACLE,
    "interval_lookup": _interval_lookup_oracle_sql(),
    "grouped_percentiles": _GROUPED_PERCENTILES_ORACLE,
    "degree_distribution": _DEGREE_DISTRIBUTION_ORACLE,
    "modal_event": _MODAL_EVENT_ORACLE,
    "media_pipeline": _MEDIA_PIPELINE_ORACLE,
    "k_truss_parts": _k_truss_oracle_sql(),
    "sentence_stats": _SENTENCE_STATS_ORACLE,
    "interarrival_stats": _INTERARRIVAL_ORACLE,
    "pixel_stats": _PIXEL_STATS_ORACLE,
    "jpeg_stats": _JPEG_STATS_ORACLE,
    "weekly_trend": _WEEKLY_TREND_ORACLE,
    "transition_entropy": _TRANSITION_ENTROPY_ORACLE,
    "pmi_collocations": _PMI_ORACLE,
    "zscore_anomaly": _ZSCORE_ANOMALY_ORACLE,
    "autocorr_revenue": _autocorr_oracle_sql(),
    "benford_digits": _BENFORD_ORACLE,
    "rfm_segments": _RFM_ORACLE,
    "activity_streaks": _STREAKS_ORACLE,
    "decile_share": _DECILE_SHARE_ORACLE,
    "gini_revenue": _GINI_ORACLE,
    "fingerprint_dups": _FINGERPRINT_DUPS_ORACLE,
    "fuzzy_name_pairs": _FUZZY_NAME_ORACLE,
    "lexical_diversity": _LEXICAL_DIVERSITY_ORACLE,
    "zipf_slope": _ZIPF_ORACLE,
    "mad_outliers": _MAD_ORACLE,
    "scd2_intervals": _SCD2_ORACLE,
    "attribution_last_touch": _ATTRIBUTION_ORACLE,
    "rolling_distinct_users": _ROLLING_DISTINCT_ORACLE,
    "skyline_parts": _SKYLINE_ORACLE,
    "ngram_novelty": _NGRAM_NOVELTY_ORACLE,
    "rrf_fusion": _RRF_ORACLE,
    "mmr_select": _mmr_oracle_sql(),
    "silhouette_kmeans": _silhouette_oracle_sql(),
    "new_vs_returning": _NEW_VS_RETURNING_ORACLE,
    "cohort_ltv": _COHORT_LTV_ORACLE,
    "churn_screen": _CHURN_ORACLE,
    "seq_copurchase": _SEQ_COPURCHASE_ORACLE,
    "rich_club": _RICH_CLUB_ORACLE,
    "neighbor_degree": _NEIGHBOR_DEGREE_ORACLE,
    "ewma_revenue": _ewma_oracle_sql(),
    "spend_percentile": _SPEND_PERCENTILE_ORACLE,
    "ahash_groups": _AHASH_ORACLE,
    "fk_orphans": _FK_ORPHANS_ORACLE,
    "calendar_gaps": _CALENDAR_GAPS_ORACLE,
    "chisq_independence": _CHISQ_ORACLE,
    "category_entropy": _CATEGORY_ENTROPY_ORACLE,
    "survival_curve": _SURVIVAL_ORACLE,
    "ab_proportion_test": _AB_TEST_ORACLE,
    "user_trend_slope": _USER_TREND_ORACLE,
    "readability_scores": _READABILITY_ORACLE,
    "abc_classification": _ABC_ORACLE,
    "leadtime_percentiles": _LEADTIME_ORACLE,
    "discount_quantity_corr": _DISCOUNT_QTY_ORACLE,
    "weekday_seasonality": _WEEKDAY_ORACLE,
    "hhi_by_month": _HHI_ORACLE,
    "modularity_lpa": _label_propagation_sql(4, final="," + _MODULARITY_FINAL),
    "node_jaccard": _NODE_JACCARD_ORACLE,
    "revenue_drawdown": _DRAWDOWN_ORACLE,
    "bot_screen": _BOT_SCREEN_ORACLE,
    "conversion_latency": _CONVERSION_LATENCY_ORACLE,
    "seasonal_naive_backtest": _SEASONAL_NAIVE_ORACLE,
    "basket_diversity": _BASKET_DIVERSITY_ORACLE,
    "topk_share_by_nation": _TOPK_SHARE_ORACLE,
    "return_rate_by_discount": _RETURN_RATE_ORACLE,
    "price_dispersion": _PRICE_DISPERSION_ORACLE,
    "ks_statistic": _KS_ORACLE,
    "mann_whitney": _MANN_WHITNEY_ORACLE,
    "welch_ttest": _WELCH_ORACLE,
    "revenue_peaks": _REVENUE_PEAKS_ORACLE,
    "level_shifts": _LEVEL_SHIFTS_ORACLE,
    "session_event_pairs": _SESSION_PAIRS_ORACLE,
    "ssjoin_exact": _SSJOIN_ORACLE,
    "closeness_nations": _CLOSENESS_ORACLE,
    "holt_forecast": _holt_oracle_sql(),
    "priority_sample": _PRIORITY_SAMPLE_ORACLE,
    "local_clustering": _LOCAL_CLUSTERING_ORACLE,
    "seq_triples": _SEQ_TRIPLES_ORACLE,
    "embedding_covariance": _EMB_COV_ORACLE,
    "interval_coverage": _INTERVAL_COVERAGE_ORACLE,
    "betweenness_customers": _BETWEENNESS_ORACLE,
    "minhash_recall": _MINHASH_RECALL_ORACLE,
    "stratified_topn": _STRATIFIED_TOPN_ORACLE,
    "funnel_windowed": _FUNNEL_WINDOWED_ORACLE,
    "psi_drift": _PSI_DRIFT_ORACLE,
    "dsir_select": _DSIR_ORACLE,
    "hits_copurchase": _HITS_ORACLE,
    "katz_parts": _KATZ_ORACLE,
    "item_recommendations": _ITEM_RECS_ORACLE,
    "mis_parts": _mis_oracle_sql(),
    "sorted_neighborhood": _SORTED_NBR_ORACLE,
    "theil_sen": _THEIL_SEN_ORACLE,
    "greedy_cover": _greedy_cover_oracle_sql(),
    "facility_location": _facility_location_oracle_sql(),
    "cohort_retention": _COHORT_RETENTION_ORACLE,
    "incremental_agg": _INCREMENTAL_AGG_ORACLE,
    "twap_users": _TWAP_ORACLE,
    "segment_overlap": _SEGMENT_OVERLAP_ORACLE,
    "session_labels": _SESSION_LABELS_ORACLE,
    "hard_negatives": _HARD_NEG_ORACLE,
    "spearman_corr": _SPEARMAN_ORACLE,
    "cusum_alarm": _CUSUM_ORACLE,
    "wilson_intervals": _WILSON_ORACLE,
    "kendall_nations": _KENDALL_ORACLE,
    "eb_shrinkage": _EB_SHRINK_ORACLE,
    "sax_symbols": _SAX_ORACLE,
    "textrank_keywords": _textrank_oracle_sql(),
    "isotonic_trend": _ISOTONIC_ORACLE,
    "exact_median_terasort": _EXACT_MEDIAN_ORACLE,
    "frequent_triples": _FREQ_TRIPLES_ORACLE,
    "ppr_asia": _ppr_oracle_sql(),
    "maximal_matching": _matching_oracle_sql(),
    "changepoint_sse": _CHANGEPOINT_ORACLE,
    "rebalance_audit": _rebalance_oracle_sql(),
    "percolation_curve": _percolation_oracle_sql(),
    "simrank_parts": _SIMRANK_ORACLE,
    "corpus_pipeline_v2": _PIPELINE_V2_ORACLE,
    "shapley_attribution": _shapley_oracle_sql(),
    "attack_robustness": _attack_oracle_sql(),
    "boilerplate_lines": _BOILERPLATE_ORACLE,
    "heaps_law": _HEAPS_ORACLE,
    "burstiness_users": _BURSTINESS_ORACLE,
    "kfold_groups": _KFOLD_ORACLE,
    "timeseries_cv": _TSCV_ORACLE,
    "dispersion_index": _DISPERSION_ORACLE,
    "did_estimator": _DID_ORACLE,
    "littles_law": _LITTLES_ORACLE,
    "aa_test": _AA_ORACLE,
    "price_elasticity": _ELASTICITY_ORACLE,
    "repeat_purchase_fit": _REPEAT_FIT_ORACLE,
    "abc_xyz": _ABC_XYZ_ORACLE,
    "p_chart": _P_CHART_ORACLE,
    "topk_turnover": _TOPK_TURNOVER_ORACLE,
    "logodds_terms": _LOGODDS_ORACLE,
    "quota_violations": _QUOTA_ORACLE,
    "peak_concurrency": _PEAK_ORACLE,
    "hill_tail": _HILL_ORACLE,
    "var_cvar": _VAR_CVAR_ORACLE,
    "jsd_daily_mix": _JSD_ORACLE,
    "cuped_adjustment": _CUPED_ORACLE,
    "budget_allocation": _BUDGET_ALLOC_ORACLE,
    "mann_kendall": _MANN_KENDALL_ORACLE,
    "runs_test": _RUNS_TEST_ORACLE,
    "durbin_watson": _DW_ORACLE,
    "friedman_test": _FRIEDMAN_ORACLE,
    "segment_migration": _MIGRATION_ORACLE,
    "theil_index": _THEIL_ORACLE,
    "growth_contribution": _GROWTH_CONTRIB_ORACLE,
    "price_index": _PRICE_INDEX_ORACLE,
    "stickiness": _STICKINESS_ORACLE,
    "data_contract": _DATA_CONTRACT_ORACLE,
    "hour_concentration": _hour_conc_oracle_sql(),
    "qte_segments": _QTE_ORACLE,
    "conformal_interval": _conformal_oracle_sql(),
    "policy_replay": _policy_replay_oracle_sql(),
    "anova_segments": _ANOVA_ORACLE,
    "degree_powerlaw": _DEGREE_PL_ORACLE,
    "basket_entropy_nation": _BASKET_ENTROPY_ORACLE,
    "whale_share": _WHALE_ORACLE,
    "trade_flows": _TRADE_FLOWS_ORACLE,
    "supply_concentration": _SUPPLY_CONC_ORACLE,
    "source_dup_matrix": _SOURCE_DUP_ORACLE,
    "backlog_curve": _BACKLOG_ORACLE,
    "ccdf_orders": _ccdf_oracle_sql(),
    "revenue_bridge": _REVENUE_BRIDGE_ORACLE,
    "dedup_roi": _DEDUP_ROI_ORACLE,
    "seasonality_strength": _SEASONALITY_ORACLE,
    "quartile_dispersion": _QCD_ORACLE,
    "lines_per_order_trend": _LPO_ORACLE,
    "tenure_spend_corr": _TENURE_CORR_ORACLE,
    "acf_table": _acf_oracle_sql(),
    "markov_steady_state": _steady_state_oracle_sql(),
    "token_burstiness": _TOKEN_BURST_ORACLE,
    "mutual_knn": _MUTUAL_KNN_ORACLE,
    "dead_stock": _DEAD_STOCK_ORACLE,
    "session_depth_curve": _SESSION_DEPTH_ORACLE,
    "price_stickiness": _PRICE_STICKY_ORACLE,
    "roc_curve": _ROC_ORACLE,
    "pr_curve": _PR_ORACLE,
    "brier_calibration": _BRIER_ORACLE,
    "butterfly_count": _BUTTERFLY_ORACLE,
    "diameter_sweep": _DIAMETER_SWEEP_ORACLE,
    "eigenvector_parts": _EIGENVECTOR_ORACLE,
    "unpivot_metrics": _UNPIVOT_ORACLE,
    "bitmap_distinct": _BITMAP_DISTINCT_ORACLE,
    "croston_demand": _CROSTON_ORACLE,
    "attribution_time_decay": _TIME_DECAY_ORACLE,
    "moments_by_segment": _MOMENTS_ORACLE,
    "lorenz_curve": _LORENZ_ORACLE,
    "otif_rate": _OTIF_ORACLE,
    "embedding_norm_outliers": _NORM_OUTLIER_ORACLE,
    "seasonal_decomposition": _SEASONAL_DECOMP_ORACLE,
    "discount_qty_heatmap": _HEATMAP_ORACLE,
    "equi_depth_bounds": _EQUI_DEPTH_ORACLE,
    "lateness_audit": _LATENESS_ORACLE,
    "id_gaps": _ID_GAPS_ORACLE,
    "newsvendor_stock": _NEWSVENDOR_ORACLE,
    "srm_check": _SRM_ORACLE,
    "power_analysis": _POWER_ORACLE,
    "hypergeom_enrichment": _HYPERGEOM_ORACLE,
    "quantile_normalize": _QNORM_ORACLE,
    "gains_curve": _GAINS_ORACLE,
    "quality_rule_breakdown": _QUALITY_BREAKDOWN_ORACLE,
    "token_length_histogram": _TOKEN_HIST_ORACLE,
    "pack_efficiency_curve": _PACK_CURVE_ORACLE,
}

ORACLES["kappa_langid"] = _kappa_oracle_sql()
ORACLES["ndcg_ann"] = _ndcg_oracle_sql()
ORACLES["lang_confusion"] = _lang_confusion_oracle_sql()
ORACLES["oov_rate"] = _OOV_ORACLE
ORACLES["split_leakage_check"] = _split_leakage_oracle_sql()
ORACLES["shingle_df_histogram"] = _SHINGLE_DF_ORACLE
ORACLES["ahash_near_dup"] = _AHASH_NEAR_DUP_ORACLE
ORACLES["qq_year_compare"] = _QQ_ORACLE
ORACLES["substring_spans"] = _SUBSTRING_SPANS_ORACLE
ORACLES["dbscan_embeddings"] = _DBSCAN_ORACLE
ORACLES["price_model"] = _PRICE_MODEL_ORACLE
ORACLES["mst_trade"] = _mst_oracle_sql()
ORACLES["single_linkage_nations"] = _mst_oracle_sql(
    negate=True, tail=_SINGLE_LINKAGE_TAIL.format(r=6))
ORACLES["tokenizer_fertility"] = _tokenizer_fertility_oracle_sql()
ORACLES["hll_distinct"] = _HLL_ORACLE
ORACLES["cms_heavy_hitters"] = _CMS_ORACLE
ORACLES["markov_removal_effects"] = _markov_removal_oracle_sql()
ORACLES["edit_distance_pairs"] = _EDIT_DISTANCE_ORACLE
ORACLES["tfidf_cosine_pairs"] = _TFIDF_COSINE_ORACLE
ORACLES["corpus_pipeline_v3"] = _pipeline_v3_oracle_sql()
ORACLES["rec_precision_at_k"] = _REC_PRECISION_ORACLE
ORACLES["k_anonymity"] = _K_ANON_ORACLE
ORACLES["posting_lists"] = _POSTING_LISTS_ORACLE

def q_lsh_probe(spark, sf_dir):
    """Incremental near-dup probe SERVED from the persisted MinHash
    index (the standing-pipeline shape, like hybrid_search): even
    doc_ids are indexed ONCE per session
    (persisted_index.build_minhash_index → snapshot table), each run
    only signs the odd-doc_id batch and broadcast-joins its band rows
    against the index — the corpus side is a parquet read of
    signatures, never re-tokenized or shuffled.  Emits
    (index_id, new_id, est_jaccard) for every pair sharing an LSH band
    (8 hashes, 4 bands of 2) whose signatures agree on ≥ 4 of 8
    components (est_jaccard ≥ 0.5, the unbiased MinHash estimator).
    Signing uses the 'sliced' production scheme (VERDICT r5 #2 —
    signing was 78% of the probe's wall): 2 md5 per shingle, each
    digest sliced into four 32-bit hex components, min-aggregated;
    the oracle replays the identical substr(md5()) slices, and the
    pair-output differential gate vs the 8-md5 'salted' scheme is
    tests/test_persisted_index.py::test_lsh_scheme_differential."""
    mh_path = _retrieval_indexes(spark, sf_dir)["mh"]
    batch = _docs(spark, sf_dir).where("doc_id % 2 = 1")
    return persisted_index.probe_minhash_index(spark, mh_path, batch,
                                               threshold=0.5)


_LSH_PROBE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
), sg AS (
  SELECT doc_id, list_transform(range(1, len(ws)-1),
         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sh
  FROM toks WHERE len(ws) >= 3
), hx AS (
  SELECT doc_id,
         list_transform(sh, s -> md5('0:' || s)) AS h0,
         list_transform(sh, s -> md5('1:' || s)) AS h1
  FROM sg
), sig AS (
  SELECT doc_id, [
    list_min(list_transform(h0, h -> substr(h, 1, 8))),
    list_min(list_transform(h0, h -> substr(h, 9, 8))),
    list_min(list_transform(h0, h -> substr(h, 17, 8))),
    list_min(list_transform(h0, h -> substr(h, 25, 8))),
    list_min(list_transform(h1, h -> substr(h, 1, 8))),
    list_min(list_transform(h1, h -> substr(h, 9, 8))),
    list_min(list_transform(h1, h -> substr(h, 17, 8))),
    list_min(list_transform(h1, h -> substr(h, 25, 8)))] AS s
  FROM hx
), banded AS (
  SELECT doc_id, s, [
    md5(s[1] || '|' || s[2]), md5(s[3] || '|' || s[4]),
    md5(s[5] || '|' || s[6]), md5(s[7] || '|' || s[8])] AS bands
  FROM sig
), cand AS (
  SELECT DISTINCT i.doc_id AS index_id, n.doc_id AS new_id,
         i.s AS si, n.s AS sn
  FROM banded i JOIN banded n
    ON (i.bands[1] = n.bands[1] OR i.bands[2] = n.bands[2]
        OR i.bands[3] = n.bands[3] OR i.bands[4] = n.bands[4])
  WHERE i.doc_id % 2 = 0 AND n.doc_id % 2 = 1
)
SELECT index_id, new_id,
       CAST(len(list_filter(range(1, 9), i -> si[i] = sn[i])) AS DOUBLE)
       / 8.0 AS est_jaccard
FROM cand
WHERE len(list_filter(range(1, 9), i -> si[i] = sn[i])) >= 4
"""
ORACLES["lsh_probe"] = _LSH_PROBE_ORACLE


# Session-lifetime persisted retrieval indexes: a standing pipeline
# indexes the corpus ONCE and every query only probes — so the catalog's
# retrieval queries build the FTS + IVF snapshot tables on first touch
# (memoized per session × sf_dir, like the graph encoding) and their
# DataFrames read the committed files.  Bench warm-ups absorb the build;
# the timed runs measure the probe path, which is the steady state.
_RIDX_CACHE: dict = {}


def _retrieval_indexes(spark, sf_dir):
    key = (id(spark), sf_dir)
    got = _RIDX_CACHE.get(key)
    if got:
        return got
    import hashlib
    import os
    import tempfile
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(),
                        f"graphydb_spark_ridx_{os.getpid()}_{tag}")
    fts_path = os.path.join(base, "fts")
    ivf_path = os.path.join(base, "ivf")
    mh_path = os.path.join(base, "mh")
    g = tpch_graph(spark, sf_dir)
    docs = g.nodes_df.where(F.col("kind") == "Document")
    persisted_index.build_fts_table(docs, fts_path, ["text"])
    # reuse the session-shared k=8/iters=2 assignment — same
    # deterministic trajectory the oracles replay, computed once
    persisted_index.build_ivf_table(_emb(spark, sf_dir), ivf_path,
                                    k=8, iters=2,
                                    precomputed=_ivfb_full(spark, sf_dir))
    # the standing near-dup index: even doc_ids play the corpus.
    # scheme='sliced' is the production signing path (2 md5/shingle
    # sliced into 4×32-bit components each, vs 8 md5/shingle) — the
    # oracle replays the identical substr(md5(...)) slices in DuckDB.
    persisted_index.build_minhash_index(
        _docs(spark, sf_dir).where("doc_id % 2 = 0"), mh_path,
        text_col="text", id_col="doc_id", k=3, num_hashes=8, bands=4,
        scheme="sliced")
    got = {"fts": fts_path, "ivf": ivf_path, "mh": mh_path}
    _RIDX_CACHE[key] = got
    return got


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion, SERVED from the
    persisted index tables (the standing-pipeline shape): BM25 top-20
    for ['data','query'] via persisted_index.probe_fts_table — one
    manifest-pruned token-range read per term + meta corpus stats, no
    per-query index rebuild — fused with the IVF top-20 around
    vec_id 0's embedding via probe_ivf_table (nprobe=2 of 8 cells, so
    only ~1/4 of the vector table's files are opened); rrf =
    Σ 1/(60 + rank).  Both rank lists order by score ROUNDED to 6 dp
    (then id) so integer ranks are engine-portable; the oracle replays
    the identical deterministic k-means (unrolled Lloyd CTEs) and cell
    restriction, so the ANN result is exactly reproducible."""
    from pyspark.sql import Window as W

    ridx = _retrieval_indexes(spark, sf_dir)
    fts_path, ivf_path = ridx["fts"], ridx["ivf"]
    # top-20 via distributed TakeOrdered FIRST, then rank the 20
    # survivors — a partitionless row_number window over ALL scored
    # docs funnels the corpus through one task (the global_shuffle
    # lesson); ranking after the limit is the same result at any scale
    tw = W.orderBy(F.round(F.col("score"), 6).desc(), F.col("doc_id"))
    trank = (persisted_index.probe_fts_table(spark, fts_path,
                                             ["data", "query"])
             .select(F.substring("uid", 10, 30).cast("long")
                     .alias("doc_id"), "score")
             .orderBy(F.round(F.col("score"), 6).desc(), F.col("doc_id"))
             .limit(20)
             .withColumn("rank_text", F.row_number().over(tw)
                         .cast("long"))
             .drop("score"))
    emb = _emb(spark, sf_dir)
    qv = list(emb.where(F.col("vec_id") == 0)
              .select("embedding").collect()[0][0])
    vw = W.orderBy(F.col("c").desc(), F.col("doc_id"))
    # k=21: the query vector itself (vec_id 0, cosine 1) may occupy a
    # probed slot — fetch one extra, drop it, rank the remaining 20
    vrank = (persisted_index.probe_ivf_table(spark, ivf_path, qv,
                                             k=21, nprobe=2)
             .where(F.col("vec_id") != 0)
             .select(F.col("vec_id").alias("doc_id"),
                     F.round("cosine", 6).alias("c"))
             .orderBy(F.col("c").desc(), F.col("doc_id")).limit(20)
             .withColumn("rank_vec", F.row_number().over(vw)
                         .cast("long"))
             .drop("c"))
    fused = trank.join(vrank, "doc_id", "full_outer")
    rrf = (F.coalesce(1.0 / (F.lit(60) + F.col("rank_text")), F.lit(0.0))
           + F.coalesce(1.0 / (F.lit(60) + F.col("rank_vec")),
                        F.lit(0.0)))
    return (fused.select("doc_id", F.round(rrf, 9).alias("rrf"),
                         "rank_text", "rank_vec")
            .orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(10))


def q_bm25_probe(spark, sf_dir):
    """Top-10 BM25 for ['data','query'] served FROM the persisted FTS
    snapshot table (persisted_index.build_fts_table → probe_fts_table):
    the probe reads only the manifest-pruned token ranges plus the meta
    corpus stats — never rebuilding the tf index — and is
    value-identical to fts.bm25_scores over the derived index, so the
    oracle replays plain BM25 SQL.  The standing-index form of
    q_bm25_rank (reference analogue: FTS5's persistent index,
    graphydb.py:638-658)."""
    fts_path = _retrieval_indexes(spark, sf_dir)["fts"]
    return (persisted_index.probe_fts_table(spark, fts_path,
                                            ["data", "query"])
            .select(F.substring("uid", 10, 30).cast("long")
                    .alias("doc_id"),
                    F.round("score", 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id"))
            .limit(10))


def q_ivf_probe(spark, sf_dir):
    """q_ivf_topk served from the PERSISTED IVF snapshot table
    (persisted_index.build_ivf_table → probe_ivf_table): the session's
    standing index shares the deterministic k=8/iters=2 k-means, so the
    oracle is the identical unrolled-Lloyd replay — but the probe reads
    ONLY the 2 probed cells' manifest-pruned files instead of scanning
    an in-memory assignment."""
    ivf_path = _retrieval_indexes(spark, sf_dir)["ivf"]
    emb = _emb(spark, sf_dir)
    qv = list(emb.where(F.col("vec_id") == 0)
              .select("embedding").collect()[0][0])
    top = persisted_index.probe_ivf_table(spark, ivf_path, qv,
                                          k=6, nprobe=2)
    return (top.where(F.col("vec_id") != 0)
            .select("vec_id", F.round("cosine", 6).alias("cosine")))


ORACLES["ivf_probe"] = _ivf_oracle_sql()


def q_fts_match_probe(spark, sf_dir):
    """Composite MATCH served FROM the persisted positional FTS table
    (persisted_index.match_fts_table): boolean (AND/NOT/OR), a quoted
    phrase and a prefix in one expression — ``data NOT query OR
    "table hash" OR quer*`` — reading only the manifest-pruned token
    ranges the terms touch.  The reference serves exactly this grammar
    from FTS5's persistent index (graphydb.py:876-893); q:fts_* are the
    per-session derived-index forms."""
    fts_path = _retrieval_indexes(spark, sf_dir)["fts"]
    return (persisted_index.match_fts_table(
        spark, fts_path, 'data NOT query OR "table hash" OR quer*')
        .select("uid"))


_FTS_MATCH_PROBE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
)
SELECT 'Document:' || CAST(doc_id AS VARCHAR) AS uid FROM toks
WHERE (list_contains(ws, 'data') AND NOT list_contains(ws, 'query'))
   OR instr(' ' || array_to_string(ws, ' ') || ' ', ' table hash ') > 0
   OR len(list_filter(ws, x -> x LIKE 'quer%')) > 0
"""
ORACLES["fts_match_probe"] = _FTS_MATCH_PROBE_ORACLE


_BM25_PROBE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
),
docs AS (SELECT doc_id, len(ws) AS dl FROM toks WHERE len(ws) > 0),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
tf AS (
  SELECT toks.doc_id, u.tok AS term, COUNT(*) AS tf
  FROM toks, UNNEST(ws) AS u(tok)
  WHERE u.tok IN ('data','query')
  GROUP BY toks.doc_id, u.tok
),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM( ln((s.n - d.df + 0.5)/(d.df + 0.5) + 1.0)
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * docs.dl / s.avgdl))
            ) AS score
  FROM tf JOIN dfreq d USING (term)
       JOIN docs ON docs.doc_id = tf.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT 10
"""
ORACLES["bm25_probe"] = _BM25_PROBE_ORACLE


def _hybrid_oracle_sql(k: int = 8, iters: int = 2, nprobe: int = 2) -> str:
    """DuckDB replay of q_hybrid_search: the BM25 leg is plain SQL (the
    persisted probe is value-identical to the derived index), the
    vector leg replays the SAME deterministic k-means (shared unrolled
    Lloyd CTE chain — the q_ivf_topk precedent), restricts to the
    ``nprobe`` nearest cells, and replays the double-limit dance
    (top-21 by unrounded cosine → drop vec_id 0 → rank top-20 by
    6 dp-rounded cosine) — row sets agree because the unrounded cosines
    are bit-identical folds in both engines."""
    fold_cos = """
         list_sum(list_transform(range(1, len(e.embedding)+1),
           i -> q0.qv[i] * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(q0.qv)+1),
              i -> q0.qv[i] * q0.qv[i])))
          * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
              i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE)))))"""
    return _ivf_ctes(k, iters) + f""",
toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
),
docs AS (SELECT doc_id, len(ws) AS dl FROM toks WHERE len(ws) > 0),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
tf AS (
  SELECT toks.doc_id, u.tok AS term, COUNT(*) AS tf
  FROM toks, UNNEST(ws) AS u(tok)
  WHERE u.tok IN ('data','query')
  GROUP BY toks.doc_id, u.tok
),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM( ln((s.n - d.df + 0.5)/(d.df + 0.5) + 1.0)
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * docs.dl / s.avgdl))
            ) AS score
  FROM tf JOIN dfreq d USING (term)
       JOIN docs ON docs.doc_id = tf.doc_id
       CROSS JOIN stats s
  GROUP BY tf.doc_id
),
trank AS (
  SELECT doc_id, rt AS rank_text FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
           AS rt
    FROM scored) WHERE rt <= 20
),
q0 AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       FROM e WHERE vec_id = 0),
probe AS (
  SELECT c FROM (
    SELECT c{iters}.c,
           list_sum(list_transform(range(1, len(q0.qv)+1),
             i -> (c{iters}.cent[i] - q0.qv[i])
                * (c{iters}.cent[i] - q0.qv[i]))) AS d
    FROM c{iters}, q0) ORDER BY d, c LIMIT {nprobe}),
cand AS (
  SELECT e.vec_id,{fold_cos} AS cos
  FROM e JOIN fin USING (vec_id), q0
  WHERE fin.c IN (SELECT c FROM probe)),
vtop AS (SELECT vec_id, cos FROM cand ORDER BY cos DESC, vec_id LIMIT 21),
vrank AS (
  SELECT doc_id, rv AS rank_vec FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (ORDER BY round(cos, 6) DESC, vec_id) AS rv
    FROM vtop WHERE vec_id <> 0) WHERE rv <= 20
)
SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
       round(COALESCE(1.0 / (60 + t.rank_text), 0)
             + COALESCE(1.0 / (60 + v.rank_vec), 0), 9) AS rrf,
       t.rank_text, v.rank_vec
FROM trank t FULL OUTER JOIN vrank v ON t.doc_id = v.doc_id
ORDER BY rrf DESC, doc_id LIMIT 10
"""


ORACLES["hybrid_search"] = _hybrid_oracle_sql()


# Session-lifetime IVF-PQ index (the two-stage-serve demo's standing
# table) — separate memo from _retrieval_indexes so the FTS/IVF/MinHash
# probes don't pay its build in their warm-ups.
_IVFPQ_CACHE: dict = {}


def _ivfpq_index(spark, sf_dir):
    key = (id(spark), sf_dir)
    got = _IVFPQ_CACHE.get(key)
    if got:
        return got
    import hashlib
    import os
    import tempfile
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(),
                        f"graphydb_spark_ivfpq_{os.getpid()}_{tag}")
    persisted_index.build_ivfpq_table(_emb(spark, sf_dir), path,
                                      k=4, m=4, pq_k=8, iters=2,
                                      store_raw=True)
    _IVFPQ_CACHE[key] = path
    return path


def q_pq_rerank_topk(spark, sf_dir):
    """Two-stage IVF-PQ serve (FAISS's refine idiom): ADC candidates
    from the persisted cells, then EXACT L2 re-rank from the raw
    refine column stored in the same files
    (persisted_index.probe_ivfpq_table(rerank=α)).

    FULL-hash gate on the whole rerank plumbing — candidate pass over
    every probed cell, bounded id-collect, manifest-pruned raw-vector
    re-read, sequential-fold L2, (dist, id) tie-break, 6 dp rounding —
    by probing all cells with k·α ≥ corpus size, which makes the
    re-ranked result EXACTLY the brute-force L2 top-10 the oracle
    states in three lines.  The bounded-α quality curve (where the
    result is approximate and SQL can't replay the cut) is pinned
    separately: tests/test_persisted_index.py rerank suite + the
    committed 1M-vector stress (recall@100 57%→79%/97% at
    nprobe=8/16, α=4)."""
    path = _ivfpq_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7)
          .select("embedding").collect()[0][0]]
    k, rerank = 10, 200
    # the exact-equivalence premise — k·α covers the corpus so the
    # two-stage result IS brute force — must fail loudly if the
    # fixture ever outgrows it (sf0.1 has exactly 2000 = k·α rows)
    _assert_exact_rerank_premise("pq_rerank_topk", emb, k, rerank,
                                 path=path, nprobe=4)
    top = persisted_index.probe_ivfpq_table(spark, path, qv, k=k,
                                            nprobe=4, rerank=rerank)
    return top.select("vec_id", F.round("l2_dist", 6).alias("l2_dist"))


_PQ_RERANK_ORACLE = """
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 7),
d AS (
  SELECT vec_id,
         list_sum(list_transform(range(1, len(embedding)+1),
           i -> (CAST(embedding[i] AS DOUBLE) - q.qv[i])
              * (CAST(embedding[i] AS DOUBLE) - q.qv[i]))) AS l2
  FROM embeddings, q
)
SELECT vec_id, round(l2, 6) AS l2_dist
FROM d ORDER BY l2, vec_id LIMIT 10
"""
ORACLES["pq_rerank_topk"] = _PQ_RERANK_ORACLE


def q_ivfpq_rerank_probe(spark, sf_dir):
    """BOUNDED-α two-stage IVF-PQ serve — the honest production shape
    pq_rerank_topk deliberately sidesteps: nprobe=2 of 4 cells, ADC
    top-30 candidates, exact top-10 re-rank.  FULL oracle anyway: the
    DuckDB twin replays the ENTIRE index bit-for-bit — the coarse
    unrolled-Lloyd chain, per-vector residuals against the final
    centroids, one unrolled-Lloyd chain per PQ subspace over the
    residual slices, the query's per-cell distance tables, the ADC sum,
    the (adc, id) candidate cut, and the exact-L2 re-rank — so even the
    approximate cut is engine-portable (the _pq_oracle_sql precedent,
    extended with the residual layer)."""
    path = _ivfpq_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7)
          .select("embedding").collect()[0][0]]
    top = persisted_index.probe_ivfpq_table(spark, path, qv, k=10,
                                            nprobe=2, rerank=3)
    return top.select("vec_id", F.round("l2_dist", 6).alias("l2_dist"))


def _ivfpq_rerank_oracle_sql(k_coarse: int = 4, iters: int = 2,
                             m: int = 4, pq_k: int = 8,
                             nprobe: int = 2, topk: int = 10,
                             alpha: int = 3, dim: int = 64,
                             qid: int = 7) -> str:
    """DuckDB replay of q_ivfpq_rerank_probe (and of
    persisted_index.build_ivfpq_table + probe_ivfpq_table(rerank=α)
    generally): coarse chain → residuals → m namespaced PQ chains over
    residual slices → per-cell ADC tables → candidate cut → exact
    re-rank.  Every float fold is sequential in both engines."""
    sub = dim // m
    coarse = _ivf_ctes(k_coarse, iters)
    res = f""",
res AS MATERIALIZED (
  SELECT e.vec_id, list_transform(range(1, len(e.embedding)+1),
         i -> CAST(e.embedding[i] AS DOUBLE) - cc.cent[i]) AS embedding
  FROM e JOIN fin USING (vec_id) JOIN c{iters} cc ON cc.c = fin.c)"""
    chains = "".join(
        "," + _ivf_ctes(
            pq_k, iters,
            source=(f"SELECT vec_id, embedding[{s*sub+1}:{(s+1)*sub}] "
                    f"AS embedding FROM res"),
            pfx=f"s{s}_", with_kw=False)
        for s in range(m))
    tabs = "".join(f""",
tab{s} AS (
  SELECT qres.c, bk.c AS code,
         list_sum(list_transform(range(1, {sub}+1),
           i -> (bk.cent[i] - qres.rv[{s*sub} + i])
              * (bk.cent[i] - qres.rv[{s*sub} + i]))) AS d
  FROM qres, s{s}_c{iters} bk)""" for s in range(m))
    code_joins = " ".join(f"JOIN s{s}_fin USING (vec_id)"
                          for s in range(m))
    tab_joins = " ".join(
        f"JOIN tab{s} t{s} ON t{s}.c = f.c AND t{s}.code = s{s}_fin.c"
        for s in range(m))
    dist = " + ".join(f"t{s}.d" for s in range(m))
    return coarse + res + chains + f""",
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = {qid}),
probe AS (
  SELECT c FROM (
    SELECT cc.c, list_sum(list_transform(range(1, len(q.qv)+1),
             i -> (cc.cent[i] - q.qv[i]) * (cc.cent[i] - q.qv[i]))) AS d
    FROM c{iters} cc, q) ORDER BY d, c LIMIT {nprobe}),
qres AS (
  SELECT cc.c, list_transform(range(1, len(q.qv)+1),
         i -> q.qv[i] - cc.cent[i]) AS rv
  FROM c{iters} cc, q WHERE cc.c IN (SELECT c FROM probe)){tabs},
adc AS (
  SELECT f.vec_id, {dist} AS adc_dist
  FROM fin f {code_joins} {tab_joins}
  WHERE f.c IN (SELECT c FROM probe)),
cand AS (SELECT vec_id FROM adc
         ORDER BY adc_dist, vec_id LIMIT {topk * alpha})
SELECT e.vec_id,
       round(list_sum(list_transform(range(1, len(e.embedding)+1),
         i -> (CAST(e.embedding[i] AS DOUBLE) - q.qv[i])
            * (CAST(e.embedding[i] AS DOUBLE) - q.qv[i]))), 6) AS l2_dist
FROM e JOIN cand USING (vec_id), q
ORDER BY list_sum(list_transform(range(1, len(e.embedding)+1),
         i -> (CAST(e.embedding[i] AS DOUBLE) - q.qv[i])
            * (CAST(e.embedding[i] AS DOUBLE) - q.qv[i]))), e.vec_id
LIMIT {topk}
"""


ORACLES["ivfpq_rerank_probe"] = _ivfpq_rerank_oracle_sql()


def q_token_budget_mixture(spark, sf_dir):
    """Token-budgeted source mixture (pipeline.token_budget_mixture):
    keep each source's expected token mass at its budget via
    rate_s = min(1, budget_s / tokens_s) + the deterministic md5 gate.
    FULL oracle: the per-source token sums, the rate arithmetic and the
    hex-threshold gate all replay in plain SQL (the mixture_sample
    twin, with budgets over SUM(n_chars) instead of doc proportions)."""
    from .operators.pipeline import token_budget_mixture
    docs = _docs(spark, sf_dir)
    out = token_budget_mixture(
        docs, "source", {"src0": 40_000.0, "src1": 15_000.0}, "doc_id")
    return out.select("doc_id", "source")


ORACLES["token_budget_mixture"] = """
WITH tot AS (
  SELECT source, SUM(CAST(n_chars AS DOUBLE)) AS tok,
         CASE source WHEN 'src0' THEN 40000.0
                     WHEN 'src1' THEN 15000.0 END AS b
  FROM documents GROUP BY source
), rates AS (
  SELECT source, LEAST(1.0, b / tok) AS rate FROM tot WHERE b IS NOT NULL
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE rate >= 1.0
   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      < printf('%04x', CAST(floor(rate * 65536) AS INT))
"""


def _assert_exact_rerank_premise(name, emb, k, rerank,
                                 path=None, nprobe=None):
    """The exact-equivalence gate both rerank registry entries rest on
    (ADVICE r5: the boundary held silently with zero margin) — shared
    so a fixture-growth fix can never update one site and leave the
    other's constant stale.  Guards BOTH halves of the premise
    (ADVICE r6): the candidate pool covers the corpus (k·α ≥ n) AND
    the probe opens every index cell (nprobe ≥ built cell count, read
    from the snapshot meta) — either half failing silently would
    surface as an opaque oracle mismatch instead of this error."""
    n = emb.count()
    if k * rerank < n:
        raise AssertionError(
            f"{name} exact-equivalence boundary broken: "
            f"k*rerank={k * rerank} < corpus {n}; raise rerank")
    if path is not None:
        ncells = len(persisted_index.snapshot_meta(path, None)["centroids"])
        if nprobe < ncells:
            raise AssertionError(
                f"{name} exact-equivalence boundary broken: nprobe="
                f"{nprobe} < the index's {ncells} cells — un-probed "
                f"cells would hide corpus rows from the candidate pass")


def q_pq_batch_rerank(spark, sf_dir):
    """BATCH two-stage IVF-PQ serve
    (persisted_index.probe_ivfpq_table_batch(rerank=α)): three query
    vectors ride one closure matrix through the ADC scan, their
    candidate (qid, id) pairs broadcast-semi-join the raw refine
    column from the same manifest-pruned cells, and exact L2 re-ranks
    per query — the batch form of pq_rerank_topk, same FULL-hash gate:
    all cells probed with k·α ≥ corpus makes each query's re-ranked
    result EXACTLY its brute-force L2 top-10, which the oracle states
    per qid.  The bounded-α batch path is pinned by
    test_ivfpq_batch_rerank_equals_single_probes."""
    path = _ivfpq_index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    k, rerank = 10, 200
    _assert_exact_rerank_premise("pq_batch_rerank", emb, k, rerank,
                                 path=path, nprobe=4)
    queries = (emb.where(F.col("vec_id").isin([3, 7, 11]))
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qvec")))
    out = persisted_index.probe_ivfpq_table_batch(
        spark, path, queries, k=k, nprobe=4, rerank=rerank)
    return out.select("qid", "vec_id",
                      F.round("l2_dist", 6).alias("l2_dist"))


_PQ_BATCH_RERANK_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id IN (3, 7, 11)),
d AS (
  SELECT q.qid, e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding)+1),
           i -> (CAST(e.embedding[i] AS DOUBLE) - q.qv[i])
              * (CAST(e.embedding[i] AS DOUBLE) - q.qv[i]))) AS l2
  FROM embeddings e, q),
r AS (
  SELECT qid, vec_id, l2,
         row_number() OVER (PARTITION BY qid
                            ORDER BY l2, vec_id) AS rn
  FROM d)
SELECT qid, vec_id, round(l2, 6) AS l2_dist
FROM r WHERE rn <= 10
"""
ORACLES["pq_batch_rerank"] = _PQ_BATCH_RERANK_ORACLE


def q_prf_expansion(spark, sf_dir):
    """Pseudo-relevance-feedback retrieval (Rocchio's two-pass idiom),
    SERVED from the standing FTS index: (1) BM25 top-10 for the seed
    terms ['data','query'] via the persisted probe (manifest-pruned
    token-range reads + meta corpus stats); (2) expansion terms = the
    top-5 tokens of those 10 docs by summed frequency (seeds excluded;
    the doc texts come from the DOCUMENTS table by id — the forward
    index — never a uid-scan of the token-sorted postings); (3) final
    BM25 top-10 for seeds+expansion.  The 5 expansion terms are a
    bounded driver fetch (the q_ivf_probe query-vector precedent).
    Every cut is engine-portable: stage 1 and 3 order by 6 dp-rounded
    score then doc_id (the bm25_probe precedent), stage 2 by integer
    tf then term."""
    from .operators.text import tokens as _tok
    fts_path = _retrieval_indexes(spark, sf_dir)["fts"]
    seeds = ["data", "query"]
    top1 = (persisted_index.probe_fts_table(spark, fts_path, seeds)
            .select(F.substring("uid", 10, 30).cast("long")
                    .alias("doc_id"),
                    F.round("score", 6).alias("s"))
            .orderBy(F.col("s").desc(), F.col("doc_id")).limit(10))
    exp = (_docs(spark, sf_dir).join(F.broadcast(top1), "doc_id")
           .select(F.explode(_tok(F.col("text"))).alias("term"))
           .where(~F.col("term").isin(seeds))
           .groupBy("term").agg(F.count("*").alias("tf"))
           .orderBy(F.col("tf").desc(), F.col("term")).limit(5))
    terms = seeds + [r["term"] for r in exp.collect()]
    return (persisted_index.probe_fts_table(spark, fts_path, terms)
            .select(F.substring("uid", 10, 30).cast("long")
                    .alias("doc_id"),
                    F.round("score", 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id")).limit(10))


def _bm25_cte(tf_where: str, tag: str) -> str:
    """One BM25 scoring chain over the shared tokenizer CTEs —
    parameterized by the tf filter so the PRF oracle can run the seed
    pass and the expanded pass with identical constants (k1=1.2,
    b=0.75, idf=ln((n-df+.5)/(df+.5)+1) — probe_fts_table's exact
    formula)."""
    return f"""
tf{tag} AS (
  SELECT toks.doc_id, u.tok AS term, COUNT(*) AS tf
  FROM toks, UNNEST(ws) AS u(tok)
  WHERE {tf_where}
  GROUP BY toks.doc_id, u.tok),
dfreq{tag} AS (SELECT term, COUNT(DISTINCT doc_id) AS df
               FROM tf{tag} GROUP BY term),
scored{tag} AS (
  SELECT t.doc_id,
         SUM( ln((s.n - d.df + 0.5)/(d.df + 0.5) + 1.0)
              * (t.tf * 2.2)
              / (t.tf + 1.2 * (1 - 0.75 + 0.75 * docs.dl / s.avgdl))
            ) AS score
  FROM tf{tag} t JOIN dfreq{tag} d USING (term)
       JOIN docs ON docs.doc_id = t.doc_id
       CROSS JOIN stats s
  GROUP BY t.doc_id)"""


_PRF_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(
    string_split_regex(lower(text),'[^a-z0-9]+'), x -> x != '') AS ws
  FROM documents
),
docs AS (SELECT doc_id, len(ws) AS dl FROM toks WHERE len(ws) > 0),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),""" + \
    _bm25_cte("u.tok IN ('data','query')", "1") + """,
top1 AS (SELECT doc_id FROM scored1
         ORDER BY round(score, 6) DESC, doc_id LIMIT 10),
exp AS (
  SELECT u.tok AS term, COUNT(*) AS tf
  FROM toks JOIN top1 USING (doc_id), UNNEST(ws) AS u(tok)
  WHERE u.tok NOT IN ('data','query')
  GROUP BY u.tok ORDER BY tf DESC, term LIMIT 5),""" + \
    _bm25_cte("u.tok IN ('data','query') "
              "OR u.tok IN (SELECT term FROM exp)", "2") + """
SELECT doc_id, round(score, 6) AS score
FROM scored2
ORDER BY round(score, 6) DESC, doc_id
LIMIT 10
"""
ORACLES["prf_expansion"] = _PRF_ORACLE


def q_ann_recall_curve(spark, sf_dir):
    """ANN serving-quality evaluation over the standing IVF table:
    recall@10 of the manifest-pruned probe vs exact brute force (the
    nprobe=8 probe over an 8-cell index reads every cell, so it IS the
    exact top-10) for nprobe ∈ {1,2,4,8} — the capacity-planning curve
    an operator reads before picking a probe width.  Four bounded
    probes of a constant-size loop (the q_ivf_probe collect precedent);
    hits is the integer overlap, recall = hits/10.  The oracle replays
    the identical deterministic k-means (shared unrolled-Lloyd chain)
    and cell restriction per nprobe."""
    ivf_path = _retrieval_indexes(spark, sf_dir)["ivf"]
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0)
          .select("embedding").collect()[0][0]]
    base = {r["vec_id"] for r in persisted_index.probe_ivf_table(
        spark, ivf_path, qv, k=10, nprobe=8).collect()}
    rows = []
    for np_ in (1, 2, 4, 8):
        # nprobe=8 IS the exact probe — reuse base instead of running
        # the identical all-cells job twice
        got = base if np_ == 8 else {
            r["vec_id"] for r in persisted_index.probe_ivf_table(
                spark, ivf_path, qv, k=10, nprobe=np_).collect()}
        hits = len(got & base)
        rows.append((np_, hits, round(hits / 10.0, 6)))
    return spark.createDataFrame(rows,
                                 "nprobe int, hits int, recall double")


def _ann_recall_oracle_sql(k: int = 8, iters: int = 2,
                           topk: int = 10) -> str:
    branches = []
    probes = []
    for np_ in (1, 2, 4, 8):
        probes.append(f"""
probe{np_} AS (SELECT c FROM celld ORDER BY d, c LIMIT {np_}),
top{np_} AS (
  SELECT vec_id FROM scored WHERE c IN (SELECT c FROM probe{np_})
  ORDER BY cos DESC, vec_id LIMIT {topk})""")
        branches.append(f"""
SELECT {np_} AS nprobe,
       (SELECT COUNT(*) FROM top{np_} JOIN base USING (vec_id)) AS hits,
       round((SELECT COUNT(*) FROM top{np_} JOIN base USING (vec_id))
             / {topk}.0, 6) AS recall""")
    return _ivf_ctes(k, iters) + f""",
q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM e WHERE vec_id = 0),
celld AS (
  SELECT c{iters}.c,
         list_sum(list_transform(range(1, len(q.qv)+1),
           i -> (c{iters}.cent[i] - q.qv[i])
              * (c{iters}.cent[i] - q.qv[i]))) AS d
  FROM c{iters}, q),
scored AS (
  SELECT fin.c, e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding)+1),
           i -> q.qv[i] * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(q.qv)+1),
              i -> q.qv[i] * q.qv[i])))
          * sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
              i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE))))) AS cos
  FROM e JOIN fin USING (vec_id), q),
base AS (SELECT vec_id FROM scored ORDER BY cos DESC, vec_id
         LIMIT {topk}),{",".join(probes)}
{" UNION ALL ".join(branches)}
ORDER BY nprobe
"""


ORACLES["ann_recall_curve"] = _ann_recall_oracle_sql()


# Plan cache (prepared-statement semantics): the catalog queries are pure
# functions of immutable inputs (parquet fixtures + the memoized graph
# encoding), so the analyzed/optimized logical plan can be reused across
# calls for the same (session, sf_dir).  Analysis of the heavier
# expression trees (minhash's salted-hash lambdas) costs ~1.3 s per call —
# 10× the actual execution at sf0.1; re-executing a cached handle re-runs
# the full physical job, so timings still measure real work.
_PLAN_CACHE: dict = {}


_SHIPPED_SESSIONS: set = set()


def _ensure_shipped(spark):
    # The driver hands us its own SparkSession; Pandas-UDF closures in this
    # package pickle by reference, so workers must be able to import it —
    # ship the package zip once per session (same mechanism as a cluster
    # deploy; no-op cost afterwards).
    if id(spark) not in _SHIPPED_SESSIONS:
        from .session import _ship_package
        _ship_package(spark)
        _SHIPPED_SESSIONS.add(id(spark))


def _plan_cached(name, fn):
    def wrapper(spark, sf_dir, _name=name, _fn=fn):
        _ensure_shipped(spark)
        key = (id(spark), sf_dir, _name)
        df = _PLAN_CACHE.get(key)
        if df is None:
            df = _fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
        return df
    wrapper.__name__ = f"q_{name}"
    wrapper.__doc__ = fn.__doc__
    return wrapper


QUERIES = {
    "node_kind_counts": q_node_kind_counts,
    "edge_kind_counts": q_edge_kind_counts,
    "filter_json": q_filter_json,
    "filter_glob": q_filter_glob,
    "one_hop": q_one_hop,
    "two_hop": q_two_hop,
    "three_hop": q_three_hop,
    "group_count": q_group_count,
    "order_limit": q_order_limit,
    "count_distinct": q_count_distinct,
    "traverse_out": q_traverse_out,
    "degree_supplier": q_degree_supplier,
    "set_difference": q_set_difference,
    "set_intersection": q_set_intersection,
    "fts_term": q_fts_term,
    "fts_prefix": q_fts_prefix,
    "fts_and": q_fts_and,
    "sql_escape_hatch": q_sql_escape_hatch,
    "offset_page": q_offset_page,
    "group_concat": q_group_concat,
    "theta_join": q_theta_join,
    "param_bind": q_param_bind,
    "point_lookup": q_point_lookup,
    "edge_prop_filter": q_edge_prop_filter,
    "fts_or": q_fts_or,
    "fts_not": q_fts_not,
    "fts_field": q_fts_field,
    "fts_phrase": q_fts_phrase,
    "sliding_window": q_sliding_window,
    "bpe_token_count": q_bpe_token_count,
    "jaccard_pairs": q_jaccard_pairs,
    "graph_q1": q_graph_q1,
    "tpch_q1": q_tpch_q1,
    "tpch_q6": q_tpch_q6,
    "orders_by_segment": q_orders_by_segment,
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "top_bigrams": q_top_bigrams,
    "minhash_pairs": q_minhash_pairs,
    "text_stats": q_text_stats,
    "token_count_by_lang": q_token_count_by_lang,
    "quality_score": q_quality_score,
    "knn_cosine": q_knn_cosine,
    "events_window": q_events_window,
    "sessionize": q_sessionize,
    "k_hop": q_k_hop,
    "language_id": q_language_id,
    "copurchase_pairs": q_copurchase_pairs,
    "asof_join": q_asof_join,
    "topk_per_group": q_topk_per_group,
    "rollup_revenue": q_rollup_revenue,
    "cube_revenue": q_cube_revenue,
    "percentile_price": q_percentile_price,
    "moving_avg_daily": q_moving_avg_daily,
    "range_join_events": q_range_join_events,
    "pivot_status": q_pivot_status,
    "grouping_sets": q_grouping_sets,
    "window_rank": q_window_rank,
    "tpch_q3": q_tpch_q3,
    "anti_join_customers": q_anti_join_customers,
    "regex_extract": q_regex_extract,
    "hash_sample": q_hash_sample,
    "embedding_near_dup": q_embedding_near_dup,
    "bm25_rank": q_bm25_rank,
    "ivf_topk": q_ivf_topk,
    "connected_components": q_connected_components,
    "pagerank_top10": q_pagerank_top10,
    "pagerank_nations": q_pagerank_nations,
    "chunk_docs": q_chunk_docs,
    "contamination": q_contamination,
    "triangles_copurchase": q_triangles_copurchase,
    "bfs_distance": q_bfs_distance,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "simhash_pairs": q_simhash_pairs,
    "ann_lsh_topk": q_ann_lsh_topk,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "tpch_q7": q_tpch_q7,
    "tpch_q10": q_tpch_q10,
    "above_nation_avg": q_above_nation_avg,
    "running_total": q_running_total,
    "ntile_quartiles": q_ntile_quartiles,
    "event_funnel": q_event_funnel,
    "event_props_json": q_event_props_json,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q22": q_tpch_q22,
    "tpch_q2": q_tpch_q2,
    "tpch_q11": q_tpch_q11,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "stratified_sample": q_stratified_sample,
    "mixture_sample": q_mixture_sample,
    "pack_shards": q_pack_shards,
    "pii_redact": q_pii_redact,
    "quality_filter": q_quality_filter,
    "sssp_cost": q_sssp_cost,
    "interval_join_events": q_interval_join_events,
    "approx_distinct_users": q_approx_distinct_users,
    "approx_percentiles": q_approx_percentiles,
    "optional_match": q_optional_match,
    "corpus_pipeline": q_corpus_pipeline,
    "label_propagation": q_label_propagation,
    "unigram_logprob": q_unigram_logprob,
    "retention_cohorts": q_retention_cohorts,
    "global_shuffle": q_global_shuffle,
    "train_val_test": q_train_val_test,
    "k_core_orders": q_k_core,
    "transitivity_copurchase": q_transitivity,
    "assortativity_orders": q_assortativity,
    "cumulative_users": q_cumulative_users,
    "basket_lift": q_basket_lift,
    "fts_near": q_fts_near,
    "fts_colgroup": q_fts_colgroup,
    "repetition_filter": q_repetition_filter,
    "hits_authorities": q_hits_authorities,
    "link_prediction": q_link_prediction,
    "pack_sequences": q_pack_sequences,
    "personalized_pagerank": q_personalized_pagerank,
    "var_length_reach": q_var_length_reach,
    "bfs_paths": q_bfs_paths,
    "empty_orders": q_empty_orders,
    "line_dedup": q_line_dedup,
    "dedup_resolve": q_dedup_resolve,
    "cluster_balanced": q_cluster_balanced,
    "ppl_bucket_sample": q_ppl_bucket_sample,
    "decontaminate_spans": q_decontaminate_spans,
    "lsh_near_dup": q_lsh_near_dup,
    "audio_features": q_audio_features,
    "gif_frames": q_gif_frames,
    "winnow_pairs": q_winnow_pairs,
    "semantic_dedup": q_semantic_dedup,
    "weighted_sample": q_weighted_sample,
    "asof_nearest": q_asof_nearest,
    "source_reputation": q_source_reputation,
    "bigram_logprob": q_bigram_logprob,
    "resample_locf": q_resample_locf,
    "bpe_train": q_bpe_train,
    "pq_topk": q_pq_topk,
    "random_walks": q_random_walks,
    "event_transitions": q_event_transitions,
    "incremental_dedup": q_incremental_dedup,
    "bpe_tokenize": q_bpe_tokenize,
    "profile_events": q_profile_events,
    "knn_join": q_knn_join,
    "containment_pairs": q_containment_pairs,
    "standardize_embeddings": q_standardize,
    "jl_projection": q_jl_projection,
    "dag_layers": q_dag_layers,
    "scc_parts": q_scc,
    "temperature_mixture": q_temperature_mixture,
    "negative_samples": q_negative_samples,
    "apply_cdc": q_apply_cdc,
    "histogram_values": q_histogram_values,
    "winsorize_values": q_winsorize_values,
    "tfidf_keywords": q_tfidf_keywords,
    "reciprocity_parts": q_reciprocity,
    "grouped_split": q_grouped_split,
    "interval_lookup": q_interval_lookup,
    "grouped_percentiles": q_grouped_percentiles,
    "degree_distribution": q_degree_distribution,
    "modal_event": q_modal_event,
    "media_pipeline": q_media_pipeline,
    "k_truss_parts": q_k_truss,
    "sentence_stats": q_sentence_stats,
    "interarrival_stats": q_interarrival_stats,
    "pixel_stats": q_pixel_stats,
    "jpeg_stats": q_jpeg_stats,
    "weekly_trend": q_weekly_trend,
    "transition_entropy": q_transition_entropy,
    "pmi_collocations": q_pmi_collocations,
    "zscore_anomaly": q_zscore_anomaly,
    "autocorr_revenue": q_autocorr_revenue,
    "benford_digits": q_benford_digits,
    "rfm_segments": q_rfm_segments,
    "activity_streaks": q_activity_streaks,
    "decile_share": q_decile_share,
    "gini_revenue": q_gini_revenue,
    "fingerprint_dups": q_fingerprint_dups,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "lexical_diversity": q_lexical_diversity,
    "zipf_slope": q_zipf_slope,
    "mad_outliers": q_mad_outliers,
    "scd2_intervals": q_scd2_intervals,
    "attribution_last_touch": q_attribution_last_touch,
    "rolling_distinct_users": q_rolling_distinct_users,
    "skyline_parts": q_skyline_parts,
    "ngram_novelty": q_ngram_novelty,
    "rrf_fusion": q_rrf_fusion,
    "mmr_select": q_mmr_select,
    "silhouette_kmeans": q_silhouette_kmeans,
    "new_vs_returning": q_new_vs_returning,
    "cohort_ltv": q_cohort_ltv,
    "churn_screen": q_churn_screen,
    "seq_copurchase": q_seq_copurchase,
    "rich_club": q_rich_club,
    "neighbor_degree": q_neighbor_degree,
    "ewma_revenue": q_ewma_revenue,
    "spend_percentile": q_spend_percentile,
    "ahash_groups": q_ahash_groups,
    "fk_orphans": q_fk_orphans,
    "calendar_gaps": q_calendar_gaps,
    "chisq_independence": q_chisq_independence,
    "category_entropy": q_category_entropy,
    "survival_curve": q_survival_curve,
    "ab_proportion_test": q_ab_proportion_test,
    "user_trend_slope": q_user_trend_slope,
    "readability_scores": q_readability_scores,
    "abc_classification": q_abc_classification,
    "leadtime_percentiles": q_leadtime_percentiles,
    "discount_quantity_corr": q_discount_quantity_corr,
    "weekday_seasonality": q_weekday_seasonality,
    "hhi_by_month": q_hhi_by_month,
    "modularity_lpa": q_modularity_lpa,
    "node_jaccard": q_node_jaccard,
    "revenue_drawdown": q_revenue_drawdown,
    "bot_screen": q_bot_screen,
    "conversion_latency": q_conversion_latency,
    "seasonal_naive_backtest": q_seasonal_naive_backtest,
    "basket_diversity": q_basket_diversity,
    "topk_share_by_nation": q_topk_share_by_nation,
    "return_rate_by_discount": q_return_rate_by_discount,
    "price_dispersion": q_price_dispersion,
    "ks_statistic": q_ks_statistic,
    "mann_whitney": q_mann_whitney,
    "welch_ttest": q_welch_ttest,
    "revenue_peaks": q_revenue_peaks,
    "level_shifts": q_level_shifts,
    "session_event_pairs": q_session_event_pairs,
    "ssjoin_exact": q_ssjoin_exact,
    "closeness_nations": q_closeness_nations,
    "holt_forecast": q_holt_forecast,
    "priority_sample": q_priority_sample,
    "local_clustering": q_local_clustering,
    "seq_triples": q_seq_triples,
    "embedding_covariance": q_embedding_covariance,
    "interval_coverage": q_interval_coverage,
    "betweenness_customers": q_betweenness_customers,
    "minhash_recall": q_minhash_recall,
    "stratified_topn": q_stratified_topn,
    "funnel_windowed": q_funnel_windowed,
    "psi_drift": q_psi_drift,
    "dsir_select": q_dsir_select,
    "hits_copurchase": q_hits_copurchase,
    "katz_parts": q_katz_parts,
    "item_recommendations": q_item_recommendations,
    "mis_parts": q_mis_parts,
    "sorted_neighborhood": q_sorted_neighborhood,
    "theil_sen": q_theil_sen,
    "greedy_cover": q_greedy_cover,
    "facility_location": q_facility_location,
    "cohort_retention": q_cohort_retention,
    "incremental_agg": q_incremental_agg,
    "twap_users": q_twap_users,
    "segment_overlap": q_segment_overlap,
    "session_labels": q_session_labels,
    "hard_negatives": q_hard_negatives,
    "spearman_corr": q_spearman_corr,
    "cusum_alarm": q_cusum_alarm,
    "wilson_intervals": q_wilson_intervals,
    "kendall_nations": q_kendall_nations,
    "eb_shrinkage": q_eb_shrinkage,
    "sax_symbols": q_sax_symbols,
    "textrank_keywords": q_textrank_keywords,
    "isotonic_trend": q_isotonic_trend,
    "exact_median_terasort": q_exact_median_terasort,
    "frequent_triples": q_frequent_triples,
    "ppr_asia": q_ppr_asia,
    "maximal_matching": q_maximal_matching,
    "changepoint_sse": q_changepoint_sse,
    "rebalance_audit": q_rebalance_audit,
    "percolation_curve": q_percolation_curve,
    "simrank_parts": q_simrank_parts,
    "corpus_pipeline_v2": q_corpus_pipeline_v2,
    "shapley_attribution": q_shapley_attribution,
    "attack_robustness": q_attack_robustness,
    "kappa_langid": q_kappa_langid,
    "boilerplate_lines": q_boilerplate_lines,
    "heaps_law": q_heaps_law,
    "burstiness_users": q_burstiness_users,
    "ndcg_ann": q_ndcg_ann,
    "kfold_groups": q_kfold_groups,
    "timeseries_cv": q_timeseries_cv,
    "dispersion_index": q_dispersion_index,
    "did_estimator": q_did_estimator,
    "littles_law": q_littles_law,
    "aa_test": q_aa_test,
    "price_elasticity": q_price_elasticity,
    "repeat_purchase_fit": q_repeat_purchase_fit,
    "abc_xyz": q_abc_xyz,
    "p_chart": q_p_chart,
    "topk_turnover": q_topk_turnover,
    "logodds_terms": q_logodds_terms,
    "quota_violations": q_quota_violations,
    "peak_concurrency": q_peak_concurrency,
    "hill_tail": q_hill_tail,
    "var_cvar": q_var_cvar,
    "jsd_daily_mix": q_jsd_daily_mix,
    "cuped_adjustment": q_cuped_adjustment,
    "budget_allocation": q_budget_allocation,
    "mann_kendall": q_mann_kendall,
    "runs_test": q_runs_test,
    "durbin_watson": q_durbin_watson,
    "friedman_test": q_friedman_test,
    "segment_migration": q_segment_migration,
    "theil_index": q_theil_index,
    "growth_contribution": q_growth_contribution,
    "price_index": q_price_index,
    "stickiness": q_stickiness,
    "data_contract": q_data_contract,
    "hour_concentration": q_hour_concentration,
    "qte_segments": q_qte_segments,
    "conformal_interval": q_conformal_interval,
    "policy_replay": q_policy_replay,
    "anova_segments": q_anova_segments,
    "degree_powerlaw": q_degree_powerlaw,
    "basket_entropy_nation": q_basket_entropy_nation,
    "whale_share": q_whale_share,
    "trade_flows": q_trade_flows,
    "supply_concentration": q_supply_concentration,
    "source_dup_matrix": q_source_dup_matrix,
    "backlog_curve": q_backlog_curve,
    "ccdf_orders": q_ccdf_orders,
    "revenue_bridge": q_revenue_bridge,
    "dedup_roi": q_dedup_roi,
    "seasonality_strength": q_seasonality_strength,
    "quartile_dispersion": q_quartile_dispersion,
    "lines_per_order_trend": q_lines_per_order_trend,
    "tenure_spend_corr": q_tenure_spend_corr,
    "acf_table": q_acf_table,
    "markov_steady_state": q_markov_steady_state,
    "token_burstiness": q_token_burstiness,
    "mutual_knn": q_mutual_knn,
    "dead_stock": q_dead_stock,
    "session_depth_curve": q_session_depth_curve,
    "price_stickiness": q_price_stickiness,
    "roc_curve": q_roc_curve,
    "pr_curve": q_pr_curve,
    "brier_calibration": q_brier_calibration,
    "butterfly_count": q_butterfly_count,
    "diameter_sweep": q_diameter_sweep,
    "eigenvector_parts": q_eigenvector_parts,
    "unpivot_metrics": q_unpivot_metrics,
    "bitmap_distinct": q_bitmap_distinct,
    "croston_demand": q_croston_demand,
    "attribution_time_decay": q_attribution_time_decay,
    "moments_by_segment": q_moments_by_segment,
    "lorenz_curve": q_lorenz_curve,
    "otif_rate": q_otif_rate,
    "embedding_norm_outliers": q_embedding_norm_outliers,
    "seasonal_decomposition": q_seasonal_decomposition,
    "discount_qty_heatmap": q_discount_qty_heatmap,
    "equi_depth_bounds": q_equi_depth_bounds,
    "lateness_audit": q_lateness_audit,
    "id_gaps": q_id_gaps,
    "newsvendor_stock": q_newsvendor_stock,
    "srm_check": q_srm_check,
    "power_analysis": q_power_analysis,
    "hypergeom_enrichment": q_hypergeom_enrichment,
    "quantile_normalize": q_quantile_normalize,
    "gains_curve": q_gains_curve,
    "quality_rule_breakdown": q_quality_rule_breakdown,
    "token_length_histogram": q_token_length_histogram,
    "pack_efficiency_curve": q_pack_efficiency_curve,
    "lang_confusion": q_lang_confusion,
    "oov_rate": q_oov_rate,
    "split_leakage_check": q_split_leakage_check,
    "shingle_df_histogram": q_shingle_df_histogram,
    "ahash_near_dup": q_ahash_near_dup,
    "qq_year_compare": q_qq_year_compare,
    "substring_spans": q_substring_spans,
    "dbscan_embeddings": q_dbscan_embeddings,
    "price_model": q_price_model,
    "mst_trade": q_mst_trade,
    "single_linkage_nations": q_single_linkage_nations,
    "tokenizer_fertility": q_tokenizer_fertility,
    "hll_distinct": q_hll_distinct,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "markov_removal_effects": q_markov_removal_effects,
    "edit_distance_pairs": q_edit_distance_pairs,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "corpus_pipeline_v3": q_corpus_pipeline_v3,
    "rec_precision_at_k": q_rec_precision_at_k,
    "k_anonymity": q_k_anonymity,
    "posting_lists": q_posting_lists,
    "video_features": q_video_features,
    "l_diversity": q_l_diversity,
    "t_closeness": q_t_closeness,
    "kmv_setops": q_kmv_setops,
    "weighted_reservoir": q_weighted_reservoir,
    "lsh_probe": q_lsh_probe,
    "hybrid_search": q_hybrid_search,
    "bm25_probe": q_bm25_probe,
    "fts_match_probe": q_fts_match_probe,
    "ivf_probe": q_ivf_probe,
    "pq_rerank_topk": q_pq_rerank_topk,
    "ivfpq_rerank_probe": q_ivfpq_rerank_probe,
    "token_budget_mixture": q_token_budget_mixture,
    "prf_expansion": q_prf_expansion,
    "ann_recall_curve": q_ann_recall_curve,
    "pq_batch_rerank": q_pq_batch_rerank,
}

QUERIES = {name: _plan_cached(name, fn) for name, fn in QUERIES.items()}
