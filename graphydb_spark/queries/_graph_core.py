"""graph-core queries (SURVEY §2.1-§2.8 over the FIXTURES §5 encoding).

Part of the ordered queries package (see __init__.py) — split from the
single-module queries.py in round 7; contiguous slice, original order.
"""
from __future__ import annotations

from ._shared import *  # noqa: F401,F403

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
    from ..operators.text import repetition_stats
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
    from ..operators.pipeline import pack_sequences
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
    from ..streaming.windows import sliding_counts
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
    from ._pipeline import q_minhash_pairs
    docs = _docs(spark, sf_dir)
    cand = q_minhash_pairs(spark, sf_dir)
    out = dedup.jaccard_verify(docs, cand, threshold=0.3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_containment_pairs(spark, sf_dir):
    """LSH candidates scored with asymmetric containment both ways —
    the quote/subset detector symmetric Jaccard misses.  FULL oracle
    (exact integer set sizes, 6 dp rounding before the threshold)."""
    from ._pipeline import q_minhash_pairs
    docs = _docs(spark, sf_dir)
    cand = q_minhash_pairs(spark, sf_dir)
    from ..operators.dedup import containment_pairs
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




#: module-level names this part defines (import * honors this,
#: underscores included)
__all__ = [
    'q_node_kind_counts',
    'q_edge_kind_counts',
    'q_filter_json',
    'q_filter_glob',
    'q_one_hop',
    'q_two_hop',
    'q_three_hop',
    'q_group_count',
    'q_order_limit',
    'q_count_distinct',
    'q_traverse_out',
    'q_degree_supplier',
    'q_set_difference',
    'q_set_intersection',
    'q_fts_term',
    'q_fts_prefix',
    'q_fts_and',
    'q_sql_escape_hatch',
    'q_offset_page',
    'q_group_concat',
    'q_theta_join',
    'q_param_bind',
    'q_point_lookup',
    'q_edge_prop_filter',
    'q_fts_or',
    'q_fts_not',
    'q_fts_field',
    'q_fts_phrase',
    'q_fts_near',
    'q_fts_colgroup',
    'q_repetition_filter',
    'q_hits_authorities',
    'q_link_prediction',
    'q_pack_sequences',
    'q_personalized_pagerank',
    'q_var_length_reach',
    'q_bfs_paths',
    'q_empty_orders',
    'q_sliding_window',
    'q_bpe_token_count',
    'q_jaccard_pairs',
    'q_containment_pairs',
    '_CONTAINMENT_ORACLE',
    'q_ingest_df_roundtrip',
    '_INGEST_DF_ORACLE',
]


def q_ingest_df_roundtrip(spark, sf_dir):
    """The DataFrame-native ingest path under the full-hash gate
    (round 9, VERDICT r8 #6): the nation table flows through
    Graph.ingest_nodes_df as a user-shaped frame (uid/kind + two prop
    columns) — executor-side packing into the stored sorted-props
    JSON, merge-upsert, no Python row at the driver — then the stored
    rows are read BACK through the props document (get_json_object),
    proving pack → store → extract round-trips every value.  The
    oracle recomputes straight from the parquet."""
    from graphydb_spark import Graph
    from pyspark.sql import functions as F

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    g = Graph(spark)
    g.ingest_nodes_df(nation.select(
        F.concat(F.lit("ing_"), F.col("n_nationkey").cast("string"))
        .alias("uid"),
        F.lit("Nation").alias("kind"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("rk")))
    return g.nodes_df.select(
        "uid", "kind",
        F.get_json_object("props", "$.name").alias("name"),
        F.get_json_object("props", "$.rk").cast("long").alias("rk"),
        "ctime", "mtime")


_INGEST_DF_ORACLE = """
SELECT 'ing_' || CAST(n_nationkey AS VARCHAR) AS uid,
       'Nation' AS kind,
       n_name AS name,
       CAST(n_regionkey AS BIGINT) AS rk,
       CAST(0.0 AS DOUBLE) AS ctime, CAST(0.0 AS DOUBLE) AS mtime
FROM nation
"""
ORACLES["ingest_df_roundtrip"] = _INGEST_DF_ORACLE
