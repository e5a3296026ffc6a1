"""the ORACLES dict literal + late oracle registrations.

Part of the ordered queries package (see __init__.py) — split from the
single-module queries.py in round 7; contiguous slice, original order.
"""
from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._graph_core import *  # noqa: F401,F403
from ._relational import *  # noqa: F401,F403
from ._pipeline import *  # noqa: F401,F403
from ._analytics_a import *  # noqa: F401,F403
from ._analytics_b import *  # noqa: F401,F403
from ._analytics_c import *  # noqa: F401,F403
from ._analytics_d import *  # noqa: F401,F403

# in-place update of the SHARED dict defined in _shared (object
# identity preserved across all parts — see _shared.ORACLES)
ORACLES.update({
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
})

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



#: module-level names this part defines (import * honors this,
#: underscores included)
__all__ = [
    'ORACLES',
]
