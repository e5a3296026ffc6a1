"""Batch graph analytics, Pregel-style over DataFrames.

The reference has no batch analytics (its traversals are point queries);
these are the scale-path extensions promised in SURVEY.md §7.3(e):
degrees, connected components, PageRank, k-hop frontier expansion — all
iterative DataFrame joins with lineage control (localCheckpoint every
iteration), since GraphX is JVM-only and unavailable from PySpark.

Scale notes: every iteration is one shuffle on uid; pre-partitioning the
edge list by ``startuid`` (``repartition(n, 'startuid')``) lets AQE reuse
the exchange across iterations.  Components/PageRank converge in
O(diameter) / O(iters) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges_df: DataFrame, direction: str = "both",
            uid_prefix: str | None = None) -> DataFrame:
    """(uid, degree) — counting edge *incidences* (a self-loop adds one to
    in and one to out but its edge-uid dedups to a single both-incidence
    per endpoint, matching the reference's union-by-uid counting,
    graphydb.py:1359-1378).

    ``uid_prefix`` restricts output to nodes whose uid starts with it —
    applied BEFORE the dedup/aggregation shuffle (per-node degrees are
    independent, so pre-filtering incidences is exact).  Filtering after
    would shuffle every incidence in the graph to keep a sliver: on the
    sf0.1 fixture that is 2.6M shuffled rows vs 120k for 'Supplier:'.
    """
    def pref(df, col):
        return df.where(F.col(col).startswith(uid_prefix)) \
            if uid_prefix else df

    out_d = pref(edges_df, "startuid") \
        .groupBy(F.col("startuid").alias("uid")) \
        .agg(F.count("*").alias("out_degree"))
    in_d = pref(edges_df, "enduid") \
        .groupBy(F.col("enduid").alias("uid")) \
        .agg(F.count("*").alias("in_degree"))
    if direction == "out":
        return out_d.withColumnRenamed("out_degree", "degree")
    if direction == "in":
        return in_d.withColumnRenamed("in_degree", "degree")
    both = (pref(edges_df, "startuid")
            .select("uid", F.col("startuid").alias("nuid"))
            .unionByName(pref(edges_df, "enduid")
                         .select("uid", F.col("enduid").alias("nuid")))
            .dropDuplicates(["uid", "nuid"]))
    return both.groupBy(F.col("nuid").alias("uid")) \
               .agg(F.count("*").alias("degree"))


def connected_components(nodes_df: DataFrame, edges_df: DataFrame,
                         max_iter: int = 20) -> DataFrame:
    """(uid, component) where component = min uid string in the component.

    Label propagation over the undirected edge set; each round is one
    join + one min-aggregation.  Converges in graph-diameter rounds;
    ``localCheckpoint`` caps lineage so 50-round runs stay planful.
    """
    sym = (edges_df.select(F.col("startuid").alias("src"),
                           F.col("enduid").alias("dst"))
           .unionByName(edges_df.select(F.col("enduid").alias("src"),
                                        F.col("startuid").alias("dst")))
           .distinct())
    labels = nodes_df.select(F.col("uid"), F.col("uid").alias("component"))
    for _ in range(max_iter):
        # neighbor labels + own label, take the min per node
        nbr = (sym.join(labels.withColumnRenamed("uid", "dst"), "dst")
                  .select(F.col("src").alias("uid"), "component"))
        new = (labels.unionByName(nbr)
                     .groupBy("uid").agg(F.min("component").alias("component"))
                     .localCheckpoint(eager=True))
        changed = (new.alias("n")
                   .join(labels.alias("o"), "uid")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new
        if changed == 0:
            break
    return labels


def pagerank(nodes_df: DataFrame, edges_df: DataFrame, iters: int = 10,
             damping: float = 0.85) -> DataFrame:
    """(uid, rank) — standard power iteration with dangling-mass
    redistribution; ranks sum to ~N (GraphX convention)."""
    n_total = nodes_df.count()
    out_deg = edges_df.groupBy(F.col("startuid").alias("uid")) \
                      .agg(F.count("*").alias("deg"))
    ranks = nodes_df.select("uid").withColumn("rank", F.lit(1.0))
    edges = edges_df.select(F.col("startuid").alias("uid"),
                            F.col("enduid").alias("dst"))
    for _ in range(iters):
        contrib_src = ranks.join(out_deg, "uid", "left")
        dangling = (contrib_src.where(F.col("deg").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
                    .collect()[0]["d"])
        contribs = (edges.join(contrib_src.where(F.col("deg").isNotNull()),
                               "uid")
                    .select(F.col("dst").alias("uid"),
                            (F.col("rank") / F.col("deg")).alias("c")))
        incoming = contribs.groupBy("uid").agg(F.sum("c").alias("inc"))
        base = 1.0 - damping + damping * dangling / n_total
        ranks = (nodes_df.select("uid")
                 .join(incoming, "uid", "left")
                 .select("uid",
                         (F.lit(base) + F.lit(damping) *
                          F.coalesce(F.col("inc"), F.lit(0.0))).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def k_hop(edges_df: DataFrame, seed_uids_df: DataFrame, k: int,
          direction: str = "out") -> DataFrame:
    """All uids within k hops of the seed set (frontier expansion with a
    visited anti-join — each hop shuffles only the frontier)."""
    if direction == "out":
        step = edges_df.select(F.col("startuid").alias("src"),
                               F.col("enduid").alias("dst"))
    elif direction == "in":
        step = edges_df.select(F.col("enduid").alias("src"),
                               F.col("startuid").alias("dst"))
    else:
        step = (edges_df.select(F.col("startuid").alias("src"),
                                F.col("enduid").alias("dst"))
                .unionByName(edges_df.select(F.col("enduid").alias("src"),
                                             F.col("startuid").alias("dst"))))
    visited = seed_uids_df.select(F.col("uid")).distinct()
    frontier = visited
    for _ in range(k):
        nxt = (step.join(frontier.withColumnRenamed("uid", "src"), "src")
                   .select(F.col("dst").alias("uid")).distinct()
                   .join(visited, "uid", "left_anti")
                   .localCheckpoint(eager=True))
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
