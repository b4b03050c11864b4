"""Graph analytics as relational iteration: PageRank over the nation
trade graph (customer-nation → supplier-nation edges mined from the
order/lineitem fact tables).

Why integer arithmetic: iterative float ops accumulate engine-specific
rounding, so a float PageRank can never hash-match a cross-engine oracle.
Scaling ranks to integers (S = 10^12) and using only floor division and
integer multiply/add makes every iteration bit-identical in Spark and
DuckDB — the oracle unrolls the same three iterations as CTE stages.
(Same determinism discipline as the md5-hash sampling operators.)

Scale posture: one iteration = ranks ⋈ edges (broadcast the rank frame —
node-sized, not edge-sized) + one groupBy(dst) sum — the standard
edge-partitioned PageRank step. Iterations chain the DAG; at real depth/
scale, localCheckpoint each round to cut lineage (as
dedup_cluster_components does) and handle dangling mass explicitly.
The reference has no graph surface (HLL sketch library only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register, tracked_persist
from hyperloglog_pyspark_spark.sources.catalog import load_table

PR_SCALE = 10**12  # integer rank scale
PR_ITERS = 3
PR_N = 25  # nations


_EDGES_SQL = """
        SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE cn.n_name <> sn.n_name
"""


def _pagerank_oracle() -> str:
    base = PR_SCALE // PR_N
    teleport = (PR_SCALE * 15) // (100 * PR_N)
    sql = f"""
    WITH edges AS ({_EDGES_SQL}),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    it0 AS (SELECT n_name AS node, CAST({base} AS BIGINT) AS rank FROM nation)
    """
    prev = "it0"
    for i in range(1, PR_ITERS + 1):
        sql += f""",
    it{i} AS (
        SELECT n.n_name AS node,
               CAST({teleport} + (85 * COALESCE(SUM(r.rank // d.outdeg), 0)) // 100
                    AS BIGINT) AS rank
        FROM nation n
        LEFT JOIN edges e ON e.dst = n.n_name
        LEFT JOIN deg d ON d.src = e.src
        LEFT JOIN {prev} r ON r.node = e.src
        GROUP BY n.n_name
    )"""
        prev = f"it{i}"
    sql += f"""
    SELECT node, rank AS rank_scaled,
           ROUND(rank / {float(PR_SCALE)}, 8) AS rank_norm
    FROM {prev}
    """
    return sql


@register("graph_pagerank_nations", category="analytics", bench=True, oracle=_pagerank_oracle())
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three damped PageRank iterations (d = 0.85, teleport mass uniform)
    over the distinct customer-nation → supplier-nation trade edges, in
    scaled integer arithmetic so the result is bit-exact cross-engine.
    Rank frames stay node-sized and broadcast; only the edge extraction
    touches fact-table scale."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(F.broadcast(cu), od["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na).withColumnRenamed("n_name", "src"), cu["c_nationkey"] == F.col("n_nationkey"))
        .drop("n_nationkey")
        .join(
            F.broadcast(na).withColumnRenamed("n_name", "dst"),
            su["s_nationkey"] == F.col("n_nationkey"),
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # Persisted (tracked): the fact-table edge extraction feeds every
    # iteration — without it each round replays the lineitem⋈orders join.
    # The out-degree is folded into the persisted edge rows up front so the
    # per-iteration plan is ONE broadcast join (current ranks) + one
    # node-sized aggregation, not two joins — at 25 nodes the iterations
    # are scheduler-bound, so fewer stages is the whole game.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = tracked_persist(edges.join(deg, "src"))
    nodes = na.select(F.col("n_name").alias("node"))
    base = PR_SCALE // PR_N
    teleport = (PR_SCALE * 15) // (100 * PR_N)
    ranks = nodes.withColumn("rank", F.lit(base).cast("long"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(F.broadcast(contrib.withColumnRenamed("dst", "node")), "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"(85 * COALESCE(contrib, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select(
        "node",
        F.col("rank").alias("rank_scaled"),
        F.round(F.col("rank") / float(PR_SCALE), 8).alias("rank_norm"),
    )
