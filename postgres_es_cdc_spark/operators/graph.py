"""Graph iteration ([EXT]): PageRank over the customer↔supplier trade
graph derived from orders⋈lineitem.

Iterative algorithms are the one class Catalyst cannot plan end-to-end;
the loop lives on the driver but every iteration is pure DataFrame ops —
one shuffle (contributions keyed by destination) plus one co-keyed join
per iteration, the same per-iteration shape Pregel/GraphX would run.

Cross-engine exactness: ranks live in ×1e12 fixed-point integers and
every operation is integer arithmetic — floor division for the degree
split and the damping factor (0.85 = 17/20, 0.15/N = 15·SCALE/(100·N)) —
so each iteration is bit-identical in Spark and DuckDB and the oracle
can unroll the same three iterations in SQL. (Double-valued PageRank
would diverge: per-destination sums are order-dependent in floating
point.)

Scale: edges are the heavy table; they shuffle once per iteration on
src (join with ranks) and once on dst (contribution sum) — both
AQE-coalesced; the rank vector is one row per node, always the small
side. At 100 TB you would persist the partitioned edge table once and
reuse the partitioning every iteration (bucketed by src).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table

SCALE = 10**12
ITERS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected trade edges: distinct (customer, supplier) pairs that
    share an order line, both directions, with disjoint node ids
    (customer 2k, supplier 2k+1)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
         .select((F.col("o_custkey") * 2).alias("cust"),
                 (F.col("l_suppkey") * 2 + 1).alias("supp"))
         .distinct()
    )
    return (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
             .unionAll(pairs.select(F.col("supp").alias("src"),
                                    F.col("cust").alias("dst")))
    )


def graph_pagerank(spark: SparkSession, sf_dir: str,
                   iters: int = ITERS) -> DataFrame:
    """Fixed-point PageRank (damping 0.85), ``iters`` iterations.

    Returns (node, rank_q bigint, rank double): rank_q is the exact
    fixed-point value the oracle reproduces; rank is its descaled
    human-readable twin (one deterministic division)."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select("src").distinct().withColumnRenamed("src", "node")
    n_nodes = nodes.agg(F.count("*").alias("n"))

    # r0 = SCALE div N, uniformly.
    ranks = (nodes.crossJoin(F.broadcast(n_nodes))
                  .select("node", F.expr(f"{SCALE} div n").alias("r")))
    base = F.expr(f"{15 * SCALE} div (100 * n)")
    for _ in range(iters):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
                 .join(deg, "src")
                 .select(F.col("dst").alias("node"),
                         F.expr("r div deg").alias("c"))
                 .groupBy("node")
                 .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
                 .crossJoin(F.broadcast(n_nodes))
                 .select("node",
                         (base + F.expr("(17 * coalesce(s, 0)) div 20"))
                         .cast("long").alias("r"))
        )
    return ranks.select(
        "node", F.col("r").alias("rank_q"),
        (F.col("r").cast("double") / SCALE).alias("rank"))


def _iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node,
         CAST((15000000000000 // (100 * (SELECT n FROM nn)))
              + (17 * COALESCE(c.s, 0)) // 20 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
    FROM {prev} r
    JOIN edges e ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)"""


GRAPH_PAGERANK_SQL = f"""
WITH p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT cust AS src, supp AS dst FROM p
          UNION ALL SELECT supp AS src, cust AS dst FROM p),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({SCALE} // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes),
{",".join(_iter_sql(f"r{i}", f"r{i + 1}") for i in range(ITERS))}
SELECT node, r AS rank_q, CAST(r AS DOUBLE) / {SCALE} AS rank
FROM r{ITERS}
"""
