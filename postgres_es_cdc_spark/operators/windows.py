"""Window-function battery: ranking, offsets, frames, per-group top-k.

REF-derived: the CDC latest-state fold is itself a window
(row_number over offset desc — SURVEY.md §2 Table B); these queries are
the general surface. All windows partition by a real key, so the single
hash shuffle per window is the whole cost at scale; running sums use the
decimal trick because windowed double addition trees differ per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank per market segment."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_acctbal").alias("acctbal"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


WINDOW_RANK_SQL = """
SELECT c_custkey AS custkey, c_mktsegment AS mktsegment, c_acctbal AS acctbal,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline with lag/lead over a deterministic order."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
    )


WINDOW_LAG_SQL = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       o_totalprice - LAG(o_totalprice) OVER w AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer; decimal-exact so the frame
    aggregation tree shape can't perturb low bits cross-engine."""
    o = table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
               .orderBy("o_orderdate", "o_orderkey")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("totalprice"),
        running.alias("running_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("long").alias("order_seq"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS order_seq
FROM orders
"""


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-clause battery: first_value / nth_value, rolling ROWS
    max, and a value-based RANGE frame (30-day rolling spend) over a
    numeric day axis — the frame semantics streaming rollups build on."""
    o = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"),
                     F.lit("1995-01-01").cast("date"))
    o = o.withColumn("order_day", day.cast("long"))
    w = Window.partitionBy("o_custkey").orderBy("order_day", "o_orderkey")
    w3 = w.rowsBetween(-2, Window.currentRow)
    wr = (Window.partitionBy("o_custkey").orderBy("order_day")
                .rangeBetween(-30, Window.currentRow))
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("order_day"),
        F.col("o_totalprice").alias("totalprice"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.max("o_totalprice").over(w3).alias("rolling3_max"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wr)
         .cast("double").alias("spend_30d"),
    )


WINDOW_FRAMES_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS order_day
  FROM orders
)
SELECT o_orderkey AS orderkey, o_custkey AS custkey, order_day,
       o_totalprice AS totalprice,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
       MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling3_max,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY order_day
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day, o_orderkey)
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — row_number filter pattern.

    Scales as one shuffle; Spark pushes the rank filter into the window
    via WindowGroupLimit (rank-based top-k pushdown), so no group blowup.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("price_rank", F.row_number().over(w).cast("long"))
         .filter(F.col("price_rank") <= 3)
         .select(F.col("o_custkey").alias("custkey"),
                 F.col("o_orderkey").alias("orderkey"),
                 F.col("o_totalprice").alias("totalprice"),
                 F.col("price_rank"))
    )


TOPK_PER_GROUP_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       o_totalprice AS totalprice, price_rank
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
      FROM orders)
WHERE price_rank <= 3
"""


def nation_share_of_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (nation, segment) customer-balance total as
    a share of its nation's total and of the grand total — window
    aggregates OVER an aggregated frame (sum over sum), the pattern
    behind every 'share of' dashboard column.

    Exactness: balances are exact-2dp; totals stay DECIMAL through both
    window sums, and each share is ONE double division of exact cents —
    deterministic cross-engine. Scale: windows run on the |nation|x
    |segment| rollup (tiny), never the raw table; the heavy pass is the
    single partial-aggregable groupBy."""
    c = table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    g = (c.groupBy(F.col("c_nationkey").alias("nationkey"),
                   F.col("c_mktsegment").alias("mktsegment"))
          .agg(F.sum(cents).alias("bal_c")))
    wn = Window.partitionBy("nationkey")
    wall = Window.partitionBy()
    return g.select(
        "nationkey", "mktsegment",
        (F.col("bal_c").cast("double") / 100.0).alias("segment_bal"),
        (F.col("bal_c").cast("double")
         / F.sum("bal_c").over(wn).cast("double")).alias("share_of_nation"),
        (F.col("bal_c").cast("double")
         / F.sum("bal_c").over(wall).cast("double")).alias("share_of_total"),
    )


NATION_SHARE_SQL = """
WITH g AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS bal_c
  FROM customer GROUP BY 1, 2
)
SELECT nationkey, mktsegment,
       CAST(bal_c AS DOUBLE) / 100.0 AS segment_bal,
       CAST(bal_c AS DOUBLE)
         / CAST(SUM(bal_c) OVER (PARTITION BY nationkey) AS DOUBLE) AS share_of_nation,
       CAST(bal_c AS DOUBLE)
         / CAST(SUM(bal_c) OVER () AS DOUBLE) AS share_of_total
FROM g
"""
