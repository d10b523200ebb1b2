"""Advanced relational surface: pivot, grouping sets, having, decorrelated
subqueries, non-equi (range) joins, exact percentiles, ordered string
aggregation ([EXT] — SURVEY.md §2 Table B rows the base battery doesn't
cover).

Determinism rules as elsewhere: decimal-exact double aggregation,
bigint-normalized counts, engine-neutral percentile definition (explicit
row_number selection, not engine percentile functions whose interpolation
rules differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.operators.common import dsum


def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orders: rows=priority, columns=status, values=count.

    Spark's pivot with explicit values compiles to a single-pass
    conditional aggregation — no shuffle beyond the groupBy."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
         .pivot("o_orderstatus", ["F", "O", "P"])
         .agg(F.count(F.lit(1)))
         .na.fill(0)
         .select("priority",
                 F.col("F").alias("f_cnt"),
                 F.col("O").alias("o_cnt"),
                 F.col("P").alias("p_cnt"))
    )


PIVOT_SQL = """
SELECT o_orderpriority AS priority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
FROM orders GROUP BY o_orderpriority
"""


def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((returnflag),(linestatus),()) — the general form
    rollup/cube specialize. SQL surface (spark.sql), Catalyst Expand."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style HAVING: orders whose total quantity exceeds 300."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .groupBy(F.col("o_custkey").alias("custkey"),
                  F.col("l_orderkey").alias("orderkey"))
         .agg(dsum(F.col("l_quantity")).alias("total_qty"))
         .filter(F.col("total_qty") > 300.0)
    )


HAVING_SQL = """
SELECT o_custkey AS custkey, l_orderkey AS orderkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey, l_orderkey
HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0
"""


def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery semantics (customers richer than their
    nation's average), decorrelated Spark-first into a broadcast join
    against the per-nation aggregate — the plan Catalyst produces for
    the correlated form, written explicitly."""
    c = table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count("*")).alias("nation_avg_bal"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
         .filter(F.col("c_acctbal") > F.col("nation_avg_bal"))
         .select(F.col("c_custkey").alias("custkey"),
                 F.col("c_nationkey").alias("nationkey"),
                 F.col("c_acctbal").alias("acctbal"),
                 F.col("nation_avg_bal"))
    )


SUBQUERY_AVG_SQL = """
WITH na AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS nation_avg_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey AS custkey, c.c_nationkey AS nationkey,
       c_acctbal AS acctbal, nation_avg_bal
FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
WHERE c_acctbal > nation_avg_bal
"""


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: orders matched to price bands derived from
    region (broadcast nested-loop with a range predicate — the theta-join
    shape; at scale you'd bucketize the probe side first)."""
    r = table(spark, sf_dir, "region")
    bands = r.select(
        F.col("r_regionkey").alias("band_id"),
        (F.col("r_regionkey").cast("long") * 40000).alias("lo"),
        ((F.col("r_regionkey").cast("long") + 1) * 40000).alias("hi"))
    o = table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(bands),
               (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
         .groupBy("band_id", "lo", "hi")
         .agg(F.count("*").alias("n_orders"),
              dsum(F.col("o_totalprice")).alias("band_total"))
    )


RANGE_JOIN_SQL = """
WITH bands AS (
  SELECT r_regionkey AS band_id,
         CAST(r_regionkey AS BIGINT)*40000 AS lo,
         (CAST(r_regionkey AS BIGINT)+1)*40000 AS hi
  FROM region
)
SELECT band_id, lo, hi, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_id, lo, hi
"""


def percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90 of totalprice per status) via
    explicit rank selection — engine percentile functions interpolate
    differently, so the definition is spelled out: value at
    ceil(p*n) in (price, orderkey) order."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"))
    pick = lambda p: (F.col("rn") == F.ceil(F.lit(p) * F.col("n")))  # noqa: E731
    return (
        ranked.groupBy(F.col("o_orderstatus").alias("orderstatus"))
              .agg(F.max(F.when(pick(0.5), F.col("o_totalprice"))).alias("p50_price"),
                   F.max(F.when(pick(0.9), F.col("o_totalprice"))).alias("p90_price"),
                   F.max("n").cast("long").alias("n_orders"))
    )


PERCENTILE_SQL = """
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus AS orderstatus,
       MAX(CASE WHEN rn = CEIL(0.5*n) THEN o_totalprice END) AS p50_price,
       MAX(CASE WHEN rn = CEIL(0.9*n) THEN o_totalprice END) AS p90_price,
       CAST(MAX(n) AS BIGINT) AS n_orders
FROM ranked GROUP BY o_orderstatus
"""


def string_agg_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: customer-name roster per nation
    (collect_list -> array_sort -> array_join; deterministic order)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.array_join(F.array_sort(F.collect_list("c_name")), ",")
               .alias("rich_customers"),
              F.count("*").alias("n_rich"))
    )


STRING_AGG_SQL = """
SELECT c_nationkey AS nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS rich_customers,
       COUNT(*) AS n_rich
FROM customer WHERE c_acctbal > 9000
GROUP BY c_nationkey
"""
