"""Additional TPC-H-shaped queries adapted to the driver schema ([EXT]
relational breadth: correlated aggregates, NOT EXISTS, OR-of-ANDs
pushdown, conditional ratios, scalar subqueries, distinct-agg joins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.operators.common import dsum, qsum, qsum_sql


def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: per nation, the supplier(s) with the minimum account
    balance (correlated min -> broadcast aggregate join)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    min_bal = s.groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(F.broadcast(min_bal), "s_nationkey")
         .filter(F.col("s_acctbal") == F.col("min_bal"))
         .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .select(F.col("n_name").alias("nation_name"),
                 F.col("s_suppkey").alias("suppkey"),
                 F.col("s_name").alias("supp_name"),
                 F.col("s_acctbal").alias("acctbal"))
    )


Q2_SQL = """
WITH mb AS (SELECT s_nationkey, MIN(s_acctbal) AS min_bal
            FROM supplier GROUP BY s_nationkey)
SELECT n_name AS nation_name, s_suppkey AS suppkey,
       s_name AS supp_name, s_acctbal AS acctbal
FROM supplier s
JOIN mb ON s.s_nationkey = mb.s_nationkey AND s.s_acctbal = mb.min_bal
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


def q4_priority_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: order count per priority among 1997 orders that have at
    least one lineitem (EXISTS -> left-semi join)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
         .groupBy(F.col("o_orderpriority").alias("orderpriority"))
         .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority AS orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)
GROUP BY o_orderpriority
"""


def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: share of revenue from promo parts —
    conditional aggregation over a broadcast join."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return joined.agg(
        (100.0 * qsum(promo, 4) / qsum(rev, 4)).alias("promo_pct"),
        F.count("*").alias("n_items"))


Q14_SQL = """
SELECT 100.0 * (CAST(SUM(CAST(round((CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice*(1-l_discount) ELSE 0.0 END)*10000) AS HUGEINT)) AS DOUBLE)/10000.0)
             / (CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0) AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: supplier(s) with maximum total revenue (scalar
    subquery over an aggregate)."""
    l = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    supp_rev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        qsum(rev, 4).alias("total_revenue"))
    max_rev = supp_rev.agg(F.max("total_revenue").alias("m"))
    return (
        supp_rev.join(F.broadcast(max_rev),
                      supp_rev.total_revenue == max_rev.m)
                .select("suppkey", "total_revenue")
    )


Q15_SQL = """
WITH sr AS (
  SELECT l_suppkey AS suppkey,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT suppkey, total_revenue FROM sr
WHERE total_revenue = (SELECT MAX(total_revenue) FROM sr)
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: distinct suppliers per (brand, size-band), excluding
    one brand — count-distinct after a broadcast join."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
         .groupBy(F.col("p_brand").alias("brand"),
                  (F.col("p_size") % 5).cast("long").alias("size_band"))
         .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"),
              F.countDistinct("l_partkey").alias("part_cnt"))
    )


Q16_SQL = """
SELECT p_brand AS brand, CAST(p_size % 5 AS BIGINT) AS size_band,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt,
       COUNT(DISTINCT l_partkey) AS part_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#1'
GROUP BY p_brand, p_size % 5
"""


def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: disjunctive predicate across join columns — exercises
    CNF conversion / partial pushdown of OR-of-ANDs."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 20)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
         .filter(cond)
         .agg(qsum(rev, 4).alias("revenue"),
              F.count("*").alias("n_items"))
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: customers with above-average balance and no OPEN
    orders (scalar avg subquery + NOT EXISTS anti-join), per nation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count("*")).alias("avg_bal"))
    rich = (c.crossJoin(F.broadcast(avg_bal))
             .filter(F.col("c_acctbal") > F.col("avg_bal")))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.count("*").alias("n_customers"),
                 dsum(F.col("c_acctbal")).alias("total_bal"))
    )


Q22_SQL = """
WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, ab
WHERE c_acctbal > ab.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
GROUP BY c_nationkey
"""


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: trade volume between (supplier nation, customer nation)
    pairs per year — two independent dim paths joined to one fact row."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
         .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
         .filter(F.col("supp_nation") != F.col("cust_nation"))
         .groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("long").alias("l_year"))
         .agg(qsum(rev, 4).alias("revenue"), F.count("*").alias("n_items"))
         .filter(F.col("n_items") >= 5)
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
HAVING COUNT(*) >= 5
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: profit by supplier nation and year for one part type
    (revenue minus a cost proxy of 60% of retail price)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .join(F.broadcast(p), l.l_partkey == p.p_partkey)
         .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
         .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .groupBy(F.col("n_name").alias("nation_name"),
                  F.year("o_orderdate").cast("long").alias("o_year"))
         .agg(qsum(profit, 5).alias("profit"),
              F.count("*").alias("n_items"))
    )


Q9_SQL = """
SELECT n_name AS nation_name, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(round((l_extendedprice*(1-l_discount)
                     - 0.6*p_retailprice*l_quantity)*100000) AS HUGEINT)) AS DOUBLE)/100000.0 AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(o_orderdate)
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: histogram of customers by order count (including
    zero-order customers via left join) — the double-grouping shape."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
         .groupBy("c_custkey")
         .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
                .agg(F.count("*").alias("n_customers"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics funnel: per user, earliest view -> first click
    after it -> first purchase after that; count users reaching each
    stage.

    Three chained conditional-min WINDOW passes over one user-keyed
    partitioning (each stage's threshold is the previous stage's
    window result): a single shuffle of the events, and WindowExec
    buffers each user run with spill — bounded executor memory even for
    a bot user with millions of events, where the previous
    collect_list-per-user formulation held one unbounded array."""
    from postgres_es_cdc_spark.operators.common import events_table

    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id")
    ty, ts = F.col("event_type"), F.col("ts_us")
    staged = (
        e.select("user_id", "event_type", "ts_us")
         .withColumn("v", F.min(F.when(ty == "view", ts)).over(w))
         .withColumn("c", F.min(F.when((ty == "click")
                                       & (ts > F.col("v")), ts)).over(w))
         .withColumn("p", F.min(F.when((ty == "purchase")
                                       & (ts > F.col("c")), ts)).over(w))
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("v").alias("v"), F.min("c").alias("c"), F.min("p").alias("p"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked_after_view"),
        F.count("p").alias("n_purchased_after_click"),
    )


EVENTS_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v
  FROM events GROUP BY user_id
), clicks AS (
  SELECT p.user_id, p.v, MIN(epoch_us(e.ts)) AS c
  FROM per_user p LEFT JOIN events e
    ON e.user_id = p.user_id AND e.event_type = 'click' AND epoch_us(e.ts) > p.v
  GROUP BY p.user_id, p.v
), purchases AS (
  SELECT c.user_id, c.v, c.c, MIN(epoch_us(e.ts)) AS p
  FROM clicks c LEFT JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase' AND epoch_us(e.ts) > c.c
  GROUP BY c.user_id, c.v, c.c
)
SELECT COUNT(*) AS n_users,
       COUNT(v) AS n_viewed,
       COUNT(c) AS n_clicked_after_view,
       COUNT(p) AS n_purchased_after_click
FROM purchases
"""
