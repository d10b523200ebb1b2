"""Relational operator battery: scans, filters, projections, joins, aggs.

The reference implements none of these (SURVEY.md §2 — its only
"predicates" are the op-type switch utils.go:103-113 and the ES id match
es.go:50-54); this module is the [EXT] relational surface, built entirely
on Catalyst-native DataFrame operations so pushdown/pruning/broadcast/AQE
apply. Each query function has a matching DuckDB oracle SQL string.

Scale notes per query are in docstrings; the general rules:
  * dimension tables (region/nation/supplier/customer at these ratios)
    are broadcast explicitly — no shuffle of the fact table for them;
  * aggregations are partial-agg friendly (plain groupBy on low-cardinality
    keys => map-side combine);
  * top-k is window row_number/ORDER BY LIMIT — Spark's TakeOrdered
    physical operator avoids a total sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.operators.common import dsum, qsum, qsum_sql

_CUTOFF = "1998-01-01 00:00:00"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: scan-heavy groupBy with decimal-exact sums.

    At 100 TB this is a full lineitem scan with map-side partial agg into
    4 groups — shuffle is a few KB. Filter pushes down to parquet.
    """
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        qsum(disc_price, 4).alias("sum_disc_price"),
        qsum(charge, 6).alias("sum_charge"),
        (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
        (dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
        (dsum(F.col("l_discount"), 18, 4) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS sum_disc_price,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS HUGEINT)) AS DOUBLE)/1000000.0 AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: selective 3-way join + agg + deterministic top-10.

    customer is filtered then joined to orders (broadcast at test scale;
    at 100 TB AQE picks SMJ with both sides pre-filtered), lineitem joins
    on the shuffled o_orderkey. orderBy+limit compiles to TakeOrdered.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp_ntz"))
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_CUTOFF).cast("timestamp_ntz"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
         .agg(qsum(revenue, 4).alias("revenue"))
         .select(F.col("l_orderkey").alias("orderkey"),
                 F.col("revenue"),
                 F.col("o_orderdate").alias("orderdate"),
                 F.col("o_orderpriority").alias("orderpriority"))
         .orderBy(F.desc("revenue"), "orderkey")
         .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey AS orderkey,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue,
       o_orderdate AS orderdate,
       o_orderpriority AS orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: 6-way snowflake join, dims broadcast.

    nation/region/supplier/customer are broadcast; the only shuffled
    exchange is lineitem->orders on orderkey, then a tiny agg by name.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
         .join(F.broadcast(c),
               (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
         .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .groupBy(F.col("r_name").alias("region_name"),
                  F.col("n_name").alias("nation_name"))
         .agg(qsum(revenue, 4).alias("revenue"),
              F.count("*").alias("n_items"))
    )


Q5_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure pushed-down filter + single global agg."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 24))
    return l.agg(
        qsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count("*").alias("n_items"))


Q6_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice*l_discount*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: returned-item revenue per customer, top 20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy(F.col("c_custkey").alias("custkey"),
                  F.col("c_name").alias("cust_name"),
                  F.col("n_name").alias("nation_name"),
                  F.col("c_acctbal").alias("acctbal"))
         .agg(qsum(revenue, 4).alias("revenue"))
         .orderBy(F.desc("revenue"), "custkey")
         .limit(20)
    )


Q10_SQL = """
SELECT c_custkey AS custkey, c_name AS cust_name, n_name AS nation_name,
       c_acctbal AS acctbal,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, custkey
LIMIT 20
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (NULL-extended side)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
         .groupBy(F.col("c_custkey").alias("custkey"))
         .agg(F.count("o_orderkey").alias("order_cnt"),
              F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"))
    )


JOIN_LEFT_SQL = """
SELECT c_custkey AS custkey,
       COUNT(o_orderkey) AS order_cnt,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: customers with at least one open ('O') order.

    The moral equivalent of the reference's id-existence match
    (es.go:50-54) expressed as a distributed semi-join.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
         .select(F.col("c_custkey").alias("custkey"),
                 F.col("c_mktsegment").alias("mktsegment"),
                 F.col("c_acctbal").alias("acctbal"))
    )


JOIN_SEMI_SQL = """
SELECT c_custkey AS custkey, c_mktsegment AS mktsegment, c_acctbal AS acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: customers with no orders at all — the DELETE-apply
    primitive of the CDC fold (es.go:112-144 as an anti-join)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
         .select(F.col("c_custkey").alias("custkey"),
                 F.col("c_name").alias("cust_name"))
    )


JOIN_ANTI_SQL = """
SELECT c_custkey AS custkey, c_name AS cust_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """full_outer over two pre-aggregated sides: per-nation rich-customer
    vs rich-supplier counts; each side misses nations, so both null
    directions are exercised. Aggregating BEFORE joining keeps the outer
    join's shuffle to 25 rows a side regardless of fact-table size."""
    c = (table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") > 9000)
         .groupBy("c_nationkey").agg(F.count("*").alias("n_rich_customers")))
    s = (table(spark, sf_dir, "supplier")
         .filter(F.col("s_acctbal") > 9000)
         .groupBy("s_nationkey").agg(F.count("*").alias("n_rich_suppliers")))
    return (c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer")
             .select(F.coalesce(c["c_nationkey"], s["s_nationkey"])
                      .alias("nationkey"),
                     "n_rich_customers", "n_rich_suppliers"))


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c.nk, s.nk) AS nationkey, n_rich_customers, n_rich_suppliers
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_rich_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, COUNT(*) AS n_rich_suppliers
      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
ON c.nk = s.nk
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two tiny sides (region x distinct
    order priorities) — the only safe cross-join shape at scale: both
    inputs are broadcast-sized; anything larger belongs behind LSH or
    banding (see llm.dedup), never a raw cross join."""
    r = table(spark, sf_dir, "region").select("r_name")
    p = (table(spark, sf_dir, "orders")
         .select(F.col("o_orderpriority").alias("priority")).distinct())
    return r.crossJoin(p).select("r_name", "priority")


JOIN_CROSS_SQL = """
SELECT r_name, priority
FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority AS priority
                        FROM orders)
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count-distinct (expand-based in Spark) + plain count + exact sum."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("orderstatus")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderstatus AS orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderstatus
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) incl. grand total row."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping combos."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, made oracle-checkable.

    The raw sketch value is engine-specific (DuckDB's HLL differs), so
    the query outputs the exact distinct count per order status plus a
    deterministic accuracy assertion: the HLL++ estimate (rsd=0.02)
    landing within 5% of the exact count. For fixed data the sketch is
    deterministic, so the boolean is a constant TRUE the DuckDB twin
    emits literally — the driver's hash check then covers both the
    exact companion values and the sketch's error bound. The sketch is
    the 100 TB path (no distinct shuffle); the exact column is the
    small-SF witness."""
    o = table(spark, sf_dir, "orders")
    approx = F.approx_count_distinct("o_custkey", 0.02)
    exact = F.countDistinct("o_custkey")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
         .agg(exact.alias("exact_customers"),
              (F.abs(approx.cast("double") / exact.cast("double") - 1.0)
               <= 0.05).alias("approx_within_5pct"))
    )


AGG_APPROX_DISTINCT_SQL = """
SELECT o_orderstatus AS status,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS approx_within_5pct
FROM orders GROUP BY o_orderstatus
"""
