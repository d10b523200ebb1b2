"""The remaining TPC-H query shapes (q8/q11/q12/q17/q18/q20/q21),
adapted to the driver schema ([EXT] relational breadth — the reference
has no relational operators at all, SURVEY.md §2).

The driver testdata has no ``partsupp`` table, so q11/q20/q21 are
reshaped onto ``lineitem`` while keeping each query's defining operator
shape: q11's nested-aggregate scalar threshold, q20's
aggregate-filter-then-semi-join, q21's EXISTS/NOT-EXISTS self-correlation
(reformulated as a single grouped aggregation — see q21 docstring).

Scale notes are per-query; every double aggregate uses the quantized
exact-sum discipline from operators/common.py so the DuckDB oracle
matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.operators.common import dsum, qsum, qsum_sql


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: per order-year, the share of ASIA-market revenue
    (customers in ASIA) delivered by suppliers from NATION_3 —
    conditional-sum ratio over a two-armed dimension join.

    Scale: lineitem⋈orders is the one big (co-keyed) shuffle; customer,
    supplier, nation, region all broadcast; the ratio is two partial
    aggregates in one pass."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
         .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
         .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
         .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
         .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
         .agg((qsum(nation_rev, 4) / qsum(rev, 4)).alias("mkt_share"),
              qsum(rev, 4).alias("asia_revenue"))
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       ({qsum_sql("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END", 4)})
       / ({qsum_sql("l_extendedprice*(1-l_discount)", 4)}) AS mkt_share,
       {qsum_sql("l_extendedprice*(1-l_discount)", 4)} AS asia_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: parts whose total line value exceeds a fraction of
    the corpus-wide total (nested aggregate -> scalar threshold).
    partsupp is absent from the testdata; value = Σ extendedprice·qty.

    Scale: one shuffle keyed by partkey; the grand total re-aggregates
    the (part-sized, small) intermediate and broadcasts one row."""
    l = table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = l.groupBy(F.col("l_partkey").alias("partkey")).agg(
        qsum(value, 2).alias("part_value"))
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(28,2)")).cast("double").alias("t"))
    return (
        per_part.crossJoin(F.broadcast(total))
                .filter(F.col("part_value") > 0.0006 * F.col("t"))
                .select("partkey", "part_value")
    )


Q11_SQL = f"""
WITH pv AS (
  SELECT l_partkey AS partkey,
         {qsum_sql("l_extendedprice*l_quantity", 2)} AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT partkey, part_value FROM pv
WHERE part_value > 0.0006 * (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,2))) AS DOUBLE) FROM pv)
"""


def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: for each shipping-delay bucket (days between order
    and ship date), how many line items belong to critical-priority vs
    other orders — the conditional two-way count over a fact join.
    The testdata has no l_shipmode; delay buckets stand in for it.

    Scale: lineitem⋈orders co-keyed shuffle, then a 3-group aggregate;
    date math is integer day arithmetic (engine-exact)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (F.when(delay <= 30, "fast")
               .when(delay <= 90, "medium")
               .otherwise("slow"))
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
         .groupBy(bucket.alias("delay_bucket"))
         .agg(F.count(F.when(critical, 1)).alias("critical_cnt"),
              F.count(F.when(~critical, 1)).alias("other_cnt"))
    )


Q12_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
            WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 'medium'
            ELSE 'slow' END AS delay_bucket,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS critical_cnt,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS other_cnt
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: revenue from Brand#5 line items whose quantity is
    below half the part's average quantity (correlated per-part average
    -> aggregate join back onto the fact table).

    Scale: the per-part average and the fact rows shuffle on the same
    key (partkey), so the join is co-partitioned; the brand filter
    broadcasts part and prunes before the agg join."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    lb = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    avg_q = lb.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
         / F.count("l_quantity")).alias("avg_qty"))
    return (
        lb.join(avg_q, lb.l_partkey == avg_q.ak)
          .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
          .agg(qsum(F.col("l_extendedprice"), 2).alias("small_qty_revenue"),
               F.count("*").alias("n_items"))
    )


Q17_SQL = f"""
WITH lb AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#5'
), aq AS (
  SELECT l_partkey AS ak,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty
  FROM lb GROUP BY l_partkey
)
SELECT {qsum_sql("l_extendedprice", 2)} AS small_qty_revenue,
       COUNT(*) AS n_items
FROM lb JOIN aq ON lb.l_partkey = aq.ak
WHERE l_quantity < 0.5 * avg_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: orders whose total quantity exceeds 250, with their
    customer — aggregate-HAVING on the fact table, then join the
    qualifying (small) order set back to dimensions.

    Scale: one shuffle by orderkey for the HAVING agg; the survivors are
    a tiny fraction, so the orders/customer joins run on a pruned set
    (AQE will pick broadcast for the survivor side)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (l.groupBy(F.col("l_orderkey").alias("bk"))
            .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
            .filter(F.col("sum_qty") > 250))
    return (
        big.join(o, big.bk == o.o_orderkey)
           .join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .select(F.col("c_custkey").alias("custkey"),
                   F.col("c_name").alias("cust_name"),
                   F.col("o_orderkey").alias("orderkey"),
                   F.col("o_totalprice").alias("totalprice"),
                   "sum_qty")
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey AS bk, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty > 250
)
SELECT c_custkey AS custkey, c_name AS cust_name, o_orderkey AS orderkey,
       o_totalprice AS totalprice, sum_qty
FROM big JOIN orders ON bk = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q20_heavy_promo_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped: suppliers who shipped an above-average quantity of
    PROMO parts during 1997, with their nation — nested aggregate
    threshold feeding a semi-join-shaped supplier selection.
    (partsupp's availability threshold is absent; shipped quantity
    stands in.)

    Scale: fact rows prune on broadcast part + date before the supplier
    agg; the threshold is one broadcast scalar; supplier/nation joins
    broadcast."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
         .filter((F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
         .groupBy(F.col("l_suppkey").alias("suppkey"))
         .agg(dsum(F.col("l_quantity")).alias("promo_qty"))
    )
    thr = shipped.agg(
        (F.sum(F.col("promo_qty").cast("decimal(28,2)")).cast("double")
         / F.count("*")).alias("avg_qty"))
    return (
        shipped.crossJoin(F.broadcast(thr))
               .filter(F.col("promo_qty") > F.col("avg_qty"))
               .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
               .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
               .select("suppkey", F.col("s_name").alias("supp_name"),
                       F.col("n_name").alias("nation_name"), "promo_qty")
    )


Q20_SQL = """
WITH shipped AS (
  SELECT l_suppkey AS suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS promo_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT suppkey, s_name AS supp_name, n_name AS nation_name, promo_qty
FROM shipped
JOIN supplier ON suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE promo_qty > (SELECT CAST(SUM(CAST(promo_qty AS DECIMAL(28,2))) AS DOUBLE)/COUNT(*) FROM shipped)
"""


def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: per supplier, the number of multi-supplier orders on
    which THIS supplier was the only one with returned ('R') items —
    TPC-H q21's EXISTS (another supplier's lineitem) AND NOT EXISTS
    (another supplier's failing lineitem) self-correlation.

    Instead of two correlated self-joins (two extra shuffles of the full
    fact table, quadratic on hot orders), both existence tests collapse
    into one grouped aggregation per order: n_suppliers > 1 AND
    n_return_suppliers == 1. One shuffle by orderkey, one by suppkey —
    the co-keyed join of the R-rows with the per-order stats reuses the
    orderkey partitioning.

    Semantics cross-checked by the EXISTS/NOT-EXISTS DuckDB oracle,
    which is written in the literal q21 form."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    stats = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("n_r_supp"))
    r_rows = (l.filter(F.col("l_returnflag") == "R")
               .select("l_orderkey", "l_suppkey").distinct())
    return (
        r_rows.join(stats, r_rows.l_orderkey == stats.ok)
              .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
              .groupBy(F.col("l_suppkey").alias("suppkey"))
              .agg(F.count("*").alias("n_sole_fault_orders"))
              .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
              .select("suppkey", F.col("s_name").alias("supp_name"),
                      "n_sole_fault_orders")
    )


Q21_SQL = """
WITH r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT r.l_suppkey AS suppkey, s_name AS supp_name,
       COUNT(*) AS n_sole_fault_orders
FROM r
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem x
              WHERE x.l_orderkey = r.l_orderkey AND x.l_suppkey != r.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem x
                  WHERE x.l_orderkey = r.l_orderkey AND x.l_suppkey != r.l_suppkey
                    AND x.l_returnflag = 'R')
GROUP BY r.l_suppkey, s_name
"""
