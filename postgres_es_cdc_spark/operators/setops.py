"""Set operations: UNION / INTERSECT / EXCEPT (SURVEY.md §2 Table B [EXT]).

The snapshot-then-stream bootstrap pattern (SURVEY.md A5) is a union;
these exercise the distinct variants, which Catalyst plans as aggregates /
left-semi / left-anti joins respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


def _open_order_custkeys(spark, sf_dir):
    return (table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "O")
            .select(F.col("o_custkey").alias("custkey")))


def _rich_custkeys(spark, sf_dir):
    return (table(spark, sf_dir, "customer")
            .filter(F.col("c_acctbal") > 5000)
            .select(F.col("c_custkey").alias("custkey")))


def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union: customers with open orders OR acctbal > 5000."""
    return _open_order_custkeys(spark, sf_dir).union(
        _rich_custkeys(spark, sf_dir)).distinct()


SETOP_UNION_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open orders AND acctbal > 5000."""
    return _open_order_custkeys(spark, sf_dir).intersect(
        _rich_custkeys(spark, sf_dir))


SETOP_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
"""


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiplicity-aware intersection (min of the two
    sides' counts per key) — aggregated to stay hash-comparable."""
    a = _open_order_custkeys(spark, sf_dir)
    b = (table(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 100000)
         .select(F.col("o_custkey").alias("custkey")))
    return (a.intersectAll(b)
             .groupBy("custkey").agg(F.count("*").alias("multiplicity")))


SETOP_INTERSECT_ALL_SQL = """
SELECT custkey, COUNT(*) AS multiplicity FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
) GROUP BY custkey
"""


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiplicity subtraction."""
    a = _open_order_custkeys(spark, sf_dir)
    b = (table(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 100000)
         .select(F.col("o_custkey").alias("custkey")))
    return (a.exceptAll(b)
             .groupBy("custkey").agg(F.count("*").alias("multiplicity")))


SETOP_EXCEPT_ALL_SQL = """
SELECT custkey, COUNT(*) AS multiplicity FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
) GROUP BY custkey
"""


def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-order measures into long (measure, value)
    rows — the inverse of pivot, Catalyst Expand under the hood."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey_d"))
    return (
        o.unpivot("o_orderkey", ["totalprice", "custkey_d"],
                  "measure", "value")
         .groupBy("measure")
         .agg(F.count("*").alias("n"),
              F.min("value").alias("min_value"),
              F.max("value").alias("max_value"))
    )


UNPIVOT_SQL = """
SELECT measure, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
FROM (
  SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey_d' AS measure, CAST(o_custkey AS DOUBLE) AS value FROM orders
)
GROUP BY measure
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open orders but NOT acctbal > 5000."""
    # subtract == EXCEPT DISTINCT (removes a key if it appears on the
    # right at all, unlike exceptAll's multiplicity arithmetic).
    return _open_order_custkeys(spark, sf_dir).subtract(
        _rich_custkeys(spark, sf_dir))


SETOP_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
"""
