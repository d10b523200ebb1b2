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
