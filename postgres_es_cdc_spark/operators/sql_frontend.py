"""SQL frontend parity: ONE ANSI SQL text executed verbatim by BOTH
engines — ``spark.sql`` over the registered table views and DuckDB over
the same parquet. The registry's other queries pair a DataFrame program
with a DuckDB twin; this one proves the engine's SQL surface itself is
portable (the strongest form of the oracle: there is no translation
step to hide a semantics bug in).

Portability constraints the text obeys: ANSI joins/grouping/window
only; exact money math via round-to-integer-cents before SUM (both
engines round doubles identically at integer tie points — see
operators/common.qsum); no engine-specific functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postgres_es_cdc_spark.catalog import register_views

# Executed char-for-char on Spark SQL and DuckDB.
SQL_ANSI_PORTABLE = """
SELECT n_name AS nation,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       RANK() OVER (
         ORDER BY SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) DESC
       ) AS revenue_rank
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1994-01-01'
GROUP BY n_name
"""


def sql_ansi_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the shared SQL text through Spark's SQL frontend. Catalyst
    still plans it like the DataFrame queries (broadcast dims, partial
    agg, one shuffle) — SQL text and DataFrame API are the same logical
    plan language."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_ANSI_PORTABLE)


# Second verbatim-portable text: CTE + multiple window shapes (lag with
# default, moving ROWS frame, partitioned rank) over an aggregate —
# the dashboard-query idiom, run char-for-char by both engines.
SQL_ANSI_WINDOW_PORTABLE = """
WITH monthly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) * 12
         + CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
         o_orderpriority AS priority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) * 12
           + CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT),
           o_orderpriority
)
SELECT ym, priority, n_orders,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       n_orders - LAG(n_orders, 1, CAST(0 AS BIGINT)) OVER (
         PARTITION BY priority ORDER BY ym) AS n_delta,
       CAST(SUM(n_orders) OVER (
         PARTITION BY priority ORDER BY ym
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3mo,
       RANK() OVER (
         PARTITION BY ym ORDER BY n_orders DESC, priority) AS rank_in_month
FROM monthly
"""


def sql_ansi_window_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the windowed dashboard text through Spark's SQL frontend;
    the same string is the DuckDB oracle. Plan shape: one shuffle for
    the monthly rollup, then all three windows evaluate on the tiny
    aggregated frame (two sorts share the priority/ym partitioning)."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_ANSI_WINDOW_PORTABLE)
