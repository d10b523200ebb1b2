"""Statistical aggregate surface: moments (variance/stddev/correlation/
covariance), exact interpolated percentiles, approximate percentile
sketch, and boolean aggregates ([EXT] — SURVEY.md §2 Table B
"Aggregations" row; the reference has no aggregation at all).

Cross-engine discipline for moments: engine-native ``var_samp``/``corr``
accumulate doubles in engine- and order-specific ways, so their low bits
differ between Spark and DuckDB. Instead each moment is assembled from
EXACT integer sufficient statistics (n, Σx, Σx², Σxy over integer-valued
columns — order-independent bigint arithmetic, identical in both
engines) followed by a fixed sequence of IEEE double operations
(one product, one subtraction, one division, optionally one sqrt), each
of which is correctly-rounded and therefore bit-identical cross-engine.
This is also the scale-correct plan: the sufficient statistics are a
single partial-aggregable pass (map-side combine), so the shuffle
carries one row of counters per group, never data rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag moments of l_quantity (+ corr/covar against
    l_linenumber) from exact integer sufficient statistics.

    var_samp = (n·Σx² − (Σx)²) / (n·(n−1))
    corr     = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))

    Numerators/denominators stay exact bigints (|quantity| ≤ 50,
    |linenumber| ≤ 7 ⇒ n·Σxy < 2^53 far beyond sf0.1), so the double
    casts are exact and the final IEEE ops deterministic.
    """
    l = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.col("l_linenumber").cast("bigint")
    g = (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"),
              F.sum(x * x).alias("sxx"),
              F.sum(y).alias("sy"),
              F.sum(y * y).alias("syy"),
              F.sum(x * y).alias("sxy"),
              F.min(x).alias("min_qty"),
              F.max(x).alias("max_qty"),
              F.bool_and(x > 0).alias("all_positive"),
              F.bool_or(x > 45).alias("any_jumbo"))
    )
    n = F.col("n").cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    dxy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return g.select(
        "returnflag", "n",
        (F.col("sx").cast("double") / n).alias("mean_qty"),
        (dx / (n * (n - F.lit(1.0)))).alias("var_samp_qty"),
        F.sqrt(dx / (n * (n - F.lit(1.0)))).alias("stddev_samp_qty"),
        (dx / (n * n)).alias("var_pop_qty"),
        (dxy / (n * (n - F.lit(1.0)))).alias("covar_samp"),
        (dxy / (F.sqrt(dx) * F.sqrt(dy))).alias("corr_qty_line"),
        "min_qty", "max_qty", "all_positive", "any_jumbo",
    )


AGG_STATS_MOMENTS_SQL = """
WITH g AS (
  SELECT l_returnflag AS returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS sxx,
         SUM(CAST(l_linenumber AS BIGINT)) AS sy,
         SUM(CAST(l_linenumber AS BIGINT)*CAST(l_linenumber AS BIGINT)) AS syy,
         SUM(CAST(l_quantity AS BIGINT)*CAST(l_linenumber AS BIGINT)) AS sxy,
         MIN(CAST(l_quantity AS BIGINT)) AS min_qty,
         MAX(CAST(l_quantity AS BIGINT)) AS max_qty,
         BOOL_AND(l_quantity > 0) AS all_positive,
         BOOL_OR(l_quantity > 45) AS any_jumbo
  FROM lineitem GROUP BY l_returnflag
)
SELECT returnflag, n,
       CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS mean_qty,
       CAST(n*sxx - sx*sx AS DOUBLE)
         / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)) AS var_samp_qty,
       sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
         / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0))) AS stddev_samp_qty,
       CAST(n*sxx - sx*sx AS DOUBLE)
         / (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS var_pop_qty,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)) AS covar_samp,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qty_line,
       min_qty, max_qty, all_positive, any_jumbo
FROM g
"""


def percentile_cont_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p50/p75 of l_quantity per
    returnflag) via the engines' native continuous-percentile aggregates
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``).

    Bit-exact cross-engine because the inputs are integers and the
    percentile fractions are quarters: the rank position p·(n−1) and the
    linear interpolation between two small integers are both exact in
    double regardless of whether the engine computes a+(b−a)·f or
    (1−f)·a + f·b. (For general doubles this would NOT hold — see
    percentile_disc_prices for the engine-neutral discrete form.)
    """
    l = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
         .agg(F.percentile(q, F.lit(0.25)).alias("p25_qty"),
              F.percentile(q, F.lit(0.5)).alias("median_qty"),
              F.percentile(q, F.lit(0.75)).alias("p75_qty"),
              F.count(F.lit(1)).alias("n_items"))
    )


PERCENTILE_CONT_SQL = """
SELECT l_returnflag AS returnflag,
       quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25_qty,
       quantile_cont(CAST(l_quantity AS BIGINT), 0.5)  AS median_qty,
       quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75_qty,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile sketch (Greenwald-Khanna in Spark) of
    o_totalprice per priority — the scale path for quantiles over 100 TB
    where exact sort-based percentiles are too expensive.

    Sketch contents are engine-specific, so the output carries exact
    companions plus deterministic rank-error assertions: GK with
    accuracy=1000 guarantees rank error <= n/1000, so the estimate must
    lie within the exact [p-0.02, p+0.02] order-statistic bracket (20x
    slack). For fixed data the sketch is deterministic, so the booleans
    are constant TRUE and the DuckDB twin emits them literally — the
    driver's hash check covers the exact values and the error bound.
    """
    o = table(spark, sf_dir, "orders")

    def _within(p: float) -> Column:
        est = F.percentile_approx("o_totalprice", F.lit(p), F.lit(1000))
        lo = F.expr(f"percentile_disc({p - 0.02:.2f}) WITHIN GROUP (ORDER BY o_totalprice)")
        hi = F.expr(f"percentile_disc({p + 0.02:.2f}) WITHIN GROUP (ORDER BY o_totalprice)")
        return (est >= lo) & (est <= hi)

    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
         .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
               .alias("exact_median_price"),
              _within(0.5).alias("median_within_2pp"),
              _within(0.95).alias("p95_within_2pp"),
              F.count(F.lit(1)).alias("n_orders"))
    )


AGG_APPROX_PERCENTILE_SQL = """
SELECT o_orderpriority AS priority,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS exact_median_price,
       TRUE AS median_within_2pp,
       TRUE AS p95_within_2pp,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def stats_linreg_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / regr_intercept /
    regr_r2 / regr_count) of y = extended price (exact cents) on
    x = quantity, per returnflag — assembled from exact integer
    sufficient statistics, NOT engine-native regr_* (whose double
    accumulation order differs per engine; see module docstring).

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n
    r²        = (n·Σxy − Σx·Σy)² / ((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²))

    Sums carry cents (≤1e7) × quantity (≤50) over ~6e5 rows ⇒ n·Σxy can
    exceed int64 — numerators are formed in DECIMAL(38,0)/HUGEINT (exact
    in both engines) and cast to double only for the final correctly-
    rounded divisions; r²'s squares are taken in double to avoid 38-digit
    overflow (same fixed op order both sides). One partial-aggregable
    pass: the shuffle carries six counters per group."""
    l = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")  # cents
    g = (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"),
              F.sum(y).alias("sy"),
              F.sum(x * x).alias("sxx"),
              F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
              F.sum(x * y).alias("sxy"))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (d38(F.col("n")) * F.col("sxy") - d38(F.col("sx")) * F.col("sy"))
    den_x = (d38(F.col("n")) * F.col("sxx") - d38(F.col("sx")) * F.col("sx"))
    den_y = (d38(F.col("n")) * F.col("syy") - d38(F.col("sy")) * F.col("sy"))
    slope = num.cast("double") / den_x.cast("double")
    intercept = ((F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                 / F.col("n").cast("double"))
    r2 = ((num.cast("double") * num.cast("double"))
          / (den_x.cast("double") * den_y.cast("double")))
    return g.select(
        "returnflag",
        F.col("n").alias("regr_count"),
        (slope * 0.01).alias("slope_dollars_per_unit"),
        (intercept * 0.01).alias("intercept_dollars"),
        r2.alias("r2"),
    )


STATS_LINREG_SQL = """
WITH s AS (
  SELECT l_returnflag AS returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS syy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT returnflag, n AS regr_count,
       (CAST(CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
        / CAST(CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)) * 0.01
         AS slope_dollars_per_unit,
       ((CAST(sy AS DOUBLE)
         - (CAST(CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
            / CAST(CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE))
           * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE)) * 0.01 AS intercept_dollars,
       (CAST(CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
        * CAST(CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE))
       / (CAST(CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)
          * CAST(CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE)) AS r2
FROM s
"""
