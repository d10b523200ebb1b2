"""Partition pruning: the layout only counts if the scan plan prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.sources.partitioned import (
    partition_filters_of, scan_with_month_filter, write_partitioned_by_month)


def test_month_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_month")
    write_partitioned_by_month(table(spark, sf_dir, "orders"), path)

    pruned = scan_with_month_filter(spark, path, "1997-06")
    pf = partition_filters_of(pruned)
    assert "year_month" in pf and "1997-06" in pf  # static pruning in plan

    # pruned read returns exactly that month's rows
    want = table(spark, sf_dir, "orders").filter(
        F.date_format("o_orderdate", "yyyy-MM") == "1997-06").count()
    assert pruned.count() == want and want > 0


def test_dynamic_partition_pruning_plan(spark, sf_dir, tmp_path):
    """Join against a filtered dim triggers DPP: the fact scan's
    partition filter references a dynamicpruning subquery."""
    path = str(tmp_path / "orders_by_month")
    write_partitioned_by_month(table(spark, sf_dir, "orders"), path)
    fact = spark.read.parquet(path)
    months = (table(spark, sf_dir, "orders")
              .select(F.date_format("o_orderdate", "yyyy-MM").alias("year_month"))
              .distinct().filter(F.col("year_month").startswith("1996")))
    joined = fact.join(months, "year_month")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = joined.count()
    want = table(spark, sf_dir, "orders").filter(
        F.date_format("o_orderdate", "yyyy-MM").startswith("1996")).count()
    assert got == want
