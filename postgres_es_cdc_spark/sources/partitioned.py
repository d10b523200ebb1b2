"""Partitioned-layout writers and pruning verification helpers.

At 100 TB the first defense is never reading the data: date/key
partitioned layouts let static filters prune directories and let joins
prune at runtime (dynamic partition pruning, DPP). These helpers write
the layouts and assert the pruning actually happens in the plan —
"partitioned" only counts if the scan says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_month(df: DataFrame, path: str,
                               ts_col: str = "o_orderdate") -> None:
    """Write with a year_month=YYYY-MM directory layout (the standard
    time-partitioned fact-table shape)."""
    (df.withColumn("year_month", F.date_format(F.col(ts_col), "yyyy-MM"))
       .write.mode("overwrite").partitionBy("year_month").parquet(path))


def scan_with_month_filter(spark: SparkSession, path: str,
                           year_month: str) -> DataFrame:
    return spark.read.parquet(path).filter(F.col("year_month") == year_month)


def partition_filters_of(df: DataFrame) -> str:
    """The PartitionFilters line of the scan — empty string if the plan
    would read every partition."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""
