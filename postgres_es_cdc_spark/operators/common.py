"""Shared helpers for oracle-parity query determinism.

Cross-engine floating-point discipline: double SUM/AVG is
order-dependent, and Spark and DuckDB will aggregate in different
orders — so any aggregate the DuckDB oracle must reproduce bit-for-bit
is computed with exact decimal arithmetic (order-independent) and cast
back to double at the end. Per-row double arithmetic (x*y, x/(y+z),
sqrt) is IEEE-deterministic and needs no such treatment.

Timestamps: ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's
parquet reader rejects; we read it with
``spark.sql.legacy.parquet.nanosAsLong`` and do all event-time math in
exact integer epoch-microseconds (DuckDB side: ``epoch_us(ts)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


def dsum(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM of a double column via decimal, as double.

    DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE).
    """
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double.

    DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)/COUNT(x).
    """
    return (F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")
            / F.count(col))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream table with ``ts_us`` (bigint epoch microseconds).

    DuckDB oracle equivalent for ts_us: ``epoch_us(ts)``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        # Integer division: nanos are ~1.7e18, beyond double's 2^53 exact
        # range, so float division here would corrupt microseconds.
        F.expr("ts div 1000").alias("ts_us"),
        "user_id", "event_type", "value", "props",
    )
