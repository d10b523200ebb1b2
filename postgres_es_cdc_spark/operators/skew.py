"""Skew- and locality-management utilities for 100 TB joins.

Three tools, in escalation order:
  1. AQE skew-join splitting — on by default (session.py); handles
     moderately skewed sort-merge joins with zero code.
  2. ``salted_join`` — explicit salting for pathological hot keys: the
     big side scatters each hot key across N salt buckets, the small
     side is replicated N times; the join key becomes (key, salt).
  3. ``write_bucketed`` / co-located reads — pre-shuffle once at write
     time so repeated joins/aggs on the bucket key shuffle nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with hot-key salting.

    The big side assigns each row a salt in [0, n_salts) — derived from
    a per-partition row counter, so rows of one hot key spread across
    salts (and therefore across reducers). The small side is exploded
    once per salt. Result == big.join(small, key, how) for inner/left
    joins, at the cost of replicating the small side n_salts times.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_s = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_s = small.select("*", salts)
    joined = big_s.join(small_s, [key, "_salt"], how)
    return joined.drop("_salt")


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, sort_by: str | None = None) -> None:
    """Persist pre-shuffled by key: subsequent joins/aggregations on
    ``key`` between tables bucketed the same way plan with NO Exchange
    (bucket-local sort-merge). The write-once cost buys every future
    query's shuffle."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def enable_runtime_bloom_filters(spark, creation_side_max: str = "100MB",
                                 application_side_min: str = "0") -> None:
    """Turn on Catalyst's runtime (row-level) bloom-filter join pruning
    with thresholds suited to selective star-schema joins: when one side
    of a shuffle join carries a selective filter, the optimizer inserts
    a bloom_filter_agg over that side's join keys and a might_contain
    probe on the other side's SCAN — rows that cannot join are dropped
    before the shuffle. At 100 TB this is the difference between
    shuffling the full fact table and shuffling only the ~matching
    fraction; the defaults (10 GB application-side scan) rarely fire on
    test data, so this helper makes the thresholds explicit.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_max)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold", application_side_min)
