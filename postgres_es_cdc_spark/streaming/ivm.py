"""Incremental view maintenance (IVM) for streaming aggregates:
maintain a grouped aggregate table across micro-batches by merging
PARTIAL aggregates, never re-scanning history.

REF anchor: the reference's consumer is an incremental materializer of
latest-state (es.go:47-144); this is the same idea one level up — the
materialized object is an AGGREGATE of the stream, kept current per
micro-batch. [EXT]: the reference has no aggregation at all
(SURVEY.md §2).

Scale shape: each micro-batch is partially aggregated map-side (one
counter row per group per batch), unioned with the prior aggregate
table (one row per group) and re-reduced — cost per batch is
O(batch + |groups|), independent of stream history length. Sum/count/
min/max are all associative+commutative, so batch boundaries cannot
change the result (the batch==stream test pins this).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AggSink:
    """foreachBatch sink maintaining SUM/COUNT/MIN/MAX per group key.

    Values are aggregated as exact integers (caller quantizes doubles
    first if needed) so replay-divergence can't hide in float
    reassociation.
    """

    def __init__(self, path: str, group_col: str, value_col: str):
        self.path = path
        self.group_col = group_col
        self.value_col = value_col

    def _partial(self, df: DataFrame) -> DataFrame:
        g, v = self.group_col, self.value_col
        return df.groupBy(g).agg(
            F.sum(v).alias("sum_v"),
            F.count(v).alias("n_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"))

    @staticmethod
    def _merge(parts: DataFrame, group_col: str) -> DataFrame:
        return parts.groupBy(group_col).agg(
            F.sum("sum_v").alias("sum_v"),
            F.sum("n_v").alias("n_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"))

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        parts = self._partial(batch)
        if os.path.exists(self.path):
            parts = spark.read.parquet(self.path).unionByName(parts)
        merged = self._merge(parts, self.group_col)
        tmp = self.path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)

    def writer(self):
        return self.apply_batch


def ivm_orders_priority_rollup(spark, sf_dir: str) -> DataFrame:
    """Incremental view maintenance exposed as a driver-checkable query:
    fold orders into a per-priority SUM/COUNT/MIN/MAX aggregate through
    three incremental batches using AggSink's partial/merge algebra —
    the exact per-micro-batch code path the streaming sink runs — and
    return the maintained view. The algebra is associative+commutative
    over exact integer cents, so batch boundaries provably cannot change
    the result: the oracle is the one-shot GROUP BY (which is also what
    a from-scratch rebuild would compute).

    Scale shape: each batch contributes one partial-agg row per group
    (map-side combine), the merge re-reduces |groups| rows — per-batch
    cost O(batch + |groups|), independent of history length."""
    from postgres_es_cdc_spark.catalog import table

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
    sink = AggSink(path="", group_col="o_orderpriority", value_col="cents")
    view: DataFrame | None = None
    for i in range(3):
        parts = sink._partial(
            orders.filter(F.col("o_orderkey") % 3 == i).drop("o_orderkey"))
        view = parts if view is None else AggSink._merge(
            view.unionByName(parts), "o_orderpriority")
    return view.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("sum_v").alias("sum_cents"), F.col("n_v").alias("n_orders"),
        F.col("min_v").alias("min_cents"), F.col("max_v").alias("max_cents"))


IVM_ORDERS_ROLLUP_SQL = """
SELECT o_orderpriority AS priority,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       COUNT(*) AS n_orders,
       CAST(MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM orders
GROUP BY o_orderpriority
"""
