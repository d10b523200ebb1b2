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
