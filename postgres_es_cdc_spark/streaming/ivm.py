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


class TopKSink:
    """foreachBatch sink maintaining per-group TOP-K by a sort key —
    the order-statistics member of the IVM family next to AggSink's
    sum/count/min/max. Top-k under a total order is an associative,
    commutative, idempotent merge (the k-bounded max-semilattice over
    row SETS — the tie column must identify rows uniquely), so batch
    boundaries and replays provably cannot change the maintained view:
    merge(state, batch) = topk(state ∪ batch).

    Scale shape: each micro-batch contributes at most k rows per group
    (a WindowGroupLimit-bounded partial top-k, map-side prunable), the
    merge re-ranks |groups|·2k rows — per-batch cost O(batch + groups·k),
    independent of history length."""

    def __init__(self, path: str, group_col: str, order_col: str,
                 tie_col: str, k: int):
        self.path = path
        self.group_col = group_col
        self.order_col = order_col
        self.tie_col = tie_col
        self.k = k

    def _topk(self, df: DataFrame) -> DataFrame:
        # The semilattice is over SETS keyed by (group, tie): a replayed
        # duplicate row must collapse with its original BEFORE ranking,
        # or it occupies a top-k slot and evicts a legitimate row (found
        # by the replay test). dropDuplicates keeps one arbitrary row
        # per key — rows sharing (group, tie) are identical by the tie
        # column's row-identity contract.
        w = WindowSpec_topk(self.group_col, self.order_col, self.tie_col)
        return (df.dropDuplicates([self.group_col, self.tie_col])
                  .withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= self.k).drop("_rn"))

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        parts = self._topk(batch)
        if os.path.exists(self.path):
            parts = spark.read.parquet(self.path).unionByName(parts)
        merged = self._topk(parts)
        tmp = self.path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)

    def writer(self):
        return self.apply_batch


def WindowSpec_topk(group_col: str, order_col: str, tie_col: str):
    from pyspark.sql import Window
    return (Window.partitionBy(group_col)
                  .orderBy(F.desc(order_col), F.asc(tie_col)))


def ivm_topk_orders_by_segment(spark, sf_dir: str, k: int = 3) -> DataFrame:
    """TopKSink's merge algebra exposed as a driver-checkable query:
    maintain the top-k orders by value per market segment through three
    incremental batches (batch i = o_orderkey % 3 == i) and return the
    final view with ranks. The oracle is the one-shot per-segment
    top-k — equal by the semilattice argument above, which this row
    proves on real data every round."""
    from postgres_es_cdc_spark.catalog import table

    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment"))
    base = (table(spark, sf_dir, "orders")
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .select("segment", "o_orderkey",
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                     .alias("cents")))
    sink = TopKSink(path="", group_col="segment", order_col="cents",
                    tie_col="o_orderkey", k=k)
    view: DataFrame | None = None
    for i in range(3):
        part = sink._topk(base.filter(F.col("o_orderkey") % 3 == i))
        view = part if view is None else sink._topk(view.unionByName(part))
    w = WindowSpec_topk("segment", "cents", "o_orderkey")
    return (view.withColumn("rank", F.row_number().over(w))
                .select("segment", "rank",
                        F.col("o_orderkey").alias("orderkey"), "cents"))


IVM_TOPK_SEGMENT_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT segment, rank, o_orderkey AS orderkey, cents
FROM (SELECT segment, o_orderkey, cents,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY cents DESC, o_orderkey ASC)
               AS rank
      FROM base)
WHERE rank <= 3
"""
