"""Streaming exact dedup with a PERSISTED key store — the unbounded-
retention companion of pipeline.dedup_events_within_watermark (which
bounds state by event time) and the streaming twin of
llm/dedup.docs_incremental_lsh_pairs (which probes a persisted
signature store per batch).

REF anchor: the reference redelivers on every restart and relies on
last-write-wins upserts to hide it (es.go:95-98, utils.go:49). This
module is the general fix when the sink is APPEND-shaped (a training-
data corpus, an audit log) and cannot absorb duplicates: each
micro-batch is reduced to one candidate row per key, anti-joined
against the durable seen-key store, survivors appended and their keys
merged into the store.

Scale shape: per batch cost is O(batch + matched store partitions) —
the anti-join is a join on the key column only (the store holds keys,
not payloads), broadcastable while the new-key set is small and a
plain shuffle join at corpus scale; the store is the frame you would
keep bucketed by key on a cluster so the probe co-locates. History is
never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


class KeyedDedupSink:
    """foreachBatch sink: first-arrival-wins keyed dedup with a durable
    parquet seen-key store and an append-only survivor output.

    In-batch ties resolve by ``order_col`` (min wins) so replays are
    deterministic; re-applying a batch after a crash between output
    append and store merge can duplicate an output file, which the
    downstream keyed reader tolerates because survivors are unique per
    key in the store — the same at-least-once + idempotent-merge
    discipline as streaming/pipeline.UpsertSink."""

    def __init__(self, out_path: str, seen_path: str, keys: list[str],
                 order_col: str):
        self.out_path = out_path
        self.seen_path = seen_path
        self.keys = keys
        self.order_col = order_col

    def _batch_first(self, batch: DataFrame) -> DataFrame:
        firsts = batch.groupBy(*self.keys).agg(
            F.min(self.order_col).alias(self.order_col))
        return firsts.join(batch, [*self.keys, self.order_col])

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cand = self._batch_first(batch)
        if os.path.exists(self.seen_path):
            seen = spark.read.parquet(self.seen_path)
            cand = cand.join(seen, self.keys, "left_anti")
        cand = cand.localCheckpoint()  # one computation for both writes
        cand.write.mode("append").parquet(self.out_path)
        new_keys = cand.select(*self.keys)
        if os.path.exists(self.seen_path):
            new_keys = (spark.read.parquet(self.seen_path)
                             .unionByName(new_keys))
        tmp = self.seen_path + ".tmp"
        new_keys.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(
            self.seen_path)

    def writer(self):
        return self.apply_batch


def streaming_dedup_first_event(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """KeyedDedupSink's per-micro-batch algebra exposed as a driver-
    checkable query (the exposure pattern of ivm_orders_priority_rollup):
    fold events through three batches (batch i = event_id % 3 == i),
    keeping each user's FIRST event under first-arrival-wins — in-batch
    winner is the min event_id, cross-batch the earliest batch wins via
    the seen-store anti-join; no history re-scan. The oracle is the
    batch-mode statement of the same semantics: per user, the event
    minimizing (batch_idx, event_id) — so batch boundaries provably
    re-derive the one-shot answer."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type")
    out: DataFrame | None = None
    seen: DataFrame | None = None
    for i in range(3):
        batch = ev.filter(F.col("event_id") % 3 == i)
        firsts = batch.groupBy("user_id").agg(
            F.min("event_id").alias("first_event_id"))
        if seen is not None:
            firsts = firsts.join(seen, "user_id", "left_anti")
        out = firsts if out is None else out.unionByName(firsts)
        seen = out.select("user_id")
    return (out.join(ev.select(F.col("event_id").alias("first_event_id"),
                               "event_type"), "first_event_id")
               .select("user_id", "first_event_id",
                       F.col("event_type").alias("first_event_type")))


STREAMING_DEDUP_FIRST_SQL = """
WITH w AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY event_id % 3 ASC, event_id ASC) AS rn
  FROM events
)
SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
FROM w WHERE rn = 1
"""
