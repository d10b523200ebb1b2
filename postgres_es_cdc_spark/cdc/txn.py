"""Transaction bracketing for the CDC fold.

pgoutput brackets every transaction's changes between Begin and Commit
messages; the reference silently DISCARDS both (producer.go:163-164),
so its sink can expose half-applied transactions — a consumer reading
Elasticsearch mid-transaction sees some of a transaction's rows updated
and others not, and a crash between events of one transaction leaves
that torn state permanently. Here transactions are first-class:

  * events may carry a ``txn_id`` column (null = autocommit, applied
    unconditionally — the reference's only mode);
  * ``COMMIT`` marker events declare a transaction durable;
  * ``committed_events`` keeps only data events whose transaction has
    committed — the batch building block;
  * ``TxnUpsertSink`` applies a stream at transaction granularity: data
    events of transactions without a COMMIT yet are parked in a pending
    buffer instead of the sink, so after ANY micro-batch boundary (or a
    crash between batches) the materialized state sits exactly at the
    last committed transaction boundary — never inside a transaction.

Scale shape: the commit set is one short row per transaction; the
filter is a semi/anti join on ``txn_id`` that AQE turns into a
broadcast join whenever the per-batch transaction count is small (the
normal case — transactions per micro-batch << rows per micro-batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from postgres_es_cdc_spark.streaming.pipeline import UpsertSink

OP_BEGIN = "BEGIN"    # producer.go:163 (dropped there, honored here)
OP_COMMIT = "COMMIT"  # producer.go:164
_MARKER_OPS = (OP_BEGIN, OP_COMMIT)

# Envelope extension: EVENT_SCHEMA + a nullable transaction id.
TXN_EVENT_SCHEMA = (
    "offset long, operationType string, tableName string, payload string, "
    "txn_id long"
)


def commit_ids(events: DataFrame, txn_col: str = "txn_id") -> DataFrame:
    """Distinct transaction ids with a COMMIT marker in ``events``."""
    return (events.filter(F.col("operationType") == OP_COMMIT)
                  .select(txn_col).distinct())


def committed_events(events: DataFrame,
                     txn_col: str = "txn_id") -> DataFrame:
    """Data events safe to apply: autocommit (null txn) plus members of
    committed transactions. BEGIN/COMMIT markers themselves are dropped
    (they carry no payload)."""
    data = events.filter(~F.col("operationType").isin(*_MARKER_OPS))
    committed = data.join(commit_ids(events, txn_col),
                          on=txn_col, how="left_semi")
    autocommit = data.filter(F.col(txn_col).isNull())
    return autocommit.unionByName(committed)


def pending_events(events: DataFrame, txn_col: str = "txn_id") -> DataFrame:
    """Data events that must wait: members of transactions with no
    COMMIT yet. (Their COMMIT may arrive in a later micro-batch.)"""
    data = events.filter(~F.col("operationType").isin(*_MARKER_OPS))
    return (data.filter(F.col(txn_col).isNotNull())
                .join(commit_ids(events, txn_col),
                      on=txn_col, how="left_anti"))


def apply_changes_transactional(events: DataFrame,
                                value_schema: StructType,
                                key: str = "id", order_col: str = "offset",
                                txn_col: str = "txn_id") -> DataFrame:
    """Batch fold honoring transaction boundaries: only committed
    transactions (and autocommit events) reach ``apply_changes``; an
    uncommitted tail — e.g. the WAL read stopped mid-transaction — is
    excluded wholesale, so the result always equals the state at a
    transaction boundary."""
    from postgres_es_cdc_spark.cdc.apply import apply_changes

    return apply_changes(committed_events(events, txn_col), value_schema,
                         key=key, order_col=order_col)


class TxnUpsertSink(UpsertSink):
    """UpsertSink that never materializes a partial transaction.

    Per micro-batch: (pending buffer ∪ batch) splits into committed
    events (folded into state via the parent's merge) and still-pending
    ones (written back to the buffer). A transaction spanning
    micro-batches applies atomically in the batch where its COMMIT
    arrives; a crash after any batch leaves the sink at the prior
    transaction boundary — the test pins exactly that."""

    PENDING = "_pending_txn"

    def __init__(self, base_dir: str, schemas: dict[str, StructType],
                 key: str = "id", order_col: str = "offset",
                 txn_col: str = "txn_id"):
        super().__init__(base_dir, schemas, key, order_col)
        self.txn_col = txn_col

    def _pending_path(self) -> str:
        # Manifest-resolved, like the state tables (crash-safe swap).
        return self.table_path(self.PENDING)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        pending_path = self._pending_path()
        events = batch
        if os.path.exists(pending_path):
            events = events.unionByName(spark.read.parquet(pending_path))
        ready = committed_events(events, self.txn_col)
        still_pending = pending_events(events, self.txn_col)
        for name in self.schemas:
            self._merge(spark, name,
                        ready.filter(F.col("tableName") == name), batch_id)
        # Downstream forwarding hook (e.g. the ES bulk executor): runs
        # AFTER the state merges and BEFORE the pending-buffer commit,
        # so a crash in between replays the batch — at-least-once with
        # the keyed idempotent request shapes.
        self._on_committed(ready, batch_id)
        # New versioned buffer + atomic manifest repoint (the write reads
        # the OLD buffer, which stays in place until the commit).
        new_dir = self._next_dir(self.PENDING, batch_id)
        still_pending.write.mode("overwrite").parquet(new_dir)
        self._commit(self.PENDING, new_dir)

    def _on_committed(self, ready: DataFrame, batch_id: int) -> None:
        """Per-batch hook over the committed (safe-to-apply) events —
        default no-op; EsForwardingTxnSink renders and executes the ES
        bulk plan here, closing the reference's WAL→ES contract as one
        glued stream (utils.go:103-113 + es.go:47-144)."""
