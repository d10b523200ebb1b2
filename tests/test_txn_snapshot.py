"""Transaction bracketing (cdc/txn.py) and the snapshot-source frontend
(sources/snapshot.py): atomic visibility at transaction boundaries and
snapshot-union-stream == sequential-apply equivalence."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from postgres_es_cdc_spark.cdc.apply import apply_changes
from postgres_es_cdc_spark.cdc.txn import (
    TXN_EVENT_SCHEMA, TxnUpsertSink, apply_changes_transactional,
    committed_events)

def _schema():
    # needs an active SparkSession -> resolved lazily inside tests
    return _parse_datatype_string("id long, name string, qty long")


def _ev(offset, op, payload, txn):
    return Row(offset=offset, operationType=op, tableName="t",
               payload=payload, txn_id=txn)


# txn 100: insert id=1, id=2, commit. txn 200: update id=1, delete id=2
# (commit arrives only in the second micro-batch). autocommit: insert id=3.
TXN_A = [
    _ev(1, "BEGIN", None, 100),
    _ev(2, "INSERT", '{"id":1,"name":"a","qty":1}', 100),
    _ev(3, "INSERT", '{"id":2,"name":"b","qty":2}', 100),
    _ev(4, "COMMIT", None, 100),
]
AUTO = [_ev(5, "INSERT", '{"id":3,"name":"c","qty":3}', None)]
TXN_B_DATA = [
    _ev(6, "BEGIN", None, 200),
    _ev(7, "UPDATE", '{"id":1,"qty":9}', 200),
    _ev(8, "DELETE", '{"id":2}', 200),
]
TXN_B_COMMIT = [_ev(9, "COMMIT", None, 200)]


def _rows(df):
    return sorted((r["id"], r["name"], r["qty"]) for r in df.collect())


def test_committed_events_excludes_open_txn(spark):
    ev = spark.createDataFrame(TXN_A + AUTO + TXN_B_DATA, TXN_EVENT_SCHEMA)
    got = committed_events(ev)
    # txn A's two inserts + the autocommit insert; txn B's events held.
    assert sorted(r.offset for r in got.collect()) == [2, 3, 5]


def test_transactional_fold_stops_at_boundary(spark):
    ev = spark.createDataFrame(TXN_A + AUTO + TXN_B_DATA, TXN_EVENT_SCHEMA)
    state = apply_changes_transactional(ev, _schema())
    assert _rows(state) == [(1, "a", 1), (2, "b", 2), (3, "c", 3)]
    # With the commit delivered, txn B becomes visible atomically.
    ev2 = spark.createDataFrame(TXN_A + AUTO + TXN_B_DATA + TXN_B_COMMIT,
                                TXN_EVENT_SCHEMA)
    state2 = apply_changes_transactional(ev2, _schema())
    assert _rows(state2) == [(1, "a", 9), (3, "c", 3)]


def test_txn_sink_mid_txn_failure_leaves_prior_boundary(spark, tmp_path):
    """Micro-batch 1 ends mid-transaction (txn B's data but no COMMIT):
    the materialized sink must sit exactly at the end of txn A — txn B
    invisible as a whole, not half-applied. Batch 2 delivers the commit
    and txn B lands atomically."""
    sink = TxnUpsertSink(str(tmp_path / "state"), {"t": _schema()})
    b1 = spark.createDataFrame(TXN_A + AUTO + TXN_B_DATA, TXN_EVENT_SCHEMA)
    sink.apply_batch(b1, 0)
    state = spark.read.parquet(sink.table_path("t")).drop("_cdc_version")
    # A crash here (between micro-batches) reads exactly this state.
    assert _rows(state) == [(1, "a", 1), (2, "b", 2), (3, "c", 3)]

    b2 = spark.createDataFrame(TXN_B_COMMIT, TXN_EVENT_SCHEMA)
    sink.apply_batch(b2, 1)
    state2 = spark.read.parquet(sink.table_path("t")).drop("_cdc_version")
    assert _rows(state2) == [(1, "a", 9), (3, "c", 3)]


def test_snapshot_then_stream_equals_sequential_apply(spark, tmp_path):
    """The one-pass snapshot ∪ stream fold equals applying the snapshot
    as INSERTs then each change event in offset order."""
    from postgres_es_cdc_spark.cdc.envelope import EVENT_SCHEMA
    from postgres_es_cdc_spark.sources.snapshot import (
        SnapshotSource, snapshot_as_events, snapshot_then_stream)

    snap_df = spark.createDataFrame(
        [Row(id=1, name="a", qty=1), Row(id=2, name="b", qty=2),
         Row(id=4, name=None, qty=4)], _schema())
    snap_path = str(tmp_path / "snap.parquet")
    snap_df.write.parquet(snap_path)

    changes = spark.createDataFrame([
        Row(offset=1, operationType="UPDATE", tableName="t",
            payload='{"id":1,"qty":9}'),
        Row(offset=2, operationType="DELETE", tableName="t",
            payload='{"id":2}'),
        Row(offset=3, operationType="INSERT", tableName="t",
            payload='{"id":5,"name":"e","qty":5}'),
    ], EVENT_SCHEMA)

    source = SnapshotSource(fmt="parquet", options={"path": snap_path})
    got = snapshot_then_stream(spark, source, changes, _schema(),
                               table_name="t")
    want = apply_changes(
        snapshot_as_events(snap_df, "t").unionByName(changes), _schema())
    assert _rows(got) == _rows(want)
    assert _rows(got) == [(1, "a", 9), (4, None, 4), (5, "e", 5)]
