"""Incremental-offset polling source: only-new-rows reads, checkpoint
advance, crash-replay idempotency, and filter pushdown to the scan."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql.types import _parse_datatype_string

from postgres_es_cdc_spark.cdc.envelope import EVENT_SCHEMA
from postgres_es_cdc_spark.sources.incremental import (
    IncrementalSource, OffsetCheckpoint, poll_once)
from postgres_es_cdc_spark.sources.snapshot import SnapshotSource
from postgres_es_cdc_spark.streaming.pipeline import UpsertSink


def _changelog(spark, rows):
    return spark.createDataFrame([
        Row(offset=o, operationType=op, tableName="t", payload=p)
        for o, op, p in rows], EVENT_SCHEMA)


def _state_rows(spark, sink):
    df = spark.read.parquet(sink.table_path("t")).drop("_cdc_version")
    return sorted((r["id"], r["qty"]) for r in df.collect())


def test_poll_reads_only_new_and_advances(spark, tmp_path):
    log_path = str(tmp_path / "changelog")
    schema = _parse_datatype_string("id long, qty long")
    sink = UpsertSink(str(tmp_path / "state"), {"t": schema})
    ckpt = OffsetCheckpoint(str(tmp_path / "offset.json"))
    src = IncrementalSource(
        SnapshotSource(fmt="parquet", options={"path": log_path}))

    _changelog(spark, [
        (1, "INSERT", '{"id":1,"qty":1}'),
        (2, "INSERT", '{"id":2,"qty":2}'),
    ]).write.mode("append").parquet(log_path)
    assert poll_once(spark, src, sink, ckpt) == 2
    assert ckpt.read() == 2
    assert _state_rows(spark, sink) == [(1, 1), (2, 2)]

    # New segment lands; second poll applies ONLY the delta.
    _changelog(spark, [
        (3, "UPDATE", '{"id":1,"qty":9}'),
        (4, "DELETE", '{"id":2}'),
    ]).write.mode("append").parquet(log_path)
    assert poll_once(spark, src, sink, ckpt) == 2
    assert ckpt.read() == 4
    assert _state_rows(spark, sink) == [(1, 9)]

    # Caught up: empty poll, checkpoint unchanged.
    assert poll_once(spark, src, sink, ckpt) == 0
    assert ckpt.read() == 4


def test_crash_before_commit_replays_idempotently(spark, tmp_path):
    """Sink merged but checkpoint not committed (crash window): the next
    poll replays the same rows and state converges, not duplicates."""
    log_path = str(tmp_path / "changelog")
    schema = _parse_datatype_string("id long, qty long")
    sink = UpsertSink(str(tmp_path / "state"), {"t": schema})
    ckpt = OffsetCheckpoint(str(tmp_path / "offset.json"))
    src = IncrementalSource(
        SnapshotSource(fmt="parquet", options={"path": log_path}))

    _changelog(spark, [(1, "INSERT", '{"id":1,"qty":1}')]) \
        .write.mode("append").parquet(log_path)
    # Simulate the crash: apply the batch but never commit the offset.
    sink.apply_batch(src.read_since(spark, ckpt.read()), 0)
    assert ckpt.read() == -1
    # Recovery poll replays offset 1 into the idempotent fold.
    assert poll_once(spark, src, sink, ckpt) == 1
    assert _state_rows(spark, sink) == [(1, 1)]
    assert ckpt.read() == 1


def test_offset_filter_reaches_parquet_scan(spark, tmp_path):
    log_path = str(tmp_path / "changelog")
    _changelog(spark, [(i, "INSERT", "{}") for i in range(10)]) \
        .write.parquet(log_path)
    src = IncrementalSource(
        SnapshotSource(fmt="parquet", options={"path": log_path}))
    plan = (src.read_since(spark, 5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "GreaterThan(offset,5)" in plan
