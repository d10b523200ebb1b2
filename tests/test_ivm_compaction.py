"""Tests for the incremental-aggregate sink (streaming/ivm.py) and
small-file compaction (sources/compaction.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from postgres_es_cdc_spark.sources.compaction import (
    compact_parquet_dir, plan_compaction)
from postgres_es_cdc_spark.streaming.ivm import AggSink


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_agg_sink_incremental_equals_batch(spark, tmp_path):
    b1 = [("a", 1), ("a", 5), ("b", 10)]
    b2 = [("a", 2), ("c", 7)]
    b3 = [("b", -3), ("c", 7), ("a", 4)]
    sink = AggSink(str(tmp_path / "agg"), "k", "v")
    for i, b in enumerate((b1, b2, b3)):
        sink.apply_batch(_batch(spark, b), i)

    got = {r.k: (r.sum_v, r.n_v, r.min_v, r.max_v)
           for r in spark.read.parquet(sink.path).collect()}
    want_df = (_batch(spark, b1 + b2 + b3)
               .groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count("v").alias("n"),
                                 F.min("v").alias("mn"),
                                 F.max("v").alias("mx")))
    want = {r.k: (r.s, r.n, r.mn, r.mx) for r in want_df.collect()}
    assert got == want
    assert got == {"a": (12, 4, 1, 5), "b": (7, 2, -3, 10),
                   "c": (14, 2, 7, 7)}


def test_agg_sink_stream_matches_batch(spark, tmp_path):
    """Drive AggSink through a real file stream in several triggers."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(f"k{i % 5}", i) for i in range(100)]
    for part in range(4):  # 4 files -> multiple triggers
        chunk = rows[part * 25:(part + 1) * 25]
        _batch(spark, chunk).coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema("k string, v long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    sink = AggSink(str(tmp_path / "agg"), "k", "v")
    q = (stream.writeStream.foreachBatch(sink.writer())
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r.k: (r.sum_v, r.n_v, r.min_v, r.max_v)
           for r in spark.read.parquet(sink.path).collect()}
    want_df = _batch(spark, rows).groupBy("k").agg(
        F.sum("v").alias("s"), F.count("v").alias("n"),
        F.min("v").alias("mn"), F.max("v").alias("mx"))
    want = {r.k: (r.s, r.n, r.mn, r.mx) for r in want_df.collect()}
    assert got == want


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 7).alias("g"))
    df.repartition(40).write.mode("overwrite").parquet(path)
    before = plan_compaction(path, target_bytes=10**9)
    assert before["n_files"] == 40

    result = compact_parquet_dir(spark, path, target_bytes=10**9)
    assert result["compacted"]
    after = plan_compaction(path, target_bytes=10**9)
    assert after["n_files"] == 1

    got = spark.read.parquet(path)
    assert got.count() == 10000
    assert got.agg(F.sum("id")).first()[0] == sum(range(10000))


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(path)
    result = compact_parquet_dir(spark, path, target_bytes=10**9)
    assert not result["compacted"]
    assert spark.read.parquet(path).count() == 100
