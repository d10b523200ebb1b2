"""SignatureIndexSink — continuous MinHash-LSH text near-dup detection
over a durable rep-grain signature index. Pins the exactly-once law
(any batch split folded from an empty index == the one-shot
docs_minhash_lsh_pairs recompute), the replay gate, the
manifest/compaction discipline, and the round-11 persisted-band-log
invariants (tests mirror test_streaming_vector.py's)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_es_cdc_spark.llm.dedup import (
    _SIG_COLS, _mutated_shingle_hashes, _signatures_from_sh,
    docs_minhash_lsh_pairs)
from postgres_es_cdc_spark.streaming.dedup import SignatureIndexSink


def _sigs(spark, sf_dir):
    return _signatures_from_sh(_mutated_shingle_hashes(spark, sf_dir))


def _batches(spark, sf_dir, n: int):
    """The mutated corpus in n interleaved id slices — originals and
    mutants mix in every batch, so first-arrival reps differ from
    min-id reps across the fold."""
    s = _sigs(spark, sf_dir)
    return [s.filter(F.col("doc_id") % n == i) for i in range(n)]


def _drive(spark, base, batches, **kw) -> SignatureIndexSink:
    sink = SignatureIndexSink(out_path=str(base / "pairs"),
                              index_path=str(base / "index"), **kw)
    for i, b in enumerate(batches):
        sink.apply_batch(b, i)
    return sink


def _pairs(sink, spark):
    df = sink.pairs(spark)
    return sorted((r.doc_a, r.doc_b) for r in df.collect())


def test_signature_sink_fold_equals_one_shot_with_replay(
        spark, sf_dir, tmp_path):
    want = sorted((r.doc_a, r.doc_b)
                  for r in docs_minhash_lsh_pairs(spark, sf_dir).collect())
    assert want
    batches = _batches(spark, sf_dir, 3)
    sink = _drive(spark, tmp_path / "s", batches)
    assert _pairs(sink, spark) == want
    sink.apply_batch(batches[1], 1)         # committed replay: no-op
    assert _pairs(sink, spark) == want
    # a RESTARTED sink (fresh object, same paths) continues the gate
    sink2 = SignatureIndexSink(out_path=str(tmp_path / "s" / "pairs"),
                               index_path=str(tmp_path / "s" / "index"))
    sink2.apply_batch(batches[0], 0)
    assert _pairs(sink2, spark) == want


def test_signature_sink_compact_mid_stream_equals_uncompacted(
        spark, sf_dir, tmp_path):
    batches = _batches(spark, sf_dir, 4)
    plain = _drive(spark, tmp_path / "plain", batches)
    want = _pairs(plain, spark)
    sink = _drive(spark, tmp_path / "compact", batches, compact_after=1)
    assert _pairs(sink, spark) == want
    m = sink.meta()
    assert m.get("compact_gen", 0) >= 2
    for s in ("out", "members", "reps", "bands"):
        assert len(m[s]) <= 2, (s, len(m[s]))
    # tombstones reclaimed, live state intact, stream continues
    assert sink.vacuum() > 0
    assert _pairs(sink, spark) == want
    empty = _sigs(spark, sf_dir).limit(0)
    sink.apply_batch(empty, len(batches))   # empty batch: no new pairs
    assert _pairs(sink, spark) == want


def test_signature_sink_crash_before_commit_is_invisible(
        spark, sf_dir, tmp_path):
    batches = _batches(spark, sf_dir, 3)
    sink = _drive(spark, tmp_path / "s", batches[:2])
    before = _pairs(sink, spark)

    real_commit = sink._commit
    sink._commit = lambda m: (_ for _ in ()).throw(OSError("crash"))
    try:
        try:
            sink.apply_batch(batches[2], 2)
            raise AssertionError("expected injected crash")
        except OSError:
            pass
        assert sink.meta()["last_batch_id"] == 1
        assert _pairs(sink, spark) == before
    finally:
        sink._commit = real_commit

    sink.apply_batch(batches[2], 2)         # redelivery applies once
    want = sorted((r.doc_a, r.doc_b)
                  for r in docs_minhash_lsh_pairs(spark, sf_dir).collect())
    assert _pairs(sink, spark) == want

    # crash during COMPACTION repoint: old log stays current
    meta_before = sink.meta()
    sink._commit = lambda m: (_ for _ in ()).throw(OSError("crash"))
    try:
        try:
            sink.compact(spark)
            raise AssertionError("expected injected crash")
        except OSError:
            pass
        assert sink.meta() == meta_before
        assert _pairs(sink, spark) == want
    finally:
        sink._commit = real_commit
    assert sink.compact(spark)["compacted"]     # retry succeeds
    assert _pairs(sink, spark) == want


def test_signature_sink_band_log_matches_reps(spark, sf_dir, tmp_path):
    """Band-log invariant: the persisted fourth log is row-for-row the
    md5 banding of the committed reps log — the probe reading it sees
    exactly what re-banding would compute."""
    from postgres_es_cdc_spark.llm.dedup import _rep_bands

    sink = _drive(spark, tmp_path / "s", _batches(spark, sf_dir, 3))
    _, reps = sink.index(spark, _sigs(spark, sf_dir))
    want = {(r.rep, r.band_idx, r.band_key)
            for r in _rep_bands(reps).collect()}
    got = {(r.rep, r.band_idx, r.band_key)
           for r in sink.band_rows(spark).collect()}
    assert got == want and want


def test_signature_sink_probe_reads_band_log_not_reps(spark, tmp_path):
    """Regression pin (the VectorIndexSink round-11 discipline):
    emptying the committed band log (keeping reps intact) makes a
    later exact-duplicate batch emit NO pair — a refactor that quietly
    re-bands the reps log would resurface the pair and fail here."""
    def batch(i):
        return spark.createDataFrame(
            [(i * 100, *[7] * len(_SIG_COLS))],
            "doc_id long, " + ", ".join(f"{c} long" for c in _SIG_COLS))

    sink = SignatureIndexSink(out_path=str(tmp_path / "p"),
                              index_path=str(tmp_path / "i"))
    sink.apply_batch(batch(0), 0)
    band_dirs = sink.meta()["bands"]
    assert len(band_dirs) == 1
    empty = sink.band_rows(spark).limit(0).localCheckpoint()
    empty.write.mode("overwrite").parquet(band_dirs[0])
    sink.apply_batch(batch(1), 1)
    assert sink.pairs(spark).count() == 0


def test_signature_sink_through_real_stream(spark, sf_dir, tmp_path):
    """Drive SignatureIndexSink through an ACTUAL Structured Streaming
    query (file source, foreachBatch, checkpoint, availableNow) — the
    law holds for whatever micro-batch split the engine chooses."""
    s = _sigs(spark, sf_dir)
    src = str(tmp_path / "src")
    for i in range(3):
        (s.filter(F.col("doc_id") % 3 == i).coalesce(1)
          .write.mode("append").parquet(src))
    sink = SignatureIndexSink(out_path=str(tmp_path / "pairs"),
                              index_path=str(tmp_path / "index"))
    stream = (spark.readStream.schema(s.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink.writer())
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300), "stream did not finish within 300s"
    want = sorted((r.doc_a, r.doc_b)
                  for r in docs_minhash_lsh_pairs(spark, sf_dir).collect())
    assert _pairs(sink, spark) == want
    assert sink.meta()["last_batch_id"] >= 0


def test_tiered_compaction_minor_keeps_earlier_snapshots(
        spark, sf_dir, tmp_path):
    """Round-11 tiered compaction: a MINOR pass folds only the
    per-batch tail — earlier snapshot dirs must survive UNTOUCHED on
    disk (the 288-batch soak measured the all-entries fold rewriting
    the whole index every compact_after batches); a MAJOR pass fires
    only when snapshots outnumber compact_after. Equivalence with the
    uncompacted sink is asserted throughout."""
    import os

    batches = _batches(spark, sf_dir, 6)
    plain = _drive(spark, tmp_path / "plain", batches)
    want = _pairs(plain, spark)
    sink = SignatureIndexSink(out_path=str(tmp_path / "t" / "pairs"),
                              index_path=str(tmp_path / "t" / "index"),
                              compact_after=2)
    first_snapshot = None
    first_mtime = None
    for i, b in enumerate(batches):
        sink.apply_batch(b, i)
        snaps = [d for d in sink.meta()["reps"]
                 if os.path.basename(d).startswith("c")]
        if first_snapshot is None and snaps:
            first_snapshot = snaps[0]
            first_mtime = os.path.getmtime(first_snapshot)
        elif first_snapshot is not None and first_snapshot in \
                sink.meta()["reps"]:
            # still referenced => a minor pass ran without rewriting it
            assert os.path.getmtime(first_snapshot) == first_mtime
    assert _pairs(sink, spark) == want
    m = sink.meta()
    # bounded-listing contract: <= compact_after + 1 entries per store
    for s in ("out", "members", "reps", "bands"):
        assert len(m[s]) <= 3, (s, m[s])
    assert m.get("compact_gen", 0) >= 2
    assert sink.vacuum() > 0
    assert _pairs(sink, spark) == want
