"""ClusterLabelSink (round 13): live cluster labels inside the
streaming loop — the durable foreachBatch twin of
merge_cluster_labels' in-memory fold. Pins:

- the fold law survives the DURABLE path: sink-committed labels ==
  one-shot union-find over every pair delivered, under any batch
  split and with mid-stream redelivery (replay gate: strict no-op —
  without it the new-endpoint rows would duplicate);
- a restarted sink (fresh object, same path) continues the store;
- a crash before the manifest repoint leaves the previous snapshot
  current;
- column-name configurability (the index sinks' pair logs are
  (id1, id2) / (doc_a, doc_b), not (a, b));
- end-to-end composition: tailing a live SignatureIndexSink's pair
  log per trigger produces labels equal to TRUE components over the
  one-shot LSH pair set.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from postgres_es_cdc_spark.llm.dedup import _label_union_find
from postgres_es_cdc_spark.streaming.dedup import ClusterLabelSink


def _pairs_df(spark, pairs, cols=("a", "b")):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs],
        f"{cols[0]} long, {cols[1]} long")


def _one_shot(pairs):
    remap = _label_union_find(list(pairs))
    nodes = sorted({x for p in pairs for x in p})
    return [(n, remap.get(n, n)) for n in nodes]


def _labels(sink, spark):
    return sorted((r.rep, r.label) for r in sink.labels(spark).collect())


def test_sink_fold_equals_one_shot_with_replay_and_restart(
        spark, tmp_path):
    pairs = [(10, 20), (20, 30), (30, 40), (40, 50), (50, 60),
             (70, 80), (80, 90), (70, 90), (2, 40)]
    batches = [pairs[0:3], pairs[3:6], pairs[6:]]
    want = _one_shot(pairs)

    sink = ClusterLabelSink(str(tmp_path / "labels"))
    for i, b in enumerate(batches):
        sink.apply_batch(_pairs_df(spark, b), i)
    assert _labels(sink, spark) == want

    # committed replay: strict no-op (no duplicated endpoint rows)
    sink.apply_batch(_pairs_df(spark, batches[1]), 1)
    assert _labels(sink, spark) == want

    # a restarted sink (fresh object, same path) continues the store
    sink2 = ClusterLabelSink(str(tmp_path / "labels"))
    assert _labels(sink2, spark) == want
    sink2.apply_batch(_pairs_df(spark, [(1, 2)]), 3)
    assert _labels(sink2, spark) == _one_shot(pairs + [(1, 2)])


def test_sink_crash_before_commit_is_invisible(spark, tmp_path):
    sink = ClusterLabelSink(str(tmp_path / "labels"))
    sink.apply_batch(_pairs_df(spark, [(1, 2), (3, 4)]), 0)
    before = _labels(sink, spark)

    real = sink._st.commit
    sink._st.commit = lambda df, bid: (_ for _ in ()).throw(
        OSError("crash"))
    try:
        try:
            sink.apply_batch(_pairs_df(spark, [(2, 3)]), 1)
            raise AssertionError("expected injected crash")
        except OSError:
            pass
        assert sink._st.meta()["last_batch_id"] == 0
        assert _labels(sink, spark) == before
    finally:
        sink._st.commit = real

    sink.apply_batch(_pairs_df(spark, [(2, 3)]), 1)  # redelivery lands
    assert _labels(sink, spark) == _one_shot([(1, 2), (3, 4), (2, 3)])


def test_sink_accepts_index_sink_pair_columns(spark, tmp_path):
    sink = ClusterLabelSink(str(tmp_path / "labels"),
                            a_col="id1", b_col="id2")
    sink.apply_batch(_pairs_df(spark, [(5, 6), (6, 7)],
                               cols=("id1", "id2")), 0)
    assert _labels(sink, spark) == [(5, 5), (6, 5), (7, 5)]


def test_sink_tails_signature_index_pair_log(spark, sf_dir, tmp_path):
    """The production wiring: per trigger, the index sink commits its
    pair delta dir, then the label sink folds exactly that delta —
    final labels must equal TRUE components over the one-shot LSH
    pair set (the docs_incremental_cluster_fold oracle's law, driven
    end-to-end through BOTH sinks)."""
    from postgres_es_cdc_spark.llm.dedup import (
        _SIG_COLS, _mutated_shingle_hashes, _signatures_from_sh,
        docs_minhash_lsh_pairs)
    from postgres_es_cdc_spark.streaming.dedup import SignatureIndexSink

    sigs = _signatures_from_sh(
        _mutated_shingle_hashes(spark, sf_dir)).localCheckpoint()
    idx = SignatureIndexSink(out_path=str(tmp_path / "pairs"),
                             index_path=str(tmp_path / "index"))
    lab = ClusterLabelSink(str(tmp_path / "labels"),
                           a_col="doc_a", b_col="doc_b")
    for i in range(3):
        batch = sigs.filter(F.col("doc_id") % 3 == i)
        idx.apply_batch(batch, i)
        pdir = os.path.join(str(tmp_path / "pairs"), f"b{i}")
        lab.apply_batch(spark.read.parquet(pdir), i)

    want_pairs = [(r.doc_a, r.doc_b)
                  for r in docs_minhash_lsh_pairs(spark, sf_dir)
                  .collect()]
    assert _labels(lab, spark) == _one_shot(want_pairs)
