"""Background compactor protocol (round 12): the MAJOR whole-index
fold off the trigger path. Pins four claims on _IndexSinkBase's
claim→fold→swap machinery:

1. inline_major=False triggers never rewrite the whole index — the
   snapshot count grows past the major threshold until run_maintenance
   (the background step) folds it, and pairs are invariant throughout.
2. A maintenance loop running CONCURRENTLY with the trigger (separate
   sink object, same manifest — the separate-process shape, flock is
   cross-process) loses no commits: the fold law still closes exactly.
3. A compactor crash mid-fold (after the c-dirs are written, before
   the swap commit) leaves the manifest intact; the leftovers sit in
   ``pending`` and vacuum(reclaim_pending=True) reclaims them; a retry
   succeeds.
4. A fold that LOSES ITS CLAIM (a concurrent compact folded the same
   dirs between reserve and swap) aborts cleanly instead of resurrecting
   tombstoned dirs — the lost-update case _locked_commit exists for.
"""

from __future__ import annotations

import pytest

import os
import threading

from pyspark.sql import functions as F

from postgres_es_cdc_spark.llm.similarity import (
    _q_corpus, emb_cosine_near_dup_pairs)
from postgres_es_cdc_spark.streaming.dedup import (
    SignatureIndexSink, VectorIndexSink)


def _batches(spark, sf_dir, n: int):
    c = _q_corpus(spark, sf_dir)
    return [c.filter(F.col("id") % n == i) for i in range(n)]


def _pairs(sink, spark):
    df = sink.pairs(spark)
    return sorted((r.id1, r.id2, r.cos_sim) for r in df.collect())


def _want(spark, sf_dir):
    return sorted((r.id1, r.id2, r.cos_sim)
                  for r in emb_cosine_near_dup_pairs(spark, sf_dir)
                  .collect())


def _snapshots(meta, store):
    return [d for d in meta.get(store, [])
            if os.path.basename(d).startswith("c")]


@pytest.mark.slow_soak
def test_inline_major_false_defers_whole_index_fold(
        spark, sf_dir, tmp_path):
    want = _want(spark, sf_dir)
    sink = VectorIndexSink(out_path=str(tmp_path / "v" / "pairs"),
                           index_path=str(tmp_path / "v" / "index"),
                           n_bands=8, bits=8,
                           compact_after=1, inline_major=False)
    for i, b in enumerate(_batches(spark, sf_dir, 6)):
        sink.apply_batch(b, i)
    m = sink.meta()
    # the trigger path only minor-folded: snapshot generations pile up
    # PAST the major threshold (min(major_after, compact_after) = 1)
    # because nothing inline is allowed to rewrite the whole index
    assert len(_snapshots(m, "reps")) >= 2
    assert _pairs(sink, spark) == want
    # the background step folds the snapshots to one and vacuums
    # (grace_s=0: no concurrent reader in this sequential test)
    r = sink.run_maintenance(spark, grace_s=0.0)
    assert r["compacted"] and r["major"] and r["vacuumed"] > 0
    m2 = sink.meta()
    for s in ("out", "members", "reps", "bands"):
        assert len(_snapshots(m2, s)) <= 1, (s, m2[s])
    assert _pairs(sink, spark) == want
    # the stream continues against the maintained index
    sink.apply_batch(_q_corpus(spark, sf_dir).limit(0), 6)
    assert _pairs(sink, spark) == want


@pytest.mark.slow_soak
def test_maintenance_concurrent_with_trigger(spark, sf_dir, tmp_path):
    """The separate-process shape, simulated with a separate sink
    OBJECT on the same manifest (flock serializes either way): a
    maintenance loop folds majors while the trigger applies batches.
    No commit may be lost — the fold law must close bit-exactly."""
    want = _want(spark, sf_dir)
    base = tmp_path / "v"
    trig = VectorIndexSink(out_path=str(base / "pairs"),
                           index_path=str(base / "index"),
                           n_bands=8, bits=8,
                           compact_after=1, inline_major=False)
    maint = VectorIndexSink(out_path=str(base / "pairs"),
                            index_path=str(base / "index"),
                            n_bands=8, bits=8, major_after=1)
    stop = threading.Event()
    errs: list = []

    def loop():
        while not stop.is_set():
            try:
                maint.run_maintenance(spark)
            except Exception as e:          # pragma: no cover
                errs.append(e)
                return
            stop.wait(0.05)

    batches = _batches(spark, sf_dir, 6)
    trig.apply_batch(batches[0], 0)   # manifest exists before the loop
    t = threading.Thread(target=loop)
    t.start()
    try:
        for i, b in enumerate(batches[1:], start=1):
            trig.apply_batch(b, i)
    finally:
        stop.set()
        t.join()
    assert not errs, errs
    # one final sweep so leftover tombstones don't mask the comparison
    maint.run_maintenance(spark)
    assert _pairs(trig, spark) == want
    m = trig.meta()
    assert m.get("pending", []) == []
    for s in ("out", "members", "reps", "bands"):
        for d in m[s]:
            assert os.path.isdir(d), d   # every listed dir survived


def test_crashed_fold_is_invisible_and_reclaimable(
        spark, sf_dir, tmp_path):
    want = _want(spark, sf_dir)
    sink = VectorIndexSink(out_path=str(tmp_path / "v" / "pairs"),
                           index_path=str(tmp_path / "v" / "index"),
                           n_bands=8, bits=8,
                           compact_after=1, inline_major=False)
    for i, b in enumerate(_batches(spark, sf_dir, 4)):
        sink.apply_batch(b, i)
    before = sink.meta()
    assert len(_snapshots(before, "reps")) >= 2

    # crash AT THE SWAP: reserve commits (gen + pending), the c-dirs
    # get written, then the process dies before the swap commit
    real_commit = sink._commit
    calls = {"n": 0}

    def crashy(meta):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("compactor crash at swap")
        real_commit(meta)

    sink._commit = crashy
    try:
        try:
            sink.compact(spark, minor=False)
            raise AssertionError("expected injected crash")
        except OSError:
            pass
    finally:
        sink._commit = real_commit

    m = sink.meta()
    # stores untouched: the old snapshots are still current state
    for s in ("out", "members", "reps", "bands"):
        assert m[s] == before[s], s
    assert m.get("pending"), "crashed fold must leave breadcrumbs"
    orphans = [VectorIndexSink._pend_path(p) for p in m["pending"]]
    # breadcrumbs carry their claim time (ADVICE r12): the steady-
    # state maintenance loop age-gates on it
    assert all(not isinstance(p, str) for p in m["pending"])
    existing = [d for d in orphans if os.path.isdir(d)]
    assert existing
    assert _pairs(sink, spark) == want

    # steady-state maintenance does NOT touch young pendings (they
    # could be a live fold's) ...
    sink.vacuum(pending_grace_s=3600.0)
    assert sink.meta().get("pending"), "young breadcrumbs must survive"
    assert all(os.path.isdir(d) for d in existing)
    # ... but reclaims them once aged past the window
    assert sink.vacuum(pending_grace_s=0.0) >= len(orphans)
    m = sink.meta()
    assert m.get("pending", []) == []
    assert not any(os.path.isdir(d) for d in orphans)
    r = sink.run_maintenance(spark)
    assert r["compacted"] and r["major"]
    assert _pairs(sink, spark) == want


def test_lost_claim_aborts_instead_of_resurrecting(
        spark, sf_dir, tmp_path):
    """Two compactors race for the same fold set: the loser's swap
    must abort (its claimed dirs are tombstoned by the winner), never
    commit a manifest that points at folded-away dirs."""
    from postgres_es_cdc_spark.llm.dedup import (
        _mutated_shingle_hashes, _signatures_from_sh,
        docs_minhash_lsh_pairs)

    sigs = _signatures_from_sh(_mutated_shingle_hashes(spark, sf_dir))
    base = tmp_path / "s"
    sink = SignatureIndexSink(out_path=str(base / "pairs"),
                              index_path=str(base / "index"))
    rival = SignatureIndexSink(out_path=str(base / "pairs"),
                               index_path=str(base / "index"))
    for i in range(3):
        sink.apply_batch(sigs.filter(F.col("doc_id") % 3 == i), i)
    want = sorted((r.doc_a, r.doc_b)
                  for r in docs_minhash_lsh_pairs(spark, sf_dir)
                  .collect())
    assert sorted((r.doc_a, r.doc_b)
                  for r in sink.pairs(spark).collect()) == want

    real = sink._locked_commit
    calls = {"n": 0}

    def interleaved(mutate):
        calls["n"] += 1
        if calls["n"] == 2:            # between reserve and swap:
            rival.compact(spark)       # the rival folds the same dirs
        return real(mutate)

    sink._locked_commit = interleaved
    try:
        r = sink.compact(spark, major=False)
    finally:
        sink._locked_commit = real
    assert r["compacted"] is False     # the loser aborted
    m = sink.meta()
    assert m.get("pending"), "loser's c-dirs parked in pending"
    # no store entry points at a tombstoned dir
    dead = {SignatureIndexSink._tomb_path(t)
            for t in m.get("tombstones", [])}
    for s in ("out", "members", "reps", "bands"):
        assert not (set(m[s]) & dead), s
    assert sorted((r_.doc_a, r_.doc_b)
                  for r_ in sink.pairs(spark).collect()) == want
    sink.vacuum(reclaim_pending=True)
    assert sink.meta().get("pending", []) == []
    assert sorted((r_.doc_a, r_.doc_b)
                  for r_ in sink.pairs(spark).collect()) == want
