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

import fcntl
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


class KeyedDedupSink:
    """foreachBatch sink: first-arrival-wins keyed dedup with a durable
    parquet seen-key store and an append-only survivor output.

    In-batch ties resolve by ``order_col`` (min wins) so replays are
    deterministic.

    Round-10 durability/compaction rewrite (the JoinSink discipline
    ported to the append-only pair, closing the round-9 verdict's
    file-count-growth item): both stores are APPEND-ONLY delta logs —
    one dir per batch under ``out_path``/``seen_path`` — committed
    TOGETHER with the last applied batch id by one manifest written in
    a single os.replace. That replaces three defects of the pre-round-10
    sink: (1) the survivor output was a bare ``mode("append")`` with no
    replay gate, so an at-least-once redelivery duplicated output
    files; (2) the seen store was fully REWRITTEN per batch — O(corpus)
    per batch, the anti-IVM shape; (3) that rewrite overwrote the live
    dir in place — a crash mid-write lost both old and new state. Now a
    crash at any point leaves the previously committed manifest current
    (orphan dirs are invisible and overwritten on retry), a redelivered
    batch id is a no-op, and per-batch cost is O(batch + store probe)
    in rows.

    The LOG still grows one dir per store per batch — listing +
    parquet-footer overhead O(entries) with uptime (288 entries/day at
    5-minute triggers; the JoinSink soak measured 1.98× probe growth).
    ``compact_after=N`` folds each log into ONE snapshot dir whenever
    either exceeds N entries: both stores are append-only BAGS
    (appended key sets are disjoint by construction — a key is appended
    only when absent from everything before it), so the snapshot is a
    pure bag-union rewrite, committed by the same single-os.replace
    repoint with superseded dirs TOMBSTONED, never deleted in the
    commit path; vacuum() reclaims them as a separate restartable step.
    Shapes pinned by tests/test_streaming_dedup_compaction.py; the
    wall-clock flatness is tools/ivm_soak.py --sink dedup."""

    def __init__(self, out_path: str, seen_path: str, keys: list[str],
                 order_col: str, compact_after: int | None = None):
        self.out_path = out_path
        self.seen_path = seen_path
        self.keys = keys
        self.order_col = order_col
        self.compact_after = compact_after

    # -- manifest ------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.out_path, "_dedup_manifest.json")

    def meta(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"out": [], "seen": [], "last_batch_id": -1}

    def _commit(self, meta: dict) -> None:
        os.makedirs(self.out_path, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._manifest_path())

    @staticmethod
    def _read_log(spark: SparkSession, dirs: list) -> DataFrame | None:
        return spark.read.parquet(*dirs) if dirs else None

    def survivors(self, spark: SparkSession) -> DataFrame | None:
        """The committed survivor output (union of the delta log)."""
        return self._read_log(spark, self.meta()["out"])

    def seen_keys(self, spark: SparkSession) -> DataFrame | None:
        """The committed seen-key store (union of the delta log)."""
        return self._read_log(spark, self.meta()["seen"])

    # -- per-batch fold ------------------------------------------------
    def _batch_first(self, batch: DataFrame) -> DataFrame:
        firsts = batch.groupBy(*self.keys).agg(
            F.min(self.order_col).alias(self.order_col))
        return firsts.join(batch, [*self.keys, self.order_col])

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        meta = self.meta()
        if batch_id <= meta["last_batch_id"]:
            return                      # committed replay: no-op
        cand = self._batch_first(batch)
        seen = self._read_log(spark, meta["seen"])
        if seen is not None:
            # key-only anti-join: the store holds keys, not payloads —
            # broadcastable while the store is small, shuffle at scale
            cand = cand.join(seen, self.keys, "left_anti")
        cand = cand.localCheckpoint()  # one computation for both writes
        odir = os.path.join(self.out_path, f"b{batch_id}")
        sdir = os.path.join(self.seen_path, f"b{batch_id}")
        # independent writes off the checkpointed frame -> overlap them
        # (guide §2.6); both land before the single manifest commit
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            fo = pool.submit(
                lambda: cand.write.mode("overwrite").parquet(odir))
            fs = pool.submit(
                lambda: cand.select(*self.keys)
                .write.mode("overwrite").parquet(sdir))
            fo.result(), fs.result()
        new_meta = dict(meta)
        new_meta.update({"out": meta["out"] + [odir],
                         "seen": meta["seen"] + [sdir],
                         "last_batch_id": batch_id})
        self._commit(new_meta)
        if self.compact_after is not None and max(
                len(new_meta["out"]), len(new_meta["seen"])
        ) > self.compact_after:
            self.compact(spark)

    # -- compaction ----------------------------------------------------
    def compact(self, spark: SparkSession) -> dict:
        """Fold each delta log into ONE snapshot dir (class docstring).
        Snapshot dirs land first under a generation name the manifest
        doesn't reference; then one os.replace repoints both stores and
        tombstones the superseded dirs. Crash before the repoint leaves
        the old log current; last_batch_id carries through, so the
        replay gate survives compaction."""
        meta = self.meta()
        if max(len(meta["out"]), len(meta["seen"])) <= 1:
            return {"compacted": False,
                    "entries": {s: len(meta[s]) for s in ("out", "seen")}}
        gen = meta.get("compact_gen", 0) + 1
        new_meta = dict(meta)
        new_meta["compact_gen"] = gen
        dead = []
        for store, base in (("out", self.out_path),
                            ("seen", self.seen_path)):
            entries = meta[store]
            if not entries:
                continue
            cdir = os.path.join(base, f"c{gen}")
            snap = spark.read.parquet(*entries)
            snap.write.mode("overwrite").parquet(cdir)
            new_meta[store] = [cdir]
            dead.extend(entries)
        new_meta["tombstones"] = meta.get("tombstones", []) + dead
        self._commit(new_meta)
        return {"compacted": True, "gen": gen, "folded": len(dead)}

    def vacuum(self) -> int:
        """Delete tombstoned dirs and clear the list — separate from
        the compaction commit so a crash can never orphan LIVE data."""
        meta = self.meta()
        dead = meta.get("tombstones", [])
        for d in dead:
            shutil.rmtree(d, ignore_errors=True)
        if dead:
            meta = dict(meta)
            meta["tombstones"] = []
            self._commit(meta)
        return len(dead)

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


class _IndexSinkBase:
    """Shared manifest protocol of the two streaming near-dup index
    sinks (vector / MinHash-LSH): four append-only delta logs — pair
    output, member log, rep log, band log — committed TOGETHER with the
    last applied batch id by one manifest written in a single
    os.replace (crash ⇒ orphan dirs invisible, retry overwrites;
    redelivered batch id ⇒ no-op), ``compact_after=N`` folding each log
    to ONE snapshot dir by pure bag union (appends are disjoint from
    all committed state by construction), superseded dirs TOMBSTONED
    and reclaimed by vacuum() as a separate restartable step — the
    KeyedDedupSink discipline, factored once."""

    _MANIFEST = "_index_manifest.json"
    STORES = ("out", "members", "reps", "bands")

    def __init__(self, out_path: str, index_path: str,
                 compact_after: int | None = None,
                 major_after: int = 4,
                 inline_major: bool = True):
        self.out_path = out_path
        self.index_path = index_path
        self.compact_after = compact_after
        # snapshot-generation bound: a MAJOR fold (whole-index rewrite)
        # fires only when minor snapshots exceed this — the knob trading
        # read amplification (dirs per probe scan) against write
        # amplification (index rewrites); measured in SCALE.md round 11
        self.major_after = major_after
        # Round 12 (the one remaining r11 perf-weak item): the MAJOR
        # fold rewrites the whole index — 22 s/batch compaction eras in
        # the day-scale soak when it runs on the TRIGGER path. With
        # inline_major=False apply_batch only ever folds its own tail
        # (minor pass, O(tail)); the whole-index rewrite moves to a
        # separately-run maintenance step (run_maintenance / tools/
        # index_maintenance.py) against the same manifest — the 100 TB
        # shape, where a background compactor owns write amplification
        # and the trigger owns only per-batch work. Commits from the
        # two writers are serialized by _locked_commit below.
        self.inline_major = inline_major

    # -- manifest ------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.out_path, self._MANIFEST)

    def _meta_defaults(self) -> dict:
        return {}

    def meta(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        base = {s: [] for s in self.STORES}
        base["last_batch_id"] = -1
        base.update(self._meta_defaults())
        return base

    def _commit(self, meta: dict) -> None:
        os.makedirs(self.out_path, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._manifest_path())

    def _locked_commit(self, mutate) -> dict | None:
        """Serialized read-modify-write of the manifest (round 12):
        with a background compactor, TWO writers commit against the
        same manifest — the trigger (appends batch dirs, minor folds)
        and the maintenance process (major folds). os.replace makes
        each write atomic, but a blind write of a meta read earlier
        would LOSE the other writer's commit (the classic lost
        update), so every commit re-reads the manifest under an
        exclusive flock and applies ``mutate(current) -> new | None``
        to the freshest state; None aborts without writing. The lock
        is held only around read+mutate+write — never around Spark
        work — so contention is microseconds. flock is advisory and
        host-local, which matches the sandbox (single box); on a real
        cluster the manifest lives in a coordination service or a
        table format with optimistic CAS commits (the same
        verify-then-swap shape compact() uses below)."""
        os.makedirs(self.out_path, exist_ok=True)
        with open(self._manifest_path() + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                new_meta = mutate(self.meta())
                if new_meta is None:
                    return None
                self._commit(new_meta)
                return new_meta
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    @staticmethod
    def _read_log(spark: SparkSession, dirs: list) -> DataFrame | None:
        return spark.read.parquet(*dirs) if dirs else None

    # -- bucketed reps layout (r14: tools/bucketed_reps.py graduated) --
    @staticmethod
    def _is_bucketed(d: str) -> bool:
        """A bucketed snapshot is recognizable by CONTENT (its
        `_bucket=*` partition subdirs), so manifest entries stay plain
        dir strings and every existing fold/tombstone/vacuum path is
        untouched. One listdir per dir — the same listStatus a parquet
        read performs anyway."""
        try:
            return any(f.startswith("_bucket=")
                       for f in os.listdir(d))
        except OSError:
            return False

    def _read_reps(self, spark: SparkSession, dirs: list,
                   buckets: list | None = None) -> DataFrame | None:
        """Reps-store reader for the MIXED log: flat dirs (delta tails
        and minor range-sorted snapshots) read whole; bucketed MAJOR
        snapshots read via recursiveFileLookup (the `_bucket` column
        lives only in directory names, never in data files — so the
        schema is uniform across layouts, the reconciliation blocker
        that parked tools/bucketed_reps.py as a prototype). With a
        candidate ``buckets`` list, bucketed snapshots are restricted
        to exactly those `_bucket=i` subdirs — directory-grain pruning
        BEFORE any footer is read; a scattered probe (most buckets
        touched) falls back to whole-dir roots, JoinSink's measured
        heuristic."""
        from postgres_es_cdc_spark.llm.similarity import REP_BUCKETS
        flat, bkt = [], []
        for d in dirs:
            (bkt if self._is_bucketed(d) else flat).append(d)
        parts = []
        if flat:
            parts.append(spark.read.parquet(*flat))
        if bkt:
            if buckets is not None and 2 * len(buckets) < REP_BUCKETS:
                paths = [p for d in bkt for b in buckets
                         if os.path.isdir(
                             p := os.path.join(d, f"_bucket={b}"))]
            else:
                paths = bkt
            if paths:
                parts.append(spark.read
                             .option("recursiveFileLookup", "true")
                             .parquet(*paths))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _store_base(self, store: str) -> str:
        return (self.out_path if store == "out"
                else os.path.join(self.index_path, store))

    def pairs(self, spark: SparkSession) -> DataFrame | None:
        """The committed verified/candidate-pair output (log union)."""
        return self._read_log(spark, self.meta()["out"])

    def band_rows(self, spark: SparkSession) -> DataFrame | None:
        """The committed band log (rep, band_idx, band_key) — one row
        per (rep, band); None while the index is empty."""
        return self._read_log(spark, self.meta().get("bands", []))

    def _maybe_compact(self, spark: SparkSession, meta: dict) -> None:
        if self.compact_after is not None and max(
                len(meta.get(s, [])) for s in self.STORES
        ) > self.compact_after:
            # inline_major=False keeps the whole-index rewrite OFF the
            # trigger path — run_maintenance owns it (class docstring)
            self.compact(spark, major=self.inline_major)

    # -- compaction (tiered, round 11) -----------------------------------
    @staticmethod
    def _is_snapshot(d: str) -> bool:
        return os.path.basename(d).startswith("c")

    # Small-files discipline (round 11, measured): the first tiered-288
    # soak was SLOWER mid-run than the full-fold one — every probe read
    # the index from ~17 snapshot dirs each holding ~32 shuffle-grain
    # files (2003 files on disk). Delta writes are micro-batch-sized by
    # definition → 1 file; fold outputs are index-grain → a few files.
    FOLD_FILES = 8

    # Fold-output CLUSTERED LAYOUT (round 13 — the 100 TB mechanism
    # behind the attach pushdown): stores listed here are written
    # range-partitioned + sorted by their key when folded, so each
    # snapshot file covers a DISJOINT key range and the pushdown's
    # In(rep, ...) predicate prunes whole files / row groups at the
    # parquet footer. Without this, arrival-ordered snapshots spread
    # every key range across every file (the soak fixture's
    # anti-localized reps defeat min/max pruning entirely) and the
    # "pushdown" still scans every data page. Delta dirs stay
    # arrival-ordered: one micro-batch = one file = one row group,
    # where internal order cannot change footer min/max. The sort
    # rides the fold's existing shuffle slot — minor folds are
    # tail-sized, major folds run off the trigger path.
    FOLD_SORT: dict = {"reps": ["rep"],
                       "bands": ["band_idx", "band_key"]}

    def _fold_pass(self, spark: SparkSession, pick,
                   bucket_reps: bool = False) -> dict:
        """One CLAIM → FOLD → SWAP pass (round 12 — the fold itself is
        unchanged bag-union; the protocol around it now tolerates a
        concurrent writer):

        1. CLAIM: snapshot the manifest, pick the fold set per store
           (>1 entries matching ``pick``); under the lock, reserve a
           unique generation number and record the would-be c{gen}
           dirs in ``pending`` (so a crash mid-fold leaves reclaimable
           breadcrumbs, never silent orphans — ADVICE r11's migration
           finding generalized).
        2. FOLD (heavy, unlocked): union each fold set into its c{gen}
           dir. Concurrent appends/folds proceed freely.
        3. SWAP: under the lock, re-read the manifest; verify every
           claimed dir is STILL listed (a concurrent folder may have
           claimed overlapping dirs — then abort: the c-dirs stay in
           pending for vacuum(reclaim_pending=True)); replace the fold
           set with the c-dir at the position of its first member,
           preserving entries appended since the claim; tombstone the
           folded dirs; clear pending.

        Minor and major passes pick disjoint dir kinds (b* vs c*), so
        a trigger-path minor fold and a maintenance-process major fold
        never contend on the same entries — the swap verification is
        the backstop, not the mechanism."""
        snap = self.meta()
        folds = {s: f for s in self.STORES
                 if len(f := [d for d in snap.get(s, []) if pick(d)]) > 1}
        if not folds:
            return {"compacted": False, "folded": 0}
        box: dict = {}

        def reserve(cur: dict) -> dict:
            gen = cur.get("compact_gen", 0) + 1
            box["gen"] = gen
            box["cdirs"] = {s: os.path.join(self._store_base(s), f"c{gen}")
                            for s in folds}
            new = dict(cur)
            new["compact_gen"] = gen
            # pending entries carry their claim time (ADVICE r12, the
            # tombstone discipline): dirs parked by a crashed or
            # lost-claim fold become age-eligible for the steady-state
            # run_maintenance reclaim instead of leaking until an
            # operator runs vacuum(reclaim_pending=True)
            now = time.time()
            new["pending"] = (new.get("pending", [])
                              + [[d, now]
                                 for d in sorted(box["cdirs"].values())])
            return new

        self._locked_commit(reserve)
        gen, cdirs = box["gen"], box["cdirs"]
        for store, fold in folds.items():
            if store == "reps":
                # mixed-layout aware (a prior MAJOR snapshot in the
                # fold set is bucketed); the fold itself stays bag union
                df = self._read_reps(spark, fold)
                if bucket_reps:
                    # MAJOR folds graduate the reps snapshot to the
                    # hash-bucketed table layout (r14): partition dirs
                    # by _bucket, rep-sorted within, so attach probes
                    # prune whole DIRECTORIES by candidate bucket.
                    # Only the (one) major snapshot pays the
                    # REP_BUCKETS-dir layout — minor snapshots keep
                    # the 8-file range layout, bounding file count
                    # (the r11 small-files lesson): L0 arrival deltas,
                    # L1 range-sorted minors, L2 bucketed major.
                    from postgres_es_cdc_spark.llm.similarity import (
                        REP_BUCKETS, _rep_bucket_expr)
                    (df.withColumn("_bucket", _rep_bucket_expr())
                       .repartition(REP_BUCKETS, F.col("_bucket"))
                       .sortWithinPartitions(*self.FOLD_SORT["reps"])
                       .write.mode("overwrite").partitionBy("_bucket")
                       .parquet(cdirs[store]))
                    continue
            else:
                df = spark.read.parquet(*fold)
            keys = self.FOLD_SORT.get(store)
            if keys:
                df = (df.repartitionByRange(self.FOLD_FILES, *keys)
                        .sortWithinPartitions(*keys))
            else:
                df = df.coalesce(self.FOLD_FILES)
            df.write.mode("overwrite").parquet(cdirs[store])

        def swap(cur: dict) -> dict | None:
            new = dict(cur)
            dead = []
            for store, fold in folds.items():
                entries = cur.get(store, [])
                if any(d not in entries for d in fold):
                    return None          # claimed by a concurrent fold
                kept = [d for d in entries if d not in fold]
                at = sum(1 for d in entries[:entries.index(fold[0])]
                         if d not in fold)
                kept.insert(at, cdirs[store])
                new[store] = kept
                dead.extend(fold)
            # tombstones carry their commit time (round 12): with a
            # CONCURRENT compactor, vacuum must not reclaim a dir an
            # in-flight trigger may still be reading from an older
            # manifest snapshot — vacuum(grace_s=...) only deletes
            # tombstones older than the longest possible reader
            # (a micro-batch), the retention-window discipline every
            # snapshot-isolated table format uses
            now = time.time()
            new["tombstones"] = (new.get("tombstones", [])
                                 + [[d, now] for d in dead])
            new["pending"] = [p for p in new.get("pending", [])
                              if self._pend_path(p)
                              not in cdirs.values()]
            return new

        if self._locked_commit(swap) is None:
            return {"compacted": False, "folded": 0, "gen": gen,
                    "aborted": True}
        return {"compacted": True, "gen": gen,
                "folded": sum(len(f) for f in folds.values())}

    def compact(self, spark: SparkSession, minor: bool = True,
                major: bool = True) -> dict:
        """TIERED compaction (round 11 — the 288-batch soak measured
        the all-entries fold rewriting the WHOLE index every
        compact_after batches, an O(index) amortized term that
        dominated day-scale cost): a MINOR pass folds only the
        per-batch tail dirs into one new snapshot generation —
        O(tail), earlier snapshots untouched — then, only when the
        snapshot count itself still exceeds the major threshold, a
        MAJOR pass folds the snapshots into one (amortized O(index /
        compact_after²) per batch). Both passes are bag-union folds
        (appends are disjoint by construction) committed by the
        claim→fold→swap protocol of _fold_pass; crash between the two
        passes leaves a fully consistent minor state; last_batch_id
        carries through, so the replay gate survives. Post-compact
        entry count stays ≤ compact_after + 1, preserving the round-9
        bounded-listing contract.

        ``minor``/``major`` select the passes: the trigger path calls
        compact(spark, major=self.inline_major) so an inline_major=
        False sink never rewrites the whole index inside a trigger;
        the background compactor calls compact(spark, minor=False)
        (run_maintenance) and owns the major fold alone."""
        meta = self.meta()
        if max(len(meta.get(s, [])) for s in self.STORES) <= 1:
            return {"compacted": False}
        out = {"compacted": False, "folded": 0, "major": False}
        if minor:
            r = self._fold_pass(spark,
                                lambda d: not self._is_snapshot(d))
            out.update(compacted=r["compacted"], folded=r["folded"])
            if "gen" in r:
                out["gen"] = r["gen"]
        # effective major threshold: never above compact_after, so the
        # bounded-listing contract (<= compact_after + 1 entries after
        # compaction) holds at any knob setting
        cap = (min(self.major_after, self.compact_after)
               if self.compact_after is not None else 1)
        meta = self.meta()
        if major and max(len([d for d in meta.get(s, [])
                              if self._is_snapshot(d)])
                         for s in self.STORES) > cap:
            r = self._fold_pass(spark, self._is_snapshot,
                                bucket_reps=True)
            if r["compacted"]:
                out.update({"compacted": True, "gen": r["gen"],
                            "major": True,
                            "folded": out["folded"] + r["folded"]})
        return out

    def run_maintenance(self, spark: SparkSession, vacuum: bool = True,
                        grace_s: float = 300.0,
                        pending_grace_s: float = 3600.0) -> dict:
        """One background-compactor step — what a 100 TB deployment
        runs in its OWN process/session while the stream keeps
        triggering (tools/index_maintenance.py is the CLI): the major
        whole-index fold, off the trigger path, plus optional vacuum
        of tombstoned dirs. Safe against the live trigger because
        every manifest commit goes through _locked_commit's re-read-
        merge and the swap verifies its claim; safe against crashes
        because an interrupted fold leaves only ``pending`` dirs that
        the next reclaim sweep removes. ``grace_s`` keeps tombstones
        a reader might still hold (vacuum docstring); the default
        comfortably exceeds a micro-batch. ``pending_grace_s`` lets
        the STEADY-STATE loop reclaim pending c-dirs parked by a
        crashed or lost-claim fold (ADVICE r12 — previously they
        leaked until an operator ran vacuum(reclaim_pending=True)):
        entries older than the window cannot belong to a live fold as
        long as the window exceeds the longest possible fold pass —
        the default hour is ~3 orders of magnitude above any measured
        major fold; set it None-like high rather than low."""
        r = self.compact(spark, minor=False, major=True)
        if vacuum:
            r = dict(r, vacuumed=self.vacuum(
                grace_s=grace_s, pending_grace_s=pending_grace_s))
        return r

    @staticmethod
    def _tomb_path(t) -> str:
        """A tombstone is a bare path (pre-round-12 manifests) or a
        [path, tombstoned_unix] pair (written by _fold_pass)."""
        return t if isinstance(t, str) else t[0]

    # pending entries share the tombstone encoding: bare path
    # (pre-round-13 manifests) or [path, claimed_unix]
    _pend_path = _tomb_path

    def vacuum(self, reclaim_pending: bool = False,
               grace_s: float = 0.0,
               pending_grace_s: float | None = None) -> int:
        """Delete tombstoned dirs and clear the list — separate from
        the compaction commit so a crash can never orphan LIVE data.
        Merge-aware (round 12): the commit drops exactly the dirs THIS
        call deleted, preserving tombstones a concurrent fold added in
        between.

        ``grace_s`` is the reader-retention window: a tombstone
        younger than this may still be READ by an in-flight trigger
        that planned its probe from the pre-fold manifest, so a
        CONCURRENT maintenance process must vacuum with grace_s above
        the longest micro-batch (run_maintenance defaults to 300 s).
        grace_s=0 (the default) keeps the single-writer behavior —
        reclaim everything — for offline/sequential callers. Legacy
        bare-path tombstones have no timestamp and are always
        eligible.

        ``reclaim_pending=True`` additionally deletes ALL ``pending``
        c-dirs — leftovers of a fold that crashed or lost its swap.
        Only safe when no compactor is MID-FOLD on this index (a live
        fold's c-dirs sit in pending until its swap commits), so it is
        an operator-invoked sweep — e.g. maintenance-process startup —
        never part of the trigger path.

        ``pending_grace_s`` (ADVICE r12) is the CONCURRENT-SAFE
        pending reclaim: only entries whose claim timestamp is older
        than the window are deleted — a live fold cannot be older than
        the longest fold pass, so a generous window (run_maintenance
        defaults to an hour) makes this safe inside the steady-state
        maintenance loop, where repeated lost claims would otherwise
        leak disk indefinitely. Legacy bare-path pending entries (no
        timestamp) are always eligible — by the time a manifest with
        timestamped pendings exists, any bare entry predates the
        upgrade and cannot be a live fold's."""
        meta = self.meta()
        cutoff = time.time() - grace_s
        ripe = [t for t in meta.get("tombstones", [])
                if isinstance(t, str) or t[1] <= cutoff]
        dead = [self._tomb_path(t) for t in ripe]
        if reclaim_pending:
            ripe_p = list(meta.get("pending", []))
        elif pending_grace_s is not None:
            pcut = time.time() - pending_grace_s
            ripe_p = [p for p in meta.get("pending", [])
                      if isinstance(p, str) or p[1] <= pcut]
        else:
            ripe_p = []
        pend = [self._pend_path(p) for p in ripe_p]
        for d in dead + pend:
            shutil.rmtree(d, ignore_errors=True)
        if dead or pend:
            def drop(cur: dict) -> dict:
                gone = set(dead)
                gone_p = set(pend)
                new = dict(cur)
                new["tombstones"] = [
                    t for t in cur.get("tombstones", [])
                    if self._tomb_path(t) not in gone]
                if pend:
                    new["pending"] = [
                        p for p in cur.get("pending", [])
                        if self._pend_path(p) not in gone_p]
                return new
            self._locked_commit(drop)
        return len(dead) + len(pend)

    def writer(self):
        return self.apply_batch


class VectorIndexSink(_IndexSinkBase):
    """foreachBatch sink: continuous vector near-dup detection over a
    DURABLE rep-grain embedding index — the streaming wrapper of
    llm/similarity's embedding_store family (probe → append deltas),
    on the same manifest protocol as KeyedDedupSink above.

    Per micro-batch of (id, q) rows (q = the ×1e6 fixed-point int64
    vector, similarity.quantize): collapse identical vectors to a
    representative, probe the committed index (sign-LSH banding,
    rep-grain exact-cosine verification ≥ threshold, arithmetic member
    expansion — similarity._probe_embedding_store), append the verified
    pairs to the output log and the batch's member/rep deltas to the
    index logs. merge_embedding_deltas' appends are DISJOINT from all
    committed state by construction (an id arrives once; a rep is added
    only when its vector is unseen), so all FOUR stores are append-only
    bags: one manifest os.replace commits them together with the batch
    id (crash ⇒ orphan dirs invisible, retry overwrites; redelivered
    batch id ⇒ no-op), and ``compact_after=N`` folds each log to ONE
    snapshot dir by pure bag union — tombstoned, vacuum() reclaimed,
    exactly the KeyedDedupSink discipline.

    The fourth log is the PERSISTED BAND LOG (round 11): each new rep's
    (rep, band_idx, band_key) sign-LSH rows are appended once, when the
    rep enters the index, so the per-trigger probe joins the batch's
    band rows against three narrow int64 columns instead of recomputing
    64 element_at signs per stored rep — the round-10 soak's residual
    1.78× per-batch growth term (the one measured O(index) cost left).
    The manifest pins the banding geometry; a restart with a different
    (n_bands, bits) raises instead of silently probing the wrong
    buckets. On a cluster this is the frame you'd keep bucketed by
    band_key so the candidate join co-locates.

    The exactly-once law the tests pin: folding a corpus through ANY
    batch split starting from an empty index emits every verified pair
    of the whole corpus exactly once (in the batch where its later
    member arrives) — the streaming answer equals the one-shot
    emb_cosine_near_dup_pairs recompute.

    Scale shape: per-batch cost is O(batch·bands + matched
    DISTINCT-content buckets) — independent of corpus size and
    duplicate multiplicity (the round-10 rep-grain discipline); the
    index logs are the frames you'd keep bucketed by band key on a
    cluster. History vectors are never re-read, only the rep-grain
    index is."""

    _MANIFEST = "_vector_manifest.json"

    def __init__(self, out_path: str, index_path: str,
                 threshold: float = 0.9,
                 compact_after: int | None = None,
                 n_bands: int = 2, bits: int = 32,
                 major_after: int = 4, inline_major: bool = True):
        # (2, 32) — the MEASURED rule from the round-12 288-batch day
        # soak: accidental candidates/batch ~ bands*batch*index/2^bits,
        # an O(index) per-batch term. At (4,16) that reads ~300k
        # accidental candidates/batch by batch 200 (and keeps the
        # probe's id-pushdown guard permanently exceeded, deactivating
        # it); at (2,32) accidental candidates are near zero, the
        # pushdown stays active, and absolutes ran ~20% faster at the
        # same recall gate (pairs bit-exact vs the one-shot recompute —
        # SCALE.md, round-12 soak rows). Recall on exact duplicates is
        # 1 under any sign banding; the manifest pins geometry, so
        # existing indexes keep working by passing their committed
        # (n_bands, bits) explicitly.
        super().__init__(out_path, index_path, compact_after,
                         major_after=major_after,
                         inline_major=inline_major)
        self.threshold = threshold
        self.n_bands = n_bands
        self.bits = bits

    def _meta_defaults(self) -> dict:
        return {"banding": [self.n_bands, self.bits]}

    def index(self, spark: SparkSession, batch: DataFrame,
              meta: dict | None = None) -> tuple:
        """The committed (members, reps) index; empty frames derived
        from the batch schema when no state is committed yet."""
        meta = meta or self.meta()
        mem = self._read_log(spark, meta["members"])
        reps = self._read_reps(spark, meta["reps"])
        if mem is None:
            mem = batch.select("id", F.col("id").alias("rep")).limit(0)
        if reps is None:
            reps = batch.select(F.col("id").alias("rep"), "q").limit(0)
        return (mem.select("id", "rep"), reps.select("rep", "q"))

    def _band_log(self, spark: SparkSession, meta: dict) -> tuple:
        """(committed band rows | None, band dir list) — migrating a
        pre-round-11 manifest (no "bands" key) by banding the whole
        committed reps log ONCE into an orphan-until-committed dir;
        from then on each batch appends only its own new reps' bands.

        The migration dir name is FIXED ("m0", not m{batch_id}): if
        the commit crashes and the stream redelivers under a different
        batch id, the retry overwrites the same dir instead of
        orphaning one per attempt — m{batch_id} could leak a dir that
        no manifest ever references and vacuum() cannot reclaim
        (ADVICE r11)."""
        from postgres_es_cdc_spark.llm.similarity import _emb_rep_bands

        if meta.get("banding", [self.n_bands, self.bits]) != \
                [self.n_bands, self.bits]:
            raise ValueError(
                f"index at {self.index_path} was built with banding "
                f"{meta['banding']}, sink configured "
                f"{[self.n_bands, self.bits]} — band keys would not "
                f"match; rebuild the index or match the geometry")
        dirs = meta.get("bands")
        if dirs is None:
            dirs = []
            if meta["reps"]:
                mig = os.path.join(self.index_path, "bands", "m0")
                (_emb_rep_bands(self._read_reps(spark, meta["reps"]),
                                self.n_bands, self.bits)
                 .coalesce(self.FOLD_FILES)
                 .write.mode("overwrite").parquet(mig))
                dirs = [mig]
        return self._read_log(spark, dirs), dirs

    # -- per-batch fold ------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from postgres_es_cdc_spark.llm.similarity import (
            _emb_collapsed, _emb_rep_bands, _probe_embedding_store,
            merge_embedding_deltas)

        spark = batch.sparkSession
        meta = self.meta()
        if batch_id <= meta["last_batch_id"]:
            return                      # committed replay: no-op
        bmem = _emb_collapsed(batch.select("id", "q")).localCheckpoint()
        store = self.index(spark, batch, meta)
        store_bands, band_dirs = self._band_log(spark, meta)
        pdir = os.path.join(self.out_path, f"b{batch_id}")
        # repartition(1), NOT coalesce(1): every delta is micro-batch-
        # sized — without it each dir lands ~32 shuffle-grain files and
        # probe scans pay O(dirs x 32) footers (the small-files note at
        # _fold). coalesce(1) would merge the FINAL stage to one task
        # and serialize the whole probe/merge compute (measured in the
        # round-11 tiered iterations); the extra one-file shuffle of a
        # micro-batch-sized delta is noise by comparison.
        probe = _probe_embedding_store(
            store, bmem, self.threshold, self.n_bands, self.bits,
            store_bands=store_bands,
            # r14 bucketed layout: the attach scan re-enumerates the
            # reps log pruned to the candidates' bucket dirs
            store_reps_loader=lambda bks:
            self._read_reps(spark, meta["reps"], bks))
        # store_bands prefilters the merge's vector-equality scan too
        # (round 12): the reps log's q column is only read for reps
        # whose band-0 key collides with the batch — the last measured
        # per-batch O(index·520B) term
        new_members, new_reps = merge_embedding_deltas(
            store, bmem, store_bands=store_bands,
            n_bands=self.n_bands, bits=self.bits)
        mdir = os.path.join(self.index_path, "members", f"b{batch_id}")
        rdir = os.path.join(self.index_path, "reps", f"b{batch_id}")
        bdir = os.path.join(self.index_path, "bands", f"b{batch_id}")
        # probe / member-delta / rep-delta writes are independent jobs
        # -> run them CONCURRENTLY (guide §2.6); everything still lands
        # before the single locked manifest commit below
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=3) as pool:
            fs = [pool.submit(lambda df=df, d=d: df.repartition(1)
                              .write.mode("overwrite").parquet(d))
                  for df, d in ((probe, pdir), (new_members, mdir),
                                (new_reps, rdir))]
            for f in fs:
                f.result()
        # band the WRITTEN rep rows (no recompute of the merge plan):
        # the band log stays row-for-row derived from the committed
        # reps log, the invariant tests pin
        (_emb_rep_bands(spark.read.parquet(rdir), self.n_bands, self.bits)
         .repartition(1).write.mode("overwrite").parquet(bdir))
        # merge-aware commit (round 12): a background compactor may
        # have folded store entries between this batch's meta read and
        # now — append the new dirs to the FRESHEST lists under the
        # lock, never write back the stale snapshot
        def commit(cur: dict) -> dict | None:
            if batch_id <= cur["last_batch_id"]:
                return None          # replay committed concurrently
            new = dict(cur)
            new.update({
                "out": cur["out"] + [pdir],
                "members": cur["members"] + [mdir],
                "reps": cur["reps"] + [rdir],
                "bands": (cur["bands"] if "bands" in cur
                          else band_dirs) + [bdir],
                "banding": [self.n_bands, self.bits],
                "last_batch_id": batch_id})
            return new

        new_meta = self._locked_commit(commit)
        if new_meta is not None:
            self._maybe_compact(spark, new_meta)


class SignatureIndexSink(_IndexSinkBase):
    """foreachBatch sink: continuous MinHash-LSH TEXT near-dup
    detection over a durable rep-grain signature index — the streaming
    wrapper of llm/dedup's signature_store family, completing the
    streaming triad (exact = KeyedDedupSink, embedding =
    VectorIndexSink, THIS = text LSH) on the shared _IndexSinkBase
    manifest protocol.

    Per micro-batch of (doc_id, sig0..7) rows (MinHash signatures,
    dedup._signatures_from_sh — text never reaches the sink): collapse
    identical signature vectors to a representative (_sig_collapsed),
    probe the committed index (md5 band keys over LSH_BANDS slot
    pairs, candidate member pairs via dedup._probe_signature_store —
    join-shaped, store band rows read from the PERSISTED band log),
    append candidate pairs to the output log and the batch's
    member/rep/band deltas to the index logs
    (dedup.merge_signature_deltas — disjoint appends by construction).

    The exactly-once law the tests pin: folding a corpus through ANY
    batch split starting from an empty index emits every candidate
    pair of the whole corpus exactly once (in the batch where its
    later member arrives) — the union over batches equals the one-shot
    docs_minhash_lsh_pairs recompute, the law
    llm/dedup.docs_streaming_lsh_fold exposes to the driver gate
    against DOCS_MINHASH_LSH_SQL.

    Scale shape: per-batch cost is O(batch·bands + matched
    DISTINCT-content buckets) — the probe streams the band log through
    a broadcast semi-join on the batch's touched band keys, so neither
    the member log nor the rep log is shuffled; band keys are md5 of
    signature pairs (128-bit), so there are NO accidental bucket
    collisions and candidate volume is exactly the true answer. On a
    cluster the band log is the frame you'd keep bucketed by
    band_key."""

    _MANIFEST = "_signature_manifest.json"

    def __init__(self, out_path: str, index_path: str,
                 compact_after: int | None = None,
                 cap: int | None = None,
                 major_after: int = 4, inline_major: bool = True):
        from postgres_es_cdc_spark.llm.dedup import PAIR_BUCKET_CAP
        super().__init__(out_path, index_path, compact_after,
                         major_after=major_after,
                         inline_major=inline_major)
        self.cap = PAIR_BUCKET_CAP if cap is None else cap

    def index(self, spark: SparkSession, batch: DataFrame,
              meta: dict | None = None) -> tuple:
        """The committed (members, reps) index; empty frames derived
        from the batch schema when no state is committed yet."""
        from postgres_es_cdc_spark.llm.dedup import _SIG_COLS
        meta = meta or self.meta()
        mem = self._read_log(spark, meta["members"])
        reps = self._read_reps(spark, meta["reps"])
        if mem is None:
            mem = batch.select("doc_id",
                               F.col("doc_id").alias("rep")).limit(0)
        if reps is None:
            reps = batch.select(F.col("doc_id").alias("rep"),
                                *_SIG_COLS).limit(0)
        return (mem.select("doc_id", "rep"),
                reps.select("rep", *_SIG_COLS))

    # -- per-batch fold ------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from postgres_es_cdc_spark.llm.dedup import (
            _SIG_COLS, _probe_signature_store, _rep_bands,
            _sig_collapsed, merge_signature_deltas)

        spark = batch.sparkSession
        meta = self.meta()
        if batch_id <= meta["last_batch_id"]:
            return                      # committed replay: no-op
        bmem = _sig_collapsed(
            batch.select("doc_id", *_SIG_COLS)).localCheckpoint()
        store = self.index(spark, batch, meta)
        store_bands = self._read_log(spark, meta["bands"])
        pdir = os.path.join(self.out_path, f"b{batch_id}")
        # repartition(1), NOT coalesce(1): micro-batch-sized deltas,
        # one file each without serializing the probe compute into a
        # single task (the small-files note at _fold)
        probe = _probe_signature_store(store, bmem, self.cap,
                                       store_bands=store_bands)
        new_members, new_reps = merge_signature_deltas(store, bmem)
        mdir = os.path.join(self.index_path, "members", f"b{batch_id}")
        rdir = os.path.join(self.index_path, "reps", f"b{batch_id}")
        bdir = os.path.join(self.index_path, "bands", f"b{batch_id}")
        # probe / member-delta / rep-delta writes are independent jobs
        # -> run them CONCURRENTLY (guide §2.6); everything still lands
        # before the single locked manifest commit below
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=3) as pool:
            fs = [pool.submit(lambda df=df, d=d: df.repartition(1)
                              .write.mode("overwrite").parquet(d))
                  for df, d in ((probe, pdir), (new_members, mdir),
                                (new_reps, rdir))]
            for f in fs:
                f.result()
        # band the WRITTEN rep rows: the band log stays row-for-row
        # derived from the committed reps log (VectorIndexSink's
        # round-11 invariant, same rationale)
        (_rep_bands(spark.read.parquet(rdir).select("rep", *_SIG_COLS))
         .repartition(1).write.mode("overwrite").parquet(bdir))
        # merge-aware commit — same rationale as VectorIndexSink's
        def commit(cur: dict) -> dict | None:
            if batch_id <= cur["last_batch_id"]:
                return None          # replay committed concurrently
            new = dict(cur)
            new.update({"out": cur["out"] + [pdir],
                        "members": cur["members"] + [mdir],
                        "reps": cur["reps"] + [rdir],
                        "bands": cur["bands"] + [bdir],
                        "last_batch_id": batch_id})
            return new

        new_meta = self._locked_commit(commit)
        if new_meta is not None:
            self._maybe_compact(spark, new_meta)


class ClusterLabelSink:
    """foreachBatch sink maintaining LIVE connected-component cluster
    labels over the candidate/verified-pair stream the index sinks
    emit — the round-13 completion of the crawl loop: the triad
    (KeyedDedupSink / VectorIndexSink / SignatureIndexSink) keeps the
    INDEXES current per trigger and appends each batch's pairs to its
    output log; this sink folds exactly those pair deltas into a
    durable (rep, label) store, so cluster membership — the thing a
    dedup ROUTING decision actually reads — is available continuously
    instead of via a from-scratch re-cluster per cycle.

    Per micro-batch of (a, b) pair rows (column names configurable —
    VectorIndexSink logs (id1, id2), SignatureIndexSink (doc_a,
    doc_b)): llm/dedup.merge_cluster_labels resolves the delta
    endpoints' current labels, contracts the delta to LABEL grain
    (≤ |delta| edges, guarded driver collect), min-wins union-finds
    it, and applies the remap as ONE broadcast join over the
    node-grain store — per-batch cost O(delta + narrow node-grain
    scan), never O(historical pairs), no iterative propagation.

    State commits through streaming/ivm._SnapshotState (versioned dir
    + atomic manifest repoint + batch-id replay gate): label
    maintenance is a WHOLE-STORE merge per batch — a remap may touch
    any row — so the single-snapshot discipline applies, and every
    batch's merge IS the compaction (the store never grows with
    history, only with distinct nodes; the AggSink-family shape, not
    the append-only-log shape of the index sinks). The replay gate
    matters doubly here: merge_cluster_labels is idempotent on label
    VALUES under redelivery, but new-endpoint rows would duplicate —
    the gate makes redelivery a strict no-op.

    Composition (the production wiring): tail an index sink's pair
    log with readStream.parquet(out_path) → foreachBatch(writer()),
    or call apply_batch inline after the index sink's own apply_batch
    inside one trigger (tools/ivm_soak.py --sink clustersink drives
    the latter). The fold law the driver gate pins
    (docs_streaming_cluster_fold): folding ANY batch partition of the
    pair set yields the one-shot recursive-CTE TRUE connected
    components — min-label merging is confluent, so batch boundaries
    change nothing.

    Reference parity note: the reference (es.go:95-108) has no notion
    of cluster state at all; this is [EXT] surface driven by SURVEY §2
    Table B's training-pipeline rows."""

    def __init__(self, path: str, a_col: str = "a", b_col: str = "b",
                 max_label_edges: int | None = None):
        from postgres_es_cdc_spark.llm.dedup import MAX_LABEL_EDGES
        from postgres_es_cdc_spark.streaming.ivm import _SnapshotState
        self.a_col = a_col
        self.b_col = b_col
        self.max_label_edges = (MAX_LABEL_EDGES if max_label_edges
                                is None else max_label_edges)
        self._st = _SnapshotState(path)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from postgres_es_cdc_spark.llm.dedup import merge_cluster_labels

        if self._st.applied(batch_id):
            return                      # committed replay: no-op
        delta = batch.select(
            F.col(self.a_col).cast("long").alias("a"),
            F.col(self.b_col).cast("long").alias("b"))
        labels = self._st.read(batch.sparkSession)
        new = merge_cluster_labels(labels, delta, self.max_label_edges)
        # the commit's parquet write is ALSO the per-batch lineage
        # barrier the incremental loop needs (the _build_cluster_labels
        # note) — no extra localCheckpoint
        self._st.commit(new.select("rep", "label"), batch_id)

    def labels(self, spark: SparkSession) -> DataFrame | None:
        """The committed node-grain (rep, label) store; None before
        the first commit."""
        return self._st.read(spark)

    def writer(self):
        return self.apply_batch


class ClusterKeeperSink:
    """foreachBatch sink maintaining, per live near-dup cluster, the
    member a pipeline should KEEP — the round-13 continuation of
    ClusterLabelSink: labels answer "which cluster is this doc in",
    keepers answer the question the dedup decision actually asks,
    "which doc survives" (highest quality, ties to min id —
    docs_cluster_representatives' convention, now maintained per
    trigger instead of recomputed per re-cluster cycle).

    Per micro-batch of (a, b) pair rows: one _cluster_label_step
    (label store fold + the {old->new} remap + first-seen endpoints),
    then merge_cluster_keepers folds the LABEL-grain keeper store —
    merged components' keepers max-combine under the surviving label,
    new endpoints seed candidates with their quality from the static
    ``quality`` lookup (id, quality) the sink is constructed with (a
    quality score is upstream-landed state in a real pipeline, exactly
    like the embeddings the vector sink probes).

    BOTH stores commit in ONE manifest os.replace (labels.v{n} +
    keepers.v{n} dirs, batch-id replay gate, superseded versions
    deleted after the repoint) — a crash between the two writes leaves
    the previous pair current, never a labels/keepers version skew;
    the _SnapshotState discipline widened to a two-frame transaction.
    Confluence (the driver-gate law, docs_streaming_cluster_keepers):
    any batch partition of the pair set yields the one-shot
    per-component argmax — min-label merge and quality argmax are both
    associative-commutative folds."""

    _MANIFEST = "_keeper_state.json"

    def __init__(self, path: str, quality: DataFrame,
                 a_col: str = "a", b_col: str = "b",
                 max_label_edges: int | None = None):
        from postgres_es_cdc_spark.llm.dedup import MAX_LABEL_EDGES
        self.path = path
        self.quality = quality.select(
            F.col(quality.columns[0]).alias("id"),
            F.col(quality.columns[1]).alias("quality"))
        self.a_col = a_col
        self.b_col = b_col
        self.max_label_edges = (MAX_LABEL_EDGES if max_label_edges
                                is None else max_label_edges)

    def _manifest_path(self) -> str:
        return os.path.join(self.path, self._MANIFEST)

    def meta(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"labels": None, "keepers": None, "quality": None,
                "last_batch_id": -1}

    def _read(self, spark: SparkSession, key: str) -> DataFrame | None:
        cur = self.meta()[key]
        return spark.read.parquet(cur) if cur else None

    def labels(self, spark: SparkSession) -> DataFrame | None:
        """The committed node-grain (rep, label) store."""
        return self._read(spark, "labels")

    def keepers(self, spark: SparkSession) -> DataFrame | None:
        """The committed label-grain (label, keep_id, keep_q) store."""
        return self._read(spark, "keepers")

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from postgres_es_cdc_spark.llm.dedup import (
            N_QUALITY_BUCKETS, _cluster_label_step, _quality_bucket,
            merge_cluster_keepers)

        spark = batch.sparkSession
        meta = self.meta()
        if batch_id <= meta["last_batch_id"]:
            return                      # committed replay: no-op
        # Quality store landed ONCE as a hash-bucketed parquet layout
        # (r14, guide §3/§6): each trigger's seeds join then reads only
        # the buckets its new endpoints hash into (dynamic partition
        # pruning on _qb) — per-trigger lookup I/O O(delta), where the
        # r13 checkpoint was rescanned O(corpus) per trigger. Landing
        # is crash-safe: the dir is only trusted once the manifest
        # commit below records it; a crash before that rewrites it.
        qdir = meta.get("quality")
        if qdir is None:
            qdir = os.path.join(self.path, "quality_store")
            (self.quality.withColumn("_qb", _quality_bucket("id"))
                 .repartition(N_QUALITY_BUCKETS, F.col("_qb"))
                 .write.mode("overwrite").partitionBy("_qb")
                 .parquet(qdir))
        qstore = spark.read.parquet(qdir)
        delta = batch.select(
            F.col(self.a_col).cast("long").alias("a"),
            F.col(self.b_col).cast("long").alias("b"))
        # Literal partition pruning: the batch's endpoint ids hash to a
        # bucket SUBSET (new endpoints ⊆ delta endpoints, so this can
        # never drop a row the seeds join needs); one tiny O(delta)
        # collect buys a quality scan restricted to touched buckets —
        # PartitionFilters carries the In(_qb, ...) literals, so the
        # untouched corpus partitions are never listed or read. On the
        # FIRST batch every endpoint is new (the whole key space is
        # touched), so the collect is skipped outright.
        if meta["labels"] is not None:
            bks = [r[0] for r in
                   (delta.select(F.col("a").alias("id"))
                         .unionByName(delta.select(F.col("b").alias("id")))
                         .select(_quality_bucket("id").alias("b"))
                         .distinct().collect())]
            if len(bks) < N_QUALITY_BUCKETS:
                qstore = qstore.filter(F.col("_qb").isin(bks))
        labels2, remap, new_rows = _cluster_label_step(
            self._read(spark, "labels"), delta, self.max_label_edges)
        keepers2 = merge_cluster_keepers(
            self._read(spark, "keepers"), remap, new_rows, qstore)
        ldir = os.path.join(self.path, f"labels.v{batch_id}")
        kdir = os.path.join(self.path, f"keepers.v{batch_id}")
        # both writes land BEFORE the single manifest repoint — the
        # parquet writes double as the per-batch lineage barrier; they
        # are independent jobs, so they run CONCURRENTLY (guide §2.6)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            fl = pool.submit(
                lambda: labels2.select("rep", "label")
                .write.mode("overwrite").parquet(ldir))
            fk = pool.submit(
                lambda: keepers2.select("label", "keep_id", "keep_q")
                .write.mode("overwrite").parquet(kdir))
            fl.result(), fk.result()
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"labels": ldir, "keepers": kdir, "quality": qdir,
                       "last_batch_id": batch_id}, f)
        os.replace(tmp, self._manifest_path())
        for old in (meta["labels"], meta["keepers"]):
            if old and old not in (ldir, kdir) and os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)

    def writer(self):
        return self.apply_batch
