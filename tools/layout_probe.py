"""Measure what the round-13 clustered fold layout actually prunes.

The attach pushdown (round 12) turns the probe/merge vector scans into
``reps.filter(rep.isin(candidates))`` — an In predicate that reaches the
parquet scan. Whether that predicate SKIPS I/O is a pure LAYOUT
question: a fold snapshot written in arrival order spreads every rep
range across every file (footer min/max ≈ the whole key span, nothing
prunable), while the round-13 ``FOLD_SORT`` layout range-partitions the
reps log by ``rep`` so each file/row group covers a disjoint range and
the footer check drops it when no candidate falls inside.

This tool builds the SAME vector index twice — once with FOLD_SORT
disabled (arrival order, the pre-round-13 layout) and once with it on —
then, for a realistic probe-batch candidate set, walks the reps-store
parquet footers (pyarrow, engine-independent) and counts how many
files / row groups / data rows a min-max-honoring reader must touch.

Fixture ids are a PERMUTED bijection of the arrival sequence
(id' = a·seq mod P, P prime) — the 100 TB shape, where doc ids are
content-hash-derived and thus decorrelated from arrival order. (The
first draft used seq ids directly and "arrival order" came out
accidentally range-clustered: a bag-union fold preserves input-file
order, and monotone ids make every arrival-ordered file a contiguous
id range. Hash ids kill that accident, which is exactly why the
explicit sort is needed.) Two candidate regimes:

- ``arrival_window``: candidates = one mid-horizon batch's ids — the
  continuous-crawl common case (a probe mostly collides with content
  that arrived together). Under hash ids these are SPREAD in id space:
  the arrival layout must touch every file (each spans the whole id
  range), the sorted layout touches ≤ n_candidates files.
- ``id_range``: candidates contiguous in id space — the best case for
  the sorted layout (O(1) files), included to bound the mechanism.

Timing is NOT the headline here (at local scale the page cache hides
skipped I/O); the footer walk is the deterministic evidence, the same
arithmetic a 1000-executor scan driver runs. Prints one JSON line.

Usage: PYTHONPATH=. python tools/layout_probe.py [--batches 40]
         [--rows 2000] [--pool 16] [--fold-files 64] [--cands 16]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PERM_P = 1_000_003          # prime > any fixture id space
PERM_A = 700_001            # multiplier, coprime with PERM_P


def _perm_py(seq: int) -> int:
    return (seq * PERM_A) % PERM_P


def _footer_stats(dirs: list, col: str) -> list:
    """[(path, rg_index, min, max, rows)] for every row group of every
    parquet data file under the given dirs."""
    import pyarrow.parquet as pq

    out = []
    for d in dirs:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name
                     for i in range(md.num_columns)]
            ci = names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                out.append((f, g, st.min, st.max,
                            md.row_group(g).num_rows))
    return out


def _touch(stats: list, cands: set) -> dict:
    """Files / row groups / rows a min-max reader must touch for an
    In(col, cands) predicate, given footer stats."""
    srt = sorted(cands)
    touched_files, touched_groups, touched_rows = set(), 0, 0
    all_files = {f for f, *_ in stats}
    total_rows = sum(r for *_, r in stats)
    for f, g, lo, hi, rows in stats:
        if any(lo <= c <= hi for c in srt):
            touched_files.add(f)
            touched_groups += 1
            touched_rows += rows
    return {"files": f"{len(touched_files)}/{len(all_files)}",
            "row_groups": f"{touched_groups}/{len(stats)}",
            "rows_scanned": touched_rows, "rows_total": total_rows,
            "scan_fraction": round(touched_rows / max(total_rows, 1), 4)}


def _build(spark, layout_on: bool, args) -> tuple:
    """Drive the vector sink to a fully-folded index; returns
    (reps snapshot dirs, all committed rep ids, probe seconds)."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.streaming.dedup import VectorIndexSink

    class ArrivalOrder(VectorIndexSink):
        FOLD_SORT: dict = {}

    cls = VectorIndexSink if layout_on else ArrivalOrder
    base = tempfile.mkdtemp(prefix=f"layout_{int(layout_on)}_")
    sink = cls(out_path=os.path.join(base, "pairs"),
               index_path=os.path.join(base, "index"),
               compact_after=8)
    sink.FOLD_FILES = args.fold_files

    def vec(key):
        return F.transform(F.sequence(F.lit(1), F.lit(64)),
                           lambda d: F.xxhash64(key, d) % F.lit(1000003))

    def perm(seq):
        # content-hash-shaped ids: bijective over [0, P) for prime P,
        # decorrelating id order from arrival order (module docstring)
        return (seq * F.lit(PERM_A)) % F.lit(PERM_P)

    def batch_df(i: int):
        dup = spark.range(args.pool).select(F.col("id").alias("key")) \
            .select(perm(F.lit(i) * args.rows + F.col("key"))
                    .alias("id"),
                    vec(F.col("key")).alias("q"))
        fresh = spark.range(args.rows - args.pool) \
            .select(perm(F.lit(i) * args.rows + F.lit(args.pool)
                         + F.col("id")).alias("id"),
                    vec(F.lit(i) * args.rows + F.lit(args.pool)
                        + F.col("id")).alias("q"))
        return dup.unionByName(fresh)

    for i in range(args.batches):
        sink.apply_batch(batch_df(i).localCheckpoint(), i)
    # force the major fold so the measured snapshot carries the layout
    sink.run_maintenance(spark, grace_s=0.0, pending_grace_s=0.0)
    meta = sink.meta()
    t0 = time.time()
    sink.apply_batch(batch_df(args.batches).localCheckpoint(),
                     args.batches)
    probe_s = round(time.time() - t0, 3)
    return base, meta["reps"], probe_s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--fold-files", type=int, default=64)
    ap.add_argument("--cands", type=int, default=16)
    args = ap.parse_args()

    from postgres_es_cdc_spark.session import get_spark
    spark = get_spark()

    # arrival-window regime: fresh reps of a MID-horizon batch (inside
    # the folded snapshot, not the unfolded b-dir tail) — spread in id
    # space because ids are hash-permuted
    mid0 = (args.batches // 2) * args.rows
    arrival_window = {_perm_py(mid0 + args.pool + k)
                      for k in range(args.cands)}
    # id-range regime: candidates contiguous in PERMUTED id space —
    # take the id-space neighborhood around one known rep id
    anchor = _perm_py(mid0 + args.pool)
    id_range = set(range(anchor, anchor + args.cands * 7))

    out: dict = {"metric": "fold_layout_pruning",
                 "fold_files": args.fold_files,
                 "index_reps": None, "layouts": {}}
    bases = []
    try:
        for layout_on in (False, True):
            base, rep_dirs, probe_s = _build(spark, layout_on, args)
            bases.append(base)
            snaps = [d for d in rep_dirs
                     if os.path.basename(d).startswith("c")]
            stats = _footer_stats(snaps, "rep")
            out["index_reps"] = sum(r for *_, r in stats)
            out["layouts"]["sorted" if layout_on else "arrival"] = {
                "probe_batch_s": probe_s,
                "snapshot_dirs": len(snaps),
                "arrival_window_candidates": _touch(stats,
                                                    arrival_window),
                "id_range_candidates": _touch(stats, id_range),
            }
    finally:
        for b in bases:
            shutil.rmtree(b, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
