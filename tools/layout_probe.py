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
Two candidate regimes are reported:

- ``spread``: candidates drawn uniformly over the whole rep id space —
  the soak fixture's anti-localized worst case (one dup pool rep per
  batch stride). Range layout cannot beat candidate spread when there
  are more candidates than files; the honest number here is files
  touched ≤ n_candidates instead of ALWAYS all files.
- ``clustered``: candidates from a narrow recent-arrival window — the
  continuous-crawl common case (new batches mostly collide with recent
  content). This is where the layout pays: O(1) files touched.

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

    def batch_df(i: int):
        dup = spark.range(args.pool).select(F.col("id").alias("key")) \
            .select((F.lit(i) * args.rows + F.col("key")).alias("id"),
                    vec(F.col("key")).alias("q"))
        fresh = spark.range(args.rows - args.pool) \
            .select((F.lit(i) * args.rows + F.lit(args.pool)
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

    n_ids = args.batches * args.rows
    # spread regime: the dup pool's reps — first-arrival ids 16..31 plus
    # nothing else ever re-collides, so ALSO sample uniform ids across
    # the whole space (the anti-localized shape the sf soak fixture has)
    spread = set(range(0, n_ids, max(n_ids // args.cands, 1)))
    # clustered regime: a recent-arrival window (last batch's fresh ids)
    last0 = (args.batches - 1) * args.rows
    clustered = set(range(last0 + args.pool, last0 + args.pool
                          + args.cands))

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
                "spread_candidates": _touch(stats, spread),
                "clustered_candidates": _touch(stats, clustered),
            }
    finally:
        for b in bases:
            shutil.rmtree(b, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
