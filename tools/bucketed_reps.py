"""Bucketed reps table — the 100 TB lookup shape, prototyped.

SCALE.md's round-12 residual note names the end state: at 100 TB the
reps log is a table BUCKETED by rep, so a k-candidate attach lookup
touches ≤ k buckets instead of scanning the index. Round 13 landed the
range-sorted fold layout (footer min/max pruning — layout_probe.py);
THIS tool prototypes the stronger directory-grain mechanism: the reps
frame written `partitionBy` a hash bucket of `rep`, probed with the
bucket predicate alongside the pushdown's `In(rep, …)` so Spark's
partition pruning drops whole directories BEFORE any footer is read.

Three layouts over the same hash-id reps frame, same candidate set:

- ``arrival``: one flat dir, files in arrival order — the pre-r13
  baseline; every file spans the whole key range, nothing prunes.
- ``sorted``: one flat dir, range-partitioned by rep (FOLD_SORT) —
  footer min/max prunes to ≤ k files for k candidates.
- ``bucketed``: `_bucket = pmod(xxhash64(rep), B)` partition dirs,
  rep-sorted within — partition pruning touches exactly the candidate
  buckets (≤ k dirs of B), independent of candidate SPREAD: unlike
  range layout, hash bucketing doesn't care whether candidates are
  contiguous, which is why it is the lookup-table end state.

Evidence reported per layout: files a pruning reader must touch
(footer walk for the flat layouts, directory arithmetic + listing for
the bucketed one), rows scanned, and the PartitionFilters line from
the Spark plan proving the bucket predicate prunes at the source
(not post-scan). Wall time is cache-hidden at local scale, as always.

Sink integration note (why this stays a prototype): the index sinks'
delta b-dirs are micro-batch-sized flat files; folding them into a
partitionBy layout adds a partition column to the snapshot schema
that the unfolded tail lacks, so the log reader would need per-dir
schema reconciliation — the clean cut is to adopt bucketing when the
index graduates from "delta log + snapshots" to a real table format
(the manifest already owns the commit protocol a table format needs).
The probe's isin is ALREADY the shape bucket pruning consumes, so
adoption costs the reader one derived-column predicate, nothing in
the algebra.

Usage: PYTHONPATH=. python tools/bucketed_reps.py [--reps 500000]
         [--buckets 64] [--files 64] [--cands 16]
Prints one JSON line.
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from layout_probe import PERM_A, PERM_P, _footer_stats, _touch  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=500_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--cands", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.session import get_spark
    spark = get_spark()

    # hash-shaped rep ids (arrival order decorrelated from id order —
    # layout_probe docstring) with the standard 64-dim int64 vectors
    reps = (spark.range(args.reps)
            .select(((F.col("id") * PERM_A) % PERM_P).alias("rep"))
            .select("rep", F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: F.xxhash64("rep", d) % F.lit(1000003))
                .alias("q")))
    cands = [(k * PERM_A) % PERM_P
             for k in range(0, args.reps, args.reps // args.cands)][
                 :args.cands]

    base = tempfile.mkdtemp(prefix="bucketed_reps_")
    out: dict = {"metric": "bucketed_reps_lookup", "reps": args.reps,
                 "buckets": args.buckets, "files": args.files,
                 "n_candidates": len(cands), "layouts": {}}
    try:
        pa = os.path.join(base, "arrival")
        ps = os.path.join(base, "sorted")
        pb = os.path.join(base, "bucketed")
        reps.repartition(args.files).write.parquet(pa)
        (reps.repartitionByRange(args.files, "rep")
             .sortWithinPartitions("rep").write.parquet(ps))
        (reps.withColumn("_bucket",
                         F.pmod(F.xxhash64("rep"), F.lit(args.buckets)))
             .repartition(args.buckets, "_bucket")
             .sortWithinPartitions("rep")
             .write.partitionBy("_bucket").parquet(pb))

        def timed_lookup(df):
            q = df.filter(F.col("rep").isin(cands))
            t0 = time.time()
            n = q.count()
            return n, round(time.time() - t0, 3)

        for name, path in (("arrival", pa), ("sorted", ps)):
            stats = _footer_stats([path], "rep")
            n, s = timed_lookup(spark.read.parquet(path))
            out["layouts"][name] = dict(_touch(stats, set(cands)),
                                        lookup_rows=n, lookup_s=s)

        bdf = spark.read.parquet(pb)
        cand_buckets = sorted({r[0] for r in
                               spark.createDataFrame(
                                   [(c,) for c in cands], "rep long")
                               .select(F.pmod(F.xxhash64("rep"),
                                              F.lit(args.buckets)))
                               .collect()})
        q = bdf.filter(F.col("_bucket").isin(cand_buckets)
                       & F.col("rep").isin(cands))
        plan = q._jdf.queryExecution().executedPlan().toString()
        pf = [ln.strip() for ln in plan.splitlines()
              if "PartitionFilters" in ln]
        t0 = time.time()
        n = q.count()
        s = round(time.time() - t0, 3)
        touched_dirs = [d for d in glob.glob(os.path.join(pb, "_bucket=*"))
                        if int(d.rsplit("=", 1)[1]) in cand_buckets]
        touched_files = sum(len(glob.glob(os.path.join(d, "*.parquet")))
                            for d in touched_dirs)
        all_files = len(glob.glob(os.path.join(pb, "_bucket=*",
                                               "*.parquet")))
        rows_in_touched = sum(
            r for _, _, _, _, r in _footer_stats(touched_dirs, "rep"))
        out["layouts"]["bucketed"] = {
            "files": f"{touched_files}/{all_files}",
            "dirs": f"{len(touched_dirs)}/{args.buckets}",
            "rows_scanned": rows_in_touched,
            "rows_total": args.reps,
            "scan_fraction": round(rows_in_touched / args.reps, 4),
            "lookup_rows": n, "lookup_s": s,
            "partition_filters_pushed": bool(pf) and "_bucket" in pf[0],
            "partition_filters": pf[:1],
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
