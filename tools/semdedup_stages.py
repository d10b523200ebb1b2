"""Stage-level A/B of emb_semdedup_prune — the round-8 verdict's weak
item 2 ("semdedup residual curve unproven"): isolate, in ONE JVM,

  train   — k-means on the bounded sample (claimed O(sample·k·iters))
  assign  — routing-ladder cluster assignment (claimed N·3·k^(1/3))
  verify  — in-cluster GEMM pair verification (claimed O(N·C), linear:
            cluster size bounded by SEMDEDUP_CLUSTER_CAP in the MEAN;
            skew is the open question — p99 reported too)
  output  — prune flags join + noop write

so a super-linear total can be attributed to a stage instead of argued.
Also reports the realized cluster-size distribution (mean/p50/p99/max)
— whether the cap actually binds at this SF.

Usage: PYTHONPATH=. python tools/semdedup_stages.py [sf_dir ...]
Prints one JSON line per sf_dir (same JVM: ratios are box-noise-free).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(spark, sf_dir: str) -> dict:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.catalog import table
    from postgres_es_cdc_spark.llm import similarity as S

    out = {"sf_dir": sf_dir}
    t0 = time.time()
    cent = S._semdedup_centroids(spark, sf_dir, 3)
    carr = S._cent_arrays(cent)
    n = table(spark, sf_dir, "embeddings").count()
    k, _t = S._semdedup_params(n)
    k1, k2 = S._hier_levels(k)
    out["n"] = n
    out["k"] = k
    out["train_s"] = round(time.time() - t0, 2)

    c = S._q_corpus(spark, sf_dir).withColumn(
        "n2", S.dot_q(F.col("q"), F.col("q")))
    t0 = time.time()
    alla = (S._route_hier(c, carr, k1, k2)
            .select(F.col("id").alias("vec_id"), "cid")
            .localCheckpoint(eager=True))
    out["assign_s"] = round(time.time() - t0, 2)

    # realized cluster sizes: does the cap bind?
    sizes = (alla.groupBy("cid").agg(F.count(F.lit(1)).alias("sz"))
                 .agg(F.count(F.lit(1)).alias("n_clusters"),
                      F.mean("sz").alias("mean"),
                      F.expr("percentile(sz, 0.5)").alias("p50"),
                      F.expr("percentile(sz, 0.99)").alias("p99"),
                      F.max("sz").alias("max")).collect()[0])
    out["cluster_sizes"] = {
        "n_clusters": sizes["n_clusters"],
        "mean": round(float(sizes["mean"]), 1),
        "p50": float(sizes["p50"]), "p99": float(sizes["p99"]),
        "max": int(sizes["max"])}

    _prune_cluster = S._semdedup_prune_kernel(0.9)

    qa = (c.join(alla, c["id"] == alla["vec_id"])
           .select("cid", "id", "q", "n2"))
    t0 = time.time()
    pruned = (qa.groupBy("cid")
                .applyInPandas(_prune_cluster, "vec_id long")
                .localCheckpoint(eager=True))
    out["verify_s"] = round(time.time() - t0, 2)
    out["n_pruned"] = pruned.count()

    t0 = time.time()
    (alla.join(pruned.withColumn("_p", F.lit(True)), "vec_id", "left")
         .select(F.col("vec_id").alias("id"),
                 F.col("cid").alias("cluster"),
                 F.coalesce("_p", F.lit(False)).alias("pruned"))
         .write.format("noop").mode("overwrite").save())
    out["output_s"] = round(time.time() - t0, 2)
    out["total_s"] = round(out["train_s"] + out["assign_s"]
                           + out["verify_s"] + out["output_s"], 2)
    return out


def main() -> None:
    from postgres_es_cdc_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="semdedup_stages")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        run(spark, d)          # warm-up (JIT/codegen/footers)
        print(json.dumps(run(spark, d)), flush=True)


if __name__ == "__main__":
    main()
