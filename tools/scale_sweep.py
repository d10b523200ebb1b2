"""Scale smoke test: run the most expensive headline queries at a
replicated larger SF (see tools/make_scale.py) and report wall-time
scaling vs an sf0.1 bench artifact — the "would this plan survive a
10x/100x scale-up" check, executed instead of argued.

Each query gets one warm-up execution (JIT/codegen) and one measured
execution to a noop sink, same discipline as bench.py. Also prints the
dedup cap/overflow report so silent-cap hygiene is checked at the
bigger scale, where replication makes every duplicate cluster a real
10-member clique.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_sweep.py \
          [--sf-dir /root/repo/.scale/sf1] [--baseline /tmp/bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_es_cdc_spark.queries import REGISTRY  # noqa: E402
from postgres_es_cdc_spark.session import get_spark  # noqa: E402

# The expensive tail of the bench set plus the scale-sensitive dedup/
# rank/iteration paths.
SWEEP = [
    "emb_semdedup_prune",
    "cdc_pgoutput_roundtrip",
    "cdc_apply_changes_typed",
    "graph_connected_components",
    "emb_label_knn_accuracy",
    "docs_langid_confusion",
    "cdc_apply_changes",
    "docs_pmi_collocations",
    "docs_bigram_lm_score",
    "docs_zipf_slope",
    "lineitem_discount_band_revenue",
    "multimodal_embed_topk",
    "having_big_orders",
    "q5_region_revenue",
    "graph_bfs_distances",
    "q1_pricing_summary",
    "docs_exact_dedup",
    "docs_minhash_lsh_pairs",
    "docs_incremental_lsh_pairs",
    "dedup_bucket_overflow_report",
    "docs_repetition_report",
    "docs_dsir_weights",
    "orders_basket_affinity",
    "emb_matryoshka_recall",
    "emb_hier_assign",
    "emb_ivf_recall",
    "graph_kcore_peel",
    "emb_quantizer_balance",
    "docs_quality_filter_funnel",
    "docs_perplexity_filter_report",
    "docs_near_dup_rate_by_source",
    "part_supplier_hhi",
    # round-5 additions not yet swept (VERDICT r5 item 5)
    "events_path_mining",
    "events_anomaly_zscore",
    "ivm_topk_orders_by_segment",
    "docs_ngram_coverage",
    # round-6 additions
    "graph_kcore_fixpoint",
    "orders_basket_overflow_report",
    "ivm_watermark_rollup",
    "ivm_watermark_late_report",
    "part_name_fuzzy_pairs",
    "docs_bpe_pair_stats",
    "graph_common_neighbors_topk",
    "cdc_schema_evolution_fold",
    "ivm_session_rollup",
    "multimodal_audio_energy",
    "events_markov_stationary",
    "emb_pca_top_component",
    "cdc_truncate_restart_fold",
    "docs_lsh_recall_curve",
    "events_type_share_drift",
    "emb_dim_variance_report",
    # round-7 additions
    "docs_bpe_merges",
    "docs_bpe_encode",
    "docs_leakage_safe_splits",
    "emb_binary_quantize_topk",
    "graph_clustering_coefficient",
    "ivm_join_view_rollup",
    "multimodal_video_scene_cuts",
    "docs_training_shards",
    "docs_winnowing_overlap",
    "events_hll_distinct_users",
    # round-8 additions
    "graph_triangle_estimate",
    "events_quantile_gap_sketch",
    "events_cms_heavy_hitters",
    "events_hll_type_overlap",
    "ivm_qsketch_rollup",
    "docs_duplicate_span_removal",
    "docs_incremental_winnow_overlap",
    # round-9 additions
    "ivm_join_view_compacted_rollup",
    "graph_local_clustering_estimate",
    # round-10 additions
    "docs_incremental_lsh_multibatch",
    "docs_incremental_exact_dedup",
    "docs_incremental_simhash_pairs",
    "emb_incremental_near_dup_pairs",
    "emb_streaming_near_dup_fold",
    "docs_sequence_packing",
    "docs_packing_efficiency",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scale/sf1")
    ap.add_argument("--baseline", default=None,
                    help="bench.py JSON at sf0.1 for ratio reporting")
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset (isolated reruns: "
                         "in-sweep neighbors cause 3x GC spikes, so judge "
                         "per-query numbers from isolated processes)")
    args = ap.parse_args()
    sweep = ([q for q in args.only.split(",") if q] if args.only
             else SWEEP)

    base = {}
    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f).get("queries", {})

    spark = get_spark(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        # time fn() + write, same clock as bench.py: some queries do
        # eager driver-side work inside fn (sink-driven IVM rows), which
        # a write-only timer would miss entirely
        t0 = time.time()
        df = REGISTRY[name].fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results = {}
    for name in sweep:
        try:
            run(name)  # warm-up: JIT + codegen + parquet footers
            sec = run(name)
            ratio = (sec / base[name]) if base.get(name) else None
            results[name] = {"sec": round(sec, 3),
                             "vs_sf0.1": round(ratio, 2) if ratio else None}
            print(f"{name}: {sec:.2f}s"
                  + (f"  ({ratio:.1f}x sf0.1)" if ratio else ""), flush=True)
        except Exception as exc:  # report, keep sweeping
            results[name] = {"error": str(exc)[:300]}
            print(f"{name}: ERROR {exc}", flush=True)

    print("--- dedup cap report at scale ---", flush=True)
    for row in (REGISTRY["dedup_bucket_overflow_report"]
                .fn(spark, args.sf_dir).collect()):
        print(row, flush=True)

    print("SCALE_JSON:: " + json.dumps(
        {"sf_dir": args.sf_dir, "queries": results}), flush=True)


if __name__ == "__main__":
    main()
