"""Plan-shape regression guards: the scale properties PLANS.md pins,
asserted so a refactor cannot silently lose them."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_is_take_ordered_not_global_sort(spark, sf_dir):
    from postgres_es_cdc_spark.llm.sampling import docs_weighted_sample

    plan = _plan(docs_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # a global row_number window would appear as a single-partition sort
    assert "Exchange SinglePartition" not in plan.split(
        "TakeOrderedAndProject")[0]


def test_topk_per_group_pushes_rank_below_shuffle(spark, sf_dir):
    from postgres_es_cdc_spark.queries import REGISTRY

    plan = _plan(REGISTRY["topk_per_group"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_q3_broadcasts_dimension_joins(spark, sf_dir):
    from postgres_es_cdc_spark.queries import REGISTRY

    plan = _plan(REGISTRY["q3_shipping_priority"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q6_pushes_filters_to_scan(spark, sf_dir):
    from postgres_es_cdc_spark.queries import REGISTRY

    plan = _plan(REGISTRY["q6_revenue_forecast"].fn(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_aqe_splits_skewed_segment_join(spark, sf_dir):
    """SURVEY §4.2 claims AQE covers skew handling — prove it: force the
    segment-keyed join (5 keys carrying ~20% of the fact table each)
    into a sort-merge join with skew thresholds scaled to the test data,
    and assert OptimizeSkewedJoin actually split the oversized
    partitions (skew=true in the final adaptive plan)."""
    from postgres_es_cdc_spark.operators.analytics import (
        orders_segment_skew_join)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128b",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = orders_segment_skew_join(spark, sf_dir)
        rows = df.collect()                 # materialize -> final AQE plan
        assert len(rows) == 25              # 5 segments x 5 priorities
        plan = _plan(df)
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zipf_rank_has_no_single_partition_vocab_window(spark, sf_dir):
    """Round-5 fix guard: docs_zipf_slope's rank must come from the
    range-partitioned construction — the only SinglePartition window
    allowed is the P-row offsets frame, never a sort of the full term
    table. The plan must show a range exchange feeding a partitioned
    window."""
    from postgres_es_cdc_spark.llm.lm import docs_zipf_slope

    plan = _plan(docs_zipf_slope(spark, sf_dir))
    assert "rangepartitioning" in plan.lower()
    # The term-table row_number window must partition by pid — every
    # row_number windowspec in the plan carries the pid partition
    # column (an empty partition spec would be the global sort the fix
    # removed). The remaining SinglePartition exchanges are the P-row
    # offsets window and the 1-row regression fold, both data-size
    # independent.
    import re
    rn_specs = re.findall(r"row_number\(\) windowspecdefinition\(([^,]+),",
                          plan)
    assert rn_specs, plan
    assert all(s.strip().startswith("pid") for s in rn_specs), rn_specs


def test_pmi_topk_is_take_ordered(spark, sf_dir):
    """Round-5 fix guard: docs_pmi_collocations ranks only the
    TakeOrdered top rows, never the full collocation table."""
    from postgres_es_cdc_spark.llm.lm import docs_pmi_collocations

    plan = _plan(docs_pmi_collocations(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_semdedup_assign_is_arrow_kernel(spark, sf_dir):
    """Round-7 fix guard (node updated r13): emb_semdedup_prune's assign
    stage is the Arrow-batched numpy routing kernel (int64 GEMM — since
    r13 a mapInArrow whose matrix intake reshapes the Arrow values
    buffer directly) and its pair verify is the per-cluster GEMM
    (applyInPandas) — the expression/higher-order-function forms were
    interpreted (CodegenFallback) and measured 15.1s + 29M interpreted
    pair dots at sf3."""
    from postgres_es_cdc_spark.llm.similarity import (emb_hier_assign,
                                                      emb_semdedup_prune)

    # the shared route frame (emb_hier_assign returns it un-checkpointed;
    # inside emb_semdedup_prune it hides behind the eager checkpoint)
    assert "MapInArrow" in _plan(emb_hier_assign(spark, sf_dir))
    plan = _plan(emb_semdedup_prune(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan[:3000]


def test_semdedup_assign_is_two_level(spark, sf_dir):
    """Round-6 fix guard (shape updated in round 7): emb_semdedup_prune
    must assign through the shared two-level router — evidenced by the
    route producing the same cluster ids as emb_hier_assign for
    base-corpus vectors (they share the routing kernel and centroids),
    and by the routed-count column being cell-sized, not k-sized."""
    from postgres_es_cdc_spark.llm.similarity import (emb_hier_assign,
                                                      emb_semdedup_prune)

    sd = emb_semdedup_prune(spark, sf_dir)
    hier_rows = emb_hier_assign(spark, sf_dir).collect()
    hier = {r["vec_id"]: r["cid"] for r in hier_rows}
    # two-level: stage 2 scans only the super-cell's children (< k)
    k = len({r["cid"] for r in hier_rows})
    assert max(r["routed"] for r in hier_rows) < max(k, 9)

    sd_rows = {r["id"]: r["cluster"] for r in sd.collect()
               if r["id"] < 100000}          # base corpus (mutants excluded)
    assert sd_rows and all(hier[i] == c for i, c in sd_rows.items())


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Catalyst's runtime Bloom-filter join pruning — the 100 TB
    fact-scan reducer when the dim side is filtered but too big to
    broadcast: the fact side must gain a might_contain() filter fed by
    a Bloom aggregate subquery on the build side. Thresholds are scaled
    down so the tiny fixtures qualify; on a cluster the defaults fire
    for real dimension filters."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.catalog import table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, sf_dir, "lineitem")
        o = (table(spark, sf_dir, "orders")
             .filter(F.col("o_totalprice") > 400000)
             .select("o_orderkey"))
        plan = _plan(li.join(o, li.l_orderkey == o.o_orderkey))
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_qsketch_exact_companion_is_register_guided(spark, sf_dir):
    """Round-9 fix guard: events_quantile_gap_sketch's exact companion
    must select the rank through the register-guided broadcast join
    (only the hit bucket's rows sort, inside (type, percentile)
    groups) — the pre-guided form ran a full per-type sort in ONE
    window task per type and measured 63.5s at sf10. Evidence: a
    broadcast exchange feeds the gap-side join, and no window in the
    plan partitions by event_type ALONE (the full-sort shape)."""
    import re

    from postgres_es_cdc_spark.operators.analytics import (
        events_quantile_gap_sketch)

    plan = _plan(events_quantile_gap_sketch(spark, sf_dir))
    assert "BroadcastExchange" in plan, plan[:3000]
    # the full-sort shape was row_number over raw gaps partitioned by
    # event_type ALONE: windowspecdefinition(event_type#N, gap#M ASC...).
    # Guided, every gap-ordered window also partitions by p (tiny
    # per-(type, p) candidate sets); only the register fold (ordered by
    # bucket) may partition by event_type alone.
    bad = re.findall(
        r"windowspecdefinition\(event_type#\d+, gap#\d+L? ASC", plan)
    assert not bad, bad


def test_label_propagation_round_never_broadcasts_labels(spark, sf_dir):
    """Round-10 fix guard: docs_dedup_clusters OOM'd at sf10 when AQE
    broadcast the node-grain label table into the 123M-row edge join.
    _prop_round pins BOTH joins to shuffle_hash — the label table is
    node-grain (millions of rows at 100 TB), never broadcast material.
    Evidence: both propagation joins plan as ShuffledHashJoin; no
    BroadcastHashJoin and no SortMergeJoin anywhere in the round."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.llm.dedup import _prop_round

    pairs = spark.range(100).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
                  .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                            F.col("doc_a").alias("dst"))))
    labels = edges.select(F.col("src").alias("doc_id")).distinct() \
                  .withColumn("label", F.col("doc_id"))
    plan = _plan(_prop_round(edges, labels))
    assert plan.count("ShuffledHashJoin") == 2, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_near_dup_rate_source_joins_never_broadcast(spark, sf_dir):
    """Round-10 fix guard: docs_near_dup_rate_by_source OOM'd at sf10
    when the planner broadcast a side of the pairs×sources joins (the
    checkpointed 123M-pair frame misleads size estimation). Both source
    joins are pinned shuffle_hash — the source projection is docs-grain
    and the pair set clique²-unbounded; neither is broadcast material."""
    from postgres_es_cdc_spark.queries import REGISTRY

    plan = _plan(REGISTRY["docs_near_dup_rate_by_source"].fn(spark, sf_dir))
    assert plan.count("ShuffledHashJoin") >= 2, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]


def test_signature_probe_broadcasts_touched_buckets(spark):
    """Round-11 join-shape guard: _probe_signature_store must stream
    the store's band rows through a BroadcastHashJoin against the
    batch's touched (band_idx, band_key) set — the pre-round-11 shape
    unioned store+batch bands straight into the cap window (a full
    store-band Exchange per probe) and planned NO broadcast join."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.llm.dedup import (
        _SIG_COLS, _probe_signature_store)

    def frame(lo, n):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            *[(F.col("id") * 8 + j).alias(c)
              for j, c in enumerate(_SIG_COLS)],
            F.col("id").alias("rep"))

    smem = frame(0, 50)
    store = (smem.select("doc_id", "rep"), smem.select("rep", *_SIG_COLS))
    plan = _plan(_probe_signature_store(store, frame(1000, 5)))
    assert "BroadcastHashJoin" in plan, plan[:3000]
