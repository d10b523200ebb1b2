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
