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
