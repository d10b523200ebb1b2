"""Domain-mixture weights and event-transition matrix semantics."""

from __future__ import annotations


def test_domain_mixture_weights_normalize(spark, sf_dir):
    from postgres_es_cdc_spark.llm.sampling import docs_domain_mixture

    rows = docs_domain_mixture(spark, sf_dir).collect()
    assert rows
    total_w = sum(r.mix_weight for r in rows)
    assert abs(total_w - 1.0) < 1e-9
    tokens = {r.source: r.n_tokens for r in rows}
    # sqrt temperature: smaller domains get oversampled relative to
    # their natural token share, larger ones undersampled.
    small = min(tokens, key=tokens.get)
    big = max(tokens, key=tokens.get)
    by_src = {r.source: r for r in rows}
    if tokens[small] < tokens[big]:
        assert by_src[small].oversample_factor > by_src[big].oversample_factor


def test_event_transitions_are_conditional_probabilities(spark, sf_dir):
    from postgres_es_cdc_spark.operators.analytics import (
        events_type_transitions)

    rows = events_type_transitions(spark, sf_dir).collect()
    assert rows
    by_prev: dict = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(x.p_next for x in rs) - 1.0) < 1e-9
        total = sum(x.n for x in rs)
        for x in rs:
            assert abs(x.p_next - x.n / total) < 1e-12


def test_bigram_lm_scores_are_plausible_nll(spark, sf_dir):
    from postgres_es_cdc_spark.llm.lm import docs_bigram_lm_score

    rows = docs_bigram_lm_score(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        # -ln P is positive and bounded by ln(c1_max + V) ~ ln(corpus)
        assert 0.0 < r.avg_nll < 20.0
        assert r.n_bigrams >= 1
    # determinism
    again = {r.doc_id: r.avg_nll
             for r in docs_bigram_lm_score(spark, sf_dir).collect()}
    assert again == {r.doc_id: r.avg_nll for r in rows}


def test_weighted_sample_prefers_heavier_docs(spark, sf_dir):
    """Efraimidis-Spirakis: inclusion probability rises with weight —
    the sampled docs' mean n_chars should exceed the corpus mean, and
    the sample must be deterministic."""
    from postgres_es_cdc_spark.llm.sampling import (
        WEIGHTED_SAMPLE_K, docs_weighted_sample)

    rows = docs_weighted_sample(spark, sf_dir).collect()
    assert len(rows) == WEIGHTED_SAMPLE_K
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, WEIGHTED_SAMPLE_K + 1))
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mean_chars = corpus.agg({"n_chars": "avg"}).collect()[0][0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > mean_chars * 0.95
    again = {(r.doc_id, r.rank)
             for r in docs_weighted_sample(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.rank) for r in rows}


def test_corpus_governance_report_internally_consistent(spark, sf_dir):
    from postgres_es_cdc_spark.llm.quality import corpus_governance_report

    r = corpus_governance_report(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert row.n_docs == n_docs
    assert row.n_tokens > row.n_docs
    assert 0 < row.vocab_size <= row.n_tokens
    assert abs(row.avg_doc_tokens - row.n_tokens / row.n_docs) < 1e-9
    assert 0.0 <= row.mean_quality <= 1.0
    assert 0.0 <= row.share_hi_quality <= 1.0
    assert 0.0 <= row.gopher_keep_rate <= 1.0
    assert row.n_exact_dup_docs >= 0


def test_dau_stickiness_bounds(spark, sf_dir):
    from postgres_es_cdc_spark.operators.analytics import (
        events_dau_stickiness)

    rows = events_dau_stickiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0


def test_interpurchase_gaps_consistent(spark, sf_dir):
    from postgres_es_cdc_spark.operators.analytics import (
        orders_interpurchase_stats)

    rows = orders_interpurchase_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 1
        assert 0 <= r.max_gap_days <= r.total_gap_days
        assert abs(r.avg_gap_days - r.total_gap_days / r.n_gaps) < 1e-9


def test_langid_confusion_rows_sum_to_one(spark, sf_dir):
    from postgres_es_cdc_spark.llm.text import docs_langid_confusion

    rows = docs_langid_confusion(spark, sf_dir).collect()
    assert rows
    by_true: dict = {}
    for r in rows:
        by_true.setdefault(r.lang, []).append(r)
    for lang, rs in by_true.items():
        assert abs(sum(x.row_share for x in rs) - 1.0) < 1e-9


def test_supplier_lead_time_bounds(spark, sf_dir):
    from postgres_es_cdc_spark.operators.analytics import (
        supplier_lead_time_stats)

    rows = supplier_lead_time_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_lines >= 1
        assert r.avg_lead_days <= r.max_lead_days
        assert 0.0 <= r.share_within_30d <= 1.0


def test_dsir_weights_separate_target_from_rest(spark, sf_dir):
    """DSIR sanity: documents in the target slice (lang='en') must
    average a HIGHER importance log-weight than non-target docs — the
    whole point of the tilt. (Values themselves are oracle-checked;
    this pins the direction.)"""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.catalog import table
    from postgres_es_cdc_spark.llm.sampling import docs_dsir_weights

    w = docs_dsir_weights(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = w.join(d, "doc_id")
    rows = (j.groupBy((F.col("lang") == "en").alias("is_target"))
             .agg(F.avg("log_weight").alias("avg_w")).collect())
    avg = {r.is_target: r.avg_w for r in rows}
    assert set(avg) == {True, False}
    assert avg[True] > avg[False]


def test_anomaly_zscore_baseline_is_centered(spark, sf_dir):
    """Within each (dow, hour) baseline group the z-scores must average
    ~0 (the group's own mean is the baseline) and nothing may be NaN."""
    import math

    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.operators.analytics import (
        events_anomaly_zscore)

    z = events_anomaly_zscore(spark, sf_dir)
    rows = (z.filter(F.col("zscore").isNotNull())
             .groupBy("dow", "hour")
             .agg(F.avg("zscore").alias("m"), F.count("*").alias("n"))
             .collect())
    assert rows
    for r in rows:
        assert not math.isnan(r.m)
        assert abs(r.m) < 1e-9, (r.dow, r.hour, r.m)
