"""Skew/bucketing utilities and multimodal transforms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.llm.multimodal import (
    assets_from_documents, fake_frame_sample, fake_resize, frame_sample_stub,
    resize_stub, transform_assets)
from postgres_es_cdc_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_mktsegment")
    salted = salted_join(o, c, "o_custkey", n_salts=4).select(
        "o_orderkey", "c_mktsegment")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    plain_cnt = c.join(o, "c_custkey", "left").count()
    salted_cnt = salted_join(c, o, "c_custkey", n_salts=4, how="left").count()
    assert plain_cnt == salted_cnt


def test_salted_join_rejects_other_join_types(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    with pytest.raises(ValueError):
        salted_join(c, c, "c_custkey", how="full")


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key sort-merge-join with NO
    Exchange — the pre-shuffled co-located join layout."""
    from postgres_es_cdc_spark.operators.skew import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
            "orders_bucketed", "o_custkey", n_buckets=8)
        write_bucketed(
            table(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
            "customer_bucketed", "o_custkey", n_buckets=8)
        joined = spark.table("orders_bucketed").join(
            spark.table("customer_bucketed"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == table(spark, sf_dir, "orders").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_resize_and_frame_sample_contracts():
    assert len(fake_resize(b"abc", 4, 4)) == 16
    assert fake_resize(b"", 2, 2) == bytes(4)
    frames = fake_frame_sample(b"x" * 640, every_n=2, frame_size=64)
    assert len(frames) == 5  # 10 frames, every 2nd
    with pytest.raises(NotImplementedError):
        resize_stub(b"x", 2, 2)
    with pytest.raises(NotImplementedError):
        frame_sample_stub(b"x", 2)


def test_transform_assets_routes_by_modality(spark, sf_dir):
    assets = assets_from_documents(table(spark, sf_dir, "documents")).limit(60)
    out = transform_assets(assets, width=8, height=8, every_n=4).collect()
    assert len(out) == 60
    for r in out:
        if r.modality == "image":
            assert r.out_bytes == 64 and r.n_frames == 1
        elif r.modality == "video":
            assert r.n_frames >= 1
        else:
            assert r.n_frames == 0


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """A selective dim-side filter must inject a runtime bloom filter
    probing the fact scan (shuffle-join row pruning), without changing
    results."""
    from postgres_es_cdc_spark.operators.skew import (
        enable_runtime_bloom_filters)

    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_orderkey"))
    j = l.join(o, l.l_orderkey == o.o_orderkey)

    old = {k: spark.conf.get(k, None) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")}
    try:
        plain = j.count()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        enable_runtime_bloom_filters(spark)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, plan
        assert j.count() == plain
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_make_scale_salt_doc_tokens_holds_duplication_rate(tmp_path):
    """make_scale --salt-doc-tokens (round 9): every replica's document
    text becomes globally unique (per-token replica suffix), so the
    corpus duplication RATE stays constant as size grows — the fixture
    that separates output-growth effects from plan defects for the
    span/dedup scale curves. Checks: texts globally distinct, per-copy
    token structure preserved (same token count as the base), id
    offsets still applied."""
    import subprocess
    import sys

    import duckdb

    dst = str(tmp_path / "salted")
    subprocess.run(
        [sys.executable, "tools/make_scale.py", "--mult", "3",
         "--src", "/root/testdata/sf0.001", "--dst", dst,
         "--salt-doc-tokens"],
        check=True, cwd="/root/repo", capture_output=True)
    con = duckdb.connect()
    n_rows, n_texts = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT text) "
        f"FROM read_parquet('{dst}/documents.parquet')").fetchone()
    assert n_rows == 3 * con.execute(
        "SELECT COUNT(*) FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')").fetchone()[0]
    assert n_texts == n_rows          # globally unique replica texts
    # token structure: same whitespace-token count as the base doc
    base_tokens, salted_tokens = con.execute(f"""
        SELECT len(string_split(b.text, ' ')),
               len(string_split(s.text, ' '))
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet') b
        JOIN read_parquet('{dst}/documents.parquet') s
          ON s.doc_id = b.doc_id
        LIMIT 1""").fetchone()
    assert base_tokens == salted_tokens
