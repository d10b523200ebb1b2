"""Multimodal column plumbing: binary payloads + metadata through
mapInPandas (decode stubbed — see llm/multimodal.py docstring)."""

from __future__ import annotations

import pytest

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.llm.multimodal import (
    assets_from_documents, decode_stub, extract_features, fake_decode,
    modality_stats)


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return assets_from_documents(table(spark, sf_dir, "documents"))


def test_asset_schema_and_bytes(assets):
    row = assets.filter("asset_id = 0").collect()[0]
    assert row.modality in ("image", "audio", "video")
    assert isinstance(row.payload, bytearray | bytes)
    assert row.n_bytes == len(row.payload)


def test_decode_stub_is_explicitly_unimplemented():
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "image")


def test_fake_decode_deterministic():
    assert fake_decode(b"hello", "image") == fake_decode(b"hello", "audio")
    assert fake_decode(b"hello", "image") != fake_decode(b"hellp", "image")
    assert len(fake_decode(b"", "image")) == 8


def test_extract_features_batch_shape(assets, spark):
    feats = extract_features(assets.limit(50))
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.feature) == 8
        assert all(0.0 <= v < 1.0 for v in r.feature)
    # determinism across runs
    again = {r.asset_id: r.feature for r in extract_features(assets.limit(50)).collect()}
    assert all(again[r.asset_id] == r.feature for r in rows)


def test_modality_stats_prunes_payload(assets):
    stats = modality_stats(assets)
    got = {r.modality: r.n_assets for r in stats.collect()}
    assert sum(got.values()) == assets.count()
    # payload column must not appear in the optimized scan schema
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_frame_dedup_mutants_share_frames(spark, sf_dir):
    from postgres_es_cdc_spark.llm.multimodal import multimodal_frame_dedup

    rows = {r.asset_id: r
            for r in multimodal_frame_dedup(spark, sf_dir).collect()}
    mutants = [r for i, r in rows.items() if i >= 1_000_000]
    assert mutants
    for m in mutants:
        # mutant payload is a byte-prefix of the original, so every kept
        # frame except possibly the final (truncated) one also exists in
        # the original asset
        assert m.n_dup_frames >= m.n_frames - 1
        assert 0.0 <= m.dup_frame_ratio <= 1.0


def test_frame_dedup_byte_exact_for_non_ascii(spark, tmp_path):
    """The frame fingerprint is md5(hex(bytes)) on both engines, so the
    Spark/DuckDB parity contract holds for multibyte payloads too (the
    oracle slices the hex string at 2 chars per byte — byte windows,
    not character windows)."""
    import duckdb
    import pandas as pd

    from postgres_es_cdc_spark.llm.multimodal import (
        _frame_dedup_sql, multimodal_frame_dedup)

    sf = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["héllo wörld ünicode text ümlauts éverywhere in this döc",
                 "ascii only document with plain words here",
                 "日本語のテキストとemoji混在のドキュメント test"],
    })
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")
    got = sorted(tuple(r) for r in multimodal_frame_dedup(spark, sf).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet/*.parquet')")
    want = sorted(tuple(r) for r in con.execute(_frame_dedup_sql()).fetchall())
    assert got == want
