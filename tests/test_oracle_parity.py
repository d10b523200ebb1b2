"""Every registry query vs its DuckDB oracle at sf0.001 — the local
replica of the driver's t2 gate (exact values, no tolerance)."""

from __future__ import annotations

import pytest

from postgres_es_cdc_spark.queries import REGISTRY
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check (approximate sketches)
        return
    result = compare(name, df, duck, spec.oracle)
    assert result.ok, result.message()
