"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"id", "custkey", "status", "totalprice", "priority"}


def test_queries_and_oracles_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 40
    assert set(o).issubset(set(q))
    for name, fn in q.items():
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_rotation_prefers_unverified_queries():
    """The evaluation-window rotation: hash-green queries from prior
    CORRECTNESS artifacts move behind unverified ones, identity when no
    artifacts exist."""
    import json
    import os
    import tempfile

    from postgres_es_cdc_spark.queries import REGISTRY, rotate_by_correctness

    with tempfile.TemporaryDirectory() as d:
        # no artifacts -> identity
        assert list(rotate_by_correctness(dict(REGISTRY), d)) == list(REGISTRY)
        some = list(REGISTRY)[0]
        with open(os.path.join(d, "CORRECTNESS_r09.json"), "w") as f:
            json.dump({some: {"hash_match": True},
                       "not_a_query": {"hash_match": True},
                       "failed_one": {"hash_match": False}}, f)
        rotated = list(rotate_by_correctness(dict(REGISTRY), d))
        assert rotated[-1] == some
        assert len(rotated) == len(REGISTRY)
        assert set(rotated) == set(REGISTRY)
