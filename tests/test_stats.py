"""Statistical aggregates: sketch accuracy bounds and cross-checks the
rows-only driver gate can't cover (exact parity for the other stats
queries rides tests/test_oracle_parity.py)."""

from __future__ import annotations

from postgres_es_cdc_spark.operators.stats import (
    agg_approx_percentile, agg_stats_moments)


def test_approx_percentile_within_sketch_bound(spark, duck, sf_dir):
    """The query now carries its own accuracy assertion (the sketch must
    land inside the exact p +/- 0.02 order-statistic bracket); check the
    booleans hold and the exact companions match DuckDB."""
    approx = {r["priority"]: r for r in agg_approx_percentile(spark, sf_dir).collect()}
    exact = duck.execute("""
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n,
               quantile_disc(o_totalprice, 0.5) AS p50
        FROM orders GROUP BY o_orderpriority
    """).fetchall()
    assert len(approx) == len(exact)
    for priority, n, p50 in exact:
        row = approx[priority]
        assert row["n_orders"] == n
        assert row["exact_median_price"] == p50
        assert row["median_within_2pp"] is True
        assert row["p95_within_2pp"] is True


def test_moments_match_numpy(spark, sf_dir):
    """Independent re-derivation: the exact-sufficient-statistics moments
    equal numpy's float results to ~1e-12 relative (numpy is the
    third-party referee; the DuckDB oracle shares our formula)."""
    import numpy as np

    rows = {r["returnflag"]: r for r in agg_stats_moments(spark, sf_dir).collect()}
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity", "l_linenumber"])
    flags = np.asarray(t["l_returnflag"])
    qty = np.asarray(t["l_quantity"], dtype=np.float64)
    line = np.asarray(t["l_linenumber"], dtype=np.float64)
    for flag, row in rows.items():
        m = flags == flag
        x, y = qty[m], line[m]
        assert row["n"] == int(m.sum())
        np.testing.assert_allclose(row["mean_qty"], x.mean(), rtol=1e-12)
        np.testing.assert_allclose(row["var_samp_qty"], x.var(ddof=1), rtol=1e-9)
        np.testing.assert_allclose(row["stddev_samp_qty"], x.std(ddof=1), rtol=1e-9)
        np.testing.assert_allclose(row["corr_qty_line"],
                                   np.corrcoef(x, y)[0, 1], rtol=1e-9)
        assert row["all_positive"] and row["min_qty"] >= 1


def test_global_rank_matches_single_partition_window(spark):
    """Property: the range-partitioned _global_rank equals the global
    row_number window for arbitrary (term, count) tables, including
    heavy ties and single-row inputs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.llm.lm import _global_rank

    cases = [
        [("a", 5)],
        [("a", 1), ("b", 1), ("c", 1)],  # all tied -> term order
        [(f"t{i:03d}", (i * 7) % 13 + 1) for i in range(200)],
        [(f"x{i}", 1000 - i) for i in range(50)]
        + [(f"y{i}", 1000 - i) for i in range(50)],  # cross-part ties
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "term string, c long")
        got = {(r.term, r.r)
               for r in _global_rank(spark, df).collect()}
        w = Window.orderBy(F.desc("c"), F.asc("term"))
        want = {(r.term, r.r)
                for r in df.withColumn("r", F.row_number().over(w))
                           .collect()}
        assert got == want, rows[:3]
