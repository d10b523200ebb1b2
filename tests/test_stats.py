"""Statistical aggregates: sketch accuracy bounds and cross-checks the
rows-only driver gate can't cover (exact parity for the other stats
queries rides tests/test_oracle_parity.py)."""

from __future__ import annotations

from postgres_es_cdc_spark.operators.stats import (
    agg_approx_percentile, agg_stats_moments)


def test_approx_percentile_within_sketch_bound(spark, duck, sf_dir):
    """percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    check the returned value sits within the exact p +/- 2*n/1000 rank
    band per group (loose band: rows-only driver check has no bound at
    all, this pins one)."""
    approx = {r["priority"]: r for r in agg_approx_percentile(spark, sf_dir).collect()}
    exact = duck.execute("""
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n,
               quantile_disc(o_totalprice, 0.5)  AS p50,
               quantile_disc(o_totalprice, 0.95) AS p95
        FROM orders GROUP BY o_orderpriority
    """).fetchall()
    for priority, n, p50, p95 in exact:
        row = approx[priority]
        assert row["n_orders"] == n
        for got, p in ((row["approx_median_price"], 0.5),
                       (row["approx_p95_price"], 0.95)):
            rank_band = duck.execute(
                """
                WITH r AS (
                  SELECT o_totalprice,
                         ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
                  FROM orders WHERE o_orderpriority = ?
                )
                SELECT MIN(o_totalprice), MAX(o_totalprice) FROM r
                WHERE rn BETWEEN CAST(? AS BIGINT) AND CAST(? AS BIGINT)
                """,
                [priority, max(1, int(p * n) - 2 * n // 1000 - 1),
                 min(n, int(p * n) + 2 * n // 1000 + 1)]).fetchone()
            assert rank_band[0] <= got <= rank_band[1], (priority, p, got, rank_band)


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
