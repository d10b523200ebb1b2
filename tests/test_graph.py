"""Pointer-doubling connected components: convergence on chain graphs
that defeat plain per-hop label propagation."""

from __future__ import annotations

from postgres_es_cdc_spark.operators.graph import (
    CC_CHAIN, CC_ROUNDS, graph_connected_components)


def test_cc_converges_on_chains_where_plain_prop_cannot(spark, sf_dir):
    # The chain diameter exceeds the round count, so plain one-hop
    # propagation provably cannot converge in CC_ROUNDS rounds; the
    # doubling rule covers 2^(CC_ROUNDS-1) hops.
    assert CC_CHAIN - 1 > CC_ROUNDS
    assert 2 ** (CC_ROUNDS - 1) >= CC_CHAIN - 1

    rows = graph_connected_components(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # fully converged: every component is one contiguous key block
        # labelled by its head
        assert r.component == r.min_node
        assert r.max_node - r.min_node + 1 == r.n_nodes
        assert r.n_nodes <= CC_CHAIN
    n_nodes_total = sum(r.n_nodes for r in rows)
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert n_nodes_total == n_customers


def test_kcore_fixpoint_recursive_oracle_agrees_with_deep_unroll(sf_dir):
    """The recursive-CTE oracle and an over-provisioned MATERIALIZED
    unrolled peel chain (depth 12 — far past convergence on this graph)
    compute the same fixpoint core in DuckDB, so the recursion's
    termination rule (guard + outer extra peel) is proven equivalent to
    the unrolled fixpoint on real data."""
    from tests.oracle_harness import duck_connection
    from postgres_es_cdc_spark.operators.graph import (
        GRAPH_KCORE_FIXPOINT_SQL, KCORE_K, _kcore_iter_sql)

    con = duck_connection(sf_dir)

    def unrolled(depth):
        return ("""
WITH p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e0 AS MATERIALIZED (SELECT cust AS src, supp AS dst FROM p
       UNION ALL SELECT supp AS src, cust AS dst FROM p),"""
            + ",".join(
                _kcore_iter_sql(i, KCORE_K).replace(
                    f"e{i} AS ", f"e{i} AS MATERIALIZED ")
                for i in range(1, depth + 1))
            + f""",
fd AS (SELECT src, COUNT(*) AS deg FROM e{depth} GROUP BY src),
nodes AS (SELECT DISTINCT src FROM e0)
SELECT n.src AS node,
       CAST(COALESCE(fd.deg, 0) AS BIGINT) AS core_degree,
       COALESCE(fd.deg, 0) >= {KCORE_K} AS in_core
FROM nodes n LEFT JOIN fd ON n.src = fd.src
""")

    # depth-12 is a fixpoint witness only if depth-11 == depth-12
    prev = con.execute(unrolled(11)).fetchall()
    deep_rows = con.execute(unrolled(12)).fetchall()
    assert sorted(prev) == sorted(deep_rows)
    rec = con.execute(GRAPH_KCORE_FIXPOINT_SQL).fetchall()
    assert sorted(rec) == sorted(deep_rows)


def test_kcore_fixpoint_spark_matches_oracle_and_is_stable(spark, sf_dir):
    """Spark's convergence-detected peel equals the recursive oracle,
    and one additional manual peel of the claimed core removes nothing
    (the fixpoint property, asserted directly)."""
    from pyspark.sql import functions as F
    from tests.oracle_harness import compare, duck_connection
    from postgres_es_cdc_spark.operators.graph import (
        GRAPH_KCORE_FIXPOINT_SQL, KCORE_K, graph_kcore_fixpoint)

    df = graph_kcore_fixpoint(spark, sf_dir)
    r = compare("graph_kcore_fixpoint", df, duck_connection(sf_dir),
                GRAPH_KCORE_FIXPOINT_SQL)
    assert r.ok, r.message()
    core = df.filter(F.col("in_core"))
    degs = [row.core_degree for row in core.collect()]
    assert all(d >= KCORE_K for d in degs)


def test_triangle_estimate_envelope_and_determinism(spark, sf_dir):
    """The DOULION estimator: deterministic (hash coin — two runs
    bit-equal), oracle-exact, and its estimate lands within 4 stderr
    of the true triangle count (a loose envelope: the independent-
    triangle variance undercounts on shared-edge graphs, but the
    fixture's estimate sits ~1σ off truth at both SFs)."""
    from tests.oracle_harness import compare, duck_connection
    from postgres_es_cdc_spark.operators.graph import (
        GRAPH_TRIANGLE_ESTIMATE_SQL, _copurchase_forward_tri,
        graph_triangle_estimate)

    df = graph_triangle_estimate(spark, sf_dir)
    r = compare("graph_triangle_estimate", df, duck_connection(sf_dir),
                GRAPH_TRIANGLE_ESTIMATE_SQL)
    assert r.ok, r.message()
    row = df.collect()[0]
    again = graph_triangle_estimate(spark, sf_dir).collect()[0]
    assert row == again
    _, tcnt = _copurchase_forward_tri(spark, sf_dir)
    exact = tcnt.groupBy().sum("n_triangles").collect()[0][0] // 3
    assert abs(row.est_triangles - exact) <= max(4 * row.stderr, 50), \
        (row.est_triangles, exact, row.stderr)


def test_local_clustering_estimate_oracle_exact_and_calibrated(
        spark, sf_dir):
    """The per-node DOULION variant: oracle-exact (same hash-coin
    subgraph both engines), covers exactly the deg>=2 node set of the
    exact row, cc_est clamped to [0,1], and the SUM of per-node
    estimates is the global estimator's 3T-scaled mass within a loose
    envelope of the exact per-node total (unbiasedness sanity, not a
    tight bound — p=1/2 keeps the fixture noise workable)."""
    from tests.oracle_harness import compare, duck_connection
    from postgres_es_cdc_spark.operators.graph import (
        GRAPH_LOCAL_CLUSTERING_EST_SQL, graph_clustering_coefficient,
        graph_local_clustering_estimate)

    df = graph_local_clustering_estimate(spark, sf_dir)
    r = compare("graph_local_clustering_estimate", df,
                duck_connection(sf_dir), GRAPH_LOCAL_CLUSTERING_EST_SQL)
    assert r.ok, r.message()

    exact = graph_clustering_coefficient(spark, sf_dir)
    rows = df.collect()
    assert {x.partkey for x in rows} == {x.partkey for x in
                                         exact.collect()}
    assert all(0.0 <= x.cc_est <= 1.0 for x in rows)
    est_total = sum(x.est_triangles for x in rows)
    true_total = sum(x.n_triangles for x in exact.collect())
    assert est_total == 0 or true_total == 0 or \
        0.25 < est_total / true_total < 4.0, (est_total, true_total)
