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
