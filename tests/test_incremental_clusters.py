"""Incremental connected-component maintenance (round 12):
merge_cluster_labels folds rep-grain pair deltas into a persisted
(rep, label) store without touching historical pairs. Pins:

- the fold law: ANY partition of the pair set, in ANY batch order,
  yields the one-shot true-component labels (min rep per component) —
  including late edges that merge two OLD components, and chains far
  deeper than the 5-round propagation queries can close;
- a late-arriving SMALLER id relabels its whole component (arrival
  order is not id order — the streaming assumption);
- the driver-side collect is label-grain delta-bounded and the guard
  raises instead of collecting unbounded state.
"""

from __future__ import annotations

import pytest

import itertools

from pyspark.sql import functions as F

from postgres_es_cdc_spark.llm.dedup import (
    _label_union_find, merge_cluster_labels)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long")


def _fold(spark, batches):
    labels = None
    for batch in batches:
        labels = merge_cluster_labels(labels, _pairs_df(spark, batch))
        labels = labels.localCheckpoint(eager=True)
    return sorted((r.rep, r.label) for r in labels.collect())


def _one_shot(pairs):
    """Reference: true components over the whole edge set at once."""
    remap = _label_union_find(list(pairs))
    nodes = sorted({x for p in pairs for x in p})
    return [(n, remap.get(n, n)) for n in nodes]


def test_union_find_min_wins_with_chains():
    # 5 -> 4 -> 3 -> 2 -> 1 presented in the worst order
    remap = _label_union_find([(4, 5), (2, 3), (3, 4), (1, 2)])
    assert remap == {2: 1, 3: 1, 4: 1, 5: 1}
    assert _label_union_find([]) == {}


def test_fold_equals_one_shot_under_every_batch_permutation(spark):
    # two components: a 6-node chain (10..60, every edge in a different
    # batch slice) and a triangle; plus a cross-component late merge
    pairs = [(10, 20), (20, 30), (30, 40), (40, 50), (50, 60),
             (70, 80), (80, 90), (70, 90)]
    batches = [pairs[0:3], pairs[3:6], pairs[6:]]
    want = _one_shot(pairs)
    for perm in itertools.permutations(batches):
        assert _fold(spark, perm) == want, perm


def test_late_edge_merges_two_old_components(spark):
    # batch 1 and 2 build components {1,2} and {5,6} independently;
    # batch 3's single edge merges them THROUGH existing labels only
    got = _fold(spark, [[(1, 2)], [(5, 6)], [(2, 6)]])
    assert got == [(1, 1), (2, 1), (5, 1), (6, 1)]


def test_late_smaller_id_relabels_whole_component(spark):
    # component {10, 11, 12} exists with label 10; then id 3 arrives
    # linked to 12 — every member must drop to label 3 (one broadcast
    # remap, no member-grain recompute)
    got = _fold(spark, [[(10, 11), (11, 12)], [(3, 12)]])
    assert got == [(3, 3), (10, 3), (11, 3), (12, 3)]


@pytest.mark.slow_soak
def test_deep_chain_beyond_propagation_depth(spark):
    # a 64-node chain folded two edges per batch: bounded-iteration
    # propagation (5 rounds) cannot close this; union-find must
    n = 64
    pairs = [(i, i + 1) for i in range(1, n)]
    batches = [pairs[i:i + 2] for i in range(0, len(pairs), 2)]
    got = _fold(spark, batches[::-1])        # worst order: tail first
    assert got == [(i, 1) for i in range(1, n + 1)]


def test_label_edge_guard_raises(spark):
    df = _pairs_df(spark, [(1, 2), (3, 4), (5, 6)])
    try:
        merge_cluster_labels(None, df, max_label_edges=2)
        raise AssertionError("expected guard ValueError")
    except ValueError as e:
        assert "max_label_edges" in str(e)


def test_duplicate_and_redundant_edges_are_noops(spark):
    # re-delivered pairs and already-merged edges must not move labels
    l1 = _fold(spark, [[(1, 2), (2, 3)]])
    l2 = _fold(spark, [[(1, 2), (2, 3)], [(1, 2), (1, 3), (2, 3)]])
    assert l1 == l2 == [(1, 1), (2, 1), (3, 1)]
