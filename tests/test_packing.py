"""Greedy sequence packing invariants (the oracle-parity sweep already
pins bit-exactness vs the recursive-CTE twin; these pin the packing
LAWS so a future 'optimization' can't silently change semantics)."""

from __future__ import annotations

import collections

from postgres_es_cdc_spark.llm.sampling import (
    PACK_CAP, docs_packing_efficiency, docs_sequence_packing)


def test_sequence_packing_greedy_laws(spark, sf_dir):
    rows = docs_sequence_packing(spark, sf_dir).collect()
    assert rows
    shards = collections.defaultdict(list)
    for r in rows:
        shards[r.shard].append(r)
    for sh, docs in shards.items():
        docs.sort(key=lambda r: r.pos)
        assert [r.pos for r in docs] == list(range(1, len(docs) + 1))
        fill = collections.Counter()
        prev_bin = 0
        for r in docs:
            assert r.bin_id >= prev_bin          # bins open in order
            assert r.bin_offset == fill[r.bin_id]  # dense, no holes
            fill[r.bin_id] += r.n_tokens
            if r.bin_id > prev_bin:
                assert r.bin_id == prev_bin + 1  # contiguous ids
                assert r.bin_offset == 0
                # greedy tightness: this doc did NOT fit in the bin
                # it skipped (or it would have been placed there)
                assert fill[prev_bin] + r.n_tokens > PACK_CAP
            prev_bin = r.bin_id
        # cap respected except single-doc oversize bins
        for b, tot in fill.items():
            if tot > PACK_CAP:
                members = [r for r in docs if r.bin_id == b]
                assert len(members) == 1


def test_packing_efficiency_consistent_with_assignment(spark, sf_dir):
    per_doc = docs_sequence_packing(spark, sf_dir).collect()
    rep = {r.shard: r for r in docs_packing_efficiency(spark, sf_dir).collect()}
    want_docs = collections.Counter(r.shard for r in per_doc)
    want_bins = {
        sh: len({r.bin_id for r in per_doc if r.shard == sh})
        for sh in want_docs}
    for sh, row in rep.items():
        assert row.n_docs == want_docs[sh]
        assert row.n_bins == want_bins[sh]
        assert 0.0 < row.fill_rate <= 1.0 or row.oversize_docs > 0
    assert set(rep) == set(want_docs)
