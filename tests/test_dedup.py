"""Dedup-clustering semantics: LSH pairs -> connected components."""

from __future__ import annotations

from postgres_es_cdc_spark.llm.dedup import (
    docs_dedup_clusters, docs_minhash_lsh_pairs)


def test_clusters_join_originals_with_mutants(spark, sf_dir):
    clusters = docs_dedup_clusters(spark, sf_dir).collect()
    # Mutant corpus: doc_id+1_000_000 is a near-dup of doc_id, so most
    # clusters should contain an original (label < 1e6) and its mutant.
    joined = [r for r in clusters
              if r.label < 1_000_000 and r.max_member_id >= 1_000_000]
    assert len(joined) > 0
    for r in joined:
        assert r.canonical_id == r.label  # canonical is the min label
        assert r.cluster_size >= 2
    # determinism
    again = {r.label: (r.cluster_size, r.canonical_id, r.max_member_id)
             for r in docs_dedup_clusters(spark, sf_dir).collect()}
    assert again == {r.label: (r.cluster_size, r.canonical_id, r.max_member_id)
                     for r in clusters}


def test_pairs_link_each_mutant_to_its_original(spark, sf_dir):
    pairs = {(r.doc_a, r.doc_b)
             for r in docs_minhash_lsh_pairs(spark, sf_dir).collect()}
    own = [(a, b) for a, b in pairs if b == a + 1_000_000]
    # High recall expected: dropping one token barely moves signatures.
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(own) > n_docs * 0.8
