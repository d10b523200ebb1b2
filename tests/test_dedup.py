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


def test_chunk_dedup_mutants_share_chunks(spark, sf_dir):
    from postgres_es_cdc_spark.llm.dedup import docs_chunk_dedup

    rows = {r.doc_id: r for r in docs_chunk_dedup(spark, sf_dir).collect()}
    mutants = [r for i, r in rows.items() if i >= 1_000_000]
    assert mutants
    for m in mutants:
        orig = rows[m.doc_id - 1_000_000]
        # Chunks are disjoint from the text start, so dropping the LAST
        # token leaves every chunk except possibly the final one
        # identical between a doc and its mutant.
        assert m.n_dup_chunks >= m.n_chunks - 1
        assert orig.n_dup_chunks >= orig.n_chunks - 1
        # retained tokens never exceed total, ratio consistent
        assert m.n_retained_tokens <= m.n_tokens
        assert abs(m.dup_chunk_ratio - m.n_dup_chunks / m.n_chunks) < 1e-12


def test_simhash_hamming_exact_pair_set(spark, sf_dir):
    """Banding must lose nothing: the result equals the brute-force
    hamming<=3 pair set over the fingerprints (pigeonhole guarantee)."""
    from postgres_es_cdc_spark.llm.dedup import (
        SIMHASH_MAX_HAMMING, docs_simhash_hamming_pairs)

    got = {(r.doc_a, r.doc_b): r.hamming
           for r in docs_simhash_hamming_pairs(spark, sf_dir).collect()}
    # recompute fingerprints via the same pipeline's bucket input
    import duckdb

    from postgres_es_cdc_spark.llm.dedup import SIMHASH_FPS_CTE_SQL
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    fps = con.execute(
        SIMHASH_FPS_CTE_SQL + "\nSELECT doc_id, sh FROM fps").fetchall()
    brute = {}
    for i, (ida, sha) in enumerate(fps):
        for idb, shb in fps[i + 1:]:
            h = bin(sha ^ shb).count("1")
            if h <= SIMHASH_MAX_HAMMING:
                a, b = min(ida, idb), max(ida, idb)
                brute[(a, b)] = h
    assert got == brute
    assert all(h <= SIMHASH_MAX_HAMMING for h in got.values())
    # mutants should be found with high recall
    own = [1 for (a, b) in got if b == a + 1_000_000]
    assert sum(own) > 0


def test_cluster_representatives_pick_max_quality(spark, sf_dir):
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.llm.dedup import (
        _cluster_labels, docs_cluster_representatives, mutated_corpus)
    from postgres_es_cdc_spark.llm.text import quality_expr

    reps = {r.label: r for r in
            docs_cluster_representatives(spark, sf_dir).collect()}
    labels = _cluster_labels(spark, sf_dir)
    q = mutated_corpus(spark, sf_dir).select(
        "doc_id", quality_expr(F.col("text")).alias("quality"))
    members = labels.join(q, "doc_id").collect()
    by_label: dict = {}
    for m in members:
        by_label.setdefault(m.label, []).append((m.quality, m.doc_id))
    assert set(reps) == set(by_label)
    for label, ms in by_label.items():
        best = max((q, -i) for q, i in ms)
        assert reps[label].rep_doc_id == -best[1]
        assert reps[label].rep_quality == best[0]
        assert reps[label].cluster_size == len(ms)


def test_ngram_novelty_mutants_contribute_nothing_new(spark, sf_dir):
    from postgres_es_cdc_spark.llm.dedup import docs_ngram_novelty

    rows = {r.doc_id: r for r in docs_ngram_novelty(spark, sf_dir).collect()}
    muts = [r for i, r in rows.items() if i >= 1_000_000]
    origs = [r for i, r in rows.items() if i < 1_000_000]
    assert muts and origs
    # a mutant's shingles are a subset of its (lower-id) source's
    for m in muts:
        assert m.n_novel == 0
        assert m.novelty == 0.0
    # originals collectively introduce every shingle
    assert sum(o.n_novel for o in origs) > 0
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_shingles


def test_pair_bucket_cap_bounds_degenerate_buckets(spark, tmp_path):
    """Adversarial fixture: 40 identical documents (so the mutated
    corpus holds 80 docs whose signatures all collide). Every band
    bucket is degenerate; the cap must bound the pair fan-out
    deterministically and the overflow report must account for every
    over-cap bucket."""
    import pandas as pd

    from postgres_es_cdc_spark.llm.dedup import (
        _build_lsh_pairs, dedup_bucket_overflow_report,
        docs_ngram_jaccard_pairs)

    sf = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": list(range(40)),
        "text": ["the same boilerplate text repeated in every document"] * 40,
    })
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")

    pairs = {(r.doc_a, r.doc_b)
             for r in _build_lsh_pairs(spark, sf, cap=5).collect()}
    # Each bucket keeps only its 5 lowest doc_ids -> at most C(5,2) pairs
    # from the original half plus C(5,2) from the mutant half.
    assert 0 < len(pairs) <= 20
    assert {(a, b) for a in range(5) for b in range(5) if a < b} <= pairs
    assert all(b < 5 or b >= 1_000_000 for _, b in pairs)
    # deterministic under the cap (row_number orders by doc_id)
    again = {(r.doc_a, r.doc_b)
             for r in _build_lsh_pairs(spark, sf, cap=5).collect()}
    assert again == pairs

    # shingle blocking drops over-cap buckets whole -> no pairs at all
    assert docs_ngram_jaccard_pairs(spark, sf, cap=5).count() == 0

    rep = {r.path: r
           for r in dedup_bucket_overflow_report(spark, sf, cap=5).collect()}
    lsh = rep["minhash_lsh_bands"]
    assert lsh.max_bucket >= 40
    assert lsh.n_over_cap >= 4          # every band has a degenerate bucket
    assert lsh.n_dropped_members >= 4 * 35
    jac = rep["jaccard_shingle_blocks"]
    assert jac.n_over_cap == jac.n_buckets  # every shingle is boilerplate
    assert jac.n_dropped_members > 0
    assert rep["simhash_bands"].max_bucket >= 40


def test_bucket_overflow_report_zero_at_test_scale(spark, sf_dir):
    """At driver scale factors no bucket approaches PAIR_BUCKET_CAP, so
    capped pair queries provably equal their uncapped oracles."""
    from postgres_es_cdc_spark.llm.dedup import dedup_bucket_overflow_report

    rows = dedup_bucket_overflow_report(spark, sf_dir).collect()
    assert {r.path for r in rows} == {
        "minhash_lsh_bands", "jaccard_shingle_blocks", "simhash_bands"}
    for r in rows:
        assert r.n_over_cap == 0 and r.n_dropped_members == 0
        assert r.n_buckets > 0 and r.max_bucket >= 1


def test_containment_mutant_fully_contained_in_source(spark, sf_dir):
    """A mutant's shingles are a strict subset of its source's, so the
    mutant->source containment is exactly 1.0; the reverse direction is
    below 1 whenever the source has more shingles."""
    from postgres_es_cdc_spark.llm.dedup import docs_minhash_containment

    rows = docs_minhash_containment(spark, sf_dir).collect()
    pairs = {(r.doc_sub, r.doc_sup): r.containment for r in rows}
    own = [(s, p) for (s, p) in pairs if s >= 1_000_000 and p == s - 1_000_000]
    assert own
    for s, p in own:
        assert pairs[(s, p)] == 1.0


def test_survivorship_kept_quality_dominates(spark, sf_dir):
    from postgres_es_cdc_spark.llm.dedup import (
        docs_dedup_survivorship_quality)

    rows = {r.status: r
            for r in docs_dedup_survivorship_quality(spark, sf_dir).collect()}
    assert set(rows) == {"kept", "pruned"}
    # representatives are selected BY max quality, so the kept mean
    # cannot be below the pruned mean
    assert rows["kept"].avg_quality >= rows["pruned"].avg_quality
    assert rows["kept"].n_docs > 0 and rows["pruned"].n_docs > 0


def test_cap_buckets_property(spark):
    """Property: for ANY bucket contents, _cap_buckets keeps exactly
    the min(cap, n) lowest-ordered members of each bucket — nothing
    else changes, and repeated runs agree (deterministic under the
    nondeterministic partitioning of the input)."""
    import random

    from postgres_es_cdc_spark.llm.dedup import _cap_buckets

    rng = random.Random(42)
    rows = []
    for key in range(12):
        n = rng.randrange(0, 40)
        ids = rng.sample(range(1000), n)
        rows += [(key, i) for i in ids]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows or [(0, 0)], "k int, doc_id int") \
              .repartition(7)
    for cap in (1, 3, 1000):
        got = {}
        for r in _cap_buckets(df, ["k"], "doc_id", cap).collect():
            got.setdefault(r.k, []).append(r.doc_id)
        want = {}
        for k, i in rows:
            want.setdefault(k, []).append(i)
        want = {k: sorted(v)[:cap] for k, v in want.items()}
        assert {k: sorted(v) for k, v in got.items()} == \
            {k: v for k, v in want.items() if v}


def test_incremental_pairs_match_full_recompute_and_roundtrip(
        spark, sf_dir, tmp_path):
    """Incremental new-batch pairs == full LSH pairs restricted to the
    batch, from the in-session store AND from a parquet round-tripped
    store (the cross-session persisted-index path)."""
    from postgres_es_cdc_spark.llm.dedup import (
        docs_incremental_lsh_pairs, docs_minhash_lsh_pairs,
        load_signature_store, save_signature_store, signature_store)

    full = {(r.doc_a, r.doc_b)
            for r in docs_minhash_lsh_pairs(spark, sf_dir).collect()}
    expected = {(a, b) for a, b in full if b >= 1_000_000}
    inc_rows = docs_incremental_lsh_pairs(spark, sf_dir).collect()
    inc = {(r.doc_a, r.doc_b) for r in inc_rows}
    assert inc == expected
    # rep-grain expansion emits each member pair exactly once — no
    # member-grain distinct anywhere, so duplicates would surface here
    assert len(inc_rows) == len(inc)
    assert expected, "batch must produce candidates at test scale"
    # old x old never emitted by construction
    assert not [(a, b) for (a, b) in inc if b < 1_000_000]

    path = str(tmp_path / "sigstore")
    save_signature_store(signature_store(spark, sf_dir), path)
    loaded = load_signature_store(spark, path)
    members, reps = loaded
    # the store is rep-grain: one row per DISTINCT signature vector,
    # membership covers every original doc
    n_orig = members.count()
    n_reps = members.select("rep").distinct().count()
    assert reps.count() == n_reps
    assert n_orig >= n_reps
    inc2 = {(r.doc_a, r.doc_b)
            for r in docs_incremental_lsh_pairs(
                spark, sf_dir, store=loaded).collect()}
    assert inc2 == expected


def test_multibatch_probe_merge_loop_matches_one_shot(spark, sf_dir):
    """The continuous-crawl loop: probe → merge_signature_store →
    probe... over 3 sequential batches emits exactly the one-shot
    incremental pair set, each pair once (no member-grain distinct
    anywhere), and the merged store keeps its invariants (rep ∈ group,
    rep = min member, one reps row per distinct signature)."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.llm.dedup import (
        _sig_collapsed, _signatures_from_sh, _mutated_shingle_hashes,
        docs_incremental_lsh_multibatch, docs_incremental_lsh_pairs,
        merge_signature_store, signature_store)

    one_shot = {(r.doc_a, r.doc_b)
                for r in docs_incremental_lsh_pairs(spark, sf_dir).collect()}
    rows = docs_incremental_lsh_multibatch(spark, sf_dir,
                                           n_batches=3).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == one_shot
    assert len(rows) == len(got)        # each pair emitted exactly once

    # merge invariants on a full-mutant-half fold
    bmem = _sig_collapsed(
        _signatures_from_sh(_mutated_shingle_hashes(spark, sf_dir))
        .filter(F.col("doc_id") >= 1000000))
    members, reps = merge_signature_store(
        signature_store(spark, sf_dir), bmem)
    n_groups = members.select("rep").distinct().count()
    assert reps.count() == n_groups
    assert reps.select("rep").distinct().count() == n_groups
    bad = (members.groupBy("rep").agg(F.min("doc_id").alias("lo"))
                  .filter(F.col("lo") != F.col("rep")).count())
    assert bad == 0                     # rep = min member of its group


def test_incremental_exact_dedup_roundtrip_and_restriction(
        spark, sf_dir, tmp_path):
    """Incremental exact dedup == full exact dedup restricted to
    batch-touching groups, from the in-session store AND a parquet
    round-tripped store; untouched groups never appear."""
    from postgres_es_cdc_spark.llm.dedup import (
        docs_exact_dedup, docs_incremental_exact_dedup,
        exact_dedup_store, load_exact_dedup_store,
        save_exact_dedup_store)

    full = {r.content_md5: (r.canonical_id, r.n_copies)
            for r in docs_exact_dedup(spark, sf_dir).collect()}
    inc = {r.content_md5: (r.canonical_id, r.n_copies)
           for r in docs_incremental_exact_dedup(spark, sf_dir).collect()}
    assert inc and all(full[h] == v for h, v in inc.items())
    # every emitted group was touched by the batch (max id >= 1e6 means
    # its count exceeds the old-only store count); untouched groups out
    assert set(inc) < set(full)

    path = str(tmp_path / "md5store")
    save_exact_dedup_store(exact_dedup_store(spark, sf_dir), path)
    inc2 = {r.content_md5: (r.canonical_id, r.n_copies)
            for r in docs_incremental_exact_dedup(
                spark, sf_dir,
                store=load_exact_dedup_store(spark, path)).collect()}
    assert inc2 == inc


def test_incremental_simhash_matches_full_and_roundtrips(
        spark, sf_dir, tmp_path):
    """Incremental SimHash pairs == one-shot banded Hamming≤3 pairs
    restricted to the batch, each emitted once (no member-grain
    distinct), from the in-session store AND a parquet round-trip."""
    from postgres_es_cdc_spark.llm.dedup import (
        docs_incremental_simhash_pairs, docs_simhash_hamming_pairs,
        load_simhash_store, save_simhash_store, simhash_store)

    full = {(r.doc_a, r.doc_b): r.hamming
            for r in docs_simhash_hamming_pairs(spark, sf_dir).collect()}
    expected = {k: v for k, v in full.items() if k[1] >= 1_000_000}
    rows = docs_incremental_simhash_pairs(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert got == expected
    assert len(rows) == len(got)
    assert expected, "batch must produce candidates at test scale"

    path = str(tmp_path / "shstore")
    save_simhash_store(simhash_store(spark, sf_dir), path)
    got2 = {(r.doc_a, r.doc_b): r.hamming
            for r in docs_incremental_simhash_pairs(
                spark, sf_dir, store=load_simhash_store(spark, path))
            .collect()}
    assert got2 == expected


def test_lsh_recall_curve_caps_mirror_oracle_when_binding(spark, sf_dir):
    """ADVICE r6: the truth-side shingle df-cap and the LSH bucket cap
    must be mirrored in the oracle CTEs. The production constant never
    binds on the sampled sf fixtures, so force a tiny cap that BINDS on
    both paths and require bit-exact agreement."""
    from postgres_es_cdc_spark.llm.dedup import (_docs_lsh_recall_sql,
                                                 docs_lsh_recall_curve)
    from tests.oracle_harness import compare, duck_connection

    cap = 3
    df = docs_lsh_recall_curve(spark, sf_dir, cap=cap)
    con = duck_connection(sf_dir)
    r = compare("lsh_recall_binding_cap", df, con, _docs_lsh_recall_sql(cap))
    assert r.ok, r.message()


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's defining guarantee (Schleimer et al. theorem): any
    shared substring of >= w+2 tokens yields at least one SHARED
    fingerprint; and disjoint token sets yield none."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.llm.dedup import (
        WINNOW_W, winnow_fingerprints)

    shared = " ".join(f"s{i}" for i in range(WINNOW_W + 2))
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma " + shared + " delta epsilon"),
         (2, "zeta eta theta iota " + shared),
         (3, "one two three four five six seven eight nine ten "
             "eleven twelve thirteen fourteen")],
        "doc_id long, text string")
    f = {r.doc_id: set(r.fps)
         for r in winnow_fingerprints(docs, WINNOW_W).collect()}
    assert f[1] & f[2], "shared >=w+2-token substring must share a fp"
    assert not (f[1] & f[3]) and not (f[2] & f[3]), \
        "disjoint vocabularies must not share fingerprints"
    # Density sanity: every doc with >= 1 gram has >= 1 fingerprint.
    assert all(len(v) >= 1 for v in f.values())


def test_fingerprint_store_roundtrip_and_incremental_probe(spark, sf_dir,
                                                           tmp_path):
    """The winnowing fingerprint store round-trips parquet bit-exactly
    (all-int columns) and probing it with the batch gives the same top
    pairs as the in-session store — the across-sessions contract of
    incremental exact-substring screening."""
    from postgres_es_cdc_spark.llm.dedup import (
        docs_incremental_winnow_overlap, fingerprint_store,
        load_fingerprint_store, save_fingerprint_store)

    store = fingerprint_store(spark, sf_dir)
    path = str(tmp_path / "fp_store")
    save_fingerprint_store(store, path)
    loaded = load_fingerprint_store(spark, path)
    for built, rt in zip(store, loaded):
        assert sorted(built.collect()) == sorted(rt.collect())

    direct = docs_incremental_winnow_overlap(spark, sf_dir).collect()
    via_store = docs_incremental_winnow_overlap(
        spark, sf_dir, store=loaded).collect()
    assert direct == via_store and len(direct) > 0
    # every pair touches the batch (the incremental guarantee)
    assert all(r.doc_b >= 1_000_000 for r in direct)


def test_probe_store_cap_ranks_across_store_and_batch(spark):
    """The round-11 join-shaped probe restricts the cap window to
    batch-touched buckets; this pins that within such a bucket the cap
    still ranks over the UNION of store and batch reps — a batch rep
    ranked past the cap emits nothing, a low-id batch rep pushes store
    reps out, and a generous cap admits everyone."""
    from postgres_es_cdc_spark.llm.dedup import (
        _SIG_COLS, _probe_signature_store)

    def frame(rows):
        # rep r in the shared band-0 bucket: sig0=sig1=1, sig2..7
        # unique per rep so no other band collides
        data = [(r, 1, 1, *[r * 10 + j for j in range(2, 8)], r)
                for r in rows]
        return spark.createDataFrame(
            data, "doc_id long, " + ", ".join(
                f"{c} long" for c in _SIG_COLS) + ", rep long")

    def probe(store_ids, batch_ids, cap):
        smem = frame(store_ids)
        store = (smem.select("doc_id", "rep"),
                 smem.select("rep", *_SIG_COLS))
        return {(r.doc_a, r.doc_b)
                for r in _probe_signature_store(
                    store, frame(batch_ids), cap).collect()}

    # batch rep 100 ranks 11th of 11 -> capped out -> no pairs
    assert probe(range(10), [100], cap=5) == set()
    # cap admits the whole bucket -> batch pairs with every store rep
    assert probe(range(10), [100], cap=11) == {(r, 100) for r in range(10)}
    # low-id batch rep ranks FIRST: survivors {0, 10..13}
    assert probe(range(10, 20), [0], cap=5) == {(0, r)
                                                for r in range(10, 14)}


def test_routing_report_counts_are_consistent(spark, sf_dir):
    """docs_dedup_routing_report (round-11 routing side channel): its
    four counts must agree with the frames they summarize, and the
    expansion ratio is their quantized quotient."""
    from postgres_es_cdc_spark.llm.dedup import (
        docs_dedup_routing_report, docs_minhash_lsh_pairs)

    r = docs_dedup_routing_report(spark, sf_dir).collect()[0]
    assert r.member_candidate_pairs == \
        docs_minhash_lsh_pairs(spark, sf_dir).count()
    assert 0 < r.n_reps <= r.n_docs
    # rep-grain pairs can never exceed member-grain pairs (every rep
    # pair expands to >= 1 member pair; member pairs add in-group ones)
    assert 0 < r.rep_candidate_pairs <= r.member_candidate_pairs
    assert r.pair_expansion_q == (
        1_000_000 * r.member_candidate_pairs) // r.rep_candidate_pairs
    assert r.pair_expansion_q >= 1_000_000


def test_rep_candidate_pairs_bucket_guard_fails_loudly(
        spark, monkeypatch):
    """_rep_candidate_pairs is UNCAPPED for oracle parity, so a
    degenerate band bucket must fail LOUDLY (in-plan assert before the
    k^2 explode) instead of OOMing an executor (ADVICE r12). Guard
    shrunk via monkeypatch: building a genuinely over-guard bucket
    (10k+ distinct signatures sharing a band) would be test abuse."""
    from postgres_es_cdc_spark.llm import dedup as D

    # 3 DISTINCT signature vectors colliding in band 0 (sig0,sig1
    # equal), differing in the rest — the similar-but-distinct
    # collision LSH bands produce by design
    rows = [(i, 1, 2, 10 + i, 11 + i, 12 + i, 13 + i, 14 + i, 15 + i)
            for i in range(3)]
    reps = spark.createDataFrame(
        rows, ["rep"] + [f"sig{j}" for j in range(8)])

    # under the guard: pairs come back, nothing raises
    assert D._rep_candidate_pairs(reps).count() == 3

    monkeypatch.setattr(D, "REP_BUCKET_GUARD", 2)
    try:
        D._rep_candidate_pairs(reps).count()
        raise AssertionError("expected in-plan bucket-guard failure")
    except AssertionError:
        raise
    except Exception as e:  # Spark wraps the assert in its own error
        assert "rep-grain LSH bucket over guard" in str(e)
