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


def test_basket_cap_bounds_giant_order(spark, tmp_path):
    """Adversarial fixture for orders_basket_affinity's BASKET_CAP
    guard: one hub order with 50 distinct parts next to normal 3-line
    baskets. With cap=10 the hub contributes at most C(10,2) pairs over
    its 10 LOWEST partkeys (deterministic), the normal baskets are
    untouched, the overflow report accounts for every dropped line, and
    the capped result stays bit-exact vs a DuckDB oracle applying the
    identical row_number rule."""
    import duckdb
    import pandas as pd

    from postgres_es_cdc_spark.operators.analytics import (
        ORDERS_BASKET_SQL, orders_basket_affinity,
        orders_basket_overflow_report)
    from tests.oracle_harness import compare

    sf = str(tmp_path)
    rows = [(1, p) for p in range(100, 150)]          # hub order: 50 parts
    for okey in (2, 3, 4):                            # normal baskets
        rows += [(okey, p) for p in (100, 101, 999)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    spark.createDataFrame(li).write.parquet(f"{sf}/lineitem.parquet")

    df = orders_basket_affinity(spark, sf, min_support=1, top=1000, cap=10)
    got = df.collect()
    hub_pairs = {(r.part_a, r.part_b) for r in got if r.support == 1}
    # hub emits exactly C(10,2) - the 2 pairs it shares with the normal
    # baskets (those have support 4); every hub-only pair uses the 10
    # lowest partkeys 100..109
    assert all(100 <= a < 110 and 100 <= b < 110 for a, b in hub_pairs)
    # C(10,2) hub pairs (incl. (100,101), support 4) + (100,999) and
    # (101,999) from the normal baskets
    assert len(got) == 45 + 2
    again = orders_basket_affinity(spark, sf, min_support=1, top=1000,
                                   cap=10).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))

    rep = orders_basket_overflow_report(spark, sf, cap=10).collect()[0]
    assert rep.n_buckets == 4
    assert rep.max_bucket == 50
    assert rep.n_over_cap == 1
    assert rep.n_dropped_members == 40

    # bit-exactness when the cap BINDS: oracle applies the same rule
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet/*.parquet')")
    sql = (ORDERS_BASKET_SQL
           .replace("rn <= 500", "rn <= 10")
           .replace("COUNT(*) >= 3", "COUNT(*) >= 1")
           .replace("LIMIT 25", "LIMIT 1000"))
    r = compare("basket_capped", df, con, sql)
    assert r.ok, r.message()


def test_bpe_train_greedy_merge_semantics():
    """_bpe_train implements textbook BPE: corpus-weighted pair counts,
    (n DESC, c1, c2) tie rule, greedy left-to-right non-overlapping
    merge application via the prefix-delimiter replace."""
    from postgres_es_cdc_spark.llm.text import BPE_DELIM, _bpe_train

    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    rows, syms = _bpe_train(vocab, 3)
    # 'es' appears in newest(6)+widest(3)=9, 'st' likewise 9 — tie
    # breaks to the lexicographically smaller pair ('e','s').
    assert [(r[1], r[2], r[4]) for r in rows[:2]] == [
        ("e", "s", 9), ("es", "t", 9)]
    assert syms["newest"].split(BPE_DELIM)[1:] == ["n", "e", "w", "est"]

    # overlap: greedy leftmost — 'aaa' under merge (a,a) -> (aa)(a)
    rows2, syms2 = _bpe_train([("aaa", 1)], 1)
    assert rows2[0][1:4] == ("a", "a", "aa")
    assert syms2["aaa"].split(BPE_DELIM)[1:] == ["aa", "a"]


def test_bpe_train_deterministic_merge_order():
    """Same vocabulary (any iteration order) -> identical merge list:
    the argmax rule is a pure function of the counts."""
    from postgres_es_cdc_spark.llm.text import _bpe_train

    vocab = [("spark", 3), ("scan", 7), ("sort", 7), ("stream", 2)]
    a, _ = _bpe_train(vocab, 10)
    b, _ = _bpe_train(list(reversed(vocab)), 10)
    assert a == b and len(a) > 0
    # exhaustion: merging stops when no pairs remain, rows < requested
    c, syms = _bpe_train([("ab", 1)], 10)
    assert len(c) == 1 and syms["ab"].count("\x01") == 1


def test_hll_sketch_accuracy_envelope(spark):
    """The portable HLL lands within its theoretical envelope across the
    low (linear-counting) and raw regimes: relative error < 3 * 1.04 /
    sqrt(m) ~ 0.195 for true cardinalities spanning 50..50000.
    Deterministic: the hash is md5-based, no seeds involved."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.operators.analytics import hll_sketch

    for n in (50, 500, 5000, 50000):
        df = (spark.range(n)
                   .select(F.lit("g").alias("grp"),
                           (F.col("id") * 7 + 13).alias("key")))
        row = hll_sketch(df, "grp", "key").collect()[0]
        rel = abs(row.hll_estimate - n) / n
        assert rel < 0.195, (n, row.hll_estimate, rel)


def test_hll_registers_merge_as_max(spark):
    """The sketch of a union equals the max-merge of the parts'
    registers — i.e. splitting the data across partitions/batches can
    never change the estimate (what makes the sketch mergeable across
    pipelines and what Spark's partial_max exploits)."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.operators.analytics import hll_sketch

    full = spark.range(4000).select(
        F.lit("g").alias("grp"), (F.col("id") * 31 + 7).alias("key"))
    whole = hll_sketch(full, "grp", "key").collect()[0]
    # Same rows in 3 arbitrary slices, unioned in a different order:
    parts = [full.filter(F.col("id") % 3 == i) for i in (2, 0, 1)]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    again = hll_sketch(u, "grp", "key").collect()[0]
    assert (whole.sum_q, whole.n_zero_buckets, whole.hll_estimate) == \
           (again.sum_q, again.n_zero_buckets, again.hll_estimate)


def test_qsketch_registers_merge_as_sum_and_bounds():
    """Quantile-sketch registers: the sketch of a union equals the
    sum-merge of the parts' registers (mergeable across partitions/
    batches), every counted value falls inside its bucket's [lo, hi),
    and bucket relative width is <= 1/16 — the rank-query error
    envelope."""
    import tests.conftest  # noqa: F401 — session fixture module

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.operators.analytics import (
        QSK_SUB, qsketch_bounds, qsketch_registers)

    spark = SparkSession.getActiveSession() or SparkSession.builder \
        .master("local[4]").getOrCreate()
    vals = ([0, 1, 15, 16, 17, 31, 32, 1000, 10**6, 10**12]
            + [7 ** i % 99991 for i in range(500)])
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v long")
    whole = {(r.bucket): r.cnt
             for r in qsketch_registers(df, "grp", "v").collect()}
    parts = [df.filter(F.col("v") % 3 == i) for i in (2, 0, 1)]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    again = {(r.bucket): r.cnt
             for r in qsketch_registers(u, "grp", "v").collect()}
    assert whole == again and sum(whole.values()) == len(vals)

    lo, hi = qsketch_bounds(F.col("bucket"))
    b = (qsketch_registers(df, "grp", "v")
         .select("bucket", lo.alias("lo"), hi.alias("hi")).collect())
    bounds = {r.bucket: (r.lo, r.hi) for r in b}
    for v in vals:
        hit = [bk for bk, (l, h) in bounds.items() if l <= v < h]
        assert len(hit) == 1, (v, hit)
    for bk, (l, h) in bounds.items():
        if bk >= QSK_SUB:
            assert (h - l) * QSK_SUB <= l, (bk, l, h)  # rel width <= 1/16


def test_cms_registers_merge_as_sum_and_overestimate(spark):
    """Count-Min registers: union == sum-merge of parts (mergeable);
    point estimates only ever OVERESTIMATE the true count; estimates
    of the hot keys on a skewed stream land exactly (collision mass on
    1024-column rows is tiny at this scale)."""
    from pyspark.sql import functions as F

    from postgres_es_cdc_spark.operators.analytics import cms_registers

    rows = [("u%d" % (i % 50),) for i in range(2000)] + \
           [("hot",)] * 500
    df = spark.createDataFrame(rows, "k string")
    whole = {(r.r, r.col): r.cnt
             for r in cms_registers(df, "k").collect()}
    parts = [df.filter(F.length("k") % 2 == i) for i in (1, 0)]
    merged: dict = {}
    for p in parts:
        for r in cms_registers(p, "k").collect():
            merged[(r.r, r.col)] = merged.get((r.r, r.col), 0) + r.cnt
    assert whole == merged

    # point query: min over the 4 rows' counters for key "hot"
    import hashlib
    est = min(
        whole[(r, int(hashlib.md5(f"{r}_hot".encode()).hexdigest()[:15],
                      16) % 1024)]
        for r in range(4))
    assert est >= 500
