"""Similarity search over embedding columns ([EXT] surface).

``embeddings.embedding`` is array<float> (64-dim, L2-normalized). Two
formulations of every kernel:

* production path (``*_fast`` / ``dot_fast`` / ``cosine_fast``):
  pure-double ``zip_with`` + ``aggregate`` — array-native, whole-stage
  codegen, no explode, no shuffle per pair. This is what bench.py runs
  and what you'd run at 100 TB.
* oracle path (the ``queries()`` entries): embeddings quantized to
  fixed-point int64 (×1e6) so every dot product / norm / distance is
  EXACT integer arithmetic — order-independent and bit-identical across
  engines. (Double→decimal casts are NOT portable: Spark rounds the
  shortest string repr, DuckDB the exact binary value; integers have no
  such ambiguity.)

Scale design: the query set is broadcast (top-k search is a broadcast
nested loop against a small query side); candidates stream through
executors with no shuffle until the per-query top-k (WindowGroupLimit).
The sign-LSH bucket prefilter bounds candidates per query for the
really-large case.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.memo import register

Q_SCALE = 1_000_000  # fixed-point quantization for exact cross-engine math


def dot_fast(a: Column, b: Column) -> Column:
    """Production dot product: double accumulation, array-native."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def cosine_fast(a: Column, b: Column) -> Column:
    return dot_fast(a, b) / (F.sqrt(dot_fast(a, a)) * F.sqrt(dot_fast(b, b)))


def quantize(a: Column) -> Column:
    """array<float> -> array<long>: round(x * 1e6). DuckDB twin:
    CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)."""
    return F.transform(
        a, lambda x: F.round(x.cast("double") * Q_SCALE, 0).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of quantized vectors (≤ 64·1e12, fits
    int64; integer folds are order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
              .filter(F.col("rank") <= k)
    )


def _list_matrix(col, dtype):
    """2-D matrix from an Arrow list-typed array (list / large_list /
    fixed_size_list of numbers) — the r13 input path of the GEMM
    kernels. Equal-length, null-free rows (every quantized-embedding
    column here) reshape the flat Arrow values buffer directly: one
    O(1) view + one C copy, no per-row Python objects (the pandas
    list() path measured ~1.6s per 60k×64 batch; this is ~1000× less).
    Ragged or null rows fall back to the row-wise conversion with
    identical semantics."""
    import numpy as np
    import pyarrow as pa

    # Fast path only when NO nulls exist at either level: a null ELEMENT
    # inside a list would come out of to_numpy as NaN and an int64 cast
    # would silently produce INT64_MIN (ADVICE r13) — inner-null rows
    # must fall back to the row-wise conversion, which fails loudly.
    if col.null_count == 0 and len(col):
        if pa.types.is_fixed_size_list(col.type):
            # flatten() is slice-aware (col.values ignores a slice's
            # offset/length and would reshape the wrong rows); width
            # asserted so a surprise layout fails loudly, not silently.
            flat = col.flatten()
            if flat.null_count == 0:
                w = col.type.list_size
                vals = flat.to_numpy(zero_copy_only=False)
                assert len(vals) == w * len(col)
                return np.ascontiguousarray(vals, dtype=dtype).reshape(
                    len(col), w)
        elif col.values.null_count == 0:
            offs = col.offsets.to_numpy()
            widths = np.diff(offs)
            if (widths == widths[0]).all() and widths[0] > 0:
                w = int(widths[0])
                vals = col.values.to_numpy(zero_copy_only=False)
                start = int(offs[0])
                return np.ascontiguousarray(
                    vals[start:start + w * len(col)], dtype=dtype
                ).reshape(len(col), w)
    return np.array([list(v) for v in col.to_pylist()], dtype=dtype)


def _bq_scores(qrows: list, cdf: DataFrame, cid_col: str, vec_col: str,
               metric: str, prefix: int | None = None) -> DataFrame:
    """Broadcast-queries × corpus-scan scoring as an Arrow-batched int64
    GEMM kernel — the shared engine under every brute-force embedding
    pass (top-k, range search, recall evals). The query block is
    BOUNDED BY DESIGN (literal constants or COUNT(*)-derived sample
    targets), so collecting it IS the broadcast: the k×64 matrix rides
    the task closure, and each Arrow batch of candidates computes all
    dots as one X·Qᵀ — numpy integer matmul, EXACT (|xq·sq| ≤ 2^55,
    64-term sums ≤ 2^61). The per-pair zip_with/aggregate expression
    form this replaces is CodegenFallback (interpreted): the sf3 sweep
    measured 10-16s per query of pure interpreted dots.

    metric='cos': double(dot) / (sqrt(double(Σq²)) · sqrt(double(Σc²)))
    — the identical IEEE op sequence as the expression form (int→double
    casts are correctly rounded in both), so oracles match bit-for-bit.
    metric='l2sq': Σ(a−b)² computed as Σq² + Σc² − 2·dot — the same
    INTEGER by algebra (≤ ~1.1e15, exact in int64).
    prefix: slice both sides to the first `prefix` dims (Matryoshka).

    Emits ALL (qid, cid) pairs — callers keep their own qid != cid /
    threshold / top-k logic JVM-side, unchanged."""
    import numpy as np
    import pandas as pd

    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in qrows], dtype=np.int64)
    if prefix is not None:
        qm = qm[:, :prefix]
    q2 = (qm * qm).sum(axis=1)
    sqn = np.sqrt(q2.astype(np.float64))
    out_field = "cos_sim double" if metric == "cos" else "d long"
    val_col = "cos_sim" if metric == "cos" else "d"

    # mapInArrow (r13): the candidate matrix reshapes straight out of
    # the Arrow values buffer (_list_matrix) — the mapInPandas draft
    # spent more time building per-row Python lists than in the GEMM.
    def score(batches):
        import pyarrow as pa

        for rb in batches:
            if not rb.num_rows:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            x = _list_matrix(rb.column(1), np.int64)
            if prefix is not None:
                x = x[:, :prefix]
            dot = x @ qm.T
            c2 = (x * x).sum(axis=1)
            if metric == "cos":
                val = (dot.astype(np.float64)
                       / (sqn[None, :]
                          * np.sqrt(c2.astype(np.float64))[:, None]))
            else:
                val = q2[None, :] + c2[:, None] - 2 * dot
            yield pa.record_batch(
                [pa.array(np.tile(qids, len(ids))),
                 pa.array(np.repeat(ids, len(qids))),
                 pa.array(val.ravel())],
                names=["qid", cid_col, val_col])

    return cdf.select(cid_col, vec_col).mapInArrow(
        score, f"qid long, {cid_col} long, {out_field}")


def emb_cosine_topk(spark: SparkSession, sf_dir: str, k: int = 3,
                    n_queries: int = 5) -> DataFrame:
    """Brute-force cosine top-k: queries = vec_id < n_queries, scored
    against the full candidate set by the shared GEMM scan kernel
    (_bq_scores); ranking stays a JVM-side bounded window. Quantized-
    exact; emb_cosine_topk_fast is the float production variant."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), quantize(F.col("embedding")).alias("qq"))
    c = e.select(F.col("vec_id").alias("cid"),
                 quantize(F.col("embedding")).alias("cq"))
    qrows = [(r["qid"], list(r["qq"])) for r in q.collect()]
    scored = (_bq_scores(qrows, c, "cid", "cq", "cos")
              .filter(F.col("qid") != F.col("cid")))
    return _topk(scored, k).select("qid", "cid", "rank", "cos_sim")


_XQ = "CAST(round(CAST({v}[i.i] AS DOUBLE) * 1000000) AS BIGINT)"

EMB_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings),
scored AS (
  SELECT q.qid, c.cid,
         CAST(CAST(SUM({_XQ.format(v='q_emb')} * {_XQ.format(v='c_emb')}) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM({_XQ.format(v='q_emb')} * {_XQ.format(v='q_emb')}) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM({_XQ.format(v='c_emb')} * {_XQ.format(v='c_emb')}) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM q, c, generate_series(1, 64) i(i)
  WHERE q.qid != c.cid
  GROUP BY q.qid, c.cid
)
SELECT qid, cid, rank, cos_sim
FROM (SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rank
      FROM scored)
WHERE rank <= 3
"""


def emb_cosine_topk_fast(spark: SparkSession, sf_dir: str, k: int = 3,
                         n_queries: int = 5) -> DataFrame:
    """Production top-k: array-native double dot products — the plan to
    run at 100 TB (broadcast queries, scan candidates, WindowGroupLimit
    top-k, no explode)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"))
    c = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
    scored = (
        F.broadcast(q).crossJoin(c)
         .filter(F.col("qid") != F.col("cid"))
         .select("qid", "cid",
                 cosine_fast(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"))
    )
    return _topk(scored, k).select("qid", "cid", "rank", "cos_sim")


def emb_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (one k-means step / IVF coarse
    quantize), quantized-exact.

    All-integer distance comparison: with per-label count n and per-dim
    quantized sums S_d, argmin_c Σ_d (x_d - S_d/n)² is computed on the
    integer-scaled form Σ_d (x_d·n - S_d)² (DECIMAL(38,0) products —
    exact in both engines since inputs are integers). The reported dist2
    is descaled to real units. Centroids are tiny -> broadcast; the scan
    side never shuffles except the final per-vector argmin window."""
    e = table(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", "label",
                  F.posexplode(quantize(F.col("embedding"))).alias("dim", "xq"))
    sums = ex.groupBy(F.col("label").alias("cand_label"), "dim").agg(
        F.count("*").alias("n"), F.sum("xq").alias("sq"))
    delta = (F.col("xq") * F.col("n") - F.col("sq")).cast("decimal(38,0)")
    scored = (
        ex.join(F.broadcast(sums), "dim")
          .groupBy("vec_id", F.col("label").alias("true_label"), "cand_label")
          .agg(
              (F.sum(delta * delta).cast("double")
               / (F.max("n") * F.max("n")).cast("double")
               / F.lit(float(Q_SCALE) ** 2)).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cand_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("vec_id", "true_label",
                      F.col("cand_label").alias("assigned_label"), "dist2")
    )


EMB_CENTROID_SQL = f"""
WITH ex AS (
  SELECT vec_id, label, i.i AS dim,
         {_XQ.format(v='embedding')} AS xq
  FROM embeddings, generate_series(1, 64) i(i)
), sums AS (
  SELECT label AS cand_label, dim, COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sq
  FROM ex GROUP BY label, dim
), dists AS (
  SELECT ex.vec_id, ex.label AS true_label, s.cand_label,
         CAST(SUM(CAST(ex.xq*s.n - s.sq AS HUGEINT) * CAST(ex.xq*s.n - s.sq AS HUGEINT)) AS DOUBLE)
           / CAST(s.n*s.n AS DOUBLE) / 1e12 AS dist2
  FROM ex JOIN sums s ON ex.dim = s.dim
  GROUP BY ex.vec_id, ex.label, s.cand_label, s.n
)
SELECT vec_id, true_label, cand_label AS assigned_label, dist2
FROM (SELECT vec_id, true_label, cand_label, dist2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cand_label ASC) AS rn
      FROM dists)
WHERE rn = 1
"""


def kmeans_assignments(spark: SparkSession, sf_dir: str, k: int = 8,
                       iters: int = 3) -> DataFrame:
    """Full k-means loop (iterative algorithm representative).

    Driver-side loop over DataFrame ops — the standard Spark shape for
    iterative ML: per iteration one shuffle (centroid means) + one
    broadcast (centroids to the assign step). Nothing is collected; the
    loop body is the quantized-exact assign step of emb_centroid_assign.
    Initialization: centroids = vectors with vec_id < k (deterministic).

    Cross-engine exactness: centroids are kept as exact rationals
    (member count ``n``, quantized coordinate sum ``sq``) instead of
    double means, so argmin_c Σ_d (x_d - sq_d/n)² is evaluated on the
    all-integer form Σ_d (x_d·n - sq_d)² / n² — bit-identical in Spark
    and DuckDB. With the fixed init and iteration count the whole loop
    is then a deterministic function of the data, and the DuckDB twin
    (``KMEANS_SQL``, the loop unrolled into chained CTEs) hash-matches.
    At 100 TB you would drop the quantization and run plain double
    centroids; the plan shape (broadcast assign + one shuffle per
    iteration) is unchanged.
    """
    assign, _cent = trained_quantizer(spark, sf_dir, k, iters)
    return assign.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist2"))


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim, xq): embeddings quantized and exploded per dim.

    Re-derived per reference rather than cached: the explode is cheap
    and an InMemoryRelation blocks AQE/codegen (measured ~25% slower
    cached at sf0.1). At real scale, persist the exploded table once
    (it is the k-means working set) and bucket it by dim."""
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.posexplode(quantize(F.col("embedding")))
                    .alias("dim", "xq"))


def _cent_dist2(rows: DataFrame, cent: DataFrame,
                id_col: str) -> DataFrame:
    """Exact rational point-to-centroid distances: per (id, cid),
    Σ_d (xq·n - sq)² / n² descaled — the shared assign/scan step."""
    # (xq·n - sq) fits long (|xq|<1e6·0.6, n≤rows); the square needs
    # DECIMAL(38,0) headroom before the 64-dim sum.
    delta = (F.col("xq") * F.col("n") - F.col("sq")).cast("decimal(38,0)")
    return (rows.join(F.broadcast(cent), "dim")
                .groupBy(id_col, "cid")
                .agg((F.sum(delta * delta).cast("double")
                      / (F.max("n") * F.max("n")).cast("double")
                      / F.lit(float(Q_SCALE) ** 2)).alias("dist2")))


def _kmeans_loop(ex: DataFrame, k: int, iters: int,
                 init_bound: int | None = None) -> tuple[DataFrame, DataFrame]:
    """The shared fixed-init fixed-iters loop. Returns (last assignment,
    the centroids REBUILT from it) — i.e. (a_iters, c_iters) in the
    oracle's CTE naming, so IVF consumers score against centroids
    consistent with the cell membership they search.

    ``init_bound`` generalizes the init for SAMPLED training: when ex
    holds only vec_id % t == 0 rows, the first k sample vectors are the
    multiples of t below k*t — pass init_bound=k*t (default k keeps the
    dense-id behavior)."""
    # init: singleton clusters from the first k vectors (n=1, sq=xq)
    cent = (ex.filter(F.col("vec_id") < (init_bound or k))
              .select(F.col("vec_id").alias("cid"), "dim",
                      F.lit(1).cast("long").alias("n"),
                      F.col("xq").alias("sq")))
    assign = None
    for _ in range(iters):
        scored = _cent_dist2(ex, cent, "vec_id")
        # argmin as ONE aggregation: min over struct(dist2, cid) orders
        # lexicographically — identical to row_number()=1 by (dist2 asc,
        # cid asc) but without the per-iteration window sort.
        best = F.min(F.struct(F.col("dist2"), F.col("cid"))).alias("b")
        assign = (scored.groupBy("vec_id").agg(best)
                        .select("vec_id",
                                F.col("b.cid").alias("cid"),
                                F.col("b.dist2").alias("dist2")))
        cent = (ex.join(assign.select("vec_id", "cid"), "vec_id")
                  .groupBy("cid", "dim")
                  .agg(F.count("*").alias("n"), F.sum("xq").alias("sq")))
    return assign, cent


_QUANTIZER_CACHE: dict = register({})


def trained_quantizer(spark: SparkSession, sf_dir: str, k: int = 8,
                      iters: int = 3) -> tuple[DataFrame, DataFrame]:
    """Train-once coarse quantizer: the (assignments, centroids) pair of
    ``_kmeans_loop``, trained ONCE per (session, corpus, k, iters) and
    memoized as lazily-localCheckpointed frames — every consumer after
    the first (kmeans_assignments, emb_ivf_trained_topk, any future ANN
    search) reuses the materialized artifact instead of re-running the
    training loop. This is the 100 TB placement: an ANN index is
    train-once / persist / probe-many, never train-per-query. For
    cross-session reuse, ``save_quantizer`` / ``load_quantizer``
    round-trip the same two frames through parquet bit-exactly (they
    are all-integer rationals: cid, dim, n, sq — no float drift).
    """
    key = (spark.sparkContext.applicationId, sf_dir, k, iters)
    hit = _QUANTIZER_CACHE.get(key)
    if hit is not None:
        return hit
    assign, cent = _kmeans_loop(_exploded(spark, sf_dir), k, iters)
    pair = (assign.localCheckpoint(eager=False),
            cent.localCheckpoint(eager=False))
    _QUANTIZER_CACHE[key] = pair
    return pair


def save_quantizer(assign: DataFrame, cent: DataFrame, path: str) -> None:
    """Persist a trained quantizer (the shareable index artifact)."""
    assign.write.mode("overwrite").parquet(path + "/assignments")
    cent.write.mode("overwrite").parquet(path + "/centroids")


def load_quantizer(spark: SparkSession,
                   path: str) -> tuple[DataFrame, DataFrame]:
    """Reload a persisted quantizer; bit-exact (all-integer columns)."""
    return (spark.read.parquet(path + "/assignments"),
            spark.read.parquet(path + "/centroids"))


def _kmeans_cte_body(k: int = 8, iters: int = 3) -> str:
    """DuckDB twin of _kmeans_loop: the fixed-count loop unrolled into
    chained CTEs (assign a{i} / recenter c{i}), same all-integer
    distance form. Ends with both a{iters} (assignments) and c{iters}
    (rebuilt centroids) so downstream consumers (IVF) can extend it."""
    parts = [f"""WITH ex AS (
  SELECT vec_id, i.i AS dim, {_XQ.format(v='embedding')} AS xq
  FROM embeddings, generate_series(1, 64) i(i)
), c0 AS (
  SELECT vec_id AS cid, dim, CAST(1 AS BIGINT) AS n, xq AS sq
  FROM ex WHERE vec_id < {k}
)"""]
    for i in range(1, iters + 1):
        parts.append(f""", s{i} AS (
  SELECT ex.vec_id, c.cid,
         CAST(SUM(CAST(ex.xq*c.n - c.sq AS HUGEINT) * CAST(ex.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS dist2
  FROM ex JOIN c{i-1} c ON ex.dim = c.dim
  GROUP BY ex.vec_id, c.cid
), a{i} AS (
  SELECT vec_id, cid, dist2
  FROM (SELECT vec_id, cid, dist2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
        FROM s{i})
  WHERE rn = 1
), c{i} AS (
  SELECT a.cid, ex.dim, COUNT(*) AS n, CAST(SUM(ex.xq) AS BIGINT) AS sq
  FROM ex JOIN a{i} a USING (vec_id)
  GROUP BY a.cid, ex.dim
)""")
    return "".join(parts)


KMEANS_SQL = (_kmeans_cte_body()
              + "\nSELECT vec_id, cid AS cluster, dist2 FROM a3")


def emb_lsh_sign_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing: 8-bit hash from the signs of the first 8
    dimensions — the candidate-prefilter that turns brute-force top-k
    into a bucket-local search at scale."""
    e = table(spark, sf_dir, "embeddings")
    bucket = sum(
        (F.when(F.element_at("embedding", j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        for j in range(8)
    )
    return (
        e.withColumn("bucket", bucket.cast("long"))
         .groupBy("bucket")
         .agg(F.count("*").alias("n_vectors"),
              F.min("vec_id").alias("min_vec_id"),
              F.countDistinct("label").alias("n_labels"))
    )


def _sign_bucket_col():
    return sum(
        (F.when(F.element_at("embedding", j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        for j in range(8)
    ).cast("long")


_BUCKET_SQL = "CAST(" + " + ".join(
    f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(8)) + " AS BIGINT)"


def emb_ivf_topk(spark: SparkSession, sf_dir: str, k: int = 2,
                 n_queries: int = 20) -> DataFrame:
    """IVF-style approximate top-k: search only candidates in the query's
    own sign-LSH cell instead of the full corpus.

    This is the 100 TB shape: the coarse quantizer (here the sign
    bucket; a trained IVF would use emb_centroid_assign cells) turns the
    O(|queries|·|corpus|) brute force into O(|queries|·cell_size) — an
    equi-join on bucket id instead of a cross join. Quantized-exact
    kernel so the oracle matches bit-for-bit."""
    e = table(spark, sf_dir, "embeddings").withColumn("bucket", _sign_bucket_col())
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), "bucket",
        quantize(F.col("embedding")).alias("qq"))
    c = e.select(F.col("vec_id").alias("cid"), "bucket",
                 quantize(F.col("embedding")).alias("cq"))
    cos = (
        dot_q(F.col("qq"), F.col("cq")).cast("double")
        / (F.sqrt(dot_q(F.col("qq"), F.col("qq")).cast("double"))
           * F.sqrt(dot_q(F.col("cq"), F.col("cq")).cast("double")))
    )
    scored = (
        F.broadcast(q).join(c, "bucket")
         .filter(F.col("qid") != F.col("cid"))
         .select("qid", "cid", cos.alias("cos_sim"))
    )
    return _topk(scored, k).select("qid", "cid", "rank", "cos_sim")


EMB_IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
q AS (SELECT vec_id AS qid, bucket, embedding AS q_emb FROM e WHERE vec_id < 20),
c AS (SELECT vec_id AS cid, bucket, embedding AS c_emb FROM e),
scored AS (
  SELECT q.qid, c.cid,
         CAST(CAST(SUM({_XQ.format(v='q_emb')} * {_XQ.format(v='c_emb')}) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM({_XQ.format(v='q_emb')} * {_XQ.format(v='q_emb')}) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM({_XQ.format(v='c_emb')} * {_XQ.format(v='c_emb')}) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM q JOIN c ON q.bucket = c.bucket, generate_series(1, 64) i(i)
  WHERE q.qid != c.cid
  GROUP BY q.qid, c.cid
)
SELECT qid, cid, rank, cos_sim
FROM (SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rank
      FROM scored)
WHERE rank <= 2
"""


EMB_LSH_BUCKETS_SQL = """
SELECT CAST({bucket} AS BIGINT) AS bucket,
       COUNT(*) AS n_vectors,
       MIN(vec_id) AS min_vec_id,
       COUNT(DISTINCT label) AS n_labels
FROM embeddings
GROUP BY 1
""".format(bucket=" + ".join(
    f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)" for j in range(8)))


_ATTACH_PUSHDOWN_MAX = 10_000

# Hash-bucketed reps-store layout (r14 — tools/bucketed_reps.py
# graduated): MAJOR index folds write the reps snapshot partitionBy
# this bucket of rep, so a k-candidate attach enumerates <= k bucket
# DIRECTORIES instead of footer-walking every snapshot file —
# independent of candidate spread, unlike range layout. The expression
# is the writer/reader contract: both sides must hash identically.
REP_BUCKETS = 64


def _rep_bucket_expr():
    return F.pmod(F.xxhash64(F.col("rep")),
                  F.lit(REP_BUCKETS)).cast("int")
"""Guard on _probe_embedding_store's candidate-rep pushdown: when a
probe's verified-candidate rep set is at most this many ids, the
vector-attach joins filter the reps log with an isin() that reaches the
parquet scan (row-group pruning) instead of streaming every stored
rep's q column (~520 B each) through the join; above it, the
driver-side id set would cost more than the scan it saves, so the
streaming join stays. 10k ids ≈ 80 KB of int64 on the driver — bounded
regardless of index size."""

_MUTANT_OFFSET = 100_000
"""Id offset separating _q_corpus's planted mutants (id >= offset) from
base vec_ids (id < offset). Shared by the corpus builder, the
embedding_store base/batch split, and emb_incremental_near_dup_pairs so
the three can never disagree; tests assert max(vec_id) < offset at
every shipped SF (a fixture with vec_id >= offset would silently
misclassify rows and collide mutant ids with base ids)."""


def _q_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized corpus ∪ planted near-duplicates. The driver embeddings
    have no true near-dups (max pairwise cosine ~0.51), so — like
    dedup.mutated_corpus for text — every vec_id % 10 == 0 gets a mutant
    copy (id + _MUTANT_OFFSET) with dimension 1 nudged by +0.05. All
    arithmetic is on the ×1e6 fixed-point ints, so both engines build
    the identical corpus bit-for-bit; mutant↔original cosine ≈ 0.999,
    every other pair < 0.52."""
    e = table(spark, sf_dir, "embeddings")
    base = e.select(F.col("vec_id").alias("id"),
                    quantize(F.col("embedding")).alias("q"))
    mut = (
        base.filter(F.col("id") % 10 == 0)
            .select((F.col("id") + _MUTANT_OFFSET).alias("id"),
                    F.transform(
                        F.col("q"),
                        lambda x, i: F.when(i == 0, x + 50000).otherwise(x)
                    ).alias("q"))
    )
    return base.unionByName(mut)


def emb_cosine_near_dup_pairs(spark: SparkSession, sf_dir: str,
                              threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate detection — the vector-space
    member of the dedup arsenal (exact / MinHash / SimHash / n-gram /
    THIS), candidate-blocked by banded sign-LSH.

    Blocking: 8 bands × 8 sign bits (64 dims exactly); a pair is a
    candidate iff it shares any band key — O(corpus·8) band rows into
    the self-join, never O(corpus²). The +0.05 perturbation can only
    flip signs inside band 0, so planted pairs always agree on bands
    1-7: recall on true near-dups is exactly 1 here, and ≥ 1-p^7 in
    general (p = per-band flip probability). Verification is the exact
    integer-quantized cosine (module docstring) ≥ threshold, so the
    DuckDB oracle reproduces the pair set bit-for-bit.

    Scale: band rows shuffle once on (band_idx, band_key); AQE handles
    hot buckets; verified pairs re-join the corpus by id (broadcast at
    moderate pair counts) for the exact kernel.
    """
    c = _q_corpus(spark, sf_dir)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            sum((F.when(F.element_at("q", b * 8 + j + 1) >= 0,
                        F.lit(1 << j)).otherwise(F.lit(0)))
                for j in range(8)).cast("long").alias("band_key"))
        for b in range(8)
    ])
    bands = c.select("id", F.explode(band_structs).alias("b")).select(
        "id", F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"))
    left = bands.select(F.col("id").alias("id1"), "band_idx", "band_key")
    right = bands.select(F.col("id").alias("id2"), "band_idx", "band_key")
    cand = (
        left.join(right, ["band_idx", "band_key"])
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2").distinct()
    )
    c1 = c.select(F.col("id").alias("id1"), F.col("q").alias("q1"))
    c2 = c.select(F.col("id").alias("id2"), F.col("q").alias("q2"))
    cos = (
        dot_q(F.col("q1"), F.col("q2")).cast("double")
        / (F.sqrt(dot_q(F.col("q1"), F.col("q1")).cast("double"))
           * F.sqrt(dot_q(F.col("q2"), F.col("q2")).cast("double")))
    )
    return (
        cand.join(c1, "id1").join(c2, "id2")
            .select("id1", "id2", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
    )


_QC_SQL = """
  SELECT vec_id AS id,
         list_transform(generate_series(1, 64),
             i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS id,
         list_transform(generate_series(1, 64),
             i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
                  + CASE WHEN i = 1 THEN 50000 ELSE 0 END) AS q
  FROM embeddings WHERE vec_id % 10 = 0
"""

_BAND_KEY_SQL = " + ".join(
    f"(CASE WHEN q[b.b * 8 + {j} + 1] >= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(8))

EMB_NEAR_DUP_SQL = f"""
WITH corpus AS ({_QC_SQL}),
bands AS (
  SELECT id, b.b AS band_idx, CAST({_BAND_KEY_SQL} AS BIGINT) AS band_key
  FROM corpus, (SELECT unnest(generate_series(0, 7)) AS b) b
),
cand AS (
  SELECT DISTINCT l.id AS id1, r.id AS id2
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.id < r.id
),
scored AS (
  SELECT id1, id2,
         CAST(CAST(SUM(c1.q[i.i] * c2.q[i.i]) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM(c1.q[i.i] * c1.q[i.i]) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM(c2.q[i.i] * c2.q[i.i]) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM cand
  JOIN corpus c1 ON c1.id = cand.id1
  JOIN corpus c2 ON c2.id = cand.id2,
  generate_series(1, 64) i(i)
  GROUP BY id1, id2
)
SELECT id1, id2, cos_sim FROM scored WHERE cos_sim >= 0.9
"""


def l2sq_q(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance of quantized vectors (diffs
    <= 2e6 in magnitude, squares <= 4e12, 64 of them — fits int64;
    integer folds are order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def emb_euclidean_topk(spark: SparkSession, sf_dir: str, k: int = 3,
                       n_queries: int = 5) -> DataFrame:
    """Brute-force euclidean top-k (nearest = smallest distance): same
    broadcast/WindowGroupLimit plan as emb_cosine_topk, but the ranking
    key is the INTEGER quantized squared distance — no sqrt anywhere in
    the comparison, so cross-engine ordering is exact by construction."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), quantize(F.col("embedding")).alias("qq"))
    c = e.select(F.col("vec_id").alias("cid"),
                 quantize(F.col("embedding")).alias("cq"))
    scored = (
        F.broadcast(q).crossJoin(c)
         .filter(F.col("qid") != F.col("cid"))
         .select("qid", "cid", l2sq_q(F.col("qq"), F.col("cq")).alias("l2sq_q"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("l2sq_q"), F.asc("cid"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k)
                  .select("qid", "cid", "rank", "l2sq_q"))


EMB_EUCLIDEAN_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings),
scored AS (
  SELECT q.qid, c.cid,
         CAST(SUM(({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})
                * ({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})) AS BIGINT) AS l2sq_q
  FROM q, c, generate_series(1, 64) i(i)
  WHERE q.qid != c.cid
  GROUP BY q.qid, c.cid
)
SELECT qid, cid, rank, l2sq_q
FROM (SELECT qid, cid, l2sq_q,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2sq_q ASC, cid ASC) AS rank
      FROM scored)
WHERE rank <= 3
"""


def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard embedding
    compression step before shipping vectors to an ANN index (4x smaller
    than float32): q_i = round(x_i / scale * 127), scale = max|x_i|.

    Pure per-row transform, no shuffle — at 100 TB this pipelines with
    the parquet scan. Cross-engine exactness: scale is a promoted
    float32 (no arithmetic, exact); x/scale*127 is a fixed IEEE op
    sequence; rounding targets are INTEGER boundaries whose ties are
    representable doubles (same argument as qsum); the error statistic
    is per-element quantized to int64 then exactly summed.
    """
    e = table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    s = F.greatest(
        F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))),
        F.lit(1e-12))
    e = e.select("vec_id", "embedding", s.alias("scale"))
    q = F.transform(
        F.col("embedding"),
        lambda v: F.round(v.cast("double") / F.col("scale") * 127, 0)
                   .cast("bigint"))
    e = e.select("vec_id", "embedding", "scale", q.alias("q"))
    # per-element squared dequantization error, fixed-point 1e18
    err_sq_q = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("q"),
            lambda v, qi: F.round(
                F.pow(v.cast("double") - qi.cast("double") * F.col("scale") / 127,
                      F.lit(2)) * 1e18, 0).cast("bigint")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return e.select(
        "vec_id", "scale",
        F.aggregate(F.col("q"), F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("q_sum"),
        F.array_min(F.col("q")).alias("q_min"),
        F.array_max(F.col("q")).alias("q_max"),
        F.size(F.filter(F.col("q"), lambda v: F.abs(v) == 127)).cast("long")
         .alias("n_saturated"),
        err_sq_q.alias("err_sq_q18"),
    )


EMB_INT8_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding,
                    v -> abs(CAST(v AS DOUBLE)))), 1e-12) AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, embedding, scale,
         list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) / scale * 127) AS BIGINT)) AS qv
  FROM s
)
SELECT vec_id, scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS BIGINT) AS q_min,
       CAST(list_max(qv) AS BIGINT) AS q_max,
       CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_saturated,
       CAST(list_sum(list_zip(embedding, qv).list_transform(
              p -> CAST(round(pow(CAST(p[1] AS DOUBLE)
                                  - CAST(p[2] AS DOUBLE) * scale / 127, 2)
                              * 1e18) AS BIGINT)))
            AS BIGINT) AS err_sq_q18
FROM q
"""


IVF_NPROBE = 2
IVF_K = 3
IVF_QUERIES = 5


def emb_ivf_trained_topk(spark: SparkSession, sf_dir: str,
                         k: int = IVF_K, n_queries: int = IVF_QUERIES,
                         nprobe: int = IVF_NPROBE, kclusters: int = 8,
                         iters: int = 3) -> DataFrame:
    """True trained IVF: the k-means coarse quantizer (exact rational
    centroids, ``trained_quantizer`` — trained once per session/corpus
    and shared with ``kmeans_assignments``, persistable via
    ``save_quantizer``) partitions the corpus into cells; each query
    scores the centroid table (tiny, broadcast), probes its ``nprobe``
    nearest cells, and runs exact top-k only inside them. This is the
    composition a production ANN index runs — train ONCE, assign,
    probe-limited search per query — and the cost model that survives
    100 TB: per query O(kclusters) centroid distances plus
    O(corpus·nprobe/kclusters) exact distances instead of O(corpus),
    with zero training cost on the query path after the first build.

    Pair distances are pure int64 (Σ_d (xq_q - xq_c)² ≤ 64·(1.2e6)²
    ≈ 1e14), ranked on the exact integer, descaled only for display —
    bit-identical to the unrolled DuckDB twin.
    """
    ex = _exploded(spark, sf_dir)
    assign, cent = trained_quantizer(spark, sf_dir, kclusters, iters)
    qx = (ex.filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("qid"), "dim",
                    F.col("xq").alias("qxq")))
    # probe selection: per query, the nprobe nearest trained centroids
    qd = _cent_dist2(qx.withColumnRenamed("qxq", "xq"), cent, "qid")
    wq = Window.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("cid"))
    probes = (qd.withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") <= nprobe).select("qid", "cid"))
    # candidates: cell members of probed cells (minus the query itself)
    cand = (probes.join(assign.select("vec_id", "cid"), "cid")
                  .filter(F.col("vec_id") != F.col("qid"))
                  .select("qid", F.col("vec_id").alias("cand")))
    # exact integer distance over the probed candidates only
    cx = ex.select(F.col("vec_id").alias("cand"), "dim",
                   F.col("xq").alias("cxq"))
    d = F.col("qxq") - F.col("cxq")
    scored = (cand.join(qx, "qid").join(cx, ["cand", "dim"])
                  .groupBy("qid", "cand")
                  .agg(F.sum(d * d).alias("dist2_q")))
    wk = Window.partitionBy("qid").orderBy(F.asc("dist2_q"), F.asc("cand"))
    return (scored.withColumn("rank", F.row_number().over(wk))
                  .filter(F.col("rank") <= k)
                  .select("qid", "cand", "rank",
                          (F.col("dist2_q").cast("double")
                           / F.lit(float(Q_SCALE) ** 2)).alias("dist2")))


EMB_IVF_TRAINED_SQL = _kmeans_cte_body() + f"""
, qx AS (
  SELECT vec_id AS qid, dim, xq AS qxq FROM ex WHERE vec_id < {IVF_QUERIES}
), qd AS (
  SELECT q.qid, c.cid,
         CAST(SUM(CAST(q.qxq*c.n - c.sq AS HUGEINT) * CAST(q.qxq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS dist2
  FROM qx q JOIN c3 c ON q.dim = c.dim
  GROUP BY q.qid, c.cid
), probes AS (
  SELECT qid, cid
  FROM (SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2 ASC, cid ASC) AS rn
        FROM qd)
  WHERE rn <= {IVF_NPROBE}
), cand AS (
  SELECT p.qid, a.vec_id AS cand
  FROM probes p JOIN a3 a USING (cid)
  WHERE a.vec_id != p.qid
), scored AS (
  SELECT c.qid, c.cand,
         SUM((q.qxq - x.xq) * (q.qxq - x.xq)) AS dist2_q
  FROM cand c
  JOIN qx q ON q.qid = c.qid
  JOIN ex x ON x.vec_id = c.cand AND x.dim = q.dim
  GROUP BY c.qid, c.cand
)
SELECT qid, cand, rank, CAST(dist2_q AS DOUBLE) / 1e12 AS dist2
FROM (SELECT qid, cand, dist2_q,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2_q ASC, cand ASC) AS rank
      FROM scored)
WHERE rank <= {IVF_K}
"""


PQ_SUBSPACES = 4
PQ_DIMS_PER = 16
PQ_K = 4
PQ_ITERS = 2


def emb_pq_encode(spark: SparkSession, sf_dir: str,
                  subspaces: int = PQ_SUBSPACES, k: int = PQ_K,
                  iters: int = PQ_ITERS) -> DataFrame:
    """Product quantization: split each 64-dim vector into 4 sub-vectors
    of 16 dims, train an independent k-means codebook (k=4, 2 iters,
    exact rational centroids) per subspace, and encode every vector as
    its 4 nearest-centroid codes — 64 floats compressed to 4 small ints
    plus shared codebooks, the memory layout modern billion-vector ANN
    indexes store. Output carries the per-vector total assignment
    distortion (sum of final subspace assign distances, fixed addition
    order) so compression quality is part of the hash check.

    Scale: subspace training loops touch disjoint dim slices of one
    exploded frame; codebooks stay broadcast-size (k·dims rows); the
    encode is the same broadcast assign as IVF. The DuckDB twin unrolls
    all four training loops."""
    books = pq_codebooks(spark, sf_dir, subspaces, k, iters)
    out = None
    dsum = None
    for s in range(subspaces):
        assign, _cent = books[s]
        a = assign.select("vec_id", F.col("cid").alias(f"code{s}"),
                          F.col("dist2").alias(f"_d{s}"))
        out = a if out is None else out.join(a, "vec_id")
        d = F.col(f"_d{s}")
        dsum = d if dsum is None else dsum + d
    return out.select(
        "vec_id", *[f"code{s}" for s in range(subspaces)],
        dsum.alias("dist2_total"))


def _pq_cte_parts(subspaces: int = PQ_SUBSPACES, k: int = PQ_K,
                  iters: int = PQ_ITERS) -> list[str]:
    """Shared CTE prefix for the PQ family: per-subspace exploded slices,
    unrolled codebook training, final assignments a{iters}_{s} and
    rebuilt codebooks c{iters}_{s}."""
    parts = [f"""WITH ex AS (
  SELECT vec_id, i.i AS dim, {_XQ.format(v='embedding')} AS xq
  FROM embeddings, generate_series(1, 64) i(i)
)"""]
    for s in range(subspaces):
        lo, hi = s * PQ_DIMS_PER + 1, (s + 1) * PQ_DIMS_PER  # 1-based
        parts.append(f""", ex{s} AS (
  SELECT * FROM ex WHERE dim BETWEEN {lo} AND {hi}
), c0_{s} AS (
  SELECT vec_id AS cid, dim, CAST(1 AS BIGINT) AS n, xq AS sq
  FROM ex{s} WHERE vec_id < {k}
)""")
        for i in range(1, iters + 1):
            parts.append(f""", s{i}_{s} AS (
  SELECT e.vec_id, c.cid,
         CAST(SUM(CAST(e.xq*c.n - c.sq AS HUGEINT) * CAST(e.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS dist2
  FROM ex{s} e JOIN c{i-1}_{s} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
), a{i}_{s} AS (
  SELECT vec_id, cid, dist2
  FROM (SELECT vec_id, cid, dist2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
        FROM s{i}_{s})
  WHERE rn = 1
), c{i}_{s} AS (
  SELECT a.cid, e.dim, COUNT(*) AS n, CAST(SUM(e.xq) AS BIGINT) AS sq
  FROM ex{s} e JOIN a{i}_{s} a USING (vec_id)
  GROUP BY a.cid, e.dim
)""")
    return parts


def _pq_sql(subspaces: int = PQ_SUBSPACES, k: int = PQ_K,
            iters: int = PQ_ITERS) -> str:
    parts = _pq_cte_parts(subspaces, k, iters)
    codes = ", ".join(f"a{iters}_{s}.cid AS code{s}" for s in range(subspaces))
    total = " + ".join(f"a{iters}_{s}.dist2" for s in range(subspaces))
    joins = f"a{iters}_0" + "".join(
        f" JOIN a{iters}_{s} USING (vec_id)" for s in range(1, subspaces))
    parts.append(f"""
SELECT vec_id, {codes}, {total} AS dist2_total
FROM {joins}""")
    return "".join(parts)


EMB_PQ_ENCODE_SQL = _pq_sql()


def pq_codebooks(spark: SparkSession, sf_dir: str,
                 subspaces: int = PQ_SUBSPACES, k: int = PQ_K,
                 iters: int = PQ_ITERS) -> list[tuple[DataFrame, DataFrame]]:
    """Train-once PQ codebooks: per-subspace (assignments, centroids)
    pairs, memoized per (session, corpus, geometry) exactly like
    ``trained_quantizer`` — the encode pass and every ADC search reuse
    one training run instead of re-fitting 4 codebooks per query."""
    key = (spark.sparkContext.applicationId, sf_dir, "pq",
           subspaces, k, iters)
    hit = _QUANTIZER_CACHE.get(key)
    if hit is not None:
        return hit
    ex = _exploded(spark, sf_dir)
    books = []
    for s in range(subspaces):
        lo, hi = s * PQ_DIMS_PER, (s + 1) * PQ_DIMS_PER
        exs = ex.filter((F.col("dim") >= lo) & (F.col("dim") < hi))
        assign, cent = _kmeans_loop(exs, k, iters)
        books.append((assign.localCheckpoint(eager=False),
                      cent.localCheckpoint(eager=False)))
    _QUANTIZER_CACHE[key] = books
    return books


PQ_ADC_QUERIES = 3
PQ_ADC_TOP = 3


def emb_pq_adc_topk(spark: SparkSession, sf_dir: str,
                    subspaces: int = PQ_SUBSPACES, k: int = PQ_K,
                    iters: int = PQ_ITERS, n_queries: int = PQ_ADC_QUERIES,
                    topk: int = PQ_ADC_TOP) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-compressed corpus —
    the search half of product quantization (emb_pq_encode is the build
    half): each query precomputes a tiny lookup table of exact distances
    from its sub-vectors to every codebook centroid, and a candidate's
    distance estimate is the SUM of 4 table lookups on its codes — the
    memory-bandwidth-bound kernel billion-vector IVF-PQ indexes run.

    Scale shape: the per-query LUT is |queries|·subspaces·k rows
    (broadcast); candidates join on their small int codes, never on the
    raw vectors — the scan reads 4 ints per vector, which is the entire
    point of PQ at 100 TB. Exactness: LUT entries are the established
    rational centroid distances (integer sums, two exact double
    divisions); the 4-term add is fixed-order — bit-identical to the
    unrolled DuckDB twin.
    """
    ex = _exploded(spark, sf_dir)
    books = pq_codebooks(spark, sf_dir, subspaces, k, iters)
    encoded = None   # (vec_id, code0..code{S-1})
    luts = []        # per subspace: (qid, code{s}, d{s})
    for s in range(subspaces):
        lo, hi = s * PQ_DIMS_PER, (s + 1) * PQ_DIMS_PER
        exs = ex.filter((F.col("dim") >= lo) & (F.col("dim") < hi))
        assign, cent = books[s]
        a = assign.select("vec_id", F.col("cid").alias(f"code{s}"))
        encoded = a if encoded is None else encoded.join(a, "vec_id")
        qx = (exs.filter(F.col("vec_id") < n_queries)
                 .select(F.col("vec_id").alias("qid"), "dim", "xq"))
        luts.append(_cent_dist2(qx, cent, "qid")
                    .select("qid", F.col("cid").alias(f"code{s}"),
                            F.col("dist2").alias(f"d{s}")))
    qids = (table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("qid")))
    cand = encoded.crossJoin(F.broadcast(qids)).filter(
        F.col("vec_id") != F.col("qid"))
    for s in range(subspaces):
        cand = cand.join(F.broadcast(luts[s]), ["qid", f"code{s}"])
    adc = F.col("d0")
    for s in range(1, subspaces):
        adc = adc + F.col(f"d{s}")
    wk = Window.partitionBy("qid").orderBy(F.asc("adc_dist2"),
                                           F.asc("vec_id"))
    return (cand.withColumn("adc_dist2", adc)
                .withColumn("rank", F.row_number().over(wk).cast("long"))
                .filter(F.col("rank") <= topk)
                .select("qid", F.col("vec_id").alias("cand"), "rank",
                        "adc_dist2"))


def _pq_adc_sql(subspaces: int = PQ_SUBSPACES, k: int = PQ_K,
                iters: int = PQ_ITERS, n_queries: int = PQ_ADC_QUERIES,
                topk: int = PQ_ADC_TOP) -> str:
    parts = _pq_cte_parts(subspaces, k, iters)
    for s in range(subspaces):
        lo, hi = s * PQ_DIMS_PER + 1, (s + 1) * PQ_DIMS_PER  # 1-based dims
        parts.append(f""", lut{s} AS (
  SELECT q.vec_id AS qid, c.cid,
         CAST(SUM(CAST(q.xq*c.n - c.sq AS HUGEINT) * CAST(q.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS d
  FROM ex{s} q JOIN c{iters}_{s} c ON q.dim = c.dim
  WHERE q.vec_id < {n_queries}
  GROUP BY q.vec_id, c.cid
)""")
    code_joins = f"a{iters}_0 e0" + "".join(
        f" JOIN a{iters}_{s} e{s} USING (vec_id)"
        for s in range(1, subspaces))
    lut_joins = "".join(
        f" JOIN lut{s} ON lut{s}.qid = q.qid AND lut{s}.cid = e{s}.cid"
        for s in range(subspaces))
    adc = " + ".join(f"lut{s}.d" for s in range(subspaces))
    parts.append(f""", qids AS (
  SELECT vec_id AS qid FROM embeddings WHERE vec_id < {n_queries}
)
SELECT qid, cand, rank, adc_dist2
FROM (
  SELECT q.qid, e0.vec_id AS cand, {adc} AS adc_dist2,
         ROW_NUMBER() OVER (PARTITION BY q.qid
                            ORDER BY {adc} ASC, e0.vec_id ASC) AS rank
  FROM {code_joins}
  CROSS JOIN qids q{lut_joins}
  WHERE e0.vec_id != q.qid
)
WHERE rank <= {topk}""")
    return "".join(parts)


EMB_PQ_ADC_SQL = _pq_adc_sql()


IVFPQ_QUERIES = 3
IVFPQ_NPROBE = 3
IVFPQ_TOP = 3


def emb_ivfpq_topk(spark: SparkSession, sf_dir: str,
                   kclusters: int = 8, iters: int = 3,
                   nprobe: int = IVFPQ_NPROBE,
                   n_queries: int = IVFPQ_QUERIES,
                   topk: int = IVFPQ_TOP,
                   subspaces: int = PQ_SUBSPACES, pqk: int = PQ_K,
                   pq_iters: int = PQ_ITERS) -> DataFrame:
    """IVF-PQ: the full billion-vector ANN composition — the trained
    coarse quantizer (``trained_quantizer``) restricts each query to its
    ``nprobe`` nearest cells, and candidates inside those cells are
    scored by PQ asymmetric distance (``pq_codebooks`` LUT lookups on
    their 4 small-int codes), never by their raw vectors. This is the
    index layout FAISS/SCaNN-style systems run at 10^9+ vectors: the
    probe step touches O(kclusters) centroid rows per query, the scan
    step reads nprobe/kclusters of the corpus at 4 ints per vector, and
    both trained artifacts are session-memoized (train once, probe
    many).

    Exactness: probe selection and LUT entries are the established
    exact-rational centroid distances; the 4-term ADC add is
    fixed-order; ranking ties break on vec_id — bit-identical to the
    composed unrolled-CTE oracle.
    """
    ex = _exploded(spark, sf_dir)
    assign, cent = trained_quantizer(spark, sf_dir, kclusters, iters)
    books = pq_codebooks(spark, sf_dir, subspaces, pqk, pq_iters)
    # coarse probe: nprobe nearest trained centroids per query
    qx = (ex.filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("qid"), "dim", "xq"))
    qd = _cent_dist2(qx, cent, "qid")
    wq = Window.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("cid"))
    probes = (qd.withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") <= nprobe).select("qid", "cid"))
    cand = (probes.join(assign.select("vec_id", "cid"), "cid")
                  .filter(F.col("vec_id") != F.col("qid"))
                  .select("qid", "vec_id"))
    # PQ codes for candidates + per-query subspace LUTs
    encoded = None
    luts = []
    for s in range(subspaces):
        lo, hi = s * PQ_DIMS_PER, (s + 1) * PQ_DIMS_PER
        a, cb = books[s]
        enc = a.select("vec_id", F.col("cid").alias(f"code{s}"))
        encoded = enc if encoded is None else encoded.join(enc, "vec_id")
        qxs = qx.filter((F.col("dim") >= lo) & (F.col("dim") < hi))
        luts.append(_cent_dist2(qxs, cb, "qid")
                    .select("qid", F.col("cid").alias(f"code{s}"),
                            F.col("dist2").alias(f"d{s}")))
    scored = cand.join(encoded, "vec_id")
    for s in range(subspaces):
        scored = scored.join(F.broadcast(luts[s]), ["qid", f"code{s}"])
    adc = F.col("d0")
    for s in range(1, subspaces):
        adc = adc + F.col(f"d{s}")
    wk = Window.partitionBy("qid").orderBy(F.asc("adc_dist2"),
                                           F.asc("vec_id"))
    return (scored.withColumn("adc_dist2", adc)
                  .withColumn("rank", F.row_number().over(wk).cast("long"))
                  .filter(F.col("rank") <= topk)
                  .select("qid", F.col("vec_id").alias("cand"), "rank",
                          "adc_dist2"))


def _ivfpq_sql(kclusters: int = 8, iters: int = 3,
               nprobe: int = IVFPQ_NPROBE, n_queries: int = IVFPQ_QUERIES,
               topk: int = IVFPQ_TOP, subspaces: int = PQ_SUBSPACES,
               pqk: int = PQ_K, pq_iters: int = PQ_ITERS) -> str:
    # coarse quantizer CTEs (defines ex, a{iters}, c{iters}) + PQ CTEs
    # (same ex definition — drop the duplicate WITH prefix).
    parts = [_kmeans_cte_body(kclusters, iters)]
    parts.extend(_pq_cte_parts(subspaces, pqk, pq_iters)[1:])
    parts.append(f""", qx AS (
  SELECT vec_id AS qid, dim, xq FROM ex WHERE vec_id < {n_queries}
), qd AS (
  SELECT q.qid, c.cid,
         CAST(SUM(CAST(q.xq*c.n - c.sq AS HUGEINT) * CAST(q.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS dist2
  FROM qx q JOIN c{iters} c ON q.dim = c.dim
  GROUP BY q.qid, c.cid
), probes AS (
  SELECT qid, cid
  FROM (SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2 ASC, cid ASC) AS rn
        FROM qd)
  WHERE rn <= {nprobe}
), cand AS (
  SELECT p.qid, a.vec_id
  FROM probes p JOIN a{iters} a USING (cid)
  WHERE a.vec_id != p.qid
)""")
    for s in range(subspaces):
        parts.append(f""", lut{s} AS (
  SELECT q.qid, c.cid,
         CAST(SUM(CAST(q.xq*c.n - c.sq AS HUGEINT) * CAST(q.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS d
  FROM qx q JOIN c{pq_iters}_{s} c ON q.dim = c.dim
  WHERE q.dim BETWEEN {s * PQ_DIMS_PER + 1} AND {(s + 1) * PQ_DIMS_PER}
  GROUP BY q.qid, c.cid
)""")
    code_joins = "".join(
        f" JOIN a{pq_iters}_{s} e{s} ON e{s}.vec_id = cand.vec_id"
        for s in range(subspaces))
    lut_joins = "".join(
        f" JOIN lut{s} ON lut{s}.qid = cand.qid AND lut{s}.cid = e{s}.cid"
        for s in range(subspaces))
    adc = " + ".join(f"lut{s}.d" for s in range(subspaces))
    parts.append(f"""
SELECT qid, cand, rank, adc_dist2
FROM (
  SELECT cand.qid, cand.vec_id AS cand, {adc} AS adc_dist2,
         ROW_NUMBER() OVER (PARTITION BY cand.qid
                            ORDER BY {adc} ASC, cand.vec_id ASC) AS rank
  FROM cand{code_joins}{lut_joins}
)
WHERE rank <= {topk}""")
    return "".join(parts)


EMB_IVFPQ_SQL = _ivfpq_sql()


PREFIX_DIMS = 16
PREFIX_SHORTLIST = 20


def emb_prefix_rerank_topk(spark: SparkSession, sf_dir: str,
                           prefix_dims: int = PREFIX_DIMS,
                           shortlist: int = PREFIX_SHORTLIST,
                           k: int = 3, n_queries: int = 5) -> DataFrame:
    """Matryoshka-style two-stage search: rank the WHOLE corpus by the
    distance over only the first ``prefix_dims`` dimensions (the cheap
    filter — MRL-trained embeddings front-load information, so a prefix
    is a usable coarse embedding), shortlist the best ``shortlist``
    candidates, then rerank just those by the exact full-dimension
    distance. The adaptive-retrieval recipe modern embedding models
    ship with.

    Scale shape: stage 1 projects vectors to the prefix BEFORE any
    join/shuffle — in a columnar layout with dimension-split storage it
    reads prefix_dims/64 of the vector bytes for the corpus-wide pass;
    stage 2 fetches full vectors for shortlist rows only (a semi-join
    by id, |queries|·shortlist rows). Exactness: both stages rank on
    integer quantized distances with id tie-breaks.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), quantize(F.col("embedding")).alias("qq"))
    c = e.select(F.col("vec_id").alias("cid"),
                 quantize(F.col("embedding")).alias("cq"))
    qp = q.select("qid", F.slice("qq", 1, prefix_dims).alias("qp"))
    cp = c.select("cid", F.slice("cq", 1, prefix_dims).alias("cp"))
    stage1 = (F.broadcast(qp).crossJoin(cp)
               .filter(F.col("qid") != F.col("cid"))
               .select("qid", "cid",
                       l2sq_q(F.col("qp"), F.col("cp")).alias("pfx_d")))
    w1 = Window.partitionBy("qid").orderBy(F.asc("pfx_d"), F.asc("cid"))
    short = (stage1.withColumn("prn", F.row_number().over(w1))
                   .filter(F.col("prn") <= shortlist).select("qid", "cid"))
    rerank = (short.join(c, "cid").join(F.broadcast(q), "qid")
                   .select("qid", "cid",
                           l2sq_q(F.col("qq"), F.col("cq")).alias("l2sq_q")))
    w2 = Window.partitionBy("qid").orderBy(F.asc("l2sq_q"), F.asc("cid"))
    return (rerank.withColumn("rank", F.row_number().over(w2).cast("long"))
                  .filter(F.col("rank") <= k)
                  .select("qid", "cid", "rank", "l2sq_q"))


EMB_PREFIX_RERANK_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings),
pfx AS (
  SELECT q.qid, c.cid,
         CAST(SUM(({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})
                * ({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})) AS BIGINT) AS pfx_d
  FROM q, c, generate_series(1, {PREFIX_DIMS}) i(i)
  WHERE q.qid != c.cid
  GROUP BY q.qid, c.cid
),
short AS (
  SELECT qid, cid
  FROM (SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY pfx_d ASC, cid ASC) AS prn
        FROM pfx)
  WHERE prn <= {PREFIX_SHORTLIST}
),
rerank AS (
  SELECT s.qid, s.cid,
         CAST(SUM(({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})
                * ({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})) AS BIGINT) AS l2sq_q
  FROM short s
  JOIN q ON q.qid = s.qid
  JOIN c ON c.cid = s.cid
  CROSS JOIN generate_series(1, 64) i(i)
  GROUP BY s.qid, s.cid
)
SELECT qid, cid, rank, l2sq_q
FROM (SELECT qid, cid, l2sq_q,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2sq_q ASC, cid ASC) AS rank
      FROM rerank)
WHERE rank <= 3
"""


SEMDEDUP_TRAIN_TARGET = 2000  # k-means training sample size ceiling


SEMDEDUP_CLUSTER_CAP = 64  # target max cluster size C (bounds pair work)


def _semdedup_params(n: int) -> tuple[int, int]:
    """(k clusters, training sample stride) as a function of corpus
    size: k = max(8, isqrt(n), ceil(n/C)) with constant target cluster
    size C = SEMDEDUP_CLUSTER_CAP. Published SemDeDup bounds the cluster
    SIZE, not the cluster count: with size bounded by ~C, total
    in-cluster pair-verify work is O(N·C) — LINEAR in corpus size —
    where the earlier k = isqrt(n) shape let cluster size grow as √N
    and pair work as N^1.5 (measured 6.6x at 10x data in the round-6
    sweep; ~1000x at 100x). The ceil(n/C) term starts binding at
    n > C² (4096 vectors — above the sf0.01/sf0.1 fixtures, below the
    sf1 sweep, so the sweep exercises the linear regime). Assign cost
    through the routing ladder (_hier_levels/_route_hier) is
    N·2√k below HIER3_MIN_K and N·3·k^(1/3) above it — the k^(1/3)
    ladder retired the last super-linear embedding term. Training
    runs on every t-th vector so the iterative loop's cost is bounded
    by SEMDEDUP_TRAIN_TARGET vectors regardless of N. Both are exact
    integer arithmetic the oracle reproduces from COUNT(*)
    (FLOOR(SQRT(n)) == isqrt(n) for n far below 2^52). Requires
    k <= n/t, i.e. n <= CLUSTER_CAP·TRAIN_TARGET (128k vectors with the
    current constants; past that, raise TRAIN_TARGET proportionally —
    training cost stays sample·k — or train hierarchically)."""
    return (max(8, math.isqrt(n),
                (n + SEMDEDUP_CLUSTER_CAP - 1) // SEMDEDUP_CLUSTER_CAP),
            max(1, n // SEMDEDUP_TRAIN_TARGET))


def _semdedup_centroids(spark: SparkSession, sf_dir: str,
                        iters: int = 3) -> DataFrame:
    """Train-once memoized SemDeDup quantizer: k-means over the sampled
    training set with corpus-size-derived (k, t)."""
    key = (spark.sparkContext.applicationId, sf_dir, "semdedup_cent")
    hit = _QUANTIZER_CACHE.get(key)
    if hit is not None:
        return hit
    n = table(spark, sf_dir, "embeddings").count()
    k, t = _semdedup_params(n)
    ex = _exploded(spark, sf_dir)
    _, cent = _kmeans_loop(ex.filter(F.col("vec_id") % t == 0), k, iters,
                           init_bound=k * t)
    cent = cent.localCheckpoint(eager=False)
    _QUANTIZER_CACHE[key] = cent
    return cent


def _cent_arrays(cent: DataFrame) -> DataFrame:
    """Centroid table folded to ARRAY form for broadcast assigns: per
    cid its 64-slot sq vector (collect_list bounded by the dimension
    count, not by data), member count n, and Σsq² in decimal."""
    return (cent.groupBy("cid")
                .agg(F.max("n").alias("n"),
                     F.array_sort(F.collect_list(F.struct("dim", "sq")))
                      .alias("ds"),
                     F.sum(F.col("sq").cast("decimal(38,0)") * F.col("sq"))
                      .alias("b2"))
                .select("cid", "n",
                        F.transform("ds", lambda s: s["sq"]).alias("sqv"),
                        "b2"))


HIER_SUPER_FLOOR = 4

HIER3_MIN_K = 512  # three-level routing activates at this k


def _icbrt(n: int) -> int:
    """Exact integer cube root (floor), no float trust: seed with the
    float estimate, correct by integer comparison — round(1000^(1/3))
    style off-by-ones cannot survive the adjustment loops."""
    c = max(1, round(n ** (1.0 / 3.0)))
    while c * c * c > n:
        c -= 1
    while (c + 1) ** 3 <= n:
        c += 1
    return c


def _hier_levels(k: int) -> tuple[int, int]:
    """(k1 supers, k2 tops) for the routing ladder, derived from the
    cluster count k by exact integer arithmetic the oracle reproduces:
    small k keeps the proven two-level path (k2 == k1 == isqrt(k) —
    the top stage degenerates to the super stage exactly, see
    _route_hier); k >= HIER3_MIN_K switches to the balanced k^(1/3)
    ladder (k1 = icbrt(k)², k2 = icbrt(k)) that makes assign cost
    N·3·k^(1/3) — the last super-linear embedding term
    (N·2√(N/C) ≈ N^1.5/√C) goes away."""
    if k >= HIER3_MIN_K:
        c = _icbrt(k)
        return c * c, c
    k1 = max(HIER_SUPER_FLOOR, math.isqrt(k))
    return k1, k1


def _route_hier(c: DataFrame, carr: DataFrame, k1: int,
                k2: int) -> DataFrame:
    """Hierarchical coarse-quantizer routing ladder, shared by
    emb_hier_assign and emb_semdedup_prune's assign stage: route each
    vector through the k2 TOP centroids first, then the supers of its
    top cell, then argmin only over the children of its super-cell —
    N·(k2 + k1/k2 + k/k1) work instead of the flat N·k; with the
    balanced k^(1/3) ladder that is N·3·k^(1/3), the
    inverted-multi-index shape billion-vector ANN systems use.

    When k2 == k1 (small-k regime from _hier_levels) the top stage
    reduces EXACTLY to the two-level router this generalizes: tops ==
    supers, each super's nearest top is itself (mean-to-mean distance
    0; identical-centroid ties collapse to the smallest cid on BOTH
    the super→top and vec→top argmins, so the final super choice is
    the same (d2 asc, scid asc) minimum the flat super scan picks —
    the reduction is provable, and the sf0.01/sf0.001 hash gates
    re-proved it empirically).

    Implementation is an Arrow-batched NUMPY kernel (mapInPandas), the
    FAISS-style routing loop: the centroid table is vocabulary-sized
    (k ≤ 2000 rows), so it collects once and rides the task closure;
    per batch the vector·centroid dot blocks run as int64 GEMM — exact,
    |xq·sq| ≤ 2^55, 64-dim sums ≤ 2^61 — and the expanded-square
    numerators ns²·n2 − 2·ns·dot + b2 combine in PYTHON INTS (object
    arrays; they exceed int64, exactly like the engine's old
    decimal(38,0) path), then convert to float64 (correctly rounded,
    same as a CAST) and divide in the oracle's exact op order. The
    expression/higher-order-function form this replaces evaluated
    every dot interpreted (CodegenFallback) — 15.1s of a 19.9s sf3 run
    was this routing; the GEMM kernel is ~2s. Distances, argmin tie
    rules (d2 asc, cid asc — numpy argmin's first-hit over
    cid-ascending columns), and the routed count are bit-identical to
    the _hier_route_cte DuckDB twin.

    Inputs: c = quantized vectors (id, q, ...); carr = centroid ARRAY
    table (cid, n, sqv, b2) from _cent_arrays. Supers are the k1
    children with smallest cid, tops the k2 smallest (singleton
    promotion — no second training loop). Returns (id, scid, cid,
    routed = children scanned in the final stage)."""
    import numpy as np
    import pandas as pd

    rows = sorted(carr.collect(), key=lambda r: r["cid"])
    cids = [r["cid"] for r in rows]
    ns = {r["cid"]: int(r["n"]) for r in rows}
    sq = {r["cid"]: [int(v) for v in r["sqv"]] for r in rows}
    b2 = {r["cid"]: int(r["b2"]) for r in rows}
    sup_ids = cids[:k1]
    top_ids = cids[:k2]
    q2 = float(Q_SCALE) ** 2

    # child -> super: k x k1 exact rational mean-to-mean distances,
    # driver math on the collected table (oracle: csd/child_super).
    sq_all = np.array([sq[cid] for cid in cids], dtype=object)
    n_all = np.array([ns[cid] for cid in cids], dtype=object)
    d2cs = np.empty((len(cids), len(sup_ids)), dtype=np.float64)
    for j, s in enumerate(sup_ids):
        diff = sq_all * ns[s] - np.array(sq[s], dtype=object)[None, :] \
            * n_all[:, None]
        num = (diff * diff).sum(axis=1)
        d2cs[:, j] = (num.astype(np.float64)
                      / (n_all * n_all).astype(np.float64)
                      / float(ns[s] * ns[s]) / q2)
    cell: dict = {}
    for i, cid in enumerate(cids):
        cell.setdefault(sup_ids[int(np.argmin(d2cs[i]))], []).append(cid)

    # super -> top: the same rational distances, reusing the child x
    # super block (supers are the first k1 children rows, tops the
    # first k2 super columns — oracle: ssd/super_top slice of csd).
    scell: dict = {}
    for i, s in enumerate(sup_ids):
        scell.setdefault(top_ids[int(np.argmin(d2cs[i, :k2]))],
                         []).append(s)

    sqt_mat = np.array([sq[t] for t in top_ids], dtype=np.int64)
    scell_mats = {t: (np.array([sq[s] for s in ss], dtype=np.int64), ss)
                  for t, ss in scell.items()}
    cell_mats = {s: (np.array([sq[cc] for cc in ch], dtype=np.int64), ch)
                 for s, ch in cell.items()}

    def _d2(n2o, dot, clist):
        """float64 distance block from object-int n2 and int64 dots,
        in the oracle's exact op order (numerator -> /n² -> /Q²)."""
        out = np.empty((len(n2o), len(clist)), dtype=np.float64)
        for j, cc in enumerate(clist):
            num = ns[cc] * ns[cc] * n2o - 2 * ns[cc] \
                * dot[:, j].astype(object) + b2[cc]
            out[:, j] = (num.astype(np.float64)
                         / float(ns[cc] * ns[cc]) / q2)
        return out

    def route(batches):
        import pyarrow as pa

        for rb in batches:
            if not rb.num_rows:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            X = _list_matrix(rb.column(1), np.int64)
            n2o = (X * X).sum(axis=1).astype(object)
            ti = np.argmin(_d2(n2o, X @ sqt_mat.T, top_ids), axis=1)
            oid, oscid, ocid, orouted = [], [], [], []
            for tj, t in enumerate(top_ids):
                tmask = ti == tj
                if not tmask.any():
                    continue
                sqs_mat, ss = scell_mats[t]
                si = np.argmin(_d2(n2o[tmask], X[tmask] @ sqs_mat.T, ss),
                               axis=1)
                for sj, s in enumerate(ss):
                    mask = np.zeros(len(ids), dtype=bool)
                    mask[np.flatnonzero(tmask)[si == sj]] = True
                    if not mask.any():
                        continue
                    sqc_mat, ch = cell_mats[s]
                    ci = np.argmin(_d2(n2o[mask], X[mask] @ sqc_mat.T, ch),
                                   axis=1)
                    oid.append(ids[mask])
                    oscid.append(np.full(int(mask.sum()), s,
                                         dtype=np.int64))
                    ocid.append(np.array([ch[x] for x in ci],
                                         dtype=np.int64))
                    orouted.append(np.full(int(mask.sum()), len(ch),
                                           dtype=np.int64))
            yield pa.record_batch(
                [pa.array(np.concatenate(oid)),
                 pa.array(np.concatenate(oscid)),
                 pa.array(np.concatenate(ocid)),
                 pa.array(np.concatenate(orouted))],
                names=["id", "scid", "cid", "routed"])

    return c.select("id", "q").mapInArrow(
        route, "id long, scid long, cid long, routed long")


def _hier_route_cte(src: str) -> str:
    """DuckDB twin of _route_hier over the exploded source `src`
    (columns vec_id, dim, xq). Emits the par2/chrank/sup/csd/
    child_super/super_top/vsd/vec_top/vec_super/vcd CTE chain; expects
    `par` (k, t) and `c3` (trained centroids) already in scope. Callers
    finish with an argmin over vcd (ROW_NUMBER d2 ASC, cid ASC).

    (k1, k2) mirror _hier_levels exactly: the integer cube root comes
    from a bounded generate_series max (fully integer-exact, no float
    cbrt trust), and below HIER3_MIN_K both collapse to the isqrt
    super count — the regime where the ladder provably equals the
    two-level router."""
    return f""", cb AS (
  SELECT MAX(s.i) AS c
  FROM (SELECT unnest(generate_series(1, 1000)) AS i) s, par
  WHERE s.i * s.i * s.i <= par.k
), par2 AS (
  SELECT k, t,
         CASE WHEN k >= {HIER3_MIN_K} THEN cb.c * cb.c
              ELSE GREATEST({HIER_SUPER_FLOOR},
                            CAST(FLOOR(SQRT(k)) AS BIGINT)) END AS k1,
         CASE WHEN k >= {HIER3_MIN_K} THEN cb.c
              ELSE GREATEST({HIER_SUPER_FLOOR},
                            CAST(FLOOR(SQRT(k)) AS BIGINT)) END AS k2
  FROM par, cb
), chrank AS (
  SELECT cid, DENSE_RANK() OVER (ORDER BY cid ASC) AS r
  FROM (SELECT DISTINCT cid FROM c3)
), sup AS MATERIALIZED (
  SELECT c3.cid, c3.dim, c3.n, c3.sq
  FROM c3 JOIN chrank ON c3.cid = chrank.cid, par2
  WHERE chrank.r <= par2.k1
), csd AS MATERIALIZED (
  SELECT c.cid, s.cid AS scid,
         CAST(SUM(CAST(c.sq*s.n - s.sq*c.n AS HUGEINT)
                * CAST(c.sq*s.n - s.sq*c.n AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE)
           / CAST(MAX(s.n)*MAX(s.n) AS DOUBLE) / 1e12 AS d2
  FROM c3 c JOIN sup s ON c.dim = s.dim
  GROUP BY c.cid, s.cid
), child_super AS (
  SELECT cid, scid
  FROM (SELECT cid, scid,
               ROW_NUMBER() OVER (PARTITION BY cid
                                  ORDER BY d2 ASC, scid ASC) AS rn
        FROM csd)
  WHERE rn = 1
), super_top AS (
  SELECT cid AS s_cid, tid
  FROM (SELECT csd.cid, csd.scid AS tid,
               ROW_NUMBER() OVER (PARTITION BY csd.cid
                                  ORDER BY csd.d2 ASC, csd.scid ASC) AS rn
        FROM csd
        JOIN chrank cr ON csd.cid = cr.cid
        JOIN chrank ct ON csd.scid = ct.cid, par2
        WHERE cr.r <= par2.k1 AND ct.r <= par2.k2)
  WHERE rn = 1
), vsd AS MATERIALIZED (
  SELECT {src}.vec_id, s.cid AS scid,
         CAST(SUM(CAST({src}.xq*s.n - s.sq AS HUGEINT)
                * CAST({src}.xq*s.n - s.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(s.n)*MAX(s.n) AS DOUBLE) / 1e12 AS d2
  FROM {src} JOIN sup s ON {src}.dim = s.dim
  GROUP BY {src}.vec_id, s.cid
), vec_top AS (
  SELECT vec_id, scid AS tid
  FROM (SELECT v.vec_id, v.scid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY v.d2 ASC, v.scid ASC) AS rn
        FROM vsd v JOIN chrank ct ON v.scid = ct.cid, par2
        WHERE ct.r <= par2.k2)
  WHERE rn = 1
), vec_super AS (
  SELECT vec_id, scid
  FROM (SELECT v.vec_id, v.scid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY v.d2 ASC, v.scid ASC) AS rn
        FROM vsd v
        JOIN vec_top vt ON vt.vec_id = v.vec_id
        JOIN super_top st ON st.s_cid = v.scid AND st.tid = vt.tid)
  WHERE rn = 1
), vcd AS (
  SELECT {src}.vec_id, vs.scid, c.cid,
         CAST(SUM(CAST({src}.xq*c.n - c.sq AS HUGEINT)
                * CAST({src}.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS d2
  FROM {src}
  JOIN vec_super vs ON vs.vec_id = {src}.vec_id
  JOIN child_super ch ON ch.scid = vs.scid
  JOIN c3 c ON c.cid = ch.cid AND c.dim = {src}.dim
  GROUP BY {src}.vec_id, vs.scid, c.cid
)"""


def _semdedup_prune_kernel(threshold: float):
    """Per-cluster prune kernel at REPRESENTATIVE grain, provably
    member-exact. The member-grain rule is

        x pruned  iff  ∃ y < x in x's cluster with cos(x, y) >= θ.

    Identical quantized vectors form a GROUP (same q → same n2 → the
    IEEE cosine between any two members is the same scalar intra =
    n2/(s·s), and the cosine to any outside vector is the same float
    for every member). Therefore, with m_A = min id of group A and
    m*_A = min over other groups B in the cluster with cos(A,B) >= θ
    of m_B (+inf when none):

        x ∈ A pruned  iff  (intra_A >= θ and x > m_A)  or  (m*_A < x)

    — the first clause is y ranging over A (every other member of A is
    comparable only via intra; the smallest is m_A), the second is y
    ranging over B (∃ y ∈ B, y < x ⟺ m_B < x). No approximation
    anywhere: intra and the rep-pair cosines are the exact floats the
    member-grain GEMM computed (identical vectors → identical
    arithmetic), zero vectors fall out naturally (0/0 = nan compares
    False, so intra_A >= θ is False — same as member grain). Pair work
    drops from cluster-size² to DISTINCT-content² per cluster: on the
    replication fixture every base vector's 100 copies routed to one
    cluster and the member-grain GEMM measured 127.8s at sf10 vs ~9s
    at sf3 (clique², winnowing's disease); distinct grain restores the
    O(N·C) SemDeDup property."""
    import numpy as np
    import pandas as pd

    def _prune_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        X = np.array([list(v) for v in pdf["q"].to_numpy()],
                     dtype=np.int64)
        n2 = pdf["n2"].to_numpy().astype(np.float64)
        # collapse identical vectors: one GEMM row per distinct q
        key = np.ascontiguousarray(X).view(
            [("", X.dtype)] * X.shape[1]).ravel()
        _, first, inv = np.unique(key, return_index=True,
                                  return_inverse=True)
        r = len(first)
        m_a = np.full(r, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m_a, inv, ids)
        Xr = X[first]
        n2r = n2[first]
        s = np.sqrt(n2r)
        with np.errstate(invalid="ignore", divide="ignore"):
            intra = n2r / (s * s)            # nan for zero vectors
            mstar = np.full(r, np.iinfo(np.int64).max, dtype=np.int64)
            B = 2048
            for lo in range(0, r, B):
                hi = min(lo + B, r)
                cos = ((Xr[lo:hi] @ Xr.T).astype(np.float64)
                       / (s[lo:hi, None] * s[None, :]))
                hit = cos >= threshold
                hit[:, lo:hi][np.eye(hi - lo, dtype=bool)] = False
                cand = np.where(hit, m_a[None, :],
                                np.iinfo(np.int64).max)
                mstar[lo:hi] = cand.min(axis=1)
            pruned = (((intra[inv] >= threshold) & (ids > m_a[inv]))
                      | (mstar[inv] < ids))
        return pd.DataFrame({"vec_id": ids[pruned]})

    return _prune_cluster


def emb_semdedup_prune(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.9,
                       iters: int = 3) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus with
    a train-once coarse quantizer, then search for near-duplicate
    pairs ONLY inside each cluster and prune the higher-id member of
    every pair with cosine >= threshold. This is the published SemDeDup
    recipe (k-means first, pairwise similarity second) whose whole point
    is scale: pairwise work is quadratic only in cluster size, never in
    corpus size.

    Scale shape (reworked twice by sweep evidence: fixed k=8 measured
    114x at 10x data; k=isqrt(N) still left pair work ~N^1.5, 6.6x at
    10x): k now additionally tracks ceil(N/C) with constant target
    cluster size C (_semdedup_params), so cluster size — and with it
    per-member pair-verify work — is BOUNDED: total pair work is
    O(N·C), linear in corpus size, the published SemDeDup property.
    The k-means loop trains on a bounded
    sample (every t-th vector, ~SEMDEDUP_TRAIN_TARGET rows), so
    training cost is O(sample·k·iters), not O(N·k·iters). EVERY member
    (base and mutant alike) is then assigned through the routing
    LADDER (_route_hier): k2 tops, then the top cell's supers, then
    only that super-cell's children — N·3·k^(1/3) comparisons above
    HIER3_MIN_K (N·2√k below, where the ladder provably reduces to
    the two-level form), not the flat N·k that the sf1 sweep measured
    as this query's one residual super-linear term (13.7x at 10x
    data). The routing is the standard IVF approximation of the flat
    argmin; the oracle verifies the IDENTICAL staged rule
    (_hier_route_cte), so the cluster assignment — and hence the
    prune set — stays bit-exact.

    Corpus: the planted-near-dup corpus (_q_corpus). The verify kernel
    is the exact integer-quantized cosine, so the DuckDB twin (which
    derives the same k, t and k1 from COUNT(*)) reproduces the prune
    set bit-for-bit. Returns one row per corpus member: (id, cluster,
    pruned)."""
    cent = _semdedup_centroids(spark, sf_dir, iters)
    carr = _cent_arrays(cent)
    n = table(spark, sf_dir, "embeddings").count()
    k, _t = _semdedup_params(n)
    k1, k2 = _hier_levels(k)

    c = _q_corpus(spark, sf_dir).withColumn(
        "n2", dot_q(F.col("q"), F.col("q")))
    # `alla` feeds two plan branches (the pair-gather AND the final
    # output join) and nothing actions it in between, so the checkpoint
    # must be EAGER — a lazy one only caches on first action, by which
    # time a single job has already scheduled the route chain twice
    # (the DEVNOTES multi-branch rule; measured 21s -> 14s at sf3).
    # The materialized frame is (id, cid): 16 bytes/row, never the
    # vectors.
    alla = (_route_hier(c, carr, k1, k2)
            .select(F.col("id").alias("vec_id"), "cid")
            .localCheckpoint(eager=True))

    # In-cluster pair verification as per-cluster DISTINCT-grain GEMM
    # (the PCA BLAS pattern + winnowing's representative-collapse
    # lesson): each cluster's members gather once via applyInPandas,
    # identical vectors collapse to ONE GEMM row, and numpy computes
    # pair dots over REPRESENTATIVES only — see
    # _semdedup_prune_kernel for the exactness argument (bit-for-bit
    # the member-grain rule, hence the oracle's prune set). The sf10
    # sweep exposed the member-grain quadratic: exact-duplicate cliques
    # route to one cluster, so GEMM work grew with clique² — 127.8s at
    # 100x vs ~9s at 30x; distinct-grain bounds pair work by DISTINCT
    # content per cluster. Row blocks keep the pair matrix O(B·r).
    qa = c.join(alla, c["id"] == alla["vec_id"]).select("cid", "id", "q",
                                                        "n2")
    _prune_cluster = _semdedup_prune_kernel(threshold)
    pruned = (qa.groupBy("cid").applyInPandas(_prune_cluster, "vec_id long")
                .withColumn("_p", F.lit(True)))
    return (alla.join(pruned, "vec_id", "left")
                .select(F.col("vec_id").alias("id"),
                        F.col("cid").alias("cluster"),
                        F.coalesce("_p", F.lit(False)).alias("pruned")))


def _semdedup_kmeans_cte_dyn(iters: int = 3) -> str:
    """DuckDB twin of _semdedup_centroids: same unrolled loop as
    _kmeans_cte_body, but k and the training stride t are DERIVED FROM
    COUNT(*) in a `par` CTE (exact integer arithmetic matching
    _semdedup_params) and every training CTE reads the sampled `ext`
    instead of the full `ex`."""
    parts = [f"""WITH ex AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, {_XQ.format(v='embedding')} AS xq
  FROM embeddings, generate_series(1, 64) i(i)
), par AS (
  SELECT GREATEST(8, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT),
                  (COUNT(*) + {SEMDEDUP_CLUSTER_CAP - 1})
                    // {SEMDEDUP_CLUSTER_CAP}) AS k,
         GREATEST(1, COUNT(*) // {SEMDEDUP_TRAIN_TARGET}) AS t
  FROM embeddings
), ext AS MATERIALIZED (
  SELECT ex.* FROM ex, par WHERE ex.vec_id % par.t = 0
), c0 AS MATERIALIZED (
  SELECT vec_id AS cid, dim, CAST(1 AS BIGINT) AS n, xq AS sq
  FROM ext, par WHERE vec_id < par.k * par.t
)"""]
    for i in range(1, iters + 1):
        parts.append(f""", s{i} AS (
  SELECT ext.vec_id, c.cid,
         CAST(SUM(CAST(ext.xq*c.n - c.sq AS HUGEINT) * CAST(ext.xq*c.n - c.sq AS HUGEINT)) AS DOUBLE)
           / CAST(MAX(c.n)*MAX(c.n) AS DOUBLE) / 1e12 AS dist2
  FROM ext JOIN c{i-1} c ON ext.dim = c.dim
  GROUP BY ext.vec_id, c.cid
), a{i} AS (
  SELECT vec_id, cid, dist2
  FROM (SELECT vec_id, cid, dist2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
        FROM s{i})
  WHERE rn = 1
), c{i} AS MATERIALIZED (
  SELECT a.cid, ext.dim, COUNT(*) AS n, CAST(SUM(ext.xq) AS BIGINT) AS sq
  FROM ext JOIN a{i} a USING (vec_id)
  GROUP BY a.cid, ext.dim
)""")
    return "".join(parts)


EMB_SEMDEDUP_SQL = _semdedup_kmeans_cte_dyn() + """
, mex AS (
  SELECT vec_id + 100000 AS vec_id, dim,
         xq + CASE WHEN dim = 1 THEN 50000 ELSE 0 END AS xq
  FROM ex WHERE vec_id % 10 = 0
), allex AS MATERIALIZED (
  SELECT * FROM ex UNION ALL SELECT * FROM mex
)""" + _hier_route_cte("allex") + f"""
, alla AS (
  SELECT vec_id, cid
  FROM (SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM vcd)
  WHERE rn = 1
), corpus AS ({_QC_SQL}),
pairs AS (
  SELECT l.vec_id AS id1, r.vec_id AS id2
  FROM alla l JOIN alla r ON l.cid = r.cid AND l.vec_id < r.vec_id
), scored AS (
  SELECT id1, id2,
         CAST(CAST(SUM(c1.q[i.i] * c2.q[i.i]) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM(c1.q[i.i] * c1.q[i.i]) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM(c2.q[i.i] * c2.q[i.i]) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM pairs
  JOIN corpus c1 ON c1.id = pairs.id1
  JOIN corpus c2 ON c2.id = pairs.id2,
  generate_series(1, 64) i(i)
  GROUP BY id1, id2
), pruned AS (
  SELECT DISTINCT id2 FROM scored WHERE cos_sim >= 0.9
)
SELECT a.vec_id AS id, a.cid AS cluster,
       (p.id2 IS NOT NULL) AS pruned
FROM alla a LEFT JOIN pruned p ON a.vec_id = p.id2
"""


RANGE_TAU = 0.45
RANGE_QUERIES = 10


def emb_range_search(spark: SparkSession, sf_dir: str,
                     tau: float = RANGE_TAU,
                     n_queries: int = RANGE_QUERIES) -> DataFrame:
    """Cosine RANGE search (radius query): every corpus member within
    similarity >= tau of each query vector — the dual of top-k (top-k
    bounds count, range bounds similarity; recommendation and dedup
    candidates both need this form).

    Scale shape: the bounded query block rides the GEMM scan kernel
    (_bq_scores) — one Arrow-batched pass over the corpus, no shuffle
    of corpus vectors; at billions of vectors the same query composes
    with the IVF probe (emb_ivf_trained_topk) to scan only nearby
    cells. Kernel is the exact integer-quantized cosine."""
    c = _q_corpus(spark, sf_dir)
    qrows = [(r["id"], list(r["q"]))
             for r in c.filter(F.col("id") < n_queries).collect()]
    return (_bq_scores(qrows, c, "id", "q", "cos")
            .filter(F.col("id") != F.col("qid"))
            .select("qid", F.col("id").alias("match_id"), "cos_sim")
            .filter(F.col("cos_sim") >= tau))


EMB_RANGE_SEARCH_SQL = f"""
WITH corpus AS ({_QC_SQL}),
q AS (SELECT id AS qid, q AS qv FROM corpus WHERE id < {RANGE_QUERIES}),
scored AS (
  SELECT q.qid, c.id AS match_id,
         CAST(CAST(SUM(q.qv[i.i] * c.q[i.i]) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM(q.qv[i.i] * q.qv[i.i]) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM(c.q[i.i] * c.q[i.i]) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM q JOIN corpus c ON c.id != q.qid,
  generate_series(1, 64) i(i)
  GROUP BY q.qid, c.id
)
SELECT qid, match_id, cos_sim FROM scored WHERE cos_sim >= {RANGE_TAU}
"""


HIST_SAMPLE_MOD = 10
HIST_SAMPLE_TARGET = 200  # adaptive-mod sample size ceiling

_HIST_MOD_SQL = (f"(SELECT GREATEST({HIST_SAMPLE_MOD}, "
                 f"(COUNT(*) + {HIST_SAMPLE_TARGET} - 1) "
                 f"// {HIST_SAMPLE_TARGET}) FROM embeddings)")


def emb_pair_cosine_histogram(spark: SparkSession, sf_dir: str,
                              mod: int | None = None,
                              residue: int = 3) -> DataFrame:
    """Corpus similarity-structure report: histogram of pairwise cosines
    over a DETERMINISTIC id-sampled subset (vec_id % mod == residue) —
    the estimator a pipeline runs to pick dedup/ANN thresholds, because
    the full pair matrix is quadratic and unnecessary. Bins are
    floor(cos·10) on the exact integer-quantized cosine (bit-identical
    both engines, so bin edges cannot flake).

    Scale: sampling is scan-side (no shuffle to sample); mod defaults
    to ceil(N / HIST_SAMPLE_TARGET), so the sampled block — and the
    (N/mod)² pair cost — stays CONSTANT as the corpus grows. The
    oracle derives the same mod from COUNT(*) with identical integer
    arithmetic."""
    if mod is None:
        n = table(spark, sf_dir, "embeddings").count()
        mod = max(HIST_SAMPLE_MOD, (n + HIST_SAMPLE_TARGET - 1)
                  // HIST_SAMPLE_TARGET)
    c = (_q_corpus(spark, sf_dir)
         .filter((F.col("id") < 100000) & (F.col("id") % mod == residue))
         .withColumn("n2", dot_q(F.col("q"), F.col("q"))))
    a = c.select(F.col("id").alias("id1"), F.col("q").alias("q1"),
                 F.col("n2").alias("n2a"))
    b = c.select(F.col("id").alias("id2"), F.col("q").alias("q2"),
                 F.col("n2").alias("n2b"))
    cos = (dot_q(F.col("q1"), F.col("q2")).cast("double")
           / (F.sqrt(F.col("n2a").cast("double"))
              * F.sqrt(F.col("n2b").cast("double"))))
    return (a.join(b, F.col("id1") < F.col("id2"))
             .select(F.floor(cos * 10).cast("int").alias("bin"))
             .groupBy("bin")
             .agg(F.count(F.lit(1)).alias("n_pairs")))


def _pair_hist_sql(mod: str = _HIST_MOD_SQL, residue: int = 3) -> str:
    return f"""
WITH corpus AS ({_QC_SQL}),
s AS (SELECT id, q FROM corpus WHERE id < 100000 AND id % {mod} = {residue}),
scored AS (
  SELECT a.id AS id1, b.id AS id2,
         CAST(CAST(SUM(a.q[i.i] * b.q[i.i]) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM(a.q[i.i] * a.q[i.i]) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM(b.q[i.i] * b.q[i.i]) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM s a JOIN s b ON a.id < b.id,
  generate_series(1, 64) i(i)
  GROUP BY a.id, b.id
)
SELECT CAST(floor(cos_sim * 10) AS INT) AS bin, COUNT(*) AS n_pairs
FROM scored GROUP BY 1
"""


EMB_PAIR_HIST_SQL = _pair_hist_sql()


def emb_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2 histogram of squared vector norms over the quantized corpus
    — the sanity check before cosine vs dot-product decisions (are the
    embeddings normalized?) and before int8 quantization (dynamic
    range). Entirely integer: norm² is the exact int64 self-dot, the
    bucket its bit-length. One map-side pass, O(log range) output."""
    c = _q_corpus(spark, sf_dir)
    n2 = dot_q(F.col("q"), F.col("q"))
    return (c.select(n2.alias("n2"))
             .select(F.expr("CAST(length(bin(n2)) AS INT)").alias("bucket"),
                     "n2")
             .groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("n_vectors"),
                  F.min("n2").alias("min_norm2"),
                  F.max("n2").alias("max_norm2")))


EMB_NORM_HIST_SQL = f"""
WITH corpus AS ({_QC_SQL}),
n AS (
  SELECT CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
  FROM corpus
)
SELECT CAST(length(bin(n2)) AS INT) AS bucket,
       COUNT(*) AS n_vectors,
       CAST(MIN(n2) AS BIGINT) AS min_norm2,
       CAST(MAX(n2) AS BIGINT) AS max_norm2
FROM n GROUP BY 1
"""


def emb_label_cluster_purity(spark: SparkSession, sf_dir: str,
                             kclusters: int = 8, iters: int = 3
                             ) -> DataFrame:
    """Clustering-quality evaluation against the labeled embeddings:
    per trained k-means cluster, its size, majority ground-truth label,
    and purity (majority count / size) — the standard external cluster
    validation an embedding pipeline reports before trusting cluster-
    based operations (SemDeDup, stratified sampling, IVF cells).

    Reuses the train-once quantizer assignments; the label join and the
    per-cluster argmax run on |clusters|·|labels| counter rows, never on
    vectors. Ties: label asc."""
    assign, _ = trained_quantizer(spark, sf_dir, kclusters, iters)
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label"))
    counts = (assign.select("vec_id", "cid").join(e, "vec_id")
                    .groupBy("cid", "label")
                    .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    tot = Window.partitionBy("cid")
    return (counts.withColumn("size", F.sum("n").over(tot))
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select(F.col("cid").alias("cluster"),
                          F.col("size").alias("n_members"),
                          F.col("label").alias("majority_label"),
                          F.col("n").alias("majority_n"),
                          (F.col("n").cast("double")
                           / F.col("size").cast("double")).alias("purity")))


EMB_CLUSTER_PURITY_SQL = _kmeans_cte_body() + """
, counts AS (
  SELECT a.cid, CAST(e.label AS INT) AS label, COUNT(*) AS n
  FROM a3 a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cid, e.label
)
SELECT cid AS cluster, size AS n_members, label AS majority_label,
       n AS majority_n, CAST(n AS DOUBLE) / CAST(size AS DOUBLE) AS purity
FROM (SELECT cid, label, n,
             CAST(SUM(n) OVER (PARTITION BY cid) AS BIGINT) AS size,
             ROW_NUMBER() OVER (PARTITION BY cid
                                ORDER BY n DESC, label ASC) AS rn
      FROM counts)
WHERE rn = 1
"""


KNN_SAMPLE_MOD = 5
KNN_SAMPLE_TARGET = 400  # adaptive-mod sample size ceiling

# DuckDB twin of the adaptive sample stride: GREATEST(floor, ceil(N/T))
# in exact integer arithmetic (// is DuckDB integer division).
_KNN_MOD_SQL = (f"(SELECT GREATEST({KNN_SAMPLE_MOD}, "
                f"(COUNT(*) + {KNN_SAMPLE_TARGET} - 1) "
                f"// {KNN_SAMPLE_TARGET}) FROM embeddings)")


def emb_label_knn_accuracy(spark: SparkSession, sf_dir: str,
                           mod: int | None = None) -> DataFrame:
    """Leave-one-out 1-NN label accuracy over a deterministic id sample
    — the classic embedding-quality probe (do nearest neighbors share
    labels?) that decides whether an embedding column is good enough
    for label propagation or dedup-by-meaning.

    Sample (vec_id % mod == 0) self-joins for exact integer distances;
    each member's nearest OTHER member (ties: id asc) votes its label.
    Output: per true label, sample count, correct votes, accuracy.
    Scale: mod defaults to ceil(N / KNN_SAMPLE_TARGET) — the sampled
    block stays ~KNN_SAMPLE_TARGET rows and the pair count CONSTANT as
    the corpus grows (the sf1 sweep measured 84x at 10x data with a
    fixed mod; adaptive mod holds it flat). The oracle derives the same
    mod from COUNT(*) with identical integer arithmetic. At full corpus
    scale the same probe rides the IVF index instead."""
    e = table(spark, sf_dir, "embeddings")
    if mod is None:
        n = e.count()
        mod = max(KNN_SAMPLE_MOD, (n + KNN_SAMPLE_TARGET - 1)
                  // KNN_SAMPLE_TARGET)
    s = (e.filter(F.col("vec_id") % mod == 0)
          .select("vec_id", F.col("label").cast("int").alias("label"),
                  quantize(F.col("embedding")).alias("q")))
    srows = s.collect()          # ~KNN_SAMPLE_TARGET rows by construction
    qrows = [(r["vec_id"], list(r["q"])) for r in srows]
    labels = F.broadcast(spark.createDataFrame(
        [(r["vec_id"], r["label"]) for r in srows], "vid long, lab int"))
    pairs = (_bq_scores(qrows, s.select(F.col("vec_id").alias("idb"), "q"),
                        "idb", "q", "l2sq")
             .filter(F.col("qid") != F.col("idb"))
             .withColumnRenamed("qid", "ida")
             .withColumnRenamed("d", "d2"))
    w = Window.partitionBy("ida").orderBy(F.asc("d2"), F.asc("idb"))
    nn = (pairs.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .join(labels.select(F.col("vid").alias("ida"),
                                   F.col("lab").alias("la")), "ida")
               .join(labels.select(F.col("vid").alias("idb"),
                                   F.col("lab").alias("lb")), "idb"))
    return (nn.groupBy(F.col("la").alias("label"))
              .agg(F.count(F.lit(1)).alias("n_sampled"),
                   F.sum((F.col("la") == F.col("lb")).cast("long"))
                    .alias("n_correct"))
              .withColumn("accuracy",
                          F.col("n_correct").cast("double")
                          / F.col("n_sampled").cast("double")))


EMB_KNN_ACCURACY_SQL = f"""
WITH s AS (
  SELECT vec_id, CAST(label AS INT) AS label,
         list_transform(generate_series(1, 64),
             i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id % {_KNN_MOD_SQL} = 0
),
pairs AS (
  SELECT a.vec_id AS ida, a.label AS la, b.label AS lb, b.vec_id AS idb,
         CAST(SUM((a.q[i.i] - b.q[i.i]) * (a.q[i.i] - b.q[i.i])) AS BIGINT)
           AS d2
  FROM s a JOIN s b ON a.vec_id != b.vec_id,
  generate_series(1, 64) i(i)
  GROUP BY a.vec_id, a.label, b.label, b.vec_id
),
nn AS (
  SELECT ida, la, lb
  FROM (SELECT ida, la, lb,
               ROW_NUMBER() OVER (PARTITION BY ida
                                  ORDER BY d2 ASC, idb ASC) AS rn
        FROM pairs)
  WHERE rn = 1
)
SELECT la AS label, COUNT(*) AS n_sampled,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS accuracy
FROM nn GROUP BY la
"""


MATRYOSHKA_K = 5
MATRYOSHKA_QUERIES = 20


def emb_matryoshka_recall(spark: SparkSession, sf_dir: str,
                          prefix_dims: int = PREFIX_DIMS,
                          k: int = MATRYOSHKA_K,
                          n_queries: int = MATRYOSHKA_QUERIES) -> DataFrame:
    """Prefix-dimension retrieval QUALITY evaluation: per query, the
    recall@k of top-k by the first ``prefix_dims`` dims against the
    exact full-dimension top-k — the number a pipeline checks before
    trusting emb_prefix_rerank_topk's cheap first stage (MRL papers
    report exactly this curve). Companion eval to emb_label_knn_accuracy.

    Scale shape: both rankings are GEMM corpus-scan passes (_bq_scores;
    the prefix ranking slices both sides inside the kernel) with
    per-query top-k (bounded windows over per-query rows, never a
    global sort); the recall join compares two k-row sets per query.
    Exact integer distances, id tie-breaks — bit-stable in both
    engines."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), quantize(F.col("embedding")).alias("qq"))
    c = e.select(F.col("vec_id").alias("cid"),
                 quantize(F.col("embedding")).alias("cq"))
    qrows = [(r["qid"], list(r["qq"])) for r in q.collect()]
    full = (_bq_scores(qrows, c, "cid", "cq", "l2sq")
            .filter(F.col("qid") != F.col("cid")))
    wq = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("cid"))
    exact = (full.withColumn("rn", F.row_number().over(wq))
                 .filter(F.col("rn") <= k).select("qid", "cid"))
    pfx = (_bq_scores(qrows, c, "cid", "cq", "l2sq", prefix=prefix_dims)
           .filter(F.col("qid") != F.col("cid")))
    approx = (pfx.withColumn("rn", F.row_number().over(wq))
                 .filter(F.col("rn") <= k).select("qid", "cid"))
    hits = (exact.join(approx, ["qid", "cid"])
                 .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (exact.groupBy("qid").agg(F.count(F.lit(1)).alias("kk"))
                 .join(hits, "qid", "left")
                 .select("qid",
                         F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                         (F.coalesce("n_hits", F.lit(0)).cast("double")
                          / F.col("kk").cast("double")).alias("recall_at_k")))


EMB_MATRYOSHKA_RECALL_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS q_emb FROM embeddings
           WHERE vec_id < {MATRYOSHKA_QUERIES}),
c AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings),
full_d AS (
  SELECT q.qid, c.cid,
         CAST(SUM(({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})
                * ({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})) AS BIGINT) AS d
  FROM q, c, generate_series(1, 64) i(i)
  WHERE q.qid != c.cid
  GROUP BY q.qid, c.cid
),
exact AS (
  SELECT qid, cid
  FROM (SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cid ASC) AS rn
        FROM full_d)
  WHERE rn <= {MATRYOSHKA_K}
),
pfx_d AS (
  SELECT q.qid, c.cid,
         CAST(SUM(({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})
                * ({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})) AS BIGINT) AS d
  FROM q, c, generate_series(1, {PREFIX_DIMS}) i(i)
  WHERE q.qid != c.cid
  GROUP BY q.qid, c.cid
),
approx AS (
  SELECT qid, cid
  FROM (SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cid ASC) AS rn
        FROM pfx_d)
  WHERE rn <= {MATRYOSHKA_K}
),
hits AS (
  SELECT e.qid, COUNT(*) AS n_hits
  FROM exact e JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid
)
SELECT e.qid, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS recall_at_k
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid, h.n_hits
"""


def emb_hier_assign(spark: SparkSession, sf_dir: str,
                    iters: int = 3) -> DataFrame:
    """Hierarchical coarse quantization — the escape for the flat N·k
    assign: route each vector down the (k2 tops → supers of the top
    cell → children of the super cell) ladder. Assign cost drops from
    N·k to N·(k2 + k1/k2 + k/k1) — N·3·k^(1/3) with the balanced
    ladder above HIER3_MIN_K, N·2√k in the small-k two-level regime —
    the inverted-multi-index / multi-level-IVF shape every
    billion-vector ANN system uses (FAISS IVF with IMI coarse layer).

    Construction, all exact rational arithmetic so the DuckDB twin is
    bit-identical: children = the SemDeDup quantizer's k centroids
    (train-once, sampled); supers = the k1 children with smallest cid
    (singleton promotion, no second training loop — documented
    simplification); each child maps to its nearest super by the
    rational mean-to-mean distance Σ(sqc·ns − sqs·nc)²/(nc²ns²); each
    vector maps to its nearest super (k1 comparisons), then to the
    nearest child WITHIN that super-cell. The assignment is an
    approximation of the flat argmin by design — the oracle verifies
    the exact same two-stage rule.

    Returns (vec_id, super_cid, cid, routed) where routed is the
    number of children scanned in stage 2 (the cost the hierarchy
    saves; Σrouted ≈ N·k/k1 vs N·k flat). Routing core shared with
    emb_semdedup_prune's assign stage (_route_hier)."""
    n = table(spark, sf_dir, "embeddings").count()
    k, _t = _semdedup_params(n)
    k1, k2 = _hier_levels(k)
    carr = _cent_arrays(_semdedup_centroids(spark, sf_dir, iters))
    e = table(spark, sf_dir, "embeddings")
    c = (e.select(F.col("vec_id").alias("id"),
                  quantize(F.col("embedding")).alias("q"))
          .withColumn("n2", dot_q(F.col("q"), F.col("q"))))
    return (_route_hier(c, carr, k1, k2)
            .select(F.col("id").alias("vec_id"),
                    F.col("scid").alias("super_cid"), "cid", "routed"))


EMB_HIER_ASSIGN_SQL = (_semdedup_kmeans_cte_dyn() + _hier_route_cte("ex")
                       + """
SELECT vec_id, scid AS super_cid, cid, routed
FROM (SELECT vec_id, scid, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, cid ASC) AS rn,
             COUNT(*) OVER (PARTITION BY vec_id, scid) AS routed
      FROM vcd)
WHERE rn = 1
""")


def emb_ivf_recall(spark: SparkSession, sf_dir: str,
                   k: int = IVF_K, n_queries: int = IVF_QUERIES,
                   nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF retrieval QUALITY evaluation: per query, recall@k of the
    trained probe-limited search (emb_ivf_trained_topk) against the
    exact brute-force top-k — the accuracy/cost curve point every ANN
    deployment records next to its nprobe setting. Completes the eval
    suite: emb_label_knn_accuracy (embedding quality),
    emb_matryoshka_recall (prefix quality), THIS (index quality).

    Scale shape: the IVF side reuses the train-once quantizer and
    probe-limited candidate scan; the exact side is one broadcast-query
    corpus pass with per-query bounded top-k windows; recall compares
    two k-row sets per query. Integer distances, id tie-breaks."""
    ivf = (emb_ivf_trained_topk(spark, sf_dir, k, n_queries, nprobe)
           .select("qid", "cand"))
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), quantize(F.col("embedding")).alias("qq"))
    c = e.select(F.col("vec_id").alias("cand"),
                 quantize(F.col("embedding")).alias("cq"))
    qrows = [(r["qid"], list(r["qq"])) for r in q.collect()]
    full = (_bq_scores(qrows, c, "cand", "cq", "l2sq")
            .filter(F.col("qid") != F.col("cand")))
    wq = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("cand"))
    exact = (full.withColumn("rn", F.row_number().over(wq))
                 .filter(F.col("rn") <= k).select("qid", "cand"))
    hits = (exact.join(ivf, ["qid", "cand"])
                 .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (exact.groupBy("qid").agg(F.count(F.lit(1)).alias("kk"))
                 .join(hits, "qid", "left")
                 .select("qid",
                         F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                         (F.coalesce("n_hits", F.lit(0)).cast("double")
                          / F.col("kk").cast("double")).alias("recall_at_k")))


EMB_IVF_RECALL_SQL_TMPL = f"""
WITH ivf AS ({{ivf_sql}}),
q AS (SELECT vec_id AS qid, embedding AS q_emb FROM embeddings
      WHERE vec_id < {IVF_QUERIES}),
c AS (SELECT vec_id AS cand, embedding AS c_emb FROM embeddings),
full_d AS (
  SELECT q.qid, c.cand,
         CAST(SUM(({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})
                * ({_XQ.format(v='q_emb')} - {_XQ.format(v='c_emb')})) AS BIGINT) AS d
  FROM q, c, generate_series(1, 64) i(i)
  WHERE q.qid != c.cand
  GROUP BY q.qid, c.cand
),
exact AS (
  SELECT qid, cand
  FROM (SELECT qid, cand,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d ASC, cand ASC) AS rn
        FROM full_d)
  WHERE rn <= {IVF_K}
),
hits AS (
  SELECT e.qid, COUNT(*) AS n_hits
  FROM exact e JOIN ivf ON ivf.qid = e.qid AND ivf.cand = e.cand
  GROUP BY e.qid
)
SELECT e.qid, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS recall_at_k
FROM exact e LEFT JOIN hits h ON e.qid = h.qid
GROUP BY e.qid, h.n_hits
"""

EMB_IVF_RECALL_SQL = EMB_IVF_RECALL_SQL_TMPL.format(ivf_sql=EMB_IVF_TRAINED_SQL)



def emb_quantizer_balance(spark: SparkSession, sf_dir: str,
                          kclusters: int = 8, iters: int = 3) -> DataFrame:
    """ANN index balance report: member count and share per trained-IVF
    cell, plus each cell's ratio to the ideal N/k — the observability
    row an IVF deployment watches because probe latency follows the
    LARGEST probed cell (a 10x-overfull cell makes nprobe=2 cost like
    nprobe=20). Companion to dedup_bucket_overflow_report on the
    similarity side.

    Scale: one count over the memoized train-once assignment (k rows
    out); shares are single exact-integer divisions."""
    assign, _cent = trained_quantizer(spark, sf_dir, kclusters, iters)
    sizes = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    tot = sizes.agg(F.sum("n_members").alias("nn"),
                    F.count(F.lit(1)).alias("kk"))
    return (sizes.crossJoin(F.broadcast(tot))
                 .select("cid", "n_members",
                         (F.col("n_members").cast("double")
                          / F.col("nn").cast("double")).alias("share"),
                         (F.col("n_members").cast("double")
                          * F.col("kk").cast("double")
                          / F.col("nn").cast("double"))
                         .alias("balance_ratio")))


EMB_QUANTIZER_BALANCE_SQL = _kmeans_cte_body() + """
, sizes AS (SELECT cid, COUNT(*) AS n_members FROM a3 GROUP BY cid),
tot AS (SELECT CAST(SUM(n_members) AS BIGINT) AS nn, COUNT(*) AS kk
        FROM sizes)
SELECT cid, n_members,
       CAST(n_members AS DOUBLE) / CAST(nn AS DOUBLE) AS share,
       CAST(n_members AS DOUBLE) * CAST(kk AS DOUBLE)
         / CAST(nn AS DOUBLE) AS balance_ratio
FROM sizes CROSS JOIN tot
"""


PCA_ITERS = 40
# Gram downscale. Valid range: the int64 Gram sum needs N·Q_SCALE²
# < 2^63, i.e. N ≲ 9e6 vectors; the iteration itself is exact at any N
# (Python unbounded ints / DuckDB HUGEINT). Past 9e6, raise PCA_DIV
# and downscale inside the Arrow batches.
PCA_DIV = 1 << 20
PCA_VSCALE = 1_000_000


def emb_pca_top_component(spark: SparkSession, sf_dir: str,
                          iters: int = PCA_ITERS) -> DataFrame:
    """Dominant principal direction of the corpus (power iteration on
    the uncentered Gram/second-moment matrix M = Σ x·xᵀ) — the first
    step of PCA whitening / spectral diagnostics an embedding pipeline
    runs before indexing (anisotropy checks, dimension pruning).

    The Gram accumulation is the BLAS path a real cluster uses: numpy
    X·ᵀX per Arrow batch inside mapInPandas (one 64×64 partial per
    batch — the sample arrays never shuffle, only 4096-row partials),
    then a map-side-combinable sum. Integer-exact end to end: xq are
    ×1e6 fixed-point ints, int64 partial sums are associative and
    commutative, so batch boundaries cannot change M, and the oracle
    recomputes the identical M as SUM(xq_i·xq_j).

    Power iteration in integers (the pagerank discipline): M is
    downscaled by a FIXED power of two (exact truncation, identical in
    both engines — `div` and `//` both truncate toward zero), each
    step computes w = Mq·v exactly (Python unbounded ints here, HUGEINT
    in the oracle — a BIGINT accumulator would overflow at N ≳ 7e4
    vectors; the binding bound is the int64 Gram partial sum,
    N·Q_SCALE² < 2^63 i.e. N ≲ 9e6, documented at PCA_DIV)
    and max-normalizes with the integer rule
    v' = w div (max|w| div VSCALE + 1). Sign and ties are fully
    deterministic, so the oracle unrolls the same ``iters`` steps
    (40: the driver embeddings have a nearly flat spectrum, top-gap
    ~1.07, so alignment with the true eigenvector needs ~(gap)^-k —
    measured cos 0.92-0.99 at 40 iterations vs 0.33 at 3; the
    semantic test pins the residual). Returns (dim, component_q,
    component)."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")
    q = e.select(quantize(F.col("embedding")).alias("q"))

    def gram(batches):
        import pyarrow as pa

        idx = np.arange(1, 65, dtype=np.int32)
        ii = np.repeat(idx, 64)
        jj = np.tile(idx, 64)
        for rb in batches:
            if not rb.num_rows:
                continue
            X = _list_matrix(rb.column(0), np.int64)
            M = X.T @ X
            yield pa.record_batch(
                [pa.array(ii), pa.array(jj), pa.array(M.ravel())],
                names=["i", "j", "m"])

    M = (q.mapInArrow(gram, "i int, j int, m long")
          .groupBy("i", "j").agg(F.sum("m").alias("m"))
          .select("i", "j", F.expr(f"m div {PCA_DIV}").alias("mq")))

    # The reduced matrix is DIMENSION²-sized (4096 rows), independent of
    # corpus size — the accepted vocabulary-sized collect class. The
    # iteration itself is 64-vector arithmetic: driver math, exactly the
    # reduce-then-eigensolve split a real cluster uses (running it as 40
    # chained tiny Spark jobs measured 80s of pure scheduling overhead).
    mq = {(r["i"], r["j"]): r["mq"] for r in M.collect()}

    def tdiv(a: int, b: int) -> int:
        # truncation toward zero — matches Spark `div` and DuckDB `//`
        # (Python's // floors, which disagrees on negatives)
        qd = abs(a) // abs(b)
        return qd if (a >= 0) == (b >= 0) else -qd

    vec = [PCA_VSCALE] * 64
    for _ in range(iters):
        w = [sum(mq.get((i, j), 0) * vec[j - 1] for j in range(1, 65))
             for i in range(1, 65)]
        mx = max(abs(x) for x in w)
        d = mx // PCA_VSCALE + 1
        vec = [tdiv(x, d) for x in w]
    v = spark.createDataFrame(
        [(i + 1, int(vec[i])) for i in range(64)], "i int, v long")
    return v.select(F.col("i").alias("dim"),
                    F.col("v").alias("component_q"),
                    (F.col("v").cast("double") / PCA_VSCALE)
                     .alias("component"))


def _pca_iter_sql(prev: str, k: int) -> str:
    # w{k} MATERIALIZED: referenced twice (max-normalizer + next v) —
    # plain CTEs would inline and re-run the join per reference
    # (DEVNOTES: deep unrolls go exponential without MATERIALIZED).
    # The accumulator is HUGEINT: |mq| ≈ N·Q_SCALE²/PCA_DIV and
    # |v| ≤ ~2·VSCALE would overflow a BIGINT SUM(mq·v) at roughly
    # N ≳ 7e4 vectors, while the engine's driver loop runs in Python's
    # unbounded ints — int128 keeps the two exactly aligned (the
    # binding limit is now the Spark-side int64 Gram sum, N ≲ 9e6;
    # past that raise PCA_DIV). v renormalizes back into BIGINT.
    return f"""
w{k} AS MATERIALIZED (
  SELECT m.i, CAST(SUM(CAST(m.mq AS HUGEINT) * v.v) AS HUGEINT) AS w
  FROM mq m JOIN {prev} v ON m.j = v.i
  GROUP BY m.i
),
v{k + 1} AS (
  SELECT i,
         CAST(w // ((SELECT MAX(ABS(w)) FROM w{k}) // {PCA_VSCALE} + 1)
              AS BIGINT) AS v
  FROM w{k}
)"""


EMB_PCA_SQL = f"""
WITH ex AS (
  SELECT vec_id, i.i AS dim, {_XQ.format(v='embedding')} AS xq
  FROM embeddings, generate_series(1, 64) i(i)
),
gram AS (
  SELECT a.dim AS i, b.dim AS j,
         CAST(SUM(a.xq * b.xq) AS BIGINT) AS m
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
mq AS MATERIALIZED (SELECT i, j, m // {PCA_DIV} AS mq FROM gram),
v0 AS (SELECT i, CAST({PCA_VSCALE} AS BIGINT) AS v
       FROM (SELECT DISTINCT i FROM mq)),
{",".join(_pca_iter_sql(f"v{k}", k) for k in range(PCA_ITERS))}
SELECT i AS dim, v AS component_q,
       CAST(v AS DOUBLE) / {PCA_VSCALE} AS component
FROM v{PCA_ITERS}
"""


def emb_dim_variance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus — the
    anisotropy diagnostic next to emb_pca_top_component (dead or
    dominating dimensions distort every distance; pipelines check this
    before indexing and after any projection).

    Exactness: integer sufficient statistics on the ×1e6 quantized
    values (Σq and Σq² exactly summed in long/decimal), then the
    fixed IEEE op sequence mean = s1/n, var = (s2 − s1²/n)/(n−1) —
    identical in DuckDB. Scale: one partial-aggregable pass over the
    exploded (vec, dim) rows; the report is 64 rows."""
    # _exploded's posexplode dim is 0-based; report 1-based like every
    # dim-surfacing oracle (generate_series(1, 64))
    ex = _exploded(spark, sf_dir).withColumn("dim", F.col("dim") + 1)
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("s1"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq"))
         .cast("decimal(38,0)").alias("s2"))
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    return agg.select(
        "dim", "n",
        (s1 / n).alias("mean_q"),
        ((s2 - s1 * s1 / n) / (n - F.lit(1.0))).alias("var_q"))


EMB_DIM_VARIANCE_SQL = f"""
WITH ex AS (
  SELECT vec_id, i.i AS dim, {_XQ.format(v='embedding')} AS xq
  FROM embeddings, generate_series(1, 64) i(i)
),
agg AS (
  SELECT dim, COUNT(*) AS n,
         CAST(SUM(xq) AS BIGINT) AS s1,
         CAST(SUM(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS s2
  FROM ex GROUP BY dim
)
SELECT dim, n,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
       (CAST(s2 AS DOUBLE)
        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(n AS DOUBLE) - 1.0) AS var_q
FROM agg
"""


BQ_QUERIES = 5
BQ_CAND = 10
BQ_K = 3


def _bin_half(col: str, lo: int) -> Column:
    """Pack sign bits lo..lo+31 of a quantized vector into one positive
    32-bit integer (bit j set iff q[lo+j] >= 0). Two halves per vector
    keep every packed value < 2^32, so the identical SUM-of-CASE builds
    it in DuckDB with no 1<<63 sign-bit hazard."""
    return sum(
        (F.when(F.element_at(col, lo + j + 1) >= 0,
                F.lit(1 << j)).otherwise(F.lit(0)))
        for j in range(32)).cast("long")


def emb_binary_quantize_topk(spark: SparkSession, sf_dir: str,
                             k: int = BQ_K, n_queries: int = BQ_QUERIES,
                             n_cand: int = BQ_CAND) -> DataFrame:
    """Binary (1-bit) quantization ANN: sign-bit codes + Hamming-distance
    candidate generation + exact-cosine rerank — the 32x-compression
    search path modern vector stores run before full-precision rerank
    (reference has no vector surface; [EXT] similarity-search member).

    Plan shape for 100 TB: codes are computed SCAN-SIDE (two packed
    32-bit halves per vector — a per-row projection that pipelines with
    the parquet scan and whole-stage codegen: bit ops + bit_count are
    JVM builtins, no Python, no shuffle). The bounded query block
    cross-joins broadcast against the code stream; per-query candidate
    cut is a WindowGroupLimit on (hamming, id); only n_queries*n_cand
    survivors ever touch full vectors for the exact integer-cosine
    rerank. Memory per row in the scan: 16 bytes of code vs 512 of
    vector — the point of the method.

    Cross-engine exactness: packing is integer CASE sums (< 2^32 per
    half); Hamming = bit_count(xor) on each half, both engines'
    builtins; rerank is the module's exact quantized cosine; both cuts
    tie-break on id."""
    c = _q_corpus(spark, sf_dir)
    codes = c.select(
        "id",
        _bin_half("q", 0).alias("h1"),
        _bin_half("q", 32).alias("h2"))
    qc = (codes.filter(F.col("id") < n_queries)
               .select(F.col("id").alias("qid"),
                       F.col("h1").alias("qh1"),
                       F.col("h2").alias("qh2")))
    ham = (F.bit_count(F.col("qh1").bitwiseXOR(F.col("h1")))
           + F.bit_count(F.col("qh2").bitwiseXOR(F.col("h2")))).cast("long")
    wq = Window.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("id"))
    cand = (codes.join(F.broadcast(qc), F.col("id") != F.col("qid"))
                 .select("qid", "id", ham.alias("hamming"))
                 .withColumn("hrank", F.row_number().over(wq))
                 .filter(F.col("hrank") <= n_cand)
                 .select("qid", F.col("id").alias("cid"), "hamming"))
    c1 = c.select(F.col("id").alias("qid"), F.col("q").alias("q1"))
    c2 = c.select(F.col("id").alias("cid"), F.col("q").alias("q2"))
    cos = (dot_q(F.col("q1"), F.col("q2")).cast("double")
           / (F.sqrt(dot_q(F.col("q1"), F.col("q1")).cast("double"))
              * F.sqrt(dot_q(F.col("q2"), F.col("q2")).cast("double"))))
    wr = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (cand.join(c1, "qid").join(c2, "cid")
                .select("qid", "cid", "hamming", cos.alias("cos_sim"))
                .withColumn("rank", F.row_number().over(wr).cast("long"))
                .filter(F.col("rank") <= k)
                .select("qid", "cid", "hamming", "rank", "cos_sim"))


def _bin_half_sql(lo: int) -> str:
    return ("CAST(" + " + ".join(
        f"(CASE WHEN q[{lo + j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(32)) + " AS BIGINT)")


EMB_BINARY_QUANTIZE_SQL = f"""
WITH corpus AS ({_QC_SQL}),
codes AS (
  SELECT id, {_bin_half_sql(0)} AS h1, {_bin_half_sql(32)} AS h2
  FROM corpus
),
q AS (SELECT id AS qid, h1 AS qh1, h2 AS qh2 FROM codes
      WHERE id < {BQ_QUERIES}),
cand AS (
  SELECT qid, cid, hamming FROM (
    SELECT q.qid, c.id AS cid,
           CAST(bit_count(xor(q.qh1, c.h1))
                + bit_count(xor(q.qh2, c.h2)) AS BIGINT) AS hamming,
           ROW_NUMBER() OVER (PARTITION BY q.qid
                              ORDER BY bit_count(xor(q.qh1, c.h1))
                                       + bit_count(xor(q.qh2, c.h2)) ASC,
                                       c.id ASC) AS hrank
    FROM q JOIN codes c ON c.id != q.qid)
  WHERE hrank <= {BQ_CAND}
),
rer AS (
  SELECT cand.qid, cand.cid, cand.hamming,
         CAST(CAST(SUM(a.q[i.i] * b.q[i.i]) AS BIGINT) AS DOUBLE)
       / ( SQRT(CAST(CAST(SUM(a.q[i.i] * a.q[i.i]) AS BIGINT) AS DOUBLE))
         * SQRT(CAST(CAST(SUM(b.q[i.i] * b.q[i.i]) AS BIGINT) AS DOUBLE)) )
         AS cos_sim
  FROM cand
  JOIN corpus a ON a.id = cand.qid
  JOIN corpus b ON b.id = cand.cid,
  generate_series(1, 64) i(i)
  GROUP BY cand.qid, cand.cid, cand.hamming
)
SELECT qid, cid, hamming, rank, cos_sim FROM (
  SELECT qid, cid, hamming, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos_sim DESC, cid ASC) AS BIGINT)
           AS rank
  FROM rer)
WHERE rank <= {BQ_K}
"""


# ---------------------------------------------------------------------------
# Incremental embedding near-dup store (round 10) — the 5th member of
# the incremental store family (exact md5 / MinHash-LSH / winnowing /
# SimHash / THIS), and the vector-space half of the continuous-crawl
# dedup loop: the already-embedded corpus is indexed ONCE, new batches
# probe the index without recomputing (or even reading) old vectors.
# Same rep-grain discipline as dedup.signature_store: one reps row per
# DISTINCT quantized vector, so probe cost is O(distinct content) and
# independent of duplicate multiplicity — replicated crawls (the sf10
# fixture replicates embeddings verbatim) collapse before banding.
# Reference parity note: the reference (es.go:95-108) re-upserts every
# redelivered event and has no notion of a vector index; this family is
# [EXT] surface driven by SURVEY §2 Table B's training-pipeline rows.

def _sign_band_structs(n_bands: int = 8, bits: int = 8) -> Column:
    """n_bands x bits sign-LSH blocking over a 64-dim quantized vector
    ``q`` (n_bands*bits must equal 64). The default (8, 8) is the
    blocking emb_cosine_near_dup_pairs defines (shared by
    construction, not by helper, so the green base query's fingerprint
    is untouched). Bits per band is THE scale knob: buckets per band =
    2^bits, so expected candidates per probe row = distinct-corpus /
    2^bits per band — at 8 bits that degenerates to corpus/256 (the
    vector soak caught candidate sets of 312k against a 100k store);
    at 16 bits (VectorIndexSink's default) the same store yields
    ~2-row buckets. Recall on planted near-dups: a perturbation
    confined to band 0 leaves the other n_bands-1 bands intact —
    recall 1 on the fixture, >= 1 - p^n_bands in general; identical
    vectors (the duplicate-crawl case) always collide in EVERY band."""
    if n_bands * bits != 64:
        # ValueError, not assert: under python -O a mis-sized config
        # would silently degrade — element_at past dim 64 returns NULL
        # so those sign bits read as 0 instead of erroring.
        raise ValueError(f"n_bands*bits must be 64, got "
                         f"{n_bands}*{bits}={n_bands * bits}")
    return F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            sum((F.when(F.element_at("q", b * bits + j + 1) >= 0,
                        F.lit(1 << j)).otherwise(F.lit(0)))
                for j in range(bits)).cast("long").alias("band_key"))
        for b in range(n_bands)
    ])


def _emb_rep_bands(reps: DataFrame, n_bands: int = 8,
                   bits: int = 8) -> DataFrame:
    """(rep, q) -> (rep, band_idx, band_key): a projection, no shuffle."""
    return reps.select(
        "rep", F.explode(_sign_band_structs(n_bands, bits)).alias("b")
    ).select("rep", F.col("b.band_idx").alias("band_idx"),
             F.col("b.band_key").alias("band_key"))


def _emb_collapsed(c: DataFrame) -> DataFrame:
    """Collapse a quantized corpus slice (id, q) to representative
    grain: (id, q, rep) with rep = min id over each DISTINCT vector.
    groupBy on the array column keeps this one shuffle; groups are
    duplicate-multiplicity sized, so collect_list is bounded."""
    g = c.groupBy("q").agg(F.min("id").alias("rep"),
                           F.collect_list("id").alias("ids"))
    return g.select(F.explode("ids").alias("id"), "q", "rep")


def embedding_store(spark: SparkSession, sf_dir: str) -> tuple:
    """The persisted vector index of the already-ingested corpus at
    REPRESENTATIVE grain: (members, reps) with members = (id, rep) and
    reps = (rep, q), one row per DISTINCT quantized vector. All-int64
    columns, so save/load round-trips parquet bit-exactly."""
    key = (spark.sparkContext.applicationId, sf_dir, "emb_store_rep")
    hit = _QUANTIZER_CACHE.get(key)
    if hit is None:
        mem = _emb_collapsed(
            _q_corpus(spark, sf_dir).filter(F.col("id") < _MUTANT_OFFSET)
        ).localCheckpoint(eager=False)
        hit = (mem.select("id", "rep"),
               mem.filter(F.col("id") == F.col("rep")).select("rep", "q"))
        _QUANTIZER_CACHE[key] = hit
    return hit


def save_embedding_store(store: tuple, path: str) -> None:
    members, reps = store
    members.write.mode("overwrite").parquet(path + "/members")
    reps.write.mode("overwrite").parquet(path + "/reps")


def load_embedding_store(spark: SparkSession, path: str) -> tuple:
    return (spark.read.parquet(path + "/members").select("id", "rep"),
            spark.read.parquet(path + "/reps").select("rep", "q"))


def merge_embedding_deltas(store: tuple, batch_mem: DataFrame,
                           store_bands: DataFrame | None = None,
                           n_bands: int | None = None,
                           bits: int | None = None) -> tuple:
    """The APPEND half of the crawl-loop merge: (new_members, new_reps)
    a batch adds to a (members, reps) store — pure appends, disjoint
    from everything already stored (an id arrives once; a rep is added
    only when its vector is unseen), which is what lets the streaming
    sink keep both stores as append-only delta logs folded by bag
    union. Merge rule preserves the store invariants (rep ∈ its group;
    rep = FIRST-ARRIVAL id of the group — the min id when batches
    arrive in ascending id order, as the fixtures do): a batch group
    whose vector EQUALS an existing store group's joins that group —
    members remap to the store rep; an unseen vector becomes a new
    group under its own rep. One rep-grain equi-join on the array
    column; store cost stays O(distinct content), members grow by
    exactly the batch.

    ``store_bands`` (round 12 — the last measured per-batch O(index)
    term: at (2,32) banding, with candidates near zero and the probe's
    attach joins pushed down, the day-scale soak STILL grew 1.88×, and
    the residual was THIS join streaming every stored rep's ~520 B q
    column per batch): equal vectors have equal band keys in EVERY
    band, so when the persisted band log is given, candidate reps are
    found by a narrow band-0 match (3 int64 columns) against the
    batch's band-0 keys BEFORE any vector is attached — exact, not
    approximate (a true q == bq match always survives), with the same
    (n_bands, bits) geometry the log was written under. The candidate
    ids then filter the reps scan the same way the probe's pushdown
    does — a guarded collect into an isin() that reaches the parquet
    scan; a semi-join would drop rows only AFTER the scan had already
    read every q byte (measured: the semi-join draft saved nothing at
    288 batches). Above the guard, the semi-join is still the fallback
    (join-build savings without the driver cost).

    Geometry is REQUIRED with the band log: a band log read under the
    wrong (n_bands, bits) makes the band-0 prefilter silently miss
    true q-equality matches — duplicate reps fork into the store with
    no error. Callers passing ``store_bands`` must pass the exact
    geometry the log was written under (VectorIndexSink reads it from
    the manifest, which _band_log has already validated); a default
    would be the silent-fork trap, so store_bands + None raises."""
    if store_bands is not None and (n_bands is None or bits is None):
        raise ValueError(
            "store_bands requires the explicit (n_bands, bits) the "
            "band log was written under — a defaulted geometry would "
            "silently miss q-equality matches and fork duplicate reps")
    if n_bands is None:
        n_bands, bits = 8, 8    # no band log: geometry unused
    members, reps = store
    breps = batch_mem.filter(F.col("id") == F.col("rep")).select(
        F.col("rep").alias("brep"), F.col("q").alias("bq"))
    scan = reps
    if store_bands is not None:
        b0 = (breps.select(F.col("bq").alias("q"))
                   .select(F.element_at(
                       _sign_band_structs(n_bands, bits), 1)
                       .getField("band_key").alias("band_key"))
                   .distinct())
        cand = (store_bands.filter(F.col("band_idx") == 0)
                           .join(F.broadcast(b0), "band_key")
                           .select("rep"))
        ids = [r.rep for r in
               cand.limit(_ATTACH_PUSHDOWN_MAX + 1).collect()]
        if len(ids) <= _ATTACH_PUSHDOWN_MAX:
            scan = reps.filter(F.col("rep").isin(ids))
        else:
            scan = reps.join(cand, "rep", "left_semi")
    # INNER join with the batch side broadcast, so the store is
    # scanned/streamed, never shuffled (the left-outer draft forced a
    # sort-merge join on the array key — O(store shuffle) per batch,
    # the same growth the probe's soak caught); the outer semantics
    # are recovered by the left join against the batch-sized matched
    # set below.
    matched = (scan.join(F.broadcast(breps), scan["q"] == breps["bq"])
                   .select("brep", F.col("rep").alias("srep")))
    remap = (breps.join(matched, "brep", "left")
                  .select("brep",
                          F.coalesce("srep", F.col("brep")).alias("rep")))
    new_members = (batch_mem.select("id", F.col("rep").alias("brep"))
                            .join(remap, "brep")
                            .select("id", "rep"))
    new_reps = (breps.join(matched.select("brep"), "brep", "left_anti")
                     .select(F.col("brep").alias("rep"),
                             F.col("bq").alias("q")))
    return new_members, new_reps


def merge_embedding_store(store: tuple, batch_mem: DataFrame) -> tuple:
    """Fold a probed batch INTO the store (merge_embedding_deltas'
    docstring for the rule): the store after the batch is the old store
    plus exactly the batch's member/rep deltas."""
    members, reps = store
    new_members, new_reps = merge_embedding_deltas(store, batch_mem)
    return (members.unionByName(new_members),
            reps.unionByName(new_reps))


def _probe_embedding_store(store: tuple, bmem: DataFrame,
                           threshold: float, n_bands: int = 8,
                           bits: int = 8,
                           store_bands: DataFrame | None = None,
                           pushdown: bool = True,
                           store_reps_loader=None) -> DataFrame:
    """Probe kernel shared by the one-shot query and the multibatch
    fold: verified near-dup member pairs for a collapsed batch frame
    (id, q, rep) against a (members, reps) store.

    Verification runs at REP grain (members carry IDENTICAL vectors to
    their rep, so cos(member_a, member_b) == cos(rep_a, rep_b) —
    expansion is exact, not approximate), then member pairs expand
    arithmetically; within-batch same-group pairs score with the same
    kernel on the group's own vector. Each member pair is emitted
    exactly once, so no distinct ever runs at member grain.

    ``store_bands`` (rep, band_idx, band_key), when given, replaces the
    per-call sign-banding of the whole reps store — the round-11 fix
    for VectorIndexSink's residual O(index) per-batch term: a durable
    index persists its band rows ONCE per rep (a fourth append-only
    delta log) and the probe reads three narrow int64 columns instead
    of recomputing 64 element_at signs per stored rep every trigger.
    Callers must band with the SAME (n_bands, bits) geometry; one-shot
    queries keep passing None and band in-plan."""
    store_members, store_reps = store
    batch_members = bmem.select("id", "rep")
    batch_reps = bmem.filter(F.col("id") == F.col("rep")).select("rep", "q")
    # Candidate generation is JOIN-shaped, not bucket-shaped: the first
    # 120-batch soak of VectorIndexSink caught the union+groupBy/
    # collect_list draft re-SHUFFLING every store band row per batch —
    # per-batch cost grew with index size (~14s/batch by batch 50 at
    # 5k rows/batch). Broadcasting the batch's band rows (batch-sized
    # by definition) lets the store side STREAM through a broadcast
    # hash join: the index is scanned, never shuffled, and the only
    # shuffled frames are candidate pairs (distinct-content grain).
    if store_bands is None:
        store_bands = _emb_rep_bands(store_reps, n_bands, bits)
    else:
        store_bands = store_bands.select("rep", "band_idx", "band_key")
    batch_bands = _emb_rep_bands(batch_reps, n_bands, bits)
    new_old = (store_bands
               .join(F.broadcast(batch_bands.withColumnRenamed("rep", "n")),
                     ["band_idx", "band_key"])
               .select("n", F.col("rep").alias("m")))
    b2 = batch_bands.withColumnRenamed("rep", "m")
    new_new = (batch_bands.withColumnRenamed("rep", "n")
               .join(F.broadcast(b2), ["band_idx", "band_key"])
               .filter(F.col("n") < F.col("m"))
               .select("n", "m"))
    rep_pairs = (
        new_old.unionByName(new_new)
               .select(F.least("n", "m").alias("pa"),
                       F.greatest("n", "m").alias("pb"))
               .distinct()
    )
    all_reps = store_reps.unionByName(batch_reps)
    cos = (
        dot_q(F.col("qa"), F.col("qb")).cast("double")
        / (F.sqrt(dot_q(F.col("qa"), F.col("qa")).cast("double"))
           * F.sqrt(dot_q(F.col("qb"), F.col("qb")).cast("double")))
    )
    # rep_pairs is eagerly checkpointed: the 30-batch profile caught
    # the lineage-carrying draft sort-merge-joining the growing store
    # twice per batch in the vector-attach joins (probe 7.4s -> 22.8s
    # over 18 batches), and a broadcast-PIN rewrite was worse still —
    # nested broadcast builds recompute the candidate subtree per
    # consumer (13s -> 78s by batch 5). A materialized candidate table
    # gives the planner its EXACT (tiny, rep-grain) size, so both
    # attach joins build on it and the rep table streams, without
    # recomputation.
    rep_pairs = rep_pairs.localCheckpoint()
    # Candidate-rep pushdown (round 12): even with the band log, the
    # two vector-attach joins STREAM the whole reps log per batch —
    # reading the q column (~520 B/rep) for every stored rep when only
    # the candidate reps' vectors are needed. rep_pairs is already
    # materialized and rep-grain-tiny, so collecting its distinct rep
    # ids is bounded; an isin filter on the reps log pushes to the
    # parquet scan (In/range predicate → row-group pruning — delta
    # dirs are arrival-ordered, so candidates prune well). Guarded
    # twice: above _ATTACH_PUSHDOWN_MAX ids we keep the streaming join
    # (a driver-side set that large costs more than it saves), and
    # ``pushdown=False`` skips the collect entirely — the isin only
    # pays when the reps side is a FILE scan the predicate can reach;
    # one-shot callers whose store is built in-plan (batch-sized,
    # memory-backed) would pay the two driver jobs' fixed cost for
    # nothing (the r12 verdict measured ~30% over control drift on
    # emb_incremental_near_dup_pairs at sf0.1).
    attach_reps = all_reps
    if pushdown:
        cand_reps = (rep_pairs.select(F.explode(F.array("pa", "pb"))
                                       .alias("rep")).distinct()
                              .select("rep",
                                      _rep_bucket_expr().alias("_bk")))
        rows = cand_reps.limit(_ATTACH_PUSHDOWN_MAX + 1).collect()
        cand_ids = [r.rep for r in rows]
        if len(cand_ids) <= _ATTACH_PUSHDOWN_MAX:
            if store_reps_loader is not None:
                # r14 bucketed-layout pruning: re-enumerate the STORE
                # scan restricted to the candidate ids' bucket
                # directories (computed by Spark above — same hash
                # expression the fold writer uses), then apply the
                # exact isin on top. Bucket pruning is a SUPERSET
                # restriction, so rows are identical to the unpruned
                # filter; flat (pre-bucketing) dirs are read whole and
                # the isin still reaches their parquet scans.
                pruned = store_reps_loader(
                    sorted({r._bk for r in rows}))
                base = (pruned.select("rep", "q")
                        if pruned is not None else store_reps)
                attach_reps = (base.unionByName(batch_reps)
                                   .filter(F.col("rep").isin(cand_ids)))
            else:
                attach_reps = all_reps.filter(F.col("rep").isin(cand_ids))
    r1 = attach_reps.select(F.col("rep").alias("pa"),
                            F.col("q").alias("qa"))
    r2 = attach_reps.select(F.col("rep").alias("pb"),
                            F.col("q").alias("qb"))
    verified = (
        rep_pairs.join(r1, "pa").join(r2, "pb")
                 .select("pa", "pb", cos.alias("cos_sim"))
                 .filter(F.col("cos_sim") >= threshold)
    )
    members = store_members.unionByName(batch_members)
    cross = (
        members.select(F.col("rep").alias("pa"), F.col("id").alias("da"))
               .join(F.broadcast(verified), "pa")
               .join(members.select(F.col("rep").alias("pb"),
                                    F.col("id").alias("db")), "pb")
               .select(F.least("da", "db").alias("id1"),
                       F.greatest("da", "db").alias("id2"), "cos_sim")
    )
    selfcos = (
        dot_q(F.col("q"), F.col("q")).cast("double")
        / (F.sqrt(dot_q(F.col("q"), F.col("q")).cast("double"))
           * F.sqrt(dot_q(F.col("q"), F.col("q")).cast("double")))
    )
    grp = (bmem.filter(F.col("id") == F.col("rep"))
               .select("rep", selfcos.alias("cos_sim"))
               .filter(F.col("cos_sim") >= threshold))
    m1, m2 = batch_members.alias("m1"), batch_members.alias("m2")
    within = (m1.join(m2, (F.col("m1.rep") == F.col("m2.rep"))
                          & (F.col("m1.id") < F.col("m2.id")))
                .select(F.col("m1.id").alias("id1"),
                        F.col("m2.id").alias("id2"),
                        F.col("m1.rep").alias("rep"))
                .join(F.broadcast(grp), "rep")
                .select("id1", "id2", "cos_sim"))
    return cross.unionByName(within)


def emb_incremental_near_dup_pairs(spark: SparkSession, sf_dir: str,
                                   store: tuple | None = None,
                                   threshold: float = 0.9) -> DataFrame:
    """Incremental vector near-dup detection: verified cosine pairs for
    a NEW batch of embeddings (the mutant half of _q_corpus, ids >=
    100000) against the PERSISTED index of the already-ingested corpus
    — without recomputing old vectors. Emits ONLY new×old and new×new
    pairs; per-batch cost is O(batch·bands + matched DISTINCT-content
    buckets), independent of corpus size and duplicate multiplicity.

    Bit-exact with the full recompute restricted to batch-touching
    pairs (oracle: EMB_NEAR_DUP_SQL's pair set WHERE id2 >= 100000 —
    batch ids all sort above corpus ids): identical vectors imply
    identical band keys in every band AND identical cosine scores, so
    rep-grain banding + rep-grain verification + arithmetic member
    expansion reproduce exactly the member-grain pair set.

    Scale: band rows shuffle once on (band_idx, band_key); the verified
    rep-pair table broadcasts into the two membership expansion joins
    (pair counts are rep-grain — bounded by distinct content, the thing
    that made the LSH store's member-grain probe super-linear before
    round 10's collapse)."""
    if store is None:
        store = embedding_store(spark, sf_dir)
    bmem = _emb_collapsed(
        _q_corpus(spark, sf_dir).filter(F.col("id") >= _MUTANT_OFFSET)
    ).localCheckpoint(eager=False)
    # pushdown=False (round 13): this one-shot path builds the store
    # in-plan — there is no parquet scan for the isin to reach, so the
    # pushdown's two guarded driver collects are pure fixed cost here
    # (~30% over control drift at sf0.1 per the r12 adjudication). The
    # durable sinks, whose reps log IS a file scan, keep the default.
    return _probe_embedding_store(store, bmem, threshold,
                                  pushdown=False)


EMB_INCR_NEAR_DUP_SQL = f"""
SELECT id1, id2, cos_sim
FROM ({EMB_NEAR_DUP_SQL}) WHERE id2 >= {_MUTANT_OFFSET}
"""


def emb_streaming_near_dup_fold(spark: SparkSession, sf_dir: str,
                                n_batches: int = 3,
                                threshold: float = 0.9) -> DataFrame:
    """streaming.VectorIndexSink's per-micro-batch algebra exposed as a
    driver-checkable query (the exposure pattern of
    streaming_dedup_first_event): fold the ENTIRE planted corpus
    (_q_corpus) through ``n_batches`` id-sliced micro-batches starting
    from an EMPTY index — probe, emit verified pairs, merge the batch
    in, repeat. Every verified pair of the corpus is emitted exactly
    once, in the batch where its LATER member arrives (earlier member
    already indexed ⇒ cross pair; same batch ⇒ in-batch pair), so the
    union over batches IS the one-shot emb_cosine_near_dup_pairs answer
    — the oracle is the same full-recompute SQL, proving that batch
    boundaries (and first-arrival rep choice, which interleaved id
    slices exercise) change nothing.

    Scale: n_batches bounds the driver loop (a trigger count, not a
    data size); each iteration is the incremental probe's rep-grain
    plan, so per-batch cost is O(batch + matched distinct content)."""
    c = _q_corpus(spark, sf_dir)
    store = (c.select("id", F.col("id").alias("rep")).limit(0),
             c.select(F.col("id").alias("rep"), "q").limit(0))
    out: DataFrame | None = None
    for i in range(n_batches):
        bmem = _emb_collapsed(
            c.filter(F.col("id") % n_batches == i)
        ).localCheckpoint(eager=False)
        # in-plan store: no file scan for the isin to reach (see
        # emb_incremental_near_dup_pairs' pushdown note)
        pairs = _probe_embedding_store(store, bmem, threshold,
                                       pushdown=False)
        out = pairs if out is None else out.unionByName(pairs)
        store = merge_embedding_store(store, bmem)
    return out
