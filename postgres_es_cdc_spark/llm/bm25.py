"""BM25 ranked retrieval ([EXT], REF anchor es.go:50-54): the real
Okapi BM25 scoring function — logarithmic idf and document-length
normalization — over the documents corpus, for the same multi-term
match query as docs_match_query (which uses a log-free saturated tf-idf
precisely because libm logs aren't portable).

The log here IS portable: functions/detlog.py computes
ln((2N+2)/(2df+1)) — algebraically ln(1 + (N-df+0.5)/(df+0.5)), the
standard BM25+ idf — from correctly-rounded IEEE primitives only, so
Spark and DuckDB produce bit-identical doubles and the 1e-6-quantized
per-term scores are exact int64 in both engines.

score(d) = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))
with k1=1.2, b=0.75, dl/avgdl computed as dl·N/total_tokens (all-integer
inputs, one exact double ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.functions.detlog import (
    apply_stages_spark, ln_ratio_stages, stages_cte_sql)
from postgres_es_cdc_spark.llm.text import TOKENS_SQL, tokens

MATCH_TERMS = ("merge", "vector", "stream", "filter")
TOP_K = 10


def _tfn_stages(n_docs: str, total_tokens: str) -> list[tuple[str, str]]:
    """Length-normalized term-frequency saturation + final quantized
    score. Same strings drive both engines; `ln_ab` (the idf) is
    produced by the detlog stages upstream."""
    return [
        ("lr", f"CAST(dl * {n_docs} AS DOUBLE)"
               f" / CAST({total_tokens} AS DOUBLE)"),
        ("denom", "CAST(tf AS DOUBLE)"
                  " + 1.2E0 * ((1.0E0 - 7.5E-1) + 7.5E-1 * lr)"),
        ("tfn", "CAST(tf AS DOUBLE) * 2.2E0 / denom"),
        ("score_q",
         "CAST(floor(ln_ab * tfn * 1.0E6 + 5.0E-1) AS BIGINT)"),
    ]


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k docs for the match query under true BM25 (deterministic
    ln). Ties break by doc_id asc.

    Scale: corpus tokenization feeds two partial-agg passes (per-doc
    length; per-(doc,term) tf restricted to query terms). The per-term
    idf table is |query| rows — broadcast. The dl join keys on doc_id
    over docs that matched at least one query term only. Top-k is a
    TakeOrdered, no global sort.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = d.filter(F.col("text").isNotNull()).count()
    total_tokens = tok.count()

    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qtok = tok.filter(F.col("term").isin(*MATCH_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = apply_stages_spark(
        df_, ln_ratio_stages(f"{2 * n_docs + 2}", "(2*df + 1)"))

    joined = (tf.join(F.broadcast(idf.select("term", "ln_ab")), "term")
                .join(dl, "doc_id"))
    scored = apply_stages_spark(
        joined, _tfn_stages(str(n_docs), str(total_tokens)))
    return (scored.groupBy("doc_id")
                  .agg(F.sum("score_q").alias("score_q"),
                       F.count(F.lit(1)).alias("n_terms_matched"))
                  .orderBy(F.desc("score_q"), F.asc("doc_id"))
                  .limit(TOP_K))


RERANK_CANDIDATES = 20
RERANK_K = 5


def docs_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the production search architecture: a cheap
    lexical candidate generator (BM25 top-20) followed by a different,
    more selective scorer over just those candidates (query-term
    tf-vector cosine here; a cross-encoder in production). Only the
    candidate set reaches stage 2, so the reranker's cost is O(k1)
    per query regardless of corpus size.

    Exactness: stage-1 scores are the detlog-quantized BM25 integers;
    stage-2 cosine is ints under IEEE sqrt/divide — bit-identical in
    both engines. Final order: cosine desc, bm25 desc, doc_id asc.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = d.filter(F.col("text").isNotNull()).count()
    total_tokens = tok.count()

    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qtok = tok.filter(F.col("term").isin(*MATCH_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = apply_stages_spark(
        df_, ln_ratio_stages(f"{2 * n_docs + 2}", "(2*df + 1)"))
    joined = (tf.join(F.broadcast(idf.select("term", "ln_ab")), "term")
                .join(dl, "doc_id"))
    scored = apply_stages_spark(
        joined, _tfn_stages(str(n_docs), str(total_tokens)))
    cands = (scored.groupBy("doc_id")
                   .agg(F.sum("score_q").alias("bm25_q"))
                   .orderBy(F.desc("bm25_q"), F.asc("doc_id"))
                   .limit(RERANK_CANDIDATES))
    # stage 2: query-term tf-vector cosine against the all-ones query
    # vector (|Q| = len(MATCH_TERMS)); candidates only reach this join.
    tfv = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("s1"), F.sum(F.col("tf") * F.col("tf")).alias("s2"))
    rr = (cands.join(tfv, "doc_id")
               .select("doc_id", "bm25_q",
                       (F.col("s1").cast("double")
                        / (F.sqrt(F.col("s2").cast("double"))
                           * F.lit(float(len(MATCH_TERMS)) ** 0.5)))
                       .alias("cos_rr")))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("cos_rr"), F.desc("bm25_q"), F.asc("doc_id"))
    return (rr.withColumn("rank", F.row_number().over(w).cast("long"))
              .filter(F.col("rank") <= RERANK_K)
              .select("rank", "doc_id", "bm25_q", "cos_rr"))


def _build_sql() -> str:
    n_sub = "(SELECT n_docs FROM n)"
    t_sub = "(SELECT t_tokens FROM tot)"
    idf_cte, idf_last = stages_cte_sql(
        "dfreq", ln_ratio_stages(f"(2*{n_sub} + 2)", "(2*df + 1)"), "idf")
    tfn_cte, tfn_last = stages_cte_sql(
        "joined", _tfn_stages(n_sub, t_sub), "sc")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
  FROM documents
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
), tot AS (
  SELECT COUNT(*) AS t_tokens FROM tok
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), qtok AS (
  SELECT doc_id, term FROM tok WHERE term IN {str(tuple(MATCH_TERMS))}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY term
), {idf_cte},
joined AS (
  SELECT tf.doc_id, tf.tf, dl.dl, i.ln_ab
  FROM tf JOIN {idf_last} i USING (term) JOIN dl USING (doc_id)
), {tfn_cte}
SELECT doc_id, CAST(SUM(score_q) AS BIGINT) AS score_q,
       COUNT(*) AS n_terms_matched
FROM {tfn_last}
GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC
LIMIT {TOP_K}
"""


DOCS_BM25_TOPK_SQL = _build_sql()


def _build_rerank_sql() -> str:
    n_sub = "(SELECT n_docs FROM n)"
    t_sub = "(SELECT t_tokens FROM tot)"
    idf_cte, idf_last = stages_cte_sql(
        "dfreq", ln_ratio_stages(f"(2*{n_sub} + 2)", "(2*df + 1)"), "idf")
    tfn_cte, tfn_last = stages_cte_sql(
        "joined", _tfn_stages(n_sub, t_sub), "sc")
    q_norm = float(len(MATCH_TERMS)) ** 0.5
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
  FROM documents
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
), tot AS (
  SELECT COUNT(*) AS t_tokens FROM tok
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), qtok AS (
  SELECT doc_id, term FROM tok WHERE term IN {str(tuple(MATCH_TERMS))}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY term
), {idf_cte},
joined AS (
  SELECT tf.doc_id, tf.tf, dl.dl, i.ln_ab
  FROM tf JOIN {idf_last} i USING (term) JOIN dl USING (doc_id)
), {tfn_cte},
cands AS (
  SELECT doc_id, CAST(SUM(score_q) AS BIGINT) AS bm25_q
  FROM {tfn_last}
  GROUP BY doc_id
  ORDER BY bm25_q DESC, doc_id ASC
  LIMIT {RERANK_CANDIDATES}
), tfv AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS s1,
         CAST(SUM(tf * tf) AS BIGINT) AS s2
  FROM tf GROUP BY doc_id
), rr AS (
  SELECT c.doc_id, c.bm25_q,
         CAST(s1 AS DOUBLE) / (SQRT(CAST(s2 AS DOUBLE)) * {q_norm!r}) AS cos_rr
  FROM cands c JOIN tfv USING (doc_id)
)
SELECT rank, doc_id, bm25_q, cos_rr
FROM (SELECT doc_id, bm25_q, cos_rr,
             ROW_NUMBER() OVER (
               ORDER BY cos_rr DESC, bm25_q DESC, doc_id ASC) AS rank
      FROM rr)
WHERE rank <= {RERANK_K}
"""


DOCS_RETRIEVE_RERANK_SQL = _build_rerank_sql()


RRF_K = 60          # the standard reciprocal-rank-fusion constant
RRF_CANDIDATES = 20
RRF_TOP = 10


def docs_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers — the standard way
    hybrid search merges lexical and semantic rankings without score
    calibration: rrf(d) = Σ_r 1/(K + rank_r(d)), K=60 (Cormack et al.).
    Here the fused rankers are BM25 top-20 and a tf-vector cosine
    top-20 (independent scoring geometries over the same match query).

    Exactness: ranks are integers, so each doc's fused score is the
    exact rational Σ 1/(K+r) formed as integer numerator/denominator
    and descaled by ONE double division — bit-identical cross-engine
    (never sum the per-list float reciprocals). Scale: both rankers are
    candidate-bounded top-k (TakeOrdered); the fusion join touches ≤40
    rows."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = d.filter(F.col("text").isNotNull()).count()
    total_tokens = tok.count()

    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qtok = tok.filter(F.col("term").isin(*MATCH_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = apply_stages_spark(
        df_, ln_ratio_stages(f"{2 * n_docs + 2}", "(2*df + 1)"))
    joined = (tf.join(F.broadcast(idf.select("term", "ln_ab")), "term")
                .join(dl, "doc_id"))
    scored = apply_stages_spark(
        joined, _tfn_stages(str(n_docs), str(total_tokens)))
    wa = Window.orderBy(F.desc("bm25_q"), F.asc("doc_id"))
    list_a = (scored.groupBy("doc_id")
                    .agg(F.sum("score_q").alias("bm25_q"))
                    .withColumn("rank_bm25",
                                F.row_number().over(wa).cast("long"))
                    .filter(F.col("rank_bm25") <= RRF_CANDIDATES)
                    .select("doc_id", "rank_bm25"))
    tfv = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("s1"), F.sum(F.col("tf") * F.col("tf")).alias("s2"))
    cos = tfv.select(
        "doc_id",
        (F.col("s1").cast("double")
         / (F.sqrt(F.col("s2").cast("double"))
            * F.lit(float(len(MATCH_TERMS)) ** 0.5))).alias("cos_tf"))
    wb = Window.orderBy(F.desc("cos_tf"), F.asc("doc_id"))
    list_b = (cos.withColumn("rank_cos",
                             F.row_number().over(wb).cast("long"))
                 .filter(F.col("rank_cos") <= RRF_CANDIDATES)
                 .select("doc_id", "rank_cos"))
    fused = list_a.join(list_b, "doc_id", "full_outer")
    ta = F.col("rank_bm25") + F.lit(RRF_K)
    tb = F.col("rank_cos") + F.lit(RRF_K)
    num = (F.when(F.col("rank_bm25").isNotNull()
                  & F.col("rank_cos").isNotNull(), ta + tb)
            .when(F.col("rank_bm25").isNotNull(), F.lit(1))
            .otherwise(F.lit(1))).cast("long")
    den = (F.when(F.col("rank_bm25").isNotNull()
                  & F.col("rank_cos").isNotNull(), ta * tb)
            .when(F.col("rank_bm25").isNotNull(), ta)
            .otherwise(tb)).cast("long")
    wf = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (fused.withColumn("rrf", num.cast("double") / den.cast("double"))
                 .withColumn("fused_rank",
                             F.row_number().over(wf).cast("long"))
                 .filter(F.col("fused_rank") <= RRF_TOP)
                 .select("fused_rank", "doc_id", "rank_bm25", "rank_cos",
                         "rrf"))


def _build_rrf_sql() -> str:
    n_sub = "(SELECT n_docs FROM n)"
    t_sub = "(SELECT t_tokens FROM tot)"
    idf_cte, idf_last = stages_cte_sql(
        "dfreq", ln_ratio_stages(f"(2*{n_sub} + 2)", "(2*df + 1)"), "idf")
    tfn_cte, tfn_last = stages_cte_sql(
        "joined", _tfn_stages(n_sub, t_sub), "sc")
    q_norm = float(len(MATCH_TERMS)) ** 0.5
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
  FROM documents
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
), tot AS (
  SELECT COUNT(*) AS t_tokens FROM tok
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), qtok AS (
  SELECT doc_id, term FROM tok WHERE term IN {str(tuple(MATCH_TERMS))}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY term
), {idf_cte},
joined AS (
  SELECT tf.doc_id, tf.tf, dl.dl, i.ln_ab
  FROM tf JOIN {idf_last} i USING (term) JOIN dl USING (doc_id)
), {tfn_cte},
list_a AS (
  SELECT doc_id, rank_bm25 FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25_q DESC, doc_id ASC) AS rank_bm25
    FROM (SELECT doc_id, CAST(SUM(score_q) AS BIGINT) AS bm25_q
          FROM {tfn_last} GROUP BY doc_id))
  WHERE rank_bm25 <= {RRF_CANDIDATES}
), tfv AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS s1,
         CAST(SUM(tf * tf) AS BIGINT) AS s2
  FROM tf GROUP BY doc_id
), list_b AS (
  SELECT doc_id, rank_cos FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cos_tf DESC, doc_id ASC) AS rank_cos
    FROM (SELECT doc_id,
                 CAST(s1 AS DOUBLE) / (SQRT(CAST(s2 AS DOUBLE)) * {q_norm!r})
                   AS cos_tf
          FROM tfv))
  WHERE rank_cos <= {RRF_CANDIDATES}
), fused AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.rank_bm25, b.rank_cos,
         CAST(CASE WHEN a.rank_bm25 IS NOT NULL AND b.rank_cos IS NOT NULL
                   THEN (a.rank_bm25 + {RRF_K}) + (b.rank_cos + {RRF_K})
                   ELSE 1 END AS DOUBLE)
         / CAST(CASE WHEN a.rank_bm25 IS NOT NULL AND b.rank_cos IS NOT NULL
                     THEN (a.rank_bm25 + {RRF_K}) * (b.rank_cos + {RRF_K})
                     WHEN a.rank_bm25 IS NOT NULL THEN a.rank_bm25 + {RRF_K}
                     ELSE b.rank_cos + {RRF_K} END AS DOUBLE) AS rrf
  FROM list_a a FULL OUTER JOIN list_b b USING (doc_id)
)
SELECT fused_rank, doc_id, rank_bm25, rank_cos, rrf
FROM (SELECT doc_id, rank_bm25, rank_cos, rrf,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS fused_rank
      FROM fused)
WHERE fused_rank <= {RRF_TOP}
"""


DOCS_RRF_FUSION_SQL = _build_rrf_sql()
