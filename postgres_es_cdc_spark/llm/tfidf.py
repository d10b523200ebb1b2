"""TF-IDF document similarity search ([EXT]): rank the corpus against
query documents by tf-idf-weighted dot product — text-side nearest
neighbors, the sparse-vector sibling of emb_cosine_topk.

Cross-engine exactness: same policy as llm/retrieval.py — no libm log.
idf_q = floor(1e3·N/df) is an exact integer rational; per-term weights
tf·idf_q are exact int64 (vocab df here is never tiny, so idf_q stays
~1e3: the score sum is bounded far below int64 even at 100x corpus
growth, because N/df is scale-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.llm.text import TOKENS_SQL, tokens

QUERY_DOCS = (3, 17, 42)
TOP_K = 5


def docs_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most similar corpus docs per query doc by tf-idf dot
    product (query docs excluded from their own result lists; ties by
    candidate doc_id asc).

    Scale: term df is one partial-agg pass; the query docs' weighted
    vectors are a |queries|·|vocab| table — broadcast; candidates
    stream through one explode + broadcast-join + per-doc aggregate,
    then per-query top-k via WindowGroupLimit. The corpus is never
    pair-joined with itself.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = d.filter(F.col("text").isNotNull()).count()

    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    w = tf.join(df_, "term").select(
        "doc_id", "term",
        (F.col("tf") * F.expr(f"{1000 * n_docs} div df")).alias("w_q"))

    qvec = (w.filter(F.col("doc_id").isin(*QUERY_DOCS))
             .select(F.col("doc_id").alias("qid"),
                     "term", F.col("w_q").alias("qw_q")))
    scored = (w.join(F.broadcast(qvec), "term")
               .filter(F.col("doc_id") != F.col("qid"))
               .groupBy("qid", "doc_id")
               .agg(F.sum(F.col("w_q") * F.col("qw_q")).alias("score_q")))
    rank_w = Window.partitionBy("qid").orderBy(
        F.desc("score_q"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(rank_w)
                              .cast("long"))
                  .filter(F.col("rank") <= TOP_K)
                  .select("qid", "doc_id", "score_q", "rank"))


DOCS_TFIDF_TOPK_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
  FROM documents
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
), w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ((1000 * (SELECT n_docs FROM n)) // dfreq.df) AS w_q
  FROM tf JOIN dfreq USING (term)
), qvec AS (
  SELECT doc_id AS qid, term, w_q AS qw_q FROM w
  WHERE doc_id IN {str(tuple(QUERY_DOCS))}
), scored AS (
  SELECT q.qid, w.doc_id, CAST(SUM(w.w_q * q.qw_q) AS BIGINT) AS score_q
  FROM w JOIN qvec q USING (term)
  WHERE w.doc_id <> q.qid
  GROUP BY q.qid, w.doc_id
)
SELECT qid, doc_id, score_q, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY score_q DESC, doc_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOP_K}
"""
