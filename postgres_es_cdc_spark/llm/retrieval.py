"""Search-side text retrieval ([EXT] with a REF anchor): the reference's
whole consumer exists to feed an Elasticsearch index it then queries
with `match` clauses (es.go:50-54, es.go:114-120). These operators build
that search capability natively: an inverted index over the corpus and a
deterministic relevance-ranked match query — the set-oriented, shuffle-
once form of what ES does per document.

Cross-engine exactness: no logarithms (libm ln differs by ulps across
engines — see docs_term_frequency). IDF uses the exact integer rational
floor(1e6·N/df); term-frequency saturation uses the BM25-shaped kernel
tf·(k1+1)/(tf+k1) evaluated in a fixed IEEE op sequence and floored to
1e-6 fixed point, so every score is an exact int64 in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.llm.text import TOKENS_SQL, tokens

MATCH_TERMS = ("merge", "vector", "stream", "filter")
_K1 = 1.2


def docs_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term -> sorted postings list (distinct doc_ids) with document and
    collection frequency — the index structure behind every match query.

    Scale: explode -> one partial-agg shuffle keyed by term. Postings
    lists for common terms get long; a production layout shards them
    (term, bucket) — the df/cf stats here are what drives that split.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # postings serialized to one canonical string: engine-portable to
    # hash-compare (nested-array cell encodings differ across engines)
    # and the on-the-wire shape a posting list ships in anyway.
    return tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cf"),
        F.array_join(F.sort_array(F.collect_set("doc_id")), ",")
         .alias("postings"))


DOCS_INVERTED_INDEX_SQL = f"""
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
FROM (SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
      FROM documents)
GROUP BY term
"""


def docs_match_query(spark: SparkSession, sf_dir: str,
                     k: int = 10) -> DataFrame:
    """ES-style multi-term OR match query (es.go:50-54 is the single-
    term form), ranked by integer-exact saturated tf-idf:

        score = Σ_terms  floor(1e6·tf·(k1+1)/(tf+k1)) · (1e6·N div df)

    Top-k docs, ties broken by doc_id — the ranking is reproducible on
    any engine and any partitioning.

    Scale: the per-term df aggregate is tiny (|query| rows) and
    broadcast back; the doc-side tf aggregate shuffles only rows whose
    term is in the query (the isin filter applies before the shuffle),
    and the top-k is a TakeOrdered — no global sort.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = d.filter(F.col("text").isNotNull()).count()

    qtok = tok.filter(F.col("term").isin(*MATCH_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (qtok.groupBy("term")
               .agg(F.countDistinct("doc_id").alias("df")))
    sat = F.floor(F.col("tf") * F.lit(1000000.0) * (_K1 + 1.0)
                  / (F.col("tf") + F.lit(_K1))).cast("long")
    idf = F.expr(f"{1000000 * n_docs} div df")
    scored = (tf.join(F.broadcast(df_), "term")
                .select("doc_id",
                        (sat * idf).alias("term_score")))
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("score_q"),
        F.count(F.lit(1)).alias("n_terms_matched"))
    return (per_doc
            .orderBy(F.desc("score_q"), F.asc("doc_id"))
            .limit(k))


DOCS_MATCH_QUERY_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
  FROM documents
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
), qtok AS (
  SELECT doc_id, term FROM tok
  WHERE term IN {str(tuple(MATCH_TERMS))}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         CAST(floor(tf.tf * 1000000.0 * CAST({_K1 + 1.0} AS DOUBLE)
                    / (tf.tf + CAST({_K1} AS DOUBLE)))
              AS BIGINT)
         * ((1000000 * (SELECT n_docs FROM n)) // dfreq.df) AS term_score
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score_q,
       COUNT(*) AS n_terms_matched
FROM scored
GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC
LIMIT 10
"""
