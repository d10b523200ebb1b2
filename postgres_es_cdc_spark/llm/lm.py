"""Corpus-trained bigram language-model scoring ([EXT] surface): the
classic KenLM-shaped perplexity filter of LLM data pipelines (CCNet's
"keep documents a small LM finds predictable") — reduced to a bigram
model with add-one smoothing so both engines can compute it exactly.

score(doc) = mean over adjacent token pairs of
             -ln P(w2 | w1),   P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V)

where c(·) are corpus-wide counts over bigram-start positions and V is
the corpus vocabulary size. The negative log is ln((c1+V)/(c12+1)) with
numerator >= denominator, which is exactly the form
functions/detlog.py computes from correctly-rounded IEEE primitives —
bit-identical in Spark and DuckDB. Per-term scores are quantized to
1e-9 integers, so the per-doc sum is order-independent int64 and the
final mean is two deterministic double divisions.

Scale shape: counting is one explode + two partial-aggregable groupBys
keyed by term (the word-count MapReduce); scoring joins each bigram
occurrence against the count tables on term keys (AQE broadcasts them
when the vocabulary is small; at web scale they shuffle-join, which is
the right shape); the per-doc rollup is one map-side-combinable
aggregation. No Python, no libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import scan_parallel, table
from postgres_es_cdc_spark.functions.detlog import (
    apply_stages_spark, ln_ratio_stages, stages_cte_sql)
from postgres_es_cdc_spark.llm.text import TOKENS_SQL, tokens

_TERM_Q = "CAST(floor(ln_ab * 1.0E9 + 5.0E-1) AS BIGINT)"


def docs_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus
    bigram LM (lower = more predictable; the pipeline's perplexity
    proxy, exp() deliberately not taken — libm exp is not portable and
    ranking/thresholding needs only the monotone NLL)."""
    d = scan_parallel(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = tokens(F.col("text"))
    base = d.select("doc_id", toks.alias("t"), F.size(toks).alias("n"))
    t2 = F.slice(F.col("t"), 2, F.greatest(F.col("n") - 1, F.lit(0)))
    bg_full = F.zip_with(
        F.col("t"), t2,
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")))
    bg_col = F.slice(bg_full, 1, F.greatest(F.col("n") - 1, F.lit(0)))
    bg = (base.select("doc_id", F.explode(bg_col).alias("b"))
              .select("doc_id", "b.w1", "b.w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (base.select(F.explode("t").alias("tok"))
                 .agg(F.countDistinct("tok").alias("v")))
    j = (bg.join(c12, ["w1", "w2"]).join(c1, "w1")
           .crossJoin(F.broadcast(vocab))
           .select("doc_id",
                   (F.col("c1") + F.col("v")).alias("lm_a"),
                   (F.col("c12") + F.lit(1)).alias("lm_b")))
    scored = apply_stages_spark(j, ln_ratio_stages("lm_a", "lm_b"))
    q = scored.select("doc_id", F.expr(_TERM_Q).alias("term_q"))
    return (q.groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_bigrams"),
                  (F.sum("term_q").cast("double") / F.lit(1.0e9)
                   / F.count(F.lit(1))).alias("avg_nll")))


_LN_CTES, _LN_LAST = stages_cte_sql("j", ln_ratio_stages("lm_a", "lm_b"),
                                    "lnc")

DOCS_BIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {TOKENS_SQL.format(col='text')} AS t FROM documents
),
bgl AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
),
bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM bgl),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
v AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks)
),
j AS (
  SELECT bg.doc_id, (c1.c1 + v.v) AS lm_a, (c12.c12 + 1) AS lm_b
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
),
{_LN_CTES},
q AS (SELECT doc_id, {_TERM_Q} AS term_q FROM {_LN_LAST})
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(term_q) AS DOUBLE) / 1.0E9 / COUNT(*) AS avg_nll
FROM q GROUP BY doc_id
"""
