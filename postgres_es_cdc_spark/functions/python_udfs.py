"""Python-extensibility surface: vectorized pandas UDFs (scalar +
grouped-agg) and a Python UDTF ([EXT] — SURVEY.md §2 Table B "UDF /
UDAF / UDTF" row; the reference has no user extensibility at all).

These exist to pin the EXTENSIBILITY CONTRACT, not to be the hot path —
the engine's rule is built-in expressions first (every other query in
the registry is pure JVM). When Python is unavoidable the ranking is:
pandas_udf / mapInPandas (Arrow-batched, vectorized numpy) >> Python
UDTF >> row-at-a-time F.udf (never used here).

Cross-engine exactness: quantization here is floor(x·1e6 + 0.5) — NOT
round() — because numpy's np.round is half-to-even while Spark's
F.round is half-up and DuckDB's round is half-away-from-zero; floor is
identical in all three, so the same formula runs in numpy, Catalyst,
and the DuckDB oracle with provably equal results.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import LongType

from postgres_es_cdc_spark.catalog import table

Q = 1_000_000


# Return types are DataType objects, not DDL strings: DDL strings are
# parsed through the active SparkSession, which does not exist yet at
# module import time (pytest collection imports this module sessionless).
@pandas_udf(LongType())
def _qnorm_sq(emb: pd.Series) -> pd.Series:
    """Quantized squared L2 norm, vectorized over the Arrow batch:
    q = floor(x*1e6 + 0.5) as int64, result = Σ q²  (exact integers)."""
    import numpy as np

    def one(vec) -> int:
        q = np.floor(np.asarray(vec, dtype=np.float64) * Q + 0.5).astype(np.int64)
        return int((q * q).sum())

    return emb.map(one)


@pandas_udf(LongType())
def _sum_agg(v: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: exact int64 sum per group."""
    return int(v.sum())


def emb_pandas_udf_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm statistics where the per-row kernel is a SCALAR
    pandas UDF and the per-group sum is a GROUPED_AGG pandas UDF
    (min/max ride the normal JVM aggregate over the UDF column).

    Scale shape: the UDF is a map-side projection (Arrow batches,
    numpy-vectorized); the aggregation still does a normal partial-agg
    shuffle of one counter row per group. Python cost is O(rows) with
    batch-level amortization — acceptable for kernels Catalyst can't
    express; everything else in this engine stays JVM-side.
    """
    e = table(spark, sf_dir, "embeddings")
    per_vec = e.select(
        F.col("label").cast("long").alias("label"),
        _qnorm_sq(F.col("embedding")).alias("qnorm_sq"))
    # A GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the two halves aggregate
    # separately and join on the (tiny) group key.
    py_agg = per_vec.groupBy("label").agg(
        _sum_agg(F.col("qnorm_sq")).alias("sum_qnorm_sq"))
    jvm_agg = per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("qnorm_sq").alias("min_qnorm_sq"),
        F.max("qnorm_sq").alias("max_qnorm_sq"))
    return (jvm_agg.join(py_agg, "label")
                   .select("label", "n_vecs", "sum_qnorm_sq",
                           "min_qnorm_sq", "max_qnorm_sq"))


EMB_PANDAS_UDF_NORMS_SQL = f"""
WITH per_vec AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {Q} + 0.5) AS BIGINT)
                     * CAST(floor(CAST(x AS DOUBLE) * {Q} + 0.5) AS BIGINT)))
              AS BIGINT) AS qnorm_sq
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(qnorm_sq) AS BIGINT) AS sum_qnorm_sq,
       MIN(qnorm_sq) AS min_qnorm_sq,
       MAX(qnorm_sq) AS max_qnorm_sq
FROM per_vec GROUP BY label
"""

CHUNK = 20  # tokens per chunk


@udtf(returnType="chunk_idx int, n_tokens int, head string")
class _ChunkDoc:
    """Python UDTF: split a document into fixed-size token chunks —
    the table-function shape (one input row -> N output rows) used for
    context-window packing in training pipelines. split(' ') exactly
    matches the oracle's string_split(text, ' ') on runs of spaces."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), CHUNK):
            chunk = toks[i:i + CHUNK]
            yield i // CHUNK, len(chunk), chunk[0]


def docs_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents fanned out into token chunks via a LATERAL-joined
    Python UDTF. Lateral table functions parallelize per-partition
    (no shuffle: generator output stays on the executor that read the
    row), so this scales linearly like any map-side explode."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("chunk_doc", _ChunkDoc)
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.head
        FROM documents d, LATERAL chunk_doc(d.text) c
    """)


DOCS_CHUNK_UDTF_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE text IS NOT NULL
), fan AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, CAST(ceil(len(toks) / {CHUNK}.0) AS BIGINT))) AS i
  FROM t
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS chunk_idx,
       CAST(least({CHUNK}, len(toks) - (i - 1) * {CHUNK}) AS INT) AS n_tokens,
       toks[(i - 1) * {CHUNK} + 1] AS head
FROM fan
"""
