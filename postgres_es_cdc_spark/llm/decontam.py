"""Benchmark decontamination ([EXT]): remove training documents that
overlap an evaluation set — the n-gram-overlap pass every serious
pretraining pipeline runs (e.g. GPT-3 appendix C / Gopher §A.2 style,
public method: a doc is contaminated if it shares any long n-gram with
a benchmark document).

Shape at 100 TB: benchmark n-grams are a SMALL distinct set (eval
suites are thousands of docs, not billions) — build it once, then a
semi-join-style containment check against each training doc's n-grams.
Here the check is an inner equi-join on the 32-bit gram hash followed
by a per-doc count: gram hashes are computed array-native per row (no
shuffle), the join key is 8 bytes, and the benchmark side broadcasts.

Fixture: benchmark = documents with doc_id % 97 == 0; training corpus =
the mutated near-dup corpus' mutants (dedup.mutated_corpus ids >= 1e6),
so every mutant of a benchmark doc is a guaranteed true positive and
word-salad chance collisions are deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import scan_parallel, table
from postgres_es_cdc_spark.llm.dedup import _MUTATED_SQL, mutated_corpus
from postgres_es_cdc_spark.llm.text import TOKENS_SQL, h32, tokens

GRAM_N = 5
BENCH_MOD = 97  # doc_id % 97 == 0 -> benchmark member


def gram5_hashes_from_tokens(toks: Column) -> Column:
    """Distinct hashed word 5-grams over an already-tokenized array,
    zip-based (same performance contract as text.shingles3: no outer
    column inside a lambda, shifted copies built once; tail positions
    concat to null and slice away)."""
    n = F.size(toks)
    shifted = [
        F.slice(toks, k + 1, F.greatest(n - k, F.lit(0)))
        for k in range(1, GRAM_N)
    ]
    joined = toks
    for sh in shifted:
        joined = F.zip_with(joined, sh,
                            lambda acc, nxt: F.concat(acc, F.lit(" "), nxt))
    grams = F.slice(joined, 1, F.greatest(n - (GRAM_N - 1), F.lit(0)))
    return F.array_distinct(F.transform(grams, h32))


def gram5_hashes(text_col: Column) -> Column:
    """gram5_hashes_from_tokens over tokens(text)."""
    return gram5_hashes_from_tokens(tokens(text_col))


# DuckDB twin: slide a window over the token list.
GRAM5_SQL = """
list_distinct(list_transform(
    generate_series(1, greatest(len({toks}) - 4, 0)),
    i -> ('0x' || substr(md5(array_to_string(list_slice({toks}, i, i + 4), ' ')), 1, 8))::BIGINT
))
"""


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated training docs: mutants sharing >= 1 distinct 5-gram
    with any benchmark doc. Output (doc_id, n_shared_grams) per
    contaminated doc — the removal list a corpus pass anti-joins on."""
    # Mutant grams straight from the token array (r14, guide §1.2):
    # mutated_corpus renders each mutant's text as
    # array_join(slice(tokens(text), 1, n-1), " ") and gram5_hashes
    # would re-trim + re-split it — but tokens() is split-on-\s+ of a
    # trimmed string, so re-tokenizing a " "-joined token list yields
    # exactly that list (tokens carry no whitespace; the empty-mutant
    # edge produces [""] whose gram windows are empty either way, same
    # as []). Building grams from slice(tokens(text), ...) drops one
    # full join+trim+split pass per mutant; gram output is identical,
    # and the oracle SQL is unchanged (it re-derives from mutant text).
    d = scan_parallel(spark, table(spark, sf_dir, "documents")
                      .select("doc_id", "text"))
    toks = tokens(F.col("text"))
    mut_toks = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    corpus_grams = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.explode(gram5_hashes_from_tokens(mut_toks)).alias("g"))
    bench = (table(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % BENCH_MOD == 0)
             .select(F.explode(gram5_hashes(F.col("text"))).alias("g"))
             .distinct())
    return (corpus_grams.join(F.broadcast(bench), "g")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared_grams")))


_G5_DOC = GRAM5_SQL.format(toks=TOKENS_SQL.format(col="text"))

DOCS_DECONTAMINATE_SQL = f"""
WITH bench AS (
  SELECT DISTINCT g
  FROM documents, UNNEST({_G5_DOC}) AS t(g)
  WHERE doc_id % {BENCH_MOD} = 0
), corpus AS (
  SELECT doc_id, g
  FROM (SELECT doc_id, text FROM ({_MUTATED_SQL}) WHERE doc_id >= 1000000),
       UNNEST({_G5_DOC}) AS t(g)
)
SELECT c.doc_id, COUNT(*) AS n_shared_grams
FROM corpus c JOIN bench b USING (g)
GROUP BY c.doc_id
"""


def docs_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark leakage report — the inverse view of
    docs_decontaminate: per BENCHMARK document, how much of it already
    appears in the training corpus (fraction of its distinct 5-grams
    found anywhere in the mutant corpus). Eval teams read this before
    trusting a benchmark score; 1.0 means the item is fully memorizable
    from training data.

    Scale shape: the corpus side never shuffles its grams — it joins
    the BROADCAST distinct benchmark-gram set and only matched hashes
    (bounded by the benchmark size) come back; per-benchmark-doc
    coverage is then a small join of bench grams vs the found set."""
    bench_grams = (table(spark, sf_dir, "documents")
                   .filter(F.col("doc_id") % BENCH_MOD == 0)
                   .select("doc_id",
                           F.explode(gram5_hashes(F.col("text")))
                            .alias("g")))
    bench_set = bench_grams.select("g").distinct()
    corpus = scan_parallel(spark, mutated_corpus(spark, sf_dir)
                           .filter(F.col("doc_id") >= 1000000))
    found = (corpus.select(F.explode(gram5_hashes(F.col("text")))
                            .alias("g"))
                   .join(F.broadcast(bench_set), "g")
                   .distinct()
                   .withColumn("_hit", F.lit(1)))
    return (bench_grams.join(found, "g", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.coalesce("_hit", F.lit(0))).alias("n_covered"))
            .select("doc_id", "n_grams", "n_covered",
                    (F.col("n_covered").cast("double")
                     / F.col("n_grams").cast("double")).alias("coverage")))


DOCS_NGRAM_COVERAGE_SQL = f"""
WITH bench_grams AS (
  SELECT doc_id, g
  FROM documents, UNNEST({_G5_DOC}) AS t(g)
  WHERE doc_id % {BENCH_MOD} = 0
),
found AS (
  SELECT DISTINCT c.g
  FROM (SELECT doc_id, text FROM ({_MUTATED_SQL}) WHERE doc_id >= 1000000) m,
       UNNEST({GRAM5_SQL.format(toks=TOKENS_SQL.format(col='m.text'))}) AS c(g)
  WHERE c.g IN (SELECT g FROM bench_grams)
)
SELECT b.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(SUM(CASE WHEN f.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM bench_grams b LEFT JOIN found f ON b.g = f.g
GROUP BY b.doc_id
"""
