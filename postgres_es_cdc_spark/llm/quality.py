"""Gopher-style document quality filtering ([EXT]): the rule battery a
pretraining corpus pass applies before dedup — word-count bounds, mean
word length bounds, token-repetition ratio, stopword evidence, symbol
density (Rae et al. 2021, "Scaling Language Models" §A.1.1, public).

Every signal is an integer or an integer-quantized rational (x div y),
so flags are exact on any engine; flags are emitted as 0/1 BIGINT, not
BOOLEAN, to stay inside the driver's value-hash comparison happy path.

Scale: pure per-row expressions over the documents scan — no shuffle at
all except the final nothing (the result is row-per-doc). This is the
shape a 100 TB corpus pass wants: whole-stage-codegen'd scan, column
pruning to (doc_id, text), every rule fused into one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.llm.text import (
    _STOP_SQL, TOKENS_SQL, quality_expr, tokens)

STOPWORDS = ("the", "a", "of", "to", "and", "in")
MIN_WORDS, MAX_WORDS = 10, 100000
MIN_MWL_Q, MAX_MWL_Q = 2000000, 12000000   # mean word len in [2, 12] ×1e6
MIN_UNIQ_Q = 300000                        # ≥30% distinct tokens ×1e6
MAX_SYMBOL_Q = 100000                      # ≤10% non-alnum-space chars ×1e6
MIN_STOPWORDS = 2


def docs_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals + keep decision.

    Columns: n_words, mean_wl_q (mean word length ×1e6), uniq_q
    (distinct/total tokens ×1e6), symbol_q (non-alnum-space chars /
    chars ×1e6), n_stop (distinct stopwords present), ok_* 0/1 flags,
    keep 0/1 (AND of flags). Null/empty docs are dropped (a real pass
    routes them to a reject sink; cf. cdc_dead_letters).
    """
    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0))
    toks = tokens(F.col("text"))
    n_words = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    symbols = F.length(F.regexp_replace(
        F.col("text"), r"[A-Za-z0-9\s]", ""))
    n_stop = F.size(F.array_intersect(
        toks, F.array(*[F.lit(s) for s in STOPWORDS]))).cast("long")

    base = d.select(
        "doc_id",
        n_words.alias("n_words"),
        (F.lit(1000000) * nonspace.cast("long")).alias("_mwl_num"),
        n_uniq.alias("_n_uniq"),
        (F.lit(1000000) * symbols.cast("long")).alias("_sym_num"),
        F.length(F.col("text")).cast("long").alias("_n_chars"),
        n_stop.alias("n_stop"))
    sig = base.select(
        "doc_id", "n_words", "n_stop",
        F.expr("_mwl_num div n_words").alias("mean_wl_q"),
        F.expr("(1000000 * _n_uniq) div n_words").alias("uniq_q"),
        F.expr("_sym_num div _n_chars").alias("symbol_q"))
    flags = sig.select(
        "*",
        F.when((F.col("n_words") >= MIN_WORDS)
               & (F.col("n_words") <= MAX_WORDS), 1).otherwise(0)
         .cast("long").alias("ok_words"),
        F.when((F.col("mean_wl_q") >= MIN_MWL_Q)
               & (F.col("mean_wl_q") <= MAX_MWL_Q), 1).otherwise(0)
         .cast("long").alias("ok_mwl"),
        F.when(F.col("uniq_q") >= MIN_UNIQ_Q, 1).otherwise(0)
         .cast("long").alias("ok_uniq"),
        F.when(F.col("symbol_q") <= MAX_SYMBOL_Q, 1).otherwise(0)
         .cast("long").alias("ok_symbols"),
        F.when(F.col("n_stop") >= MIN_STOPWORDS, 1).otherwise(0)
         .cast("long").alias("ok_stop"))
    return flags.withColumn(
        "keep",
        (F.col("ok_words") * F.col("ok_mwl") * F.col("ok_uniq")
         * F.col("ok_symbols") * F.col("ok_stop")).cast("long"))


_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

DOCS_GOPHER_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({TOKENS_SQL.format(col='text')}) AS n_words,
         1000000 * LENGTH(regexp_replace(text, '\\s', '', 'g')) AS mwl_num,
         len(list_distinct({TOKENS_SQL.format(col='text')})) AS n_uniq,
         1000000 * LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
           AS sym_num,
         LENGTH(text) AS n_chars,
         len(list_intersect({TOKENS_SQL.format(col='text')}, {_STOP_LIST}))
           AS n_stop
  FROM documents
  WHERE text IS NOT NULL AND LENGTH(trim(text)) > 0
), sig AS (
  SELECT doc_id, n_words, n_stop,
         mwl_num // n_words AS mean_wl_q,
         (1000000 * n_uniq) // n_words AS uniq_q,
         sym_num // n_chars AS symbol_q
  FROM base
), flags AS (
  SELECT *,
    CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
         THEN 1 ELSE 0 END AS ok_words,
    CASE WHEN mean_wl_q BETWEEN {MIN_MWL_Q} AND {MAX_MWL_Q}
         THEN 1 ELSE 0 END AS ok_mwl,
    CASE WHEN uniq_q >= {MIN_UNIQ_Q} THEN 1 ELSE 0 END AS ok_uniq,
    CASE WHEN symbol_q <= {MAX_SYMBOL_Q} THEN 1 ELSE 0 END AS ok_symbols,
    CASE WHEN n_stop >= {MIN_STOPWORDS} THEN 1 ELSE 0 END AS ok_stop
  FROM sig
)
SELECT doc_id, n_words, n_stop, mean_wl_q, uniq_q, symbol_q,
       ok_words, ok_mwl, ok_uniq, ok_symbols, ok_stop,
       ok_words * ok_mwl * ok_uniq * ok_symbols * ok_stop AS keep
FROM flags
"""


# --- PII scrubbing ---------------------------------------------------------
# The redaction pass a corpus runs before anything else. The synthetic
# corpus carries no PII, so each doc is deterministically augmented with
# one email + one phone derived from its id; the scrubber must then find
# exactly those. Both regexes stay inside the RE2-compatible subset so
# Spark (Java regex) and DuckDB (RE2) agree.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{4}"


def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII detection + redaction counts over the augmented
    corpus: n_emails / n_phones found, and the scrubbed text's length
    (emails -> [EMAIL], phones -> [PHONE]). Pure per-row regex work in
    one codegen'd scan pass — zero shuffle; at 100 TB this is the same
    single pass with more splits."""
    d = table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]")
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(PHONE_RE)).alias("n_phones"),
        F.length(scrubbed).alias("clean_len"),
        F.substring(scrubbed, -28, 28).alias("scrub_tail"),
    )


_AUG_SQL = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
            "'@example.com call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")
_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_SQL = "\\d{3}-\\d{4}"

DOCS_PII_SCRUB_SQL = f"""
WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents),
s AS (SELECT doc_id, aug,
             regexp_replace(regexp_replace(aug, '{_EMAIL_SQL}', '[EMAIL]', 'g'),
                            '{_PHONE_SQL}', '[PHONE]', 'g') AS scrubbed
      FROM a)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_EMAIL_SQL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_PHONE_SQL}')) AS BIGINT) AS n_phones,
       CAST(len(scrubbed) AS BIGINT) AS clean_len,
       substr(scrubbed, len(scrubbed) - 27, 28) AS scrub_tail
FROM s
"""


# --- character-entropy quality signal --------------------------------------
# The model-free perplexity proxy: character-unigram entropy
# H = ln(n) - (Σ_c cnt_c·ln cnt_c)/n. Repetitive/degenerate text (the
# classic low-quality failure mode) scores low. Logs are libm-free
# (functions/detlog.py), per-row products are quantized to exact int64
# before the order-dependent sum — the BM25 discipline — so the double
# result is bit-identical cross-engine.
ENTROPY_THRESHOLD = "2.6E0"  # nats; ~26 distinct chars of ASCII prose
_H_EXPR = "ln_ab - (CAST(sq AS DOUBLE) / 1.0E6) / CAST(n AS DOUBLE)"


def docs_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy + low-entropy flag.

    Shape: one explode to characters, two partial-agg passes
    ((doc,char) counts, then per-doc combine), ln stages as codegen
    expressions — no UDFs, no shuffle beyond the two aggregations."""
    from postgres_es_cdc_spark.catalog import scan_parallel
    from postgres_es_cdc_spark.functions.detlog import (
        apply_stages_spark, ln_ratio_stages)

    d = scan_parallel(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text"))
    chars = (d.select("doc_id", "text",
                      F.explode(F.sequence(F.lit(1), F.length("text")))
                       .alias("pos"))
              .select("doc_id", F.expr("substring(text, pos, 1)").alias("ch")))
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    with_ln = apply_stages_spark(cnt, ln_ratio_stages("cnt", "1"))
    rowq = with_ln.select(
        "doc_id", "cnt",
        F.expr("CAST(floor(cnt * ln_ab * 1.0E6 + 5.0E-1) AS BIGINT)")
         .alias("q"))
    per = rowq.groupBy("doc_id").agg(F.sum("cnt").alias("n"),
                                     F.sum("q").alias("sq"))
    final = apply_stages_spark(per, ln_ratio_stages("n", "1"))
    return final.select(
        "doc_id", F.col("n").alias("n_chars_counted"),
        F.expr(_H_EXPR).alias("entropy"),
        F.expr(f"CAST({_H_EXPR} < {ENTROPY_THRESHOLD} AS BIGINT)")
         .alias("low_entropy"))


def _build_entropy_sql() -> str:
    from postgres_es_cdc_spark.functions.detlog import (
        ln_ratio_stages, stages_cte_sql)

    cte1, last1 = stages_cte_sql("cnt", ln_ratio_stages("cnt", "1"), "lc")
    cte2, last2 = stages_cte_sql("per", ln_ratio_stages("n", "1"), "ln_n")
    return f"""
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS pos
  FROM documents
), chars AS (
  SELECT doc_id, substring(text, pos, 1) AS ch FROM pos
), cnt AS (
  SELECT doc_id, ch, COUNT(*) AS cnt FROM chars GROUP BY doc_id, ch
), {cte1},
rowq AS (
  SELECT doc_id, cnt,
         CAST(floor(cnt * ln_ab * 1.0E6 + 5.0E-1) AS BIGINT) AS q
  FROM {last1}
), per AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(q) AS BIGINT) AS sq
  FROM rowq GROUP BY doc_id
), {cte2}
SELECT doc_id, n AS n_chars_counted,
       {_H_EXPR} AS entropy,
       CAST({_H_EXPR} < {ENTROPY_THRESHOLD} AS BIGINT) AS low_entropy
FROM {last2}
"""


DOCS_CHAR_ENTROPY_SQL = _build_entropy_sql()


def corpus_governance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus card a training-data platform publishes per
    snapshot: volume (docs/tokens/vocab), provenance breadth
    (langs/sources), quality distribution (exact mean score + share
    above threshold), exact-duplicate exposure, and the Gopher-filter
    keep rate. Composes the existing per-doc batteries into corpus
    aggregates — the numbers that gate a dataset release.

    Exactness: the mean quality is a 1e-9-quantized integer sum (each
    per-doc score is deterministic IEEE, so its quantization is
    identical cross-engine) divided once; every rate is ONE double
    division of exact counts. Scale: three partial-aggregable passes
    (doc stats, vocabulary, md5 groups) + the gopher scan, each a
    map-side-combinable aggregate; the final assembly cross-joins
    five one-row frames.
    """
    from postgres_es_cdc_spark.llm.text import quality_expr

    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    per_doc = d.select(
        quality_expr(F.col("text")).alias("q"),
        F.size(toks).cast("long").alias("nt"),
        "lang", "source")
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.round(F.col("q") * 1_000_000_000, 0).cast("long"))
         .alias("q_sum"),
        F.sum((F.col("q") > 0.5).cast("long")).alias("n_hi_quality"))
    vocab = (d.select(F.explode(toks).alias("tok"))
              .agg(F.countDistinct("tok").alias("vocab_size")))
    dup = (d.groupBy(F.md5("text").alias("h"))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_exact_dup_docs")))
    gopher = docs_gopher_filters(spark, sf_dir).agg(
        F.sum("keep").alias("n_keep"),
        F.count(F.lit(1)).alias("n_scored"))
    return (stats.crossJoin(F.broadcast(vocab))
                 .crossJoin(F.broadcast(dup))
                 .crossJoin(F.broadcast(gopher))
                 .select(
        "n_docs", "n_tokens", "vocab_size", "n_langs", "n_sources",
        (F.col("n_tokens").cast("double")
         / F.col("n_docs").cast("double")).alias("avg_doc_tokens"),
        (F.col("q_sum").cast("double") / F.lit(1.0e9)
         / F.col("n_docs").cast("double")).alias("mean_quality"),
        (F.col("n_hi_quality").cast("double")
         / F.col("n_docs").cast("double")).alias("share_hi_quality"),
        "n_exact_dup_docs",
        (F.col("n_keep").cast("double")
         / F.col("n_scored").cast("double")).alias("gopher_keep_rate")))


_QUALITY_CORE_SQL = (
    "0.4*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks))"
    " + 0.3*LEAST(CAST(len(toks) AS DOUBLE)/100.0, 1.0)"
    " + 0.3*LEAST(CAST(len(list_filter(toks, x -> x IN"
    " ('the', 'a', 'of', 'and', 'to', 'in', 'is')))"
    " AS DOUBLE)/len(toks)*5.0, 1.0)")

CORPUS_GOVERNANCE_SQL = f"""
WITH per_doc AS (
  SELECT {_QUALITY_CORE_SQL} AS q, len(toks) AS nt, lang, source
  FROM (SELECT {TOKENS_SQL.format(col='text')} AS toks, lang, source
        FROM documents)
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(nt) AS BIGINT) AS n_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT source) AS n_sources,
         CAST(SUM(CAST(round(q * 1000000000) AS BIGINT)) AS BIGINT) AS q_sum,
         CAST(SUM(CASE WHEN q > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_quality
  FROM per_doc
),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS vocab_size
  FROM (SELECT unnest({TOKENS_SQL.format(col='text')}) AS tok FROM documents)
),
dup AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_exact_dup_docs
  FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1)
  WHERE n > 1
),
gopher AS (
  SELECT CAST(SUM(keep) AS BIGINT) AS n_keep, COUNT(*) AS n_scored
  FROM ({DOCS_GOPHER_SQL})
)
SELECT s.n_docs, s.n_tokens, v.vocab_size, s.n_langs, s.n_sources,
       CAST(s.n_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS avg_doc_tokens,
       CAST(s.q_sum AS DOUBLE) / 1.0E9 / CAST(s.n_docs AS DOUBLE) AS mean_quality,
       CAST(s.n_hi_quality AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS share_hi_quality,
       d.n_exact_dup_docs,
       CAST(g.n_keep AS DOUBLE) / CAST(g.n_scored AS DOUBLE) AS gopher_keep_rate
FROM stats s, vocab v, dup d, gopher g
"""


def docs_source_quality_report(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Per-SOURCE slice of the governance card — the table a curation
    team actually acts on (which crawl/feed to up-weight, re-filter, or
    drop): docs, token mass, language breadth, exact mean quality, and
    the share above the keep threshold, one row per provenance source.

    Same exactness discipline as corpus_governance_report (1e-9
    quantized quality sums, one double division per rate); one
    partial-aggregable pass grouped by source."""
    from postgres_es_cdc_spark.llm.text import quality_expr

    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    per_doc = d.select(
        "source", "lang",
        quality_expr(F.col("text")).alias("q"),
        F.size(toks).cast("long").alias("nt"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nt").alias("n_tokens"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum(F.round(F.col("q") * 1_000_000_000, 0).cast("long"))
                  .alias("q_sum"),
                 F.sum((F.col("q") > 0.5).cast("long")).alias("n_hi"))
            .select("source", "n_docs", "n_tokens", "n_langs",
                    (F.col("q_sum").cast("double") / F.lit(1.0e9)
                     / F.col("n_docs").cast("double")).alias("mean_quality"),
                    (F.col("n_hi").cast("double")
                     / F.col("n_docs").cast("double"))
                    .alias("share_hi_quality")))


DOCS_SOURCE_QUALITY_SQL = f"""
WITH per_doc AS (
  SELECT source, lang, {_QUALITY_CORE_SQL} AS q, len(toks) AS nt
  FROM (SELECT source, lang, {TOKENS_SQL.format(col='text')} AS toks
        FROM documents)
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(CAST(round(q * 1000000000) AS BIGINT)) AS DOUBLE) / 1.0E9
         / COUNT(*) AS mean_quality,
       CAST(SUM(CASE WHEN q > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS share_hi_quality
FROM per_doc
GROUP BY source
"""


FUNNEL_MIN_QUALITY = 0.5
FUNNEL_MAX_DUP_FRACTION = 0.2
FUNNEL_MIN_TOKENS = 20
FUNNEL_MAX_TOKENS = 1000


def docs_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report: how many documents (and tokens) survive
    each successive filter stage — the attrition table every pretraining
    data card publishes (raw -> quality -> repetition -> length). Each
    stage's predicate CONJOINS with the previous, so the counts are
    monotone non-increasing; a stage that suddenly drops 90% flags a
    miscalibrated threshold before any expensive dedup runs.

    Stages: 0 raw corpus; 1 quality score >= 0.5 (docs_quality_score's
    expression); 2 AND duplicate-bigram fraction <= 0.2 (the Gopher
    repetition rule of docs_repetition_report); 3 AND token count in
    [20, 1000].

    Scale shape: ONE scan computes all stage predicates per row (pure
    codegen expressions — the bigram stats via a higher-order array
    fold, no explode), then a single partial-aggregable conditional-sum
    pass emits the 4-row funnel. No joins, no windows."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    t2 = F.slice(toks, 2, F.greatest(n - 1, F.lit(0)))
    bg = F.slice(F.zip_with(toks, t2,
                            lambda x, y: F.concat(x, F.lit(" "), y)),
                 1, F.greatest(n - 1, F.lit(0)))
    # MATERIALIZE the bigram array in a child projection before the
    # nested lambda reads it: an outer EXPRESSION inside a higher-order
    # lambda is re-evaluated per element (shingles3's performance
    # contract), which made the first cut O(m²) zip/slice CONSTRUCTIONS
    # per doc (5.4s at sf0.1); an outer attribute reference is free.
    base = d.select(n.alias("n_tokens"), bg.alias("bg"),
                    quality_expr(F.col("text")).alias("q"))
    # duplicate-bigram occurrence fraction without explode: occurrences
    # whose bigram appears >= 2 times in the doc, via a per-element
    # count filter — O(m²) comparisons per doc on the in-memory array,
    # fine for document-sized m.
    dup_occ = F.size(F.filter(
        F.col("bg"),
        lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)) >= 2))
    s1 = F.col("q") >= F.lit(FUNNEL_MIN_QUALITY)
    s2 = s1 & (dup_occ.cast("double") / F.size(F.col("bg"))
               <= F.lit(FUNNEL_MAX_DUP_FRACTION))
    s3 = (s2 & (F.col("n_tokens") >= FUNNEL_MIN_TOKENS)
          & (F.col("n_tokens") <= FUNNEL_MAX_TOKENS))
    flagged = base.select("n_tokens", s1.alias("s1"),
                          s2.alias("s2"), s3.alias("s3"))
    longsum = lambda c: F.sum(F.when(c, F.col("n_tokens"))  # noqa: E731
                               .otherwise(F.lit(0))).cast("long")
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("n_tokens").cast("long").alias("t0"),
        F.sum(F.col("s1").cast("long")).alias("n1"), longsum(F.col("s1")).alias("t1"),
        F.sum(F.col("s2").cast("long")).alias("n2"), longsum(F.col("s2")).alias("t2"),
        F.sum(F.col("s3").cast("long")).alias("n3"), longsum(F.col("s3")).alias("t3"))
    stages = F.array(*[
        F.struct(F.lit(i).alias("stage"), F.lit(lbl).alias("filter_name"),
                 F.col(f"n{i}").alias("n_docs"),
                 F.col(f"t{i}").alias("n_tokens"))
        for i, lbl in enumerate(
            ["raw", "quality>=0.5", "+dup_bigrams<=0.2",
             "+len_20_1000"])
    ])
    return (agg.select(F.explode(stages).alias("s"))
               .select("s.stage", "s.filter_name", "s.n_docs",
                       "s.n_tokens"))


DOCS_FUNNEL_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM documents
),
m AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bg,
         0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
       + 0.3 * LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       + 0.3 * LEAST(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                          AS DOUBLE) / len(toks) * 5.0, 1.0) AS q
  FROM t
),
f AS (
  SELECT n_tokens,
         q >= {FUNNEL_MIN_QUALITY} AS s1,
         q >= {FUNNEL_MIN_QUALITY}
           AND CAST(len(list_filter(bg,
                 x -> len(list_filter(bg, y -> y = x)) >= 2)) AS DOUBLE)
               / len(bg) <= {FUNNEL_MAX_DUP_FRACTION} AS s2
  FROM m
),
f2 AS (
  SELECT n_tokens, s1, s2,
         s2 AND n_tokens >= {FUNNEL_MIN_TOKENS}
            AND n_tokens <= {FUNNEL_MAX_TOKENS} AS s3
  FROM f
),
agg AS (
  SELECT COUNT(*) AS n0, CAST(SUM(n_tokens) AS BIGINT) AS t0,
         CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s1 THEN n_tokens ELSE 0 END) AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN s2 THEN n_tokens ELSE 0 END) AS BIGINT) AS t2,
         CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(SUM(CASE WHEN s3 THEN n_tokens ELSE 0 END) AS BIGINT) AS t3
  FROM f2
)
SELECT 0 AS stage, 'raw' AS filter_name, n0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL
SELECT 1, 'quality>=0.5', n1, t1 FROM agg
UNION ALL
SELECT 2, '+dup_bigrams<=0.2', n2, t2 FROM agg
UNION ALL
SELECT 3, '+len_20_1000', n3, t3 FROM agg
"""
