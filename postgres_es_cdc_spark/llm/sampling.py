"""Deterministic corpus sampling ([EXT]): the subset-selection layer of a
training-data pipeline.

Random sampling (``df.sample``) is engine- and partitioning-dependent, so
it can't be oracle-checked and — worse for production — isn't reproducible
across reruns of a changed cluster. Everything here samples by
*multiplicative integer hashing of the stable key* instead: the same rows
are chosen on any engine, any partitioning, any scale, and membership is
a pure per-row predicate (no shuffle, fully pushdown-friendly — at 100 TB
a 5 % sample reads all row groups but materializes only matching rows;
with the key as a sort/cluster column it prunes pages too).

The reference has no sampling surface (SURVEY.md §2 — 581 LoC of CDC
plumbing); this module is mandated by the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.llm.text import (
    STOPWORDS, TOKENS_SQL, quality_expr, tokens)

# Knuth's multiplicative constant; mod 2^32 keeps the product in int64
# for any realistic key (< 3.4e9) and is portable integer arithmetic in
# every SQL engine — unlike built-in hash() functions, which differ.
_KNUTH = 2654435761
_MOD = 4294967296


def key_hash(key: Column) -> Column:
    """Deterministic 32-bit mix of an integer key (engine-portable)."""
    return (key * F.lit(_KNUTH)) % F.lit(_MOD)


KEY_HASH_SQL = "(({key}) * 2654435761) % 4294967296"


def docs_hash_sample(spark: SparkSession, sf_dir: str,
                     percent: int = 5) -> DataFrame:
    """Deterministic ~percent% sample of the corpus by key hash — a pure
    scan-side predicate, no shuffle, reproducible at any scale."""
    d = table(spark, sf_dir, "documents")
    return (d.filter(key_hash(F.col("doc_id")) % 100 < percent)
             .select("doc_id", "lang", "n_chars"))


DOCS_HASH_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {KEY_HASH_SQL.format(key='doc_id')} % 100 < 5
"""


def docs_stratified_sample(spark: SparkSession, sf_dir: str,
                           n_per_stratum: int = 20) -> DataFrame:
    """Fixed-size per-language sample: hash-ordered row_number <= n.
    One shuffle on the stratum key; Spark's WindowGroupLimit pushes the
    rank filter down so no stratum ever materializes fully."""
    d = table(spark, sf_dir, "documents")
    w = (Window.partitionBy("lang")
               .orderBy(key_hash(F.col("doc_id")).asc(),
                        F.col("doc_id").asc()))
    return (d.withColumn("pick", F.row_number().over(w).cast("long"))
             .filter(F.col("pick") <= n_per_stratum)
             .select("doc_id", "lang", "pick"))


DOCS_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, pick
FROM (SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {KEY_HASH_SQL.format(key='doc_id')} ASC,
                        doc_id ASC) AS pick
      FROM documents)
WHERE pick <= 20
"""


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str,
                         min_quality: float = 0.45,
                         percent: int = 20) -> DataFrame:
    """End-to-end training-corpus prep: quality filter -> exact dedup
    (canonical = min doc_id per content hash) -> deterministic 20 %
    sample. The composite the individual operators exist for; stage
    order matters at scale — the cheap scan-side predicates (quality,
    later the sample) run before the one shuffle (dedup), and the
    sample re-filter runs on dedup output, so the shuffle only carries
    quality-surviving rows.
    """
    d = table(spark, sf_dir, "documents")
    kept = d.filter(quality_expr(F.col("text")) >= min_quality)
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    canonical = (kept.withColumn("copy_rank", F.row_number().over(w))
                     .filter(F.col("copy_rank") == 1))
    return (canonical
            .filter(key_hash(F.col("doc_id")) % 100 < percent)
            .select("doc_id", "lang", "n_chars"))


_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
_TOKS = TOKENS_SQL.format(col="text")

CORPUS_PREP_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, text, {_TOKS} AS toks FROM documents
), q AS (
  SELECT doc_id, lang, n_chars, text,
         0.4*(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks))
       + 0.3*LEAST(CAST(len(toks) AS DOUBLE)/100.0, 1.0)
       + 0.3*LEAST(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                        AS DOUBLE)/len(toks)*5.0, 1.0) AS quality
  FROM t
), kept AS (
  SELECT doc_id, lang, n_chars, text FROM q WHERE quality >= 0.45
), canonical AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY md5(text)
                            ORDER BY doc_id ASC) AS copy_rank
  FROM kept
)
SELECT doc_id, lang, n_chars
FROM canonical
WHERE copy_rank = 1 AND {KEY_HASH_SQL.format(key='doc_id')} % 100 < 20
"""


CONTEXT_CAP = 2048  # tokens per packed context window


def docs_context_pack(spark: SparkSession, sf_dir: str,
                      cap: int = CONTEXT_CAP) -> DataFrame:
    """Context-window packing: concatenate each source's documents in
    stable doc_id order and split the token stream at exact multiples
    of ``cap`` — every document is assigned to the window in which it
    STARTS (fixed-boundary packing, the deterministic cousin of greedy
    first-fit; tokenization = the whitespace split shared with
    docs_chunk_udtf). Output is one row per (source, window).

    Scale shape: one window shuffle partitioned by source (the shard
    key — at 100 TB you'd pack within shard files, embarrassingly
    parallel), then a partial-aggregable groupBy on the SAME keys, so
    Catalyst reuses the partitioning: a single Exchange end to end.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = d.select("doc_id", "source",
                 F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("cum", F.sum("n_tokens").over(w))
    d = d.withColumn(
        "window_id",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(cap)).cast("long"))
    return (d.groupBy("source", "window_id")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_tokens").alias("window_tokens"),
                  F.min("doc_id").alias("first_doc"),
                  F.max("doc_id").alias("last_doc")))


DOCS_CONTEXT_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM t
)
SELECT source,
       CAST(floor((cum - n_tokens) / {CONTEXT_CAP}.0) AS BIGINT) AS window_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS window_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY source, window_id
"""


def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by key hash — the
    split every training pipeline needs to be reproducible and
    join-free: membership is a pure function of the key, so any worker
    (or a later backfill) computes the same split without a lookup
    table. One scan, one tiny groupBy; no shuffle touches the payload.

    Output: per (split, lang) doc count and exact total chars."""
    d = table(spark, sf_dir, "documents")
    bucket = key_hash(F.col("doc_id")) % 100
    split = (F.when(bucket < 90, "train")
              .when(bucket < 95, "val")
              .otherwise("test"))
    return (d.select(split.alias("split"), "lang", "n_chars")
             .groupBy("split", "lang")
             .agg(F.count("*").alias("n_docs"),
                  F.sum("n_chars").alias("total_chars")))


DOCS_SPLIT_ASSIGN_SQL = f"""
SELECT CASE WHEN {KEY_HASH_SQL.format(key='doc_id')} % 100 < 90 THEN 'train'
            WHEN {KEY_HASH_SQL.format(key='doc_id')} % 100 < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


def docs_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weights per source domain: token-mass-aware
    sampling weights with a sqrt temperature (alpha = 0.5), the standard
    recipe for re-balancing a multi-source corpus so small domains are
    upsampled without letting giant crawls dominate (weight ~
    tokens^alpha / sum(tokens^alpha)).

    Exactness: token counts are exact integers; sqrt is a correctly
    rounded IEEE op, so round(sqrt(n)*1e6) is identical in both engines;
    the weight is ONE double division of exact int64 quanta. The
    oversample factor (weight relative to natural token share) is two
    exact ratios divided once.

    Scale: one partial-aggregable pass over the corpus (source ->
    token sum), then windows on the |sources|-row aggregate. At 100 TB
    this is the report that decides epochs-per-domain for a run.
    """
    d = table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    agg = (d.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(n_toks.cast("long")).alias("n_tokens")))
    wq = F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000, 0) \
          .cast("long")
    wall = Window.partitionBy()
    t = agg.withColumn("w_q", wq)
    return t.select(
        "source", "n_docs", "n_tokens",
        (F.col("w_q").cast("double")
         / F.sum("w_q").over(wall).cast("double")).alias("mix_weight"),
        ((F.col("w_q").cast("double")
          / F.sum("w_q").over(wall).cast("double"))
         / (F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(wall).cast("double")))
        .alias("oversample_factor"))


DOCS_DOMAIN_MIXTURE_SQL = f"""
WITH agg AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len({TOKENS_SQL.format(col='text')})) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
),
t AS (
  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_q
  FROM agg
)
SELECT source, n_docs, n_tokens,
       CAST(w_q AS DOUBLE) / CAST(SUM(w_q) OVER () AS DOUBLE) AS mix_weight,
       (CAST(w_q AS DOUBLE) / CAST(SUM(w_q) OVER () AS DOUBLE))
         / (CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE))
         AS oversample_factor
FROM t
"""


WEIGHTED_SAMPLE_K = 25


def docs_weighted_sample(spark: SparkSession, sf_dir: str,
                         k: int = WEIGHTED_SAMPLE_K) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each doc gets key = -ln(u) / w with u a
    deterministic per-doc uniform (key-hash / 2^32) and w its weight
    (here n_chars: longer docs proportionally likelier); the k smallest
    keys are the sample. The standard one-pass distributed weighted
    sampler — no collect, no sequential reservoir.

    Exactness: -ln(u) = ln(2^32 / h) is detlog's a>=b integer-ratio
    form, bit-identical across engines; the division by w and the
    ranking are deterministic IEEE ops. Scale: the key is computed
    scan-side; TakeOrdered(k) needs no global sort.
    """
    from postgres_es_cdc_spark.functions.detlog import (
        apply_stages_spark, ln_ratio_stages)

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        (key_hash(F.col("doc_id")) + 1).alias("h"))  # 1..2^32, never 0
    staged = apply_stages_spark(
        d.withColumn("two32", F.lit(_MOD)),
        ln_ratio_stages("two32", "h", out="neg_ln_u"))
    keyed = staged.select(
        "doc_id", "n_chars",
        (F.col("neg_ln_u") / F.col("n_chars").cast("double"))
        .alias("sample_key"))
    # limit-after-sort plans as TakeOrderedAndProject (per-partition
    # top-k + merge); the rank window then touches only k rows. A
    # global row_number window instead would single-partition-sort the
    # whole corpus.
    top = keyed.orderBy(F.asc("sample_key"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.asc("sample_key"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def _weighted_sample_sql(k: int = WEIGHTED_SAMPLE_K) -> str:
    from postgres_es_cdc_spark.functions.detlog import (
        ln_ratio_stages, stages_cte_sql)

    ctes, last = stages_cte_sql(
        "d", ln_ratio_stages("two32", "h", out="neg_ln_u"), "wsc")
    return f"""
WITH d AS (
  SELECT doc_id, n_chars,
         ({KEY_HASH_SQL.format(key='doc_id')}) + 1 AS h,
         CAST({_MOD} AS BIGINT) AS two32
  FROM documents
),
{ctes},
keyed AS (
  SELECT doc_id, n_chars,
         neg_ln_u / CAST(n_chars AS DOUBLE) AS sample_key
  FROM {last}
)
SELECT doc_id, n_chars, sample_key, rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY sample_key ASC, doc_id ASC) AS rank
      FROM keyed)
WHERE rank <= {k}
"""


DOCS_WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def docs_dsir_weights(spark: SparkSession, sf_dir: str,
                      buckets: int = DSIR_BUCKETS,
                      target_lang: str = DSIR_TARGET_LANG) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling): score every document by how much more likely its
    hashed-unigram bag is under the TARGET distribution (here: the
    lang='en' slice) than under the raw corpus — the published recipe
    for tilting a web crawl toward a quality/domain target before
    resampling. log_weight(doc) = Σ_tokens [ ln p_tgt(bucket) −
    ln p_raw(bucket) ] with add-one smoothing over hashed buckets.

    Exactness: each feature's log-ratio is sign · ln(max/min) of two
    exact integer products, computed via functions/detlog.py (the
    bit-identical IEEE primitive both engines share) and quantized to
    1e-9 ints, so the per-doc sum is order-independent int64.

    Scale shape: two word-count MapReduces over hashed buckets (raw +
    target), folded to a ≤``buckets``-row feature table that BROADCASTS
    to the per-token scoring join — one linear scan of token
    occurrences, no vocabulary-sized shuffle. Token hashing reuses
    text.h32 (md5-derived, portable)."""
    from postgres_es_cdc_spark.functions.detlog import (
        apply_stages_spark, ln_ratio_stages)
    from postgres_es_cdc_spark.llm.text import h32, tokens

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = d.select("doc_id", "lang",
                   F.explode(tokens(F.col("text"))).alias("term"))
    tok = tok.select("doc_id", "lang",
                     (h32(F.col("term")) % buckets).alias("bucket"))
    raw = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (tok.filter(F.col("lang") == target_lang)
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct")))
    totals = tok.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum((F.col("lang") == target_lang).cast("long")).alias("nt"))
    feat = (raw.join(tgt, "bucket", "left")
               .select("bucket", "cr",
                       F.coalesce("ct", F.lit(0)).alias("ct"))
               .crossJoin(F.broadcast(totals))
               .select("bucket",
                       ((F.col("ct") + 1) * (F.col("nr") + buckets))
                       .alias("va"),
                       ((F.col("cr") + 1) * (F.col("nt") + buckets))
                       .alias("vb")))
    feat = feat.select(
        "bucket",
        F.greatest("va", "vb").alias("dsir_a"),
        F.least("va", "vb").alias("dsir_b"),
        F.when(F.col("va") >= F.col("vb"), F.lit(1)).otherwise(F.lit(-1))
         .alias("sgn"))
    feat = apply_stages_spark(feat, ln_ratio_stages("dsir_a", "dsir_b"))
    feat = feat.select(
        "bucket",
        (F.col("sgn")
         * F.expr("CAST(floor(ln_ab * 1.0E9 + 5.0E-1) AS BIGINT)"))
        .alias("w_q"))
    return (tok.join(F.broadcast(feat), "bucket")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    (F.sum("w_q").cast("double") / F.lit(1.0e9))
                    .alias("log_weight")))


def _dsir_sql() -> str:
    from postgres_es_cdc_spark.functions.detlog import (
        ln_ratio_stages, stages_cte_sql)
    ctes, last = stages_cte_sql("feat2", ln_ratio_stages("dsir_a", "dsir_b"),
                                "lnc")
    b = DSIR_BUCKETS
    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(term), 1, 8))::BIGINT % {b} AS bucket
  FROM (SELECT doc_id, lang,
               unnest({TOKENS_SQL.format(col='text')}) AS term
        FROM documents)
),
raw AS (SELECT bucket, COUNT(*) AS cr FROM tok GROUP BY 1),
tgt AS (SELECT bucket, COUNT(*) AS ct FROM tok
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1),
totals AS (
  SELECT COUNT(*) AS nr,
         CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS nt
  FROM tok
),
feat AS (
  SELECT raw.bucket,
         (COALESCE(tgt.ct, 0) + 1) * (totals.nr + {b}) AS va,
         (raw.cr + 1) * (totals.nt + {b}) AS vb
  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN totals
),
feat2 AS (
  SELECT bucket, GREATEST(va, vb) AS dsir_a, LEAST(va, vb) AS dsir_b,
         CASE WHEN va >= vb THEN 1 ELSE -1 END AS sgn
  FROM feat
),
{ctes},
w AS (
  SELECT bucket,
         sgn * CAST(floor(ln_ab * 1.0E9 + 5.0E-1) AS BIGINT) AS w_q
  FROM {last}
)
SELECT tok.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(w.w_q) AS DOUBLE) / 1.0E9 AS log_weight
FROM tok JOIN w ON tok.bucket = w.bucket
GROUP BY tok.doc_id
"""


DOCS_DSIR_SQL = _dsir_sql()


# Training-export defaults: shard count for the final write, and a
# second multiplicative constant (xxhash32's prime-2, coprime to 2^32
# and independent of _KNUTH) so shard MEMBERSHIP and within-shard ORDER
# are decorrelated hashes of the same key.
N_TRAIN_SHARDS = 8
_SHUF = 2246822519


def docs_training_shards(spark: SparkSession, sf_dir: str,
                         n_shards: int = N_TRAIN_SHARDS) -> DataFrame:
    """The training-export pass: assign every document to one of
    n_shards shards by key hash and give each shard a deterministic
    PSEUDO-SHUFFLED reading order (ordered by an independent second
    hash) — what a 100 TB corpus goes through right before being
    written out for the trainer (global shuffle is what makes SGD see
    i.i.d.-ish batches; doing it with hashes makes it reproducible and
    engine-portable, unlike df.sample/rand()).

    The returned summary pins the FULL permutation, not just
    membership: order_checksum = Σ position·doc_id over the shard's
    shuffle order — any transposition of two docs changes it. Bound:
    position and doc_id are each ≤ |corpus|, so each term ≤ N² and the
    sum ≤ N³ — exact int64 through N ≈ 2M docs; beyond that, checksum
    per sub-shard.

    Scale shape: one hash-partition shuffle on the shard key + one
    window per shard (Spark writes this as repartition(shard) +
    sortWithinPartitions at export time — the same plan, streaming to
    parquet writers instead of an aggregate)."""
    d = table(spark, sf_dir, "documents")
    h1 = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    h2 = (F.col("doc_id") * F.lit(_SHUF)) % F.lit(_MOD)
    s = d.select(
        "doc_id",
        (h1 % F.lit(n_shards)).cast("long").alias("shard"),
        h2.alias("h2"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))
    w = Window.partitionBy("shard").orderBy(F.asc("h2"), F.asc("doc_id"))
    p = (s.withColumn("pos", F.row_number().over(w).cast("long"))
          .withColumn("n", F.count(F.lit(1)).over(
              Window.partitionBy("shard"))))
    return (p.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id")))
         .alias("first_doc_id"),
        F.min(F.when(F.col("pos") == F.col("n"), F.col("doc_id")))
         .alias("last_doc_id"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum")))


DOCS_TRAINING_SHARDS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         CAST(((doc_id * {_KNUTH}) % {_MOD}) % {N_TRAIN_SHARDS} AS BIGINT)
           AS shard,
         (doc_id * {_SHUF}) % {_MOD} AS h2,
         CAST(len({TOKENS_SQL.format(col='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                 ORDER BY h2 ASC, doc_id ASC) AS BIGINT)
           AS pos,
         COUNT(*) OVER (PARTITION BY shard) AS n
  FROM s
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(CASE WHEN pos = 1 THEN doc_id END) AS first_doc_id,
       MIN(CASE WHEN pos = n THEN doc_id END) AS last_doc_id,
       CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
FROM p GROUP BY shard
"""


# Greedy first-fit context packing: the cap is deliberately small
# relative to driver doc lengths (~60-120 whitespace tokens) so bins
# hold a handful of docs and every boundary case (exact fit, overflow,
# first-doc-oversize) is exercised at test scale.
PACK_CAP = 256


def _pack_kernel(cap: int):
    """Per-shard greedy packer (runs inside applyInPandas): docs in the
    shard's pseudo-shuffled reading order accumulate into the current
    context window while they fit; a doc that would overflow opens the
    next window (never split, never truncated). Pure integer recurrence
    on (order, n_tokens) — document TEXT never crosses the Python
    boundary."""
    import numpy as np

    def pack(pdf):
        pdf = (pdf.sort_values(["h2", "doc_id"], kind="mergesort")
                  .reset_index(drop=True))
        n = len(pdf)
        bins = np.zeros(n, dtype="int64")
        offs = np.zeros(n, dtype="int64")
        bin_id, used = 0, 0
        for i, tok in enumerate(pdf["n_tokens"].to_numpy()):
            tok = int(tok)
            if i == 0:
                used = tok
            elif used + tok <= cap:
                offs[i] = used
                used += tok
            else:
                bin_id += 1
                used = tok
            bins[i] = bin_id
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["pos"] = np.arange(1, n + 1, dtype="int64")
        out["bin_id"] = bins
        out["bin_offset"] = offs
        return out[["doc_id", "shard", "pos", "bin_id", "bin_offset",
                    "n_tokens"]]

    return pack


def docs_sequence_packing(spark: SparkSession, sf_dir: str,
                          cap: int = PACK_CAP,
                          n_shards: int = N_TRAIN_SHARDS) -> DataFrame:
    """Training sequence packing — greedy first-fit binning of documents
    into fixed token-budget context windows, per shard, in the SAME
    pseudo-shuffled reading order docs_training_shards pins (shard =
    KNUTH hash, order = independent SHUF hash): the pass that turns a
    shuffled corpus into trainer-ready windows without truncation. The
    fixed-boundary cousin (docs_context_pack) IS a window cumsum; the
    greedy rule is an order-sensitive recurrence (each placement depends
    on the previous bin's fill), which no window function expresses —
    this is the repo's canonical applyInPandas recurrence, mirrored by a
    recursive-CTE oracle.

    Scale shape: one hash-partition shuffle on shard, then each shard
    packs independently inside one Arrow batch stream — embarrassingly
    parallel at the grain you already chose for export files; n_shards
    is the scale knob (100 TB => thousands of shards, each bounded).
    Only (doc_id, hashes, token counts) cross the Python boundary —
    never text. Within-shard order is total (h2 ties broken by doc_id),
    so output is deterministic on any engine/partitioning."""
    d = table(spark, sf_dir, "documents")
    h1 = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    h2 = (F.col("doc_id") * F.lit(_SHUF)) % F.lit(_MOD)
    s = d.select(
        "doc_id",
        (h1 % F.lit(n_shards)).cast("long").alias("shard"),
        h2.alias("h2"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))
    return s.groupBy("shard").applyInPandas(
        _pack_kernel(cap),
        "doc_id long, shard long, pos long, bin_id long, "
        "bin_offset long, n_tokens long")


_PACKED_CTE_SQL = f"""
s AS (
  SELECT doc_id,
         CAST(((doc_id * {_KNUTH}) % {_MOD}) % {N_TRAIN_SHARDS} AS BIGINT)
           AS shard,
         (doc_id * {_SHUF}) % {_MOD} AS h2,
         CAST(len({TOKENS_SQL.format(col='text')}) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, shard, n_tokens,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                 ORDER BY h2 ASC, doc_id ASC) AS BIGINT)
           AS pos
  FROM s
),
packed AS (
  SELECT doc_id, shard, n_tokens, pos,
         CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_offset
  FROM o WHERE pos = 1
  UNION ALL
  SELECT o.doc_id, o.shard, o.n_tokens, o.pos,
         CASE WHEN p.bin_offset + p.n_tokens + o.n_tokens <= {PACK_CAP}
              THEN p.bin_id ELSE p.bin_id + 1 END,
         CASE WHEN p.bin_offset + p.n_tokens + o.n_tokens <= {PACK_CAP}
              THEN p.bin_offset + p.n_tokens ELSE CAST(0 AS BIGINT) END
  FROM packed p JOIN o ON o.shard = p.shard AND o.pos = p.pos + 1
)
"""

DOCS_SEQUENCE_PACKING_SQL = f"""
WITH RECURSIVE {_PACKED_CTE_SQL}
SELECT doc_id, shard, pos, bin_id, bin_offset, n_tokens FROM packed
"""


def docs_packing_efficiency(spark: SparkSession, sf_dir: str,
                            cap: int = PACK_CAP,
                            n_shards: int = N_TRAIN_SHARDS) -> DataFrame:
    """Per-shard packing report — the number a pipeline owner actually
    reads before a training run: window count, token mass, the fill
    rate against the cap, and how many docs exceeded the cap outright
    (each such doc still gets its own window; at production caps this
    column is the truncation-policy alarm). Derived from the same
    greedy kernel, so the report and the per-doc assignment can never
    disagree."""
    p = docs_sequence_packing(spark, sf_dir, cap, n_shards)
    per_bin = (p.groupBy("shard", "bin_id")
                .agg(F.count(F.lit(1)).alias("bin_docs"),
                     F.sum("n_tokens").alias("bin_tokens"),
                     F.sum(F.when(F.col("n_tokens") > cap, 1).otherwise(0))
                      .alias("bin_oversize")))
    return per_bin.groupBy("shard").agg(
        F.sum("bin_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
        F.max("bin_tokens").cast("long").alias("max_bin_tokens"),
        (F.sum("bin_tokens").cast("double")
         / (F.count(F.lit(1)) * F.lit(cap)).cast("double"))
        .alias("fill_rate"),
        F.sum("bin_oversize").cast("long").alias("oversize_docs"))


DOCS_PACKING_EFFICIENCY_SQL = f"""
WITH RECURSIVE {_PACKED_CTE_SQL},
per_bin AS (
  SELECT shard, bin_id, COUNT(*) AS bin_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         SUM(CASE WHEN n_tokens > {PACK_CAP} THEN 1 ELSE 0 END)
           AS bin_oversize
  FROM packed GROUP BY shard, bin_id
)
SELECT shard,
       CAST(SUM(bin_docs) AS BIGINT) AS n_docs,
       COUNT(*) AS n_bins,
       CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens,
       CAST(SUM(bin_tokens) AS DOUBLE)
         / CAST(COUNT(*) * {PACK_CAP} AS DOUBLE) AS fill_rate,
       CAST(SUM(bin_oversize) AS BIGINT) AS oversize_docs
FROM per_bin
GROUP BY shard
"""
