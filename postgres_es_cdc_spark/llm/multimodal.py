"""Multimodal column support ([EXT]): image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the decode kernels are
STUBBED: ``decode_stub`` raises NotImplementedError by design, and
``fake_decode`` is the deterministic stand-in used by tests. Everything
around the stub — the schema contract, the mapInPandas batch shape, the
partition sizing — is real Spark plumbing and is what actually matters
at 100 TB (binary payloads stream through Arrow record batches;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory; metadata
predicates prune before any decode runs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

# Typed envelope for a multimodal asset: opaque bytes + routing metadata.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("mime_type", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("meta_json", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feature", ArrayType(FloatType()), True),
])


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic multimodal table from the documents fixture:
    payload = UTF-8 bytes of the text (a stand-in for real media bytes)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


def decode_stub(payload: bytes, modality: str):
    """Real decode kernel slot (PIL/libav/torchaudio in production).

    Deliberately unimplemented in this container — see module docstring.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode for deterministic tests")


def fake_decode(payload: bytes, modality: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in 'feature extractor': folds payload bytes
    into a fixed-size float vector. Same signature/shape as a real
    decoder -> the Spark plumbing is exercised for real."""
    acc = [0] * dim
    for i, b in enumerate(payload or b""):
        acc[i % dim] = (acc[i % dim] * 31 + b) % 1_000_003
    return [float(v) / 1_000_003.0 for v in acc]


def resize_stub(payload: bytes, width: int, height: int):
    """Image-resize kernel slot (PIL in production) — unimplemented here."""
    raise NotImplementedError("image codecs unavailable; use fake_resize")


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: repeats/truncates the payload to exactly
    width*height bytes (shape contract of a real resize)."""
    target = max(width * height, 1)
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def frame_sample_stub(payload: bytes, every_n: int):
    """Video frame-sampling kernel slot (libav in production)."""
    raise NotImplementedError("video codecs unavailable; use fake_frame_sample")


def fake_frame_sample(payload: bytes, every_n: int, frame_size: int = 64) -> list[bytes]:
    """Deterministic stand-in: treats the payload as fixed-size frames
    and keeps every n-th — the batch shape of real frame sampling."""
    frames = [payload[i:i + frame_size]
              for i in range(0, len(payload or b""), frame_size)]
    return frames[::max(every_n, 1)]


def transform_assets(assets: DataFrame, width: int = 8, height: int = 8,
                     every_n: int = 4) -> DataFrame:
    """mapInPandas media transform: images resized, videos frame-sampled,
    audio passed through — modality routing inside the Arrow batch, the
    per-row kernel swap a real pipeline does."""
    out_schema = StructType([
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("out_bytes", LongType(), True),
        StructField("n_frames", LongType(), True),
    ])

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, frames = [], []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                if m == "image":
                    outs.append(len(fake_resize(p, width, height)))
                    frames.append(1)
                elif m == "video":
                    fs = fake_frame_sample(p, every_n)
                    outs.append(sum(len(f) for f in fs))
                    frames.append(len(fs))
                else:
                    outs.append(len(p or b""))
                    frames.append(0)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"], "modality": pdf["modality"],
                "out_bytes": outs, "n_frames": frames,
            })

    return assets.mapInPandas(_proc, schema=out_schema)


def extract_features(assets: DataFrame, batch_hint: int = 1024,
                     use_stub: bool = False) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Batches arrive as pandas DataFrames (Arrow-deserialized); each batch
    is processed vectorized-per-row and yielded back — the 100 TB shape
    for opaque-binary processing (no row-at-a-time Python UDF overhead).
    """
    decoder = decode_stub if use_stub else fake_decode

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"],
                "feature": [decoder(p, m) for p, m in
                            zip(pdf["payload"], pdf["modality"])],
            })

    return assets.mapInPandas(_proc, schema=FEATURE_SCHEMA)


def multimodal_meta_stats(spark, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the multimodal surface: binary payload
    construction + metadata-only aggregation (the binary column itself
    never leaves the executors — only its byte length)."""
    from postgres_es_cdc_spark.catalog import table

    assets = assets_from_documents(table(spark, sf_dir, "documents"))
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


MULTIMODAL_META_SQL = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT modality, COUNT(*) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(n_bytes) AS min_bytes,
       MAX(n_bytes) AS max_bytes
FROM assets GROUP BY modality
"""


def multimodal_transform_stats(spark, sf_dir: str) -> DataFrame:
    """Oracle-checked mapInPandas media transform: resize/frame-sample
    kernels run inside Arrow batches on the executors, then a metadata
    aggregate — the deterministic fake kernels make the Python plumbing
    SQL-checkable end to end (same shape a real decode pipeline has)."""
    from postgres_es_cdc_spark.catalog import table

    assets = assets_from_documents(table(spark, sf_dir, "documents"))
    out = transform_assets(assets)  # width=8, height=8, every_n=4
    return out.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum("out_bytes").alias("total_out_bytes"),
        F.sum("n_frames").alias("total_frames"),
    )


# Arithmetic twin of fake_resize/fake_frame_sample (frame_size=64,
# every_n=4, resize target 8*8=64): chunks = ceil(len/64), kept every
# 4th chunk starting at 0; the tail chunk is short iff it is kept.
MULTIMODAL_TRANSFORM_SQL = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS len
  FROM documents
), t AS (
  SELECT modality,
    CASE modality
      WHEN 'image' THEN 64
      WHEN 'audio' THEN len
      ELSE CASE WHEN len = 0 THEN 0
           WHEN ((len + 63) // 64 - 1) % 4 = 0
             THEN (((len + 63) // 64 + 3) // 4 - 1) * 64
                  + (len - ((len + 63) // 64 - 1) * 64)
           ELSE (((len + 63) // 64 + 3) // 4) * 64 END
    END AS out_bytes,
    CASE modality WHEN 'image' THEN 1 WHEN 'audio' THEN 0
         ELSE ((len + 63) // 64 + 3) // 4 END AS n_frames
  FROM assets
)
SELECT modality, COUNT(*) AS n_assets,
       CAST(SUM(out_bytes) AS BIGINT) AS total_out_bytes,
       CAST(SUM(n_frames) AS BIGINT) AS total_frames
FROM t GROUP BY modality
"""


def modality_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only aggregation: prunes the binary column entirely —
    the scan never materializes payload bytes (column pruning)."""
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def byte_residue_features(payload: bytes, dim: int = 8) -> list[int]:
    """Deterministic integer 'embedding' for the oracle-checked pipeline
    query: dim j sums the payload bytes at positions ≡ j (mod dim).
    Order-independent per residue class -> expressible in SQL, unlike
    the rolling-hash fake_decode; same signature shape as a real
    encoder (bytes in, fixed-dim vector out)."""
    acc = [0] * dim
    for i, b in enumerate(payload or b""):
        acc[i % dim] += b
    return acc


def multimodal_embed_topk(spark, sf_dir: str, k: int = 3,
                          n_queries: int = 3) -> DataFrame:
    """End-to-end media -> embedding -> similarity search: binary assets
    stream through an Arrow-batched feature extractor (the decode slot a
    real CLIP/wav2vec encoder fills), then integer-exact cosine top-k
    against the whole corpus — the multimodal ingestion shape of a
    training-data pipeline, oracle-checked end to end.

    Scale: extraction is embarrassingly parallel over Arrow batches;
    the search side is the broadcast-query pattern of emb_cosine_topk.
    """
    from postgres_es_cdc_spark.catalog import table

    assets = assets_from_documents(table(spark, sf_dir, "documents"))
    feat_schema = StructType([
        StructField("asset_id", LongType(), False),
        StructField("f", ArrayType(LongType()), False),
    ])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # numpy residue-class sums: 8 strided-slice reductions per asset
        # instead of a per-BYTE Python loop (the loop measured as the
        # dominant cost of this query at sf3 — 30M byte iterations).
        import numpy as np
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                feats.append([int(a[j::8].sum()) for j in range(8)])
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "f": feats})

    feats = assets.select("asset_id", "payload").mapInPandas(
        _extract, feat_schema)

    def idot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0).cast("long"), lambda acc, v: acc + v)

    # Guard: a zero-byte payload yields a zero vector and NaN cosine,
    # and NaN ordering differs across engines — exclude empty vectors on
    # BOTH sides (no-op on this corpus; min doc length > 0).
    nz = idot(F.col("f"), F.col("f")) > 0
    # feats feeds both the query collect and the scoring scan — one
    # eager checkpoint runs the extractor exactly once (8 longs/asset).
    c = (feats.filter(nz)
              .select(F.col("asset_id").alias("cid"), F.col("f").alias("cf"))
              .localCheckpoint(eager=True))
    qrows = [(r["cid"], list(r["cf"]))
             for r in c.filter(F.col("cid") < n_queries).collect()]
    from postgres_es_cdc_spark.llm.similarity import _bq_scores
    scored = (_bq_scores(qrows, c, "cid", "cf", "cos")
              .filter(F.col("qid") != F.col("cid")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k)
                  .select("qid", "cid", "rank", "cos_sim"))


# Oracle: the corpus text is ASCII by construction, so payload byte i ==
# ascii(substr(text, i+1, 1)) and the residue-sum features are plain SQL.
MULTIMODAL_EMBED_TOPK_SQL = """
WITH positions AS (
  -- no lateral column params to generate_series in FROM (DuckDB);
  -- unnest in SELECT instead
  SELECT doc_id AS asset_id, text,
         unnest(generate_series(1, length(text))) AS pos
  FROM documents
), bytes AS (
  SELECT asset_id, pos, ascii(substr(text, pos, 1)) AS b FROM positions
), feats AS (
  SELECT asset_id, (pos - 1) % 8 AS dim, CAST(SUM(b) AS BIGINT) AS v
  FROM bytes GROUP BY asset_id, (pos - 1) % 8
), nz AS (
  SELECT asset_id FROM feats GROUP BY asset_id HAVING SUM(v * v) > 0
), q AS (SELECT f.* FROM feats f JOIN nz USING (asset_id) WHERE asset_id < 3),
scored AS (
  SELECT q.asset_id AS qid, c.asset_id AS cid,
         CAST(SUM(q.v * c.v) AS DOUBLE)
           / ( SQRT(CAST(SUM(q.v * q.v) AS DOUBLE))
             * SQRT(CAST(SUM(c.v * c.v) AS DOUBLE)) ) AS cos_sim
  FROM q
  JOIN (SELECT f.* FROM feats f JOIN nz USING (asset_id)) c
    ON q.dim = c.dim AND q.asset_id != c.asset_id
  GROUP BY q.asset_id, c.asset_id
)
SELECT qid, cid, rank, cos_sim
FROM (SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rank
      FROM scored)
WHERE rank <= 3
"""


FRAME_SIZE = 64
FRAME_EVERY_N = 2


def multimodal_frame_dedup(spark, sf_dir: str,
                           frame_size: int = FRAME_SIZE,
                           every_n: int = FRAME_EVERY_N) -> DataFrame:
    """Cross-asset FRAME deduplication — the video/binary analog of
    docs_chunk_dedup: frame-sample every asset's payload (the
    ``fake_frame_sample`` kernel through the real mapInPandas plumbing,
    exactly as a libav sampler would run), hash each kept frame, count
    distinct assets per frame hash, and report how much of each asset
    is boilerplate shared with other assets (intros/outros/logo frames
    in a real video corpus).

    Corpus: the mutated documents (payload = UTF-8 text bytes), so
    mutants share almost all frames with their originals. Frames are
    fingerprinted as md5(hex(frame_bytes)): DuckDB 1.x has no
    md5(BLOB)/substring(BLOB), but hex() of a byte window is identical
    in both engines for ANY payload, so the parity contract is
    byte-exact even for non-ASCII/multibyte content (windows are byte
    offsets on both sides — the oracle slices the hex string at 2 chars
    per byte).

    Scale shape: frame extraction is Arrow-batched map-side work; the
    shuffles carry (16-byte hash, asset_id) pairs, never frame bytes
    twice (group-then-emit); per-asset rollup is partial-aggregable.
    """
    from postgres_es_cdc_spark.llm.dedup import mutated_corpus

    assets = mutated_corpus(spark, sf_dir).select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"))

    out_schema = StructType([
        StructField("asset_id", LongType(), False),
        StructField("frame", BinaryType(), True),
    ])

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {"asset_id": [], "frame": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for fr in fake_frame_sample(bytes(payload), every_n,
                                            frame_size):
                    rows["asset_id"].append(int(aid))
                    rows["frame"].append(fr)
            yield pd.DataFrame(rows)

    frames = assets.mapInPandas(_frames, out_schema)
    # "Shared with another asset" = min(asset_id) != max(asset_id) over
    # a window partitioned by the frame hash — no per-hash array, so a
    # degenerate hash (an all-black frame in millions of assets) buffers
    # through WindowExec's spillable run instead of one unbounded
    # collect_list bucket. Same single evaluation, same one shuffle
    # carrying (16-byte hash, asset_id).
    hw = Window.partitionBy("h")
    back = (frames.select("asset_id", F.md5(F.hex("frame")).alias("h"))
                  .withColumn("dup", F.min("asset_id").over(hw)
                              != F.max("asset_id").over(hw)))
    return (back.groupBy("asset_id")
                .agg(F.count(F.lit(1)).alias("n_frames"),
                     F.sum(F.col("dup").cast("long")).alias("n_dup_frames"))
                .withColumn("dup_frame_ratio",
                            F.col("n_dup_frames").cast("double")
                            / F.col("n_frames").cast("double")))


def _frame_dedup_sql(frame_size: int = FRAME_SIZE,
                     every_n: int = FRAME_EVERY_N) -> str:
    from postgres_es_cdc_spark.llm.dedup import _MUTATED_SQL

    return f"""
WITH corpus AS ({_MUTATED_SQL}),
t AS (SELECT doc_id AS asset_id, upper(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n
      FROM corpus),
f AS (
  SELECT asset_id, hx, n,
         unnest(generate_series(0,
             greatest(CAST(ceil(n / {frame_size}.0) AS INT) - 1, 0))) AS fi
  FROM t
),
frames AS (
  SELECT asset_id,
         md5(substring(hx, fi*{frame_size}*2+1, {frame_size}*2)) AS h
  FROM f
  WHERE fi % {every_n} = 0 AND fi*{frame_size} < n
),
freq AS (SELECT h, COUNT(DISTINCT asset_id) AS na FROM frames GROUP BY h)
SELECT fr.asset_id,
       COUNT(*) AS n_frames,
       CAST(SUM(CASE WHEN q.na > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_frames,
       CAST(SUM(CASE WHEN q.na > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frame_ratio
FROM frames fr JOIN freq q USING (h)
GROUP BY fr.asset_id
"""


MULTIMODAL_FRAME_DEDUP_SQL = _frame_dedup_sql()


def audio_decode_stub(payload: bytes):
    """Real PCM decode kernel slot (torchaudio/libsndfile in
    production) — deliberately unimplemented in this container; see
    module docstring."""
    raise NotImplementedError(
        "audio codecs are not available in this environment; "
        "use fake_audio_samples for deterministic tests")


def fake_audio_samples(payload: bytes) -> list:
    """Deterministic stand-in PCM decode: consecutive byte PAIRS become
    signed 16-bit big-endian samples (odd tail byte dropped) — the
    batch shape of a real audio decode (bytes in, sample array out),
    integer-exact so the DuckDB twin reproduces it from the same
    bytes."""
    p = payload or b""
    return [((p[i] << 8) | p[i + 1]) - 32768
            for i in range(0, len(p) - 1, 2)]


def multimodal_audio_energy(spark, sf_dir: str) -> DataFrame:
    """Audio-modality analysis through the real mapInPandas plumbing:
    per audio asset, sample count, total ENERGY (Σ sample², the loudness
    integral) and PEAK amplitude — the stats a corpus-prep pipeline
    gates on (silence/clipping filters) before transcribing audio at
    scale. Completes the modality coverage: image (resize), video
    (frame sample/dedup), audio (THIS).

    Exactness: the fake PCM kernel is pure integer arithmetic on the
    payload bytes (ASCII corpus ⇒ DuckDB reproduces each sample from
    character codes); energy ≤ 32768²·samples fits long comfortably.
    Scale shape: Arrow-batched mapInPandas emits 3 ints per asset — the
    sample arrays never leave the executor, and the shuffle carries
    only the stats (same discipline as frame dedup's hashes)."""
    import pandas as pd

    from postgres_es_cdc_spark.catalog import table

    assets = (assets_from_documents(table(spark, sf_dir, "documents"))
              .filter(F.col("modality") == "audio")
              .select("asset_id", "payload"))

    def stats(batches):
        for pdf in batches:
            ids, ns, energy, peak = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                s = fake_audio_samples(bytes(payload)
                                       if payload is not None else b"")
                ids.append(aid)
                ns.append(len(s))
                energy.append(sum(v * v for v in s))
                peak.append(max((abs(v) for v in s), default=0))
            yield pd.DataFrame({"asset_id": ids, "n_samples": ns,
                                "energy": energy, "peak": peak})

    return assets.mapInPandas(
        stats, "asset_id long, n_samples long, energy long, peak long")


MULTIMODAL_AUDIO_ENERGY_SQL = """
WITH audio AS (
  SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 1
),
idx AS (
  SELECT asset_id, text,
         unnest(generate_series(1, CAST(length(text) // 2 AS BIGINT))) AS i
  FROM audio
),
s AS (
  SELECT asset_id,
         ascii(substring(text, CAST(2*i - 1 AS INT), 1)) * 256
         + ascii(substring(text, CAST(2*i AS INT), 1)) - 32768 AS smp
  FROM idx
)
SELECT a.asset_id,
       CAST(COALESCE(COUNT(s.smp), 0) AS BIGINT) AS n_samples,
       CAST(COALESCE(SUM(CAST(s.smp AS BIGINT) * s.smp), 0) AS BIGINT)
         AS energy,
       CAST(COALESCE(MAX(ABS(s.smp)), 0) AS BIGINT) AS peak
FROM audio a LEFT JOIN s ON a.asset_id = s.asset_id
GROUP BY a.asset_id
"""


# Scene-cut defaults: compare consecutive FULL frames (the partial tail
# frame never pairs cleanly, so it is excluded from both engines);
# threshold calibrated so the documents corpus produces a real mix of
# cut and non-cut transitions at every sf.
VSC_FRAME = 64
VSC_THRESH = 1500


def scene_cut_stub(payload: bytes):
    """Real scene-cut kernel slot (pyscenedetect/libav histogram diff in
    production) — deliberately unimplemented in this container; see
    module docstring."""
    raise NotImplementedError(
        "video codecs are not available in this environment; "
        "use the byte-frame kernel in multimodal_video_scene_cuts")


def multimodal_video_scene_cuts(spark, sf_dir: str,
                                frame_size: int = VSC_FRAME,
                                thresh: int = VSC_THRESH) -> DataFrame:
    """Video scene-cut detection through the real mapInPandas plumbing:
    per video asset, split the payload into fixed-size frames and flag a
    CUT wherever the L1 distance between consecutive frames exceeds a
    threshold — the shot-boundary pass a video corpus pipeline runs
    before per-scene sampling/captioning. Completes video coverage next
    to frame sampling (transform) and frame dedup.

    The distance kernel is pure integer arithmetic on payload bytes
    (sum of |b1-b2| over the frame), so the ASCII corpus lets DuckDB
    reproduce every frame byte from character codes — the same
    fake-decode discipline as multimodal_audio_energy. Only FULL frames
    participate (len // frame_size); assets shorter than one frame are
    excluded on both sides.

    Scale shape: Arrow-batched mapInPandas emits 4 ints per asset — the
    frame matrices live and die inside the executor (numpy diff over a
    nf x frame_size uint8 view), and the shuffle carries only stats.
    Exactness: diffs <= 255*frame_size per pair, totals fit long with
    ~2^40 headroom; no floats anywhere."""
    import numpy as np
    import pandas as pd

    from postgres_es_cdc_spark.catalog import table

    assets = (assets_from_documents(table(spark, sf_dir, "documents"))
              .filter(F.col("modality") == "video")
              .select("asset_id", "payload"))

    def stats(batches):
        for pdf in batches:
            out = {"asset_id": [], "n_frames": [], "n_cuts": [],
                   "max_diff": [], "total_diff": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                nf = len(p) // frame_size
                if nf < 1:
                    continue
                fr = np.frombuffer(
                    p[:nf * frame_size],
                    dtype=np.uint8).astype(np.int64).reshape(nf, frame_size)
                d = np.abs(np.diff(fr, axis=0)).sum(axis=1)
                out["asset_id"].append(int(aid))
                out["n_frames"].append(nf)
                out["n_cuts"].append(int((d >= thresh).sum()))
                out["max_diff"].append(int(d.max()) if len(d) else 0)
                out["total_diff"].append(int(d.sum()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        stats, "asset_id long, n_frames long, n_cuts long, "
               "max_diff long, total_diff long")


MULTIMODAL_SCENE_CUTS_SQL = f"""
WITH video AS (
  SELECT doc_id AS asset_id, text,
         length(text) // {VSC_FRAME} AS nf
  FROM documents WHERE doc_id % 3 = 2
),
fidx AS (
  SELECT asset_id, text,
         unnest(generate_series(1, nf - 1)) AS fi
  FROM video WHERE nf >= 2
),
pos AS (
  SELECT asset_id, fi, text,
         unnest(generate_series(1, {VSC_FRAME})) AS j
  FROM fidx
),
d AS (
  SELECT asset_id, fi,
         SUM(ABS(ascii(substring(text, CAST(fi*{VSC_FRAME} + j AS INT), 1))
               - ascii(substring(text,
                                 CAST((fi-1)*{VSC_FRAME} + j AS INT), 1))))
           AS diff
  FROM pos GROUP BY asset_id, fi
)
SELECT v.asset_id,
       CAST(v.nf AS BIGINT) AS n_frames,
       CAST(COALESCE(SUM(CASE WHEN d.diff >= {VSC_THRESH} THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_cuts,
       CAST(COALESCE(MAX(d.diff), 0) AS BIGINT) AS max_diff,
       CAST(COALESCE(SUM(d.diff), 0) AS BIGINT) AS total_diff
FROM video v LEFT JOIN d ON d.asset_id = v.asset_id
WHERE v.nf >= 1
GROUP BY v.asset_id, v.nf
"""
