"""Multimodal columns: opaque binary payloads + typed metadata (north-star
surface, BASELINE.json).

Model: media is an opaque ``binary`` column with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas functions
over ``mapInPandas``. The codec layer is REAL for the public formats a
pure-Python parser can handle — binary PPM images, PPM frame streams,
24-bit BMP, 16-bit PCM WAV (``multimodal/codecs.py``) — and the fixtures
are genuine files in those formats, generated JVM-side from md5-derived
bytes so the DuckDB oracles reconstruct every decoded property byte for
byte. Formats that genuinely need native libraries (JPEG, MP4, …) are out
of scope for this container; their pipelines would slot into the same
mapInPandas kernels.

Scale notes: mapInPandas streams Arrow batches — constant memory per task, no
driver collect; binary payloads never pass through Python row-at-a-time.
Partitioning: repartition by a content-hash bucket upstream if payload sizes
are skewed (a few giant videos can straggle a task).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from wheels_in_motion_analytics_spark.registry import REGISTRY, register
from wheels_in_motion_analytics_spark.tables import table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table from documents: text bytes stand in
    for an image/audio payload; metadata is a real typed struct."""
    docs = table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real-codec media fixtures: md5-derived content wrapped in REAL container
# formats (binary PPM, 24-bit BMP, PCM WAV — parsed by the pure-Python
# codecs in multimodal/codecs.py). Generation is JVM-side (md5 → unhex →
# concat around literal format headers), so every decoded property is
# reconstructable by the DuckDB oracle byte for byte.
# ---------------------------------------------------------------------------

from wheels_in_motion_analytics_spark.multimodal import codecs  # noqa: E402

PPM_BLOCKS = codecs.PPM_PIXEL_BYTES // 16  # 12 md5 blocks = 192 raster bytes
WAV_BLOCKS = codecs.WAV_SAMPLES * 2 // 16  # 32 md5 blocks = 512 PCM bytes


def _md5_blocks(prefix, n_blocks: int):
    """concat(unhex(md5(prefix || ':k'))) for k in 0..n — deterministic
    synthetic bytes both engines can derive."""
    return F.concat(
        *[F.unhex(F.md5(F.concat(prefix, F.lit(f":{k}")))) for k in range(n_blocks)]
    )


def _doc_prefix(kind: str):
    return F.concat(F.lit(f"{kind}:"), F.col("doc_id").cast("string"))


def image_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One real binary-PPM (P6) image per document."""
    header = F.unhex(F.lit(codecs.PPM_HEADER.hex()))
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .select("doc_id", F.concat(header, _md5_blocks(_doc_prefix("img"), PPM_BLOCKS)).alias("payload"))
    )


def video_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One real PPM stream (ffmpeg image2pipe shape) of VIDEO_FRAMES frames
    per document."""
    header = F.unhex(F.lit(codecs.PPM_HEADER.hex()))
    frames = [
        F.concat(
            header,
            _md5_blocks(
                F.concat(_doc_prefix("vid"), F.lit(f":{f}")), PPM_BLOCKS
            ),
        )
        for f in range(codecs.VIDEO_FRAMES)
    ]
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .select("doc_id", F.concat(*frames).alias("payload"))
    )


def audio_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One real 16-bit PCM WAV (stdlib-wave-decodable) per document."""
    header = F.unhex(F.lit(codecs.wav_header().hex()))
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .select("doc_id", F.concat(header, _md5_blocks(_doc_prefix("wav"), WAV_BLOCKS)).alias("payload"))
    )


def bmp_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One real 24-bit uncompressed BMP (bottom-up BGR) per document."""
    header = F.unhex(F.lit(codecs.bmp_header(codecs.IMG_W, codecs.IMG_H).hex()))
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .select("doc_id", F.concat(header, _md5_blocks(_doc_prefix("bmp"), PPM_BLOCKS)).alias("payload"))
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """REAL resize over mapInPandas — decode the P6 payload, nearest-neighbor
    resample on actual pixels, re-encode as P6. Binary in, binary out, Arrow
    end to end."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = [codecs.resize_ppm_nearest(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": out,
                    "n_bytes_out": [len(b) for b in out],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_media_frames(media: DataFrame, every: int = codecs.FRAME_SAMPLE_EVERY) -> DataFrame:
    """REAL frame sampling over mapInPandas — parse the PPM stream (header
    by header) and keep every Nth frame; one media row fans out to frame
    rows (the flatMap shape of video pipelines)."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(codecs.split_ppm_stream(payload)):
                    if i % every == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAMES_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """REAL feature extraction over mapInPandas: decode the P6 image and emit
    parsed dimensions + per-channel pixel sums — Arrow batches in, Arrow
    batches out, the canonical multimodal hot path."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ws, hs, sr, sg, sb = [], [], [], [], []
            for payload in pdf["payload"]:
                w, h, raster = codecs.decode_ppm(payload)
                px = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                ws.append(w)
                hs.append(h)
                sr.append(int(px[0::3].sum()))
                sg.append(int(px[1::3].sum()))
                sb.append(int(px[2::3].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": ws,
                    "height": hs,
                    "sum_r": sr,
                    "sum_g": sg,
                    "sum_b": sb,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


@register(
    "multimodal_meta",
    category="multimodal",
    doc="Typed metadata over opaque binary payloads (byte length via "
    "octet_length on both engines) — the oracle-checkable plumbing half.",
    oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       'application/octet-stream' AS mime,
       source
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.source").alias("source"),
    )


def _oracle_ppm_features() -> str:
    """Reconstruct the P6 raster bytes arithmetically (raster byte i lives
    at hex offset (i%16)*2 of md5('img:<doc>:<i//16>')) and aggregate the
    same per-channel sums the real decoder produces."""
    return f"""
WITH bytes AS (
  SELECT doc_id, i,
         ('0x' || substr(md5('img:' || CAST(doc_id AS VARCHAR) || ':' ||
                              CAST(i // 16 AS VARCHAR)),
                         CAST((i % 16) * 2 + 1 AS INTEGER), 2))::BIGINT AS val
  FROM documents
  CROSS JOIN (SELECT unnest(range({codecs.PPM_PIXEL_BYTES})) AS i) ii
)
SELECT doc_id,
       CAST({codecs.IMG_W} AS INTEGER) AS width,
       CAST({codecs.IMG_H} AS INTEGER) AS height,
       CAST(SUM(CASE WHEN i % 3 = 0 THEN val ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN i % 3 = 1 THEN val ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN i % 3 = 2 THEN val ELSE 0 END) AS BIGINT) AS sum_b
FROM bytes GROUP BY doc_id
"""


@register(
    "multimodal_features",
    category="multimodal",
    doc="REAL image decode + feature extraction over mapInPandas: each doc's "
    "payload is a genuine binary-PPM (P6) file (md5-derived pixels behind a "
    "real header), parsed by the pure-Python codec (multimodal/codecs.py — "
    "header tokenizer, raster slice), features = parsed dimensions + "
    "per-channel pixel sums. FULLY oracle-checked: DuckDB reconstructs the "
    "raster bytes arithmetically and must agree with what the decoder read "
    "from the actual file bytes.",
    oracle=_oracle_ppm_features(),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(image_media_table(spark, sf_dir))


@register(
    "multimodal_dedup_payload",
    category="multimodal",
    doc="Asset-level exact dedup: md5 content hash of the binary payload, "
    "one hash-groupBy keeping the smallest doc_id per digest — the "
    "image/audio twin of document exact-dedup (same md5 on a BLOB in "
    "DuckDB, so the digests themselves are oracle-checked bit-for-bit). "
    "At 100 TB this is one shuffle on the 16-byte digest, payloads never "
    "leave their executors.",
    oracle="""
SELECT md5(text) AS digest,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper_doc_id,
       CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS dup_bytes
FROM documents
GROUP BY digest
""",
)
def multimodal_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return (
        media.select("doc_id", F.md5("payload").alias("digest"), F.col("meta.n_bytes").alias("n_bytes"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.sum("n_bytes").alias("dup_bytes"),
        )
    )


def _raster_hex_sql(prefix_sql: str, n_blocks: int = None) -> str:
    """Hex string of the md5-derived raster: concat of the md5 hex digests
    themselves (md5 already returns lowercase hex — no unhex needed)."""
    n = PPM_BLOCKS if n_blocks is None else n_blocks
    return " || ".join(f"md5({prefix_sql} || ':{k}')" for k in range(n))


def _oracle_resize_digest() -> str:
    out_w = out_h = 4
    hdr_out = f"P6\n{out_w} {out_h}\n255\n".encode()
    picks = []
    for r in range(out_h):
        for c in range(out_w):
            src = (
                (r * codecs.IMG_H // out_h) * codecs.IMG_W
                + (c * codecs.IMG_W // out_w)
            ) * 3
            picks.append(f"substr(rh, {src * 2 + 1}, 6)")
    n_out = len(hdr_out) + out_w * out_h * 3
    return f"""
WITH rast AS (
  SELECT doc_id, {_raster_hex_sql("'img:' || CAST(doc_id AS VARCHAR)")} AS rh
  FROM documents
)
SELECT doc_id,
       CAST({n_out} AS BIGINT) AS n_bytes_out,
       md5('{hdr_out.hex()}' || {" || ".join(picks)}) AS resized_md5
FROM rast
"""


@register(
    "multimodal_resize_digest",
    category="multimodal",
    doc="REAL image resize verified end-to-end: decode the genuine P6 "
    "payload with the pure-Python codec, nearest-neighbor resample 8×8→4×4 "
    "on actual pixels, re-encode as P6, md5 the hex of the output file. "
    "The oracle reconstructs the resized payload byte-for-byte (header hex "
    "literal + the 16 nearest-neighbor source picks over the md5-derived "
    "raster) — decoder, resampler and encoder all byte-exact.",
    oracle=_oracle_resize_digest(),
)
def multimodal_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = resize_media(image_media_table(spark, sf_dir), width=4, height=4)
    return resized.select(
        "doc_id",
        "n_bytes_out",
        F.md5(F.lower(F.hex(F.col("resized")))).alias("resized_md5"),
    )


def _oracle_frame_digest() -> str:
    kept = list(range(0, codecs.VIDEO_FRAMES, codecs.FRAME_SAMPLE_EVERY))
    return f"""
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       md5('{codecs.PPM_HEADER.hex()}' ||
           {_raster_hex_sql("'vid:' || CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)")}
       ) AS frame_md5
FROM documents
CROSS JOIN (SELECT unnest([{", ".join(str(f) for f in kept)}]) AS f) ff
"""


@register(
    "multimodal_frame_digest",
    category="multimodal",
    doc="REAL frame sampling verified end-to-end: each doc's payload is a "
    f"genuine {codecs.VIDEO_FRAMES}-frame PPM stream (ffmpeg image2pipe "
    "shape); the mapInPandas flatMap parses frame headers to find frame "
    f"boundaries and keeps every {codecs.FRAME_SAMPLE_EVERY}nd frame; kept "
    "frame files are md5-digested over their hex. The oracle reconstructs "
    "each kept frame's bytes (header literal + md5-derived raster) — "
    "stream parsing, sampling and fan-out all byte-exact.",
    oracle=_oracle_frame_digest(),
)
def multimodal_frame_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_media_frames(video_media_table(spark, sf_dir))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.lower(F.hex(F.col("frame")))).alias("frame_md5"),
    )


def _oracle_audio_stats() -> str:
    return f"""
WITH h AS (
  SELECT doc_id, k,
         md5('wav:' || CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS hx
  FROM documents
  CROSS JOIN (SELECT unnest(range({WAV_BLOCKS})) AS k) kk
),
s AS (
  SELECT doc_id,
         ('0x' || substr(hx, CAST(j * 4 + 1 AS INTEGER), 2))::BIGINT
         + 256 * ('0x' || substr(hx, CAST(j * 4 + 3 AS INTEGER), 2))::BIGINT AS u
  FROM h CROSS JOIN (SELECT unnest(range(8)) AS j) jj
)
SELECT doc_id,
       CAST({codecs.WAV_RATE} AS INTEGER) AS sample_rate,
       CAST({codecs.WAV_SAMPLES} AS INTEGER) AS n_samples,
       CAST(SUM(CASE WHEN u >= 32768 THEN 65536 - u ELSE u END) AS BIGINT) AS sum_abs,
       MAX(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS peak
FROM s GROUP BY doc_id
"""


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


@register(
    "multimodal_audio_stats",
    category="multimodal",
    doc="REAL audio decode: each doc's payload is a genuine mono 16-bit PCM "
    "WAV file (canonical 44-byte RIFF header + md5-derived samples), decoded "
    "with the stdlib wave module inside mapInPandas; emits the sample rate "
    "and frame count AS PARSED FROM THE REAL HEADER plus exact integer "
    "sum(|sample|) and peak. FULLY oracle-checked: DuckDB reconstructs the "
    "little-endian int16 samples from the md5 hex and must agree — header "
    "parsing, PCM decode and sign handling all verified.",
    oracle=_oracle_audio_stats(),
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = audio_media_table(spark, sf_dir)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rates, counts, sums, peaks = [], [], [], []
            for payload in pdf["payload"]:
                rate, n, samples = codecs.decode_wav(payload)
                rates.append(rate)
                counts.append(n)
                sums.append(sum(abs(s) for s in samples))
                peaks.append(max(samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "sum_abs": sums,
                    "peak": peaks,
                }
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


def _oracle_bmp_roundtrip() -> str:
    """Reconstruct the decoder's TOP-DOWN RGB output from the stored
    bottom-up BGR rows: decoded pixel (r, c) channel R|G|B = stored raster
    byte ((H-1-r)*rowbytes + c*3 + {{2|1|0}})."""
    row_bytes = codecs.IMG_W * 3
    picks = []
    for r in range(codecs.IMG_H):
        for c in range(codecs.IMG_W):
            base = (codecs.IMG_H - 1 - r) * row_bytes + c * 3
            for ch_off in (2, 1, 0):  # stored BGR → decoded RGB
                picks.append(f"substr(rh, {(base + ch_off) * 2 + 1}, 2)")
    return f"""
WITH rast AS (
  SELECT doc_id, {_raster_hex_sql("'bmp:' || CAST(doc_id AS VARCHAR)")} AS rh
  FROM documents
)
SELECT doc_id,
       CAST({codecs.IMG_W} AS INTEGER) AS width,
       CAST({codecs.IMG_H} AS INTEGER) AS height,
       md5(concat({", ".join(picks)})) AS decoded_md5
FROM rast
"""


BMP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoded_md5", T.StringType()),
    ]
)


@register(
    "multimodal_bmp_roundtrip",
    category="multimodal",
    doc="REAL BMP decode: each doc's payload is a genuine 24-bit "
    "uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR "
    "rows); the pure-Python decoder parses the headers, undoes the row flip "
    "and channel order, and the decoded top-down RGB raster is md5-digested "
    "over its hex. FULLY oracle-checked: DuckDB reconstructs the decoded "
    "raster with the flip/BGR index arithmetic — wrong header offsets, row "
    "order or channel order would all fail the hash.",
    oracle=_oracle_bmp_roundtrip(),
)
def multimodal_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = bmp_media_table(spark, sf_dir)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ws, hs, digests = [], [], []
            for payload in pdf["payload"]:
                w, h, rgb = codecs.decode_bmp(payload)
                ws.append(w)
                hs.append(h)
                digests.append(__import__("hashlib").md5(rgb.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs, "decoded_md5": digests}
            )

    return media.mapInPandas(run, BMP_SCHEMA)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) near-dup — codec-free binary asset dedup
# ---------------------------------------------------------------------------

CDC_WINDOW = 8  # rolling-window width for boundary detection
CDC_MODULUS = 64  # expected chunk length ≈ modulus bytes
CDC_MIN_SHARED = 2  # chunks two assets must share to pair


@register(
    "multimodal_cdc_neardup",
    category="multimodal",
    doc="Content-defined chunking near-dup over binary assets, no codec "
    f"needed: boundaries where the md5 rolling hash of a {CDC_WINDOW}-byte "
    f"window ≡ 0 (mod {CDC_MODULUS}) — shift-robust, unlike fixed-offset "
    "chunking — then chunk-hash inverted-index join; asset pairs sharing "
    f"≥{CDC_MIN_SHARED} chunks surface as near-dups with containment "
    "ratios. The rsync/LBFS/backup-dedup algorithm as one relational plan "
    "(explode positions → boundary filter → lead-window spans → hash "
    "join); payloads here are the text bytes (media_table convention).",
    oracle=f"""
WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
pos AS (
  -- DuckDB range() is upper-EXCLUSIVE while Spark sequence() is
  -- upper-INCLUSIVE: the candidate positions must be [1, n-W-1] on BOTH
  -- engines, so the exclusive bound here is n-W (off-by-one found by the
  -- round-7 sf0.1 differential: edge-position boundaries exist in the
  -- sf0.1 corpus but not at sf0.01/sf0.001)
  SELECT doc_id, text, n, unnest(range(1, greatest(n - {CDC_WINDOW}, 1))) AS i
  FROM t
),
bnd AS (
  SELECT doc_id, text, n, i FROM pos
  WHERE ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), {CDC_WINDOW})), 1, 7))::BIGINT
        % {CDC_MODULUS} = 0
  UNION ALL
  SELECT doc_id, text, n, 1 FROM t
),
spans AS (
  SELECT DISTINCT doc_id, text, i AS bstart,
         COALESCE(lead(i) OVER (PARTITION BY doc_id ORDER BY i), n + 1) - i
           AS blen
  FROM (SELECT DISTINCT doc_id, text, n, i FROM bnd)
),
chunks AS (
  SELECT DISTINCT doc_id,
         md5(substr(text, CAST(bstart AS INTEGER), CAST(blen AS INTEGER))) AS ch
  FROM spans WHERE blen >= 1
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
  FROM chunks a JOIN chunks b ON a.ch = b.ch AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {CDC_MIN_SHARED}
),
sizes AS (SELECT doc_id, COUNT(*) AS nch FROM chunks GROUP BY doc_id)
SELECT d1, d2, shared,
       round(CAST(shared AS DOUBLE) / least(sa.nch, sb.nch), 6) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = d1
JOIN sizes sb ON sb.doc_id = d2
""",
)
def multimodal_cdc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wheels_in_motion_analytics_spark.functions.similarity import hash_hex

    par = spark.sparkContext.defaultParallelism
    t = (
        table(spark, sf_dir, "documents")
        .repartition(par)
        .select("doc_id", "text", F.length("text").alias("n"))
    )
    # candidate boundary positions: every window start whose rolling hash
    # lands on the modulus, plus position 1 (every asset starts a chunk)
    idx = F.sequence(F.lit(1), F.greatest(F.col("n") - CDC_WINDOW - 1, F.lit(1)))
    pos = t.select("doc_id", "text", "n", F.explode(idx).alias("i"))
    bnd = pos.where(
        hash_hex(F.expr(f"substr(text, CAST(i AS INT), {CDC_WINDOW})"), 7)
        % CDC_MODULUS
        == 0
    ).unionByName(t.select("doc_id", "text", "n", F.lit(1).alias("i")))
    w = Window.partitionBy("doc_id").orderBy("i")
    spans = (
        bnd.dropDuplicates(["doc_id", "i"])
        .withColumn(
            "blen",
            F.coalesce(F.lead("i").over(w), F.col("n") + 1) - F.col("i"),
        )
        .where(F.col("blen") >= 1)
    )
    chunks = spans.select(
        "doc_id",
        F.md5(F.expr("substr(text, CAST(i AS INT), CAST(blen AS INT))")).alias("ch"),
    ).dropDuplicates(["doc_id", "ch"])
    a = chunks.select(F.col("doc_id").alias("d1"), "ch")
    b = chunks.select(F.col("doc_id").alias("d2"), F.col("ch").alias("ch2"))
    pairs = (
        a.join(b, (F.col("ch") == F.col("ch2")) & (F.col("d1") < F.col("d2")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= CDC_MIN_SHARED)
    )
    sizes = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nch"))
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("d1"), F.col("nch").alias("na"))),
            "d1",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("d2"), F.col("nch").alias("nb"))),
            "d2",
        )
        .select(
            "d1",
            "d2",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least("na", "nb"), 6
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual image hash (aHash) — the image-dedup fingerprint
# ---------------------------------------------------------------------------


def _oracle_image_ahash() -> str:
    """Replicates decode + aHash over the reconstructed raster hex: pixel p
    (decoded top-down index) reads the stored bottom-up BGR triple; gray is
    channel-order-free ((b0+b1+b2) DIV 3). Pixel offsets ride a 64-row
    VALUES relation; the bit test cross-multiplies against the mean
    (gray*64 > sum_gray — no division anywhere)."""
    row_bytes = codecs.IMG_W * 3
    vals = []
    for p in range(codecs.IMG_W * codecs.IMG_H):
        r, c = divmod(p, codecs.IMG_W)
        base = (codecs.IMG_H - 1 - r) * row_bytes + c * 3
        vals.append(f"({p}, {base})")
    return f"""
WITH rast AS (
  SELECT doc_id, {_raster_hex_sql("'bmp:' || CAST(doc_id AS VARCHAR)")} AS rh
  FROM documents
),
pos (p, byte_off) AS (VALUES {", ".join(vals)}),
px AS (
  SELECT doc_id, p,
         ('0x' || substr(rh, byte_off * 2 + 1, 2))::BIGINT
         + ('0x' || substr(rh, byte_off * 2 + 3, 2))::BIGINT
         + ('0x' || substr(rh, byte_off * 2 + 5, 2))::BIGINT AS gray3
  FROM rast CROSS JOIN pos
),
m AS (
  SELECT doc_id, p, gray3,
         CAST(SUM(gray3) OVER (PARTITION BY doc_id) AS BIGINT) AS tot
  FROM px
),
bits AS (
  SELECT doc_id, p,
         CASE WHEN gray3 * 64 > tot THEN 1 ELSE 0 END AS bit
  FROM m
)
SELECT doc_id,
       CAST(SUM(CASE WHEN p >= 32 THEN bit * (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
       CAST(SUM(CASE WHEN p < 32 THEN bit * (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS ahash_lo,
       CAST(SUM(bit) AS BIGINT) AS n_ones
FROM bits
GROUP BY doc_id
"""


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
        T.StructField("n_ones", T.LongType()),
    ]
)


@register(
    "multimodal_image_ahash",
    category="multimodal",
    doc="Perceptual average-hash (aHash) over REAL decoded BMP pixels — "
    "the image-dedup fingerprint (the binary-asset sibling of simhash): "
    "decode the 24-bit BMP (pure-Python codec on genuine file bytes), "
    "grayscale each pixel ((r+g+b) DIV 3 — integer), set bit p when the "
    "pixel outshines the image mean (cross-multiplied gray*64 > total — "
    "NO division), emit the 64-bit hash as two exact 32-bit halves + "
    "popcount. SCALE SHAPE: one Arrow-batched mapInPandas pass, hashes "
    "then join/group like any dedup key (Hamming-bucket pairing = the "
    "multiprobe-LSH recipe). Oracle reconstructs decode + hash "
    "arithmetically from the md5 fixture bytes.",
    oracle=None,  # assembled below
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = bmp_media_table(spark, sf_dir)

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            his, los, ones = [], [], []
            for payload in pdf["payload"]:
                w, h, rgb = codecs.decode_bmp(payload)
                grays = [
                    rgb[i] + rgb[i + 1] + rgb[i + 2] for i in range(0, len(rgb), 3)
                ]
                tot = sum(grays)
                n = len(grays)
                bits = [1 if g * n > tot else 0 for g in grays]
                hi = sum(b << (p - 32) for p, b in enumerate(bits) if p >= 32)
                lo = sum(b << p for p, b in enumerate(bits) if p < 32)
                his.append(hi)
                los.append(lo)
                ones.append(sum(bits))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash_hi": his, "ahash_lo": los, "n_ones": ones}
            )

    return media.mapInPandas(run, AHASH_SCHEMA)


REGISTRY["multimodal_image_ahash"].oracle = _oracle_image_ahash()


# ---------------------------------------------------------------------------
# Audio silence segmentation — windowed energy -> threshold -> islands (VAD)
# ---------------------------------------------------------------------------

AUDIO_SEG_WINDOW = 16  # samples per energy window -> 16 windows per clip


def _oracle_audio_silence() -> str:
    nw = codecs.WAV_SAMPLES // AUDIO_SEG_WINDOW
    return f"""
WITH h AS (
  SELECT doc_id, k,
         md5('wav:' || CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS hx
  FROM documents
  CROSS JOIN (SELECT unnest(range({WAV_BLOCKS})) AS k) kk
),
s AS (
  SELECT doc_id, k * 8 + j AS idx,
         CASE WHEN u >= 32768 THEN 65536 - u ELSE u END AS a
  FROM (
    SELECT doc_id, k, j,
           ('0x' || substr(hx, CAST(j * 4 + 1 AS INTEGER), 2))::BIGINT
           + 256 * ('0x' || substr(hx, CAST(j * 4 + 3 AS INTEGER), 2))::BIGINT AS u
    FROM h CROSS JOIN (SELECT unnest(range(8)) AS j) jj
  )
),
w AS (
  SELECT doc_id, idx // {AUDIO_SEG_WINDOW} AS w, CAST(SUM(a) AS BIGINT) AS wsum
  FROM s GROUP BY 1, 2
),
t AS (SELECT doc_id, CAST(SUM(wsum) AS BIGINT) AS total FROM w GROUP BY 1),
low AS (
  SELECT w.doc_id, w.w
  FROM w JOIN t USING (doc_id)
  WHERE {nw} * 2 * w.wsum < t.total
),
isl AS (
  SELECT doc_id,
         w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
  FROM low
),
seg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS seg_len
  FROM isl GROUP BY doc_id, grp
),
per AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(MAX(seg_len) AS BIGINT) AS longest_segment,
         CAST(SUM(seg_len) AS BIGINT) AS n_low_windows
  FROM seg GROUP BY doc_id
)
SELECT t.doc_id,
       t.total AS total_abs,
       COALESCE(per.n_low_windows, 0) AS n_low_windows,
       COALESCE(per.n_segments, 0) AS n_segments,
       COALESCE(per.longest_segment, 0) AS longest_segment
FROM t LEFT JOIN per USING (doc_id)
"""


AUDIO_SEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("total_abs", T.LongType()),
        T.StructField("n_low_windows", T.LongType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("longest_segment", T.LongType()),
    ]
)


@register(
    "multimodal_audio_silence_segments",
    category="multimodal",
    doc=f"VAD-shaped silence segmentation over REAL WAV decode: per clip, "
    f"{codecs.WAV_SAMPLES // AUDIO_SEG_WINDOW} windows of "
    f"{AUDIO_SEG_WINDOW} samples -> exact integer |sample| energy per "
    "window -> 'low' iff window energy is under HALF the clip's mean "
    "window energy (pure integer cross-multiplication) -> adjacent low "
    "windows merge into segments (gaps-and-islands). The ENTIRE "
    "window/threshold/merge pipeline runs inside the decode kernel "
    "(mapInPandas) on the clip's own 256 samples — per-clip local work, "
    "ZERO shuffles, embarrassingly parallel at any corpus size. Oracle "
    "replays decode, windowing, the threshold and the island merge from "
    "the md5 fixture bytes in SQL.",
    oracle=_oracle_audio_silence(),
)
def multimodal_audio_silence_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    media = audio_media_table(spark, sf_dir)
    n_win = codecs.WAV_SAMPLES // AUDIO_SEG_WINDOW

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            tot, nlow, nseg, longest = [], [], [], []
            for payload in pdf["payload"]:
                _rate, _n, samples = codecs.decode_wav(payload)
                wsums = [
                    sum(
                        abs(s)
                        for s in samples[
                            w * AUDIO_SEG_WINDOW : (w + 1) * AUDIO_SEG_WINDOW
                        ]
                    )
                    for w in range(n_win)
                ]
                total = sum(wsums)
                low = [n_win * 2 * ws < total for ws in wsums]
                segs, run_len, best = 0, 0, 0
                for flag in low:
                    if flag:
                        run_len += 1
                        if run_len == 1:
                            segs += 1
                        best = max(best, run_len)
                    else:
                        run_len = 0
                tot.append(total)
                nlow.append(sum(low))
                nseg.append(segs)
                longest.append(best)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "total_abs": tot,
                    "n_low_windows": nlow,
                    "n_segments": nseg,
                    "longest_segment": longest,
                }
            )

    return media.mapInPandas(run, AUDIO_SEG_SCHEMA)
