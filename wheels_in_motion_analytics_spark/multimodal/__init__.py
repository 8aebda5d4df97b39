"""Multimodal columns: opaque binary payloads + typed metadata (north-star
surface, BASELINE.json).

Model: media is an opaque ``binary`` column with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas functions
over ``mapInPandas`` — the Spark-side plumbing (schema, partitioning, batch
shape) is real and tested; the actual codec call is STUBBED (image/audio
libraries are not in this container) behind ``decode_image_stub``, which
raises ``NotImplementedError`` unless ``deterministic_fake=True``.

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

from wheels_in_motion_analytics_spark.registry import register
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
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
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


def decode_image_stub(payload: bytes, deterministic_fake: bool = False) -> list[float]:
    """STUB decode step. Real deployments plug in PIL/ffmpeg here; this
    container has neither, so either fake deterministically or refuse."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "pass deterministic_fake=True for the test fake"
        )
    # Deterministic fake "feature": byte-histogram moments, stable across runs.
    n = len(payload) or 1
    s = sum(payload)
    return [float(n), float(s % 997), float(s) / n]


def resize_image_stub(payload: bytes, width: int, height: int, deterministic_fake: bool = False) -> bytes:
    """STUB resize: real deployments call PIL's Image.resize here."""
    if not deterministic_fake:
        raise NotImplementedError("no image codec in this environment")
    # Deterministic fake: truncate/pad the byte stream to w*h "pixels".
    target = max(width * height, 1)
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def sample_frames_stub(payload: bytes, n_frames: int, deterministic_fake: bool = False) -> list[bytes]:
    """STUB frame sampler: real deployments run ffmpeg keyframe extraction."""
    if not deterministic_fake:
        raise NotImplementedError("no video codec in this environment")
    if not payload:
        return []
    stride = max(len(payload) // max(n_frames, 1), 1)
    return [payload[i * stride : (i + 1) * stride] for i in range(min(n_frames, len(payload)))]


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


def resize_media(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize over mapInPandas — binary in, binary out, Arrow end to end."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = [resize_image_stub(p, width, height, deterministic_fake=True) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": out,
                    "n_bytes_out": [len(b) for b in out],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_media_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling over mapInPandas — one media row fans out to N frame
    rows (the flatMap shape of video pipelines)."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(sample_frames_stub(payload, n_frames, deterministic_fake=True)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAMES_SCHEMA)


def extract_features(media: DataFrame, batch_fake: bool = True) -> DataFrame:
    """Feature extraction over mapInPandas: Arrow batches in, Arrow batches
    out — the canonical multimodal hot path."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = [decode_image_stub(p, deterministic_fake=batch_fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": feats,
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


@register(
    "multimodal_features",
    category="multimodal",
    doc="mapInPandas feature extraction over binary payloads (stubbed "
    "decoder, deterministic fake) — rows-only check; batch shape and "
    "schema are the real contract. Feature vector flattened to scalar "
    "columns for the driver (array cells crash its canonicalizer).",
    oracle=None,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.element_at("feature", 1).alias("f0"),
        F.element_at("feature", 2).alias("f1"),
        F.round(F.element_at("feature", 3), 6).alias("f2"),
    )


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


@register(
    "multimodal_resize_digest",
    category="multimodal",
    doc="Resize plumbing verified end-to-end: the Arrow mapInPandas resize "
    "(deterministic-fake codec — truncate/pad byte stream to w*h pixels) "
    "runs for real, and the output bytes are md5-digested so the oracle "
    "replicates the byte arithmetic relationally. Proves batch shape, "
    "schema, and byte-exact kernel behavior without PIL in the container.",
    oracle="""
SELECT doc_id,
       CAST(64 AS BIGINT) AS n_bytes_out,
       md5(substr(repeat(text, CAST(64 / greatest(length(text), 1) AS INTEGER) + 1),
                  1, 64)) AS resized_md5
FROM documents
""",
)
def multimodal_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = resize_media(media_table(spark, sf_dir), width=8, height=8)
    return resized.select(
        "doc_id",
        "n_bytes_out",
        F.md5(F.col("resized")).alias("resized_md5"),
    )


@register(
    "multimodal_frame_digest",
    category="multimodal",
    doc="Frame-sampling plumbing verified end-to-end: the mapInPandas "
    "flatMap (one media row → 4 stride-sliced 'frames') runs for real; "
    "frame bytes are md5-digested and the oracle replicates the stride "
    "slicing with substr arithmetic. The video-pipeline fan-out shape, "
    "byte-exact.",
    oracle="""
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       md5(substr(text,
                  i * (length(text) // 4) + 1,
                  length(text) // 4)) AS frame_md5
FROM documents
CROSS JOIN (SELECT unnest(range(4)) AS i) idx
""",
)
def multimodal_frame_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_media_frames(media_table(spark, sf_dir), n_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.col("frame")).alias("frame_md5"),
    )


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
  SELECT doc_id, text, n, unnest(range(1, greatest(n - {CDC_WINDOW} - 1, 1))) AS i
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
