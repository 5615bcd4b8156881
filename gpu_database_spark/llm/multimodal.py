"""Multimodal column handling (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling beside them. The decode/feature-extraction step is
a Pandas-UDF ``mapInPandas`` stage whose Spark-side plumbing — schema,
batching, partitioning — is real and tested; the actual codec calls
are STUBBED deterministically because no media libraries exist in this
container (clearly marked below; swap ``_fake_decode`` for a PIL/
ffmpeg call in production and nothing else changes).

The fixture has no binary table, so the ``documents`` text is encoded
to UTF-8 bytes as a stand-in payload: the plumbing (binary column +
metadata + Arrow-batched UDF) is identical.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; binary payloads stay off the driver;
repartition by a content-hash prefix balances skewed media sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gpu_database_spark.registry import register
from gpu_database_spark.sources.catalog import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media table derived from documents (payload = UTF-8 bytes,
    media_type round-robins image/audio/video)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        mtype.alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """STUB decoder (deterministic fake).

    Production replaces this with PIL.Image.open / soundfile / ffmpeg —
    NOT implemented here because the container has no media libraries.
    The fake derives plausible metadata purely from the bytes so tests
    are reproducible.
    """
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 421)
    n_frames = 1 if media_type == "image" else 1 + (n % 120)
    mean_intensity = (sum(payload[:256]) / min(n, 256) / 255.0) if n else 0.0
    return width, height, n_frames, mean_intensity


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature pass over binary payloads."""
    import pandas as pd

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p), t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_frames", "mean_intensity"]
            )
            out.insert(0, "byte_len", pdf["byte_len"].values)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


@register(
    "mm_media_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
    FROM documents ORDER BY media_id
    """,
)
def mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (byte length via the
    binary column itself, content hash for dedup/sharding)."""
    m = media_table(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.md5("text").alias("content_md5")
    )
    return (
        m.join(d, "media_id")
        .select("media_id", "media_type", "byte_len", "content_md5")
        .orderBy("media_id")
    )


@register("mm_extract_features")  # rows-only: decode stub is engine-local
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal pipeline: binary table -> Arrow-batched
    mapInPandas decode/feature stage -> per-type rollup."""
    feats = extract_features(media_table(spark, sf_dir))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("byte_len").alias("total_bytes"),
            F.avg("mean_intensity").alias("avg_intensity"),
            F.max("n_frames").alias("max_frames"),
        )
        .orderBy("media_type")
    )


@register("mm_frame_sample")  # rows-only: sampling plan is engine-local
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video payloads: every ~Nth frame index
    per media item, exploded to (media_id, frame_idx) — the shape a
    video-pretraining loader consumes. Decode itself stays stubbed."""
    feats = extract_features(media_table(spark, sf_dir)).filter(
        F.col("media_type") == "video"
    )
    step = F.greatest(F.ceil(F.col("n_frames") / 8).cast("int"), F.lit(1))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, step)
        ).alias("frame_idx"),
    ).orderBy("media_id", "frame_idx")
