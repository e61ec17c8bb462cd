"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched Pandas UDFs.

Design for 100 TB of media:
- the payload column stays opaque bytes end-to-end (parquet binary);
  decode/feature-extract runs inside ``mapInPandas`` so bytes move driver-
  free, Arrow batch by Arrow batch, one Python worker per core;
- metadata (modality, mime, width/height/duration) lives in ordinary typed
  columns so Catalyst can prune/push down filters WITHOUT touching bytes —
  ``df.filter(modality='image')`` never deserializes a payload;
- batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — for multi-MB payloads set it low (e.g. 32) to bound worker memory.

The actual codecs (PIL/librosa/av) are NOT in this environment, so
``decode_image_features`` ships a deterministic structural "decode" (real
plumbing, fake pixels) and raises ``NotImplementedError`` from
``_decode_real`` where a codec would plug in. The Spark-side contract —
schemas, batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("meta_width", T.IntegerType(), True),
    T.StructField("meta_height", T.IntegerType(), True),
    T.StructField("meta_duration_ms", T.LongType(), True),
])

IMAGE_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, payload_sha int, "
    "thumb_w int, thumb_h int, brightness double"
)


def _decode_real(payload: bytes) -> dict:
    """Plug point for a real codec (PIL.Image.open etc.)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "decode_image_features uses the deterministic structural decode")


def _decode_stub(payload: bytes | None) -> dict:
    """Deterministic fake decode: derives 'features' from the bytes
    themselves so tests are stable and the full data path is exercised."""
    if payload is None:
        return {"n_bytes": 0, "payload_sha": 0, "thumb_w": 0, "thumb_h": 0,
                "brightness": 0.0}
    n = len(payload)
    sha = 0
    for b in payload[:64]:
        sha = (sha * 31 + b) % 2147483647
    return {"n_bytes": n, "payload_sha": sha,
            "thumb_w": 16, "thumb_h": 16,
            "brightness": (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0}


def decode_image_features(df: DataFrame,
                          payload_col: str = "payload",
                          id_col: str = "media_id") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each task receives an iterator of pandas batches —
    bytes never round-trip through the driver, and the iterator shape lets
    a real decoder stream without materializing a whole partition.
    """
    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats = pdf[payload_col].map(_decode_stub)
            out = pd.DataFrame({
                "media_id": pdf[id_col],
                "n_bytes": feats.map(lambda d: d["n_bytes"]),
                "payload_sha": feats.map(lambda d: d["payload_sha"]),
                "thumb_w": feats.map(lambda d: d["thumb_w"]),
                "thumb_h": feats.map(lambda d: d["thumb_h"]),
                "brightness": feats.map(lambda d: d["brightness"]),
            })
            yield out

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=IMAGE_FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, payload binary, out_w int, out_h int, resized boolean"
)


def resize_images(df: DataFrame, max_dim: int = 256,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Image resize plumbing: aspect-preserving target dims from metadata,
    payload transformed batch-by-batch in ``mapInPandas``.

    Target geometry is pure column algebra (prunable, no bytes touched);
    only rows that actually need shrinking enter the Python stage — the
    filter happens BEFORE the Arrow exchange, so at scale the expensive
    path sees just the oversized images. The pixel transform itself is the
    ``_decode_real`` plug point; the stub passes bytes through unchanged.
    """
    w, h = F.col("meta_width"), F.col("meta_height")
    scale = F.lit(max_dim) / F.greatest(w, h)
    need = (F.greatest(w, h) > max_dim) & (F.col("modality") == "image")
    tagged = df.select(
        F.col(id_col), F.col(payload_col),
        F.when(need, (w * scale).cast("int")).otherwise(w).alias("out_w"),
        F.when(need, (h * scale).cast("int")).otherwise(h).alias("out_h"),
        need.alias("resized"))

    def shrink(batches: Iterator) -> Iterator:
        for pdf in batches:
            # Real codec would decode+resample payload rows where
            # pdf.resized; structural stub keeps bytes as-is.
            yield pdf
    return tagged.mapInPandas(shrink, schema=RESIZE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, est_samples long, rms double"
)


def audio_features(df: DataFrame, sample_rate: int = 16000,
                   payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Audio feature extraction (structural stub over real mapInPandas
    plumbing): estimated sample count from duration metadata, byte-level
    'rms' from the payload. A real pipeline swaps the stub for librosa in
    the same batch loop."""
    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)),
                "est_samples": (pdf["meta_duration_ms"].fillna(0)
                                * sample_rate // 1000).astype("int64"),
                "rms": payloads.map(
                    lambda p: 0.0 if not p
                    else (sum(b * b for b in p[:256])
                          / min(len(p), 256)) ** 0.5 / 255.0),
            })
    return (df.filter(F.col("modality") == "audio")
            .select(id_col, payload_col, "meta_duration_ms")
            .mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: computes the frame timestamps each
    video would yield (decode itself is the stubbed plug point). Pure
    column algebra — the expensive part (decode) stays in mapInPandas."""
    n_frames = (F.coalesce(F.col("meta_duration_ms"), F.lit(0))
                / F.lit(every_ms)).cast("int")
    return (df.filter(F.col("modality") == "video")
            .select("media_id",
                    F.explode(
                        F.sequence(F.lit(0),
                                   F.greatest(n_frames - 1, F.lit(0))))
                    .alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms))


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — payload-free by construction (column
    pruning: the scan never reads the bytes column)."""
    return (df.groupBy("modality")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("meta_width").alias("avg_width"),
                 F.avg("meta_duration_ms").alias("avg_duration_ms")))
