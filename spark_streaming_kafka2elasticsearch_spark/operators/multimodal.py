"""Multimodal columns — image/audio/video as opaque binary + metadata.

The Spark-side contract for a 100 TB multimodal corpus:

* media lives in a ``binary`` column (or a pointer column to object
  storage) next to typed metadata (mime, width, duration…);
* decode / feature-extract runs as **Arrow-batched** ``mapInPandas`` —
  one Python worker per partition, one Arrow record batch at a time,
  never a row-at-a-time UDF;
* output schemas are declared up front so Catalyst can prune/plan.

The actual codecs (PIL/ffmpeg/torchaudio) are not in this container,
so the decode kernels are STUBBED: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) produces plausible
shapes — making the plumbing (schema, batching, partitioning) fully
real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a decoded-image feature row.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real image decoder: derives shape
    and luminance from the content hash, so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_luma = h[2] / 255.0
    return width, height, channels, mean_luma


def decode_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Decode images → (dims, mean luminance) via Arrow-batched
    ``mapInPandas``.

    ``fake=False`` requires a real codec library and raises
    ``NotImplementedError`` in this container (clearly-marked stub per
    the build contract); ``fake=True`` runs the deterministic fake so
    the distributed plumbing is exercised end-to-end.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decoding needs PIL/libvips (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            decoded = [_fake_decode(bytes(b)) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "mean_luma": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        decode_batches, schema=IMAGE_FEATURES_SCHEMA
    )


#: Schema of a sampled video frame row (one row per sampled frame).
VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("timestamp_ms", T.LongType(), False),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)

#: Schema of decoded-audio features.
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms_energy", T.DoubleType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    binary_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame — a 1→N
    ``mapInPandas`` (the batch shape a real ffmpeg-backed sampler
    uses; frame count and hashes are derived deterministically from
    the content hash in fake mode).  Real decode requires ffmpeg (not
    in this container) — clearly-marked stub."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real video decoding needs ffmpeg (not in this container); "
                    "pass fake=True for the deterministic stub"
                )
            out: dict[str, list] = {
                "media_id": [], "frame_index": [], "timestamp_ms": [], "frame_hash": []
            }
            for mid, payload in zip(pdf[id_col], pdf[binary_col]):
                h = hashlib.sha256(bytes(payload)).digest()
                n_frames = 2 + h[3] % 6  # fake duration → 2..7 frames
                for i in range(n_frames):
                    out["media_id"].append(int(mid))
                    out["frame_index"].append(i)
                    out["timestamp_ms"].append(i * every_ms)
                    out["frame_hash"].append(
                        hashlib.sha256(h + i.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(
        sample_batches, schema=VIDEO_FRAME_SCHEMA
    )


def decode_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Audio decode → (duration, sample rate, RMS energy).  Same stub
    contract as images/video: real codecs absent, fake mode derives
    deterministic values from the content hash."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decoding needs torchaudio/soundfile (not in "
                    "this container); pass fake=True for the deterministic stub"
                )
            hs = [hashlib.sha256(bytes(b)).digest() for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "duration_ms": [1000 + h[4] * 100 for h in hs],
                    "sample_rate": [16000 for _ in hs],
                    "rms_energy": [h[5] / 255.0 for h in hs],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        decode_batches, schema=AUDIO_FEATURES_SCHEMA
    )


def synth_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture an opaque-binary media column from any string column
    (test fixture: the container has no real media files)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image/fake").alias("mime"),
    )
