"""Multimodal (image/audio/video-as-binary) column operators.

Treats media as opaque ``binary`` columns with typed metadata, processed via
Arrow-batched ``mapInPandas`` (never per-row Python UDFs). The image path is
REAL end-to-end against the engine's own corpus tables (our pure-numpy
ppm/png/qdct codecs). Audio/video decode is STUBBED — this sandbox ships no
media libraries (SURVEY.md §0.1) — but the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested; swap the stub
body for pyav/soundfile on a real cluster.

Scale notes: media bytes never enter a shuffle — decode stages are
narrow (mapInPandas on the scan), and reductions emit fixed-size features
before any groupBy. Tune spark.sql.execution.arrow.maxRecordsPerBatch down
(≈2-8k) so a batch of large images stays within worker memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codecs import decode_image, encode_image, phash64

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, n_bytes long, "
    "mean_r double, mean_g double, mean_b double, std_gray double, phash long"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def image_features(corpus: DataFrame) -> DataFrame:
    """Decode each image and emit fixed-size features (channel means, gray
    std, recomputed phash). Input needs (image_id, bytes, fmt)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                rgb = decode_image(bytes(data), fmt)
                gray = rgb.astype(np.float64).mean(axis=2)
                rows.append(
                    {
                        "image_id": image_id,
                        "w": rgb.shape[1],
                        "h": rgb.shape[0],
                        "fmt": fmt,
                        "n_bytes": len(data),
                        "mean_r": float(rgb[..., 0].mean()),
                        "mean_g": float(rgb[..., 1].mean()),
                        "mean_b": float(rgb[..., 2].mean()),
                        "std_gray": float(gray.std()),
                        "phash": phash64(rgb),
                    }
                )
            yield pd.DataFrame(rows)

    return corpus.select("image_id", "bytes", "fmt").mapInPandas(
        _feat, IMAGE_FEATURES_SCHEMA
    )


def resize_images(corpus: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-grid resize inside mapInPandas; re-encodes in the source fmt."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                rgb = decode_image(bytes(data), fmt)
                yi = (np.arange(out_h) * rgb.shape[0]) // out_h
                xi = (np.arange(out_w) * rgb.shape[1]) // out_w
                small = rgb[np.ix_(yi, xi)]
                rows.append(
                    {
                        "image_id": image_id,
                        "bytes": encode_image(small, fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return corpus.select("image_id", "bytes", "fmt").mapInPandas(_resize, RESIZE_SCHEMA)


def audio_decode_stub(df: DataFrame) -> DataFrame:
    """Audio decode plumbing: (clip_id, bytes) → (clip_id, n_samples, rms).

    STUB: no audio codec ships in this sandbox. The batch shape, schema and
    partitioning are the real design; the decode body raises."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _ in batches:
            raise NotImplementedError(
                "audio decode requires a codec library (none in sandbox); "
                "replace this body with soundfile/librosa on a real cluster"
            )
        yield pd.DataFrame()

    return df.mapInPandas(_decode, "clip_id string, n_samples long, rms double")


def video_frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: (video_id, bytes) → one row per sampled
    frame. STUB decode (no pyav in sandbox); real batching/schema."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _ in batches:
            raise NotImplementedError(
                "video decode requires pyav/ffmpeg (none in sandbox)"
            )
        yield pd.DataFrame()

    return df.mapInPandas(
        _sample, "video_id string, frame_idx int, frame_bytes binary"
    )
