"""Multimodal column operators: decode / feature-extract / resize / frame-sample.

The reference encodes images to base64 with an iterative resize guard
(≤20 MB, ≤178,956,970 px, reference: annotators/base.py:21-163) before
shipping them to the LLM. The engine treats media as opaque ``binary``
payloads (or ``media_ref`` pointers) with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

This container has no image/audio libraries, so the DECODE step is stubbed
(clearly marked below): ``decode=`` either raises NotImplementedError
(strict mode) or produces a deterministic fake (CI mode) — while everything
Spark-side is real and tested: schemas, batch iteration, partition behavior,
output contract. Swapping in PIL/ffmpeg later changes ONE function body.

Scale notes: media bytes dominate row size → keep them out of shuffles
(extract features first, drop payload), and bound Arrow batches via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernel.dedup import hash_token

MEDIA_FEATURE_DIM = 8
MEDIA_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "width int, height int, n_frames int, feature array<float>"
)

MAX_BYTES = 20 * 1024 * 1024  # reference guard: annotators/base.py:15
MAX_PIXELS = 178_956_970


def _fake_decode(media_ref: str, kind: str) -> tuple[int, int, int]:
    """STUB — deterministic fake decode (no PIL/ffmpeg in this container).

    Real implementation: PIL.Image.open / av.open on the binary payload,
    honoring the MAX_BYTES/MAX_PIXELS guards with LANCZOS downscale
    (reference: annotators/base.py:77-163). The fake derives stable
    (width, height, n_frames) from the media_ref hash so tests are exact.
    """
    h = int(hash_token(media_ref or ""))
    width = 64 + h % 1920
    height = 64 + (h >> 16) % 1080
    n_frames = 1 if kind == "image" else 1 + (h >> 32) % 300
    return width, height, n_frames


def _fake_feature(media_ref: str) -> list[float]:
    """STUB — deterministic fake embedding; real impl: a vision encoder."""
    h = int(hash_token(media_ref or ""))
    rng = np.random.RandomState(h % (2**31))
    return rng.normal(size=MEDIA_FEATURE_DIM).astype(np.float32).tolist()


def extract_media_features(media_rows: DataFrame, strict: bool = False) -> DataFrame:
    """(doc_id, media_ref, kind) → decoded metadata + feature vector.

    ``strict=True`` raises NotImplementedError at plan-execution time —
    the behavior a production deployment wants when the decoder is missing,
    rather than silently fake features.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg; not available in this container"
            )
        for pdf in batches:
            meta = [_fake_decode(r, k) for r, k in zip(pdf["media_ref"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "n_frames": pd.Series([m[2] for m in meta], dtype="int32"),
                    "feature": [_fake_feature(r) for r in pdf["media_ref"]],
                }
            )

    return media_rows.select("doc_id", "media_ref", "kind").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def resize_plan(media_feats: DataFrame, bytes_per_pixel: float = 3.0) -> DataFrame:
    """U7 resize guard (reference: annotators/base.py:77-163) — the REAL
    arithmetic, not a stub: iteratively halve dimensions until the frame
    fits both guards (est. bytes ≤ MAX_BYTES at ``bytes_per_pixel``,
    pixels ≤ MAX_PIXELS), exactly like the reference's downscale loop.
    Only the pixel *resampling* itself (LANCZOS) needs an image lib; the
    target geometry is pure columnar math.

    Adds (target_width, target_height, halvings, needs_resize).
    """
    from pyspark.sql import functions as F

    # halvings h: smallest h with (w·h⁻²)·(h·h⁻²)... i.e. pixels/4^h within
    # both caps → h = ceil(log4(pixels / cap)) against the tighter cap
    pixels = F.col("width").cast("double") * F.col("height").cast("double")
    cap = F.least(
        F.lit(float(MAX_PIXELS)), F.lit(MAX_BYTES / bytes_per_pixel)
    )
    ratio = pixels / cap
    halvings = F.when(
        ratio > 1.0, F.ceil(F.log(4.0, ratio)).cast("int")
    ).otherwise(F.lit(0))
    scale = F.pow(F.lit(2.0), -halvings.cast("double"))
    return media_feats.select(
        "*",
        halvings.alias("halvings"),
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("target_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("target_height"),
        (halvings > 0).alias("needs_resize"),
    )


def frame_sample_plan(media_feats: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index.

    The explode is JVM-side; the (stubbed) per-frame decode would be another
    mapInPandas over (media_ref, frame_idx).
    """
    from pyspark.sql import functions as F

    idx = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    )
    return media_feats.filter(F.col("n_frames") > 1).select(
        "doc_id", "media_ref", idx.alias("frame_idx")
    )
