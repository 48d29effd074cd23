"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is a SEAM: when Pillow is importable, payloads that parse
as real images decode through it (grayscale pixel grid); otherwise — no
Pillow in the container, or a payload that isn't a valid image — the
deterministic fake decoder below keeps every Spark-side contract (schema,
partition sizing, UDF signature, Arrow batch shape) testable end-to-end,
and keeps the oracle identical in both modes for synthetic payloads.
Video/audio would plug ffmpeg into the same contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # optional dependency — real decode when present
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container ships no Pillow
    _PILImage = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode bytes → float32 pixel grid.

    Pillow path first (grayscale) when the library is importable AND the
    payload is a real image; any failure falls through to the
    deterministic fake grid so synthetic payloads produce identical
    features with or without Pillow installed (the oracle runs green in
    both modes).
    """
    if _PILImage is not None:
        from io import BytesIO

        try:
            img = _PILImage.open(BytesIO(payload)).convert("L")
            return np.asarray(img, dtype=np.float32)
        except Exception:
            pass  # not a decodable image — deterministic fake below
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.shape[0])), 1)
    if arr.shape[0] < side * side:  # empty/short payload: zero-pad the grid
        arr = np.concatenate([arr, np.zeros(side * side - arr.shape[0], np.uint8)])
    return arr[: side * side].reshape(side, side).astype(np.float32)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode → pooled feature vector, Arrow batch at a time.

    Partition sizing note: binary payloads dominate batch memory — callers
    should keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (the
    session default here is 2048) and repartition by size, not row count,
    when payloads exceed ~1 MB.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                img = _decode_image(bytes(payload))
                h, w = img.shape
                # pooled histogram features (deterministic)
                hist, _ = np.histogram(img, bins=feat_dim, range=(0, 255))
                feats = (hist / max(img.size, 1)).astype(np.float32)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "width": np.int32(w),
                        "height": np.int32(h),
                        "n_bytes": len(payload),
                        "features": feats,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB: emits (media_id, frame_no, frame_bytes)
    by slicing the payload deterministically — the real decoder plugs into
    the same contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                chunk = max(len(payload) // 32, 1)
                for i, start in enumerate(range(0, len(payload), chunk * every_n)):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_no": np.int32(i),
                            "frame_bytes": payload[start : start + chunk],
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(fn, out_schema)
