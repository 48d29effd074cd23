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


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("b0", T.IntegerType(), False),
        T.StructField("b1", T.IntegerType(), False),
        T.StructField("b2", T.IntegerType(), False),
        T.StructField("b3", T.IntegerType(), False),
    ]
)


def perceptual_hash(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per media payload — the perceptual
    fingerprint image pipelines dedup on (pHash/aHash family): decode
    through the ``_decode_image`` seam, partition the pixel grid into
    8×8 cells (cell of pixel (r, c) in an h×w grid is ``(r*8//h,
    c*8//w)``), and set a cell's bit iff its mean EXCEEDS the grand
    pixel mean. Emitted as four 16-bit band integers (b0..b3, cell
    index 16k..16k+15 → bit ``cell−16k`` of bk) — sign-safe in a
    BIGINT world and exactly the pigeonhole keys the Hamming join
    needs.

    INTEGER-decided bits: pixels are integral (0..255 in both decode
    paths), so ``bit = cell_sum · (h·w) > total_sum · cell_count`` is
    an exact integer comparison — no float mean can flip per engine.
    Cells that receive no pixels (grids smaller than 8×8) contribute
    bit 0. The SQL oracle replays the identical chain from the payload
    bytes via one hex() + substr walk (synthetic payloads only — real
    Pillow-decoded images diverge from the byte-grid oracle exactly as
    documented for ``extract_features``).

    Scale: map-only Arrow kernel — no shuffle at all; the output is one
    20-byte row per media item.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                grid = _decode_image(bytes(payload)).astype(np.int64)
                h, w = grid.shape
                r = np.arange(h)[:, None] * 8 // h
                c = np.arange(w)[None, :] * 8 // w
                cell = (r * 8 + c).ravel()
                flat = grid.ravel()
                sums = np.bincount(cell, weights=flat, minlength=64).astype(
                    np.int64
                )
                cnts = np.bincount(cell, minlength=64).astype(np.int64)
                total = int(flat.sum())
                bits = (sums * (h * w)) > (total * cnts)
                bands = [0, 0, 0, 0]
                for idx in np.nonzero(bits)[0]:
                    bands[idx // 16] |= 1 << int(idx % 16)
                rows.append(
                    {
                        "media_id": media_id,
                        "b0": np.int32(bands[0]),
                        "b1": np.int32(bands[1]),
                        "b2": np.int32(bands[2]),
                        "b3": np.int32(bands[3]),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(fn, PHASH_SCHEMA)


def phash_neardup_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate pairs: aHash signatures within Hamming
    distance ≤ 3 agree exactly on one of the 4 disjoint 16-bit bands
    (the simhash pigeonhole, Manku et al. 2007 — same machinery, image
    payloads instead of token streams), so candidates come from a
    banded equi-join — shuffle is (media, band-key)-bounded, never
    |media|² — and each candidate is verified with bit_count over the
    four band XORs. Output (id_a, id_b, hamming), id_a < id_b.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError("4x16-bit banding proves candidates only for max_hamming <= 3")
    sig = perceptual_hash(media)
    keys = F.array(*[F.col(f"b{k}") for k in range(4)])
    bands = sig.select(
        "media_id", "b0", "b1", "b2", "b3",
        F.posexplode(keys).alias("band", "key"),
    )
    a = bands.select(
        F.col("media_id").alias("id_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
        "band", "key",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
        "band", "key",
    )
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}"))) for k in range(4)
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
