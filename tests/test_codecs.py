"""Gorilla XOR / delta-of-delta codecs: lossless round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from tsmp_spark.codecs import (
    delta_of_delta_decode,
    delta_of_delta_encode,
    gorilla_decode,
    gorilla_encode,
    pack_rollup,
    unpack_rollup,
)


def test_gorilla_roundtrip_random():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(500) * 100
    out = gorilla_decode(gorilla_encode(v))
    np.testing.assert_array_equal(out, v)


def test_gorilla_roundtrip_smooth_compresses():
    v = np.round(np.cumsum(np.ones(1000)) * 0.5, 2)
    blob = gorilla_encode(v)
    out = gorilla_decode(blob)
    np.testing.assert_array_equal(out, v)


def test_gorilla_repeated_values():
    v = np.array([1.5, 1.5, 1.5, 2.0, 2.0, 1.5])
    np.testing.assert_array_equal(gorilla_decode(gorilla_encode(v)), v)


def test_gorilla_nan_safe():
    v = np.array([1.0, np.nan, 2.0, np.nan, np.nan])
    out = gorilla_decode(gorilla_encode(v))
    assert np.isnan(out[1]) and np.isnan(out[3]) and np.isnan(out[4])
    assert out[0] == 1.0 and out[2] == 2.0


def test_gorilla_empty():
    assert gorilla_decode(gorilla_encode(np.array([]))).shape[0] == 0


def test_dod_regular_timestamps_tiny():
    """Regular spacing → near-zero marginal bits (the Gorilla claim)."""
    ts = np.arange(0, 100000, 60, dtype=np.int64)
    blob = delta_of_delta_encode(ts)
    np.testing.assert_array_equal(delta_of_delta_decode(blob), ts)
    # ~1 bit per point after the header
    assert len(blob) < ts.shape[0] / 4 + 16


def test_dod_irregular_and_negative():
    rng = np.random.default_rng(4)
    ts = np.cumsum(rng.integers(-5000, 5000, size=300)).astype(np.int64)
    np.testing.assert_array_equal(delta_of_delta_decode(delta_of_delta_encode(ts)), ts)


def test_dod_single_and_empty():
    for arr in ([], [42]):
        ts = np.asarray(arr, dtype=np.int64)
        np.testing.assert_array_equal(delta_of_delta_decode(delta_of_delta_encode(ts)), ts)


def test_pack_rollup_roundtrip():
    rng = np.random.default_rng(9)
    buckets = np.arange(0, 128, dtype=np.int64)
    values = np.round(rng.standard_normal(128) * 10, 4)
    b, v = unpack_rollup(pack_rollup(buckets, values))
    np.testing.assert_array_equal(b, buckets)
    np.testing.assert_array_equal(v, values)


def test_token_shard_bit_level():
    """Shard layout: header fields, little-endian widths, seek-free
    sequence index; decode is exact including empty shards."""
    import struct

    import numpy as np

    from tsmp_spark.codecs import decode_shard, encode_shard

    lengths = np.array([3, 0, 2], dtype=np.int64)
    tokens = np.array([5, -1, 70000, 9, 10], dtype=np.int64)
    blob = encode_shard(lengths, tokens, base_seq_idx=42)
    assert blob[:4] == b"TSHD"
    version, n_seqs, base = struct.unpack("<IIQ", blob[4:20])
    assert (version, n_seqs, base) == (1, 3, 42)
    assert len(blob) == 20 + 4 * 3 + 4 * 5  # header + index + int32 tokens
    b, ls, ts = decode_shard(blob)
    assert b == 42
    assert ls.tolist() == [3, 0, 2]
    assert ts.tolist() == tokens.tolist()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_shard(np.array([2]), np.array([1]))  # inconsistent index
    with _pytest.raises(ValueError):
        decode_shard(b"XXXX" + blob[4:])
