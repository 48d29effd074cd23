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


def test_simple8b_roundtrip_fuzz():
    from tsmp_spark.codecs.simple8b import simple8b_decode, simple8b_encode

    rng = np.random.default_rng(7)
    for trial in range(100):
        n = int(rng.integers(0, 500))
        mag = int(rng.integers(0, 59))
        v = rng.integers(0, max(1, 2 ** mag), n).astype(np.int64)
        if n and rng.random() < 0.3:
            v[rng.integers(0, n, size=n // 3)] = 0
        out = simple8b_decode(simple8b_encode(v))
        np.testing.assert_array_equal(out, v)


def test_simple8b_selector_boundaries_and_range():
    from tsmp_spark.codecs.simple8b import (
        SELECTORS, simple8b_decode, simple8b_encode,
    )

    # exact width-boundary values per selector class survive
    for _, bits in SELECTORS:
        if bits == 0:
            continue
        v = np.array([(1 << bits) - 1, 0, 1], dtype=np.int64)
        np.testing.assert_array_equal(simple8b_decode(simple8b_encode(v)), v)
    v = np.array([0, (1 << 60) - 1], dtype=np.int64)
    np.testing.assert_array_equal(simple8b_decode(simple8b_encode(v)), v)
    with pytest.raises(ValueError):
        simple8b_encode(np.array([1 << 60], dtype=np.int64))
    with pytest.raises(ValueError):
        simple8b_encode(np.array([-1], dtype=np.int64))


def test_simple8b_zero_runs_compress_and_determinism():
    from tsmp_spark.codecs.simple8b import simple8b_encode, simple8b_decode

    zeros = np.zeros(960, dtype=np.int64)
    blob = simple8b_encode(zeros)
    # 4 words of 240 zeros + 8-byte header: 0.04 bits/value
    assert len(blob) == 8 + 4 * 8
    np.testing.assert_array_equal(simple8b_decode(blob), zeros)
    assert blob == simple8b_encode(zeros)


def test_simple8b_sorted_seconds_wrapper():
    from tsmp_spark.codecs.simple8b import (
        pack_sorted_seconds, unpack_sorted_seconds,
    )

    s = np.int64(1_700_000_000) + np.arange(0, 3600, 3, dtype=np.int64)
    blob = pack_sorted_seconds(s)
    np.testing.assert_array_equal(unpack_sorted_seconds(blob), s)
    # regular cadence: small constant deltas pack ~20 values/word
    assert len(blob) < s.size  # way under 8 bytes/value
    np.testing.assert_array_equal(
        unpack_sorted_seconds(pack_sorted_seconds(np.array([5], np.int64))),
        np.array([5], np.int64),
    )
    assert unpack_sorted_seconds(
        pack_sorted_seconds(np.empty(0, np.int64))
    ).size == 0
    with pytest.raises(ValueError):
        pack_sorted_seconds(np.array([3, 1], dtype=np.int64))
