"""Gorilla-style XOR compression for float columns and delta-of-delta
(Gorilla timestamp) compression for integer bucket columns — the packed
representation of rolled-up points (north rule).

Based on the public Gorilla paper (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015) §4.1: XOR each value
with its predecessor, store leading-zero count + meaningful bits; timestamps
as second-order deltas with variable-width classes.

Pure-numpy bit packing, run inside pandas UDFs (``pack_rollup``) so rolled
rows travel as one ``binary`` cell per (series, tier) — at 100 TB this is
what keeps cold tiers cheap to store and scan.

This is a from-scratch implementation of the published format idea, not a
byte-compatible Gorilla reader.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self) -> bytes:
        pad = (-len(self.bits)) % 8
        bits = self.bits + [0] * pad
        arr = np.asarray(bits, dtype=np.uint8).reshape(-1, 8)
        return np.packbits(arr, axis=1).tobytes()


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            out = (out << 1) | int(self.bits[self.pos])
            self.pos += 1
        return out


def gorilla_encode(values: np.ndarray) -> bytes:
    """XOR float compression (Gorilla §4.1.2). NaN-safe (NaN encodes as its
    IEEE bit pattern)."""
    v = np.asarray(values, dtype=np.float64)
    bits = v.view(np.uint64)
    w = _BitWriter()
    w.write(int(v.shape[0]), 32)
    if v.shape[0] == 0:
        return w.to_bytes()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_mean = -1, -1
    for x in bits[1:]:
        x = int(x)
        xor = prev ^ x
        if xor == 0:
            w.write(0, 1)
        else:
            w.write(1, 1)
            lead = 64 - int(xor).bit_length()
            lead = min(lead, 31)
            trail = (xor & -xor).bit_length() - 1
            mean = 64 - lead - trail
            if prev_lead >= 0 and lead >= prev_lead and (prev_lead + prev_mean) >= (64 - trail):
                # fits inside the previous meaningful window: control bit 0
                w.write(0, 1)
                w.write(xor >> (64 - prev_lead - prev_mean), prev_mean)
            else:
                w.write(1, 1)
                w.write(lead, 5)
                w.write(mean - 1, 6)  # mean in [1, 64]
                w.write(xor >> trail, mean)
                prev_lead, prev_mean = lead, mean
        prev = x
    return w.to_bytes()


def gorilla_decode(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mean = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mean = r.read(6) + 1
        xor = r.read(mean) << (64 - lead - mean)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


def delta_of_delta_encode(ts: np.ndarray) -> bytes:
    """Second-order delta with Gorilla's variable-width classes
    (§4.1.1: {0} / 7 / 9 / 12 / 32 bits)."""
    t = np.asarray(ts, dtype=np.int64)
    w = _BitWriter()
    w.write(int(t.shape[0]), 32)
    if t.shape[0] == 0:
        return w.to_bytes()
    w.write(int(t[0]) & ((1 << 64) - 1), 64)
    if t.shape[0] == 1:
        return w.to_bytes()
    first_delta = int(t[1] - t[0])
    w.write(first_delta & ((1 << 64) - 1), 64)
    prev_delta = first_delta
    for i in range(2, t.shape[0]):
        delta = int(t[i] - t[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write((dod + 63) & 0x7F, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write((dod + 255) & 0x1FF, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write((dod + 2047) & 0xFFF, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.to_bytes()


def delta_of_delta_decode(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    v = r.read(64)
    out[0] = np.int64(np.uint64(v))
    if n == 1:
        return out
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def pack_rollup(buckets: np.ndarray, values: np.ndarray) -> bytes:
    """One (series, tier) rollup row-group → single binary blob:
    delta-of-delta buckets ++ Gorilla values, length-prefixed."""
    b = delta_of_delta_encode(buckets)
    v = gorilla_encode(values)
    return len(b).to_bytes(4, "big") + b + v


def unpack_rollup(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    blen = int.from_bytes(blob[:4], "big")
    return (
        delta_of_delta_decode(blob[4 : 4 + blen]),
        gorilla_decode(blob[4 + blen :]),
    )
