"""Simple8b 64-bit integer packing (Anh & Moffat, "Index compression
using 64-bit words", Softw. Pract. Exper. 2010) — the integer codec
InfluxDB/TSM uses for timestamp deltas, complementing the Gorilla
XOR/delta-of-delta bitstream (codecs/gorilla.py) with a WORD-aligned
scheme: every output word is 4 selector bits + 60 payload bits holding
a fixed count of fixed-width values.

Selector table (count × bits, count·bits ≤ 60)::

    (240,0) (120,0) (60,1) (30,2) (20,3) (15,4) (12,5) (10,6)
    (8,7) (7,8) (6,10) (5,12) (4,15) (3,20) (2,30) (1,60)

Encoding is the standard GREEDY largest-count-first scan: at each
position pick the first selector whose count fits the remaining values
and whose next ``count`` values all fit its bit width (the two 0-bit
run selectors require that many literal zeros). Deterministic — same
input, same words — and self-describing per word, so decode needs only
the value-count header.

Values must be in ``[0, 2^60)``; timestamp DELTAS of a sorted series
are (callers zigzag anything signed). Layout: 8-byte big-endian value
count, then 8-byte big-endian words.
"""

from __future__ import annotations

import struct

import numpy as np

#: (count, bits) per selector index, in encode preference order.
SELECTORS: tuple[tuple[int, int], ...] = (
    (240, 0), (120, 0), (60, 1), (30, 2), (20, 3), (15, 4), (12, 5),
    (10, 6), (8, 7), (7, 8), (6, 10), (5, 12), (4, 15), (3, 20),
    (2, 30), (1, 60),
)

_MAX = 1 << 60


def simple8b_encode(values: np.ndarray) -> bytes:
    """Pack a non-negative int64 array into simple8b words."""
    v = np.asarray(values, dtype=np.int64)
    if v.size and (int(v.min()) < 0 or int(v.max()) >= _MAX):
        raise ValueError("simple8b values must be in [0, 2^60)")
    out = [struct.pack(">Q", v.size)]
    i, n = 0, int(v.size)
    vals = [int(x) for x in v]
    while i < n:
        for sel, (count, bits) in enumerate(SELECTORS):
            if count > n - i:
                continue
            chunk = vals[i : i + count]
            if bits == 0:
                if any(chunk):
                    continue
            elif max(chunk) >= (1 << bits):
                continue
            word = sel << 60
            if bits:
                shift = 0
                for x in chunk:
                    word |= x << shift
                    shift += bits
            out.append(struct.pack(">Q", word))
            i += count
            break
        else:  # pragma: no cover - (1,60) always fits by the range check
            raise AssertionError("no selector fits")
    return b"".join(out)


def simple8b_decode(data: bytes) -> np.ndarray:
    """Unpack simple8b words back to the original int64 array."""
    (n,) = struct.unpack_from(">Q", data, 0)
    vals: list[int] = []
    off = 8
    while len(vals) < n:
        (word,) = struct.unpack_from(">Q", data, off)
        off += 8
        sel = word >> 60
        count, bits = SELECTORS[sel]
        if bits == 0:
            vals.extend([0] * count)
        else:
            mask = (1 << bits) - 1
            payload = word & (_MAX - 1)
            for k in range(count):
                vals.append((payload >> (k * bits)) & mask)
    return np.asarray(vals[: int(n)], dtype=np.int64)


def pack_sorted_seconds(secs: np.ndarray) -> bytes:
    """Sorted epoch seconds → 8-byte value count, then (unless empty)
    8-byte first value + simple8b deltas."""
    s = np.asarray(secs, dtype=np.int64)
    head = struct.pack(">Q", int(s.size))
    if s.size == 0:
        return head
    d = np.diff(s)
    if d.size and int(d.min()) < 0:
        raise ValueError("seconds must be sorted ascending")
    return head + struct.pack(">q", int(s[0])) + simple8b_encode(d)


def unpack_sorted_seconds(blob: bytes) -> np.ndarray:
    """Inverse of :func:`pack_sorted_seconds`."""
    (n,) = struct.unpack_from(">Q", blob, 0)
    if n == 0:
        return np.empty(0, np.int64)
    (first,) = struct.unpack_from(">q", blob, 8)
    d = simple8b_decode(blob[16:])
    return first + np.concatenate([[0], np.cumsum(d)]).astype(np.int64)
