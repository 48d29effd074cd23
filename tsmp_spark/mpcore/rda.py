"""Minimal pure-Python reader for R's ``save()`` format (RDX3 / XDR),
covering exactly the subset the reference's ``data/*.rda`` files use:
double/int/logical/string vectors, generic lists, pairlist attributes
(``dim``, ``dimnames``, ``names``, ``class``), symbol references, and the
compact ALTREP integer sequence used for data.frame row names.

Built from the publicly documented R internals serialization layout
(R-ints "Serialization Formats"); no R required. Used only by tests to
replay the reference's exact fixture datasets (mp_toy_data, mp_test_data,
mp_fluss_data, ...) against our kernels so tsmp's published golden values
(test-compute.R:28-31, test-fluss.R:17-37, ...) become executable
assertions here.
"""

from __future__ import annotations

import lzma
import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# SEXP type codes (R internals)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
RAWSXP = 24
ALTREP_SXP = 238
ATTRLISTSXP = 239
ATTRLANGSXP = 240
BASENAMESPACE_SXP = 241
MISSINGARG_SXP = 242
UNBOUNDVALUE_SXP = 243
GLOBALENV_SXP = 253
NILVALUE_SXP = 254
REFSXP = 255

R_NA_INT = -2147483648


@dataclass
class RObj:
    """A parsed R object: numpy/str payload plus attributes."""

    value: Any
    attributes: dict[str, "RObj"] = field(default_factory=dict)

    def attr(self, name: str):
        a = self.attributes.get(name)
        return a.value if a is not None else None


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.i = 0
        self.refs: list[Any] = []

    def u4(self) -> int:
        v = struct.unpack_from(">i", self.b, self.i)[0]
        self.i += 4
        return v

    def read_n(self, n: int) -> bytes:
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def length(self) -> int:
        n = self.u4()
        if n == -1:  # long vector: two ints
            hi, lo = self.u4(), self.u4()
            return (hi << 32) | (lo & 0xFFFFFFFF)
        return n

    def char(self) -> str | None:
        flags = self.u4()
        assert flags & 255 == CHARSXP, f"expected CHARSXP, got {flags & 255}"
        n = self.u4()
        if n == -1:
            return None  # NA_character_
        return self.read_n(n).decode("utf-8", errors="replace")

    def item(self) -> Any:
        flags = self.u4()
        typ = flags & 255
        has_attr = bool(flags & (1 << 9))
        has_tag = bool(flags & (1 << 10))

        if typ == NILVALUE_SXP or typ == NILSXP:
            return None
        if typ == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.u4()
            return self.refs[idx - 1]
        if typ == SYMSXP:
            name = self.char()
            self.refs.append(name)
            return name
        if typ == CHARSXP:
            self.i -= 4
            return self.char()
        if typ == LISTSXP:
            # pairlist node: [attributes][tag] car cdr — returned as a
            # python list of (tag, car)
            out = []
            while True:
                if has_attr:
                    self.item()  # pairlist node attributes: skip
                tag = self.item() if has_tag else None
                car = self.item()
                out.append((tag, car))
                flags = self.u4()
                typ = flags & 255
                if typ in (NILVALUE_SXP, NILSXP):
                    return out
                if typ != LISTSXP:  # next is a non-pairlist tail
                    self.i -= 4
                    out.append((None, self.item()))
                    return out
                has_attr = bool(flags & (1 << 9))
                has_tag = bool(flags & (1 << 10))
        if typ == ALTREP_SXP:
            info = self.item()  # pairlist: (class symbol, package, type)
            state = self.item()
            self.item()  # attributes placeholder (usually NULL)
            cls = info[0][1] if info else None
            if cls == "compact_intseq":
                n, start, by = np.asarray(state.value if isinstance(state, RObj) else state)
                return RObj(np.arange(int(n), dtype=np.int64) * int(by) + int(start))
            if cls == "compact_realseq":
                n, start, by = np.asarray(state.value if isinstance(state, RObj) else state)
                return RObj(np.arange(n) * by + start)
            if cls in ("wrap_real", "wrap_integer", "wrap_string", "wrap_logical"):
                # state = pairlist/list whose first element is the payload
                payload = state[0][1] if isinstance(state, list) else state
                return payload
            raise NotImplementedError(f"ALTREP class {cls}")

        value: Any
        if typ == LGLSXP:
            n = self.length()
            arr = np.frombuffer(self.read_n(4 * n), dtype=">i4").astype(np.int64)
            value = arr
        elif typ == INTSXP:
            n = self.length()
            value = np.frombuffer(self.read_n(4 * n), dtype=">i4").astype(np.int64)
        elif typ == REALSXP:
            n = self.length()
            value = np.frombuffer(self.read_n(8 * n), dtype=">f8").astype(np.float64)
        elif typ == CPLXSXP:
            n = self.length()
            value = np.frombuffer(self.read_n(16 * n), dtype=">c16").astype(np.complex128)
        elif typ == STRSXP:
            n = self.length()
            value = [self.char() for _ in range(n)]
        elif typ == VECSXP:
            n = self.length()
            value = [self.item() for _ in range(n)]
        elif typ == RAWSXP:
            n = self.length()
            value = np.frombuffer(self.read_n(n), dtype=np.uint8)
        else:
            raise NotImplementedError(f"SEXP type {typ}")

        obj = RObj(value)
        if has_attr:
            attrs = self.item()
            for tag, car in attrs or []:
                if tag is not None:
                    obj.attributes[tag] = car if isinstance(car, RObj) else RObj(car)
        # apply dim: column-major reshape like R
        dim = obj.attr("dim")
        if dim is not None and hasattr(obj.value, "reshape"):
            obj.value = obj.value.reshape(tuple(int(d) for d in dim), order="F")
        return obj


def load_rda(path: str) -> dict[str, RObj]:
    """Load an .rda (xz/gzip RDX3) into {name: RObj}."""
    raw = open(path, "rb").read()
    if raw[:2] == b"\xfd7":
        data = lzma.decompress(raw)
    elif raw[:2] == b"\x1f\x8b":
        import gzip

        data = gzip.decompress(raw)
    else:
        data = raw
    assert data[:5] == b"RDX3\n", "only RDA version 3 supported"
    r = _Reader(data[5:])
    fmt = r.read_n(2)
    assert fmt == b"X\n", "only XDR serialization supported"
    r.u4()  # version
    r.u4()  # writer
    r.u4()  # min reader
    enc_len = r.u4()
    r.read_n(enc_len)  # native encoding name
    top = r.item()  # pairlist name -> object
    out: dict[str, RObj] = {}
    for tag, car in top or []:
        if tag is not None:
            out[tag] = car if isinstance(car, RObj) else RObj(car)
    return out


def r_list_as_dict(obj: RObj) -> dict[str, Any]:
    """VECSXP with names attribute → {name: element}."""
    names = obj.attr("names") or []
    return {n: v for n, v in zip(names, obj.value)}
