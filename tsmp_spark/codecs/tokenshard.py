"""Binary training-shard codec for packed token sequences — the
``.bin``-style convention trainers memory-map: one blob per
(source, shard) holding the int32 little-endian token stream of all
its fixed-length sequences, preceded by a sequence index (offsets),
so a loader can seek to sequence k without parsing.

Layout (little-endian throughout):
    magic  b"TSHD" | version u32 | n_seqs u32 | base_seq_idx u64
    lengths: n_seqs × u32        (tokens per sequence, in seq order)
    tokens:  Σ lengths × i32

Like ``codecs.gorilla`` this is a pandas-UDF codec: numpy does the
byte work per group; Spark moves blobs, never token rows. Regular
full sequences cost exactly 4 bytes/token + 4 bytes/seq index —
scan-free random access for the trainer, ~order-of-magnitude fewer
rows than a parquet of arrays at shard granularity.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"TSHD"
VERSION = 1


def encode_shard(lengths: np.ndarray, tokens: np.ndarray, base_seq_idx: int = 0) -> bytes:
    """Encode sequences (concatenated ``tokens``, per-sequence
    ``lengths``) into one shard blob."""
    lengths = np.asarray(lengths, dtype="<u4")
    tokens = np.asarray(tokens, dtype="<i4")
    if int(lengths.sum()) != tokens.shape[0]:
        raise ValueError("lengths do not sum to token count")
    header = MAGIC + struct.pack("<IIQ", VERSION, lengths.shape[0], base_seq_idx)
    return header + lengths.tobytes() + tokens.tobytes()


def decode_shard(blob: bytes) -> tuple[int, np.ndarray, np.ndarray]:
    """Decode a shard blob → (base_seq_idx, lengths, tokens)."""
    if blob[:4] != MAGIC:
        raise ValueError("not a token shard blob")
    version, n_seqs, base = struct.unpack("<IIQ", blob[4:20])
    if version != VERSION:
        raise ValueError(f"unsupported shard version {version}")
    off = 20
    lengths = np.frombuffer(blob, dtype="<u4", count=n_seqs, offset=off)
    off += 4 * n_seqs
    tokens = np.frombuffer(blob, dtype="<i4", count=int(lengths.sum()), offset=off)
    return base, lengths, tokens
