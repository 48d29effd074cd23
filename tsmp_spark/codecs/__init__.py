from .gorilla import (
    delta_of_delta_decode,
    delta_of_delta_encode,
    gorilla_decode,
    gorilla_encode,
    pack_rollup,
    unpack_rollup,
)
from .tokenshard import decode_shard, encode_shard

__all__ = [
    "decode_shard",
    "delta_of_delta_decode",
    "delta_of_delta_encode",
    "encode_shard",
    "gorilla_decode",
    "gorilla_encode",
    "pack_rollup",
    "unpack_rollup",
]
