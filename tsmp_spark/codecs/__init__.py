from .gorilla import (
    delta_of_delta_decode,
    delta_of_delta_encode,
    gorilla_decode,
    gorilla_encode,
    pack_rollup,
    unpack_rollup,
)

__all__ = [
    "delta_of_delta_decode",
    "delta_of_delta_encode",
    "gorilla_decode",
    "gorilla_encode",
    "pack_rollup",
    "unpack_rollup",
]
