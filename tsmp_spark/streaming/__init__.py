from .dedup import dedup_stream
from .floss import floss_stateful
from .packing import pack_stream
from .rollup import rollup_batch_equivalent, rollup_stream
from .sessions import sessionize_stream
from .sketch import hll_stream
from .stompi import stompi_stateful, stompi_update_batch

__all__ = [
    "dedup_stream",
    "floss_stateful",
    "pack_stream",
    "rollup_batch_equivalent",
    "rollup_stream",
    "hll_stream",
    "sessionize_stream",
    "stompi_stateful",
    "stompi_update_batch",
]
