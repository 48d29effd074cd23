from .floss import floss_stateful
from .stompi import stompi_stateful, stompi_update_batch

__all__ = ["floss_stateful", "stompi_stateful", "stompi_update_batch"]
