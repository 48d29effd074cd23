from .stompi import stompi_stateful, stompi_update_batch

__all__ = ["stompi_stateful", "stompi_update_batch"]
