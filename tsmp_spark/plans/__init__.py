from .compute import analyze, compute

__all__ = ["analyze", "compute"]
