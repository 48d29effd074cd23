from .checkpoint import CheckpointedJob, run_partitioned

__all__ = ["CheckpointedJob", "run_partitioned"]
