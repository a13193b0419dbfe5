"""Dataset sources: pruned parquet readers + (stubbed) Lance reader."""

from .tables import read_table

__all__ = ["read_table"]
