from .manifest import bucket_column, write_partitioned_with_manifests

__all__ = ["bucket_column", "write_partitioned_with_manifests"]
