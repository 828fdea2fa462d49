from log2sql_spark.store.snapshots import ConflictError, Snapshot, SnapshotStore

__all__ = ["ConflictError", "Snapshot", "SnapshotStore"]
