from log2sql_spark.store.snapshots import (
    ConflictError,
    Snapshot,
    SnapshotStore,
    invert_changes,
)

__all__ = ["ConflictError", "Snapshot", "SnapshotStore", "invert_changes"]
