from log2sql_spark.store.snapshots import (
    ConflictError,
    Snapshot,
    SnapshotStore,
    invert_changes,
)
from log2sql_spark.store.txn_catalog import StoreCatalog

__all__ = [
    "ConflictError",
    "Snapshot",
    "SnapshotStore",
    "StoreCatalog",
    "invert_changes",
]
