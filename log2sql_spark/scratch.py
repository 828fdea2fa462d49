"""Session-scoped scratch directories for fixtures and mini-stores.

Oracle/bench queries that need a filesystem side-channel (fixture
dumps, parquet round-trip stores, streaming state) previously called
``tempfile.mkdtemp`` directly, leaking one directory per invocation.
Every scratch dir now lives under ONE per-process root that is removed
``atexit`` — repeated oracle sweeps and bench runs no longer accumulate
temp state, and a crashed run leaves a single tree to clean, not
dozens.

Cluster requirement: several operators use scratch paths as LINEAGE
BARRIERS — they write a parquet checkpoint that executors then read
back (iterative PageRank ``queries/graph.py``, the IVF index builder
``operators/ann_index.py``, CDC fixture dumps). In ``local[N]`` mode
the default tempdir works because driver and "executors" share a
filesystem; on a real multi-node cluster the barrier path MUST be on
storage every node can reach (HDFS/S3/NFS mount). Set
``SPARK_GRAFT_SCRATCH_DIR`` to such a shared location — the same
deployment note as the ``.sql`` sink's shared-FS requirement
(sources/binlog_datasource.py).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ENV = "SPARK_GRAFT_SCRATCH_DIR"
_ROOT: str | None = None


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None or not os.path.isdir(_ROOT):
        base = os.environ.get(_ENV)
        if base:
            os.makedirs(base, exist_ok=True)
            _ROOT = tempfile.mkdtemp(prefix="log2sql_scratch_", dir=base)
        else:
            _ROOT = tempfile.mkdtemp(prefix="log2sql_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the session scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
