"""Session-scoped scratch directories for fixtures and mini-stores.

Oracle/bench queries that need a filesystem side-channel (fixture
dumps, parquet round-trip stores, streaming state) previously called
``tempfile.mkdtemp`` directly, leaking one directory per invocation.
Every scratch dir now lives under ONE per-process root that is removed
``atexit`` — repeated oracle sweeps and bench runs no longer accumulate
temp state, and a crashed run leaves a single tree to clean, not
dozens.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None or not os.path.isdir(_ROOT):
        _ROOT = tempfile.mkdtemp(prefix="log2sql_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the session scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
