from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from log2sql_spark import get_spark

    s = get_spark("log2sql_spark_tests", cpus="4")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture(params=["heap", "rocksdb"])
def state_provider(request, spark):
    """Parametrize a stateful-streaming test over BOTH state store
    providers (VERDICT r11 #6): the default HDFS-backed heap provider
    and RocksDB — the at-scale backend (heap state dies at 100 TB key
    spaces). Any stateful operator accidentally coupled to heap-only
    assumptions (serialization quirks, eviction timing, column-family
    use) fails here instead of on the first real cluster deploy."""
    prev = spark.conf.get(_PROVIDER_CONF, None)
    if request.param == "rocksdb":
        spark.conf.set(_PROVIDER_CONF, _ROCKSDB_PROVIDER)
    else:
        spark.conf.unset(_PROVIDER_CONF)
    yield request.param
    if prev is None:
        spark.conf.unset(_PROVIDER_CONF)
    else:
        spark.conf.set(_PROVIDER_CONF, prev)
