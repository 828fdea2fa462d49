"""Query registry wiring the engine's operators to the driver contract.

Every operator from SURVEY.md §2 registers a named query (PySpark
callable ``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible,
the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes the
registry verbatim.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_query_modules()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_query_modules()
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle is not None}


_LOADED = False


def _load_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their registration side effects.
    from log2sql_spark.queries import (  # noqa: F401
        cdc,
        curation,
        extra,
        graph,
        extra2,
        extra3,
        llm,
        llm_pipeline,
        quality,
        relational,
        search,
        sketch,
        streaming,
        table_format,
        timeseries,
        tpch,
    )

    _LOADED = True
