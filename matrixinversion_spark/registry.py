"""Query registry: the single inventory behind ``__spark_entry__``.

Every engine capability that is checkable against a SQL oracle is
registered here as a named (spark, sf_dir) -> DataFrame callable plus
(optionally) an equivalent DuckDB SQL string. The driver's correctness
gate runs both sides and hash-compares; ops without SQL-expressible
semantics register with ``oracle=None`` (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB-equivalent ANSI SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
