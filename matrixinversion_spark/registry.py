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
    """Register a query; ``oracle`` is the DuckDB-equivalent ANSI SQL.

    Duplicate names raise: the registry is the driver contract, and a
    silent last-writer-wins would shadow an existing operator without
    any test failing (both implementations pass their own oracle —
    caught the hard way when a round-7 module re-registered a
    round-5 name). Module re-imports are safe (same function object).
    """

    def deco(fn: QueryFn) -> QueryFn:
        prev = QUERIES.get(name)
        if prev is not None and (
            prev.__module__ != fn.__module__
            or prev.__qualname__ != fn.__qualname__
        ):
            raise ValueError(
                f"duplicate query name {name!r}: already registered by "
                f"{prev.__module__}.{prev.__qualname__}"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
