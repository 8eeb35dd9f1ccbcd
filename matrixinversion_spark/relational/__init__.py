"""Relational query surface (scan/filter/join/agg/window/set-ops/functions).

The reference implements none of these (SURVEY.md §2.2 — it is a
matrix engine); this package supplies the full relational capability
surface mandated by SURVEY.md §2.3, expressed declaratively on the
DataFrame API so Catalyst does pushdown, pruning, join planning, and
AQE does runtime re-planning.
"""

from matrixinversion_spark.relational import analytics, asof, functions, io, queries, tpch, udf  # noqa: F401  (registers)
