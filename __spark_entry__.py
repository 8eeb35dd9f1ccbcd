"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementations live in ``matrixinversion_spark``; this
module only re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing these modules populates the registry.
import matrixinversion_spark.relational.queries  # noqa: F401,E402
import matrixinversion_spark.relational.tpch  # noqa: F401,E402
import matrixinversion_spark.relational.tpch_final  # noqa: F401,E402
import matrixinversion_spark.relational.analytics  # noqa: F401,E402
import matrixinversion_spark.relational.asof  # noqa: F401,E402
import matrixinversion_spark.relational.functions  # noqa: F401,E402
import matrixinversion_spark.relational.io  # noqa: F401,E402
import matrixinversion_spark.relational.udf  # noqa: F401,E402
import matrixinversion_spark.relational.merge  # noqa: F401,E402
import matrixinversion_spark.relational.skew  # noqa: F401,E402
import matrixinversion_spark.relational.zorder  # noqa: F401,E402
import matrixinversion_spark.relational.mining  # noqa: F401,E402
import matrixinversion_spark.relational.regress  # noqa: F401,E402
import matrixinversion_spark.relational.profiling  # noqa: F401,E402
import matrixinversion_spark.relational.temporal  # noqa: F401,E402
import matrixinversion_spark.relational.spatial  # noqa: F401,E402
import matrixinversion_spark.relational.infostats  # noqa: F401,E402
import matrixinversion_spark.relational.bloomjoin  # noqa: F401,E402
import matrixinversion_spark.relational.avro_ocf  # noqa: F401,E402

try:  # pipeline/matrix registrations land as they are implemented
    import matrixinversion_spark.pipeline.dedup  # noqa: F401,E402
    import matrixinversion_spark.pipeline.similarity  # noqa: F401,E402
    import matrixinversion_spark.pipeline.text  # noqa: F401,E402
    import matrixinversion_spark.pipeline.multimodal  # noqa: F401,E402
    import matrixinversion_spark.pipeline.ml_lsh  # noqa: F401,E402
    import matrixinversion_spark.pipeline.curation  # noqa: F401,E402
    import matrixinversion_spark.pipeline.corpus  # noqa: F401,E402
except ImportError:
    pass
try:
    import matrixinversion_spark.matrix.queries  # noqa: F401,E402
    import matrixinversion_spark.matrix.cg  # noqa: F401,E402
except ImportError:
    pass

from matrixinversion_spark.registry import ORACLE, QUERIES  # noqa: E402


# The driver verifies a fixed-size prefix of queries() per round, so a
# static order would leave the registry tail permanently unverified.
# The schedule below is a round-robin with two exceptions:
#   1. queries whose LATEST driver row is not hash-green (failed or
#      errored) go first, so a fix lands a fresh driver row the very
#      next round instead of waiting a full rotation cycle;
#   2. queries that have NEVER had a driver row in any report (new
#      registrations) go next, so new capabilities convert to
#      driver-green promptly;
#   3. everything else follows in round-robin order — each round the
#      start offset advances by one equal arc of the registry, so in
#      promotion-free rounds EVERY query gets a driver row at least
#      once every ceil(n/BUDGET) rounds and green rows keep being
#      re-verified (a later regression cannot hide behind an old
#      green row). In rounds WITH promotions the guarantee is
#      best-effort: promoted names consume prefix budget and can push
#      the tail of the current arc past it, delaying those names by
#      up to one extra cycle (r4 ADVICE — accepted: promotions are
#      self-limiting, since a promoted name that goes green stops
#      being promoted next round).
# Only failures/absences are promoted (never demoted/hidden on green —
# that was the flaw of the removed green-rotation), and the budget is
# derived from the observed row count of the newest driver report
# rather than hardcoded (ADVICE r3). All of this is computed once at
# import so the ordering is stable for the lifetime of a verify run
# (ADVICE r3).


def _load_reports() -> list[dict]:
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    reports = []
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                reports.append(json.load(f))
        except (OSError, ValueError):
            reports.append({})
    return reports


_REPORTS = _load_reports()
_ROUND_INDEX = len(_REPORTS)
# Observed driver prefix size (50 in every report so far); floor of 25
# guards against a truncated/corrupt newest report shrinking coverage.
_DRIVER_PREFIX_BUDGET = max(25, len(_REPORTS[-1])) if _REPORTS else 50
_FAILED_LAST_ROUND = (
    [
        name
        for name, row in _REPORTS[-1].items()
        if not (isinstance(row, dict) and row.get("hash_match") is True)
    ]
    if _REPORTS
    else []
)
_EVER_CHECKED = {name for rep in _REPORTS for name in rep}


def _round_robin(mapping: dict) -> dict:
    names = list(mapping)
    n = len(names)
    if n == 0:
        return {}
    arcs = max(1, -(-n // _DRIVER_PREFIX_BUDGET))   # ceil(n/budget)
    stride = -(-n // arcs)                          # ceil(n/arcs)
    off = (_ROUND_INDEX * stride) % n
    rotated = names[off:] + names[:off]
    failed = [k for k in _FAILED_LAST_ROUND if k in mapping]
    fresh = [
        k for k in names if k not in _EVER_CHECKED and k not in failed
    ]
    promoted = failed + fresh
    head = promoted + [k for k in rotated if k not in promoted]
    return {k: mapping[k] for k in head}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _round_robin(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLE)
