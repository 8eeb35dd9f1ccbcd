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
# The schedule is OLDEST-FIRST (VERDICT r10 #1 — replaced the fixed-arc
# round-robin whose arithmetic let promotions starve a third of the
# registry of fresh rows for six rounds):
#   1. queries whose LATEST driver row is not hash-green (failed or
#      errored) go first, so a fix lands a fresh driver row the very
#      next round instead of waiting a full drain cycle;
#   2. queries that have NEVER had a driver row in any report (new
#      registrations) go next, so new capabilities convert to
#      driver-green promptly;
#   3. everything else is sorted by the round of its NEWEST driver row,
#      ascending (registry order breaks ties) — the stalest attestation
#      is always the next one re-checked. This is self-advancing: the
#      names verified this round carry the newest round stamp and sink
#      to the back automatically, so in promotion-free rounds every
#      name is re-attested within ceil(n/BUDGET) rounds, and unlike the
#      arc scheme a promotion delays only the single stalest name, not
#      a whole arc tail.
# Only failures/absences are promoted (never demoted/hidden on green —
# that was the flaw of the removed green-rotation). All of this is
# computed once at import so the ordering is stable for the lifetime
# of a verify run (ADVICE r3).


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
_FAILED_LAST_ROUND = (
    [
        name
        for name, row in _REPORTS[-1].items()
        if not (isinstance(row, dict) and row.get("hash_match") is True)
    ]
    if _REPORTS
    else []
)
# newest round (1-based file order) in which each name has a driver row
_LAST_CHECKED: dict[str, int] = {}
for _i, _rep in enumerate(_REPORTS, start=1):
    for _name in _rep:
        _LAST_CHECKED[_name] = _i


def _oldest_first(mapping: dict) -> dict:
    names = list(mapping)
    if not names:
        return {}
    failed = [k for k in _FAILED_LAST_ROUND if k in mapping]
    fresh = [
        k for k in names if k not in _LAST_CHECKED and k not in failed
    ]
    promoted = set(failed) | set(fresh)
    order = {k: i for i, k in enumerate(names)}
    rest = sorted(
        (k for k in names if k not in promoted),
        key=lambda k: (_LAST_CHECKED.get(k, 0), order[k]),
    )
    return {k: mapping[k] for k in failed + fresh + rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _oldest_first(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLE)
