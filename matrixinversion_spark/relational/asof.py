"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, ts)`` attaches, to every left row, the
most recent right row with the same keys and ``right.ts <= left.ts``
(backward as-of, inclusive — the semantics of DuckDB/pandas
``ASOF JOIN`` / ``merge_asof``).

Implementation is the scalable union-marker pattern, NOT a range
join: tag both inputs, union them, and carry the right side's payload
forward with ``last(..., ignorenulls=True)`` over a
``(keys, ts, marker)``-ordered running window. Cost is ONE shuffle on
the join keys (the window's partitioning) regardless of how many
right rows precede each left row — a naive ``l.ts >= r.ts`` range
join explodes quadratically per key and then needs an argmax to pick
the latest match. At 100 TB the union-marker plan is the only viable
shape; it is also skew-tolerant (a hot key costs one fat partition,
not a quadratic blowup).

The reference implements no joins at all (SURVEY.md §2.2); this is
part of the mandated query-surface extension (§2.3 item 2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from matrixinversion_spark.registry import query
from matrixinversion_spark.session import read_table

_MARKER = "__asof_side__"
_PAYLOAD = "__asof_payload__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (right.ts <= left.ts, latest wins).

    Returns every left row plus the matched right row's non-key
    columns renamed ``<col><suffix>`` (NULL when no right row
    precedes the left row — i.e. LEFT OUTER as-of semantics; filter
    on ``<ts><suffix> IS NOT NULL`` for INNER).

    The right payload travels as ONE struct and ``last(ignorenulls)``
    carries the whole struct forward, so the output always reflects a
    single matched right row — including that row's genuine NULL
    fields. Carrying columns independently would stitch values from
    different right rows whenever a payload field is NULL (ADVICE r1).
    """
    on = list(on)
    right_payload = [c for c in right.columns if c not in (*on, ts)]
    left_cols = left.columns

    # Right rows sort before left rows at the same timestamp
    # (marker 0 < 1) so an exact-ts right row is visible to the left
    # row — the inclusive `<=` of ASOF semantics.
    payload = F.struct(
        *[F.col(c).alias(c + suffix) for c in right_payload],
        F.col(ts).alias(ts + suffix),
    )
    rhs = right.select(
        *on,
        F.col(ts),
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_MARKER),
    )
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    lhs = left.select(
        *left_cols,
        F.lit(None).cast(rhs.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_MARKER),
    )
    unioned = lhs.select(*left_cols, _PAYLOAD, _MARKER).unionByName(
        rhs.select(*left_cols, _PAYLOAD, _MARKER)
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(_MARKER).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w).alias(_PAYLOAD)
    matched = (
        unioned.select(*left_cols, F.col(_MARKER), carried)
        .filter(F.col(_MARKER) == 1)
    )
    return matched.select(
        *left_cols,
        *[
            F.col(f"{_PAYLOAD}.{c}{suffix}").alias(c + suffix)
            for c in [*right_payload, ts]
        ],
    )


@query(
    "q_asof_join",
    oracle="""
    SELECT p.user_id, p.event_id, v.event_id AS view_event_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior view —
    checked against DuckDB's native ASOF JOIN."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, views, on=["user_id"], ts="ts")
    return joined.filter(F.col("ts_right").isNotNull()).select(
        "user_id",
        "event_id",
        F.col("event_id_right").alias("view_event_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_right"))
        .cast("bigint")
        .alias("gap_s"),
    )


@query(
    "q_asof_tolerance",
    oracle="""
    SELECT p.user_id, p.event_id, v.event_id AS view_event_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    WHERE date_diff('second', v.ts, p.ts) <= 3600
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics, inner form): each
    purchase matched to the user's most recent prior view ONLY if
    that view is at most 1 hour old — the sensor-fusion /
    feature-freshness variant of q_asof_join.

    Same one-shuffle union-marker plan as asof_join (the tolerance
    is a post-match row filter, so the scale shape is unchanged);
    checked against DuckDB's native ASOF JOIN plus the gap filter."""
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase")
    v = e.filter(F.col("event_type") == "view")
    j = asof_join(
        p.select("user_id", "event_id", "ts"),
        v.select("user_id", F.col("event_id").alias("view_event_id"), "ts"),
        on=["user_id"],
        ts="ts",
    )
    gap = F.col("ts").cast("long") - F.col("ts_right").cast("long")
    return (
        j.filter(F.col("ts_right").isNotNull() & (gap <= 3600))
        .select(
            "user_id",
            "event_id",
            F.col("view_event_id_right").alias("view_event_id"),
            gap.alias("gap_s"),
        )
    )
