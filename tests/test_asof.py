"""asof_join semantics: inclusive match, latest-wins, left-outer."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from matrixinversion_spark.relational.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 10.0),
            ("A", _ts("2024-01-01 09:05:00"), 11.0),
            ("A", _ts("2024-01-01 09:10:00"), 12.0),
            ("B", _ts("2024-01-01 09:00:00"), 100.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:05:00"), 5),   # exact ts → inclusive match 11.0
            ("A", _ts("2024-01-01 09:07:00"), 6),   # between → 11.0
            ("A", _ts("2024-01-01 08:59:00"), 7),   # before any quote → NULL
            ("B", _ts("2024-01-01 10:00:00"), 8),   # latest (only) B quote
            ("C", _ts("2024-01-01 09:00:00"), 9),   # key with no quotes → NULL
        ],
        "sym string, ts timestamp, qty int",
    )
    out = {
        r["qty"]: r["px_right"]
        for r in asof_join(trades, quotes, on=["sym"], ts="ts").collect()
    }
    assert out == {5: 11.0, 6: 11.0, 7: None, 8: 100.0, 9: None}


def test_asof_join_matched_row_nulls_stay_together(spark):
    """A NULL field in the matched right row must surface as NULL, not
    get backfilled from an OLDER right row (ADVICE r1: per-column
    carry stitched values from different rows; the struct carry keeps
    the matched row atomic)."""
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 10.0, "early"),
            # latest match has px = NULL — that NULL must win
            ("A", _ts("2024-01-01 09:05:00"), None, "late"),
        ],
        "sym string, ts timestamp, px double, tag string",
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:06:00"), 1)],
        "sym string, ts timestamp, qty int",
    )
    [row] = asof_join(trades, quotes, on=["sym"], ts="ts").collect()
    assert row["tag_right"] == "late"
    assert row["px_right"] is None  # NOT 10.0 from the "early" row


def test_asof_join_single_shuffle(spark):
    """The plan must contain exactly one exchange (the window's key
    partitioning) — the property that makes it viable at scale."""
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lv"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        (F.col("id") * 2).alias("rv"),
    )
    plan = (
        asof_join(left, right, on=["k"], ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
