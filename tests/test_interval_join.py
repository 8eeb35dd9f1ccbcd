"""Interval join: correctness vs naive theta join + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from matrixinversion_spark.registry import QUERIES
import matrixinversion_spark.relational.queries  # noqa: F401 — registers
from matrixinversion_spark.session import read_table
from tests.conftest import SF_DIR


def test_matches_naive_theta_join(spark):
    """The binned equi-join must agree with the obvious theta join."""
    got = {
        r["incident_id"]: (r["n_events"], r["total_value"])
        for r in QUERIES["q_interval_join"](spark, SF_DIR).collect()
    }
    e = read_table(spark, SF_DIR, "events")
    inc = e.filter(
        (F.col("event_type") == "error") & (F.col("value") > 150)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + 15 * 60 * 1_000_000).alias("e_us"),
    )
    pts = e.select(F.unix_micros("ts").alias("p_us"), "value")
    naive = (
        inc.join(pts, (pts.p_us >= inc.s_us) & (pts.p_us < inc.e_us))
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    want = {
        r["incident_id"]: (r["n_events"], r["total_value"])
        for r in naive.collect()
    }
    assert got == want and len(got) > 0


def test_no_nested_loop_even_without_broadcast(spark):
    """With broadcast disabled (the 100 TB big×big regime) the plan
    must degrade to a distributed equi join on the bucket — never a
    BroadcastNestedLoopJoin / CartesianProduct."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q_interval_join"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
