from __future__ import annotations

from pyspark.sql import functions as F

from matrixinversion_spark.relational.profiling import (
    prefix_sum,
    q_rolling_zscore,
    q_scd2_intervals,
    q_winsorize,
)

from .conftest import SF_DIR


def test_prefix_sum_matches_sequential(spark):
    # 1000 values in a shuffled layout; the distributed prefix sum
    # must equal the sequential running total over the sort order.
    rows = [(i, float((i * 37) % 101)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k INT, v DOUBLE").repartition(8)
    out = prefix_sum(df, [F.col("k").asc()], "v", n_parts=7)
    got = {r["k"]: r["cum"] for r in out.collect()}
    running = 0.0
    for k, v in rows:
        running += v
        assert abs(got[k] - running) < 1e-9 * max(1.0, running)


def test_prefix_sum_descending_order(spark):
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "k INT, v DOUBLE"
    )
    out = prefix_sum(df, [F.col("k").desc()], "v", n_parts=4)
    got = {r["k"]: r["cum"] for r in out.collect()}
    # descending order: k=99 is first (cum=1), k=0 last (cum=100)
    assert got[99] == 1.0 and got[0] == 100.0


def test_scd2_intervals_contiguous(spark):
    out = q_scd2_intervals(spark, SF_DIR).collect()
    by_cust: dict[int, list] = {}
    for r in out:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for rows in by_cust.values():
        rows.sort(key=lambda r: (r["valid_from"], r["valid_to"] or "~"))
        # exactly one open (current) interval per customer
        assert sum(1 for r in rows if r["is_current"]) == 1
        assert rows[-1]["valid_to"] is None
        # each interval ends where the next begins (no gaps/overlap)
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
        # consecutive intervals always change the tracked value
        for a, b in zip(rows, rows[1:]):
            assert a["priority"] != b["priority"]


def test_winsorize_invariants(spark):
    for r in q_winsorize(spark, SF_DIR).collect():
        assert r["p05"] <= r["p95"]
        # ~5% clipped on each side (exact percentile ⇒ tight bound)
        assert r["n_clipped_low"] <= 0.06 * r["n"] + 1
        assert r["n_clipped_high"] <= 0.06 * r["n"] + 1
        # winsorized mean is pulled toward the middle or unchanged
        assert r["mean_winsor"] >= r["p05"] - 1e-6
        assert r["mean_winsor"] <= r["p95"] + 1e-6


def test_rolling_zscore_bounds(spark):
    for r in q_rolling_zscore(spark, SF_DIR).collect():
        assert r["anomalies"] <= r["n_scored"]
        assert r["max_abs_z"] >= 0.0


def test_interval_merge_bounds(spark):
    from matrixinversion_spark.relational.profiling import q_interval_merge

    rows = q_interval_merge(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # every merged span is at least one 30-min interval long
        assert r["covered_s"] >= 1800 * r["n_spans"] - 1
        assert r["n_spans"] >= 1


def test_weighted_median_within_range(spark):
    from matrixinversion_spark.relational.profiling import (
        q_weighted_median,
        q_winsorize,
    )

    wm = {r["l_returnflag"]: r["weighted_median"]
          for r in q_weighted_median(spark, SF_DIR).collect()}
    rng = {r["l_returnflag"]: r for r in q_winsorize(spark, SF_DIR).collect()}
    for k, v in wm.items():
        # a median (weighted or not) sits inside the p05..p95 band
        assert rng[k]["p05"] <= v <= rng[k]["p95"]


def test_drift_psi_shares_sum_to_one(spark):
    from matrixinversion_spark.relational.profiling import q_drift_psi

    rows = q_drift_psi(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 10
    n_ref = sum(r["n_ref"] for r in rows)
    n_cur = sum(r["n_cur"] for r in rows)
    assert n_ref > 0 and n_cur > 0
    # median split ⇒ halves within one row of each other
    assert abs(n_ref - n_cur) <= 1


def test_prefix_sum_plan_no_single_partition_window(spark):
    """The scale claim in the prefix_sum docstring, pinned: the plan
    must contain a RangePartitioning exchange and its window must be
    partitioned (by _pid) — never the SinglePartition funnel that
    Window.orderBy-without-partitionBy produces."""
    df = spark.range(0, 10_000).selectExpr(
        "id AS k", "CAST(id % 97 AS DOUBLE) AS v"
    )
    from matrixinversion_spark.relational.profiling import _ranged_running

    # the distributed stage (pre-checkpoint — the checkpoint that
    # pins range boundaries truncates the downstream visible plan)
    local = _ranged_running(df, [F.col("k").asc()], "v", 8)
    plan = local._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "singlepartition" not in plan.lower()
    # and the full operator still computes the right thing end-to-end
    out = prefix_sum(df, [F.col("k").asc()], "v", n_parts=8)
    last = out.orderBy(F.col("k").desc()).limit(1).collect()[0]
    expect = sum(i % 97 for i in range(10_000))
    assert abs(last["cum"] - expect) < 1e-6


def test_mad_less_than_stddev_scale(spark):
    from matrixinversion_spark.relational.profiling import q_mad_robust

    for r in q_mad_robust(spark, SF_DIR).collect():
        assert r["mad"] > 0
        assert abs(r["sigma_robust"] - r["mad"] * 1.4826) < 1e-3
        # deviations are centered on the median, so MAD <= max dev
        assert r["mad"] <= r["median"] * 10
