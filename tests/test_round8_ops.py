"""Round-8 additions: prefix_sum grand totals + inline offsets,
plan-shape pins for the top-k samplers, the stats-barrier fallback
warning, bloom filter key-type guard, and the near-dup split-leakage
audit."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from matrixinversion_spark.relational.profiling import prefix_sum

from .conftest import SF_DIR


def test_prefix_sum_grand_total_multi(spark):
    rows = [(i, i % 7, (i * 3) % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "k INT, a INT, b INT").repartition(6)
    out = prefix_sum(
        df,
        [F.col("k").asc()],
        ["a", "b"],
        out_col=["ca", "cb"],
        n_parts=5,
        grand_total_col=["ta", "tb"],
    )
    got = out.collect()
    exp_a = sum(r[1] for r in rows)
    exp_b = sum(r[2] for r in rows)
    assert all(r["ta"] == exp_a and r["tb"] == exp_b for r in got)
    # the grand total equals the last running value
    last = max(got, key=lambda r: r["k"])
    assert last["ca"] == exp_a and last["cb"] == exp_b


def test_prefix_sum_grand_total_exact_bigint(spark):
    # integer totals must stay BIGINT (exact past 2^53)
    big = 1 << 55
    df = spark.createDataFrame(
        [(0, big), (1, big + 1)], "k INT, v LONG"
    )
    out = prefix_sum(
        df, [F.col("k")], "v", out_col="c", grand_total_col="t", n_parts=2
    )
    assert dict(out.dtypes)["t"] == "bigint"
    assert out.agg(F.max("t")).collect()[0][0] == 2 * big + 1


def test_prefix_sum_multi_rejects_str_out_col(spark):
    df = spark.createDataFrame([(1, 2, 3)], "k INT, a INT, b INT")
    with pytest.raises(ValueError, match="out_col"):
        prefix_sum(df, [F.col("k")], ["a", "b"])  # default str out_col
    with pytest.raises(ValueError, match="grand_total_col"):
        prefix_sum(
            df,
            [F.col("k")],
            ["a", "b"],
            out_col=["x", "y"],
            grand_total_col="t",
        )


def test_prefix_sum_wide_partition_join_fallback(spark):
    # past _INLINE_OFFSET_MAX partitions the offsets ride a broadcast
    # join instead of a literal CASE — same answer either way
    from matrixinversion_spark.relational import profiling

    rows = [(i, 1) for i in range(400)]
    df = spark.createDataFrame(rows, "k INT, v INT").repartition(4)
    out = prefix_sum(df, [F.col("k").asc()], "v", n_parts=300)
    got = {r["k"]: r["cum"] for r in out.collect()}
    assert got[0] == 1 and got[399] == 400
    assert 300 > profiling._INLINE_OFFSET_MAX


def test_bloom_mixed_int_widths_no_false_negatives(spark):
    """INT probe vs BIGINT build (and vice versa) must still honor
    the no-false-negatives guarantee: both sides widen to bigint
    before hashing (xxhash64 is type-sensitive)."""
    from matrixinversion_spark.relational.bloomjoin import bloom_semi_filter

    probe = spark.createDataFrame(
        [(i,) for i in range(2000)], "k INT"
    )
    build = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 7)], "bk BIGINT"
    )
    kept = {
        r["k"]
        for r in bloom_semi_filter(probe, "k", build, "bk").collect()
    }
    members = set(range(0, 2000, 7))
    assert members <= kept  # zero false negatives


def test_bloom_incompatible_key_types_raise(spark):
    from matrixinversion_spark.relational.bloomjoin import bloom_semi_filter

    probe = spark.createDataFrame([("1",)], "k STRING")
    build = spark.createDataFrame([(1,)], "bk BIGINT")
    with pytest.raises(ValueError, match="incompatible"):
        bloom_semi_filter(probe, "k", build, "bk")


def test_bloom_no_cache_leak_small_filter(spark):
    """Normal sizings ship the words as a local relation: no new
    persisted RDDs accumulate across invocations."""
    from matrixinversion_spark.relational import bloomjoin

    probe = spark.range(0, 5000).withColumnRenamed("id", "k")
    build = spark.range(0, 500).withColumnRenamed("id", "bk")
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    for _ in range(3):
        bloomjoin.bloom_semi_filter(probe, "k", build, "bk").count()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after == before
    assert not bloomjoin._ACTIVE_BLOOM_CACHES
