"""Property tests for the round-7 operators: statistical audits
(entropy/Gini/KS/apportionment/Welch/Mann-Whitney), the bloom join
prefilter, the corpus-governance additions (split-leakage audit,
SPS sampling, bigram conditional probabilities), and the
conjugate-gradient solver."""

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  (populates the query registry)
from matrixinversion_spark.registry import QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from matrixinversion_spark.session import get_spark

    s = get_spark()
    yield s


def test_allocation_sums_exactly_to_budget(spark):
    """Largest-remainder allocations are integers summing EXACTLY to
    the budget, each within 1 unit of its real quota."""
    rows = QUERIES["q_allocation_lrm"](spark, SF).collect()
    total_alloc = sum(r["alloc"] for r in rows)
    assert total_alloc == 1_000_000
    tot_cnt = sum(r["cnt"] for r in rows)
    for r in rows:
        quota = 1_000_000 * r["cnt"] / tot_cnt
        assert math.floor(quota) <= r["alloc"] <= math.floor(quota) + 1


def test_entropy_bounds(spark):
    """Hour-of-day entropy lies in [0, ln(n_bins)] for every type."""
    for r in QUERIES["q_entropy_by_type"](spark, SF).collect():
        assert 0.0 <= r["entropy_nats"] <= math.log(r["n_bins"]) + 1e-9


def test_gini_bounds(spark):
    g = QUERIES["q_gini_spend"](spark, SF).collect()[0]
    assert 0.0 <= g["gini"] < 1.0
    assert g["n_customers"] > 0


def test_ks_bounds(spark):
    r = QUERIES["q_ks_2sample"](spark, SF).collect()[0]
    assert 0.0 <= r["ks_d"] <= 1.0
    assert r["n1"] > 0 and r["n2"] > 0


def test_prefix_sum_multi_matches_single(spark):
    """The shared-shuffle multi-column prefix_sum equals two
    independent single-column runs."""
    from matrixinversion_spark.relational.profiling import prefix_sum

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("bigint").alias("x"),
        (F.col("id") % 11).cast("bigint").alias("y"),
    )
    multi = {
        r["k"]: (r["cx"], r["cy"])
        for r in prefix_sum(
            df, [F.col("k")], ["x", "y"], out_col=["cx", "cy"]
        ).collect()
    }
    sx = {
        r["k"]: r["cum"]
        for r in prefix_sum(df, [F.col("k")], "x").collect()
    }
    sy = {
        r["k"]: r["cum"]
        for r in prefix_sum(df, [F.col("k")], "y").collect()
    }
    assert len(multi) == 5000
    for k, (cx, cy) in multi.items():
        assert cx == sx[k] and cy == sy[k]


def test_bloom_no_false_negatives_and_selective(spark):
    """Bloom prefilter keeps EVERY true member (no false negatives)
    and kills almost all non-members (measured FPR under 2% at
    16 bits/key, k=3)."""
    from matrixinversion_spark.relational.bloomjoin import (
        bloom_semi_filter,
    )

    build = spark.range(0, 2000).select(
        (F.col("id") * 3).alias("bk")
    )  # members: multiples of 3 in [0, 6000)
    probe = spark.range(0, 20000).select(F.col("id").alias("pk"))
    kept = {
        r["pk"]
        for r in bloom_semi_filter(
            probe, "pk", build, "bk", bits_per_key=16, k=3
        ).collect()
    }
    members = {3 * i for i in range(2000)}
    probed_members = {m for m in members if m < 20000}
    assert probed_members <= kept  # zero false negatives
    non_members = 20000 - len(probed_members)
    fpr = (len(kept) - len(probed_members)) / non_members
    assert fpr < 0.02, fpr


def test_bloom_query_matches_plain_join(spark):
    """The registered bloom query equals the same aggregation with
    no prefilter at all (the filter is semantically invisible)."""
    from matrixinversion_spark.session import read_table

    got = {
        (r["yr"], r["n_items"], r["revenue"])
        for r in QUERIES["q_bloom_prefilter_join"](spark, SF).collect()
    }
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    want = {
        (r["yr"], r["n_items"], r["revenue"])
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_leakage_audit_covers_heldout_and_bounds(spark):
    """The audit's held-out doc counts equal p_hash_split's
    validation+test counts exactly (same bucketing), and leaks are
    bounded by docs."""
    leak = {
        r["split"]: r
        for r in QUERIES["p_split_leakage_audit"](spark, SF).collect()
    }
    split = {
        r["split"]: r for r in QUERIES["p_hash_split"](spark, SF).collect()
    }
    assert set(leak) == {"validation", "test"}
    for s in ("validation", "test"):
        assert leak[s]["n_docs"] == split[s]["n_docs"]
        assert 0 <= leak[s]["n_leaked"] <= leak[s]["n_docs"]


def test_sps_sample_is_size_biased(spark):
    """Exactly k rows, and the sample's mean doc length exceeds the
    corpus mean (the whole point of weight-proportional sampling)."""
    from matrixinversion_spark.session import read_table

    rows = QUERIES["p_weighted_sample_sps"](spark, SF).collect()
    assert len(rows) == 100
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = (
        read_table(spark, SF, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_bigram_lm_probabilities(spark):
    """cond_p in (0, 1]; counts positive and non-increasing in the
    top-k ordering."""
    rows = QUERIES["p_bigram_lm"](spark, SF).collect()
    assert len(rows) == 50
    assert all(0.0 < r["cond_p"] <= 1.0 for r in rows)
    cs = [r["c"] for r in rows]
    assert cs == sorted(cs, reverse=True)


def test_association_rules_metrics_consistent(spark):
    """Confidence in (0,1]; lift symmetric consistency:
    lift = conf_1_2 / P(p2) = conf_2_1 / P(p1)."""
    rows = QUERIES["q_association_rules"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows[:200]:
        assert 0.0 < r["conf_1_2"] <= 1.0
        assert 0.0 < r["conf_2_1"] <= 1.0
        assert r["lift"] > 0.0


def test_cg_matches_numpy_solve(spark):
    """Distributed CG == numpy.linalg.solve on a seeded SPD system,
    and the iteration count stays far below the dimension (the
    well-conditioned regime CG exists for)."""
    import numpy as np

    from matrixinversion_spark.matrix import ops
    from matrixinversion_spark.matrix.cg import cg_solve
    from matrixinversion_spark.matrix.core import BlockMatrixFrame

    rng = np.random.default_rng(11)
    n, bs = 128, 32
    m = rng.uniform(size=(n, n))
    a_np = 0.5 * (m + m.T) + n * np.eye(n)
    b_np = rng.uniform(size=(n, 1))
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=bs)
    b = BlockMatrixFrame.from_numpy(spark, b_np, block_size=bs)
    x, iters, rnorm = cg_solve(a, b, tol=1e-12)
    want = np.linalg.solve(a_np, b_np)
    got = x.to_numpy()
    assert np.max(np.abs(got - want)) < 1e-9
    assert iters < n // 2, iters
    resid = ops.max_abs_diff(ops.multiply(a, x), b)
    assert resid < 1e-9


def test_welch_and_mannwhitney_sane(spark):
    """t-stat finite, df between min(n)-1 and n1+n2-2; U within its
    exact range [0, n1*n2]."""
    w = QUERIES["q_welch_ttest"](spark, SF).collect()[0]
    assert w["n1"] > 1 and w["n2"] > 1
    assert abs(w["t_stat"]) < 1e6
    assert (
        min(w["n1"], w["n2"]) - 1 <= w["df"] <= w["n1"] + w["n2"] - 2
    )
    u = QUERIES["q_mannwhitney_u"](spark, SF).collect()[0]
    assert 0.0 <= u["u1"] <= u["n1"] * u["n2"]


def test_linear_attribution_conserves_value(spark):
    """Linear credit is conservative: total credited value equals
    total purchase value (nothing double-counted or dropped)."""
    from matrixinversion_spark.session import read_table

    rows = QUERIES["q_attribution_linear"](spark, SF).collect()
    assert {r["channel"] for r in rows} == {"click", "view", "direct"}
    credited = sum(r["credit"] or 0.0 for r in rows)
    total = (
        read_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(credited - total) < 0.05


def test_pit_join_covers_every_lineitem(spark):
    """Every shipped line item lands in exactly one priority regime:
    the PIT join's item count equals the lineitem row count."""
    from matrixinversion_spark.session import read_table

    rows = QUERIES["q_point_in_time_join"](spark, SF).collect()
    n_attr = sum(r["n_items"] for r in rows)
    n_li = read_table(spark, SF, "lineitem").count()
    assert n_attr == n_li
    assert all(r["n_items"] > 0 for r in rows)


def test_jacobi_pcg_beats_plain_cg_on_scaled_system(spark):
    """On a 1e6-spread diagonally-scaled SPD system, Jacobi PCG
    converges in far fewer iterations than plain CG, and both
    reach the numpy solution."""
    import numpy as np

    from matrixinversion_spark.matrix.cg import cg_solve
    from matrixinversion_spark.matrix.core import BlockMatrixFrame

    rng = np.random.default_rng(5)
    n, bs = 96, 32
    m = rng.uniform(size=(n, n))
    base = 0.5 * (m + m.T) + n * np.eye(n)  # well-conditioned SPD
    d = np.sqrt(np.logspace(0, 6, n))  # 1e6 diagonal spread
    a_np = d[:, None] * base * d[None, :]  # still SPD, badly scaled
    b_np = rng.uniform(size=(n, 1))
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=bs)
    b = BlockMatrixFrame.from_numpy(spark, b_np, block_size=bs)
    want = np.linalg.solve(a_np, b_np)

    x_p, it_p, _ = cg_solve(a, b, tol=1e-10, precondition="jacobi")
    assert np.max(np.abs(x_p.to_numpy() - want)) < 1e-6
    x_c, it_c, _ = cg_solve(a, b, tol=1e-10, max_iter=it_p)
    # plain CG at the same iteration budget is nowhere near done
    err_c = np.max(np.abs(x_c.to_numpy() - want))
    assert it_p < 40, it_p
    assert err_c > 1e-4, (it_p, err_c)
