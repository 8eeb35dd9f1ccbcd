"""Round-10 extension batch 2: Holt linear smoothing, reciprocal-rank
fusion, and k-core peeling — planted-truth and differential tests
independent of the DuckDB oracle gate."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# q_holt_linear
# ---------------------------------------------------------------------------


def _holt_reference(y, alpha, beta):
    lv, tr = y[1], y[1] - y[0]
    for t in range(2, len(y)):
        nxt = alpha * y[t] + (1 - alpha) * (lv + tr)
        tr = beta * (nxt - lv) + (1 - beta) * tr
        lv = nxt
    return lv, tr


def test_holt_matches_sequential_reference(spark):
    """Differential: the distributed query equals a plain sequential
    pandas replay of the textbook recursion on the same daily
    series."""
    from matrixinversion_spark.relational.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_HORIZON,
        q_holt_linear,
    )
    from matrixinversion_spark.session import read_table

    daily = (
        read_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.avg("value").alias("y"))
        .toPandas()
    )
    out = {r.event_type: r for r in q_holt_linear(spark, SF_DIR).collect()}
    assert len(out) == daily.event_type.nunique()
    for et, sub in daily.groupby("event_type"):
        y = sub.sort_values("day")["y"].to_numpy()
        lv, tr = _holt_reference(y, HOLT_ALPHA, HOLT_BETA)
        r = out[et]
        assert r.n_days == len(y)
        assert r.level == pytest.approx(lv, abs=1e-6)
        assert r.trend == pytest.approx(tr, abs=1e-6)
        assert r.forecast == pytest.approx(
            lv + HOLT_HORIZON * tr, abs=1e-6
        )


def test_holt_linear_trend_recovered(spark):
    """On a noiseless linear series y = 5 + 2t the smoother must
    recover level = last point and trend = slope exactly (the
    recursion is exact on its own model class)."""
    from matrixinversion_spark.relational.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
    )

    y = [5.0 + 2.0 * t for t in range(20)]
    lv, tr = _holt_reference(y, HOLT_ALPHA, HOLT_BETA)
    assert lv == pytest.approx(y[-1], abs=1e-9)
    assert tr == pytest.approx(2.0, abs=1e-9)


# ---------------------------------------------------------------------------
# p_rrf_fusion
# ---------------------------------------------------------------------------


def test_rrf_fusion_shape_and_bounds(spark):
    from matrixinversion_spark.pipeline.similarity import (
        N_QUERIES,
        RRF_K,
        RRF_POOL,
        RRF_TOP,
        p_rrf_fusion,
    )

    rows = p_rrf_fusion(spark, SF_DIR).collect()
    assert len(rows) == N_QUERIES * RRF_TOP
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    hi = 2.0 / (RRF_K + 1)
    lo = 1.0 / (RRF_K + RRF_POOL)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, RRF_TOP + 1))
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        for s in scores:  # scores are rounded to 6 dp
            assert lo - 1e-6 <= s <= hi + 1e-6


def test_rrf_double_rank1_wins(spark):
    """A neighbor ranked 1 by BOTH rankers scores 2/(k+1) — the
    maximum — and must take fused rank 1. Verified wherever the two
    rankers' top-1 coincide in the demo set (unit-norm embeddings ⇒
    they almost always do)."""
    from matrixinversion_spark.pipeline.similarity import (
        RRF_K,
        p_rrf_fusion,
    )

    rows = p_rrf_fusion(spark, SF_DIR).collect()
    top = [r for r in rows if r.rnk == 1]
    assert top
    double_best = [
        r for r in top
        if r.rrf_score == pytest.approx(2.0 / (RRF_K + 1), abs=1e-6)
    ]
    # at least one query's exact and quantized rankers agree on #1
    assert double_best


# ---------------------------------------------------------------------------
# kcore_peel
# ---------------------------------------------------------------------------


def _naive_kcore(pairs, k):
    import collections

    edges = list(pairs)
    while True:
        deg = collections.Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        alive = {n for n, d in deg.items() if d >= k}
        nxt = [(u, v) for u, v in edges if u in alive and v in alive]
        if len(nxt) == len(edges):
            return set(edges)
        edges = nxt


def test_kcore_fixpoint_matches_naive(spark):
    """K4 + a pendant chain + a separate triangle: the 3-core is
    exactly the K4; the triangle (degree 2) and chain dissolve.
    The distributed fixpoint must equal the sequential peel."""
    from matrixinversion_spark.relational.mining import kcore_peel

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6), (6, 7)]
    tri = [(10, 11), (11, 12), (10, 12)]
    pairs = k4 + chain + tri
    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["u", "v"])
    )
    got = {
        (r.u, r.v) for r in kcore_peel(df, 3, rounds=None).collect()
    }
    assert got == _naive_kcore(pairs, 3) == set(k4)


def test_kcore_bounded_rounds_peel_progressively(spark):
    """On a path graph a bounded peel removes exactly one layer of
    endpoints per round (degree-1 nodes), so r rounds leave
    len-2r edges — pinning that rounds=r does exactly r peels."""
    from matrixinversion_spark.relational.mining import kcore_peel

    path = [(i, i + 1) for i in range(1, 10)]  # 9 edges
    df = spark.createDataFrame(
        pd.DataFrame(path, columns=["u", "v"])
    )
    for r in (1, 2):
        got = kcore_peel(df, 2, rounds=r).collect()
        assert len(got) == len(path) - 2 * r
    # fixpoint: a path has no 2-core at all
    assert kcore_peel(df, 2, rounds=None).collect() == []


# ---------------------------------------------------------------------------
# q_cramers_v / q_theil_index
# ---------------------------------------------------------------------------


def test_cramers_v_bounds_and_consistency(spark):
    from matrixinversion_spark.relational.analytics import q_cramers_v

    r = q_cramers_v(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.cramers_v <= 1.0
    # V must equal sqrt(chi2 / (n * (min(r,c) - 1))) of its own row
    import math

    expect = math.sqrt(r.chi2 / (r.n * (min(r.r, r.c) - 1)))
    assert r.cramers_v == pytest.approx(expect, abs=1e-6)


def test_theil_additivity_and_positivity(spark):
    """Theil's defining property: total = between + within, both
    components non-negative (Jensen)."""
    from matrixinversion_spark.relational.infostats import (
        q_theil_index,
    )

    r = q_theil_index(spark, SF_DIR).collect()[0]
    assert r.theil_total >= -1e-9
    assert r.theil_between >= -1e-9
    assert r.theil_within >= -1e-9
    assert r.theil_total == pytest.approx(
        r.theil_between + r.theil_within, abs=1e-6
    )


def test_theil_uniform_is_zero(spark):
    """Perfectly equal incomes give T = 0 in every component —
    checked through the same aggregate algebra on a planted frame."""
    from pyspark.sql import functions as F2

    s = spark.range(100).select(
        (F2.col("id") % 4).alias("grp"), F2.lit(250.0).alias("x")
    )
    g = s.groupBy("grp").agg(
        F2.count(F2.lit(1)).alias("ng"),
        F2.sum("x").alias("sg"),
        F2.sum(F2.col("x") * F2.log("x")).alias("sxlx"),
    )
    t = g.agg(
        F2.sum("ng").alias("n"),
        F2.sum("sg").alias("sx"),
        F2.sum("sxlx").alias("sxlx"),
        F2.sum(
            F2.col("sg") * F2.log(F2.col("sg") / F2.col("ng"))
        ).alias("sglg"),
    ).collect()[0]
    import math

    mu_ln = math.log(t.sx / t.n)
    assert t.sxlx / t.sx - mu_ln == pytest.approx(0.0, abs=1e-12)
    assert t.sglg / t.sx - mu_ln == pytest.approx(0.0, abs=1e-12)


# ---------------------------------------------------------------------------
# q_changepoint_binseg / q_seasonal_decompose
# ---------------------------------------------------------------------------


def _orders_frame(spark, tmp_path, daily):
    """Write a minimal orders table with one order per (day, cents)."""
    import datetime as dt

    rows = [
        (
            i,
            1,
            "O",
            cents / 100.0,
            dt.date(2024, 1, 1) + dt.timedelta(days=i),
            "1-URGENT",
        )
        for i, cents in enumerate(daily)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf}/orders.parquet")
    return sf


def _naive_binseg(daily):
    """Sequential replay: global CUSUM argmax, then per-segment."""
    n = len(daily)

    def scan(lo, hi):  # candidates lo..hi-1 (1-based t in [lo, hi))
        seg = daily[lo - 1: hi]
        mean = sum(seg) / len(seg)
        best, cum = None, 0.0
        for j, x in enumerate(seg[:-1]):
            cum += x - mean
            t = lo + j
            if best is None or abs(cum) > abs(best[1]):
                best = (t, cum)
        return best

    t1, s1 = scan(1, n)
    out = [(1, t1, s1)]
    for lo, hi in ((1, t1), (t1 + 1, n)):
        if hi - lo >= 1 and len(daily[lo - 1: hi]) >= 2:
            t, s = scan(lo, hi)
            out.append((2, t, s))
    return out


def test_binseg_two_planted_shifts(spark, tmp_path):
    """Series with two mean shifts (100 -> 500 at day 10, 500 -> 50
    at day 20): level 1 must find one of the true breaks and level 2
    the other; every reported stat equals the sequential replay."""
    from matrixinversion_spark.relational.infostats import (
        q_changepoint_binseg,
    )

    daily = [10000] * 10 + [50000] * 10 + [5000] * 10
    sf = _orders_frame(spark, tmp_path, daily)
    got = {
        (r.level, r.cp_date): r.cusum_dollars
        for r in q_changepoint_binseg(spark, sf).collect()
    }
    import datetime as dt

    expect = {}
    for level, t, s in _naive_binseg(daily):
        day = dt.date(2024, 1, 1) + dt.timedelta(days=t - 1)
        expect[(level, day.strftime("%Y-%m-%d"))] = round(s / 100.0, 6)
    assert got == expect
    # the two true break days (day index 10 and 20 -> dates 10th/20th)
    found_days = {d for (_, d) in got}
    assert "2024-01-10" in found_days and "2024-01-20" in found_days


def test_seasonal_decompose_identity_and_pure_cycle(spark, tmp_path):
    """Planted series = linear trend + exact weekly sawtooth: the
    decomposition must return residual == 0 everywhere (the model
    class is recovered exactly), and y == trend + seasonal +
    residual holds row-by-row."""
    from matrixinversion_spark.relational.temporal import (
        q_seasonal_decompose,
    )

    # start on a Monday-aligned boundary irrelevant — dow handled
    sawtooth = [0, 700, 1400, 2100, 2800, 3500, 4200]  # mean 2100
    daily = [
        100000 + 1000 * i + (sawtooth[i % 7] - 2100)
        for i in range(35)
    ]
    sf = _orders_frame(spark, tmp_path, daily)
    rows = q_seasonal_decompose(spark, sf).collect()
    assert len(rows) == 35 - 6  # full centered windows only
    for r in rows:
        assert r.residual == pytest.approx(0.0, abs=1e-6)
        assert r.revenue == pytest.approx(
            r.trend + r.seasonal + r.residual, abs=1e-6
        )


def test_seasonal_decompose_registry_properties(spark):
    """On TESTDATA: additive identity per row and mean-zero
    seasonal components."""
    from matrixinversion_spark.relational.temporal import (
        q_seasonal_decompose,
    )

    rows = q_seasonal_decompose(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.revenue == pytest.approx(
            r.trend + r.seasonal + r.residual, abs=1e-5
        )
    seas = {r.dow: r.seasonal for r in rows}
    assert sum(seas.values()) == pytest.approx(0.0, abs=1e-4)


def test_decile_lift_properties(spark):
    """Gains-table invariants: exactly 10 equal-depth deciles
    (sizes differ by <= 1), cumulative lift at decile 10 is exactly
    1.0 (the whole population's lift over itself), and the
    responder total is conserved."""
    from matrixinversion_spark.relational.infostats import (
        q_decile_lift,
    )
    from matrixinversion_spark.session import read_table

    rows = sorted(
        q_decile_lift(spark, SF_DIR).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert rows[-1].cum_lift == pytest.approx(1.0, abs=1e-6)
    o = read_table(spark, SF_DIR, "orders")
    total_resp = o.filter(
        o.o_orderpriority == "1-URGENT"
    ).count()
    assert sum(r.responders for r in rows) == total_resp
    assert sum(sizes) == o.count()


def test_markov_attribution_planted_journeys(spark, tmp_path):
    """Hand-computable chain: 10 users view->purchase, 10 users
    click->(end), 5 users click->view->purchase.
    P(start->view)=.4, P(start->click)=.6, P(click->view)=1/3,
    P(click->null)=2/3, P(view->conv)=1. Full conversion = .6;
    removing view kills all conversion (effect 1), removing click
    leaves the direct-view .4 (effect 1/3) -> attribution
    view .75 / click .25."""
    import datetime as dt

    from matrixinversion_spark.relational.temporal import (
        q_attribution_markov,
    )

    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def add(user, *types):
        nonlocal eid
        for i, ty in enumerate(types):
            rows.append(
                (eid, t0 + dt.timedelta(minutes=i), user, ty, 1.0)
            )
            eid += 1

    for u in range(10):
        add(u, "view", "purchase")
    for u in range(10, 20):
        add(u, "click")
    for u in range(20, 25):
        add(u, "click", "view", "purchase")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).write.parquet(
        f"{sf}/events.parquet"
    )
    got = {
        r.channel: (r.removal_effect, r.attribution)
        for r in q_attribution_markov(spark, sf).collect()
    }
    assert set(got) == {"view", "click"}
    assert got["view"][0] == pytest.approx(1.0, abs=1e-6)
    assert got["click"][0] == pytest.approx(1 / 3, abs=1e-6)
    assert got["view"][1] == pytest.approx(0.75, abs=1e-6)
    assert got["click"][1] == pytest.approx(0.25, abs=1e-6)


def test_markov_attribution_registry_properties(spark):
    """Attribution shares sum to 1, effects in [0,1], one row per
    non-absorbing channel present in the events table."""
    from matrixinversion_spark.relational.temporal import (
        q_attribution_markov,
    )
    from matrixinversion_spark.session import read_table

    rows = q_attribution_markov(spark, SF_DIR).collect()
    # expected channels = types occurring in some journey PREFIX
    # (truncated at first purchase) — a type appearing only after
    # every first purchase is correctly absent from the chain
    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window as W2

    e = read_table(spark, SF_DIR, "events")
    wu = W2.partitionBy("user_id").orderBy("ts", "event_id")
    wall_u = W2.partitionBy("user_id")
    seq = e.select(
        "user_id", "event_type", F2.row_number().over(wu).alias("rn")
    ).select(
        "*",
        F2.min(
            F2.when(F2.col("event_type") == "purchase", F2.col("rn"))
        ).over(wall_u).alias("fp"),
    )
    types = {
        r.event_type
        for r in seq.filter(
            F2.col("rn") <= F2.coalesce("fp", F2.lit(1 << 62))
        )
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r.channel for r in rows} == types - {"purchase"}
    for r in rows:
        assert 0.0 <= r.removal_effect <= 1.0
    assert sum(r.attribution for r in rows) == pytest.approx(
        1.0, abs=1e-4
    )


def test_ccnet_buckets_properties(spark):
    """Head/middle/tail per language: bucket sizes within 1 of each
    other (ntile), head mean score >= middle >= tail, doc totals
    conserved per language."""
    from matrixinversion_spark.pipeline.text import p_ccnet_buckets
    from matrixinversion_spark.session import read_table

    rows = p_ccnet_buckets(spark, SF_DIR).collect()
    per_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        per_lang.setdefault(r.lang, {})[r.bucket] = r
    lang_counts = {
        r["lang"]: r["n"]
        for r in read_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_lang) == set(lang_counts)
    for lang, b in per_lang.items():
        assert set(b) == {"head", "middle", "tail"}
        sizes = [b[k].n_docs for k in ("head", "middle", "tail")]
        assert sum(sizes) == lang_counts[lang]
        assert max(sizes) - min(sizes) <= 1
        assert (
            b["head"].mean_logp
            >= b["middle"].mean_logp
            >= b["tail"].mean_logp
        )


def test_markov_oracle_parity_on_gating_channel(spark, tmp_path):
    """Review regression: a channel whose removal ZEROES conversion
    ('view' gates every purchase in the planted fixture) must appear
    in the ORACLE's output too — the original inner-join oracle
    silently dropped it and misnormalized the rest. Runs the real
    DuckDB oracle against the planted parquet and compares engines
    row-for-row."""
    import datetime as dt

    import duckdb

    from matrixinversion_spark.relational.temporal import (
        MARKOV_STEPS,
        _markov_sql,
        q_attribution_markov,
    )

    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def add(user, *types):
        nonlocal eid
        for i, ty in enumerate(types):
            rows.append(
                (eid, t0 + dt.timedelta(minutes=i), user, ty, 1.0)
            )
            eid += 1

    for u in range(10):
        add(u, "view", "purchase")
    for u in range(10, 20):
        add(u, "click")
    for u in range(20, 25):
        add(u, "click", "view", "purchase")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).write.parquet(
        f"{sf}/events.parquet"
    )
    got = {
        r.channel: (r.removal_effect, r.attribution)
        for r in q_attribution_markov(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf}/events.parquet/*.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(_markov_sql(MARKOV_STEPS)).fetchall()
    }
    assert set(oracle) == set(got) == {"view", "click"}
    for c in got:
        assert got[c][0] == pytest.approx(oracle[c][0], abs=1e-6)
        assert got[c][1] == pytest.approx(oracle[c][1], abs=1e-6)


def test_markov_degenerate_inputs(spark, tmp_path):
    """No-conversion corpus -> empty result (oracle returns empty
    for the same input); both engines agree instead of dividing by
    zero."""
    import datetime as dt

    import duckdb

    from matrixinversion_spark.relational.temporal import (
        MARKOV_STEPS,
        _markov_sql,
        q_attribution_markov,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i % 5, "view", 1.0)
        for i in range(20)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).write.parquet(
        f"{sf}/events.parquet"
    )
    assert q_attribution_markov(spark, sf).collect() == []
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf}/events.parquet/*.parquet'"
    )
    assert con.execute(_markov_sql(MARKOV_STEPS)).fetchall() == []
