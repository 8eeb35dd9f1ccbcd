"""Property-based fuzzing of the round-10 extension operators against
sequential reference implementations on RANDOM inputs — the fixture
tests pin hand-picked cases; these pin the algebra for arbitrary data.

Spark round-trips cost ~1 s per example, so example counts are small
(the kernels-level hypothesis suite runs 25 numpy examples; here 5-8
distributed ones buy the same class of coverage).
"""

from __future__ import annotations

import collections

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARK_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=5, max_value=120),
    vals=st.integers(min_value=2, max_value=8),  # tie density knob
)
def test_spearman_midranks_match_pandas_random(spark, seed, n, vals):
    """Random tied data: the distributed midrank construction equals
    pandas rank(method='average') + Pearson, for every group."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "l_returnflag": rng.choice(["A", "B"], n),
            "l_quantity": rng.integers(0, vals, n).astype("float64"),
            "l_extendedprice": rng.integers(0, vals, n).astype(
                "float64"
            ),
        }
    )
    # per-group: need >= 2 rows and nonzero variance in both columns
    from matrixinversion_spark.relational.infostats import (
        q_spearman_corr,
    )

    import tempfile

    sf = tempfile.mkdtemp(prefix="hyp_spear_")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/lineitem.parquet"
    )
    got = {r.flag: r for r in q_spearman_corr(spark, sf).collect()}
    for g, sub in pdf.groupby("l_returnflag"):
        rx = sub["l_quantity"].rank(method="average")
        ry = sub["l_extendedprice"].rank(method="average")
        if rx.nunique() < 2 or ry.nunique() < 2:
            # degenerate group: zero rank variance -> NaN/None rho on
            # both sides; accept either representation
            assert got[g].rho is None or got[g].rho != got[g].rho
            continue
        assert got[g].rho == pytest.approx(rx.corr(ry), abs=1e-6)


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_edges=st.integers(min_value=3, max_value=60),
    k=st.integers(min_value=2, max_value=4),
)
def test_kcore_fixpoint_matches_naive_random(spark, seed, n_edges, k):
    """Random graphs: the distributed fixpoint peel equals the
    sequential peel exactly."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pairs = set()
    while len(pairs) < n_edges:
        u, v = rng.integers(0, 25, 2).tolist()
        if u != v:
            pairs.add((min(u, v), max(u, v)))
    pairs = sorted(pairs)

    edges = list(pairs)
    while True:
        deg = collections.Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        alive = {x for x, d in deg.items() if d >= k}
        nxt = [(u, v) for u, v in edges if u in alive and v in alive]
        if len(nxt) == len(edges):
            break
        edges = nxt
    expect = set(edges)

    from matrixinversion_spark.relational.mining import kcore_peel

    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["u", "v"])
    )
    got = {(r.u, r.v) for r in kcore_peel(df, k, rounds=None).collect()}
    assert got == expect


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_heavy=st.integers(min_value=0, max_value=4),
    tail=st.integers(min_value=50, max_value=400),
)
def test_heavy_hitters_match_exact_groupby_random(
    spark, seed, n_heavy, tail
):
    """Random corpora (including zero-heavy-hitter ones): the
    two-phase result equals the exact GROUP BY + threshold."""
    import numpy as np

    rng = np.random.default_rng(seed)
    toks = [f"h{i}" for i in range(n_heavy) for _ in range(200)]
    toks += [f"t{rng.integers(0, 40)}" for _ in range(tail)]
    rng.shuffle(toks)
    phi = 0.05
    n = len(toks)
    exact = {
        t: c
        for t, c in collections.Counter(toks).items()
        if c > phi * n
    }

    from matrixinversion_spark.pipeline.text import heavy_hitters_exact

    df = spark.createDataFrame(
        pd.DataFrame({"tok": toks})
    ).repartition(4)
    got = {
        r.tok: r.cnt
        for r in heavy_hitters_exact(df, "tok", phi, k=64).collect()
    }
    assert got == exact


@SPARK_SETTINGS
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=8, max_value=60),
)
def test_binseg_matches_sequential_random(spark, seed, n):
    """Random daily series: every reported (level, date, stat)
    equals the sequential binary-segmentation replay."""
    import datetime as dt

    import numpy as np

    from matrixinversion_spark.relational.infostats import (
        q_changepoint_binseg,
    )
    from tests.test_round10c_ops import _naive_binseg, _orders_frame

    rng = np.random.default_rng(seed)
    daily = rng.integers(1000, 100000, n).tolist()
    import tempfile

    sf = tempfile.mkdtemp(prefix="hyp_binseg_")
    _orders_frame(spark, __import__("pathlib").Path(sf), daily)
    got = {
        (r.level, r.cp_date): r.cusum_dollars
        for r in q_changepoint_binseg(spark, sf).collect()
    }
    expect = {}
    for level, t, s in _naive_binseg([float(x) for x in daily]):
        day = dt.date(2024, 1, 1) + dt.timedelta(days=t - 1)
        expect[(level, day.strftime("%Y-%m-%d"))] = round(
            s / 100.0, 6
        )
    assert set(got) == set(expect)
    for key in got:
        assert got[key] == pytest.approx(expect[key], abs=1e-6)
