"""Property-based kernel fuzzing (hypothesis): the LU/triangular
kernels must hold their invariants for arbitrary sizes and seeds,
not just the fixture sizes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from matrixinversion_spark.matrix import kernels


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    lo=st.floats(min_value=-10.0, max_value=0.0),
    hi=st.floats(min_value=0.1, max_value=10.0),
)
def test_ludcmp_reconstruction_property(n, seed, lo, hi):
    a = np.random.default_rng(seed).uniform(lo, hi, (n, n))
    lu, perm = kernels.ludcmp(a)
    lower, upper = kernels.split_lu(lu)
    # permutation is a bijection
    assert sorted(perm.tolist()) == list(range(n))
    # structural invariants
    assert np.allclose(np.triu(lower, 1), 0)
    assert np.allclose(np.diag(lower), 1)
    assert np.allclose(np.tril(upper, -1), 0)
    # reconstruction (scaled by magnitude and size)
    scale = max(np.abs(a).max(), 1.0)
    assert np.abs(a[perm] - lower @ upper).max() < 1e-10 * n * scale


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=150),
    m=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_triangular_solve_property(n, m, seed):
    rng = np.random.default_rng(seed)
    lower = np.tril(rng.random((n, n)), -1) + np.eye(n)
    upper = np.triu(rng.random((n, n))) + np.eye(n) * (n + 1)
    b = rng.standard_normal((n, m))
    assert np.abs(lower @ kernels.solve_lower_unit(lower, b) - b).max() < 1e-8
    assert np.abs(upper @ kernels.solve_upper(upper, b) - b).max() < 1e-8
