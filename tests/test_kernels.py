"""Leaf-kernel unit tests (pure numpy, no Spark)."""

from __future__ import annotations

import numpy as np

from matrixinversion_spark.matrix import kernels


def test_ludcmp_reconstructs():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 64, 129):
        a = rng.random((n, n))
        lu, perm = kernels.ludcmp(a)
        lower, upper = kernels.split_lu(lu)
        assert np.abs(a[perm] - lower @ upper).max() < 1e-10 * n


def test_ludcmp_negative_entries():
    # reference quirk: signed-max pivot (`LUDecomposition.java:63`);
    # we use abs pivoting — verify on a matrix with negatives
    rng = np.random.default_rng(48)
    a = rng.uniform(-1, 1, (64, 64))
    lu, perm = kernels.ludcmp(a)
    lower, upper = kernels.split_lu(lu)
    assert np.abs(a[perm] - lower @ upper).max() < 1e-10 * 64


def test_triangular_solves_and_inverses():
    rng = np.random.default_rng(1)
    n = 50
    lower = np.tril(rng.random((n, n)), -1) + np.eye(n)
    upper = np.triu(rng.random((n, n))) + np.eye(n) * 2
    b = rng.random((n, 3))
    assert np.allclose(lower @ kernels.solve_lower_unit(lower, b), b)
    assert np.allclose(upper @ kernels.solve_upper(upper, b), b)
    assert np.allclose(lower @ kernels.inv_lower_unit(lower), np.eye(n))
    assert np.allclose(upper @ kernels.inv_upper(upper), np.eye(n))


def test_singular_leaf_raises():
    """Singular input must fail loudly, not propagate inf/garbage
    through the distributed factorization (ADVICE r1; the reference
    clamps to 1e-20 and produces silent garbage instead)."""
    import pytest

    with pytest.raises(np.linalg.LinAlgError, match="singular leaf"):
        kernels.ludcmp(np.zeros((3, 3)))
    # rank-deficient (row repeated) trips the gate too
    a = np.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    with pytest.raises(np.linalg.LinAlgError, match="singular leaf"):
        kernels.ludcmp(a)
