"""Distributed linear-algebra tests — SURVEY.md §5 strategy:
property-based numerical goldens + differential vs numpy +
recursion-boundary cases (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np
import pytest

from matrixinversion_spark.matrix import inverse as invmod
from matrixinversion_spark.matrix import lu as lumod
from matrixinversion_spark.matrix import ops
from matrixinversion_spark.matrix.core import BlockMatrixFrame


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_multiply_matches_numpy(spark, rng):
    a = rng.random((96, 80))
    b = rng.random((80, 112))
    got = ops.multiply(
        BlockMatrixFrame.from_numpy(spark, a, 32),
        BlockMatrixFrame.from_numpy(spark, b, 32),
    ).to_numpy()
    assert np.abs(got - a @ b).max() < 1e-11


def test_multiply_uneven_blocks(spark, rng):
    # odd sizes exercise the M−M/2 uneven split (`Partition.java:66-68`)
    a = rng.random((70, 45))
    b = rng.random((45, 33))
    got = ops.multiply(
        BlockMatrixFrame.from_numpy(spark, a, 32),
        BlockMatrixFrame.from_numpy(spark, b, 32),
    ).to_numpy()
    assert np.abs(got - a @ b).max() < 1e-11


def test_add_subtract_transpose_scale(spark, rng):
    a = rng.random((64, 48))
    b = rng.random((64, 48))
    ba = BlockMatrixFrame.from_numpy(spark, a, 32)
    bb = BlockMatrixFrame.from_numpy(spark, b, 32)
    assert np.abs(ops.add(ba, bb).to_numpy() - (a + b)).max() == 0
    assert np.abs(ops.subtract(ba, bb).to_numpy() - (a - b)).max() == 0
    assert np.abs(ops.transpose(ba).to_numpy() - a.T).max() == 0
    assert np.abs(ops.scale(ba, -2.5).to_numpy() - (-2.5 * a)).max() == 0


def test_subtract_handles_absent_blocks(spark, rng):
    # triangular factors store no zero blocks; absent must read as 0
    a = np.triu(rng.random((64, 64)))
    b = np.tril(rng.random((64, 64)))
    ba = BlockMatrixFrame.from_numpy(spark, a, 32)  # drops zero blocks
    bb = BlockMatrixFrame.from_numpy(spark, b, 32)
    assert np.abs(ops.subtract(ba, bb).to_numpy() - (a - b)).max() == 0


def test_permute_rows(spark, rng):
    a = rng.random((96, 40))
    p = rng.permutation(96)
    got = ops.permute_rows(
        BlockMatrixFrame.from_numpy(spark, a, 32), p
    ).to_numpy()
    assert np.abs(got - a[p]).max() == 0


def test_random_uniform_deterministic(spark):
    a = BlockMatrixFrame.random_uniform(spark, 64, block_size=32, seed=7)
    b = BlockMatrixFrame.random_uniform(spark, 64, block_size=32, seed=7)
    assert np.abs(a.to_numpy() - b.to_numpy()).max() == 0
    assert 0.0 < a.to_numpy().mean() < 1.0


def test_lu_residual_and_structure(spark, rng):
    m = rng.random((96, 96))
    bm = BlockMatrixFrame.from_numpy(spark, m, 16)
    perm, lo, up = lumod.lu(bm, leaf_size=32)
    ln, un = lo.to_numpy(), up.to_numpy()
    assert np.abs(m[perm] - ln @ un).max() < 1e-10 * 96
    assert np.allclose(np.triu(ln, 1), 0)
    assert np.allclose(np.diag(ln), 1)
    assert np.allclose(np.tril(un, -1), 0)


def test_lu_at_leaf_boundary(spark, rng):
    # n == leaf: no recursion (reference `run.csh:13` limit semantics)
    m = rng.random((32, 32))
    bm = BlockMatrixFrame.from_numpy(spark, m, 16)
    perm, lo, up = lumod.lu(bm, leaf_size=32)
    assert np.abs(m[perm] - lo.to_numpy() @ up.to_numpy()).max() < 1e-11


def test_triangular_solves_distributed(spark, rng):
    n = 96
    lower = np.tril(rng.random((n, n)), -1) + np.eye(n)
    upper = np.triu(rng.random((n, n))) + np.eye(n) * 3
    b = rng.random((n, 64))
    bl = BlockMatrixFrame.from_numpy(spark, lower, 32)
    bu = BlockMatrixFrame.from_numpy(spark, upper, 32)
    bb = BlockMatrixFrame.from_numpy(spark, b, 32)
    x1 = lumod.solve_lower(bl, bb, leaf_size=32).to_numpy()
    assert np.abs(lower @ x1 - b).max() < 1e-10
    bbt = BlockMatrixFrame.from_numpy(spark, b.T, 32)
    x2 = lumod.solve_upper_right(bu, bbt, leaf_size=32).to_numpy()
    assert np.abs(x2 @ upper - b.T).max() < 1e-10


def test_triangular_inverses_distributed(spark, rng):
    n = 96
    lower = np.tril(rng.random((n, n)), -1) + np.eye(n)
    upper = np.triu(rng.random((n, n))) + np.eye(n) * 3
    il = invmod.inverse_lower_unit(
        BlockMatrixFrame.from_numpy(spark, lower, 32), leaf_size=32
    ).to_numpy()
    iu = invmod.inverse_upper(
        BlockMatrixFrame.from_numpy(spark, upper, 32), leaf_size=32
    ).to_numpy()
    assert np.abs(lower @ il - np.eye(n)).max() < 1e-10
    assert np.abs(upper @ iu - np.eye(n)).max() < 1e-10


def _inverse_check(spark, m: np.ndarray, bs: int, leaf: int,
                   tol_scale: float = 1.0):
    n = m.shape[0]
    bm = BlockMatrixFrame.from_numpy(spark, m, bs)
    minv = invmod.inverse(bm, leaf_size=leaf).to_numpy()
    id_err = np.abs(m @ minv - np.eye(n)).max()
    assert id_err < 1e-8 * n * tol_scale, f"identity err {id_err}"
    diff_err = np.abs(minv - np.linalg.inv(m)).max()
    assert diff_err < 1e-6 * tol_scale, f"differential err {diff_err}"


def test_inverse_uniform_two_levels(spark, rng):
    _inverse_check(spark, rng.random((128, 128)), bs=16, leaf=32)


def test_inverse_odd_size(spark, rng):
    # odd n: uneven block split at every level (FIXTURES uniform_1001)
    _inverse_check(spark, rng.random((101, 101)), bs=16, leaf=32)


def test_inverse_diag_closed_form(spark):
    d = np.diag(np.arange(1.0, 65.0))
    bm = BlockMatrixFrame.from_numpy(spark, d, 16)
    minv = invmod.inverse(bm, leaf_size=32).to_numpy()
    assert np.abs(minv - np.diag(1.0 / np.arange(1.0, 65.0))).max() < 1e-12


def test_inverse_orthogonal_closed_form(spark, rng):
    q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    bm = BlockMatrixFrame.from_numpy(spark, q, 16)
    minv = invmod.inverse(bm, leaf_size=32).to_numpy()
    assert np.abs(minv - q.T).max() < 1e-10


def test_inverse_negative_entries(spark, rng):
    # signed-pivot divergence fixture (FIXTURES negative_256, scaled)
    _inverse_check(spark, rng.uniform(-1, 1, (96, 96)), bs=32, leaf=32)


def test_inverse_pivot_stress(spark, rng):
    # rotated rows force nontrivial pivoting at every level
    m = rng.random((96, 96))
    m = np.roll(m, 37, axis=0)
    _inverse_check(spark, m, bs=32, leaf=32)


@pytest.mark.slow
def test_inverse_reference_scale(spark):
    # N=2048: the reference's demonstrated problem size (out/A.* headers)
    rng = np.random.default_rng(45)
    m = rng.random((2048, 2048))
    bm = BlockMatrixFrame.from_numpy(spark, m, 512)
    minv = invmod.inverse(bm, leaf_size=1024).to_numpy()
    assert np.abs(m @ minv - np.eye(2048)).max() < 1e-8 * 2048


def test_auto_block_size_bounds_grid():
    from matrixinversion_spark.matrix.core import auto_block_size, _nblocks

    for n in (512, 2048, 8192, 16384, 100_000):
        bs = auto_block_size(n)
        assert _nblocks(n, bs) <= 8
        assert bs >= 1024 and (bs & (bs - 1)) == 0  # pow2
    assert auto_block_size(2048) == 1024   # small stays default
    assert auto_block_size(16384) == 2048  # 8x8 grid


def test_gemm_k_chunked_matches_plain(spark, rng):
    """Memory-bounded gemm (two-stage partial-product path) must be
    numerically identical in structure to the fused path: same fused
    bias, same alpha, bounded k-panels (BENCH_NOTES r5 failure
    catalog, heap-OOM mitigation)."""
    a = rng.random((96, 96))
    b = rng.random((96, 64))
    c = rng.random((96, 64))
    am = BlockMatrixFrame.from_numpy(spark, a, 32)
    bm = BlockMatrixFrame.from_numpy(spark, b, 32)
    cm = BlockMatrixFrame.from_numpy(spark, c, 32)
    want = c - (a @ b)
    # k=3 panels, chunks of 1 and 2 (2 leaves an uneven tail chunk)
    for kc in (1, 2):
        got = ops.gemm(am, bm, c=cm, alpha=-1.0, k_chunk=kc).to_numpy()
        assert np.abs(got - want).max() < 1e-11
    # bias-only coverage: C wider than A·B contributions is not
    # possible here, but no-bias chunked path must also agree
    got = ops.gemm(am, bm, k_chunk=2).to_numpy()
    assert np.abs(got - a @ b).max() < 1e-11
