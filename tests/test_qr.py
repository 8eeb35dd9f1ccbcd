"""TSQR differential tests vs numpy (matrix/qr.py).

Property model (SURVEY.md §5): the distributed factorization must
reproduce the driver-side numpy golden — R equals the sign-normalized
numpy R (== upper Cholesky factor of AᵀA), Q reconstructs A, and Q is
orthonormal to a small multiple of machine epsilon.
"""

from __future__ import annotations

import numpy as np
import pytest

from matrixinversion_spark.matrix import ops
from matrixinversion_spark.matrix import qr as qrmod
from matrixinversion_spark.matrix.core import BlockMatrixFrame


def _golden_r(a: np.ndarray) -> np.ndarray:
    r = np.linalg.qr(a, mode="r")
    s = np.sign(np.diag(r))
    s[s == 0] = 1.0
    return s[:, None] * r


@pytest.mark.parametrize(
    "n,k,bs,fanout",
    [
        (256, 8, 64, 2),    # 4 slabs, binary tree
        (300, 5, 64, 4),    # ragged last slab
        (512, 16, 512, 8),  # single slab — tree degenerates to stage 1
    ],
)
def test_tsqr_matches_numpy(spark, n, k, bs, fanout):
    rng = np.random.default_rng(123)
    a_np = rng.standard_normal((n, k))
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=bs)

    r = qrmod.tsqr_r(a, fanout=fanout)
    assert r.shape == (k, k)
    assert np.allclose(r, np.triu(r))
    assert np.all(np.diag(r) > 0)
    assert np.allclose(r, _golden_r(a_np), atol=1e-9)

    q, r2 = qrmod.tsqr(a, fanout=fanout)
    assert np.array_equal(r, r2)
    q_np = q.to_numpy()
    assert np.max(np.abs(q_np.T @ q_np - np.eye(k))) < 1e-10
    assert np.max(np.abs(q_np @ r - a_np)) < 1e-10


def test_tsqr_rejects_wide(spark):
    a = BlockMatrixFrame.from_numpy(
        spark, np.ones((64, 64)), block_size=32
    )
    with pytest.raises(ValueError, match="single block column"):
        qrmod.tsqr_r(a)


def test_tsqr_gram_identity_distributed(spark):
    """The distributed orthogonality check itself (transpose+gemm
    Gram) agrees with the driver-side one — pins the la_tsqr_residual
    query's measurement path, not just the factorization."""
    rng = np.random.default_rng(7)
    a_np = rng.random((256, 12))
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=64)
    q, _ = qrmod.tsqr(a, fanout=4)
    gram = ops.multiply(ops.transpose(q), q).to_numpy()
    assert np.max(np.abs(gram - np.eye(12))) < 1e-10


def test_randomized_svd_noisy_spectrum(spark):
    """Approximate regime: rank-10 signal + noise — recovered top
    singular values sit within the Halko bound of the true ones."""
    from matrixinversion_spark.matrix import svd as svdmod

    rng = np.random.default_rng(42)
    n, m, r = 512, 128, 10
    signal = (rng.standard_normal((n, r)) * 5.0) @ rng.standard_normal((r, m))
    a_np = signal + rng.standard_normal((n, m)) * 0.01
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=128)
    u, s, vt = svdmod.randomized_svd(a, rank=r, oversample=8,
                                     power_iters=2, seed=1)
    s_true = np.linalg.svd(a_np, compute_uv=False)[:r]
    assert np.max(np.abs(s - s_true) / s_true) < 1e-6
    # U orthonormal
    u_np = u.to_numpy()
    assert np.max(np.abs(u_np.T @ u_np - np.eye(r))) < 1e-8


def test_randomized_svd_rejects_oversized_sketch(spark):
    from matrixinversion_spark.matrix import svd as svdmod

    a = BlockMatrixFrame.from_numpy(spark, np.ones((64, 32)), block_size=16)
    with pytest.raises(ValueError, match="block_size"):
        svdmod.randomized_svd(a, rank=20, oversample=8)


def test_tsqr_rank_deficient_raises(spark):
    a_np = np.ones((128, 4))  # rank 1
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=64)
    with pytest.raises(np.linalg.LinAlgError, match="rank-deficient"):
        qrmod.tsqr(a, fanout=2)
