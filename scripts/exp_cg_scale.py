"""Conjugate-gradient scale smoke at the reference's N=2048, closed
form: A = (M + Mᵀ)/2 + N·I from the seeded uniform matrix (diagonally
dominant ⇒ SPD, condition number O(1)), b = A·1 so the exact solution
is the ones vector. Asserts the solution elementwise (max|x−1|), the
true residual, and that the iteration count stays in the
well-conditioned regime (≪ N) — a divergence or a preconditioning bug
shows up as iteration blow-up long before the residual check.

Usage: python scripts/exp_cg_scale.py [n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from matrixinversion_spark.matrix import ops
from matrixinversion_spark.matrix.cg import cg_solve
from matrixinversion_spark.matrix.core import BlockMatrixFrame
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BS = 512

spark = get_spark("cg-scale")
spark.sparkContext.setLogLevel("ERROR")

m = BlockMatrixFrame.random_uniform(spark, N, block_size=BS, seed=42)
a = ops.add(ops.scale(ops.add(m, ops.transpose(m)), 0.5),
            BlockMatrixFrame.from_numpy(spark, float(N) * np.eye(N),
                                        block_size=BS))
a = BlockMatrixFrame(a.df.localCheckpoint(eager=True), N, N, BS)
ones = BlockMatrixFrame.from_numpy(spark, np.ones((N, 1)), block_size=BS)
b = ops.multiply(a, ones)

t0 = time.time()
x, iters, rnorm = cg_solve(a, b, tol=1e-12)
wall = time.time() - t0

err = float(np.max(np.abs(x.to_numpy() - 1.0)))
resid = ops.max_abs_diff(ops.multiply(a, x), b)

ok = err < 1e-8 and resid < 1e-8 * N and iters < 40
print(
    f"cg_scale n={N} iters={iters} max_err={err:.2e} "
    f"residual={resid:.2e} wall={wall:.1f}s ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
