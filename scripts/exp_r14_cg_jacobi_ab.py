"""Job-count A/B for the preconditioned-CG dot fusion (r14).

Runs a Jacobi-preconditioned cg_solve on a badly row-scaled seeded
SPD system (the pytest's 1e6-spread shape) and reports wall, jobs,
iterations, and the solution residual — run once on old code and
once on new to compare.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matrixinversion_spark.matrix import cg, ops  # noqa: E402
from matrixinversion_spark.matrix.core import BlockMatrixFrame  # noqa: E402
from matrixinversion_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("cg_jacobi_ab")
    spark.sparkContext.setLogLevel("ERROR")
    n, bs = 128, 32
    rng = np.random.default_rng(3)
    m = rng.standard_normal((n, n))
    spd = m @ m.T + n * np.eye(n)
    scale = np.logspace(0, 6, n)
    a_np = spd * np.outer(scale, scale)
    a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=bs)
    a = BlockMatrixFrame(a.df.localCheckpoint(eager=True), n, n, bs)
    b = BlockMatrixFrame.from_numpy(
        spark, a_np @ np.ones((n, 1)), block_size=bs
    )
    tracker = spark.sparkContext.statusTracker()

    def jid() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    for run in range(2):
        j0 = jid()
        t0 = time.time()
        x, iters, rnorm = cg.cg_solve(
            a, b, tol=1e-10, precondition="jacobi"
        )
        resid = ops.max_abs_diff(ops.multiply(a, x), b)
        wall = time.time() - t0
        print(
            f"run{run}: wall={wall:.3f}s jobs={jid() - j0} iters={iters} "
            f"resid={resid:.3e}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
