"""Condition-number scale smoke at the reference's N=2048, planted
spectrum: A = Q·diag(d)·Qᵀ with d = max(κ·0.5^i, 1), so κ₂(A) = κ
exactly and both power-iteration operands (A and the pipeline's own
A⁻¹) have dominant ratio ≥ 2. Runs the SAME 18-step chunked loop as
the registered la_condition_number query (matrix/queries.py) at 8×
its matrix size — the stage COUNT is n-independent (2·iters matvec
stages + one distributed inverse), so this probe separates the two
wall components the sf0.01 query can't: per-stage cost grows with
the grid (8×8 blocks here vs 4×4), iteration count doesn't.

Asserts rel_err < 1e-6 (the registered query's gate) with the
18-iteration budget, i.e. the 30→18 trim is safe at scale, not just
on the demo seed.

Usage: python scripts/exp_condnum_scale.py [n] [kappa]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from matrixinversion_spark.matrix import inverse as invmod
from matrixinversion_spark.matrix import ops
from matrixinversion_spark.matrix.core import BlockMatrixFrame
from matrixinversion_spark.matrix.lu import _checkpoint
from matrixinversion_spark.session import get_spark

from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
KAPPA = float(sys.argv[2]) if len(sys.argv) > 2 else 1000.0
BS = 256
ITERS = 18

spark = get_spark("condnum-scale")
spark.sparkContext.setLogLevel("ERROR")

rng = np.random.default_rng(77)
q_np, _ = np.linalg.qr(rng.standard_normal((N, N)))
d = np.maximum(KAPPA * 0.5 ** np.arange(N), 1.0)
a_np = (q_np * d) @ q_np.T

t0 = time.time()
a = BlockMatrixFrame.from_numpy(spark, a_np, block_size=BS)
a.persist()
a_inv = invmod.inverse(a, leaf_size=BS)
a_inv = _checkpoint(a_inv)
a_inv.persist()
a_inv.df.count()
a_inv.release()
t_inv = time.time() - t0


def norm_of(w: BlockMatrixFrame) -> float:
    norm2 = w.df.select(
        F.sum(
            F.aggregate("data", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("s")
    ).collect()[0]["s"]
    return float(np.sqrt(norm2))


def dominant(m: BlockMatrixFrame, chunk: int = 5) -> float:
    v = BlockMatrixFrame.from_numpy(
        spark, rng.standard_normal((N, 1)) / np.sqrt(N), block_size=BS
    )
    done = 0
    while done < ITERS - 1:
        take = min(chunk, ITERS - 1 - done)
        w = v
        for _ in range(take):
            w = ops.multiply(m, w)
        w = _checkpoint(w)
        w.persist()
        v = ops.scale(w, 1.0 / norm_of(w))
        done += take
    w = _checkpoint(ops.multiply(m, v))
    w.persist()
    return norm_of(w)


t1 = time.time()
kappa = dominant(a) * dominant(a_inv)
t_iter = time.time() - t1
wall = time.time() - t0

rel_err = abs(kappa - KAPPA) / KAPPA
ok = rel_err < 1e-6
print(
    f"condnum_scale n={N} kappa_true={KAPPA} kappa_est={kappa:.6f} "
    f"rel_err={rel_err:.2e} iters={ITERS} wall={wall:.1f}s "
    f"(inverse={t_inv:.1f}s, 2x{ITERS}-step loops={t_iter:.1f}s) ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
