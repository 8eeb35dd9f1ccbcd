"""Level-pipelining measurement at N=16384 (r4 VERDICT item 5).

Question: N=16384's inverse lands at 1.43x ideal flop-scaling from
N=8192 — BENCH_NOTES attributes the gap to the extra recursion
level's serial sweep chain. This experiment decomposes the wall into
(a) driver-side leaf kernel time (cluster idle), (b) driver collect
time (to_numpy of distributed frames), and (c) per-phase walls
(LU / triangular inverses / final multiply+permute), so the next
optimization targets the measured bottleneck instead of the guessed
one.

Usage: python scripts/exp_pipeline_16k.py [N] [block] [leaf]
Run with SPARK_GRAFT_DRIVER_MEM=64g for N=16384 (BENCH_NOTES).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else None
LEAF = int(sys.argv[3]) if len(sys.argv) > 3 else None

ACCT: dict[str, float] = {}
COUNT: dict[str, int] = {}


def _timed(tag, fn):
    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            ACCT[tag] = ACCT.get(tag, 0.0) + time.time() - t0
            COUNT[tag] = COUNT.get(tag, 0) + 1
    return wrap


def main() -> None:
    from matrixinversion_spark.matrix import core, inverse as invmod, kernels
    from matrixinversion_spark.matrix.core import BlockMatrixFrame
    from matrixinversion_spark.session import get_spark

    # account driver-side leaf kernels + collects (thread-safe enough:
    # GIL-held float adds; slight undercount under races is fine)
    kernels.ludcmp = _timed("ludcmp", kernels.ludcmp)
    kernels.inv_lower_unit = _timed("inv_lower_unit", kernels.inv_lower_unit)
    kernels.inv_upper = _timed("inv_upper", kernels.inv_upper)
    _orig_to_numpy = core.BlockMatrixFrame.to_numpy

    def to_numpy(self):
        if self.local is not None:      # free driver-twin path
            return self.local
        t0 = time.time()
        try:
            return _orig_to_numpy(self)
        finally:
            ACCT["collect"] = ACCT.get("collect", 0.0) + time.time() - t0
            COUNT["collect"] = COUNT.get("collect", 0) + 1

    core.BlockMatrixFrame.to_numpy = to_numpy

    block = BLOCK or core.auto_block_size(N)
    spark = get_spark("exp-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_grid = (N // block) ** 2
    spark.conf.set("spark.sql.shuffle.partitions", str(max(n_grid * 2, 8)))
    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    print(f"N={N} block={block} leaf={LEAF or 'auto'}", flush=True)
    t0 = time.time()
    a = BlockMatrixFrame.random_uniform(
        spark, N, block_size=block, seed=45
    ).persist()
    a.df.count()
    print(f"generate: {time.time() - t0:.1f}s", flush=True)

    from matrixinversion_spark.matrix.lu import (
        _checkpoint, _concurrently, auto_leaf, lu,
    )
    from matrixinversion_spark.matrix.ops import multiply, permute_cols

    leaf = LEAF or auto_leaf(N)
    phases: dict[str, float] = {}
    j0 = jobs()
    t0 = time.time()
    perm, lo, up = lu(a, leaf)
    lo = _checkpoint(lo).persist()
    up = _checkpoint(up).persist()
    lo.df.count(), up.df.count()   # fence the phase
    phases["lu"] = time.time() - t0
    phases["lu_jobs"] = jobs() - j0

    j0 = jobs()
    t0 = time.time()
    iu, il = _concurrently(
        lambda: invmod.inverse_upper(up, leaf),
        lambda: invmod.inverse_lower_unit(lo, leaf),
    )
    iu = _checkpoint(iu).persist()
    il = _checkpoint(il).persist()
    iu.df.count(), il.df.count()
    phases["tri_inverse"] = time.time() - t0
    phases["tri_inverse_jobs"] = jobs() - j0

    j0 = jobs()
    t0 = time.time()
    x = permute_cols(multiply(iu, il), np.argsort(perm))
    x = x.persist()
    x.df.write.format("noop").mode("overwrite").save()
    phases["mul_permute"] = time.time() - t0
    phases["mul_permute_jobs"] = jobs() - j0

    total = phases["lu"] + phases["tri_inverse"] + phases["mul_permute"]

    # matvec residual (BENCH_NOTES N=16384 protocol): one pass over
    # each cached matrix, vector-only driver traffic
    def _matvec(m, v):
        import pandas as pd

        bs = m.block_size
        vb = spark.sparkContext.broadcast(v)

        def part(it):
            for pdf in it:
                out = []
                for bi, bj, r, c, d in zip(
                    pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"],
                    pdf["data"],
                ):
                    blk = np.asarray(d, dtype=np.float64).reshape(
                        int(r), int(c)
                    )
                    seg = vb.value[int(bj) * bs:int(bj) * bs + int(c)]
                    out.append((int(bi), (blk @ seg).tolist()))
                if out:
                    yield pd.DataFrame(out, columns=["bi", "part"])

        parts = m.df.mapInPandas(
            part, "bi int, part array<double>"
        ).collect()
        y = np.zeros(m.n_rows)
        for row in parts:
            seg = np.asarray(row["part"])
            y[row["bi"] * bs:row["bi"] * bs + len(seg)] += seg
        return y

    t0 = time.time()
    rng = np.random.default_rng(7)
    v = rng.standard_normal(N)
    av = _matvec(x, v)
    res = float(np.abs(_matvec(a, av) - v).max() / np.abs(v).max())
    phases["residual_check"] = time.time() - t0

    print("phases:", {k: round(v, 1) for k, v in phases.items()},
          flush=True)
    print("driver acct (s):",
          {k: round(v, 1) for k, v in ACCT.items()}, flush=True)
    print("driver acct (n):", COUNT, flush=True)
    print(f"inverse total: {total:.1f}s  residual={res:.2e}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
