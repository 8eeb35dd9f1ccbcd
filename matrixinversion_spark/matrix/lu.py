"""Recursive block LU decomposition with partial pivoting.

The reference's core algorithm (Xiang/Meng/Aboulnaga, HPDC'14;
`LUDecomposition.java`): recursively factor the top-left quadrant,
solve the off-diagonal factors, form the Schur complement, recurse.

    P·A = L·U,  A = [[A1,A2],[A3,A4]]
    P1·A1 = L1·U1                      (recursion / leaf ludcmp, O9+O12)
    U2 = L1⁻¹·P1·A2                    (triangular solve, O10 mapper)
    L2 = A3·U1⁻¹                       (triangular solve, O10 mapper)
    P3·S = L3·U3, S = A4 − L2·U2       (Schur O11 reducer + recursion)
    P  = diag(P1,P3); L = [[L1,0],[P3·L2,L3]]; U = [[U1,U2],[0,U3]]

Spark-first re-expression (SURVEY.md §7): the recursion is driver-side
Python over *logical* BlockMatrixFrame slices (block-coordinate
filters — no partition directory trees, no control files); each level
lowers to a handful of Spark jobs (one join-shuffle matmul + JVM
subtract). Triangular solves are recursive too — halving splits down
to a leaf where the factor is collect-and-broadcast (the reference's
mappers likewise stream the ≤limit-sized diagonal factor,
`LUDecomposition.java:470-487`).

Lineage control: every level's Schur complement and factors are
``localCheckpoint``-ed — the recursive plan would otherwise grow
exponentially (the reference pays the same cost as per-level HDFS
materialization; a checkpoint is the lineage-native equivalent).

Pivoting: textbook abs-max partial pivoting (NOT the reference's
signed-max quirk, `LUDecomposition.java:63`); correctness is asserted
via ‖P·A − L·U‖ and ‖A·A⁻¹ − I‖ residuals, not factor bit-matching.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from matrixinversion_spark.matrix import kernels, ops
from matrixinversion_spark.matrix.core import BLOCK_SCHEMA, BlockMatrixFrame
from matrixinversion_spark.matrix.ops import gemm, multiply, permute_rows

DEFAULT_LEAF = 1024  # reference runs limit=1000 (`run.csh:13`)
# 128 MB collect; blocked driver ludcmp ~7 s at 4096 — still far
# cheaper than the serial Spark-action chain another recursion level
# would add (measured: see BENCH_NOTES "N=16384").
MAX_AUTO_LEAF = 4096


def auto_leaf(n: int) -> int:
    """Adaptive leaf size: ≈n/4 bounds the recursion depth at ~2
    levels while the leaf stays driver-cheap (≤2048² = 32 MB collect,
    ~3 s local factorization). Measured at N=8192: leaf=2048 cut the
    full inverse from 361 s to 162 s on local[32] — every recursion
    level costs a serial chain of Spark actions whose scheduling
    overhead dwarfs the BLAS work it replaces. The reference fixes
    limit=1000 for its N=2048 runs (`run.csh:13`); scaling the leaf
    with N is the Spark-side improvement."""
    return int(min(MAX_AUTO_LEAF, max(DEFAULT_LEAF, n // 4)))


def _checkpoint(m: BlockMatrixFrame) -> BlockMatrixFrame:
    if m.local is not None:
        # Driver-backed leaf: lineage is one createDataFrame — a
        # checkpoint would only add a materialization job.
        return m
    return BlockMatrixFrame(
        m.df.localCheckpoint(eager=False), m.n_rows, m.n_cols, m.block_size,
        retained=m.retained,  # cache ownership follows the frame
    )


def _level_ck(child_is_leaf: bool):
    """Depth-aware lineage control (measured, see inverse._lu_inv_rec):
    at the lowest internal recursion level the children are leaf task
    outputs with two-step lineage, and localCheckpoint's serialized
    materialization jobs dominate the wall — plain persist suffices.
    One level up, checkpoints bound the recursive plan's Catalyst
    analysis cost (3x plan-build measured without them). Returns the
    identity at leaf-adjacent levels, ``_checkpoint`` above."""
    return (lambda m: m) if child_is_leaf else _checkpoint


def _concurrently(f1: Callable, f2: Callable) -> tuple:
    """Run two independent Spark-job-producing thunks on driver
    threads so their jobs overlap in the scheduler.

    The recursion serializes ~log² dependency sweeps; the U2/L2
    solves, the (A,D) triangular-inverse pair, and the U⁻¹/L⁻¹ pair
    are data-independent, so the critical path is max() not sum() of
    each pair (VERDICT r1: the reference has the same sequential
    dependency — this is the place Spark can beat it). Nesting depth
    is log2(n/leaf), so the thread count stays O(n/leaf)."""
    with ThreadPoolExecutor(max_workers=2) as ex:
        fut1, fut2 = ex.submit(f1), ex.submit(f2)
        return fut1.result(), fut2.result()


def _lu_leaf_distributed(a: BlockMatrixFrame
                         ) -> tuple[np.ndarray, BlockMatrixFrame,
                                    BlockMatrixFrame]:
    """Factor a leaf-sized matrix INSIDE one executor task.

    Twin of ``inverse._inv_leaf_distributed`` (same measurement, same
    reference placement — the reference factors leaves in its task
    JVMs, never on a coordinating node): the driver roundtrip for a
    leaf LU is a leaf-sized Arrow collect, a core-contended ludcmp,
    and TWO leaf-sized createDataFrame uploads (L and U). Here the
    blocks shuffle to one task, ludcmp runs in a scheduled core slot,
    and only the pivot vector (N ints) crosses to the driver. L and U
    come back as filters over the one persisted task output, tagged
    0=L / 1=U / 2=perm; the strict triangles' zero blocks are never
    materialized. A singular leaf raises inside the task and surfaces
    as the same LinAlgError message via the Spark job failure."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    bs, n, m = a.block_size, a.n_rows, a.n_cols
    schema = StructType(
        [
            StructField("tag", IntegerType()),
            StructField("bi", IntegerType()),
            StructField("bj", IntegerType()),
            StructField("rows", IntegerType()),
            StructField("cols", IntegerType()),
            StructField("data", ArrayType(DoubleType())),
        ]
    )

    def fac(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.zeros((n, m))
        for bi, bj, r, c, d in zip(
            pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
        ):
            blk = np.asarray(d, dtype=np.float64).reshape(int(r), int(c))
            mat[int(bi) * bs:int(bi) * bs + int(r),
                int(bj) * bs:int(bj) * bs + int(c)] = blk
        lu_packed, perm = kernels.ludcmp(mat)
        lower, upper = kernels.split_lu(lu_packed)
        out = []
        for tag, tri in ((0, lower), (1, upper)):
            for bi in range((n + bs - 1) // bs):
                for bj in range((m + bs - 1) // bs):
                    if tag == 0 and bj > bi:
                        continue  # strict upper of L is zero
                    if tag == 1 and bi > bj:
                        continue  # strict lower of U is zero
                    blk = tri[bi * bs:(bi + 1) * bs,
                              bj * bs:(bj + 1) * bs]
                    out.append(
                        (tag, bi, bj, blk.shape[0], blk.shape[1],
                         np.ascontiguousarray(blk).ravel())
                    )
        out.append((2, 0, 0, 1, n, perm.astype(np.float64)))
        return pd.DataFrame(
            out, columns=["tag", "bi", "bj", "rows", "cols", "data"]
        )

    tagged = (
        a.df.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fac, schema)
        .persist()
    )
    perm_row = tagged.filter(F.col("tag") == 2).collect()[0]
    perm = np.asarray(perm_row["data"], dtype=np.float64).astype(np.int64)
    block_cols = ["bi", "bj", "rows", "cols", "data"]
    lower = BlockMatrixFrame(
        tagged.filter(F.col("tag") == 0).select(*block_cols), n, m, bs
    )
    upper = BlockMatrixFrame(
        tagged.filter(F.col("tag") == 1).select(*block_cols), n, m, bs
    )
    return perm, lower, upper


def lu(a: BlockMatrixFrame, leaf_size: int | None = None
       ) -> tuple[np.ndarray, BlockMatrixFrame, BlockMatrixFrame]:
    """Factor P·A = L·U. Returns (perm, L unit-lower, U upper) with
    ``A.to_numpy()[perm] == (L·U).to_numpy()`` up to float error.
    ``leaf_size=None`` picks :func:`auto_leaf`."""
    if a.n_rows != a.n_cols:
        raise ValueError("LU requires a square matrix")
    if leaf_size is None:
        leaf_size = auto_leaf(a.n_rows)
    spark = a.df.sparkSession
    bs = a.block_size

    if a.n_rows <= leaf_size or a.nbi == 1:
        # Leaf factorization, exactly the reference's leaf branch
        # (`LUDecomposition.java:686-699`). Driver-local only when
        # the matrix already lives on the driver; otherwise the
        # factorization runs executor-side (see _lu_leaf_distributed).
        if a.local is None and ops.leaf_inv_mode() == "executor":
            return _lu_leaf_distributed(a)
        lu_packed, perm = kernels.ludcmp(a.to_numpy())
        lower, upper = kernels.split_lu(lu_packed)
        return (
            perm,
            BlockMatrixFrame.from_numpy(spark, lower, bs),
            BlockMatrixFrame.from_numpy(spark, upper, bs),
        )

    nb = a.nbi
    mb = nb // 2
    m = mb * bs
    a1 = a.slice_blocks(0, mb, 0, mb)
    a2 = a.slice_blocks(0, mb, mb, nb)
    a3 = a.slice_blocks(mb, nb, 0, mb)
    a4 = a.slice_blocks(mb, nb, mb, nb)

    ck = _level_ck(mb * bs <= leaf_size or mb == 1)

    p1, l1, u1 = lu(a1, leaf_size)
    l1 = ck(l1).persist()
    u1 = ck(u1).persist()

    u2, l2 = _concurrently(
        lambda: solve_lower(l1, permute_rows(a2, p1), leaf_size),
        lambda: solve_upper_right(u1, a3, leaf_size),
    )
    u2 = ck(u2).persist()
    l2 = ck(l2).persist()

    s = ck(gemm(l2, u2, c=a4, alpha=-1.0))
    p3, l3, u3 = lu(s, leaf_size)

    l2p = permute_rows(l2, p3)

    l_df = (
        l1.df
        .unionAll(l2p.shift(mb, 0))
        .unionAll(l3.shift(mb, mb))
    )
    u_df = (
        u1.df
        .unionAll(u2.shift(0, mb))
        .unionAll(u3.shift(mb, mb))
    )
    perm = np.concatenate([p1, p3 + m])
    n = a.n_rows
    return (
        perm,
        BlockMatrixFrame(l_df, n, n, bs),
        BlockMatrixFrame(u_df, n, n, bs),
    )


# ---------------------------------------------------------------------------
# Distributed triangular solves (reference O10)
# ---------------------------------------------------------------------------

def solve_lower(lo: BlockMatrixFrame, b: BlockMatrixFrame,
                leaf_size: int = DEFAULT_LEAF) -> BlockMatrixFrame:
    """Solve L·X = B for unit-lower-triangular distributed L."""
    if lo.n_rows <= leaf_size or lo.nbi == 1:
        if lo.local is None and ops.leaf_inv_mode() == "executor":
            # distributed leaf factor: invert executor-side, solve as
            # a join-gemm — no driver transfer (see BENCH_NOTES r5)
            return multiply(ops.inv_leaf_distributed(lo, "lower"), b)
        inv_l = kernels.inv_lower_unit(lo.to_numpy())
        return _apply_left(inv_l, b)
    mb = lo.nbi // 2
    la = lo.slice_blocks(0, mb, 0, mb)
    lc = lo.slice_blocks(mb, lo.nbi, 0, mb)
    ld = lo.slice_blocks(mb, lo.nbi, mb, lo.nbi)
    ba = b.slice_blocks(0, mb, 0, b.nbj)
    bb = b.slice_blocks(mb, b.nbi, 0, b.nbj)
    # xa feeds BOTH the Schur update and the output union — persist
    # it or the recursive DAG re-executes 2^depth times per action
    # (checkpoint only above the leaf-adjacent level, see _level_ck)
    xa = _level_ck(mb * lo.block_size <= leaf_size or mb == 1)(
        solve_lower(la, ba, leaf_size)
    ).persist()
    xb = solve_lower(ld, gemm(lc, xa, c=bb, alpha=-1.0), leaf_size)
    df = xa.df.unionAll(xb.shift(mb, 0))
    return BlockMatrixFrame(df, b.n_rows, b.n_cols, b.block_size)


def solve_upper_right(up: BlockMatrixFrame, b: BlockMatrixFrame,
                      leaf_size: int = DEFAULT_LEAF) -> BlockMatrixFrame:
    """Solve X·U = B for upper-triangular distributed U."""
    if up.n_rows <= leaf_size or up.nbi == 1:
        if up.local is None and ops.leaf_inv_mode() == "executor":
            return multiply(b, ops.inv_leaf_distributed(up, "upper"))
        inv_u = kernels.inv_upper(up.to_numpy())
        return _apply_right(b, inv_u)
    mb = up.nbi // 2
    ua = up.slice_blocks(0, mb, 0, mb)
    ub = up.slice_blocks(0, mb, mb, up.nbj)
    ud = up.slice_blocks(mb, up.nbi, mb, up.nbj)
    ba = b.slice_blocks(0, b.nbi, 0, mb)
    bb = b.slice_blocks(0, b.nbi, mb, b.nbj)
    # persist: xa is used twice (see solve_lower)
    xa = _level_ck(mb * up.block_size <= leaf_size or mb == 1)(
        solve_upper_right(ua, ba, leaf_size)
    ).persist()
    xb = solve_upper_right(ud, gemm(xa, ub, c=bb, alpha=-1.0), leaf_size)
    df = xa.df.unionAll(xb.shift(0, mb))
    return BlockMatrixFrame(df, b.n_rows, b.n_cols, b.block_size)


def _apply_left(mat: np.ndarray, b: BlockMatrixFrame) -> BlockMatrixFrame:
    """X = mat·B where ``mat`` is a driver-local (leaf-sized) matrix.

    The factor ships in the task closure — the Spark analogue of the
    reference's replication-20 hot factor files
    (`LUDecomposition.java:148-150`). Each column strip of B is
    assembled per-task and hit with one dgemm.
    """
    bs = b.block_size
    n_rows, n_cols = b.n_rows, b.n_cols

    def slv(pdf: pd.DataFrame) -> pd.DataFrame:
        bj = int(pdf["bj"].iloc[0])
        c = int(pdf["cols"].iloc[0])
        strip = np.zeros((mat.shape[1], c))
        for bi, r, d in zip(pdf["bi"], pdf["rows"], pdf["data"]):
            blk = np.asarray(d, dtype=np.float64).reshape(r, c)
            strip[int(bi) * bs:int(bi) * bs + int(r)] = blk
        x = mat @ strip
        out = []
        for bi in range((x.shape[0] + bs - 1) // bs):
            blk = x[bi * bs:(bi + 1) * bs]
            out.append((bi, bj, blk.shape[0], blk.shape[1],
                        blk.ravel()))
        return pd.DataFrame(
            out, columns=["bi", "bj", "rows", "cols", "data"]
        )

    df = b.df.groupBy("bj").applyInPandas(slv, BLOCK_SCHEMA)
    return BlockMatrixFrame(df, mat.shape[0], n_cols, bs)


def _apply_right(b: BlockMatrixFrame, mat: np.ndarray) -> BlockMatrixFrame:
    """X = B·mat where ``mat`` is driver-local (leaf-sized)."""
    bs = b.block_size

    def slv(pdf: pd.DataFrame) -> pd.DataFrame:
        bi = int(pdf["bi"].iloc[0])
        r = int(pdf["rows"].iloc[0])
        strip = np.zeros((r, mat.shape[0]))
        for bj, c, d in zip(pdf["bj"], pdf["cols"], pdf["data"]):
            blk = np.asarray(d, dtype=np.float64).reshape(r, c)
            strip[:, int(bj) * bs:int(bj) * bs + int(c)] = blk
        x = strip @ mat
        out = []
        for bj in range((x.shape[1] + bs - 1) // bs):
            blk = x[:, bj * bs:(bj + 1) * bs]
            out.append((bi, bj, blk.shape[0], blk.shape[1],
                        blk.ravel()))
        return pd.DataFrame(
            out, columns=["bi", "bj", "rows", "cols", "data"]
        )

    df = b.df.groupBy("bi").applyInPandas(slv, BLOCK_SCHEMA)
    return BlockMatrixFrame(df, b.n_rows, mat.shape[1], bs)
