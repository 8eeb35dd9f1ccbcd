"""Distributed block-matrix operators: multiply, add/subtract,
transpose, row permutation, residual norms.

Reference analogues (SURVEY.md §2.1): the Schur-complement reducer's
grid matmul + subtract (O11, `LUDecomposition.java:495-651`), the
final U⁻¹·L⁻¹ multiply (O17, `LUInverse.java:169-389`), and the pivot
application at read time (P12, `Read_LU.java:66-92,129-132`).

Physical shapes, 100 TB honest:

- ``multiply`` — relational SUMMA: equi-join A(bi,k)⋈B(k,bj) on the
  inner block index (one shuffle, uniform key), then groupBy (bi,bj)
  with an Arrow-batched GEMM-accumulate (numpy dgemm per block pair —
  the dense kernel *is* the payload, so this is the one place Python
  touches data, at ~8 MB Arrow batches). The reference hand-routes
  the same dataflow through HDFS files + a task-number partitioner.
- ``add``/``subtract`` — full-outer join on (bi,bj) + JVM ``zip_with``;
  absent blocks are zeros. No Python.
- ``transpose`` — per-block numpy transpose + (bi,bj) swap; block
  remap only, no shuffle (narrow dependency).
- ``permute_rows`` — the pivot gather: a driver-built (tiny) block
  routing table joined to the blocks, then per-output-block row
  assembly. Replaces the reference's recursive pivot composition and
  read-time row indirection.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from matrixinversion_spark.matrix.core import BLOCK_SCHEMA, BlockMatrixFrame


def multiply(a: BlockMatrixFrame, b: BlockMatrixFrame) -> BlockMatrixFrame:
    """C = A·B via join-on-inner-index + GEMM-accumulate per block."""
    return gemm(a, b)


def gemm(a: BlockMatrixFrame, b: BlockMatrixFrame,
         c: BlockMatrixFrame | None = None,
         alpha: float = 1.0,
         k_chunk: int | None = None) -> BlockMatrixFrame:
    """Fused C + α·(A·B) (C optional, absent blocks = zeros).

    One shuffle total: the product pairs and the bias blocks of C are
    cogrouped on (bi, bj) and combined inside a single numpy kernel —
    the Schur complement S = A4 − L2·U2 (reference O11) is
    ``gemm(l2, u2, c=a4, alpha=-1)`` with no separate subtract pass
    (which would cost a second join plus a boxing-heavy array
    ``zip_with`` over megabyte blocks).

    Shuffle volume: the inner-index join replicates every A block
    ``nbj(B)`` times and every B block ``nbi(A)`` times, so one gemm
    shuffles ``(nbj_B + nbi_A) × matrix_bytes`` — linear in the GRID
    dimension, not the matrix. Pick the block size so the grid stays
    O(√cores) (``core.auto_block_size``); a 16384² float64 matrix at
    bs=1024 is a 16×16 grid and 64 GB of shuffle per multiply, at
    bs=2048 half that (measured — the bs=1024 point exhausted an
    80 GB spill disk; see BENCH_NOTES "N=16384").

    Per-task memory: each output task materializes its whole k-panel,
    ``(2k+1)·bs²·8`` bytes (544 MB at k=8, bs=2048) — the bound that
    OOM'd the 64 GB local[32] heap at N=16384 (BENCH_NOTES r5
    failure catalog; the Spark analogue of the reference's ~800 MB
    strip budget, `LUInverse.java:73-75`). ``k_chunk`` caps it:
    partial products are computed per k-range of that length (first
    shuffle unchanged, tasks hold ``(2·k_chunk+1)`` blocks) and then
    merge-summed in a second, output-sized shuffle. Cost: one extra
    shuffle of ``ceil(k/k_chunk) × output_bytes``; use when
    ``(2k+1)·bs²·8`` approaches per-core executor memory — the
    inverse() pipeline leaves it off because auto_block_size caps
    k ≤ 8.
    """
    if a.n_cols != b.n_rows or a.block_size != b.block_size:
        raise ValueError(
            f"shape mismatch: {a.n_rows}x{a.n_cols} @ {b.n_rows}x{b.n_cols} "
            f"(block {a.block_size} vs {b.block_size})"
        )
    if c is not None and (c.n_rows, c.n_cols) != (a.n_rows, b.n_cols):
        raise ValueError("bias shape mismatch in gemm")
    left = a.df.select(
        F.col("bi"), F.col("bj").alias("k"),
        F.col("rows").alias("a_rows"), F.col("cols").alias("a_cols"),
        F.col("data").alias("a_data"),
    )
    right = b.df.select(
        F.col("bi").alias("k"), F.col("bj"),
        F.col("cols").alias("b_cols"), F.col("data").alias("b_data"),
    )
    joined = left.join(right, "k")

    def gemm_sum(pdf: pd.DataFrame, bias: pd.DataFrame | None = None
                 ) -> pd.DataFrame:
        acc: np.ndarray | None = None
        if bias is not None and len(bias):
            r0 = int(bias["rows"].iloc[0])
            c0 = int(bias["cols"].iloc[0])
            acc = np.asarray(
                bias["data"].iloc[0], dtype=np.float64
            ).reshape(r0, c0).copy()
        bi = bj = None
        for bi, bj, ar, ac, bc, ad, bd in zip(
            pdf["bi"], pdf["bj"], pdf["a_rows"], pdf["a_cols"],
            pdf["b_cols"], pdf["a_data"], pdf["b_data"],
        ):
            blk_a = np.asarray(ad, dtype=np.float64).reshape(ar, ac)
            blk_b = np.asarray(bd, dtype=np.float64).reshape(ac, bc)
            p = alpha * (blk_a @ blk_b)
            acc = p if acc is None else acc + p
        if bi is None:  # bias block with no product contributions
            bi = int(bias["bi"].iloc[0])
            bj = int(bias["bj"].iloc[0])
        return pd.DataFrame(
            [(int(bi), int(bj), acc.shape[0], acc.shape[1], acc.ravel())],
            columns=["bi", "bj", "rows", "cols", "data"],
        )

    if k_chunk is not None:
        if k_chunk < 1:
            raise ValueError("k_chunk must be >= 1")
        # stage 1: bounded-panel partial products per k-range
        partials = (
            joined.withColumn(
                "kc", (F.col("k") / F.lit(int(k_chunk))).cast("int")
            )
            .groupBy("bi", "bj", "kc")
            .applyInPandas(lambda pdf: gemm_sum(pdf), BLOCK_SCHEMA)
        )

        def merge_sum(pdf: pd.DataFrame, bias: pd.DataFrame
                      ) -> pd.DataFrame:
            acc: np.ndarray | None = None
            if len(bias):
                acc = np.asarray(
                    bias["data"].iloc[0], dtype=np.float64
                ).reshape(
                    int(bias["rows"].iloc[0]), int(bias["cols"].iloc[0])
                ).copy()
            bi = bj = None
            for bi, bj, r, cc, d in zip(
                pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
            ):
                p = np.asarray(d, dtype=np.float64).reshape(int(r), int(cc))
                acc = p.copy() if acc is None else acc + p
            if bi is None:
                bi = int(bias["bi"].iloc[0])
                bj = int(bias["bj"].iloc[0])
            return pd.DataFrame(
                [(int(bi), int(bj), acc.shape[0], acc.shape[1],
                  acc.ravel())],
                columns=["bi", "bj", "rows", "cols", "data"],
            )

        bias_df = c.df if c is not None else a.df.sparkSession.createDataFrame(
            [], BLOCK_SCHEMA
        )
        out = (
            partials.groupBy("bi", "bj")
            .cogroup(bias_df.groupBy("bi", "bj"))
            .applyInPandas(merge_sum, BLOCK_SCHEMA)
        )
    elif c is None:
        out = joined.groupBy("bi", "bj").applyInPandas(
            lambda pdf: gemm_sum(pdf), BLOCK_SCHEMA
        )
    else:
        out = (
            joined.groupBy("bi", "bj")
            .cogroup(c.df.groupBy("bi", "bj"))
            .applyInPandas(
                lambda left_pdf, right_pdf: gemm_sum(left_pdf, right_pdf),
                BLOCK_SCHEMA,
            )
        )
    return BlockMatrixFrame(out, a.n_rows, b.n_cols, a.block_size)


def _axpy(a: BlockMatrixFrame, b: BlockMatrixFrame,
          beta: float) -> BlockMatrixFrame:
    """A + beta·B with absent-block = zeros (full outer join)."""
    if (a.n_rows, a.n_cols) != (b.n_rows, b.n_cols):
        raise ValueError("shape mismatch in add/subtract")
    la = a.df.select(
        "bi", "bj", F.col("rows").alias("a_rows"),
        F.col("cols").alias("a_cols"), F.col("data").alias("a_data"),
    )
    rb = b.df.select(
        "bi", "bj", F.col("rows").alias("b_rows"),
        F.col("cols").alias("b_cols"), F.col("data").alias("b_data"),
    )
    joined = la.join(rb, ["bi", "bj"], "full_outer")
    rows = F.coalesce("a_rows", "b_rows")
    cols = F.coalesce("a_cols", "b_cols")
    zeros = F.array_repeat(F.lit(0.0), rows * cols)
    data = F.zip_with(
        F.coalesce("a_data", zeros),
        F.coalesce("b_data", zeros),
        lambda x, y: x + F.lit(beta) * y,
    )
    out = joined.select(
        "bi", "bj", rows.alias("rows"), cols.alias("cols"),
        data.alias("data"),
    )
    return BlockMatrixFrame(out, a.n_rows, a.n_cols, a.block_size)


def add(a: BlockMatrixFrame, b: BlockMatrixFrame) -> BlockMatrixFrame:
    return _axpy(a, b, 1.0)


def subtract(a: BlockMatrixFrame, b: BlockMatrixFrame) -> BlockMatrixFrame:
    """A − B (the Schur complement's subtract, O11)."""
    return _axpy(a, b, -1.0)


def scale(a: BlockMatrixFrame, alpha: float) -> BlockMatrixFrame:
    out = a.df.withColumn(
        "data", F.transform("data", lambda x: x * F.lit(alpha))
    )
    return BlockMatrixFrame(out, a.n_rows, a.n_cols, a.block_size)


def transpose(a: BlockMatrixFrame) -> BlockMatrixFrame:
    """Aᵀ: swap block coords, transpose payloads (narrow, no shuffle).

    The reference stores U column-major on disk for this reason
    (`LUDecomposition.java:129-139`); here it's a cheap map."""

    def tr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for bi, bj, r, c, d in zip(
                pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
            ):
                blk = np.asarray(d, dtype=np.float64).reshape(r, c)
                out.append(
                    (int(bj), int(bi), int(c), int(r),
                     np.ascontiguousarray(blk.T).ravel())
                )
            yield pd.DataFrame(
                out, columns=["bi", "bj", "rows", "cols", "data"]
            )

    out = a.df.mapInPandas(tr, BLOCK_SCHEMA)
    return BlockMatrixFrame(out, a.n_cols, a.n_rows, a.block_size)


def permute_rows(a: BlockMatrixFrame, perm: np.ndarray) -> BlockMatrixFrame:
    """Return M with M[i, :] = A[perm[i], :].

    The permutation vector lives on the driver and ships to executors
    in task closures (N int64s — 8 MB at N=1e6; the reference
    likewise keeps pivot vectors as driver-side index files,
    `index.txt`, composed recursively in `Read_LU.java:66-92`).
    Routing: a tiny (out-block → src-block) table built from ``perm``
    drives the join, so each output block touches only the source
    blocks it actually draws rows from.
    """
    perm = np.asarray(perm, dtype=np.int64)
    if perm.shape[0] != a.n_rows:
        raise ValueError("permutation length != n_rows")
    bs = a.block_size
    spark = a.df.sparkSession

    # (bi_out, bi_src) routing pairs — driver-side, O(nbi · sources)
    pairs = sorted(
        {
            (int(i // bs), int(p // bs))
            for i, p in enumerate(perm)
        }
    )
    routing = spark.createDataFrame(pairs, "bi_out int, bi int")

    joined = a.df.join(F.broadcast(routing), "bi")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        bi_out = int(pdf["bi_out"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        cols = int(pdf["cols"].iloc[0])
        r0 = bi_out * bs
        r1 = min(r0 + bs, perm.shape[0])
        out = np.zeros((r1 - r0, cols))
        for bi_src, r, c, d in zip(
            pdf["bi"], pdf["rows"], pdf["cols"], pdf["data"]
        ):
            blk = np.asarray(d, dtype=np.float64).reshape(r, c)
            src0 = int(bi_src) * bs
            for local_i, global_i in enumerate(range(r0, r1)):
                src = perm[global_i]
                if src0 <= src < src0 + int(r):
                    out[local_i] = blk[src - src0]
        return pd.DataFrame(
            [(bi_out, bj, out.shape[0], out.shape[1],
              out.ravel())],
            columns=["bi", "bj", "rows", "cols", "data"],
        )

    out = joined.groupBy("bi_out", "bj").applyInPandas(
        assemble, BLOCK_SCHEMA
    )
    return BlockMatrixFrame(out, a.n_rows, a.n_cols, bs)


def permute_cols(a: BlockMatrixFrame, perm: np.ndarray) -> BlockMatrixFrame:
    """Return M with M[:, j] = A[:, perm[j]] (column gather).

    Same routing strategy as ``permute_rows`` but on block columns —
    used to apply the pivot on the right (A⁻¹ = U⁻¹·L⁻¹·P) without
    paying two full transposes.
    """
    perm = np.asarray(perm, dtype=np.int64)
    if perm.shape[0] != a.n_cols:
        raise ValueError("permutation length != n_cols")
    bs = a.block_size
    spark = a.df.sparkSession

    pairs = sorted(
        {(int(j // bs), int(p // bs)) for j, p in enumerate(perm)}
    )
    routing = spark.createDataFrame(pairs, "bj_out int, bj int")
    joined = a.df.join(F.broadcast(routing), "bj")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        bj_out = int(pdf["bj_out"].iloc[0])
        bi = int(pdf["bi"].iloc[0])
        rows = int(pdf["rows"].iloc[0])
        c0 = bj_out * bs
        c1 = min(c0 + bs, perm.shape[0])
        out = np.zeros((rows, c1 - c0))
        for bj_src, r, c, d in zip(
            pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
        ):
            blk = np.asarray(d, dtype=np.float64).reshape(r, c)
            src0 = int(bj_src) * bs
            for local_j, global_j in enumerate(range(c0, c1)):
                src = perm[global_j]
                if src0 <= src < src0 + int(c):
                    out[:, local_j] = blk[:, src - src0]
        return pd.DataFrame(
            [(bi, bj_out, out.shape[0], out.shape[1], out.ravel())],
            columns=["bi", "bj", "rows", "cols", "data"],
        )

    out = joined.groupBy("bi", "bj_out").applyInPandas(
        assemble, BLOCK_SCHEMA
    )
    return BlockMatrixFrame(out, a.n_rows, a.n_cols, bs)


def max_abs_diff_from_identity(a: BlockMatrixFrame) -> float:
    """max|A − I|∞ — the correctness functional ‖A·A⁻¹ − I‖ from
    SURVEY.md §5 (property-based goldens)."""

    # NB: capture only scalars — closing over `a` itself would drag the
    # DataFrame/SparkSession into the pickled task closure.
    def err(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for bi, bj, r, c, d in zip(
                pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
            ):
                blk = np.asarray(d, dtype=np.float64).reshape(r, c)
                if bi == bj:
                    blk = blk - np.eye(r, c)
                vals.append(float(np.abs(blk).max()))
            yield pd.DataFrame({"e": vals or [0.0]})

    row = (
        a.df.mapInPandas(err, "e double")
        .agg(F.max("e").alias("max_err"))
        .collect()[0]
    )
    return float(row.max_err)


def max_abs_diff(a: BlockMatrixFrame, b: BlockMatrixFrame) -> float:
    """max|A − B|∞ distributed."""
    d = subtract(a, b)
    row = (
        d.df.select(
            F.aggregate(
                F.transform("data", lambda x: F.abs(x)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("e")
        )
        .agg(F.max("e").alias("max_err"))
        .collect()[0]
    )
    return float(row.max_err if row.max_err is not None else 0.0)


def leaf_inv_mode() -> str:
    """Where leaf triangular inversions/factorizations run:
    ``executor`` (default) or ``driver`` (the collect-invert-reupload
    path, kept for A/B measurement via ``SPARK_GRAFT_LEAF_INV=driver``
    — see BENCH_NOTES round-5)."""
    import os

    return os.environ.get("SPARK_GRAFT_LEAF_INV", "executor")


def inv_leaf_distributed(tri: BlockMatrixFrame,
                         kind: str) -> BlockMatrixFrame:
    """Invert a leaf-sized triangular factor INSIDE one executor task.

    The reference inverts triangular strips in its mappers
    (`LUInverse.java:88-167`) — executor-side, never on the driver.
    The driver-roundtrip alternative (collect → np.linalg.inv →
    createDataFrame) measurably loses on local[32]: the collect moves
    a leaf (8–128 MB) through Arrow while sibling jobs run, and the
    driver-thread BLAS then contends with all 32 executor threads for
    cores, inflating a 0.1 s inversion to ~4 s (measured,
    scripts/exp_pipeline_16k.py — driver leaf kernels were 63 s of a
    99 s N=4096 inverse). Shipping the blocks to ONE task instead
    costs a leaf-sized shuffle but runs the BLAS in a scheduled core
    slot and skips both driver transfers. On a multi-executor cluster
    the same plan also removes the driver as a bandwidth bottleneck.
    """
    from matrixinversion_spark.matrix import kernels

    bs = tri.block_size
    n, m = tri.n_rows, tri.n_cols
    inv_fn = (kernels.inv_upper if kind == "upper"
              else kernels.inv_lower_unit)

    def inv(pdf: pd.DataFrame) -> pd.DataFrame:
        a = np.zeros((n, m))
        for bi, bj, r, c, d in zip(
            pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
        ):
            blk = np.asarray(d, dtype=np.float64).reshape(int(r), int(c))
            a[int(bi) * bs:int(bi) * bs + int(r),
              int(bj) * bs:int(bj) * bs + int(c)] = blk
        x = inv_fn(a)
        out = []
        for bi in range((n + bs - 1) // bs):
            for bj in range((m + bs - 1) // bs):
                if kind == "upper" and bi > bj:
                    continue  # strict lower of U⁻¹ is zero
                if kind == "lower" and bj > bi:
                    continue  # strict upper of L⁻¹ is zero
                blk = x[bi * bs:(bi + 1) * bs, bj * bs:(bj + 1) * bs]
                out.append(
                    (bi, bj, blk.shape[0], blk.shape[1],
                     np.ascontiguousarray(blk).ravel())
                )
        return pd.DataFrame(
            out, columns=["bi", "bj", "rows", "cols", "data"]
        )

    # a named constant column, not groupBy(lit(1)) — Spark resolves a
    # bare integer literal in groupBy as a GROUP BY ordinal
    df = (
        tri.df.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(inv, BLOCK_SCHEMA)
    )
    return BlockMatrixFrame(df, n, m, bs)
