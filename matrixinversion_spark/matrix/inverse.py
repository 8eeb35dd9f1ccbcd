"""Triangular inversion and full matrix inverse.

Reference analogues: `LUInverse.java` — mappers invert triangular
column strips (O16, `:88-167`), the reducer multiplies U⁻¹·L⁻¹ and
applies the pivot permutation (O17, `:169-389`).

Spark-first: triangular inversion is the block-recursive identity

    inv([[A,0],[C,D]]) = [[A⁻¹, 0], [−D⁻¹·C·A⁻¹, D⁻¹]]
    inv([[A,B],[0,D]]) = [[A⁻¹, −A⁻¹·B·D⁻¹], [0, D⁻¹]]

with driver-local numpy leaves — each level costs two distributed
matmuls; depth is log2(n/leaf). The full inverse is then

    A⁻¹ = U⁻¹ · L⁻¹ · P

with the permutation applied as a block-routing gather (no physical
row moves until the very end — SURVEY.md §4 P12: the reference also
composes pivots as index vectors and applies them at read time).
"""

from __future__ import annotations

import numpy as np

from matrixinversion_spark.matrix import kernels
from matrixinversion_spark.matrix.core import BlockMatrixFrame
from matrixinversion_spark.matrix.lu import DEFAULT_LEAF, _checkpoint, lu
from matrixinversion_spark.matrix.ops import (
    multiply,
    permute_cols,
    scale,
)


def inverse_lower_unit(lo: BlockMatrixFrame,
                       leaf_size: int = DEFAULT_LEAF) -> BlockMatrixFrame:
    """Invert a distributed unit-lower-triangular matrix (O16)."""
    spark = lo.df.sparkSession
    if lo.n_rows <= leaf_size or lo.nbi == 1:
        return BlockMatrixFrame.from_numpy(
            spark, kernels.inv_lower_unit(lo.to_numpy()), lo.block_size
        )
    mb = lo.nbi // 2
    a = lo.slice_blocks(0, mb, 0, mb)
    c = lo.slice_blocks(mb, lo.nbi, 0, mb)
    d = lo.slice_blocks(mb, lo.nbi, mb, lo.nbi)
    ia = _checkpoint(inverse_lower_unit(a, leaf_size)).persist()
    id_ = _checkpoint(inverse_lower_unit(d, leaf_size)).persist()
    corner = scale(multiply(multiply(id_, c), ia), -1.0)
    df = ia.df.unionAll(corner.shift(mb, 0)).unionAll(id_.shift(mb, mb))
    return BlockMatrixFrame(df, lo.n_rows, lo.n_cols, lo.block_size)


def inverse_upper(up: BlockMatrixFrame,
                  leaf_size: int = DEFAULT_LEAF) -> BlockMatrixFrame:
    """Invert a distributed upper-triangular matrix (O16)."""
    spark = up.df.sparkSession
    if up.n_rows <= leaf_size or up.nbi == 1:
        return BlockMatrixFrame.from_numpy(
            spark, kernels.inv_upper(up.to_numpy()), up.block_size
        )
    mb = up.nbi // 2
    a = up.slice_blocks(0, mb, 0, mb)
    b = up.slice_blocks(0, mb, mb, up.nbj)
    d = up.slice_blocks(mb, up.nbi, mb, up.nbj)
    ia = _checkpoint(inverse_upper(a, leaf_size)).persist()
    id_ = _checkpoint(inverse_upper(d, leaf_size)).persist()
    corner = scale(multiply(multiply(ia, b), id_), -1.0)
    df = ia.df.unionAll(corner.shift(0, mb)).unionAll(id_.shift(mb, mb))
    return BlockMatrixFrame(df, up.n_rows, up.n_cols, up.block_size)


def inverse(a: BlockMatrixFrame,
            leaf_size: int = DEFAULT_LEAF) -> BlockMatrixFrame:
    """A⁻¹ via recursive block LU (the reference's full pipeline:
    partition → LU → triangular inverses → multiply → un-pivot,
    `Inverse.java:28-40`)."""
    perm, lo, up = lu(a, leaf_size)
    lo = _checkpoint(lo).persist()
    up = _checkpoint(up).persist()
    x = multiply(inverse_upper(up, leaf_size),
                 inverse_lower_unit(lo, leaf_size))
    # A⁻¹ = X·P — a single column gather by perm⁻¹ (no transposes)
    perm_inv = np.argsort(perm)
    return permute_cols(x, perm_inv)
