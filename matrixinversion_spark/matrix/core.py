"""BlockMatrixFrame: a DataFrame-native distributed dense matrix.

The reference stores matrices as a recursive HDFS tree of extent-
headered binary block files (SURVEY.md §1.1, `Partition.java`,
`save_matrix` at `LUDecomposition.java:388-408`). Here the same idea
is one explicit-schema DataFrame:

    (bi INT, bj INT, rows INT, cols INT, data ARRAY<DOUBLE>)

- ``(bi, bj)`` are block-grid coordinates (the reference's extent
  header, normalized); ``data`` is the row-major dense payload.
- Zero blocks are simply absent — triangular factors carry ~half the
  blocks, and every operator treats a missing block as zeros (the
  join/aggregation algebra does this for free).
- Lineage and ``persist()`` replace the reference's HDFS side-channel
  re-reads (`Read_LU.java`); a shuffle on block coordinates replaces
  its hand-rolled partitioner (`MyPartitioner`,
  `LUDecomposition.java:653-659`).

Scale: a 1e6×1e6 float64 matrix at block_size=1024 is ~1M blocks of
8 MB — comfortable partition granularity for a 1000-executor cluster,
and the (bi, bj) key is perfectly uniform so block shuffles never skew.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCK_SCHEMA = "bi int, bj int, rows int, cols int, data array<double>"
DEFAULT_BLOCK_SIZE = 1024


def _nblocks(n: int, bs: int) -> int:
    return (n + bs - 1) // bs


def auto_block_size(n: int, max_grid: int = 8) -> int:
    """Block size that keeps the block grid at most ``max_grid`` per
    dimension (power-of-two, ≥ DEFAULT_BLOCK_SIZE).

    The join-based gemm shuffles each side once per opposite grid
    dimension (see ops.gemm), so shuffle volume grows linearly with
    the grid — a matrix should therefore use the LARGEST block its
    tasks can hold, not a fixed 1024. max_grid=8 bounds gemm shuffle
    at 16× the matrix bytes while still giving 8×8=64-way
    parallelism per multiply; raise it on clusters with more
    executors than that (grid ≈ √cores is the SUMMA-style balance
    point between parallelism and replication).
    """
    bs = DEFAULT_BLOCK_SIZE
    while _nblocks(n, bs) > max_grid:
        bs *= 2
    return bs


@dataclass(frozen=True)
class BlockMatrixFrame:
    """A dense distributed matrix as a DataFrame of blocks.

    ``local`` is an optional driver-side ndarray twin, set when the
    frame was built FROM driver data (``from_numpy`` — recursion
    leaves). It lets leaf consumers (triangular solves, checkpoints)
    skip a pointless driver→cluster→driver round-trip: ``to_numpy``
    returns it directly, and ``_checkpoint`` skips materializing a
    frame whose lineage is a single createDataFrame. Never mutate it.
    Transformed frames (slices excepted) drop the twin — it only ever
    mirrors an exact from_numpy construction.
    """

    df: DataFrame
    n_rows: int
    n_cols: int
    block_size: int
    local: np.ndarray | None = field(
        default=None, compare=False, repr=False
    )
    # Intermediate DataFrames persisted while BUILDING this frame
    # (recursion levels, leaf task outputs). The producer appends
    # them; ``release()`` unpersists them once the result has been
    # materialized, so repeated factorizations in one session do not
    # accrete cached blocks until eviction pressure degrades the
    # executors. ``to_numpy`` releases automatically.
    retained: list = field(
        default_factory=list, compare=False, repr=False
    )

    @property
    def nbi(self) -> int:
        return _nblocks(self.n_rows, self.block_size)

    @property
    def nbj(self) -> int:
        return _nblocks(self.n_cols, self.block_size)

    def block_rows(self, bi: int) -> int:
        return min(self.block_size, self.n_rows - bi * self.block_size)

    def block_cols(self, bj: int) -> int:
        return min(self.block_size, self.n_cols - bj * self.block_size)

    # -- construction -------------------------------------------------

    @staticmethod
    def from_numpy(spark: SparkSession, a: np.ndarray,
                   block_size: int = DEFAULT_BLOCK_SIZE,
                   keep_zeros: bool = False) -> "BlockMatrixFrame":
        """Driver-side ingest (tests/leaves); zero blocks dropped."""
        a = np.asarray(a, dtype=np.float64)
        n, m = a.shape
        rows = []
        for bi in range(_nblocks(n, block_size)):
            for bj in range(_nblocks(m, block_size)):
                blk = a[bi * block_size:(bi + 1) * block_size,
                        bj * block_size:(bj + 1) * block_size]
                if not keep_zeros and not blk.any():
                    continue
                rows.append(
                    (bi, bj, blk.shape[0], blk.shape[1],
                     np.ascontiguousarray(blk).ravel())
                )
        # Arrow path: ndarray payloads serialize without boxing into
        # Python floats (a leaf factor is ~8 MB — list-of-float
        # createDataFrame was the driver bottleneck). Arrow is a
        # runtime-settable SQL conf and defaults to FALSE on a bare
        # SparkSession; the non-Arrow fallback type-verifies each cell
        # and rejects numpy.float64, so enable it here rather than
        # assume the caller used our session factory.
        pdf = pd.DataFrame(
            rows, columns=["bi", "bj", "rows", "cols", "data"]
        )
        # set-and-restore (r4 ADVICE): Arrow conversion happens eagerly
        # inside createDataFrame, so the conf only needs to hold for
        # this call — leaving it flipped would silently change the
        # caller's later createDataFrame semantics on a bare session.
        _ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"
        try:
            prior: str | None = spark.conf.get(_ARROW_CONF, None)
        except Exception:
            prior = None
        try:
            try:
                spark.conf.set(_ARROW_CONF, "true")
            except Exception:
                pass  # conf locked down — boxed fallback below covers it
            try:
                df = spark.createDataFrame(pdf, schema=BLOCK_SCHEMA)
            except Exception:
                # Last-resort boxed path (pure-Python floats) for
                # sessions where Arrow conversion is unavailable.
                pdf = pdf.assign(
                    data=[np.asarray(d, dtype=np.float64).tolist()
                          for d in pdf["data"]]
                )
                df = spark.createDataFrame(pdf, schema=BLOCK_SCHEMA)
        finally:
            try:
                if prior is None:
                    spark.conf.unset(_ARROW_CONF)
                else:
                    spark.conf.set(_ARROW_CONF, prior)
            except Exception:
                pass
        return BlockMatrixFrame(
            df, n, m, block_size,
            local=np.array(a, dtype=np.float64, copy=True),
        )

    @staticmethod
    def random_uniform(spark: SparkSession, n: int, m: int | None = None,
                       block_size: int = DEFAULT_BLOCK_SIZE,
                       seed: int = 42) -> "BlockMatrixFrame":
        """Distributed seeded uniform(0,1) matrix (reference O1,
        `data/MakeData.java:9-33` — but reproducible: each block's RNG
        is seeded by (seed, bi, bj), independent of partitioning)."""
        m = n if m is None else m
        bs = block_size
        nbi, nbj = _nblocks(n, bs), _nblocks(m, bs)

        grid = spark.range(nbi * nbj).select(
            (F.col("id") / nbj).cast("int").alias("bi"),
            (F.col("id") % nbj).cast("int").alias("bj"),
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj in zip(pdf["bi"], pdf["bj"]):
                    r = min(bs, n - bi * bs)
                    c = min(bs, m - bj * bs)
                    rng = np.random.default_rng(
                        np.random.SeedSequence([seed, int(bi), int(bj)])
                    )
                    out.append((int(bi), int(bj), r, c,
                                rng.random(r * c)))
                yield pd.DataFrame(
                    out, columns=["bi", "bj", "rows", "cols", "data"]
                )

        df = grid.repartition(min(nbi * nbj, 64)).mapInPandas(
            gen, schema=BLOCK_SCHEMA
        )
        return BlockMatrixFrame(df, n, m, bs)

    @staticmethod
    def identity(spark: SparkSession, n: int,
                 block_size: int = DEFAULT_BLOCK_SIZE) -> "BlockMatrixFrame":
        """Identity matrix — diagonal blocks only."""
        bs = block_size

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi in pdf["bi"]:
                    r = min(bs, n - int(bi) * bs)
                    out.append((int(bi), int(bi), r, r,
                                np.eye(r).ravel()))
                yield pd.DataFrame(
                    out, columns=["bi", "bj", "rows", "cols", "data"]
                )

        grid = spark.range(_nblocks(n, bs)).select(
            F.col("id").cast("int").alias("bi")
        )
        df = grid.mapInPandas(gen, schema=BLOCK_SCHEMA)
        return BlockMatrixFrame(df, n, n, bs)

    # -- materialization ----------------------------------------------

    def to_numpy(self) -> np.ndarray:
        """Collect to a driver ndarray (leaves/tests only — bounded by
        leaf_size in the recursion, same shape as the reference's
        driver-local leaf solve). Driver-backed frames return their
        ``local`` twin without touching the cluster."""
        if self.local is not None:
            return self.local
        out = np.zeros((self.n_rows, self.n_cols))
        bs = self.block_size
        pdf = self.df.toPandas()  # Arrow path: cells arrive as ndarrays
        for bi, bj, r, c, d in zip(
            pdf["bi"], pdf["bj"], pdf["rows"], pdf["cols"], pdf["data"]
        ):
            blk = np.asarray(d, dtype=np.float64).reshape(r, c)
            out[bi * bs:bi * bs + r, bj * bs:bj * bs + c] = blk
        # the collect above IS the materialization point: the owned
        # intermediate caches have served their purpose (re-collecting
        # simply recomputes through checkpointed lineage)
        self.release()
        return out

    def persist(self) -> "BlockMatrixFrame":
        self.df.persist()
        return self

    def unpersist(self) -> "BlockMatrixFrame":
        self.df.unpersist()
        return self

    def release(self) -> "BlockMatrixFrame":
        """Unpersist every intermediate frame this result owns (see
        ``retained``). Call after the final action when materializing
        through a path other than ``to_numpy`` (e.g. a parquet write)
        — safe to call repeatedly, and safe before the action too
        (the plan recomputes, just without the cache)."""
        for d in self.retained:
            try:
                d.unpersist()
            except Exception:
                pass  # stopped session — nothing left to free
        self.retained.clear()
        return self

    # -- block-coordinate slicing (metadata-only, Catalyst prunes) ----

    def slice_blocks(self, bi0: int, bi1: int, bj0: int, bj1: int
                     ) -> "BlockMatrixFrame":
        """Sub-matrix [bi0,bi1)×[bj0,bj1) in *block* coordinates,
        reindexed to origin. The reference materializes these slices
        as directory trees (`Partition.java:61-157`); here it is a
        filter + projection — no data movement at all."""
        bs = self.block_size
        df = (
            self.df.filter(
                (F.col("bi") >= bi0) & (F.col("bi") < bi1)
                & (F.col("bj") >= bj0) & (F.col("bj") < bj1)
            )
            .select(
                (F.col("bi") - bi0).alias("bi"),
                (F.col("bj") - bj0).alias("bj"),
                "rows", "cols", "data",
            )
        )
        n_rows = min(self.n_rows, bi1 * bs) - bi0 * bs
        n_cols = min(self.n_cols, bj1 * bs) - bj0 * bs
        local = None
        if self.local is not None:
            local = np.ascontiguousarray(
                self.local[bi0 * bs:bi0 * bs + n_rows,
                           bj0 * bs:bj0 * bs + n_cols]
            )
        return BlockMatrixFrame(df, n_rows, n_cols, bs, local=local)

    def shift(self, dbi: int, dbj: int) -> DataFrame:
        """Block-index translation (for assembling larger matrices)."""
        return self.df.select(
            (F.col("bi") + dbi).alias("bi"),
            (F.col("bj") + dbj).alias("bj"),
            "rows", "cols", "data",
        )
