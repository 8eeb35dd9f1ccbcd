"""matrixinversion_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of
JingenXiang/MatrixInversion (a Hadoop-MapReduce distributed
matrix-inversion engine; see /root/reference and SURVEY.md) as an
idiomatic PySpark engine:

- ``matrix``     — distributed dense linear algebra (block matmul,
                   recursive block LU with partial pivoting,
                   triangular solve/inverse, full inverse) on a
                   DataFrame-native block representation.
                   Reference analogue: Matrix/LUDecomposition.java,
                   Matrix/LUInverse.java.
- ``relational`` — the query surface (scan/filter/join/agg/window/
                   set-ops/scalar functions) built directly on the
                   DataFrame API so Catalyst plans the physical
                   execution.
- ``pipeline``   — large-scale training-data pipeline operators:
                   dedup (exact / MinHash-LSH / SimHash / n-gram
                   Jaccard), similarity search, text analysis,
                   multimodal column plumbing.
- ``streaming``  — Structured Streaming wrappers (windowed aggs,
                   watermarks, stateful sessionization).

Everything is public-API PySpark; no Catalyst extensions required.
"""

__version__ = "0.1.0"
