"""PPJoin prefix-filter set-similarity scale smoke, closed form.

Synthesizes F families, each a base doc of 20 family-unique tokens
("w<i>_<j>" — unique BY CONSTRUCTION, so the expected output is exact
with no hash-collision noise) plus a near-dup that replaces the last
2 tokens with fresh ones (token-set Jaccard exactly 23/27 ~ 0.852
>= tau = 0.7), with 5 universal stop-tokens appended to EVERY doc as
the adversarial part: stop tokens have document frequency 2F — if
the rarest-first prefix filter ever let them into the candidate
join, the buckets would be 2F wide and the job would blow up
quadratically (the smoke would hang or OOM rather than pass slowly).
Cross-family pairs share ONLY stop tokens (J = 5/45, far below tau).

Closed form: the registered `p_set_similarity_ppjoin` must return
exactly one pair per family — (i, i+F) with jaccard = round(23/27, 6)
— and nothing else.

Usage: python scripts/exp_ppjoin_scale.py [n_families]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — populates the registry
from matrixinversion_spark.registry import QUERIES
from matrixinversion_spark.session import get_spark

FAM = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
TOKENS = 20
STOPS = " the of and to a"  # appended to every doc

spark = get_spark("ppjoin-scale")


def family_doc(first: int, last: int, prefix: str = "w") -> F.Column:
    """Tokens prefix<id>_<first..last> for family F.col('id')."""
    return F.concat_ws(
        " ",
        *[
            F.concat(F.lit(prefix), F.col("id"), F.lit(f"_{j}"))
            for j in range(first, last)
        ],
    )


base = spark.range(FAM).select(
    F.col("id").alias("doc_id"),
    F.concat(family_doc(0, TOKENS), F.lit(STOPS)).alias("text"),
)
# near-dup: drop the last 2 family tokens, add 2 fresh x-tokens
dup = spark.range(FAM).select(
    (F.col("id") + FAM).alias("doc_id"),
    F.concat(
        family_doc(0, TOKENS - 2),
        F.lit(" "),
        family_doc(0, 2, prefix="x"),
        F.lit(STOPS),
    ).alias("text"),
)

td = tempfile.mkdtemp(prefix="ppjoin_scale_")
t0 = time.time()
base.unionAll(dup).coalesce(64).write.parquet(f"{td}/documents.parquet")
t_gen = time.time() - t0

t0 = time.time()
# the UNBOUNDED emitter: the whole point of this smoke is that the
# full pair set stays exactly FAM pairs at scale (the registered
# query is the TakeOrdered-bounded view of the same plan)
from matrixinversion_spark.pipeline.dedup import ppjoin_pairs

out = ppjoin_pairs(spark.read.parquet(f"{td}/documents.parquet"))
agg = out.agg(
    F.count(F.lit(1)).alias("n_pairs"),
    F.sum(
        (
            (F.col("id_b") - F.col("id_a") == FAM)
            & (F.col("jaccard") == round(23 / 27, 6))
        ).cast("long")
    ).alias("n_expected_shape"),
).collect()[0]
t_join = time.time() - t0

ok = agg["n_pairs"] == FAM and agg["n_expected_shape"] == FAM
print(
    f"ppjoin scale: families={FAM} pairs={agg['n_pairs']} "
    f"expected={FAM} exact_shape={agg['n_expected_shape']} "
    f"gen={t_gen:.1f}s join={t_join:.1f}s ok={ok}"
)
shutil.rmtree(td, ignore_errors=True)
spark.stop()
sys.exit(0 if ok else 1)
