"""Bloom join-prefilter scale smoke, closed form.

20M probe rows against 1M build keys (multiples of 17): the
operator must keep EVERY true member (bloom filters cannot have
false negatives — any miss is a hashing/bit-indexing bug) and kill
nearly all non-members (FPR < 1% at 16 bits/key, k=3; a blown m
sizing or a degenerate hash shows up here as FPR -> 1).

The probe side must take ZERO shuffles: the smoke also asserts the
physical plan of the filtered probe frame contains no Exchange
(the entire point of the operator — a shuffle here means the
broadcast join degraded).

Usage: python scripts/exp_bloom_scale.py [n_probe]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.bloomjoin import bloom_semi_filter
from matrixinversion_spark.session import get_spark

N_PROBE = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_BUILD = 1_000_000
STRIDE = 17  # members = {0, 17, 34, ...}; probe covers [0, N_PROBE)

spark = get_spark("bloom-scale")

build = spark.range(0, N_BUILD).select(
    (F.col("id") * STRIDE).alias("bk")
)
probe = spark.range(0, N_PROBE).select(F.col("id").alias("pk"))

t0 = time.time()
kept = bloom_semi_filter(
    probe, "pk", build, "bk", bits_per_key=16, k=3, n_build=N_BUILD
)
# a true member is a multiple of STRIDE BELOW the build range's end —
# multiples beyond N_BUILD*STRIDE are non-members
is_member = (F.col("pk") % STRIDE == 0) & (
    F.col("pk") < N_BUILD * STRIDE
)
agg = kept.agg(
    F.count("*").alias("n_kept"),
    F.sum(is_member.cast("long")).alias("n_members"),
).collect()[0]
wall = time.time() - t0

true_members = min(N_BUILD, (N_PROBE + STRIDE - 1) // STRIDE)
non_members = N_PROBE - true_members
fpr = (agg["n_kept"] - agg["n_members"]) / non_members

# plan audit: every join on the probe path is broadcast — a
# SortMergeJoin or ShuffledHashJoin would mean the probe side was
# shuffled, defeating the operator (the build-side groupBy exchange
# inside the broadcast subtree is expected and fine)
plan = kept._jdf.queryExecution().executedPlan().toString()
degraded = ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)

ok = (
    agg["n_members"] == true_members  # zero false negatives
    and fpr < 0.01
    and not degraded
)
print(
    f"bloom_scale n_probe={N_PROBE} kept={agg['n_kept']} "
    f"members={agg['n_members']}/{true_members} fpr={fpr:.5f} "
    f"degraded={degraded} wall={wall:.1f}s ok={ok}"
)
spark.stop()
sys.exit(0 if ok else 1)
