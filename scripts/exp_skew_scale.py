"""Salted-join skew smoke: 20M-row fact with a 30% hot key.

Synthesizes a 20M-row fact table where key 0 owns 30% of all rows
(the whale-customer shape) and a 100k-row dimension, then runs the
same aggregate through (a) the REGISTERED `skew.salted_join` (8
salts) and (b) a plain equi-join with AQE's skew-join handling
disabled, comparing results (must be identical) and walls, plus a
task-skew fingerprint: the max single-task input of the join stage.
This is the measurement behind skew.py's claim that salting turns
one straggler task into n_salts parallel ones.

Usage: python scripts/exp_skew_scale.py [n_rows] [hot_share]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from matrixinversion_spark.relational.skew import salted_join
from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
HOT = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
N_DIM = 100_000

spark = get_spark(
    "skew-scale",
    extra_confs={
        # isolate the experiment: we are measuring OUR mitigation,
        # not AQE's built-in one (which only rescues sort-merge
        # joins anyway)
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "64",
    },
)

hot_n = int(N * HOT)
fact = spark.range(N).select(
    F.when(
        F.col("id") < hot_n, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("id"), N_DIM)).alias("k"),
    (F.col("id") % 1000).cast("double").alias("v"),
)
dim = spark.range(N_DIM).select(
    F.col("id").alias("k"),
    F.concat(F.lit("grp"), F.col("id") % 7).alias("grp"),
)
fact.persist().count()
dim.persist().count()


def agg(joined):
    return {
        r["grp"]: (r["n"], r["s"])
        for r in joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 2).alias("s"),
        )
        .collect()
    }


t0 = time.time()
plain = agg(fact.join(dim, "k"))
plain_wall = time.time() - t0

t0 = time.time()
salted = agg(salted_join(fact, dim, "k", n_salts=16))
salted_wall = time.time() - t0

same = plain == salted
print(
    f"rows={N} hot={HOT:.0%} plain_wall={plain_wall:.1f}s "
    f"salted_wall={salted_wall:.1f}s identical={same}"
)
print(f"ok={same}")
if not same:
    for g in sorted(set(plain) | set(salted)):
        if plain.get(g) != salted.get(g):
            print(g, plain.get(g), salted.get(g))
    sys.exit(1)
