"""sf~1.0 spot-check of the round-10 extension operators.

Same probe as exp_sf1_tpch (replicate sf0.1 tenfold with disjoint
keys, diff the AQE FINAL plans) — but replication also gives each new
operator an EXACT prediction to verify, not just a wall clock:

- ``q_spearman_corr``: rank correlation is scale-invariant under
  replication (each (flag, x, y) row appears 10x -> midranks scale
  affinely, rho identical to 6 dp);
- ``p_heavy_hitters_exact``: every token count multiplies by exactly
  10, shares unchanged -> same survivor set, cnt_sf1 == 10 * cnt_sf01;
- ``q_attribution_markov``: replicated journeys multiply every
  transition count by 10, so the fitted probabilities — and the
  whole attribution output — must be IDENTICAL row-for-row;
- ``p_dsir_select``: all replicas of one logical doc get IDENTICAL
  weights (the bucket models see the same count ratios), so the
  top-25 must be the sf0.1 top-⌈25/10⌉=3 logical docs in the same
  order, each expanded into its replicas in doc_id order
  (10+10+5). Absolute weights shift by ~1e-3 — the add-one
  smoothing terms don't scale with the 10x counts — which is
  itself part of the prediction (bounded drift, order preserved).

Any deviation means the operator's answer depends on physical layout
(partitioning, AQE decisions) — exactly the class of scale bug the
closed-form check exists to catch. Join/exchange census printed per
plan; BroadcastNestedLoopJoin/CartesianProduct growth fails the run.

Usage: python scripts/exp_sf1_ext.py   (~3 min; writes to /tmp)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from matrixinversion_spark.session import get_spark
from scripts.exp_sf1_tpch import final_plan, join_census

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10
OFFSET = 100_000_000


def build(spark, out_dir: str) -> None:
    rep_col = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    (
        docs.withColumn("_rep", rep_col)
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("_rep").cast("long") * OFFSET,
        )
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    rep_ev = ev.withColumn("_rep", rep_col)
    for k in ("event_id", "user_id"):
        rep_ev = rep_ev.withColumn(
            k, F.col(k) + F.col("_rep").cast("long") * OFFSET
        )
    (
        rep_ev.drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    rep = li.withColumn("_rep", rep_col)
    for k in ("l_orderkey", "l_partkey", "l_suppkey"):
        rep = rep.withColumn(
            k, F.col(k) + F.col("_rep").cast("long") * OFFSET
        )
    (
        rep.drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )


def run(fn, spark, sf_dir):
    t0 = time.time()
    df = fn(spark, sf_dir)
    rows = df.collect()
    return time.time() - t0, rows, join_census(final_plan(df))


def nlj_growth(j0: dict, j1: dict) -> bool:
    """True iff the 10x plan gained a nested-loop/cartesian join the
    sf0.1 plan didn't have — the only unacceptable flip class (a
    constant 1-row broadcast NLJ present at BOTH scales is fine)."""
    return any(
        j1.get(k, 0) > j0.get(k, 0)
        for k in ("BroadcastNestedLoopJoin", "CartesianProduct")
    )


def main() -> int:
    from matrixinversion_spark.pipeline.curation import p_dsir_select
    from matrixinversion_spark.pipeline.text import (
        p_heavy_hitters_exact,
    )
    from matrixinversion_spark.relational.infostats import (
        q_spearman_corr,
    )

    spark = get_spark("sf1-ext")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="sf1_ext_")
    t0 = time.time()
    build(spark, td)
    print(f"built 10x replicas in {time.time() - t0:.1f}s -> {td}")
    ok = True

    # Spearman: rho invariant under replication
    w0, r0, j0 = run(q_spearman_corr, spark, SF01)
    w1, r1, j1 = run(q_spearman_corr, spark, td)
    rho0 = {r.flag: (r.n, r.rho) for r in r0}
    rho1 = {r.flag: (r.n, r.rho) for r in r1}
    def rho_eq(a, b):  # NULL rho (degenerate group) on both sides
        if a is None or b is None:
            return a is None and b is None
        return abs(a - b) <= 1e-6

    inv = all(
        rho1[f][0] == REPLICAS * rho0[f][0]
        and rho_eq(rho0[f][1], rho1[f][1])
        for f in rho0
    ) and set(rho0) == set(rho1)
    ok &= inv and not nlj_growth(j0, j1)
    print(
        f"q_spearman_corr      {w0:5.1f}s -> {w1:5.1f}s  "
        f"rho_invariant={inv} census {j0} -> {j1}"
    )

    # heavy hitters: counts x10, shares identical
    w0, r0, j0 = run(p_heavy_hitters_exact, spark, SF01)
    w1, r1, j1 = run(p_heavy_hitters_exact, spark, td)
    c0 = {r.tok: (r.cnt, r.share) for r in r0}
    c1 = {r.tok: (r.cnt, r.share) for r in r1}
    inv = set(c0) == set(c1) and all(
        c1[t][0] == REPLICAS * c0[t][0]
        and abs(c1[t][1] - c0[t][1]) <= 1e-6
        for t in c0
    )
    ok &= inv and not nlj_growth(j0, j1)
    print(
        f"p_heavy_hitters      {w0:5.1f}s -> {w1:5.1f}s  "
        f"count_x10={inv} census {j0} -> {j1}"
    )

    # DSIR: top-3 logical docs of sf0.1, replica-expanded in order
    w0, r0, j0 = run(p_dsir_select, spark, SF01)
    w1, r1, j1 = run(p_dsir_select, spark, td)
    top3 = [r.doc_id for r in r0[:3]]
    expect_ids = [
        d + rep * OFFSET
        for i, d in enumerate(top3)
        for rep in range(10 if i < 2 else 5)
    ]
    weights_by_logical: dict[int, set] = {}
    for r in r1:
        weights_by_logical.setdefault(r.doc_id % OFFSET, set()).add(
            r.log_weight
        )
    inv = (
        [r.doc_id for r in r1] == expect_ids
        and all(len(ws) == 1 for ws in weights_by_logical.values())
        and all(
            abs(next(iter(weights_by_logical[d])) - base_w) < 0.01
            for d, base_w in
            ((r.doc_id, r.log_weight) for r in r0[:3])
        )
    )
    ok &= inv and not nlj_growth(j0, j1)
    print(
        f"p_dsir_select        {w0:5.1f}s -> {w1:5.1f}s  "
        f"selection_invariant={inv} census {j0} -> {j1}"
    )

    # Markov attribution: output identical under replication
    from matrixinversion_spark.relational.temporal import (
        q_attribution_markov,
    )

    w0, r0, j0 = run(q_attribution_markov, spark, SF01)
    w1, r1, j1 = run(q_attribution_markov, spark, td)
    a0 = {r.channel: (r.removal_effect, r.attribution) for r in r0}
    a1 = {r.channel: (r.removal_effect, r.attribution) for r in r1}
    inv = a0 == a1
    ok &= inv and not nlj_growth(j0, j1)
    print(
        f"q_attribution_markov {w0:5.1f}s -> {w1:5.1f}s  "
        f"output_identical={inv} census {j0} -> {j1}"
    )

    print(f"ok={ok}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
