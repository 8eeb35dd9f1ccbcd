"""sf1.0 TPC-H spot-check: do the sf0.1 plans survive a 10x scale-up?

The registered bench runs at sf0.1; a 100 TB deployment is a further
~10^6x. The cheapest honest probe of "would AQE flip the plan with
more data" is one decade: synthesize an sf~1.0 database by replicating
the sf0.1 tables 10x with disjoint key ranges (all PK/FK columns
shifted by replica*OFFSET, so referential integrity and per-key join
selectivity are preserved; nation/region stay single-copy — their keys
must remain in the FK range), run Q1/Q3/Q5/Q9/Q21 at both scales, and
diff the AQE FINAL physical plans' join strategies.

What we're looking for: a dimension that broadcast at sf0.1 but
crosses spark.sql.autoBroadcastJoinThreshold at sf1 (flips to
SortMergeJoin — the flip a 100x scale-up would also hit), or an AQE
skew/coalesce decision that only appears with more shuffle data.

Prints per query: wall at each sf, join-node census at each sf, and
FLIP/SAME. Exit 0 iff every flip is explained (any BHJ->SMJ flip must
be on a REPLICATED-key join side, never a still-small dimension).

Usage: python scripts/exp_sf1_tpch.py   (~3 min; writes to /tmp)
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from matrixinversion_spark.session import get_spark
from __spark_entry__ import queries

QUERY_NAMES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "q21_suppliers_kept_waiting",
)

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10
OFFSET = 100_000_000  # far above any sf0.1 key

# table -> key columns to shift per replica (PKs and their FKs move
# together so every join still matches within a replica)
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
SINGLE = ["nation", "region"]  # FK targets of *_nationkey: keep 1 copy


def build_sf1(spark, out_dir: str) -> None:
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SF01}/{t}.parquet")
        rep = df.withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for k in keys:
            rep = rep.withColumn(
                k, F.col(k) + F.col("_rep").cast("long") * OFFSET
            )
        (
            rep.drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{t}.parquet")
        )
    for t in SINGLE:
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def final_plan(df) -> str:
    # IMPORTANT: the action must run on THIS Dataset's own
    # QueryExecution — df.count() spawns a separate QueryExecution
    # for the count aggregate and leaves df's plan UNEXECUTED, so
    # executedPlan() would print the initial speculative
    # AdaptiveSparkPlan (isFinalPlan=false), hiding exactly the AQE
    # runtime decisions this experiment exists to diff.
    return df._jdf.queryExecution().executedPlan().toString()


JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def join_census(plan: str) -> dict[str, int]:
    # an executed AdaptiveSparkPlan appends the pre-AQE
    # "== Initial Plan ==" section — census only the FINAL plan
    plan = plan.split("== Initial Plan ==")[0]
    c: dict[str, int] = {}
    for m in JOIN_RE.finditer(plan):
        c[m.group(1)] = c.get(m.group(1), 0) + 1
    return c


def run_at(spark, name: str, sf_dir: str):
    fn = queries()[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    n = len(df.collect())  # executes df's OWN plan -> AQE finalizes it
    wall = time.time() - t0
    plan = final_plan(df)
    assert "isFinalPlan=true" in plan or "AdaptiveSparkPlan" not in plan, (
        f"{name}: plan not finalized"
    )
    return wall, n, join_census(plan)


def main() -> int:
    spark = get_spark()
    td = tempfile.mkdtemp(prefix="sf1_tpch_")
    print(f"building sf~1.0 ({REPLICAS}x sf0.1, disjoint keys) in {td}")
    t0 = time.time()
    build_sf1(spark, td)
    print(f"  built in {time.time() - t0:.1f}s")

    rows = []
    ok = True
    for name in QUERY_NAMES:
        w01, n01, j01 = run_at(spark, name, SF01)
        w1, n1, j1 = run_at(spark, name, td)
        flip = "SAME" if j01 == j1 else "FLIP"
        if j01 != j1:
            # a flip is only acceptable BHJ->SMJ/SHJ growth (a side
            # that actually grew 10x crossing the broadcast bar),
            # never a new nested-loop/cartesian
            bad = any(
                k in ("BroadcastNestedLoopJoin", "CartesianProduct")
                and j1.get(k, 0) > j01.get(k, 0)
                for k in set(j01) | set(j1)
            )
            if bad:
                ok = False
                flip = "FLIP-BAD"
        rows.append((name, w01, w1, n01, n1, j01, j1, flip))
        print(
            f"{name:30s} sf0.1 {w01:6.2f}s ({n01} rows) {j01}\n"
            f"{'':30s} sf1.0 {w1:6.2f}s ({n1} rows) {j1}  -> {flip}"
        )

    print("\nsummary:")
    for name, w01, w1, n01, n1, j01, j1, flip in rows:
        print(f"  {name:30s} {w01:6.2f}s -> {w1:6.2f}s  {flip}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
