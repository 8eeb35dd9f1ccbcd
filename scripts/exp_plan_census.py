"""Full-registry plan census (r13): derive every declared query's
physical plan and count the anti-pattern markers the optimization
guide cares about — exchanges, sort-merge joins, cartesian /
broadcast-nested-loop joins, row-at-a-time Python eval nodes
(BatchEvalPython), Arrow-batched Python nodes, parquet scans without
pushed filters. Plan-only (no noop execution), so iterative queries
pay just their eager barrier rounds. Prints one line per query plus
a summary of flagged names. Usage:

    python scripts/exp_plan_census.py [sf_dir]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from matrixinversion_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("plan_census")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()

MARKS = {
    "exch": r"\(\d+\) Exchange",
    "smj": r"\(\d+\) SortMergeJoin",
    "cart": r"\(\d+\) CartesianProduct",
    "bnlj": r"\(\d+\) BroadcastNestedLoopJoin",
    "pyrow": r"\(\d+\) BatchEvalPython",
    "pyarrow": r"\(\d+\) (ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
               r"|FlatMapGroupsInPandasWithState)",
    "scan": r"\(\d+\) Scan parquet",
}

rows = []
failed = []
for name, fn in qs.items():
    try:
        df = fn(spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # noqa: BLE001 — census must finish
        failed.append(f"{name}: {type(e).__name__}: {e}")
        continue
    counts = {k: len(re.findall(p, txt)) for k, p in MARKS.items()}
    # parquet scans with NO pushed filter AND full read (heuristic:
    # PushedFilters: [] lines)
    counts["scan_nofilter"] = len(
        re.findall(r"PushedFilters: \[\]", txt)
    )
    rows.append((name, counts))
    spark.catalog.clearCache()

hdr = ["exch", "smj", "cart", "bnlj", "pyrow", "pyarrow", "scan",
       "scan_nofilter"]
print(f"{'query':34s} " + " ".join(f"{h:>13s}" for h in hdr))
for name, c in sorted(rows, key=lambda r: (-r[1]["exch"], r[0])):
    print(f"{name:34s} " + " ".join(f"{c[h]:13d}" for h in hdr))

print("\n-- flags --")
for name, c in rows:
    flags = []
    if c["cart"]:
        flags.append(f"CartesianProduct x{c['cart']}")
    if c["pyrow"]:
        flags.append(f"BatchEvalPython x{c['pyrow']}")
    if c["smj"] >= 3:
        flags.append(f"SortMergeJoin x{c['smj']}")
    if c["exch"] >= 6:
        flags.append(f"Exchange x{c['exch']}")
    if flags:
        print(f"{name}: {', '.join(flags)}")
if failed:
    print(f"\nFAILED ({len(failed)}):")
    for f in failed:
        print(" ", f)
print(f"\ncensus over {len(rows)} queries at {SF}")
spark.stop()
sys.exit(1 if failed else 0)
