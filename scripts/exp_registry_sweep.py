"""Full-registry timing sweep: wall every registered query at one sf.

Not a benchmark (one sample, co-tenant noise applies) — a WIDE perf
net: the round-9 run of this sweep surfaced four systematic Catalyst
traps (pushed-filter alias inlining, lambda expression-object
inlining, wide-payload explode, single-split scans) that the narrow
HEADLINE bench could never see. Run it once per round after
correctness is green and stare at the top of the table.

Usage: python scripts/exp_registry_sweep.py [sf_dir] [top_n]
Prints every query slower than 2 s plus the top-N overall.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from matrixinversion_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 25

spark = get_spark("registry-sweep")
qs = entry_mod.queries()
walls: dict[str, float] = {}
failed: list[str] = []
t_all = time.time()
for i, (name, fn) in enumerate(qs.items()):
    t0 = time.time()
    try:
        fn(spark, SF_DIR).count()
        walls[name] = time.time() - t0
    except Exception as e:  # noqa: BLE001 — sweep must finish
        failed.append(name)
        print(f"FAILED {name}: {type(e).__name__}: {e}", flush=True)

total = time.time() - t_all
print(f"\nswept {len(walls)} queries in {total:.0f}s at {SF_DIR}")
if failed:
    print(f"FAILED ({len(failed)}): {failed}")
print(f"\ntop {TOP_N} walls:")
for name, w in sorted(walls.items(), key=lambda kv: -kv[1])[:TOP_N]:
    print(f"  {w:7.2f}s  {name}")
spark.stop()
sys.exit(1 if failed else 0)
