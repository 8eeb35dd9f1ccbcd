"""Count Spark jobs AND stages for named queries (r14 evidence —
VERDICT r13 item 1 asks for both counts on the matrix family).

Usage: python scripts/exp_r14_stagecount.py <sf_dir> <query ...>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from matrixinversion_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("stagecount_r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()

    # warm JVM + Python-worker paths like measure_r14 does
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    for name in names:
        spark.catalog.clearCache()
        job0 = set(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [j for j in tracker.getJobIdsForGroup(None) if j not in job0]
        stages = set()
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                stages.update(info.stageIds)
        print(f"{name:28s} wall={wall:7.3f}  jobs={len(jobs):4d}  "
              f"stages={len(stages):4d}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
