"""Round-14 optimization measurement harness (guide §1).

For each named query: run twice against the noop sink (cold plan +
warm rerun), record wall seconds and Spark job counts, and dump the
post-execution `.explain("formatted")` text to plans/r14/<name>_<tag>.txt.

Usage:
    python scripts/measure_r14.py <tag> [sf_dir] [query ...]

<tag> is "before" or "after" (file suffix). Default sf_dir is sf0.1,
default query list is the bench headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from matrixinversion_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q_distinct_agg", "q_window_rank", "q_events_sessionize",
    "p_dedup_exact", "p_dedup_minhash_lsh", "p_knn_bruteforce",
    "p_text_quality", "p_doc_chunking", "p_embedding_covariance",
    "la_matmul_coo", "q_merge_upsert", "q_skyline",
    "q_window_count_distinct", "q_bloom_prefilter_join", "q_ks_2sample",
    "p_split_leakage_neardup", "q_poisson_bootstrap_ci", "p_dsir_select",
]


def _git_head(repo_root: str) -> str:
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo_root, capture_output=True, text=True, timeout=10,
        )
        sha = out.stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=repo_root, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return f"{sha}{'+dirty' if dirty else ''}" if sha else "unknown"
    except Exception:
        return "unknown"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("measure_r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()

    def _max_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    # warm JVM + Python-worker paths like bench.py does
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    results: dict[str, dict] = {}
    for name in names:
        from matrixinversion_spark.pipeline.dedup import clear_signature_cache
        clear_signature_cache()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        runs = []
        n_jobs = None
        df = None
        for _ in range(2):
            clear_signature_cache()
            spark.catalog.clearCache()
            j0 = _max_job_id()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            n_jobs = _max_job_id() - j0
        spark.sparkContext.setJobDescription(None)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            # stamp the commit the dump was taken at, so stale
            # intermediate dumps can't masquerade as HEAD evidence
            # (VERDICT r13 #7)
            f.write(f"-- dumped at HEAD {_git_head(here)}\n")
            f.write(formatted)
        results[name] = {"runs": runs, "min": min(runs), "jobs": n_jobs}
        print(f"{name:32s} min={min(runs):7.3f}  runs={runs}  jobs={n_jobs}",
              flush=True)

    total = round(sum(r["min"] for r in results.values()), 3)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "total_min": total,
                      "queries": {k: v["min"] for k, v in results.items()},
                      "jobs": {k: v["jobs"] for k, v in results.items()}},
                     indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
