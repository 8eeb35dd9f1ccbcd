#!/bin/sh
# The full per-round attestation protocol, in the exact order the
# round artifacts expect (all Spark jobs run SEQUENTIALLY — 32-core
# contention between two local[32] JVMs OOMs borderline runs):
#   1. full pytest suite (default tier)
#   2. the -m slow tier pytest.ini deselects
#   3. driver-strict DuckDB-oracle gate, all registered queries
#   4. streaming attestation artifact (STREAMING.md)
#   5. bench (one JSON line incl. the machine-index fingerprint)
# Scale smokes (scripts/run_scale_smokes.sh, ~20 min) are a separate
# opt-in step.
#
# Usage: sh scripts/run_round_gate.sh
set -e
cd "$(dirname "$0")/.."
echo "=== 1/5 pytest (default tier)"
python -m pytest tests/ -q -p no:cacheprovider
echo "=== 2/5 pytest -m slow"
sh scripts/run_slow_tier.sh
echo "=== 3/5 driver-strict oracle gate (all registered queries, ~8 min)"
# same SPARK_GRAFT_SF_DIR override emit_streaming_report.py honors —
# a non-default fixture dir must not split the gate across datasets
python scripts/check_correctness.py --driver "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
echo "=== 4/5 streaming attestation (STREAMING.md)"
python scripts/emit_streaming_report.py
echo "=== 5/5 bench"
python bench.py
echo "=== round gate complete"
