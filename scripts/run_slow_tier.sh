#!/bin/sh
# Round-loop step (VERDICT r10 #4): pytest.ini deselects the
# reference-scale `-m slow` tests from the default suite, so the
# per-round attestation quoted a suite that never exercised the
# N=2048-class path directly. Run the slow tier once per round and
# quote its count alongside the default suite's.
#
# Usage: sh scripts/run_slow_tier.sh
# (never concurrently with another Spark job — 32-core contention
# OOMs borderline runs; see scripts/run_scale_smokes.sh)
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m slow -q -p no:cacheprovider
