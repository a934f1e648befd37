#!/bin/bash
# Reproduce the Spark 4.1.2 unionOutputPartitioning claim/execution
# mismatch (wrong results under AQE; analysis in Checkpoints.scala,
# drafted upstream issue text in NOTES.md round 16). Exits 1 when the
# defect reproduces, 0 when the Spark build is fixed.
set -euo pipefail
cd "$(dirname "$0")/.."
exec tools/run_main.sh graft.tools.UnionPartitioningRepro "${1:-/root/testdata/sf0.001}"
