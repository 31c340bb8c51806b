#!/usr/bin/env bash
# Replicates the driver's per-round flow locally:
#   t1 smoke (entry at sf0.001) -> t2 correctness (Verify + DuckDB oracle
#   at sf0.01) -> bench (sf0.1, one JSON line) -> full test suite.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== t2: Verify @ sf0.01 + oracle compare"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_dryrun_out"
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_dryrun_out

echo "== bench @ sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'

echo "== tests"
sbt -batch test

echo "DRYRUN OK"
