#!/usr/bin/env bash
# Full local gate: compile, tests, correctness vs DuckDB, benchmark.
# Mirrors what the driver + judge run each round.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + tests =="
sbt -batch compile test

echo "== correctness (sf0.01 vs DuckDB oracle) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_verify"
python3 tools/local_check.py /root/testdata/sf0.01 /tmp/gate_verify | tail -140

echo "== benchmark (sf0.1) =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -v '^\[' | tail -1
