#!/usr/bin/env bash
# Full local gate: compile, tests, correctness vs DuckDB, benchmark.
# Mirrors what the driver + judge run each round.
#
# Modes:
#   tools/run_gate.sh                 full gate (compile+test, sf0.01
#                                     correctness, sf0.1 bench)
#   tools/run_gate.sh --sf sf0.001    correctness-only oracle-robustness
#                                     sweep at the given scale factor:
#                                     runs Verify + the DuckDB compare at
#                                     /root/testdata/<sf> and writes
#                                     CORRECTNESS_LOCAL_<sf-sans-dots>.json
#                                     so pinned-vs-data-derived oracle
#                                     drift is recorded mechanically each
#                                     round (VERDICT r9 #7). Exits 0 even
#                                     with fails — the artifact is the
#                                     report; documented-pinned rows are
#                                     expected to fail off their scale.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--sf" ]]; then
  sf="${2:?usage: run_gate.sh --sf sf0.001}"
  out="/tmp/gate_verify_${sf}"
  artifact="CORRECTNESS_LOCAL_${sf//./}.json"
  echo "== correctness sweep ($sf vs DuckDB oracle) -> $artifact =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
    sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  python3 tools/local_check.py "/root/testdata/$sf" "$out" "$artifact" \
    | tail -145 || true
  exit 0
fi

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
