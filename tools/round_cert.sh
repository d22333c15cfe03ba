#!/bin/bash
# Dev-only: one-command round certification — chains the standing
# checks a round must hold (each is also runnable alone; see
# .claude/skills/verify/SKILL.md). Stages print PASS/FAIL and the
# script stops at the first failure. Budget note: stages 1-4 fit one
# 10-minute window; the bench (5) and the scale smokes are separate
# runs by design — invoke them individually.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/5 compile + full test suite"
sbt -batch test 2>&1 | tail -3

echo "== 2/5 registry parity (code ≡ SURVEY ≡ latest CORRECTNESS)"
python3 tools/parity_check.py

echo "== 3/5 t1 smoke (entry rows > 0)"
sbt -batch "runMain graft.Smoke" 2>&1 | grep "\[smoke\]"

echo "== 4/5 t2 correctness gate at sf0.01 (Spark dump + DuckDB compare)"
rm -rf /tmp/vout_cert
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_cert" > /dev/null 2>&1
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/vout_cert | tail -1

echo "== 5/5 bench reminder"
echo "   quiet bench: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch 'runMain graft.Bench'"
echo "   (run it in its own window on a quiet box; compare vs bench_ref.json floors)"
echo "round certification stages 1-4 PASS"
