#!/bin/bash
# Round-seal recipe (SURVEY §6, hardened r14 per VERDICT item 8):
#   1. full Verify at sf0.01 + DuckDB oracle
#   2. full sbt test
#   3. WAIT FOR IDLE (1-min load < 1.0) — back-to-back sbt/Verify runs
#      leave minutes of residual load that inflate a "solo" bench ~25%
#      (r12/r13 both sealed inflated numbers; the idle wait makes the
#      sealed artifact the reproducible floor)
#   4. solo 3-pass Bench at sf0.1 with SPARK_GRAFT_SEAL=1
#      (writes target/seal.json; every later Bench line splices it)
#   5. full Verify at sf0.1 + DuckDB oracle (the long pass, ~45 min)
# Steps run strictly sequentially — never two sbt JVMs in this repo.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/5] Verify sf0.01 ==="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/seal_v001" > /tmp/seal_verify001.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/seal_v001 | tail -3

echo "=== [2/5] sbt test ==="
sbt -batch test > /tmp/seal_test.log 2>&1 && echo "sbt test: PASS" || { echo "sbt test: FAIL"; tail -30 /tmp/seal_test.log; exit 1; }
grep -E "Tests: " /tmp/seal_test.log | tail -1

echo "=== [3/5] waiting for idle (load1 < 0.6 AND load5 < 1.5) ==="
# BOTH averages gate (r14, measured): a load1-only gate sealed 240.4 s,
# a residual-5-min-load sample read 260.8 s, the dual gate read 215.6 s
# on identical plans — the 1-min average alone under-gates.
for i in $(seq 1 90); do
  l1=$(cut -d' ' -f1 /proc/loadavg); l5=$(cut -d' ' -f2 /proc/loadavg)
  ok=$(python3 -c "print(1 if $l1 < 0.6 and $l5 < 1.5 else 0)")
  [ "$ok" = "1" ] && break
  echo "  load=$l1/$l5 — waiting (${i}0s)"
  sleep 10
done
echo "  load=$(cut -d' ' -f1-2 /proc/loadavg) — sealing"

echo "=== [4/5] solo 3-pass Bench sf0.1 (SEAL) ==="
SPARK_GRAFT_SEAL=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/seal_bench.log 2>&1 || true
grep '"metric"' /tmp/seal_bench.log | tail -1 | head -c 600; echo
cat target/seal.json 2>/dev/null | head -c 400; echo

echo "=== [5/5] Verify sf0.1 ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/seal_v01" > /tmp/seal_verify01.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 /tmp/seal_v01 | tail -3
echo "=== seal complete ==="
