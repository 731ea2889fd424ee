#!/usr/bin/env bash
# Full local gate: compile, specs, oracle-verify at two scale factors, bench.
# Mirrors what the driver runs per round; use before every substantial commit.
# Exits nonzero if tests or any oracle compare fail.
set -eo pipefail
cd "$(dirname "$0")/.."
FAIL=0

echo "== compile + test =="
sbt -batch test > /tmp/gauntlet_test.log 2>&1 || FAIL=1
grep -E "Passed:|All tests passed|FAILED|\*\*\*" /tmp/gauntlet_test.log | tail -3 || true

for SF in sf0.01 sf0.1; do
  echo "== verify $SF =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch \
    "runMain graft.Verify /root/testdata/$SF /tmp/gauntlet_$SF" >/tmp/gauntlet_verify.log 2>&1 || FAIL=1
  grep "\[verify\]" /tmp/gauntlet_verify.log || true
  if ! python3 tools/check.py /root/testdata/$SF /tmp/gauntlet_$SF > /tmp/gauntlet_check.log 2>&1; then
    FAIL=1
  fi
  tail -1 /tmp/gauntlet_check.log
done

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*' || FAIL=1

exit $FAIL
