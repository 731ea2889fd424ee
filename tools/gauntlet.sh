#!/usr/bin/env bash
# Full local gate: compile, specs, oracle-verify at two scale factors, bench.
# Mirrors what the driver runs per round; use before every substantial commit.
set -e
cd "$(dirname "$0")/.."

echo "== compile + test =="
sbt -batch test 2>&1 | grep -E "Passed:|All tests passed|FAILED|\*\*\*" | tail -3

for SF in sf0.01 sf0.1; do
  echo "== verify $SF =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch \
    "runMain graft.Verify /root/testdata/$SF /tmp/gauntlet_$SF" >/tmp/gauntlet_verify.log 2>&1 || true
  grep "\[verify\]" /tmp/gauntlet_verify.log || true
  python3 tools/check.py /root/testdata/$SF /tmp/gauntlet_$SF | tail -1
done

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*'
