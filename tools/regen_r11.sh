#!/bin/bash
# Round-11 artifact regeneration after the band fix (s10/d5 outputs changed
# wherever a bucket exceeds W+1 rows, i.e. at every tier). Serialized: one
# sbt at a time (project target lock). Run from /root/repo.
set -u
cd /root/repo
log() { echo "[regen $(date +%H:%M:%S)] $*"; }

# --- Phase A: four persistent tier gates -------------------------------
# (r12 ADVICE fix: stale-output hazard — a failed Verify used to fall
# through to check.py against a /tmp dir still holding a PREVIOUS run's
# parquet, minting a green artifact from stale results. Now the out dir
# is removed before every Verify and a Verify failure skips the check.)
for t in 5 10 20 40; do
  log "verify tier$t"
  rm -rf /tmp/verify_t$t
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/tier$t /tmp/verify_t$t" \
    > /tmp/verify_t$t.log 2>&1 || { log "VERIFY tier$t FAILED — check skipped"; continue; }
  case $t in
    5)  j=CORRECTNESS_SF05.json ;;
    10) j=CORRECTNESS_SF1.json ;;
    20) j=CORRECTNESS_SF2.json ;;
    40) j=CORRECTNESS_SF4.json ;;
  esac
  log "check tier$t -> $j"
  extra=""
  [ $t -ge 40 ] && extra="GRAFT_CHECK_MEM=90GB"
  env GRAFT_CHECK_JSON=$j GRAFT_CHECK_THREADS=16 $extra \
    python3 tools/check.py target/tier$t /tmp/verify_t$t \
    > /tmp/check_t$t.log 2>&1
  tail -1 /tmp/check_t$t.log
done

# --- Phase B: doubling timings + byte audits on the shipped plan -------
log "timeop doublings"
for d in target/tier40 target/tier80 target/tier160; do
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.TimeOp s10_knn_graph,d5_embed_dedup,s2_lsh_ann,d4_ngram_jaccard $d 6" \
    2>/dev/null | grep timeop | sed "s|^|$d |" >> /tmp/regen_timeop.log
done

log "shuffle audit t40->t80 subset"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier40 target/tier80 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T40T80.json" \
  > /tmp/audit_t40t80.log 2>&1
log "shuffle audit t80->t160 subset"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier80 target/tier160 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T80T160.json" \
  > /tmp/audit_t80t160.log 2>&1

log "full 40x shuffle audit"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit /root/testdata/sf0.1 target/tier40 40" \
  > /tmp/audit_40x.log 2>&1

log "full 40x tier bench"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchFullTier 40" \
  > /tmp/benchfull_40x.log 2>&1

log "scale probe 40x"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleProbe 40 /root/testdata/sf0.1" \
  > /tmp/scaleprobe_40x.log 2>&1

log "ALLREGENDONE"
