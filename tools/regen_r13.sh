#!/bin/bash
# Round-13 artifact regeneration: the standing four (tier gates, byte
# audits, bucket probes, clean bench) plus this round's additions — the
# tier320 full gate (CORRECTNESS_SF32.json), the tier640 d5/s10 subset
# gate (first corpus past the old 1M oracle ceiling, k = 13), and the
# band-recall floor gate (tools/check_floors.py — fails if the shipped
# width's measured quality ever drops below the r12 floors).
#
# Fixes vs regen_r12.sh (round-12 ADVICE): the possibly-empty `extra`
# array is expanded with the ${arr[@]+...} guard (bash < 4.4 under
# `set -u` errors on bare empty-array expansion), and BandRecall covers
# tier160 so re-running the script reproduces the committed artifact
# instead of silently dropping its deepest tier.
#
# Serialized: one sbt at a time (project target lock). Run from
# /root/repo. Wall-clock phases (TimeOp/Bench*) REQUIRE an idle machine
# — run them before launching any DuckDB check; correctness checks and
# byte audits are contention-immune.
set -u
cd /root/repo
log() { echo "[regen $(date +%H:%M:%S)] $*"; }

# --- Phase A: tier correctness gates (stale-proof: fresh out dir, a
# Verify failure skips its check instead of comparing stale parquet).
# Optional 3rd arg: comma-separated op subset (tier640's full-inventory
# DuckDB run would take many hours; its gate is the LSH family that the
# new k=13 regime actually exercises).
gate() { # gate <tier-mult> <json> [ops]
  local t=$1 j=$2 ops=${3:-}
  log "verify tier$t ${ops:+(subset $ops)}"
  rm -rf /tmp/verify_t$t
  GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/tier$t /tmp/verify_t$t $ops" \
    > /tmp/verify_t$t.log 2>&1 || { log "VERIFY tier$t FAILED — check skipped"; return 1; }
  log "check tier$t -> $j"
  local extra=()
  [ "$t" -ge 40 ] && extra=(GRAFT_CHECK_MEM=90GB)
  env GRAFT_CHECK_JSON=$j GRAFT_CHECK_THREADS=16 ${extra[@]+"${extra[@]}"} \
    python3 tools/check.py target/tier$t /tmp/verify_t$t $ops \
    > /tmp/check_t$t.log 2>&1
  tail -1 /tmp/check_t$t.log
}

# standing largest-tier gate + this round's two new scale points
gate 160 CORRECTNESS_SF16.json
gate 320 CORRECTNESS_SF32.json        # round-13 item 1: first tier320 gate
gate 640 CORRECTNESS_SF64_LSH.json \
  d5_embed_dedup,s2_lsh_ann,s7_multiprobe,s9_recall_matrix,s10_knn_graph
                                      # round-13 item 6: k=13 oracle proof

# Tier-scale runs pin GRAFT_AQE_INITIAL=512 (GraftSession env knob):
# planner-inserted exchanges start wide and AQE coalesces down, the
# cluster recipe — without it d4/d16's pair stages sort 140M-row
# streams through 32 tasks (27 GB spill at tier320). The sf0.1 bench
# phases run at the session default (the committed round-over-round
# contract); see GraftSession.scala.

# --- Phase B: probes + byte audits (contention-immune) -----------------
log "bucket probes -> PROBE_BUCKETS.json"
GRAFT_PROBE_JSON=PROBE_BUCKETS.json SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.ProbeBuckets target/tier40 target/tier80 target/tier160 target/tier320 target/tier640" \
  > /tmp/probebuckets.log 2>&1

log "shuffle audit t160->t320 subset"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier160 target/tier320 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T160T320.json" \
  > /tmp/audit_t160t320.log 2>&1
log "shuffle audit t320->t640 subset"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier320 target/tier640 2 d5_embed_dedup,s10_knn_graph,s2_lsh_ann SHUFFLE_AUDIT_2x_T320T640.json" \
  > /tmp/audit_t320t640.log 2>&1
log "full 40x shuffle audit"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit /root/testdata/sf0.1 target/tier40 40" \
  > /tmp/audit_40x.log 2>&1

# --- Phase C: wall-clock (IDLE MACHINE ONLY; every artifact carries
# load1_start/load1_end so contamination self-identifies) ---------------
log "timeop doublings (incl. item-2 sized-shuffle t160->t320 and item-5 t320->t640)"
for d in target/tier160 target/tier320 target/tier640; do
  GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.TimeOp s10_knn_graph,d5_embed_dedup,s2_lsh_ann $d 6" \
    2>/dev/null | grep timeop | sed "s|^|$d |" >> /tmp/regen_timeop.log
done
log "full 40x tier bench"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchFullTier 40" > /tmp/benchfull_40x.log 2>&1
log "committed clean bench reference (sf0.1)"
GRAFT_BENCH_COMMIT=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_ref.log 2>&1

# --- Phase D: band recall + floor gate ----------------------------------
# tier160 included (round-12 ADVICE: the committed artifact carries it).
log "band recall t40/t80/t160 -> BAND_RECALL.json"
GRAFT_BAND_WS=256,512 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BandRecall BAND_RECALL.json target/tier40 target/tier80 target/tier160" \
  > /tmp/bandrecall.log 2>&1
log "band-quality floor gate (round-13 item 4)"
python3 tools/check_floors.py BAND_RECALL.json 512 || { log "FLOOR GATE FAILED"; exit 1; }

log "ALLREGENDONE"
