#!/bin/bash
# Round-14 artifact regeneration. Theme: make every round-13 claim true
# on the shipped plan, with provenance. Every artifact carries
# git_sha/git_dirty (Bench.gitStamp; Verify writes _meta.json beside its
# dumps and check.py folds it into the correctness JSON), so a
# stale-artifact-vs-claim mismatch self-identifies (r13 verdict #4).
#
# PHASE ORDER IS THE PROTOCOL (r13 verdict #6): wall-clock and
# spill/peak-mem-bearing runs come FIRST, strictly serialized on an
# otherwise-idle machine — round 13's t320->t640 audit ran beside a
# 90 GB DuckDB check and its spill/peak-mem columns were untrustable.
# Only after every wall/spill artifact is written do the DuckDB
# correctness checks start (contention-immune: they compare values).
#
# Phase W  (serial, idle): both doubling shuffle audits, then the
#          committed clean bench. ShuffleAudit now carries load1 stamps
#          and a per-op gate override (d5 at its designed mult^1.5).
# Phase VC (tools/phaseVC_r14.sh): HEAD-stamped Verify dumps for
#          tier320 (full), tier160 (full), tier640 (LSH subset), then
#          parallel DuckDB splits merged into CORRECTNESS_SF32 /
#          CORRECTNESS_SF16 / CORRECTNESS_SF64_LSH. d5's tier640 oracle
#          is recorded infeasible_local explicitly (stamp_infeasible).
#
# BAND_RECALL.json is NOT regenerated this round: the banding rule, W,
# and plane bank are untouched since r13, so the committed floors stand
# (check_floors warns on its missing git_sha; it predates the stamp).
# Any round that touches banding must rerun BandRecall + check_floors.
set -u
cd /root/repo
log() { echo "[regen $(date +%H:%M:%S)] $*"; }

log "Phase W: audits + bench (idle machine, serialized)"
log "shuffle audit t160->t320 subset"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier160 target/tier320 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T160T320.json" \
  > /tmp/audit_t160t320_regen.log 2>&1
log "shuffle audit t320->t640 subset"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier320 target/tier640 2 d5_embed_dedup,s10_knn_graph,s2_lsh_ann SHUFFLE_AUDIT_2x_T320T640.json" \
  > /tmp/audit_t320t640_regen.log 2>&1
log "committed clean bench reference (sf0.1)"
GRAFT_BENCH_COMMIT=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_ref_regen.log 2>&1
log "band-quality floor gate (committed artifact; refuses git_sha != HEAD when stamped)"
python3 tools/check_floors.py BAND_RECALL.json 512 || { log "FLOOR GATE FAILED"; exit 1; }

log "Phase VC: tier gates"
bash tools/phaseVC_r14.sh
log "ALLREGENDONE"
