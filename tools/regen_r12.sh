#!/bin/bash
# Round-12 artifact regeneration after the W=256 -> 512 band re-size
# (s10/d5 outputs change at any tier holding a bucket in (257, inf);
# the probe decides which gates those are — see PROBE_BUCKETS.json).
# Serialized: one sbt at a time (project target lock). Run from
# /root/repo. Wall-clock phases (TimeOp/Bench*) REQUIRE an idle machine
# — run them before launching any DuckDB check; correctness checks and
# byte audits are contention-immune.
set -u
cd /root/repo
log() { echo "[regen $(date +%H:%M:%S)] $*"; }

# --- Phase A: tier correctness gates (stale-proof: fresh out dir, a
# Verify failure skips its check instead of comparing stale parquet) ---
gate() { # gate <tier-mult> <json>
  local t=$1 j=$2
  log "verify tier$t"
  rm -rf /tmp/verify_t$t
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/tier$t /tmp/verify_t$t" \
    > /tmp/verify_t$t.log 2>&1 || { log "VERIFY tier$t FAILED — check skipped"; return 1; }
  log "check tier$t -> $j"
  local extra=()
  [ "$t" -ge 40 ] && extra=(GRAFT_CHECK_MEM=90GB)
  env GRAFT_CHECK_JSON=$j GRAFT_CHECK_THREADS=16 "${extra[@]}" \
    python3 tools/check.py target/tier$t /tmp/verify_t$t \
    > /tmp/check_t$t.log 2>&1
  tail -1 /tmp/check_t$t.log
}

# affected tiers per PROBE_BUCKETS.json (both banks' max|bucket| > 257):
gate 40  CORRECTNESS_SF4.json
gate 80  CORRECTNESS_SF8.json
gate 160 CORRECTNESS_SF16.json   # round-12 item 4: first tier160 gate

# --- Phase B: probes + byte audits (contention-immune) -----------------
log "bucket probes -> PROBE_BUCKETS.json"
GRAFT_PROBE_JSON=PROBE_BUCKETS.json SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.ProbeBuckets target/tier40 target/tier80 target/tier160" \
  > /tmp/probebuckets.log 2>&1

log "shuffle audit t40->t80 subset"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier40 target/tier80 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T40T80.json" \
  > /tmp/audit_t40t80.log 2>&1
log "shuffle audit t80->t160 subset"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier80 target/tier160 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T80T160.json" \
  > /tmp/audit_t80t160.log 2>&1
log "full 40x shuffle audit"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit /root/testdata/sf0.1 target/tier40 40" \
  > /tmp/audit_40x.log 2>&1

# --- Phase C: wall-clock (IDLE MACHINE ONLY; every artifact now carries
# load1_start/load1_end so contamination self-identifies) ---------------
log "timeop doublings (incl. item-5 t160->t320 d5 envelope point)"
for d in target/tier40 target/tier80 target/tier160 target/tier320; do
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.TimeOp s10_knn_graph,d5_embed_dedup,s2_lsh_ann,d4_ngram_jaccard $d 6" \
    2>/dev/null | grep timeop | sed "s|^|$d |" >> /tmp/regen_timeop.log
done
log "full 40x tier bench"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchFullTier 40" > /tmp/benchfull_40x.log 2>&1
log "scale probe 40x"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleProbe 40 /root/testdata/sf0.1" > /tmp/scaleprobe_40x.log 2>&1
log "committed clean bench reference (sf0.1)"
GRAFT_BENCH_COMMIT=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_ref.log 2>&1

# --- Phase D: band recall evidence (round-12 item 1) --------------------
log "band recall t40/t80 -> BAND_RECALL.json"
GRAFT_BAND_WS=256,512 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BandRecall BAND_RECALL.json target/tier40 target/tier80" \
  > /tmp/bandrecall.log 2>&1

log "ALLREGENDONE"
