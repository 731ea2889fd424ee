#!/bin/bash
# Round-14 artifact regeneration. Theme: make every round-13 claim true
# on the shipped plan, with provenance. Every artifact this script
# produces carries git_sha (Bench.gitStamp / check.py _meta fold-in), so
# a stale-artifact-vs-claim mismatch self-identifies (r13 verdict #4).
#
# PHASE ORDER IS THE PROTOCOL (r13 verdict #6): wall-clock and
# spill/peak-mem-bearing runs (audits, ProbeExec, benches) come FIRST,
# strictly serialized on an otherwise-idle machine — round 13's
# t320->t640 audit ran beside a 90 GB DuckDB check and recorded 53 GB
# of d5 "spill" that a quiet rerun shows as zero. Only after every
# wall/spill artifact is written do the DuckDB correctness checks
# start (those are contention-immune: they compare values).
set -u
cd /root/repo
log() { echo "[regen $(date +%H:%M:%S)] $*"; }

# --- Phase W: wall-clock + spill-bearing runs (IDLE MACHINE, serial) ---
log "shuffle audit t160->t320 subset (expect d4 spill_b ~ 0 on the sized exchange)"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier160 target/tier320 2 d2_minhash_lsh,d4_ngram_jaccard,d5_embed_dedup,s10_knn_graph,t5_top_terms SHUFFLE_AUDIT_2x_T160T320.json" \
  > /tmp/audit_t160t320_r14.log 2>&1
log "shuffle audit t320->t640 subset (expect d5 spill_b ~ 0; d5 gated at its designed mult^1.5 envelope)"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ShuffleAudit target/tier320 target/tier640 2 d5_embed_dedup,s10_knn_graph,s2_lsh_ann SHUFFLE_AUDIT_2x_T320T640.json" \
  > /tmp/audit_t320t640_r14.log 2>&1
log "ProbeExec t320 d4/d16/d5 (sized-count zero-spill evidence for the conditional repartition)"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ProbeExec target/tier320 d4_ngram_jaccard d16_containment_dedup d5_embed_dedup" \
  > /tmp/probeexec_t320_r14.log 2>&1
log "committed clean bench reference sf0.1 (expect d4/d16 recovered: explicit count only when want > floor)"
GRAFT_BENCH_COMMIT=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_ref_r14.log 2>&1
log "band recall t40/t80/t160 -> BAND_RECALL.json (SHA-stamped for the floor gate)"
GRAFT_BAND_WS=256,512 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BandRecall BAND_RECALL.json target/tier40 target/tier80 target/tier160" \
  > /tmp/bandrecall_r14.log 2>&1
log "band-quality floor gate (now refuses artifacts whose git_sha != HEAD)"
python3 tools/check_floors.py BAND_RECALL.json 512 || { log "FLOOR GATE FAILED"; exit 1; }

# --- Phase V: Spark dumps for the gates (sbt-serial; DuckDB not yet) ---
log "verify tier320 full inventory on HEAD"
rm -rf /tmp/verify_t320_r14
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/tier320 /tmp/verify_t320_r14" \
  > /tmp/verify_t320_r14.log 2>&1 || { log "VERIFY t320 FAILED"; exit 1; }
log "verify tier640 LSH subset on HEAD"
rm -rf /tmp/verify_t640_r14
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/tier640 /tmp/verify_t640_r14 d5_embed_dedup,s2_lsh_ann,s7_multiprobe,s9_recall_matrix,s10_knn_graph" \
  > /tmp/verify_t640_r14.log 2>&1 || { log "VERIFY t640 FAILED"; exit 1; }

# --- Phase C: DuckDB gates (contention-immune; split by measured
# oracle cost, merged with provenance checks). d5's tier320 oracle is
# the long pole (hours) — it gets its own process; everything else
# rides one split. check.py writes its JSON INCREMENTALLY now, so an
# interrupted run leaves a partial artifact marked complete:false
# (merge_correctness refuses those) instead of nothing.
log "check tier320 d5 (long pole, own split)"
GRAFT_CHECK_JSON=/tmp/ct320_d5.json GRAFT_CHECK_THREADS=16 GRAFT_CHECK_MEM=60GB \
  python3 tools/check.py target/tier320 /tmp/verify_t320_r14 d5_embed_dedup \
  > /tmp/check_t320_d5_r14.log 2>&1 &
D5PID=$!
log "check tier320 rest (110 ops)"
REST=$(python3 - <<'EOF'
import json
o = sorted(json.load(open('/tmp/verify_t320_r14/oracle_sql.json')))
print(','.join(k for k in o if k != 'd5_embed_dedup'))
EOF
)
GRAFT_CHECK_JSON=/tmp/ct320_rest.json GRAFT_CHECK_THREADS=12 GRAFT_CHECK_MEM=40GB \
  python3 tools/check.py target/tier320 /tmp/verify_t320_r14 "$REST" \
  > /tmp/check_t320_rest_r14.log 2>&1
wait $D5PID
log "merge tier320 gate -> CORRECTNESS_SF32.json"
python3 tools/merge_correctness.py CORRECTNESS_SF32.json /tmp/ct320_d5.json /tmp/ct320_rest.json

# tier640 LSH gate: s2/s7/s9/s10 checked here; d5's tier640 oracle is
# LOCALLY INFEASIBLE (its tier320 oracle already runs for hours and the
# banded self-join's candidate mass grows at e=1.43 per doubling) — the
# gate artifact records it as status "infeasible_local" explicitly
# instead of leaving the subset implicit (r13 verdict #7).
log "check tier640 LSH subset (minus d5)"
GRAFT_CHECK_JSON=/tmp/ct640_lsh.json GRAFT_CHECK_THREADS=16 GRAFT_CHECK_MEM=80GB \
  python3 tools/check.py target/tier640 /tmp/verify_t640_r14 s2_lsh_ann,s7_multiprobe,s9_recall_matrix,s10_knn_graph \
  > /tmp/check_t640_lsh_r14.log 2>&1
log "stamp d5 infeasibility + write CORRECTNESS_SF64_LSH.json"
python3 tools/stamp_infeasible.py /tmp/ct640_lsh.json CORRECTNESS_SF64_LSH.json \
  d5_embed_dedup "tier640 oracle (banded self-join over n=1.28M, candidate mass e=1.43/doubling) exceeds local DuckDB budget; d5 gated at tier320 in CORRECTNESS_SF32.json, tier640 correctness evidence = band-recall floors + row-count/exponent series (SCALE_UP_T320T640.json)"

log "ALLREGENDONE"
