#!/bin/bash
# Round-15 verdict item 4: the driver's 32-vs-8-core scaling block runs
# at sf0.1, where the ~0.15-0.2 s/op job-scheduling floor hides any
# core-count effect (every ratio ~1). This measures the same comparison
# where there is real work: tier160 (16x sf0.1), the ~12 most expensive
# ops, TimeOp min-of-3 at SPARK_GRAFT_CPUS=32 then 8. Output parsed into
# plans/r15/probes/SCALING_TIER160_8v32.json by scaling_tier_parse.py.
set -u
cd /root/repo
OPS="d4_ngram_jaccard,d16_containment_dedup,d12_bloom_decontaminate,d7_dup_groups,d2_minhash_lsh,d5_embed_dedup,s10_knn_graph,t5_top_terms,q3_topk,d9_decontaminate,q5_multijoin,d15_curation_funnel"
log() { echo "[scaling $(date +%H:%M:%S)] $*"; }
log "tier160 at 32 cores"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.TimeOp $OPS target/tier160 3" > /tmp/scaling_t160_c32.log 2>&1 \
  || { log "32-core run FAILED"; exit 1; }
log "tier160 at 8 cores"
GRAFT_AQE_INITIAL=512 SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.TimeOp $OPS target/tier160 3" > /tmp/scaling_t160_c8.log 2>&1 \
  || { log "8-core run FAILED"; exit 1; }
log "parse -> plans/r15/probes/SCALING_TIER160_8v32.json"
python3 tools/scaling_tier_parse.py /tmp/scaling_t160_c32.log /tmp/scaling_t160_c8.log \
  plans/r15/probes/SCALING_TIER160_8v32.json
log "SCALING_DONE"
