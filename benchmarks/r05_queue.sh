#!/bin/bash
# Round-5 serialized TPU queue (single TPU process at a time).
# Run AFTER the s101 dynamics run finishes. Jobs, in order:
#   1. flagship qkv-layout A/B (split vs headmajor), interleaved A-B reps
#   2. flagship scores-dtype A/B (f32 vs bf16) on the headmajor layout
#   3. R-50 inference device trace (feed to breakdown_flagship.py)
#   4. TTA batch A/B (1 vs 8) through the real engine/tta.py path
#   5. CenterMask R-50-BiFPN stage-3 bench (first on-chip run)
#   6. CenterMask 300-iter dynamics + keypoint 150-iter dynamics
#   7. deform-conv probe re-run (interleaved harness)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
R=benchmarks/results
log() { echo "=== $1 $(date +%H:%M:%S) ===" >&2; }

log "flagship qkv A/B"
: > $R/ab_swin_struct_r05.jsonl
for rep in 1 2 3; do
  for qkv in split headmajor; do
    out=$(BENCH_STAGE=flagship BENCH_SWIN_QKV=$qkv timeout 3600 python bench.py 2>>$R/ab_swin_struct_r05.log)
    echo "{\"rep\": $rep, \"qkv\": \"$qkv\", \"scores\": \"float32\", \"bench\": $out}" >> $R/ab_swin_struct_r05.jsonl
  done
done

log "flagship scores A/B (headmajor)"
for rep in 1 2 3; do
  for sc in float32 bfloat16; do
    out=$(BENCH_STAGE=flagship BENCH_SWIN_QKV=headmajor BENCH_SWIN_SCORES=$sc timeout 3600 python bench.py 2>>$R/ab_swin_struct_r05.log)
    echo "{\"rep\": $rep, \"qkv\": \"headmajor\", \"scores\": \"$sc\", \"bench\": $out}" >> $R/ab_swin_struct_r05.jsonl
  done
done

log "r50 inference trace"
timeout 2400 python benchmarks/trace_infer.py > /tmp/trace_infer.log 2>&1
echo "trace exit=$?" >&2
python benchmarks/breakdown_flagship.py /tmp/infer_trace > $R/infer_breakdown_r05.txt 2>>$R/ab_swin_struct_r05.log
echo "breakdown exit=$?" >&2

log "TTA batch A/B"
: > $R/tta_batch_ab_r05.jsonl
for b in 1 8; do
  out=$(BENCH_STAGE=tta BENCH_TTA_BATCH=$b BENCH_TTA_IMAGES=6 timeout 14400 python bench.py 2>>$R/tta_batch_ab_r05.log)
  echo "{\"tta_batch\": $b, \"bench\": $out}" >> $R/tta_batch_ab_r05.jsonl
done

log "centermask bench"
BENCH_STAGE=centermask timeout 7200 python bench.py > $R/centermask_b8.json 2>$R/centermask_b8.log
rc=$?
echo "centermask bench exit=$rc" >&2
if [ $rc -ne 0 ]; then
  # AOT guard refusal or OOM-safe exit: retry at batch 4
  log "centermask bench retry batch 4"
  BENCH_STAGE=centermask BENCH_BATCH=4 timeout 7200 python bench.py > $R/centermask_b4.json 2>$R/centermask_b4.log
  echo "centermask b4 exit=$?" >&2
fi

log "centermask dynamics 300"
timeout 7200 python tools/validate_training.py --family centermask --iters 300 \
  --out /tmp/dynval_cm_r05 > /tmp/dynval_cm_r05.log 2>&1
echo "centermask dynamics exit=$?" >&2

log "keypoint dynamics 150"
timeout 7200 python tools/validate_training.py --family keypoint --iters 150 \
  --out /tmp/dynval_kp_r05 > /tmp/dynval_kp_r05.log 2>&1
echo "keypoint dynamics exit=$?" >&2

log "deform probe"
timeout 3600 python benchmarks/probe_deform_conv.py > $R/deform_probe_r05.json 2>$R/deform_probe_r05.log
echo "deform exit=$?" >&2

log "queue done"
