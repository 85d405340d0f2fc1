#!/bin/bash
# Round-5 queue, part 3: re-runs with the 160-channel pooler fallback
# (the first centermask attempts hit the Mosaic lane-alignment limit of
# the fused Pallas pooler), the re-guarded TTA batched arm, and the NMS
# block-size A/B through the full infer program.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
R=benchmarks/results
log() { echo "=== $1 $(date +%H:%M:%S) ===" >&2; }

log "centermask bench (fallback pooler)"
BENCH_STAGE=centermask timeout 5400 python bench.py > $R/centermask_b8.json 2>$R/centermask_b8.log
echo "centermask bench exit=$?" >&2

log "centermask dynamics 150"
timeout 5400 python tools/validate_training.py --family centermask --iters 150 \
  --out /tmp/dynval_cm_r05 > /tmp/dynval_cm_r05.log 2>&1
echo "centermask dynamics exit=$?" >&2

log "TTA batch-8 arm (guarded)"
out=$(BENCH_STAGE=tta BENCH_TTA_BATCH=8 BENCH_TTA_IMAGES=6 timeout 7200 python bench.py 2>>$R/tta_batch_ab_r05.log)
echo "{\"tta_batch\": 8, \"bench\": $out}" >> $R/tta_batch_ab_r05.jsonl

log "NMS block A/B"
: > $R/nms_block_ab_r05.jsonl
for rep in 1 2; do
  for bs in 128 256; do
    out=$(BENCH_STAGE=infer AFIGAN_NMS_BLOCK=$bs timeout 3600 python bench.py 2>>$R/nms_block_ab_r05.log)
    echo "{\"rep\": $rep, \"block\": $bs, \"bench\": $out}" >> $R/nms_block_ab_r05.jsonl
  done
done

log "queue3 done"
