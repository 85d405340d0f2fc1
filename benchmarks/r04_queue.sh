#!/bin/bash
# Round-4 serialized TPU queue (single TPU process at a time):
# family dynamics runs, flagship trace recapture, bench prewarm.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log() { echo "=== $1 $(date +%H:%M:%S) ===" >&2; }

log "swin dynamics 150"
timeout 4800 python tools/validate_training.py --family swin --iters 150 \
  --out /tmp/dynval_swin_tpu > /tmp/dynval_swin_tpu.log 2>&1
echo "swin exit=$?" >&2

log "s101 dynamics 100"
timeout 4800 python tools/validate_training.py --family s101 --iters 100 \
  --out /tmp/dynval_s101_tpu > /tmp/dynval_s101_tpu.log 2>&1
echo "s101 exit=$?" >&2

log "fcos_bifpn dynamics 100"
timeout 4800 python tools/validate_training.py --family fcos_bifpn --iters 100 \
  --out /tmp/dynval_fcos_tpu > /tmp/dynval_fcos_tpu.log 2>&1
echo "fcos exit=$?" >&2

log "flagship trace recapture"
timeout 1800 python benchmarks/trace_flagship.py > /tmp/trace_r04.log 2>&1
echo "trace exit=$?" >&2

log "stage-3 bench prewarm (driver program)"
BENCH_REPEATS=3 timeout 3600 python bench.py > /tmp/bench_prewarm.json 2>/tmp/bench_prewarm.log
echo "prewarm exit=$?" >&2
cat /tmp/bench_prewarm.json >&2
log "queue done"
