#!/bin/bash
# Round-4 task 1: on-chip A/B of the fused Swin window-attention and
# LayerNorm Pallas kernels (shipped default-on in round 3 with no
# on-chip numbers — VERDICT weak #1). Four variants of the flagship
# bench (Cascade Swin-L BiFPN AFI inference, 896x1408 batch 4),
# run back-to-back on the same chip session; bench.py reports
# best-of-5 + median/spread per variant.
set -u
cd /root/repo
out=benchmarks/results/ab_swin_kernels_r04.jsonl
: > "$out"
for combo in "xla xla" "pallas xla" "xla pallas" "pallas pallas"; do
  set -- $combo
  attn=$1; ln=$2
  echo "=== attn=$attn ln=$ln $(date +%H:%M:%S) ===" >&2
  line=$(BENCH_STAGE=flagship BENCH_SWIN_ATTN=$attn BENCH_SWIN_LN=$ln \
    BENCH_REPEATS=5 BENCH_ITERS=10 BENCH_BATCH=4 \
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
    timeout 3600 python bench.py 2>benchmarks/results/ab_${attn}_${ln}.log)
  echo "{\"attn\": \"$attn\", \"ln\": \"$ln\", \"result\": $line}" >> "$out"
  echo "$line" >&2
done
echo DONE >&2
