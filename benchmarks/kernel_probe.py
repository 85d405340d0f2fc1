"""Minimal probe: compile+run time of fused_window_pool alone.

Usage: python benchmarks/kernel_probe.py [n_rois] [P]
Prints compile seconds and per-call ms. No geometry prologue, no
correction — synthetic aligned windows over a synthetic concat2.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.ops.pallas.roi_pool import fused_window_pool

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = int(sys.argv[2]) if len(sys.argv) > 2 else 14
C = 256
WIN_R = WIN_C = 56
SUMH, WMAX = 392 * 8, 336  # box-branch-like totals (B merged into rows)
DT = jnp.bfloat16

rng = np.random.RandomState(0)
concat2 = jnp.asarray(rng.rand(SUMH, WMAX * C).astype(np.float32), DT)
rows8 = jnp.asarray(rng.randint(0, (SUMH - WIN_R) // 8, (N,)), jnp.int32)
cols8 = jnp.asarray(rng.randint(0, (WMAX - WIN_C) // 8, (N,)), jnp.int32)
ry = jnp.asarray(rng.rand(N, P, WIN_R).astype(np.float32), DT)
rx = jnp.asarray(rng.rand(N, P, WIN_C).astype(np.float32), DT)


@jax.jit
def run(c2):
    out = fused_window_pool(c2, rows8, cols8, ry, rx, WIN_R, WIN_C, C)
    return c2 + (jnp.sum(out) * 1e-12).astype(DT)

t0 = time.perf_counter()
c2 = run(concat2)
jax.block_until_ready(c2)
print(f"N={N} P={P}: compile+first = {time.perf_counter()-t0:.1f}s", flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        c2 = run(c2)
    jax.block_until_ready(c2)
    print(f"  per-call: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
