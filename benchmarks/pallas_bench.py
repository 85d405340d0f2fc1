"""Fused RDB Pallas kernel vs the XLA (flax) module — on-chip delta.

The BASELINE north star: the AF interpolator's dense-conv chain fused
into one VMEM-resident kernel (ops/pallas/afi_rdb.py). This measures the
compiled kernel against the identical-math XLA path at the production
shape (C=256, G=32) across the pyramid levels the generator actually
sees at 800x1344 inference (p5->p4, p4->p3, p3->p2 inputs).

Run (real TPU; Mosaic compile ~25-35s/shape with the v2 aligned-slice
kernel, then cached):
    python benchmarks/pallas_bench.py

Timing note: on the axon backend only CHAINED calls synced by
device_get measure real execution (see chained_bench.py).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from afigan_tpu.models.afi.generator import ResidualDenseBlock
from afigan_tpu.ops.pallas import fused_rdb


def main():
    c, g = 256, 32
    model = ResidualDenseBlock(growth_rate=g, residual_scale=0.2)
    rng = np.random.RandomState(0)
    # generator input shapes at 800x1344 (levels p5, p4, p3 of the
    # half-res stream feeding the 2x upsampler)
    shapes = [(1, 25, 42, c), (1, 50, 84, c), (1, 100, 168, c)]
    iters = int(os.environ.get("BENCH_ITERS", "30"))

    x0 = jnp.asarray(rng.randn(*shapes[0]).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    weights = [params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]

    fused_fn = jax.jit(lambda x, ws: fused_rdb(x, ws, 0.2))

    for dtype in (np.float32, jnp.bfloat16):
      # per-dtype module so the XLA path computes in the same dtype the
      # fused kernel receives (production inference is bf16)
      mdl = ResidualDenseBlock(growth_rate=g, residual_scale=0.2,
                               dtype=jnp.dtype(dtype))
      xla_fn = jax.jit(lambda p, x, m=mdl: m.apply({"params": p}, x))
      for shape in shapes:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)

        # chained timing: each call's input depends on the previous output
        def timed_input_chained(fn, x, other):
            out = fn(x, other) if fn is fused_fn else fn(other, x)
            jax.device_get(out)
            t0 = time.perf_counter()
            prev = out
            for _ in range(iters):
                xc = x + prev.reshape(-1)[0] * 0
                out = fn(xc, other) if fn is fused_fn else fn(other, xc)
                prev = out
            jax.device_get(out)
            return (time.perf_counter() - t0) / iters * 1e3, out

        ms_xla, out_xla = timed_input_chained(xla_fn, x, params)
        ms_fused, out_fused = timed_input_chained(fused_fn, x, weights)
        err = float(
            jnp.abs(out_xla.astype(jnp.float32) - out_fused.astype(jnp.float32)).max()
        )
        print(json.dumps({
            "dtype": str(jnp.dtype(dtype).name),
            "shape": list(shape),
            "xla_ms": round(ms_xla, 3),
            "fused_ms": round(ms_fused, 3),
            "speedup": round(ms_xla / ms_fused, 3),
            "max_abs_err": err,
        }))


if __name__ == "__main__":
    main()
