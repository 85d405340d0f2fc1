"""On-chip probe: deform_conv2d at ResNeSt-101 DCN production shapes.

Round-3 VERDICT task 6: ops/deform_conv.py (the gather-based DCN used by
ResNeSt's DeformBottleneckBlock, ref resnest.py:246-413) had never run
on the TPU. This probe times forward and forward+backward of the 3x3
deformable conv at the res4/res5 bottleneck shapes an S-101-DCN would
run at batch 8 / 800x1344, against a PLAIN 3x3 conv at identical shapes
in the SAME chained harness — the plain conv carries the same harness
floor (per-buffer tunnel overhead, see verify skill), so the DELTA
attributes the true DCN overhead.

Round-5 (r4 VERDICT task 8): the original 10-iter single-pass harness
measured res5 fwd+bwd overhead at -7.3 ms (DCN *faster* than plain —
physically implausible; the tunnel drifts +-10% run to run). The probe
now interleaves the variants A-B-A-B across PROBE_REPS repetitions and
reports median/min/spread per variant, so slow drift hits both arms
equally and the overhead sign is resolved when |overhead| > spread.

Usage: python benchmarks/probe_deform_conv.py
Prints one JSON line per (stage, variant).
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained(fn, x, iters=10):
    import jax

    y = fn(x)
    jax.device_get(jax.tree.leaves(y)[0])  # axon: device_get = true sync
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    jax.device_get(jax.tree.leaves(y)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.ops.deform_conv import deform_conv2d

    b = int(os.environ.get("BENCH_BATCH", "8"))
    # S-101 bottleneck 3x3 shapes at 800x1344 (deep-stem ResNeSt-101,
    # bottleneck widths 256/512 at res4/res5; DCN replaces the 3x3)
    stages = {
        "res4": (b, 50, 84, 256),
        "res5": (b, 25, 42, 512),
    }
    rng = np.random.RandomState(0)
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    for stage, (bb, h, w, c) in stages.items():
        x0 = jnp.asarray(rng.rand(bb, h, w, c).astype(np.float32))
        wgt = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.01)
        offs = jnp.asarray(rng.randn(bb, h, w, 18).astype(np.float32) * 0.5)

        @jax.jit
        def dcn_fwd(x, wgt=wgt, offs=offs):
            y = deform_conv2d(x, offs, wgt, stride=1, padding=1)
            return 0.99 * x + 0.01 * jnp.tanh(y)  # chainable, same shape

        @jax.jit
        def plain_fwd(x, wgt=wgt):
            y = jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return 0.99 * x + 0.01 * jnp.tanh(y)

        def make_train(conv):
            @jax.jit
            def step(x):
                def loss(w_):
                    return jnp.mean(jnp.abs(conv(x, w_)))
                g = jax.grad(loss)(wgt)
                return 0.99 * x + 0.01 * jnp.mean(g)  # chain through grad
            return step

        dcn_conv = lambda x, w_: deform_conv2d(x, offs, w_, stride=1, padding=1)
        plain_conv = lambda x, w_: jax.lax.conv_general_dilated(
            x, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        fns = [("dcn_fwd", dcn_fwd), ("plain_fwd", plain_fwd),
               ("dcn_fwdbwd", make_train(dcn_conv)),
               ("plain_fwdbwd", make_train(plain_conv))]
        reps = int(os.environ.get("PROBE_REPS", "5"))
        samples = {name: [] for name, _ in fns}
        for name, fn in fns:  # compile + first-run warmup outside timing
            chained(fn, x0, 1)
        # interleaved A-B-A-B: every rep times all four variants back to
        # back, so tunnel drift lands on both arms of each delta
        for _ in range(reps):
            for name, fn in fns:
                samples[name].append(chained(fn, x0, iters) * 1e3)
        results = {}
        for name, _ in fns:
            v = sorted(samples[name])
            results[name] = round(float(np.median(v)), 3)
            results[name + "_spread"] = round(v[-1] - v[0], 3)
            results[name + "_samples"] = [round(s, 3) for s in samples[name]]
        for kind in ("fwd", "fwdbwd"):
            ov = results[f"dcn_{kind}"] - results[f"plain_{kind}"]
            spread = max(results[f"dcn_{kind}_spread"],
                         results[f"plain_{kind}_spread"])
            results[f"dcn_overhead_{kind}_ms"] = round(ov, 3)
            results[f"dcn_overhead_{kind}_resolved"] = bool(abs(ov) > spread)
        print(json.dumps({"stage": stage, "shape": [bb, h, w, c],
                          "iters": iters, "reps": reps, **results}))


if __name__ == "__main__":
    main()
