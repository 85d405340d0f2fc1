"""Try a jax.profiler device trace of the flagship inference program.

The axon backend may not support device-side tracing; this script is the
cheap experiment: run the (compile-cached) bench.py flagship program
under start_trace/stop_trace and report what the trace contains.
"""

import glob
import gzip
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from afigan_tpu.config import get_cfg
    from afigan_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/inference/AFI-GAN_cascade_rcnn_swint_BiFPN_ST.yaml"
    )
    b = int(os.environ.get("BENCH_BATCH", "4"))
    h, w = 896, 1408
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[800, 1333]] * b, jnp.int32)
    model = build_model(cfg, train=False)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    fwd = jax.jit(lambda v, x: model.apply(v, x, sizes))  # == bench.py program
    dets, _ = fwd(variables, images)
    jax.device_get(dets.scores)
    print("warmup done", flush=True)

    logdir = "/tmp/flagship_trace"
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    x = images
    for _ in range(3):
        dets, _ = fwd(variables, x)
        x = images + dets.scores[0, 0] * 0
    jax.device_get(dets.scores)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)
    for f in files:
        print(f, os.path.getsize(f))


if __name__ == "__main__":
    main()
