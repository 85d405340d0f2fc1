"""Device trace of the R-50 inference program (BENCH_STAGE=infer).

Round-4 VERDICT task 4: R-50 Mask R-CNN inference measures 57.7 img/s
(~13% MFU) and never got the device-time breakdown the flagship has
(flagship_breakdown_r04.txt). This captures the EXACT bench.py infer
program (Mask R-CNN R-50-FPN+AFI, 800x1344, chained batch forwards)
under the profiler; feed the logdir to breakdown_flagship.py for the
category table.

Usage: python benchmarks/trace_infer.py   (writes /tmp/infer_trace)
"""

import glob
import os
import sys

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
        "/root/repo/configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml")
    b = int(os.environ.get("BENCH_BATCH", "8"))
    h, w = 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[h, w]] * b, jnp.int32)
    model = build_model(cfg, train=False)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes)
    )()
    fwd = jax.jit(lambda v, x: model.apply(v, x, sizes))  # == bench.py program
    dets, _ = fwd(variables, images)
    jax.device_get(dets.scores)
    print("warmup done", flush=True)

    logdir = os.environ.get("TRACE_DIR", "/tmp/infer_trace")
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    x = images
    for _ in range(3):
        dets, _ = fwd(variables, x)
        x = images + dets.scores[0, 0] * 0  # chain: defeat dispatch overlap
    jax.device_get(dets.scores)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    for f in files:
        print(f, os.path.getsize(f))


if __name__ == "__main__":
    main()
