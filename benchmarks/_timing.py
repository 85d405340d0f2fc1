"""Shared chained-timing helper for the benchmark scripts.

Chained calls (each iteration consumes the previous iteration's output)
are the only honest timing on the axon TPU backend — independent
repeated calls overlap through the tunnel and report impossible numbers
(see chained_bench.py for the demonstration). Every profile_*.py script
times through this one helper so the methodology can't drift between
scripts.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import jax

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def chained_timed(name, fn, state, *, state_of=None, label_width=16,
                  imgs_per_iter=None, iters=None, repeats=None):
    """Best-of-``repeats`` chained timing of ``fn`` over ``iters`` calls.

    ``fn(state) -> out``; the next call receives ``state_of(out)``
    (identity by default — pass e.g. ``lambda o: o[0]`` when fn returns
    ``(new_state, aux)``; required for donated-buffer steps, whose
    warmup invalidates the original input). Returns best seconds/iter.
    """
    iters = ITERS if iters is None else iters
    repeats = REPEATS if repeats is None else repeats
    state_of = state_of or (lambda out: out)

    out = fn(state)  # compile + warmup
    jax.device_get(jax.tree.leaves(out)[0])
    state = state_of(out)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(state)
            state = state_of(o)
        jax.device_get(jax.tree.leaves(o)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_iter = best / iters
    line = f"{name:>{label_width}}: {per_iter * 1000:8.2f} ms"
    if imgs_per_iter is not None:
        line = (f"{name:>{label_width}}: {per_iter * 1000:8.2f} ms/step  "
                f"{imgs_per_iter / per_iter:7.2f} img/s")
    print(line, flush=True)
    return per_iter
