"""Device mesh + sharding helpers — the TPU-native distribution substrate.

Replaces the reference's NCCL/DDP stack (SURVEY §2.4, §5.8):
  * d2 ``launch`` (1 process per GPU) → one process per host,
    ``jax.distributed.initialize`` for multi-host.
  * DDP gradient allreduce → ``psum`` over the ``data`` mesh axis inside
    the shard_map'ped train step.
  * ``comm.gather`` metric/eval aggregation → in-step psum/pmax and
    host-side ``process_allgather``.

The mesh is 1-D (``data``) for parity with the reference's pure data
parallelism; the axis list in cfg.TPU.MESH_AXES leaves room for model
axes later without touching call sites.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] = (-1,),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def mesh_from_cfg(cfg, devices=None) -> Mesh:
    return make_mesh(cfg.TPU.MESH_AXES, cfg.TPU.MESH_SHAPE, devices)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading dim sharded over `data`.

    Single-process: a plain device_put onto the sharded layout. Multi-
    process: each host holds only ITS shard of the global batch (the
    loaders stripe records per process), so the global array is assembled
    from per-process local data — the jax equivalent of d2's per-rank
    IMS_PER_BATCH/world_size split (ref stage1_trainer.py:577-589).
    """
    s = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch,
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a host pytree over the mesh.

    Multi-process: assembled collective-FREE from per-process local
    buffers via ``make_array_from_single_device_arrays``. A plain
    ``device_put`` to a cross-process sharding runs a Gloo/``assert_equal``
    consistency collective per leaf with a hard ~30 s rendezvous — rank
    skew (imports, compiles) routinely exceeds that and deadlocks the
    job. Callers guarantee every process passes the same values (states
    are derived from the same PRNG seed / checkpoint), which is exactly
    the contract device_put was re-verifying.
    """
    r = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, r), tree)
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]

    def put(x):
        x = np.asarray(x)
        bufs = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, r, bufs)

    return jax.tree.map(put, tree)


def _coord_client():
    """The jax coordination-service client (requires distributed init)."""
    from jax._src import distributed

    client = distributed.global_state.client
    assert client is not None, "jax.distributed.initialize() was not called"
    return client


def barrier(name: str, timeout_s: int = 600) -> None:
    """Cross-process rendezvous via the coordination service.

    Unlike Gloo collectives (hard ~30 s window), the timeout here is
    explicit and generous — use it to line ranks up immediately before
    executing a collective-bearing program so compile-time skew never
    lands inside a Gloo rendezvous.
    """
    if jax.process_count() == 1:
        return
    _coord_client().wait_at_barrier(f"afigan/barrier/{name}", timeout_s * 1000)


_KV_SEQ = itertools.count()


def kv_allgather_bytes(payload: bytes, tag: str = "ag",
                       timeout_s: int = 600) -> List[bytes]:
    """Gather one bytes payload per process via the coordination-service
    KV store (d2 ``comm.gather`` equivalent for host-side objects).

    Skew-immune by construction: each rank publishes its key then
    blocking-reads the others with an explicit long timeout — no Gloo
    rendezvous anywhere. Calls must be SPMD (same sequence on every
    process); the module-level sequence number keeps keys unique per
    call.
    """
    n, i = jax.process_count(), jax.process_index()
    if n == 1:
        return [payload]
    client = _coord_client()
    base = f"afigan/kv/{tag}/{next(_KV_SEQ)}"
    client.key_value_set_bytes(f"{base}/{i}", payload)
    out = [
        client.blocking_key_value_get_bytes(f"{base}/{j}", timeout_s * 1000)
        for j in range(n)
    ]
    # everyone has read every key before rank 0 may clean up
    client.wait_at_barrier(f"{base}/done", timeout_s * 1000)
    if i == 0:
        try:
            client.key_value_delete(f"{base}/")
        except Exception:  # pragma: no cover - cleanup best-effort
            pass
    return out


# Env vars that indicate a managed multi-process launch where
# jax.distributed.initialize() can resolve the coordinator (explicit
# address, SLURM, TPU pod / megascale). Attempting auto-detect WITHOUT
# any signal is unsafe here: metadata-server probes can stall startup
# on single-chip environments.
_CLUSTER_SIGNALS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "SLURM_JOB_ID",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def initialize_distributed():
    """Multi-host init (no-op single host). Call before device queries."""
    import os

    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # explicit address: failures should surface
        jax.distributed.initialize()
        return
    if any(os.environ.get(v) for v in _CLUSTER_SIGNALS):
        try:
            jax.distributed.initialize()  # cluster auto-detect
        except Exception as e:  # pragma: no cover - env specific
            import logging

            logging.getLogger("afigan_tpu").warning(
                f"jax.distributed.initialize() failed ({e}); "
                "continuing single-process"
            )


def assert_uniform_across_processes(value, what: str) -> None:
    """Fail fast when processes disagree on a host-side scalar (e.g. the
    resumed iteration when a checkpoint exists on some hosts only —
    replicate() cannot detect mismatched buffers, and training would mix
    inconsistent states silently)."""
    if jax.process_count() == 1:
        return
    import pickle

    payloads = kv_allgather_bytes(pickle.dumps(value), tag=f"uniform/{what}")
    values = [pickle.loads(b) for b in payloads]
    if any(v != values[0] for v in values[1:]):
        raise RuntimeError(
            f"processes disagree on {what}: {values} — all hosts must see "
            "the same checkpoints/config (shared OUTPUT_DIR required)"
        )


def process_is_main() -> bool:
    return jax.process_index() == 0


def cross_process_max(value: float) -> float:
    """Max of a host-side scalar across processes (single-process: identity).

    d2's SimpleTrainer reports data_time as the MAX over workers (the
    slowest loader stalls every replica's step under data parallelism,
    ref d2 train_loop _write_metrics semantics); this is its equivalent
    for the one-process-per-host launch model — a one-element allgather
    per call, same cadence d2 pays with comm.gather.
    """
    if jax.process_count() == 1:
        return float(value)
    import struct

    bufs = kv_allgather_bytes(struct.pack("<d", float(value)), tag="hostmax")
    return max(struct.unpack("<d", b)[0] for b in bufs)
