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

from typing import Optional, Sequence

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
    """Place a host batch pytree with the leading dim sharded over `data`."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def initialize_distributed():
    """Multi-host init (no-op single host). Call before device queries."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


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
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray([value], np.float32))
    return float(np.max(gathered))
