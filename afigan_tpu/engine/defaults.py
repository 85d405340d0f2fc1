"""CLI argument parser + setup (the reference's default_argument_parser surface).

The reference CLI: --config-file --eval-only --resume --num-gpus
--num-machines --machine-rank --dist-url + positional opts
(ref run_net.py:112, README usage). On TPU there is one process per host:
--num-gpus/--dist-url are accepted for compatibility and ignored (the
device mesh comes from jax.devices()); multi-host init happens via
jax.distributed (parallel/mesh.py initialize_distributed).
"""

from __future__ import annotations

import argparse
import os

from ..config import get_cfg
from ..parallel.mesh import initialize_distributed
from .events import setup_logger


def default_argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--num-gpus", type=int, default=1,
                   help="accepted for d2-compat; TPU devices come from jax")
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default="auto")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logger("afigan_tpu", cfg.OUTPUT_DIR)
    initialize_distributed()
    return cfg
