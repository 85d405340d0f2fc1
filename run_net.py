#!/usr/bin/env python
"""Evaluation CLI — COCO AP for a trained model (ref run_net.py surface).

Usage:
    python run_net.py --config-file configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml \
        --eval-only MODEL.WEIGHTS /path/to/model.msgpack

Training through this entry point is unsupported, matching the reference
(ref run_net.py:105-108 raises NotImplementedError) — use stage*_train.py.
"""

import logging

import jax

from afigan_tpu.data import get_dataset, register_default_datasets
from afigan_tpu.engine.defaults import default_argument_parser, setup
from afigan_tpu.engine.inference import run_inference
from afigan_tpu.engine.testing import verify_results
from afigan_tpu.engine.tta import run_tta_inference
from afigan_tpu.engine.weights import load_weights
from afigan_tpu.models import build_model

logger = logging.getLogger("afigan_tpu")


def count_params(variables):
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def main(args):
    cfg = setup(args)
    if not args.eval_only:
        raise NotImplementedError(
            "run_net.py is eval-only (matching the reference); "
            "use stage1/2/3_train.py for training"
        )
    register_default_datasets(cfg.DATASETS.ROOT)
    dataset = get_dataset(cfg.DATASETS.TEST[0])

    model = build_model(cfg, train=False)
    import jax.numpy as jnp

    h, w = cfg.TPU.IMAGE_BUCKETS[0]
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
        )
    )()
    if cfg.MODEL.WEIGHTS:
        variables = load_weights(cfg.MODEL.WEIGHTS, variables, kind="detector")
    logger.info(f"model parameters: {count_params(variables)/1e6:.2f}M")

    if cfg.TEST.AUG.ENABLED:
        results = run_tta_inference(cfg, model, variables, dataset)
    else:
        # multi-host: each rank evaluates its record stripe and the
        # evaluator allgathers (single-process: both are no-ops)
        results = run_inference(cfg, model, variables, dataset,
                                distributed=True)
    print(results)
    verify_results(cfg, results)  # ref run_net.py:100-101
    return results


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
