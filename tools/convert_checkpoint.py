#!/usr/bin/env python
"""Convert reference torch/d2/Caffe2 checkpoints to native msgpack trees.

Covers the reference's checkpoint zoo (SURVEY §5.4): d2 model-zoo ``.pkl``
(guide / stage init), Caffe2 ImageNet ``.pkl`` (stage-3 backbone init),
and stage-1/2 ``.pth`` outputs (G_0/D_0/AFExtractor state dicts).

Usage:
    python tools/convert_checkpoint.py --config-file <cfg.yaml> \
        --input model_final.pkl --output model.msgpack \
        [--kind detector|generator|discriminator]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind", default="detector",
                   choices=["detector", "generator", "discriminator"])
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from afigan_tpu.config import get_cfg
    from afigan_tpu.engine.weights import load_weights
    from afigan_tpu.models import build_model
    from afigan_tpu.models.afi import AFIGenerator, PatchDiscriminator

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    if args.kind == "detector":
        model = build_model(cfg, train=False)
        h, w = cfg.TPU.IMAGE_BUCKETS[0]
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
            )
        )()
    elif args.kind == "generator":
        model = AFIGenerator(
            in_channels=cfg.MODEL.AFI.IN_CHANNELS, n_rdb=cfg.MODEL.AFI.N_RDB,
            growth_rate=cfg.MODEL.AFI.GROWTH_RATE,
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, cfg.MODEL.AFI.IN_CHANNELS)),
        )
    else:
        model = PatchDiscriminator(in_channels=cfg.MODEL.AFI.IN_CHANNELS)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, cfg.MODEL.AFI.IN_CHANNELS)),
        )

    frozen_bn = cfg.MODEL.RESNETS.NORM == "FrozenBN"
    variables = load_weights(args.input, variables, kind=args.kind,
                             frozen_bn=frozen_bn)
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
