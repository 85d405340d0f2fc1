#!/usr/bin/env python
"""Stage 1: AFI-GAN adversarial training (ref stage1_train.py surface).

Usage:
    python stage1_train.py --config-file \
        configs/step1_afigan_training/step1_afigan_mask_rcnn_R_50_FPN_1x.yaml \
        [--resume] [KEY VALUE ...]
"""

from afigan_tpu.engine.defaults import default_argument_parser, setup
from afigan_tpu.engine.trainers import AFIGANTrainer


def main(args):
    cfg = setup(args)
    trainer = AFIGANTrainer(cfg)
    trainer.train(resume=args.resume)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
