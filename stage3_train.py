#!/usr/bin/env python
"""Stage 3: target-detector fine-tune (ref stage3_train.py surface)."""

from afigan_tpu.engine.defaults import default_argument_parser, setup
from afigan_tpu.engine.trainers import TargetDetectorTrainer


def main(args):
    cfg = setup(args)
    trainer = TargetDetectorTrainer(cfg)
    trainer.train(resume=args.resume)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
