#!/usr/bin/env python
"""Stage 2: multi-scale AF-extractor training (ref stage2_train.py surface)."""

from afigan_tpu.engine.defaults import default_argument_parser, setup
from afigan_tpu.engine.trainers import AFExtractorTrainer


def main(args):
    cfg = setup(args)
    trainer = AFExtractorTrainer(cfg)
    trainer.train(resume=args.resume)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
