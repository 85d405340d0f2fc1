"""Weight-file loading dispatch: .pkl/.pth (torch, converted) or .msgpack.

The reference's checkpoint-format sniffing (ref checkpoint.py:29-62,
stage1_trainer.py:62-74) redesigned as one entry point: paths ending in
.pkl/.pth go through the torch converters; .msgpack are native trees.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict

from flax import serialization

from ..utils.converters import (
    load_state_dict,
    merge_variables,
    state_dict_to_variables,
    translate_d2_key,
    translate_discriminator_key,
    translate_generator_key,
)

logger = logging.getLogger("afigan_tpu")

_TRANSLATORS: Dict[str, Callable] = {
    "detector": translate_d2_key,
    "generator": translate_generator_key,
    "discriminator": translate_discriminator_key,
}


def load_weights(path: str, variables: Dict, kind: str = "detector",
                 imagenet_backbone_only: bool = False,
                 frozen_bn: bool = True) -> Dict:
    """Load ``path`` into (a copy of) ``variables``; unmatched keys logged.

    ``frozen_bn``: backbone norms are FrozenBN (stats live in params);
    set False for SyncBN/BN backbones (ResNeSt configs) so running stats
    land in the batch_stats collection.
    """
    if not path:
        return variables
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            return serialization.from_bytes(variables, f.read())
    state = load_state_dict(path)
    if imagenet_backbone_only or not any(
        k.startswith(("backbone.", "proposal_generator.", "roi_heads.",
                      "Generators.", "Discriminators.")) for k in state
    ):
        imagenet_backbone_only = True
    translate = _TRANSLATORS[kind]
    if kind == "detector":
        import functools

        translate = functools.partial(translate_d2_key, frozen_bn=frozen_bn)
    loaded, report = state_dict_to_variables(
        state, variables, translate=translate,
        imagenet_backbone_only=imagenet_backbone_only,
    )
    logger.info(
        f"loaded {path}: {len(report['matched'])} matched, "
        f"{len(report['unmatched'])} unmatched, "
        f"{len(report['mismatched'])} shape-mismatched"
    )
    if report["unmatched"]:
        logger.info(f"  unmatched (first 10): {report['unmatched'][:10]}")
    return merge_variables(variables, loaded)
