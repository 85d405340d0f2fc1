"""Config system: yacs-compatible CfgNode + AFI-GAN defaults.

Equivalent surface to the reference's ``afigan.config.get_cfg``
(ref: afigan/config/config.py:3-12).
"""

from .node import CfgNode
from .defaults import get_default_cfg


def get_cfg() -> CfgNode:
    """Return a fresh copy of the default config."""
    return get_default_cfg()


__all__ = ["CfgNode", "get_cfg", "get_default_cfg"]
