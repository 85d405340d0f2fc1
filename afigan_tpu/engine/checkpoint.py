"""Checkpointing + the progressive-transfer weight surgery.

TPU redesign of the reference's most elaborate auxiliary subsystem
(SURVEY §5.4; ref afigan/engine/checkpoint.py):
  * native save/load of flat param/opt pytrees (msgpack via
    flax.serialization) with per-model directories (stage 1 saves G and D
    into G_0/ and D_0/, ref stage1_trainer.py:129-150; stage 2 into
    AFExtractor/ and Disc/, ref stage2_trainer.py:100-129)
  * ``last_checkpoint`` pointer + resume restoring step/optimizer state
    (ref stage1_trainer.py:157-174)
  * cross-stage surgery as pytree-path filters:
      - ``transplant_generator``: stage-1 G params → detector's
        backbone/pyramid/srf_module subtree (the reference's
        convert_AFI_names rename "Generators.*" →
        "backbone.srf_module.Generators.*", ref checkpoint.py:78-109)
      - ``extract_afi_subtree``: keep ONLY the srf_module subtree from a
        stage-2 detector for stage-3 transplant (remain_only_AFI_names,
        ref checkpoint.py:111-125), with shape verification.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.core import unfreeze

LAST_CHECKPOINT_FILE = "last_checkpoint"


def save_checkpoint(directory: str, name: str, tree: Any) -> str:
    """Serialize a pytree (params/opt/step dict) to <dir>/<name>.msgpack."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.msgpack")
    data = serialization.to_bytes(jax.device_get(tree))
    with open(path, "wb") as f:
        f.write(data)
    with open(os.path.join(directory, LAST_CHECKPOINT_FILE), "w") as f:
        f.write(f"{name}.msgpack")
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    ptr = os.path.join(directory, LAST_CHECKPOINT_FILE)
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    path = os.path.join(directory, name)
    return path if os.path.isfile(path) else None


def load_checkpoint(path: str, template: Any) -> Any:
    """Deserialize into the structure of ``template``."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def resume_or_load(directory: str, template: Any) -> Tuple[Any, bool]:
    """(state, resumed): restore the latest checkpoint if one exists."""
    path = latest_checkpoint(directory)
    if path is None:
        return template, False
    return load_checkpoint(path, template), True


# ---------------------------------------------------------------------------
# Cross-stage weight surgery (pytree-path filtering)
# ---------------------------------------------------------------------------

def _find_subtree(tree: Dict, key: str) -> Optional[Tuple[Tuple[str, ...], Dict]]:
    """DFS for the first dict node named ``key``; returns (path, node)."""
    stack = [((), tree)]
    while stack:
        path, node = stack.pop()
        if not isinstance(node, dict):
            continue
        for k, v in node.items():
            if k == key and isinstance(v, dict):
                return path + (k,), v
            if isinstance(v, dict):
                stack.append((path + (k,), v))
    return None


def _check_shapes_match(dst: Dict, src: Dict, path: str = "") -> None:
    """Both-ways structural check: every src leaf must exist in dst with
    the same shape AND every dst leaf must be covered by src — the src
    subtree REPLACES dst wholesale, so a partial src (older format,
    interrupted save) would silently drop destination leaves and fail far
    from the load site."""
    for k, v in src.items():
        p = f"{path}/{k}"
        if k not in dst:
            raise KeyError(f"surgery: {p} missing in destination tree")
        if isinstance(v, dict):
            _check_shapes_match(dst[k], v, p)
        else:
            if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"surgery: shape mismatch at {p}: "
                    f"{np.shape(dst[k])} vs {np.shape(v)}"
                )
    for k in dst:
        if k not in src:
            raise KeyError(
                f"surgery: {path}/{k} present in destination but missing "
                f"from the transplanted tree (incomplete source?)"
            )


def transplant_generator(det_params: Dict, g_params: Dict) -> Dict:
    """Insert stage-1 generator params into a detector's srf_module.

    Reference semantics: convert_AFI_names renames the standalone G's
    keys under backbone.srf_module (ref checkpoint.py:94) with shape
    checks (ref :127-198). Here: overwrite the srf_module subtree wherever
    it lives (FPN/PAFPN/BiFPN pyramids all name it ``srf_module``).
    """
    det_params = unfreeze(det_params) if not isinstance(det_params, dict) else dict(det_params)
    found = _find_subtree(det_params, "srf_module")
    if found is None:
        raise KeyError("destination has no srf_module subtree")
    path, node = found
    _check_shapes_match(node, g_params)

    def set_at(tree, path, value):
        if not path:
            return value
        out = dict(tree)
        out[path[0]] = set_at(tree[path[0]], path[1:], value)
        return out

    return set_at(det_params, path, jax.tree.map(lambda x: x, g_params))


def extract_afi_subtree(det_params: Dict) -> Dict:
    """Keep only the srf_module params (stage-2 → stage-3 transplant)."""
    found = _find_subtree(det_params, "srf_module")
    if found is None:
        raise KeyError("source has no srf_module subtree")
    return found[1]


def transplant_afi_between_detectors(dst_det: Dict, src_det: Dict) -> Dict:
    """Stage-3: move the AFI interpolator from one detector into another
    (possibly different backbone/pyramid family — only srf_module moves)."""
    return transplant_generator(dst_det, extract_afi_subtree(src_det))
