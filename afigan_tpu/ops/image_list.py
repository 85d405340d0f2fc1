"""Static-shape padded image batching.

Replaces d2's ``ImageList.from_tensors`` (dynamic max-size padding) with
TPU-friendly *bucketed* padding: the host data pipeline resizes per
INPUT.* and then pads every image up to a canvas chosen from a small fixed
set (cfg.TPU.IMAGE_BUCKETS), so each bucket shape compiles exactly once.

Inside the model, an ImageBatch is just the padded pixel tensor plus the
true (pre-padding) image sizes used for box clipping and postprocessing.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class ImageBatch(NamedTuple):
    """Batched padded images (NHWC) + per-image true sizes.

    tensor: (B, H, W, C) padded pixels (already normalized).
    image_sizes: (B, 2) int32 (h, w) valid region per image.
    """

    tensor: jnp.ndarray
    image_sizes: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.tensor.shape[0]

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]


def required_size_divisibility(cfg, dual_scale: bool = False) -> int:
    """Canvas divisibility the model family needs (the d2
    ``backbone.size_divisibility`` contract, ref bifpn_sr.py:526,566-567):
    BiFPN carries a stride-128 p7 whose exact-2x up/down paths require
    every pyramid level to halve evenly — 128-divisible inputs; the
    FPN/PAFPN families (p6 top) need 64 (also keeps the x0.5 dual-scale
    stream stride-contiguous, ref fpn_sr.py:177-184).

    ``dual_scale``: stage-1/2 loaders feed the DETECTOR the half-res
    stream (half canvas = full // 2), so a BiFPN extractor needs the
    FULL canvas 256-divisible for the half to stay 128-divisible (the
    FPN family's conv paths tolerate the 32-divisible half via their
    ceil handling, so 64 is kept there — unchanged behavior)."""
    name = cfg.MODEL.BACKBONE.NAME.lower()
    if "bifpn" in name:
        return 256 if dual_scale else 128
    return 64


def choose_bucket(h: int, w: int, buckets: Sequence[Sequence[int]],
                  size_divisibility: int = 32) -> Tuple[int, int]:
    """Smallest-area bucket that fits (h, w); falls back to rounding up.
    The chosen canvas is always rounded UP to ``size_divisibility`` (a
    64-divisible bucket list stays unchanged at d=64; at d=128 — the
    BiFPN families — e.g. 704 becomes 768)."""
    d = size_divisibility
    # test fit against the ROUNDED canvas (what the bucket actually
    # becomes): at d=128 a 720px image fits the (704→768) bucket — judging
    # by the raw 704 would escalate to the next bucket's far larger canvas
    rounded = [
        (int(np.ceil(bh / d) * d), int(np.ceil(bw / d) * d))
        for bh, bw in buckets
    ]
    fitting = [(ch, cw) for ch, cw in rounded if ch >= h and cw >= w]
    if fitting:
        return min(fitting, key=lambda s: s[0] * s[1])
    return (int(np.ceil(h / d) * d), int(np.ceil(w / d) * d))


def pad_to_canvas(img: np.ndarray, canvas_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad an (H, W, C) host image (numpy) to the canvas size."""
    h, w = img.shape[:2]
    ch, cw = canvas_hw
    assert ch >= h and cw >= w, f"canvas {canvas_hw} smaller than image {(h, w)}"
    out = np.zeros((ch, cw) + img.shape[2:], dtype=img.dtype)
    out[:h, :w] = img
    return out


def batch_images(
    images: Sequence[np.ndarray], buckets: Sequence[Sequence[int]],
    size_divisibility: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: pad a list of (H,W,C) images into one canvas batch.

    All images in one batch share one canvas (the smallest bucket fitting
    the largest image) so the batch is a single static-shape tensor.
    """
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    canvas = choose_bucket(max_h, max_w, buckets, size_divisibility)
    tensor = np.stack([pad_to_canvas(im, canvas) for im in images])
    sizes = np.asarray([[im.shape[0], im.shape[1]] for im in images], dtype=np.int32)
    return tensor, sizes
