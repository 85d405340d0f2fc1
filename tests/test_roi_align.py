"""ROIAlign golden tests against an independent torch-CPU reference.

The torch reference below re-implements d2/torchvision ROIAlign bilinear
sampling directly (torchvision is not installed in this image), with a
FIXED sampling grid matching our TPU deviation (sampling_ratio=2).
"""

import numpy as np
import jax.numpy as jnp
import torch

from afigan_tpu.ops import multilevel_roi_align, roi_align


def _torch_roi_align(feat_hwc, rois, out_size, scale, ratio, aligned):
    """Reference ROIAlign (matches d2 CUDA kernel for fixed sampling_ratio)."""
    H, W, C = feat_hwc.shape
    feat = torch.from_numpy(feat_hwc)
    out = torch.zeros(len(rois), out_size, out_size, C)
    off = 0.5 if aligned else 0.0
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = [v * scale - off for v in roi]
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for py in range(out_size):
            for px in range(out_size):
                acc = torch.zeros(C)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + (py + (iy + 0.5) / ratio) * bh
                        x = x1 + (px + (ix + 0.5) / ratio) * bw
                        acc += _bilinear(feat, y, x, H, W)
                out[r, py, px] = acc / (ratio * ratio)
    return out.numpy()


def _bilinear(feat, y, x, H, W):
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return torch.zeros(feat.shape[-1])
    y, x = max(y, 0.0), max(x, 0.0)
    y0, x0 = int(y), int(x)
    y0, x0 = min(y0, H - 1), min(x0, W - 1)
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    y, x = min(y, H - 1), min(x, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * feat[y0, x0]
        + hy * lx * feat[y0, x1]
        + ly * hx * feat[y1, x0]
        + ly * lx * feat[y1, x1]
    )


def test_roi_align_matches_torch_aligned():
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array(
        [[8, 8, 60, 40], [0, 0, 16, 16], [30, 20, 120, 90], [-4, -4, 10, 10]],
        dtype=np.float32,
    )
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25, 2, aligned=True)
    )
    want = _torch_roi_align(feat, rois, 7, 0.25, 2, aligned=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_matches_torch_legacy():
    rng = np.random.RandomState(1)
    feat = rng.randn(16, 16, 4).astype(np.float32)
    rois = np.array([[4, 4, 40, 40], [0, 0, 2, 2]], dtype=np.float32)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25, 2, aligned=False)
    )
    want = _torch_roi_align(feat, rois, 7, 0.25, 2, aligned=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multilevel_matches_single_level_routing():
    """Small box → finest level; result equals single-level roi_align there."""
    rng = np.random.RandomState(2)
    feats = [
        rng.randn(32, 32, 4).astype(np.float32),  # stride 4
        rng.randn(16, 16, 4).astype(np.float32),  # stride 8
        rng.randn(8, 8, 4).astype(np.float32),  # stride 16
        rng.randn(4, 4, 4).astype(np.float32),  # stride 32
    ]
    strides = [4, 8, 16, 32]
    small = np.array([[8, 8, 40, 40]], dtype=np.float32)  # area 32² → level 0 (p2)
    big = np.array([[0, 0, 127, 127]], dtype=np.float32)  # sqrt area 127 → p3
    boxes = np.concatenate([small, big])
    got = np.asarray(
        multilevel_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides, 7, 2
        )
    )
    want_small = np.asarray(
        roi_align(jnp.asarray(feats[0]), jnp.asarray(small), 7, 0.25, 2)
    )
    # level for sqrt(area)=127: floor(4 + log2(127/224)) = floor(3.18) = 3
    # → stride 2^3 = 8 → feats index 1
    want_big = np.asarray(
        roi_align(jnp.asarray(feats[1]), jnp.asarray(big), 7, 1 / 8.0, 2)
    )
    np.testing.assert_allclose(got[0], want_small[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1], want_big[0], rtol=1e-4, atol=1e-4)


def test_windowed_matches_gather_pooler():
    """The matmul-windowed pooler must match the per-point gather pooler."""
    from afigan_tpu.ops.roi_align import multilevel_roi_align_windowed

    rng = np.random.RandomState(5)
    feats = [
        rng.randn(64, 96, 8).astype(np.float32),
        rng.randn(32, 48, 8).astype(np.float32),
        rng.randn(16, 24, 8).astype(np.float32),
        rng.randn(8, 12, 8).astype(np.float32),
    ]
    strides = [4, 8, 16, 32]
    boxes = np.array(
        [
            [8, 8, 60, 50],        # small → p2
            [0, 0, 250, 180],      # medium
            [-10, -10, 40, 40],    # crosses the border
            [0, 0, 383, 255],      # full image → top level
            [100, 90, 101, 91],    # tiny 1px box
        ],
        dtype=np.float32,
    )
    jf = [jnp.asarray(f) for f in feats]
    want = np.asarray(multilevel_roi_align(jf, jnp.asarray(boxes), strides, 7, 2))
    got = np.asarray(
        multilevel_roi_align_windowed(jf, jnp.asarray(boxes), strides, 7, 2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_windowed_elongated_boxes_match_gather():
    """Aspect-ratio >= 4 ROIs overflow the 48-px window; the overflow
    correction slots must recompute them exactly (advisor finding: trailing
    bins silently pooled zeros before)."""
    from afigan_tpu.ops.roi_align import multilevel_roi_align_windowed

    rng = np.random.RandomState(11)
    feats = [
        rng.randn(100, 168, 8).astype(np.float32),
        rng.randn(50, 84, 8).astype(np.float32),
        rng.randn(25, 42, 8).astype(np.float32),
        rng.randn(13, 21, 8).astype(np.float32),
    ]
    strides = [4, 8, 16, 32]
    boxes = np.array(
        [
            [0, 100, 400, 150],    # aspect 8 wide → p2/p3, x-extent ~100 px
            [200, 0, 240, 330],    # aspect ~8 tall
            [0, 0, 660, 40],       # aspect 16 sliver
            [8, 8, 60, 50],        # normal box (windowed path)
            [30, 30, 260, 200],    # normal medium box
        ],
        dtype=np.float32,
    )
    jf = [jnp.asarray(f) for f in feats]
    want = np.asarray(multilevel_roi_align(jf, jnp.asarray(boxes), strides, 7, 2))
    got = np.asarray(
        multilevel_roi_align_windowed(jf, jnp.asarray(boxes), strides, 7, 2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # sanity: without correction slots the sliver rows would actually differ
    broken = np.asarray(
        multilevel_roi_align_windowed(
            jf, jnp.asarray(boxes), strides, 7, 2, overflow_slots=0
        )
    )
    assert np.abs(broken[:3] - want[:3]).max() > 0.1
    np.testing.assert_allclose(broken[3:], want[3:], rtol=1e-4, atol=1e-4)


def test_fast_pooler_elongated_grad_consistency():
    """The custom-VJP pooler's forward (with overflow correction) and its
    point-scatter backward must agree with autodiff through the gather
    pooler for elongated boxes too."""
    import jax
    from afigan_tpu.ops.roi_align import multilevel_roi_align_fast

    rng = np.random.RandomState(13)
    feats = tuple(
        jnp.asarray(rng.randn(h, w, 4).astype(np.float32))
        for h, w in [(64, 96), (32, 48), (16, 24), (8, 12)]
    )
    strides = (4, 8, 16, 32)
    boxes = jnp.asarray(
        np.array([[0, 40, 350, 80], [10, 0, 50, 330], [4, 4, 60, 44]], np.float32)
    )
    got = np.asarray(multilevel_roi_align_fast(feats, boxes, strides, 7, 2))
    want = np.asarray(multilevel_roi_align(list(feats), boxes, list(strides), 7, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def loss_fast(fs):
        return jnp.sum(multilevel_roi_align_fast(fs, boxes, strides, 7, 2) ** 2)

    def loss_ref(fs):
        return jnp.sum(multilevel_roi_align(list(fs), boxes, list(strides), 7, 2) ** 2)

    g_fast = jax.grad(loss_fast)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_fast_pooler_forward_and_grad_match_gather():
    """custom-VJP pooler: forward == gather pooler; grads == autodiff grads."""
    import jax
    from afigan_tpu.ops.roi_align import multilevel_roi_align_fast

    rng = np.random.RandomState(7)
    feats = tuple(
        jnp.asarray(rng.randn(h, w, 4).astype(np.float32))
        for h, w in [(32, 48), (16, 24), (8, 12), (4, 6)]
    )
    strides = (4, 8, 16, 32)
    boxes = jnp.asarray(
        np.array([[4, 4, 60, 44], [0, 0, 190, 120], [-5, -5, 20, 20]], np.float32)
    )
    got = np.asarray(multilevel_roi_align_fast(feats, boxes, strides, 7, 2))
    want = np.asarray(multilevel_roi_align(list(feats), boxes, list(strides), 7, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # gradient parity vs autodiff through the gather implementation
    def loss_fast(fs):
        return jnp.sum(multilevel_roi_align_fast(fs, boxes, strides, 7, 2) ** 2)

    def loss_ref(fs):
        return jnp.sum(multilevel_roi_align(list(fs), boxes, list(strides), 7, 2) ** 2)

    g_fast = jax.grad(loss_fast)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_gather_windows_matches_dynamic_slice():
    """Pallas per-ROI DMA window extractor (interpret mode) must equal
    the vmapped dynamic_slice it replaces on TPU."""
    import jax

    from afigan_tpu.ops.pallas.window_gather import gather_windows

    rng = np.random.RandomState(0)
    c, window = 32, 16
    concat = jnp.asarray(rng.randn(80, 64, c).astype(np.float32))
    rows = jnp.asarray(rng.randint(0, 80 - window, size=(9,)).astype(np.int32))
    cols = jnp.asarray((rng.randint(0, (64 - window) // 8, size=(9,)) * 8).astype(np.int32))
    want = jax.vmap(
        lambda r0, c0: jax.lax.dynamic_slice(concat, (r0, c0, 0), (window, window, c))
    )(rows, cols)
    got = gather_windows(concat, rows, cols, window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_pallas_pooler_forward_and_grad_match_gather():
    """Fused Pallas pooler (interpret mode on CPU): batched forward must
    equal the per-image gather pooler; dense-matmul backward must equal
    autodiff grads through the gather implementation."""
    import jax
    from afigan_tpu.ops.roi_align import multilevel_roi_align_pallas

    rng = np.random.RandomState(11)
    B = 2
    feats = tuple(
        jnp.asarray(rng.randn(B, h, w, 8).astype(np.float32))
        for h, w in [(32, 48), (16, 24), (8, 12), (4, 6)]
    )
    strides = (4, 8, 16, 32)
    boxes = np.zeros((B, 5, 4), np.float32)
    for i in range(B):
        xy = rng.rand(5, 2) * [120, 80]
        wh = rng.rand(5, 2) * 60 + 4
        boxes[i] = np.concatenate([xy, xy + wh], 1)
    boxes[0, 3] = [-5, -5, 20, 20]        # partially outside
    boxes[1, 4] = [0, 40, 180, 58]        # high aspect (overflow path)
    boxes = jnp.asarray(boxes)

    got = np.asarray(multilevel_roi_align_pallas(feats, boxes, strides, 7, 2))
    want = np.asarray(
        jax.vmap(
            lambda *a: multilevel_roi_align(
                list(a[:-1]), a[-1], list(strides), 7, 2
            )
        )(*feats, boxes)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def loss_pallas(fs):
        return jnp.sum(multilevel_roi_align_pallas(fs, boxes, strides, 7, 2) ** 2)

    def loss_ref(fs):
        per_img = jax.vmap(
            lambda *a: multilevel_roi_align(list(a[:-1]), a[-1], list(strides), 7, 2)
        )(*fs, boxes)
        return jnp.sum(per_img ** 2)

    g_pallas = jax.grad(loss_pallas)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    for a, b in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_pallas_pooler_mask_scale():
    """P=14 (mask-branch resolution) parity on a second geometry."""
    import jax
    from afigan_tpu.ops.roi_align import multilevel_roi_align_pallas

    rng = np.random.RandomState(3)
    B = 2
    feats = tuple(
        jnp.asarray(rng.randn(B, h, w, 4).astype(np.float32))
        for h, w in [(40, 40), (20, 20), (10, 10), (5, 5)]
    )
    strides = (4, 8, 16, 32)
    boxes = np.zeros((B, 4, 4), np.float32)
    for i in range(B):
        xy = rng.rand(4, 2) * [100, 100]
        wh = rng.rand(4, 2) * 50 + 8
        boxes[i] = np.concatenate([xy, xy + wh], 1)
    boxes = jnp.asarray(boxes)

    got = np.asarray(multilevel_roi_align_pallas(feats, boxes, strides, 14, 2))
    want = np.asarray(
        jax.vmap(
            lambda *a: multilevel_roi_align(
                list(a[:-1]), a[-1], list(strides), 14, 2
            )
        )(*feats, boxes)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_pooler_true_overflow_correction():
    """A genuinely window-overflowing extreme-aspect box (extent > the
    main window at its assigned level) must be corrected exactly by the
    full-coverage second kernel pass — parity vs the gather pooler."""
    import jax
    from afigan_tpu.ops.roi_align import multilevel_roi_align_pallas

    rng = np.random.RandomState(7)
    B = 2
    # level-0 width 96 cells > the 56-wide main window: a wide box routed
    # to a low level can overflow in x.
    feats = tuple(
        jnp.asarray(rng.randn(B, h, w, 8).astype(np.float32))
        for h, w in [(64, 96), (32, 48), (16, 24), (8, 12)]
    )
    strides = (4, 8, 16, 32)
    boxes = np.zeros((B, 6, 4), np.float32)
    for i in range(B):
        xy = rng.rand(6, 2) * [200, 150]
        wh = rng.rand(6, 2) * 60 + 4
        boxes[i] = np.concatenate([xy, xy + wh], 1)
    boxes[0, 0] = [2, 100, 370, 113]    # 92x3 cells at stride 4 -> x overflow
    boxes[1, 5] = [120, 4, 133, 250]    # tall -> y overflow
    boxes = jnp.asarray(boxes)

    got = np.asarray(multilevel_roi_align_pallas(feats, boxes, strides, 7, 2))
    want = np.asarray(
        jax.vmap(
            lambda *a: multilevel_roi_align(
                list(a[:-1]), a[-1], list(strides), 7, 2
            )
        )(*feats, boxes)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_pooler_edge_rois_exact_without_overflow_slots():
    """Ordinary small ROIs at a level's bottom/right edge must be exact
    in the MAIN pass (overflow_slots=0): when (lvl - win) is not a
    multiple of 8 the window clip bound must align UP, not down —
    aligning down leaves the last (lvl % 8) rows/cols reachable only
    through the capped correction pass (regression for the
    bottom-of-p3 / right-of-p4 silent-truncation bug)."""
    import jax
    from afigan_tpu.ops.roi_align import multilevel_roi_align_pallas

    rng = np.random.RandomState(13)
    B = 2
    # win_r = win_c = 56 here; level-0 is 60x100 so the y clip bound is
    # 60-56=4 (aligned-down: 0, leaving rows 56..59 short) and the x
    # bound is 100-56=44 (aligned-down: 40, leaving cols 96..99 short).
    feats = tuple(
        jnp.asarray(rng.randn(B, h, w, 8).astype(np.float32))
        for h, w in [(60, 100), (30, 50), (15, 25), (8, 13)]
    )
    strides = (4, 8, 16, 32)
    boxes = np.zeros((B, 4, 4), np.float32)
    for i in range(B):
        xy = rng.rand(4, 2) * [300, 150]
        wh = rng.rand(4, 2) * 40 + 4
        boxes[i] = np.concatenate([xy, xy + wh], 1)
    boxes[0, 0] = [385, 228, 398, 238]   # bottom-right corner of level 0
    boxes[0, 1] = [40, 226, 56, 239]     # bottom edge (y-only)
    boxes[1, 2] = [388, 100, 399, 117]   # right edge (x-only)
    boxes = jnp.asarray(boxes)

    got = np.asarray(
        multilevel_roi_align_pallas(
            feats, boxes, strides, 7, 2, overflow_slots=0
        )
    )
    want = np.asarray(
        jax.vmap(
            lambda *a: multilevel_roi_align(
                list(a[:-1]), a[-1], list(strides), 7, 2
            )
        )(*feats, boxes)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_pooler_unaligned_channels_fallback():
    """BiFPN pyramids carry 160 channels — not lane-aligned, so the
    fused Pallas window-pool kernel cannot compile (Mosaic rejects the
    (p*win_c, c) reshape; first hit by CenterMask R-50-BiFPN on-chip).
    The dispatch must fall back to the 'fast' pooler and produce the
    same (exact ROIAlign) result as the gather reference."""
    import numpy as np
    import jax.numpy as jnp

    from afigan_tpu.models.roi_heads import StandardROIHeads
    from afigan_tpu.ops.roi_align import pallas_pooler_supported

    assert pallas_pooler_supported(256)
    assert pallas_pooler_supported(128)
    assert not pallas_pooler_supported(160)
    assert not pallas_pooler_supported(32)

    rng = np.random.RandomState(0)
    feats = {
        "p3": jnp.asarray(rng.rand(1, 16, 24, 160).astype(np.float32)),
        "p4": jnp.asarray(rng.rand(1, 8, 12, 160).astype(np.float32)),
    }
    boxes = jnp.asarray(
        np.array([[[8.0, 8.0, 80.0, 60.0], [16.0, 4.0, 120.0, 90.0]]],
                 np.float32))
    kw = dict(in_features=("p3", "p4"), strides=(8, 16))
    out_p = StandardROIHeads(pooler_impl="pallas", **kw)._pool(feats, boxes, 7)
    out_g = StandardROIHeads(pooler_impl="gather", **kw)._pool(feats, boxes, 7)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g),
                               rtol=1e-5, atol=1e-5)
