"""Swin Transformer backbone — NHWC/Flax, TPU-friendly static shapes.

Parity with the reference's Swin
(ref: afigan/modeling/backbone/swin_transformer.py): PatchEmbed (4x4 conv
+ LN), WindowAttention with relative-position bias (:80-158),
SwinTransformerBlock with cyclic shift + SW-MSA masks (:161-258, :303-402),
PatchMerging (:261-300), stage outputs "stage2".."stage5" each with its own
LayerNorm (:601-625), builder keys MODEL.SWINT.* (:641-668).

TPU design notes: everything runs on (B, H, W, C) NHWC tensors; window
partition is pure reshape/transpose; SW-MSA attention masks and the
relative-position index are precomputed with numpy at trace time (static
shapes) and folded into the attention bias — no dynamic control flow.
Attention is computed in fp32 softmax / bf16 matmul per TPU practice.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def _rel_pos_index(window_size: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2w-1)^2 relative bias table."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _sw_attn_mask(hp: int, wp: int, window_size: int, shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask (0 / -100) for shifted windows."""
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for h in (
        slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)
    ):
        for w in (
            slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)
        ):
            img_mask[h, w] = cnt
            cnt += 1
    mask = img_mask.reshape(hp // window_size, window_size, wp // window_size, window_size)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    attn_mask = mask[:, None, :] - mask[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, b: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


class DropPath(nn.Module):
    rate: float = 0.0
    train: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.train or self.rate <= 0.0:
            return x
        key = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(key, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class FusedLayerNorm(nn.Module):
    """LayerNorm with f32 stats, param-compatible with nn.LayerNorm
    (params "scale"/"bias" under the same module name, so checkpoints
    and converters are unchanged).

    use_pallas=True routes through ops/pallas/layer_norm.py (one fused
    VMEM pass — the XLA lowering materializes f32 stat planes and
    re-reads the input, ~40 ms/step across the flagship's LayerNorms).
    The jnp path reproduces flax.linen.LayerNorm(use_fast_variance=True)
    op-for-op and is used for training (autodiff) and CPU.
    """

    eps: float = 1e-5
    out_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.use_pallas:
            from ..ops.pallas.layer_norm import fused_layer_norm

            return fused_layer_norm(x, scale, bias, eps=self.eps,
                                    out_dtype=self.out_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (xf - mean) * (jax.lax.rsqrt(var + self.eps) * scale) + bias
        return y.astype(self.out_dtype)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    # "xla" = einsum + f32 softmax; "pallas" = fused VMEM-resident kernel
    # (ops/pallas/window_attention.py) that never writes the f32 score
    # tensor to HBM — inference-only (the XLA path is used for training).
    attn_impl: str = "xla"
    # XLA-path structure knobs (see TPU.SWIN_QKV_LAYOUT /
    # TPU.SWIN_SCORES_DTYPE in config/defaults.py): "headmajor" contracts
    # the (bnw, n, nh, hd) qkv tensor directly (heads ride as an einsum
    # batch dim, so XLA folds the head split into the dot_general instead
    # of emitting the explicit bf16[...,3,nh,hd] permutes that were 20.2%
    # of flagship device time in flagship_breakdown_r04.txt); "split" is
    # the d2-style transpose chain (ref swin_transformer.py:125-133).
    qkv_layout: str = "split"
    scores_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        """x: (nW*B, N, C); mask: (num_windows, N, N) or None."""
        bnw, n, c = x.shape
        nh = self.num_heads
        head_dim = c // nh
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, nh, head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))  # (bnw, n, nh, hd)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh),
        )
        idx = jnp.asarray(_rel_pos_index(self.window_size).reshape(-1))
        bias = table[idx].reshape(n, n, nh)
        bias = jnp.transpose(bias, (2, 0, 1))  # (nh, n, n)

        sdt = (jnp.float32 if self.scores_dtype == "float32"
               else jnp.dtype(self.scores_dtype))
        if self.attn_impl == "pallas":
            from ..ops.pallas.window_attention import fused_window_attention

            q = jnp.transpose(q, (0, 2, 1, 3))
            k = jnp.transpose(k, (0, 2, 1, 3))
            v = jnp.transpose(v, (0, 2, 1, 3))
            out = fused_window_attention(q, k, v, bias, mask, scale=scale)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bnw, n, c)
        elif self.qkv_layout == "headmajor":
            # No explicit head-split transposes: contract q·k and attn·v
            # with heads as a batch dim of the einsum; the bias/mask add
            # and softmax run on (bnw, nh, n, n) scores in scores_dtype
            # (bf16 scores halve the HBM traffic of the softmax
            # round-trip; the QK^T MXU matmul still accumulates f32).
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                              preferred_element_type=sdt)
            attn = attn + bias[None].astype(sdt)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(bnw // nw, nw, nh, n, n) \
                    + mask[None, :, None].astype(sdt)
                attn = attn.reshape(bnw, nh, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
            out = out.reshape(bnw, n, c)
        else:
            v = jnp.transpose(v, (0, 2, 1, 3))
            q = jnp.transpose(q, (0, 2, 1, 3)) * scale
            k = jnp.transpose(k, (0, 2, 3, 1))
            attn = jnp.einsum("bhnd,bhdm->bhnm", q, k)  # (bnw, nh, n, n)
            attn = attn.astype(sdt) + bias[None].astype(sdt)
            if mask is not None:
                attn = attn.reshape(bnw // mask.shape[0], mask.shape[0], nh, n, n) \
                    + mask[None, :, None].astype(sdt)
                attn = attn.reshape(bnw, nh, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    train: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    use_pallas_ln: bool = False
    qkv_layout: str = "split"
    scores_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> same.

        The window size is FIXED (the detection Swin pads feature maps
        up to multiples of it and keeps the shift active even when the
        map is smaller than a window, ref swin_transformer.py:219-231 +
        :370-389) — it must never shrink with the input, or the
        relative-position-bias table's PARAM shape would depend on the
        traced resolution (multi-scale TTA initializes once and applies
        at every scale)."""
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size

        use_pallas_ln = self.use_pallas_ln
        shortcut = x
        y = FusedLayerNorm(out_dtype=self.dtype, use_pallas=use_pallas_ln,
                           name="norm1")(x)

        hp = int(np.ceil(h / ws)) * ws
        wp = int(np.ceil(w / ws)) * ws
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_sw_attn_mask(hp, wp, ws, shift))
        else:
            mask = None

        windows = window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               dtype=self.dtype, attn_impl=self.attn_impl,
                               qkv_layout=self.qkv_layout,
                               scores_dtype=self.scores_dtype,
                               name="attn")(windows, mask)
        y = window_reverse(attn, ws, b, hp, wp)

        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]

        x = shortcut + DropPath(self.drop_path, self.train, name="drop_path1")(y)

        z = FusedLayerNorm(out_dtype=self.dtype, use_pallas=use_pallas_ln,
                           name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = jax.nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        return x + DropPath(self.drop_path, self.train, name="drop_path2")(z)


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32
    use_pallas_ln: bool = False

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C)."""
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = FusedLayerNorm(out_dtype=self.dtype,
                           use_pallas=self.use_pallas_ln, name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(y)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    ape: bool = False
    patch_norm: bool = True
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    train: bool = False
    dtype: Dtype = jnp.float32
    # "auto" = fused Pallas window attention for TPU inference, XLA
    # otherwise (training needs autodiff; CPU would only interpret).
    attn_impl: str = "auto"
    # "auto" = follow the resolved attn_impl; "pallas"/"xla" force the
    # LayerNorm implementation independently (A/B isolation knob).
    ln_impl: str = "auto"
    # XLA-attention structure (TPU.SWIN_QKV_LAYOUT / SWIN_SCORES_DTYPE).
    qkv_layout: str = "split"
    scores_dtype: str = "float32"

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        b, h, w, _ = x.shape
        if self.attn_impl == "auto":
            attn_impl = ("pallas" if not self.train
                         and jax.default_backend() == "tpu" else "xla")
        else:
            attn_impl = self.attn_impl
        # The Pallas kernels are forward-only (no VJP): forcing them into
        # a training graph would fail deep inside autodiff, so reject the
        # combination up front (round-3 ADVICE #1).
        if self.train and (attn_impl == "pallas" or self.ln_impl == "pallas"):
            raise ValueError(
                "TPU.SWIN_ATTN_IMPL/SWIN_LN_IMPL='pallas' is inference-only "
                "(the fused kernels have no VJP); use 'auto' or 'xla' for "
                "training")
        # bf16 scores are an INFERENCE default (measured +14% on the
        # flagship A/B, ab_swin_struct_r05.jsonl); the training path has
        # no such measurement, so autodiff always runs f32 softmax
        scores_dtype = "float32" if self.train else self.scores_dtype
        if self.ln_impl == "auto":
            use_pallas_ln = attn_impl == "pallas"
        else:
            use_pallas_ln = self.ln_impl == "pallas"
        # patch embed: 4x4 conv stride 4 (pad input to multiple of 4)
        ph, pw = (-h) % 4, (-w) % 4
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        y = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x.astype(self.dtype))
        if self.patch_norm:
            y = FusedLayerNorm(out_dtype=self.dtype,
                               use_pallas=use_pallas_ln,
                               name="patch_norm")(y)

        total_blocks = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_blocks)

        out: Dict[str, jnp.ndarray] = {}
        blk = 0
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2**i)
            for d in range(depth):
                y = SwinBlock(
                    dim=dim, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, drop_path=float(dpr[blk]),
                    train=self.train, dtype=self.dtype, attn_impl=attn_impl,
                    use_pallas_ln=use_pallas_ln,
                    qkv_layout=self.qkv_layout,
                    scores_dtype=scores_dtype,
                    name=f"stage{i+2}/block{d}",
                )(y)
                blk += 1
            name = f"stage{i+2}"
            if name in self.out_features:
                o = FusedLayerNorm(out_dtype=self.dtype,
                                   use_pallas=use_pallas_ln,
                                   name=f"norm_{name}")(y)
                out[name] = o
            if i < len(self.depths) - 1:
                y = PatchMerging(dim, dtype=self.dtype,
                                 use_pallas_ln=use_pallas_ln,
                                 name=f"stage{i+2}/downsample")(y)
        return out


def build_swin(cfg, train: bool = False, axis_name=None, dtype=jnp.float32) -> SwinTransformer:
    s = cfg.MODEL.SWINT
    return SwinTransformer(
        embed_dim=s.EMBED_DIM,
        depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS),
        window_size=s.WINDOW_SIZE,
        mlp_ratio=float(s.MLP_RATIO),
        drop_path_rate=s.DROP_PATH_RATE,
        ape=s.APE,
        out_features=tuple(s.OUT_FEATURES),
        train=train,
        dtype=dtype,
        attn_impl=cfg.TPU.SWIN_ATTN_IMPL,
        ln_impl=cfg.TPU.SWIN_LN_IMPL,
        qkv_layout=cfg.TPU.SWIN_QKV_LAYOUT,
        scores_dtype=cfg.TPU.SWIN_SCORES_DTYPE,
    )
