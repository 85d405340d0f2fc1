"""Config → model builders (the registry layer).

Equivalent surface to the reference's registries:
  * BACKBONE_REGISTRY names (``build_resnet_fpn_sr_backbone`` etc.,
    ref fpn_sr.py:201-245, pafpn_sr.py:237-281, bifpn_sr.py:791-816)
  * META_ARCH_REGISTRY (``GeneralizedRCNN``, ``GeneralizedRCNN_AFExtractor``)
  * GUIDE_ARCH_REGISTRY (``RCNN_FPN_only``, ref meta_arch/build.py:5-20)

All builders are plain functions returning flax modules; "registry" is a
dict so reference YAML names resolve 1:1.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from .resnet import build_resnet
from .resnest import build_resnest
from .swin import build_swin
from .fpn import FPN
from .pafpn import PAFPN
from .bifpn import BiFPN
from .roi_heads import StandardROIHeads
from .cascade_roi_heads import CascadeROIHeads
from .meta_arch import GeneralizedRCNN, RCNN_FPN_only


class Backbone(nn.Module):
    """bottom_up + pyramid composition."""

    bottom_up: nn.Module
    pyramid: nn.Module

    @nn.compact
    def __call__(self, x):
        return self.pyramid(self.bottom_up(x))


def _dtype_of(cfg):
    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32


def _fpn_kwargs(cfg, interp, train, axis_name, dtype):
    return dict(
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        in_strides=tuple(
            {"res2": 4, "res3": 8, "res4": 16, "res5": 32,
             "stage2": 4, "stage3": 8, "stage4": 16, "stage5": 32}[f]
            for f in cfg.MODEL.FPN.IN_FEATURES
        ),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        interp=interp,
        afi_n_rdb=cfg.MODEL.AFI.N_RDB,
        afi_growth_rate=cfg.MODEL.AFI.GROWTH_RATE,
        afi_residual_scale=cfg.MODEL.AFI.RESIDUAL_SCALE,
        afi_fused=_use_fused_afi(cfg, train),
        afi_remat=bool(train and cfg.TPU.REMAT),
        train=train,
        axis_name=axis_name,
        dtype=dtype,
    )


def _use_fused_afi(cfg, train: bool) -> bool:
    # The Pallas fused-RDB kernel is forward-only (no VJP yet) and
    # TPU-compiled; use it at inference on TPU backends.
    import jax

    return (
        bool(cfg.MODEL.AFI.FUSED_KERNEL)
        and not train
        and jax.default_backend() not in ("cpu",)
    )


def _make_backbone_builder(bottom_up_fn, pyramid: str, interp: str):
    def build(cfg, train=False, axis_name=None, dtype=None):
        dtype = dtype or _dtype_of(cfg)
        bottom_up = bottom_up_fn(cfg, train=train, axis_name=axis_name, dtype=dtype)
        # TPU.REMAT also rematerializes the whole pyramid: at batch 16 /
        # 800x1344 the saved p2-p6 planes are ~1.5 GB bf16 while the
        # pyramid recompute is cheap next to the backbone's.
        rm = bool(train and cfg.TPU.REMAT)
        fpn_cls = nn.remat(FPN) if rm else FPN
        pafpn_cls = nn.remat(PAFPN) if rm else PAFPN
        bifpn_cls = nn.remat(BiFPN) if rm else BiFPN
        if pyramid == "fpn":
            pyr = fpn_cls(name="fpn", top_block=cfg.MODEL.FPN.TOP_BLOCK,
                          top_block_in_feature=cfg.MODEL.FPN.TOP_BLOCK_IN_FEATURE,
                          **_fpn_kwargs(cfg, interp, train, axis_name, dtype))
        elif pyramid == "pafpn":
            pyr = pafpn_cls(name="fpn", **_fpn_kwargs(cfg, interp, train, axis_name, dtype))
        elif pyramid == "bifpn":
            pyr = bifpn_cls(
                name="fpn",
                in_features=tuple(cfg.MODEL.BIFPN.IN_FEATURES),
                out_channels=cfg.MODEL.BIFPN.OUT_CHANNELS,
                fpn_repeat=cfg.MODEL.BIFPN.FPN_REPEAT,
                norm=cfg.MODEL.BIFPN.NORM,
                interp=interp,
                afi_n_rdb=cfg.MODEL.AFI.N_RDB,
                afi_growth_rate=cfg.MODEL.AFI.GROWTH_RATE,
                afi_residual_scale=cfg.MODEL.AFI.RESIDUAL_SCALE,
                afi_fused=_use_fused_afi(cfg, train),
                afi_remat=bool(train and cfg.TPU.REMAT),
                train=train,
                axis_name=axis_name,
                dtype=dtype,
            )
        else:
            raise ValueError(pyramid)
        return Backbone(bottom_up=bottom_up, pyramid=pyr, name=None)

    return build


BACKBONE_REGISTRY: Dict[str, Callable] = {
    "build_resnet_fpn_backbone": _make_backbone_builder(build_resnet, "fpn", "nearest"),
    "build_resnet_fpn_sr_backbone": _make_backbone_builder(build_resnet, "fpn", "afi"),
    "build_resnest_fpn_sr_backbone": _make_backbone_builder(build_resnest, "fpn", "afi"),
    "build_resnet_pafpn_sr_backbone": _make_backbone_builder(build_resnet, "pafpn", "afi"),
    "build_resnest_pafpn_sr_backbone": _make_backbone_builder(build_resnest, "pafpn", "afi"),
    "build_swint_bifpn_sr_backbone": _make_backbone_builder(build_swin, "bifpn", "afi"),
    "build_resnet_bifpn_sr_backbone": _make_backbone_builder(build_resnet, "bifpn", "afi"),
    # non-AFI baselines for ablation / guide variants
    "build_resnet_pafpn_backbone": _make_backbone_builder(build_resnet, "pafpn", "nearest"),
    "build_swint_bifpn_backbone": _make_backbone_builder(build_swin, "bifpn", "nearest"),
    "build_resnet_bifpn_backbone": _make_backbone_builder(build_resnet, "bifpn", "nearest"),
}


def build_backbone(cfg, name: Optional[str] = None, train: bool = False,
                   axis_name=None, dtype=None):
    name = name or cfg.MODEL.BACKBONE.NAME
    if name not in BACKBONE_REGISTRY:
        raise KeyError(f"Unknown backbone: {name}; have {sorted(BACKBONE_REGISTRY)}")
    return BACKBONE_REGISTRY[name](cfg, train=train, axis_name=axis_name, dtype=dtype)


def build_roi_heads(cfg, train=False, axis_name=None, dtype=None):
    dtype = dtype or _dtype_of(cfg)
    rh = cfg.MODEL.ROI_HEADS
    bh = cfg.MODEL.ROI_BOX_HEAD
    mh = cfg.MODEL.ROI_MASK_HEAD
    strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
    common = dict(
        num_classes=rh.NUM_CLASSES,
        in_features=tuple(rh.IN_FEATURES),
        strides=tuple(strides_map[f] for f in rh.IN_FEATURES),
        box_pooler_resolution=bh.POOLER_RESOLUTION,
        box_num_conv=bh.NUM_CONV,
        box_conv_dim=bh.CONV_DIM,
        box_num_fc=bh.NUM_FC,
        box_fc_dim=bh.FC_DIM,
        box_norm=bh.NORM,
        bbox_reg_weights=tuple(bh.BBOX_REG_WEIGHTS),
        smooth_l1_beta=bh.SMOOTH_L1_BETA,
        cls_agnostic_bbox_reg=bh.CLS_AGNOSTIC_BBOX_REG,
        mask_on=cfg.MODEL.MASK_ON,
        mask_pooler_resolution=mh.POOLER_RESOLUTION,
        mask_num_conv=mh.NUM_CONV,
        mask_conv_dim=mh.CONV_DIM,
        mask_norm=mh.NORM,
        cls_agnostic_mask=mh.CLS_AGNOSTIC_MASK,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        keypoint_pooler_resolution=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
        keypoint_conv_dims=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS),
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        keypoint_loss_weight=cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT,
        keypoint_normalize_by_visible=(
            cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS
        ),
        keypoint_sampling_ratio=max(
            cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO, 2
        ),
        keypoint_aligned=(
            cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_TYPE != "ROIAlign"
        ),
        batch_size_per_image=rh.BATCH_SIZE_PER_IMAGE,
        positive_fraction=rh.POSITIVE_FRACTION,
        iou_threshold=rh.IOU_THRESHOLDS[0],
        append_gt=rh.PROPOSAL_APPEND_GT,
        score_thresh=rh.SCORE_THRESH_TEST,
        nms_thresh=rh.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        sampling_ratio=max(bh.POOLER_SAMPLING_RATIO, 2),
        aligned=bh.POOLER_TYPE != "ROIAlign",
        pooler_impl=cfg.TPU.POOLER_IMPL,
        train=train,
        axis_name=axis_name,
        dtype=dtype,
        name="roi_heads",
    )
    if rh.NAME == "Res5ROIHeads":
        if cfg.MODEL.KEYPOINT_ON:
            raise ValueError(
                "KEYPOINT_ON requires Standard/Cascade ROI heads "
                "(d2 keypoint models are FPN-based)"
            )
        from .res5_roi_heads import Res5ROIHeads

        r = cfg.MODEL.RESNETS
        return Res5ROIHeads(
            num_classes=rh.NUM_CLASSES,
            in_feature=rh.IN_FEATURES[0],
            pooler_resolution=bh.POOLER_RESOLUTION,
            norm=r.NORM,
            stride_in_1x1=r.STRIDE_IN_1X1,
            mask_on=cfg.MODEL.MASK_ON,
            batch_size_per_image=rh.BATCH_SIZE_PER_IMAGE,
            positive_fraction=rh.POSITIVE_FRACTION,
            iou_threshold=rh.IOU_THRESHOLDS[0],
            append_gt=rh.PROPOSAL_APPEND_GT,
            bbox_reg_weights=tuple(bh.BBOX_REG_WEIGHTS),
            smooth_l1_beta=bh.SMOOTH_L1_BETA,
            score_thresh=rh.SCORE_THRESH_TEST,
            nms_thresh=rh.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            train=train, axis_name=axis_name, dtype=dtype, name="roi_heads",
        )
    if rh.NAME == "StandardROIHeads":
        return StandardROIHeads(**common)
    if rh.NAME == "CascadeROIHeads":
        cc = cfg.MODEL.ROI_BOX_CASCADE_HEAD
        return CascadeROIHeads(
            cascade_ious=tuple(cc.IOUS),
            cascade_bbox_reg_weights=tuple(tuple(w) for w in cc.BBOX_REG_WEIGHTS),
            **common,
        )
    raise KeyError(f"Unknown ROI heads: {rh.NAME}")


def _rcnn_kwargs(cfg, train, axis_name, dtype):
    rpn = cfg.MODEL.RPN
    strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
    return dict(
        rpn_in_features=tuple(rpn.IN_FEATURES),
        rpn_strides=tuple(strides_map[f] for f in rpn.IN_FEATURES),
        anchor_sizes=tuple(tuple(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES),
        anchor_aspect_ratios=tuple(
            tuple(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS
        ),
        anchor_offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        rpn_iou_thresholds=tuple(rpn.IOU_THRESHOLDS),
        rpn_batch_size_per_image=rpn.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=rpn.POSITIVE_FRACTION,
        rpn_bbox_reg_weights=tuple(rpn.BBOX_REG_WEIGHTS),
        rpn_smooth_l1_beta=rpn.SMOOTH_L1_BETA,
        rpn_loss_weight=rpn.LOSS_WEIGHT,
        pre_nms_topk=rpn.PRE_NMS_TOPK_TRAIN if train else rpn.PRE_NMS_TOPK_TEST,
        post_nms_topk=rpn.POST_NMS_TOPK_TRAIN if train else rpn.POST_NMS_TOPK_TEST,
        rpn_nms_thresh=rpn.NMS_THRESH,
        rpn_min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
        rpn_approx_topk=bool(train and cfg.TPU.APPROX_TOPK),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        train=train,
        dtype=dtype,
    )


def build_model(cfg, train: bool = False, axis_name=None,
                return_features: bool = False) -> nn.Module:
    """META_ARCHITECTURE → flax module."""
    dtype = _dtype_of(cfg)
    arch = cfg.MODEL.META_ARCHITECTURE
    if arch in ("GeneralizedRCNN", "GeneralizedRCNN_AFExtractor"):
        backbone = build_backbone(cfg, train=train, axis_name=axis_name, dtype=dtype)
        roi_heads = build_roi_heads(cfg, train=train, axis_name=axis_name, dtype=dtype)
        return GeneralizedRCNN(
            backbone=backbone,
            roi_heads=roi_heads,
            return_features=return_features or arch == "GeneralizedRCNN_AFExtractor",
            **_rcnn_kwargs(cfg, train, axis_name, dtype),
        )
    if arch == "ProposalNetwork":
        from .meta_arch import ProposalNetwork

        backbone = build_backbone(cfg, train=train, axis_name=axis_name, dtype=dtype)
        kwargs = _rcnn_kwargs(cfg, train, axis_name, dtype)
        return ProposalNetwork(backbone=backbone, **kwargs)
    if arch == "FCOS":
        from .fcos import build_fcos

        return build_fcos(cfg, train=train, axis_name=axis_name,
                          return_features=return_features)
    if arch == "CenterMask":
        from .centermask import build_centermask

        return build_centermask(cfg, train=train, axis_name=axis_name)
    raise KeyError(f"Unknown META_ARCHITECTURE: {arch}")


def build_guide_model(cfg, axis_name=None) -> nn.Module:
    """GUIDE_ARCHITECTURE → frozen teacher (ref meta_arch/build.py:5-20)."""
    dtype = _dtype_of(cfg)
    arch = cfg.MODEL.GUIDE_ARCHITECTURE or "RCNN_FPN_only"
    if arch != "RCNN_FPN_only":
        raise KeyError(f"Unknown GUIDE_ARCHITECTURE: {arch}")
    backbone = build_backbone(
        cfg, name=cfg.MODEL.GUIDE_BACKBONE.NAME, train=False, dtype=dtype
    )
    return RCNN_FPN_only(
        backbone=backbone,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=dtype,
    )
