"""Models: backbones, pyramids, AFI modules, heads, meta-architectures."""

from .afi import AFIGenerator, PatchDiscriminator
from .resnet import ResNet, build_resnet
from .resnest import ResNeSt, build_resnest
from .swin import SwinTransformer, build_swin
from .fpn import FPN
from .pafpn import PAFPN
from .bifpn import BiFPN
from .rpn import RPNHead, RPNOutput
from .roi_heads import GroundTruth, StandardROIHeads
from .cascade_roi_heads import CascadeROIHeads
from .box_head import Detections
from .meta_arch import GeneralizedRCNN, RCNN_FPN_only
from .build import (
    BACKBONE_REGISTRY,
    Backbone,
    build_backbone,
    build_guide_model,
    build_model,
    build_roi_heads,
)

__all__ = [
    "AFIGenerator",
    "PatchDiscriminator",
    "ResNet",
    "build_resnet",
    "ResNeSt",
    "build_resnest",
    "SwinTransformer",
    "build_swin",
    "FPN",
    "PAFPN",
    "BiFPN",
    "RPNHead",
    "RPNOutput",
    "GroundTruth",
    "StandardROIHeads",
    "CascadeROIHeads",
    "Detections",
    "GeneralizedRCNN",
    "RCNN_FPN_only",
    "BACKBONE_REGISTRY",
    "Backbone",
    "build_backbone",
    "build_guide_model",
    "build_model",
    "build_roi_heads",
]
