"""Core TPU-native ops: boxes, anchors, matching, sampling, NMS, ROIAlign.

These are the fixed-shape XLA/Pallas replacements for the C++/CUDA ops the
reference depends on through detectron2/torchvision (SURVEY §2.3).
"""

from .boxes import (
    Box2BoxTransform,
    box_area,
    clip_boxes,
    nonempty_mask,
    pairwise_intersection,
    pairwise_iou,
    pairwise_ioa,
)
from .anchors import AnchorGenerator, build_anchor_generator
from .matcher import Matcher
from .sampling import subsample_labels
from .nms import batched_nms_padded, nms_keep_mask, nms_padded
from .roi_align import multilevel_roi_align, roi_align, assign_boxes_to_levels
from .image_list import ImageBatch, batch_images, choose_bucket

__all__ = [
    "Box2BoxTransform",
    "box_area",
    "clip_boxes",
    "nonempty_mask",
    "pairwise_intersection",
    "pairwise_iou",
    "pairwise_ioa",
    "AnchorGenerator",
    "build_anchor_generator",
    "Matcher",
    "subsample_labels",
    "batched_nms_padded",
    "nms_keep_mask",
    "nms_padded",
    "multilevel_roi_align",
    "roi_align",
    "assign_boxes_to_levels",
    "ImageBatch",
    "batch_images",
    "choose_bucket",
]
