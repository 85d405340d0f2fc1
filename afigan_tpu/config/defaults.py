"""Default configuration tree.

Mirrors every detectron2-v0.1.1 key the reference consults plus the
AFI-GAN additions (ref: afigan/config/defaults.py:5-94), so the
reference's YAML config zoo loads verbatim through our CfgNode.

Notes vs the reference:
  * ``MODEL.SRF_FREEZE`` is defined here only so the Swin-BiFPN YAML
    loads (ref quirk Q5: configs/inference/AFI-GAN_cascade_rcnn_swint_BiFPN_ST.yaml:32
    sets a key never read by code); the real flag is ``MODEL.AFI_FREEZE``.
  * TPU-specific keys live under the new ``TPU`` section (mesh shape,
    static-shape padding buckets, compute dtype).
"""

from .node import CfgNode as CN

_C = CN()

_C.VERSION = 2
_C.OUTPUT_DIR = "./output"
_C.SEED = -1
_C.CUDNN_BENCHMARK = False  # accepted for config-compat; meaningless on TPU

# ---------------------------------------------------------------------------
# MODEL
# ---------------------------------------------------------------------------
_C.MODEL = CN()
_C.MODEL.DEVICE = "tpu"
_C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
_C.MODEL.WEIGHTS = ""
_C.MODEL.MASK_ON = False
_C.MODEL.KEYPOINT_ON = False
_C.MODEL.LOAD_PROPOSALS = False
# BGR means/stds of the d2 zoo default (ImageNet, caffe2 style)
_C.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
_C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]

# AFI-GAN additions (ref afigan/config/defaults.py:5-11)
_C.MODEL.GUIDE_ARCHITECTURE = ""
_C.MODEL.GUIDE_WEIGHTS = ""
_C.MODEL.AFI_GEN_WEIGHTS = ""
_C.MODEL.AFI_DIS_WEIGHTS = ""
_C.MODEL.AF_EXTRACTOR_WEIGHTS = ""
_C.MODEL.AFI_FREEZE = False
_C.MODEL.SRF_FREEZE = False  # quirk Q5: accepted, never read

# AFI interpolator hyper-params (hard-coded in the reference:
# generator_rdb.py:75 and n_residual_dense_blocks=3 at fpn_sr.py:65)
_C.MODEL.AFI = CN()
_C.MODEL.AFI.IN_CHANNELS = 256
_C.MODEL.AFI.N_RDB = 3
_C.MODEL.AFI.GROWTH_RATE = 32
_C.MODEL.AFI.RESIDUAL_SCALE = 0.2
_C.MODEL.AFI.ADV_LOSS_WEIGHT = 1.0e-3  # ref stage1_trainer.py:411
# Pallas fused-RDB kernel (ops/pallas/afi_rdb.py): numerics-exact
# (interpret-mode tested), but this environment's remote Mosaic compile
# helper SIGKILLs on it — default off until the compile path is fixed.
_C.MODEL.AFI.FUSED_KERNEL = False

_C.MODEL.BACKBONE = CN()
_C.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
_C.MODEL.BACKBONE.FREEZE_AT = 2

_C.MODEL.GUIDE_BACKBONE = CN()
_C.MODEL.GUIDE_BACKBONE.NAME = "build_resnet_fpn_backbone"
_C.MODEL.GUIDE_BACKBONE.FREEZE_AT = 2

_C.MODEL.FPN = CN()
_C.MODEL.FPN.IN_FEATURES = []
_C.MODEL.FPN.OUT_CHANNELS = 256
_C.MODEL.FPN.NORM = ""
_C.MODEL.FPN.FUSE_TYPE = "sum"
# "maxpool" (RCNN p6) or "p6p7" (RetinaNet/FCOS extra convs)
_C.MODEL.FPN.TOP_BLOCK = "maxpool"
_C.MODEL.FPN.TOP_BLOCK_IN_FEATURE = "p5"

_C.MODEL.BIFPN = CN()
_C.MODEL.BIFPN.IN_FEATURES = []
_C.MODEL.BIFPN.OUT_CHANNELS = 256
_C.MODEL.BIFPN.FPN_REPEAT = 3
_C.MODEL.BIFPN.NORM = "SyncBN"
_C.MODEL.BIFPN.FUSE_TYPE = "sum"

_C.MODEL.RESNETS = CN()
_C.MODEL.RESNETS.DEPTH = 50
_C.MODEL.RESNETS.OUT_FEATURES = ["res4"]
_C.MODEL.RESNETS.NUM_GROUPS = 1
_C.MODEL.RESNETS.NORM = "FrozenBN"
_C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
_C.MODEL.RESNETS.STRIDE_IN_1X1 = True
_C.MODEL.RESNETS.RES5_DILATION = 1
_C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
_C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
_C.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]
_C.MODEL.RESNETS.DEFORM_MODULATED = False
_C.MODEL.RESNETS.DEFORM_NUM_GROUPS = 1
# ResNeSt additions (ref afigan/config/defaults.py:32-41)
_C.MODEL.RESNETS.RADIX = 1
_C.MODEL.RESNETS.BOTTLENECK_WIDTH = 64
_C.MODEL.RESNETS.DEEP_STEM = False
_C.MODEL.RESNETS.AVD = False
_C.MODEL.RESNETS.AVG_DOWN = False

_C.MODEL.SWINT = CN()
_C.MODEL.SWINT.EMBED_DIM = 96
_C.MODEL.SWINT.OUT_FEATURES = ["stage2", "stage3", "stage4", "stage5"]
_C.MODEL.SWINT.DEPTHS = [2, 2, 6, 2]
_C.MODEL.SWINT.NUM_HEADS = [3, 6, 12, 24]
_C.MODEL.SWINT.WINDOW_SIZE = 7
_C.MODEL.SWINT.MLP_RATIO = 4
_C.MODEL.SWINT.DROP_PATH_RATE = 0.2
_C.MODEL.SWINT.APE = False

_C.MODEL.ANCHOR_GENERATOR = CN()
_C.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
_C.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
_C.MODEL.ANCHOR_GENERATOR.ANGLES = [[-90, 0, 90]]
_C.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

_C.MODEL.PROPOSAL_GENERATOR = CN()
_C.MODEL.PROPOSAL_GENERATOR.NAME = "RPN"
_C.MODEL.PROPOSAL_GENERATOR.MIN_SIZE = 0

_C.MODEL.RPN = CN()
_C.MODEL.RPN.HEAD_NAME = "StandardRPNHead"
_C.MODEL.RPN.IN_FEATURES = ["res4"]
_C.MODEL.RPN.BOUNDARY_THRESH = -1
_C.MODEL.RPN.IOU_THRESHOLDS = [0.3, 0.7]
_C.MODEL.RPN.IOU_LABELS = [0, -1, 1]
_C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
_C.MODEL.RPN.POSITIVE_FRACTION = 0.5
_C.MODEL.RPN.SMOOTH_L1_BETA = 0.0
_C.MODEL.RPN.LOSS_WEIGHT = 1.0
_C.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 12000
_C.MODEL.RPN.PRE_NMS_TOPK_TEST = 6000
_C.MODEL.RPN.POST_NMS_TOPK_TRAIN = 2000
_C.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
_C.MODEL.RPN.NMS_THRESH = 0.7
_C.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)

_C.MODEL.ROI_HEADS = CN()
_C.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
_C.MODEL.ROI_HEADS.NUM_CLASSES = 80
_C.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
_C.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
_C.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
_C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
_C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
_C.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
_C.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
_C.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = True

_C.MODEL.ROI_BOX_HEAD = CN()
_C.MODEL.ROI_BOX_HEAD.NAME = ""
_C.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
_C.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA = 0.0
_C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
_C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
_C.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
_C.MODEL.ROI_BOX_HEAD.NUM_FC = 0
_C.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
_C.MODEL.ROI_BOX_HEAD.NUM_CONV = 0
_C.MODEL.ROI_BOX_HEAD.CONV_DIM = 256
_C.MODEL.ROI_BOX_HEAD.NORM = ""
_C.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False
_C.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES = False

_C.MODEL.ROI_BOX_CASCADE_HEAD = CN()
_C.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS = (
    (10.0, 10.0, 5.0, 5.0),
    (20.0, 20.0, 10.0, 10.0),
    (30.0, 30.0, 15.0, 15.0),
)
_C.MODEL.ROI_BOX_CASCADE_HEAD.IOUS = (0.5, 0.6, 0.7)

_C.MODEL.ROI_MASK_HEAD = CN()
_C.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
_C.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
_C.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 0
_C.MODEL.ROI_MASK_HEAD.NUM_CONV = 0
_C.MODEL.ROI_MASK_HEAD.CONV_DIM = 256
_C.MODEL.ROI_MASK_HEAD.NORM = ""
_C.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = False
_C.MODEL.ROI_MASK_HEAD.POOLER_TYPE = "ROIAlignV2"

# Keypoint R-CNN head (d2 v0.1.1 KRCNNConvDeconvUpsampleHead defaults —
# the substrate behind the reference evaluator's OKS keypoint task,
# ref afigan/evaluation/coco_evaluation.py:477-511)
_C.MODEL.ROI_KEYPOINT_HEAD = CN()
_C.MODEL.ROI_KEYPOINT_HEAD.NAME = "KRCNNConvDeconvUpsampleHead"
_C.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 14
_C.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO = 0
_C.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = [512, 512, 512, 512, 512, 512, 512, 512]
_C.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 17
_C.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE = 1
_C.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS = True
_C.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT = 1.0
_C.MODEL.ROI_KEYPOINT_HEAD.POOLER_TYPE = "ROIAlignV2"

# FCOS head (BASELINE.json target config; external codebase in the reference,
# first-class citizen here)
_C.MODEL.FCOS = CN()
_C.MODEL.FCOS.NUM_CLASSES = 80
_C.MODEL.FCOS.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
_C.MODEL.FCOS.FPN_STRIDES = [8, 16, 32, 64, 128]
_C.MODEL.FCOS.NUM_CONVS = 4
_C.MODEL.FCOS.PRIOR_PROB = 0.01
_C.MODEL.FCOS.INFERENCE_TH_TRAIN = 0.05
_C.MODEL.FCOS.INFERENCE_TH_TEST = 0.05
_C.MODEL.FCOS.NMS_TH = 0.6
_C.MODEL.FCOS.PRE_NMS_TOPK_TRAIN = 1000
_C.MODEL.FCOS.PRE_NMS_TOPK_TEST = 1000
_C.MODEL.FCOS.POST_NMS_TOPK_TRAIN = 100
_C.MODEL.FCOS.POST_NMS_TOPK_TEST = 100
_C.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
_C.MODEL.FCOS.SIZES_OF_INTEREST = [64, 128, 256, 512]
_C.MODEL.FCOS.CENTER_SAMPLE = True
_C.MODEL.FCOS.POS_RADIUS = 1.5
_C.MODEL.FCOS.NORM = "GN"
_C.MODEL.FCOS.USE_SCALE = True
_C.MODEL.FCOS.THRESH_WITH_CTR = False
_C.MODEL.FCOS.CENTERNESS_ON_REG = True

# ---------------------------------------------------------------------------
# INPUT / DATASETS / DATALOADER
# ---------------------------------------------------------------------------
_C.INPUT = CN()
_C.INPUT.MIN_SIZE_TRAIN = (800,)
_C.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
_C.INPUT.MAX_SIZE_TRAIN = 1333
_C.INPUT.MIN_SIZE_TEST = 800
_C.INPUT.MAX_SIZE_TEST = 1333
_C.INPUT.CROP = CN({"ENABLED": False})
_C.INPUT.CROP.TYPE = "relative_range"
_C.INPUT.CROP.SIZE = [0.9, 0.9]
# Framework extension: d2-style color jitter (BlendTransform weights
# sampled uniformly from the [lo, hi] ranges; ref transform_gen.py:312-417
# RandomContrast/RandomBrightness/RandomSaturation)
_C.INPUT.COLOR_JITTER = CN({"ENABLED": False})
_C.INPUT.COLOR_JITTER.BRIGHTNESS = [0.9, 1.1]
_C.INPUT.COLOR_JITTER.CONTRAST = [0.9, 1.1]
_C.INPUT.COLOR_JITTER.SATURATION = [0.9, 1.1]
_C.INPUT.FORMAT = "BGR"
_C.INPUT.MASK_FORMAT = "polygon"

_C.DATASETS = CN()
_C.DATASETS.TRAIN = ()
_C.DATASETS.TEST = ()
_C.DATASETS.PROPOSAL_FILES_TRAIN = ()
_C.DATASETS.PROPOSAL_FILES_TEST = ()
_C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 2000
_C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 1000
# Root dir holding COCO-format datasets (reference reads $DETECTRON2_DATASETS)
_C.DATASETS.ROOT = "datasets"

_C.DATALOADER = CN()
_C.DATALOADER.NUM_WORKERS = 4
_C.DATALOADER.ASPECT_RATIO_GROUPING = True
_C.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
_C.DATALOADER.REPEAT_THRESHOLD = 0.0
_C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True

# ---------------------------------------------------------------------------
# SOLVER
# ---------------------------------------------------------------------------
_C.SOLVER = CN()
_C.SOLVER.MAX_ITER = 40000
_C.SOLVER.BASE_LR = 0.001
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.WEIGHT_DECAY = 0.0001
_C.SOLVER.WEIGHT_DECAY_NORM = 0.0
_C.SOLVER.GAMMA = 0.1
_C.SOLVER.STEPS = (30000,)
_C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
_C.SOLVER.WARMUP_ITERS = 1000
_C.SOLVER.WARMUP_METHOD = "linear"
_C.SOLVER.CHECKPOINT_PERIOD = 5000
_C.SOLVER.IMS_PER_BATCH = 16
_C.SOLVER.BIAS_LR_FACTOR = 1.0
_C.SOLVER.WEIGHT_DECAY_BIAS = 0.0001
_C.SOLVER.OPTIMIZER = "SGD"
_C.SOLVER.AMP = CN({"ENABLED": False})
_C.SOLVER.CLIP_GRADIENTS = CN({"ENABLED": False})
_C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
_C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
_C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0

# ---------------------------------------------------------------------------
# TEST
# ---------------------------------------------------------------------------
_C.TEST = CN()
_C.TEST.EXPECTED_RESULTS = []
_C.TEST.EVAL_PERIOD = 0
_C.TEST.KEYPOINT_OKS_SIGMAS = []
_C.TEST.DETECTIONS_PER_IMAGE = 100
_C.TEST.AUG = CN({"ENABLED": False})
_C.TEST.AUG.MIN_SIZES = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200)
_C.TEST.AUG.MAX_SIZE = 4000
_C.TEST.AUG.FLIP = True
_C.TEST.PRECISE_BN = CN({"ENABLED": False})
_C.TEST.PRECISE_BN.NUM_ITER = 200

# ---------------------------------------------------------------------------
# TPU (new section — static shapes, mesh, dtypes)
# ---------------------------------------------------------------------------
_C.TPU = CN()
# Compute dtype inside models ("bfloat16" or "float32"); params stay fp32.
_C.TPU.COMPUTE_DTYPE = "bfloat16"
# Padding buckets for static image shapes: each (H, W) canvas; images are
# resized per INPUT.* then padded up to the smallest bucket that fits.
# All dims divisible by 64 so the x0.5 dual-scale pipeline still yields an
# exactly-2x-contiguous pyramid (the d2 size_divisibility requirement).
_C.TPU.IMAGE_BUCKETS = [[704, 704], [704, 1152], [1152, 704], [832, 1344], [1344, 832]]
# Fixed per-image box capacity for ground-truth padding.
_C.TPU.MAX_GT_BOXES = 100
# Per-instance GT mask canvas (rasterized once on host, crop-resized to
# 28x28 inside the jitted step — SURVEY §7.4 mask-target plan).
_C.TPU.MASK_CANVAS = 112
# Rematerialize activations during training (jax.checkpoint): trades
# extra forward FLOPs for activation memory. Measured on v5e: batch 8
# fits WITHOUT remat and remat only slows it, so default off. For
# batch 16 per chip (the reference's global batch on one chip) prefer
# TPU.GRAD_ACCUM=2 (below) — measured 24.0 img/s vs full remat's
# 18.74 — and keep remat for shapes where even a microbatch overflows.
_C.TPU.REMAT = False
# Remat granularity when TPU.REMAT is on. "full": every backbone block +
# pyramid + AFI (max memory savings). "selective": only the
# memory-dominant, cheap-to-recompute parts — res2 (stride-4 planes),
# the pyramid, and the AFI dense blocks — keeping res3-5 activations
# stored. CAUTION: at per-chip batch >= 16 (800x1344) "selective"
# AOT-measures 13.4 GiB on a 15.75 GiB chip but reliably FAULTS the TPU
# worker at run time (observed twice, 2026-08-18) — the estimate leaves
# no headroom for runtime staging; use "full" there (measured 2.44x
# baseline, well over the gate). res2+res3 was tried and measured WORSE
# (15.2 GiB): XLA does not convert the extra recompute into lower peak.
_C.TPU.REMAT_MODE = "full"
# Stage-3 gradient accumulation: split each (per-device) batch into this
# many microbatches inside the jitted step (lax.scan), averaging grads.
# Semantics match k-way data parallelism (the same per-shard-mean-of-
# means the shard_map path applies), so numerics are the blessed DP
# numerics — NOT a new training regime. The TPU-native way to run the
# reference's global batch 16 on one chip: 2 microbatches of 8, each of
# which fits WITHOUT remat, instead of paying full-remat recompute.
_C.TPU.GRAD_ACCUM = 1
# Training-only: approx_max_k (TPU PartialReduce, recall >= 0.95) for the
# RPN pre-NMS per-level top-k; eval always uses exact top_k (d2 numerics).
_C.TPU.APPROX_TOPK = True
# ROI pooler implementation: "pallas" (fused window-DMA + MXU kernel
# forward with a dense-matmul adjoint backward, the default — cuts the
# stage-3 step 544->350 ms at batch 8 by eliminating the XLA gather
# lowering of the window pool), "fast" (windowed-matmul forward +
# point-scatter backward), "windowed" (same forward, autodiff backward),
# "gather" (per-point gather reference).
_C.TPU.POOLER_IMPL = "pallas"
# Swin window-attention implementation. "pallas" = the fused VMEM
# kernel (ops/pallas/window_attention.py), inference-only; "auto" =
# pallas for TPU inference, xla otherwise; "xla" = einsum + f32 softmax.
# DEFAULT IS "xla" BY MEASUREMENT: the round-4 on-chip A/B at flagship
# shapes (Cascade Swin-L BiFPN, 896x1408 batch 4, back-to-back,
# benchmarks/results/ab_swin_kernels_r04.jsonl) found the Pallas
# attention kernel NEUTRAL (11.452 vs 11.454 img/s) and the Pallas
# LayerNorm slightly NEGATIVE (11.354 vs 11.454), despite both looking
# like clear bandwidth wins in the device trace — same lesson as the
# fused-AFI generator post-mortem (PARITY.md): trace-plausible fusions
# must win an A/B before shipping default-on.
_C.TPU.SWIN_ATTN_IMPL = "xla"
# Swin LayerNorm implementation: "auto" = follow the resolved
# SWIN_ATTN_IMPL; "pallas" / "xla" force one implementation
# independently of the attention kernel — the knob exists so the two
# kernels can be A/B measured in isolation. Measured 0.9% SLOWER than
# the XLA lowering at flagship shapes (see SWIN_ATTN_IMPL note), so the
# default (via attn "xla") is xla.
_C.TPU.SWIN_LN_IMPL = "auto"
# Swin XLA-attention structure knobs (round-5 A/B levers for the two
# hot categories in benchmarks/results/flagship_breakdown_r04.txt):
# SWIN_QKV_LAYOUT: "headmajor" computes the window attention directly on
# the (bnw, n, heads, hd) qkv layout (heads as an einsum batch dim, no
# explicit head-split transposes — the breakdown's 20.2% "layout" rows
# are bf16[...,3,nh,hd] permutes of the qkv tensor); "split" is the
# d2-style explicit transpose chain. DEFAULT "split" BY MEASUREMENT:
# round-5 back-to-back flagship A/B (3 interleaved reps,
# benchmarks/results/ab_swin_struct_r05.jsonl) measured headmajor
# 10.045/10.051/10.052 vs split 11.436/11.447/11.448 img/s — 12.2%
# SLOWER despite deleting the permutes: XLA lowers the non-leading
# batch-dim dot_generals to worse internal layouts than the one-time
# copies cost. Same lesson as the Pallas-kernel A/Bs: trace-plausible
# restructurings must win on the chip before shipping.
_C.TPU.SWIN_QKV_LAYOUT = "split"
# SWIN_SCORES_DTYPE: dtype the attention scores/softmax are carried in.
# "float32" is the d2-faithful choice; "bfloat16" keeps the (…, n, n)
# score tensor in bf16 end-to-end (MXU still accumulates the QK^T
# matmul in f32; exp/sum run in bf16) — halves the HBM bytes of the
# softmax round-trip (~29% of flagship device time combined with the
# adjacent reduces). DEFAULT "bfloat16" BY MEASUREMENT: round-5
# back-to-back flagship A/B (3 interleaved reps,
# benchmarks/results/ab_swin_struct_r05.jsonl) measured 13.051/13.045/
# 13.022 vs 11.445/11.446/11.447 img/s — +14.0%, non-overlapping.
# Numerics guard: backbone features within 2e-2 relative of the f32
# path (tests/test_swin_impl_gates.py) and the full flagship pipeline
# produces identical post-NMS detections on the CPU check; the window
# softmax is over 144 bf16 logits with the additive bias/mask applied
# before the cast, so the f32-vs-bf16 difference is far below the
# detection thresholds. Set "float32" for strict d2-parity debugging.
_C.TPU.SWIN_SCORES_DTYPE = "bfloat16"
# TTA batching: evaluate up to TTA_BATCH images per compiled
# (scale, flip, canvas) program, capped so batch * canvas-pixels stays
# under TTA_PIXEL_BUDGET (the flagship inference bench validates batch 4
# at 832x1344 ≈ 4.5M pixels on a 16 GB chip). Batching amortizes the
# per-program dispatch/weight-staging cost across images; identical math
# to batch-1 (each batch element is processed independently; outputs are
# sliced back out — pinned by tests/test_tta.py). DEFAULT 1: the
# round-5 batched A/B arm (BENCH_TTA_BATCH=8) took this environment's
# TPU worker down at RUN time twice — not HBM (every per-canvas program
# AOT-estimates <= 2.8 GiB under the sweep guard; see
# benchmarks/results/tta_batch_ab_r05.log) — the same
# new-program-shape worker-fault class the r3 NMS block sweep hit. The
# batch-1 arm measured 0.0151 img/s (tta_batch_ab_r05.jsonl). Batching
# remains the intended mode on regular locally-attached TPUs; raise
# TTA_BATCH to opt in.
_C.TPU.TTA_BATCH = 1
_C.TPU.TTA_PIXEL_BUDGET = 4_500_000
# Mesh: axis names and sizes; -1 means "all remaining devices".
_C.TPU.MESH_AXES = ["data"]
_C.TPU.MESH_SHAPE = [-1]


def get_default_cfg() -> CN:
    return _C.clone()
