"""afigan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of AFI-GAN.

A standalone detection framework with the capabilities of
inhavl-shlee/AFI-GAN (Pattern Recognition 2023): a learned adversarial
feature interpolator (AFI) that replaces nearest/bilinear upsampling in
feature-pyramid top-down pathways, trained in a 3-stage progressive
pipeline, plus the full detector stack it plugs into (ResNet/ResNeSt/Swin
backbones, FPN/PAFPN/BiFPN pyramids, RPN + Standard/Cascade ROI heads,
FCOS head, COCO evaluation).

Design stance (TPU-first, not a port):
  * NHWC layout, bfloat16 compute / fp32 params, static shapes everywhere
    (padded batches, fixed-K proposals with validity masks).
  * Pure-functional Flax models; each training stage is ONE jit-compiled
    train step (D-step + G-step fused) over a `jax.sharding.Mesh`.
  * Data parallelism via shard_map + psum on the `data` mesh axis
    (the reference's DDP/NCCL, reimagined for ICI).
  * Hot ops (AFI upsampler, ROIAlign, NMS) are TPU-native: Pallas kernels
    or pure-XLA fixed-shape formulations.
"""

__version__ = "0.1.0"
