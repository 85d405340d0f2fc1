"""CLI end-to-end: run_net.py --eval-only as a subprocess on tiny COCO.

Drives the actual user-facing surface: YAML config load, dataset
registration from DATASETS.ROOT, model build, inference, COCO AP output.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from tests.fixtures import make_tiny_coco


@pytest.mark.parametrize("dummy", [0])
def test_run_net_eval_cli(tmp_path, dummy):
    # lay out datasets/coco/{annotations,val2017} as register_default expects
    root = tmp_path / "datasets" / "coco"
    (root / "annotations").mkdir(parents=True)
    json_path, img_dir = make_tiny_coco(str(tmp_path / "raw"), num_images=2,
                                        hw=(64, 96))
    shutil.copy(json_path, root / "annotations" / "instances_val2017.json")
    shutil.copytree(img_dir, root / "val2017")

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        """
_BASE_: "/root/repo/configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml"
MODEL:
  MASK_ON: True
  ROI_HEADS:
    NUM_CLASSES: 3
    BATCH_SIZE_PER_IMAGE: 16
  RPN:
    PRE_NMS_TOPK_TEST: 64
    POST_NMS_TOPK_TEST: 32
    BATCH_SIZE_PER_IMAGE: 16
  FPN:
    OUT_CHANNELS: 32
  AFI:
    IN_CHANNELS: 32
    N_RDB: 1
    GROWTH_RATE: 8
INPUT:
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 96
TEST:
  DETECTIONS_PER_IMAGE: 8
TPU:
  COMPUTE_DTYPE: "float32"
  IMAGE_BUCKETS: [[64, 96], [128, 128]]
"""
    )

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    out = subprocess.run(
        [
            sys.executable, "/root/repo/run_net.py",
            "--config-file", str(cfg_path), "--eval-only",
            "DATASETS.ROOT", str(tmp_path / "datasets"),
            "OUTPUT_DIR", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, timeout=1200, cwd="/root/repo", env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # printed a results dict containing bbox/segm APs
    assert "bbox" in out.stdout and "segm" in out.stdout, out.stdout[-2000:]
