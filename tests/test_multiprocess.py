"""Real 2-process jax.distributed test (round-2 VERDICT next-step #4).

Launches two CPU processes coordinated over localhost and asserts:
  * both report identical pmean'd train metrics (cross-process grad psum
    through the shard_map'ped stage-3 step actually synchronized them);
  * sampler striping gave the processes disjoint training records;
  * ``process_allgather``-backed eval produces IDENTICAL results on both
    processes AND identical to a single-process eval of the full dataset;
  * checkpoint IO is rank-0 gated.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.fixtures import make_tiny_coco

TINY_CFG = """
_BASE_: "/root/repo/configs/inference/AFI-GAN_maskrcnn_R_50_FPN.yaml"
MODEL:
  MASK_ON: False
  ROI_HEADS:
    NUM_CLASSES: 3
    BATCH_SIZE_PER_IMAGE: 16
  RPN:
    PRE_NMS_TOPK_TEST: 64
    POST_NMS_TOPK_TEST: 32
    PRE_NMS_TOPK_TRAIN: 64
    POST_NMS_TOPK_TRAIN: 32
    BATCH_SIZE_PER_IMAGE: 16
  FPN:
    OUT_CHANNELS: 16
  AFI:
    IN_CHANNELS: 16
    N_RDB: 1
    GROWTH_RATE: 8
INPUT:
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 96
  MIN_SIZE_TRAIN: (64,)
  MAX_SIZE_TRAIN: 96
SOLVER:
  IMS_PER_BATCH: 2
TEST:
  DETECTIONS_PER_IMAGE: 8
TPU:
  COMPUTE_DTYPE: "float32"
  IMAGE_BUCKETS: [[64, 96]]
  MAX_GT_BOXES: 8
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_and_eval(tmp_path):
    root = tmp_path / "fixture"
    root.mkdir()
    json_path, img_dir = make_tiny_coco(str(root), num_images=4, hw=(64, 96))
    (root / "cfg.yaml").write_text(TINY_CFG)
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # 1 cpu device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    env["PYTHONPATH"] = "/root/repo"

    procs = [
        subprocess.Popen(
            [sys.executable, "/root/repo/tests/multiproc_worker.py",
             coordinator, "2", str(i), str(root), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1100) for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{outs[i][1][-3000:]}"

    r0 = json.loads((out_dir / "out_rank0.json").read_text())
    r1 = json.loads((out_dir / "out_rank1.json").read_text())

    # train metrics are pmean'd over the 2-process mesh -> identical
    assert r0["metrics"].keys() == r1["metrics"].keys()
    for k in r0["metrics"]:
        assert np.isfinite(r0["metrics"][k])
        np.testing.assert_allclose(
            r0["metrics"][k], r1["metrics"][k], rtol=1e-5,
            err_msg=f"metric {k} differs across processes (psum broken?)"
        )

    # sampler striping: disjoint training records
    assert not set(r0["local_ids"]) & set(r1["local_ids"]), (
        r0["local_ids"], r1["local_ids"]
    )

    # distributed eval: identical on both ranks
    assert r0["results"] == r1["results"]
    assert "bbox" in r0["results"] and np.isfinite(r0["results"]["bbox"]["AP"])

    # rank-0-only checkpoint gating
    assert (out_dir / "ckpt_rank0.msgpack").exists()
    assert not (out_dir / "ckpt_rank1.msgpack").exists()

    # ---- single-process reference eval over the SAME fixture ----
    from afigan_tpu.config import get_cfg
    from afigan_tpu.data import register_coco_instances, get_dataset
    from afigan_tpu.engine.inference import run_inference
    from afigan_tpu.models import build_model

    import jax
    import jax.numpy as jnp

    cfg = get_cfg()
    cfg.merge_from_file(str(root / "cfg.yaml"))
    register_coco_instances("mp_tiny_sp", str(json_path), str(img_dir))
    ds = get_dataset("mp_tiny_sp")
    model = build_model(cfg, train=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 96, 3)), jnp.asarray([[64, 96]], jnp.int32),
    )
    sp = run_inference(cfg, model, variables, ds)
    for task, metrics in sp.items():
        for k, v in metrics.items():
            np.testing.assert_allclose(
                r0["results"][task][k], v, rtol=1e-6,
                err_msg=f"{task}/{k}: distributed != single-process"
            )
