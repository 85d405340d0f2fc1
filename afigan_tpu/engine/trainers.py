"""The three stage trainers — host orchestration around the jitted steps.

Surface parity with the reference's engine (SURVEY §3.2-3.4):
  * AFIGANTrainer (stage 1, ref stage1_trainer.py): G/D/guide; guide
    weights from MODEL.GUIDE_WEIGHTS; optional AFI_GEN/AFI_DIS resume;
    per-model checkpoint dirs G_0/ and D_0/.
  * AFExtractorTrainer (stage 2, ref stage2_trainer.py): detector + D +
    guide; loads stage-1 G into backbone srf_module (name surgery) and
    stage-1 D stripping optimizer state; checkpoints into AFExtractor/
    and Disc/; periodic eval hook.
  * TargetDetectorTrainer (stage 3, ref stage3_trainer.py): plain
    detector; transplants the AFI subtree from MODEL.AF_EXTRACTOR_WEIGHTS;
    ImageNet backbone init from MODEL.WEIGHTS.

All three: mesh-aware (1-D data axis), resume via last_checkpoint, NaN
guard, JSON/terminal/TB writers every 20 iters.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data import build_train_loader, get_dataset, register_default_datasets
from ..models import build_model
from ..models.roi_heads import GroundTruth
from ..parallel.mesh import (assert_uniform_across_processes,
                             process_is_main, replicate, shard_batch)
from .checkpoint import (
    resume_or_load,
    save_checkpoint,
    transplant_generator,
    extract_afi_subtree,
)
from .events import setup_logger
from .solver import warmup_multistep_schedule
from .stage1 import init_stage1_state, make_stage1_train_step
from .stage2 import init_stage2_state, make_stage2_train_step
from .stage3 import init_stage3_state, make_stage3_train_step
from .train_loop import (
    EvalHook,
    Hook,
    IterationTimer,
    LRLogger,
    PeriodicCheckpointer,
    PeriodicWriter,
    TrainLoop,
    default_writers,
)
from .weights import load_weights

logger = logging.getLogger("afigan_tpu")


def _gt_from_batch(g: Dict) -> GroundTruth:
    return GroundTruth(
        boxes=jnp.asarray(g["boxes"]),
        classes=jnp.asarray(g["classes"]),
        valid=jnp.asarray(g["valid"]),
        masks=jnp.asarray(g["masks"]) if "masks" in g else None,
        keypoints=jnp.asarray(g["keypoints"]) if "keypoints" in g else None,
    )


class _BaseTrainer:
    stage_name = "base"

    def __init__(self, cfg, use_mesh: bool = True):
        self.cfg = cfg
        setup_logger("afigan_tpu", cfg.OUTPUT_DIR)
        register_default_datasets(cfg.DATASETS.ROOT)
        # data-parallel mesh over the largest device count that divides the
        # per-host batch (ref asserts IMS_PER_BATCH % world_size == 0,
        # stage1_trainer.py:577-589; we degrade gracefully instead)
        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            # divisibility is PER-HOST vs LOCAL devices (a global-prefix
            # mesh would exclude whole hosts and break replicate/
            # shard_batch on them); every host contributes the same
            # number of its own devices.
            procs = max(jax.process_count(), 1)
            local = jax.local_device_count()
            per_host = max(cfg.SOLVER.IMS_PER_BATCH // procs, 1)
            n_local = min(local, per_host)
            while n_local > 1 and per_host % n_local != 0:
                n_local -= 1
            if n_local * procs > 1:
                from ..parallel.mesh import make_mesh

                if procs > 1:
                    by_proc = {}
                    for d in jax.devices():
                        by_proc.setdefault(d.process_index, []).append(d)
                    devices = [
                        d for p in sorted(by_proc)
                        for d in sorted(by_proc[p], key=lambda x: x.id)[:n_local]
                    ]
                else:
                    devices = jax.devices()[:n_local]
                self.mesh = make_mesh(("data",), (len(devices),), devices)
        self.output_dir = cfg.OUTPUT_DIR
        os.makedirs(self.output_dir, exist_ok=True)
        self.schedule = warmup_multistep_schedule(
            cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
            cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_METHOD,
        )

    def _train_dataset(self):
        return get_dataset(self.cfg.DATASETS.TRAIN[0])

    def _precise_bn_hook(self):
        """d2 hooks.PreciseBN equivalent (ref stage1_trainer.py:177-236):
        every TEST.EVAL_PERIOD, recompute BN statistics as true batch
        averages over TEST.PRECISE_BN.NUM_ITER train batches. Returns None
        when disabled or the model has no BN stats."""
        cfg = self.cfg
        if not (cfg.TEST.PRECISE_BN.ENABLED and cfg.TEST.EVAL_PERIOD > 0):
            return None
        if not self._bn_stats():
            return None
        trainer = self

        class _PreciseBNHook(Hook):
            def after_step(self, loop):
                it = loop.storage.iter + 1
                if it % cfg.TEST.EVAL_PERIOD == 0 or it == loop.max_iter:
                    trainer.run_precise_bn(cfg.TEST.PRECISE_BN.NUM_ITER)

        return _PreciseBNHook()

    def _bn_stats(self):  # overridden where the state carries BN stats
        return None

    def run_precise_bn(self, num_iter: int):  # overridden alongside
        raise NotImplementedError

    def _hooks(self, start_iter: int, extra=None):
        # d2 build_hooks order: eval hooks run BEFORE the writers so eval
        # scalars land in the same flush (writers must be LAST).
        hooks = [IterationTimer(), LRLogger(self.schedule)]
        hooks.extend(extra or [])
        if process_is_main():
            hooks.append(
                PeriodicCheckpointer(self.save, self.cfg.SOLVER.CHECKPOINT_PERIOD)
            )
            hooks.append(
                PeriodicWriter(
                    default_writers(self.output_dir, self.cfg.SOLVER.MAX_ITER)
                )
            )
        return hooks

    def save(self, iteration: int):  # overridden
        raise NotImplementedError

    def _maybe_shard(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch


class AFIGANTrainer(_BaseTrainer):
    """Stage 1 (ref stage1_trainer.py:46-301)."""

    stage_name = "afi-gan"

    def __init__(self, cfg):
        super().__init__(cfg)
        self.state, self.guide_vars = init_stage1_state(
            cfg, jax.random.PRNGKey(max(cfg.SEED, 0))
        )
        if cfg.MODEL.GUIDE_WEIGHTS:
            self.guide_vars = load_weights(
                cfg.MODEL.GUIDE_WEIGHTS, self.guide_vars, kind="detector"
            )
        if cfg.MODEL.AFI_GEN_WEIGHTS:
            self.state = self.state._replace(
                g_params=load_weights(
                    cfg.MODEL.AFI_GEN_WEIGHTS,
                    {"params": self.state.g_params}, kind="generator",
                )["params"]
            )
        if cfg.MODEL.AFI_DIS_WEIGHTS:
            loaded = load_weights(
                cfg.MODEL.AFI_DIS_WEIGHTS,
                {"params": self.state.d_params, "batch_stats": self.state.d_stats},
                kind="discriminator",
            )
            self.state = self.state._replace(
                d_params=loaded["params"],
                d_stats=loaded.get("batch_stats", self.state.d_stats),
            )
        self.step_fn = make_stage1_train_step(cfg, mesh=self.mesh)
        self.loader = None

    def save(self, iteration: int):
        st = jax.device_get(self.state)
        # per-model dirs, ref stage1_trainer.py:129-150
        save_checkpoint(
            os.path.join(self.output_dir, "G_0"), f"model_{iteration:07d}",
            {"params": st.g_params, "opt": st.g_opt, "step": st.step},
        )
        save_checkpoint(
            os.path.join(self.output_dir, "D_0"), f"model_{iteration:07d}",
            {"params": st.d_params, "batch_stats": st.d_stats, "opt": st.d_opt,
             "step": st.step},
        )

    def resume(self) -> int:
        g_dir = os.path.join(self.output_dir, "G_0")
        d_dir = os.path.join(self.output_dir, "D_0")
        st = jax.device_get(self.state)
        g_tpl = {"params": st.g_params, "opt": st.g_opt, "step": st.step}
        d_tpl = {"params": st.d_params, "batch_stats": st.d_stats, "opt": st.d_opt,
                 "step": st.step}
        g_loaded, g_ok = resume_or_load(g_dir, g_tpl)
        d_loaded, d_ok = resume_or_load(d_dir, d_tpl)
        if g_ok:
            self.state = self.state._replace(
                g_params=g_loaded["params"], g_opt=g_loaded["opt"],
                step=jnp.asarray(g_loaded["step"]),
            )
        if d_ok:
            self.state = self.state._replace(
                d_params=d_loaded["params"], d_stats=d_loaded["batch_stats"],
                d_opt=d_loaded["opt"],
            )
        return int(g_loaded["step"]) if g_ok else 0

    def train(self, resume: bool = False):
        cfg = self.cfg
        start_iter = self.resume() if resume else 0
        # a checkpoint visible on SOME hosts only would desync the
        # replicated state silently — fail fast instead
        assert_uniform_across_processes(start_iter, "resume start_iter")
        dataset = self._train_dataset()
        self.loader = build_train_loader(
            cfg, dataset, dual_scale=True, seed=max(cfg.SEED, 0),
            shard_id=jax.process_index(), num_shards=jax.process_count(),
        )
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self.guide_vars = replicate(self.mesh, self.guide_vars)

        loop = TrainLoop(cfg.SOLVER.MAX_ITER, self._hooks(start_iter), start_iter)

        def run_step():
            t0 = time.perf_counter()
            batch = next(self.loader)
            data_time = time.perf_counter() - t0
            device_batch = self._maybe_shard(
                {"image": batch["image"], "image_x0.5": batch["image_x0.5"]}
            )
            self.state, metrics = self.step_fn(self.state, self.guide_vars, device_batch)
            out = {k: float(v) for k, v in jax.device_get(metrics).items()}
            out["data_time"] = data_time
            return out

        try:
            loop.run(run_step)
        finally:
            if self.loader:
                self.loader.close()


class AFExtractorTrainer(_BaseTrainer):
    """Stage 2 (ref stage2_trainer.py:48-255)."""

    stage_name = "af-extractor"

    def __init__(self, cfg):
        super().__init__(cfg)
        self.state, self.guide_vars = init_stage2_state(
            cfg, jax.random.PRNGKey(max(cfg.SEED, 0))
        )
        if cfg.MODEL.GUIDE_WEIGHTS:
            self.guide_vars = load_weights(
                cfg.MODEL.GUIDE_WEIGHTS, self.guide_vars, kind="detector"
            )
        if cfg.MODEL.WEIGHTS:
            det_vars = load_weights(
                cfg.MODEL.WEIGHTS, {"params": self.state.det_params}, kind="detector"
            )
            self.state = self.state._replace(det_params=det_vars["params"])
        if cfg.MODEL.AFI_GEN_WEIGHTS:
            self.load_afigen_weight(cfg.MODEL.AFI_GEN_WEIGHTS)
        if cfg.MODEL.AFI_DIS_WEIGHTS:
            loaded = load_weights(
                cfg.MODEL.AFI_DIS_WEIGHTS,
                {"params": self.state.d_params, "batch_stats": self.state.d_stats},
                kind="discriminator",
            )
            # optimizer/scheduler state deliberately NOT restored
            # (ref stage2_trainer.py:112-119 strips it)
            self.state = self.state._replace(
                d_params=loaded["params"],
                d_stats=loaded.get("batch_stats", self.state.d_stats),
            )
        self.step_fn = make_stage2_train_step(cfg, mesh=self.mesh)
        self.loader = None

    def load_afigen_weight(self, path: str):
        """Stage-1 G → backbone srf_module (ref checkpoint.py:78-109)."""
        if path.endswith(".msgpack"):
            from flax import serialization

            with open(path, "rb") as f:
                data = serialization.msgpack_restore(f.read())
            g_params = data["params"] if "params" in data else data
        else:
            tmp = {"params": extract_afi_subtree(self.state.det_params)}
            g_params = load_weights(path, tmp, kind="generator")["params"]
        self.state = self.state._replace(
            det_params=transplant_generator(self.state.det_params, g_params)
        )

    def save(self, iteration: int):
        st = jax.device_get(self.state)
        save_checkpoint(
            os.path.join(self.output_dir, "AFExtractor"), f"model_{iteration:07d}",
            {"params": st.det_params, "batch_stats": st.det_stats,
             "opt": st.det_opt, "step": st.step},
        )
        save_checkpoint(
            os.path.join(self.output_dir, "Disc"), f"model_{iteration:07d}",
            {"params": st.d_params, "batch_stats": st.d_stats, "opt": st.d_opt,
             "step": st.step},
        )

    def train(self, resume: bool = False):
        cfg = self.cfg
        start_iter = 0
        if resume:
            st = jax.device_get(self.state)
            tpl = {"params": st.det_params, "batch_stats": st.det_stats,
                   "opt": st.det_opt, "step": st.step}
            loaded, ok = resume_or_load(os.path.join(self.output_dir, "AFExtractor"), tpl)
            if ok:
                self.state = self.state._replace(
                    det_params=loaded["params"], det_stats=loaded["batch_stats"],
                    det_opt=loaded["opt"], step=jnp.asarray(loaded["step"]),
                )
                start_iter = int(loaded["step"])
        assert_uniform_across_processes(start_iter, "resume start_iter")
        dataset = self._train_dataset()
        self.loader = build_train_loader(
            cfg, dataset, dual_scale=True, seed=max(cfg.SEED, 0),
            shard_id=jax.process_index(), num_shards=jax.process_count(),
        )
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self.guide_vars = replicate(self.mesh, self.guide_vars)

        # in-training eval every TEST.EVAL_PERIOD (ref stage2_trainer.py:208-214)
        extra = []
        pbn = self._precise_bn_hook()
        if pbn is not None:
            extra.append(pbn)
        if cfg.TEST.EVAL_PERIOD > 0 and cfg.DATASETS.TEST:
            extra.append(EvalHook(self.evaluate, cfg.TEST.EVAL_PERIOD))
        loop = TrainLoop(cfg.SOLVER.MAX_ITER, self._hooks(start_iter, extra), start_iter)
        key = jax.random.PRNGKey(max(cfg.SEED, 0) + 1)

        def run_step():
            nonlocal key
            t0 = time.perf_counter()
            batch = next(self.loader)
            data_time = time.perf_counter() - t0
            key, sub = jax.random.split(key)
            device_batch = self._maybe_shard(
                {
                    "image": batch["image"],
                    "image_x0.5": batch["image_x0.5"],
                    "image_sizes_x0.5": batch["image_sizes_x0.5"],
                    "gt": _gt_from_batch(batch["gt_x0.5"]),
                }
            )
            self.state, metrics = self.step_fn(
                self.state, self.guide_vars, device_batch, sub
            )
            out = {k: float(v) for k, v in jax.device_get(metrics).items()}
            out["data_time"] = data_time
            return out

        try:
            loop.run(run_step)
        finally:
            if self.loader:
                self.loader.close()

    def _bn_stats(self):
        st = self.state
        return st.det_stats if st.det_stats else None

    def run_precise_bn(self, num_iter: int):
        """PreciseBN over the stage-2 detector's BN stats (half-res
        forwards, matching the training distribution)."""
        from .precise_bn import compute_precise_bn_stats

        cfg = self.cfg
        det = build_model(cfg, train=True, return_features=True)
        st = jax.device_get(self.state)
        params = st.det_params
        key = jax.random.PRNGKey(max(cfg.SEED, 0) + 777)

        fwd = jax.jit(
            lambda s, image, sizes, gt, k: det.apply(
                {"params": params, "batch_stats": s}, image, sizes, gt,
                rngs={"sampling": k,
                      "dropout": jax.random.fold_in(k, 1)},
                mutable=["batch_stats"],
            )[1]["batch_stats"]
        )
        loader = build_train_loader(
            cfg, self._train_dataset(), dual_scale=True,
            seed=max(cfg.SEED, 0) + 999,
        )

        def forward(s, batch):
            nonlocal key
            key, sub = jax.random.split(key)
            return fwd(
                s, jnp.asarray(batch["image_x0.5"]),
                jnp.asarray(batch["image_sizes_x0.5"]),
                _gt_from_batch(batch["gt_x0.5"]), sub,
            )

        try:
            new_stats = compute_precise_bn_stats(
                forward, st.det_stats, loader, num_iter
            )
        finally:
            loader.close()
        new_state = self.state._replace(
            det_stats=jax.tree.map(np.asarray, jax.device_get(new_stats))
        )
        if self.mesh is not None:
            new_state = replicate(self.mesh, jax.device_get(new_state))
        self.state = new_state

    def evaluate(self, final=True):
        """Inference-mode AF-extractor eval at HALF resolution.

        The AF-extractor consumes x0.5 images during training (ref
        rcnn_extractor.py:110-117); its in-training EvalHook (ref
        stage2_trainer.py:208-214) therefore evaluates the detector on
        half-res inputs (the reference's own inference path had quirk Q1;
        this is the intended behavior)."""
        from .inference import run_inference

        cfg = self.cfg.clone()
        cfg.defrost()
        cfg.INPUT.MIN_SIZE_TEST = int(round(cfg.INPUT.MIN_SIZE_TEST * 0.5))
        cfg.INPUT.MAX_SIZE_TEST = int(round(cfg.INPUT.MAX_SIZE_TEST * 0.5))
        # the AFExtractor meta-arch returns (detections, features); eval
        # wants the plain detector surface (same params tree)
        cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
        cfg.freeze()
        model = build_model(cfg, train=False)
        st = jax.device_get(self.state)
        variables = {"params": st.det_params}
        if st.det_stats:
            variables["batch_stats"] = st.det_stats
        results = run_inference(
            cfg, model, variables, get_dataset(cfg.DATASETS.TEST[0]),
            distributed=True,  # per-rank stripes + allgather (1-proc no-op)
        )
        from .testing import verify_results

        # ref stage1_trainer.py:296-301; mid-training evals only log
        verify_results(self.cfg, results, raise_on_failure=final)
        return results


class TargetDetectorTrainer(_BaseTrainer):
    """Stage 3 (ref stage3_trainer.py:48-258)."""

    stage_name = "target-detector"

    def __init__(self, cfg):
        super().__init__(cfg)
        accum = max(1, int(cfg.TPU.GRAD_ACCUM))
        if accum > 1:
            n_dev = self.mesh.size if self.mesh is not None else 1
            per_dev = max(
                cfg.SOLVER.IMS_PER_BATCH // max(jax.process_count(), 1), 1
            ) // n_dev
            if per_dev % accum != 0:
                raise ValueError(
                    f"TPU.GRAD_ACCUM={accum} must divide the per-device "
                    f"batch ({per_dev} = IMS_PER_BATCH/"
                    f"{max(jax.process_count(), 1)} hosts/{n_dev} devices)"
                )
        self.state = init_stage3_state(cfg, jax.random.PRNGKey(max(cfg.SEED, 0)))
        if cfg.MODEL.WEIGHTS:
            det_vars = load_weights(
                cfg.MODEL.WEIGHTS, {"params": self.state.params}, kind="detector"
            )
            self.state = self.state._replace(params=det_vars["params"])
        if cfg.MODEL.AF_EXTRACTOR_WEIGHTS:
            self.load_af_extractor_weight(cfg.MODEL.AF_EXTRACTOR_WEIGHTS)
        self.step_fn = make_stage3_train_step(cfg, mesh=self.mesh)
        self.loader = None

    def load_af_extractor_weight(self, path: str):
        """Keep ONLY srf_module keys from the stage-2 detector
        (ref checkpoint.py:111-125 remain_only_AFI_names)."""
        if path.endswith(".msgpack"):
            from flax import serialization

            with open(path, "rb") as f:
                data = serialization.msgpack_restore(f.read())
            src = data["params"] if "params" in data else data
            g_params = extract_afi_subtree(src)
        else:
            tmp = {"params": extract_afi_subtree(self.state.params)}
            # stage-2 .pth has full-detector names; reuse the d2 translator
            # then extract
            full = load_weights(path, {"params": self.state.params}, kind="detector")
            g_params = extract_afi_subtree(full["params"])
        self.state = self.state._replace(
            params=transplant_generator(self.state.params, g_params)
        )

    def save(self, iteration: int):
        st = jax.device_get(self.state)
        save_checkpoint(
            self.output_dir, f"model_{iteration:07d}",
            {"params": st.params, "batch_stats": st.stats, "opt": st.opt,
             "step": st.step},
        )

    def train(self, resume: bool = False):
        cfg = self.cfg
        start_iter = 0
        if resume:
            st = jax.device_get(self.state)
            tpl = {"params": st.params, "batch_stats": st.stats, "opt": st.opt,
                   "step": st.step}
            loaded, ok = resume_or_load(self.output_dir, tpl)
            if ok:
                self.state = self.state._replace(
                    params=loaded["params"], stats=loaded["batch_stats"],
                    opt=loaded["opt"], step=jnp.asarray(loaded["step"]),
                )
                start_iter = int(loaded["step"])
        assert_uniform_across_processes(start_iter, "resume start_iter")
        dataset = self._train_dataset()
        self.loader = build_train_loader(
            cfg, dataset, dual_scale=False, seed=max(cfg.SEED, 0),
            shard_id=jax.process_index(), num_shards=jax.process_count(),
        )
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)

        extra = []
        pbn = self._precise_bn_hook()
        if pbn is not None:  # runs before EvalHook → eval sees precise stats
            extra.append(pbn)
        if cfg.TEST.EVAL_PERIOD > 0 and cfg.DATASETS.TEST:
            extra.append(EvalHook(self.evaluate, cfg.TEST.EVAL_PERIOD))
        loop = TrainLoop(cfg.SOLVER.MAX_ITER, self._hooks(start_iter, extra), start_iter)
        key = jax.random.PRNGKey(max(cfg.SEED, 0) + 1)

        def run_step():
            nonlocal key
            t0 = time.perf_counter()
            batch = next(self.loader)
            data_time = time.perf_counter() - t0
            key, sub = jax.random.split(key)
            device_batch = self._maybe_shard(
                {
                    "image": batch["image"],
                    "image_sizes": batch["image_sizes"],
                    "gt": _gt_from_batch(batch["gt"]),
                }
            )
            self.state, metrics = self.step_fn(self.state, device_batch, sub)
            out = {k: float(v) for k, v in jax.device_get(metrics).items()}
            out["data_time"] = data_time
            return out

        try:
            loop.run(run_step)
        finally:
            if self.loader:
                self.loader.close()

    def evaluate(self, final=True):
        from .inference import run_inference

        cfg = self.cfg
        model = build_model(cfg, train=False)
        st = jax.device_get(self.state)
        variables = {"params": st.params}
        if st.stats:
            variables["batch_stats"] = st.stats
        results = run_inference(
            cfg, model, variables, get_dataset(cfg.DATASETS.TEST[0]),
            distributed=True,  # per-rank stripes + allgather (1-proc no-op)
        )
        from .testing import verify_results

        # ref stage1_trainer.py:296-301; mid-training evals only log
        verify_results(cfg, results, raise_on_failure=final)
        return results

    def _bn_stats(self):
        st = self.state
        return st.stats if st.stats else None

    def run_precise_bn(self, num_iter: int):
        """Replace BN running stats with true batch averages (d2
        hooks.PreciseBN; ref stage1_trainer.py:177-236)."""
        from .precise_bn import compute_precise_bn_stats

        cfg = self.cfg
        det = build_model(cfg, train=True)
        st = jax.device_get(self.state)
        params = st.params
        key = jax.random.PRNGKey(max(cfg.SEED, 0) + 777)

        fwd = jax.jit(
            lambda s, image, sizes, gt, k: det.apply(
                {"params": params, "batch_stats": s}, image, sizes, gt,
                rngs={"sampling": k,
                      "dropout": jax.random.fold_in(k, 1)},
                mutable=["batch_stats"],
            )[1]["batch_stats"]
        )
        loader = build_train_loader(
            cfg, self._train_dataset(), dual_scale=False,
            seed=max(cfg.SEED, 0) + 999,
        )

        def forward(s, batch):
            nonlocal key
            key, sub = jax.random.split(key)
            return fwd(
                s, jnp.asarray(batch["image"]),
                jnp.asarray(batch["image_sizes"]), _gt_from_batch(batch["gt"]),
                sub,
            )

        try:
            new_stats = compute_precise_bn_stats(
                forward, st.stats, loader, num_iter
            )
        finally:
            loader.close()
        new_state = self.state._replace(
            stats=jax.tree.map(np.asarray, jax.device_get(new_stats))
        )
        if self.mesh is not None:
            new_state = replicate(self.mesh, jax.device_get(new_state))
        self.state = new_state
