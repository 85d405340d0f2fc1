"""Engine: train stages, solver, checkpointing, events, host loop."""

from .solver import build_optimizer, warmup_multistep_schedule
from .checkpoint import (
    extract_afi_subtree,
    latest_checkpoint,
    load_checkpoint,
    resume_or_load,
    save_checkpoint,
    transplant_afi_between_detectors,
    transplant_generator,
)
from .stage1 import Stage1State, init_stage1_state, make_stage1_train_step
from .stage2 import Stage2State, init_stage2_state, make_stage2_train_step
from .stage3 import Stage3State, init_stage3_state, make_stage3_train_step

__all__ = [
    "build_optimizer",
    "warmup_multistep_schedule",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "resume_or_load",
    "transplant_generator",
    "extract_afi_subtree",
    "transplant_afi_between_detectors",
    "Stage1State",
    "init_stage1_state",
    "make_stage1_train_step",
    "Stage2State",
    "init_stage2_state",
    "make_stage2_train_step",
    "Stage3State",
    "init_stage3_state",
    "make_stage3_train_step",
]
