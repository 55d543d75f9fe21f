"""Training subsystem: losses, stage recipes, jitted train/eval steps,
real-codec evaluation, checkpointing.

Reference behavior: src/training/ (4 losses, train_one_epoch /
valid_epoch / test_epoch / compress_with_ac) and the 4-stage driver in
src/train.py (first_train -> refine_gs -> refine_gs_ga -> rems).
"""

from .losses import (
    scalable_rate_distortion_loss,
    rate_distortion_loss,
    distortion_loss,
    rate_loss,
)
from .stages import StagePlan, make_stage, trainable_mask
from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step, valid_epoch, test_epoch
from .evaluate import compress_with_ac, rd_sweep
from .checkpoint import (save_checkpoint, load_checkpoint,
                         remap_single_to_multi, merge_params)

__all__ = [
    "scalable_rate_distortion_loss", "rate_distortion_loss",
    "distortion_loss", "rate_loss",
    "StagePlan", "make_stage", "trainable_mask",
    "TrainState", "create_train_state",
    "make_train_step", "make_eval_step", "valid_epoch", "test_epoch",
    "compress_with_ac", "rd_sweep",
    "save_checkpoint", "load_checkpoint",
    "remap_single_to_multi", "merge_params",
]
