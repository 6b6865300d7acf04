"""Environments: the SPAI preconditioner env and the toy grid env."""

from .spai import (
    SpaiEnv,
    batched_rewards,
    evaluate_preconditioner,
    keep_mask_from_actions,
    make_env,
    masked_values,
    matrix_flops,
    residual_norm,
    reward,
    reward_from_actions,
)
from .ilu import ilu0, seed_pattern, spilu_lu
from . import grid

__all__ = [
    "SpaiEnv", "batched_rewards", "evaluate_preconditioner",
    "keep_mask_from_actions", "make_env", "masked_values", "matrix_flops",
    "residual_norm", "reward", "reward_from_actions",
    "ilu0", "seed_pattern", "spilu_lu", "grid",
]
