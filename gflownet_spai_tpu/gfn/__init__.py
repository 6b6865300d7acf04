"""GFlowNet core: rollouts, trajectory-balance loss, model assembly."""

from .rollout import Rollout, gumbel_topk_rollout, scan_rollout, sequential_logprobs
from .loss import log_reward, trajectory_balance_loss
from .gflownet import (
    GFlowNetConfig,
    GFlowNetParams,
    SampleOut,
    init_params,
    loss_fn,
    sample,
)

__all__ = [
    "Rollout", "gumbel_topk_rollout", "scan_rollout", "sequential_logprobs",
    "log_reward", "trajectory_balance_loss",
    "GFlowNetConfig", "GFlowNetParams", "SampleOut",
    "init_params", "loss_fn", "sample",
]
