"""Policy models: GATv2 forward policy, LSTM backward policy."""

from .gat import GATv2Params, gatv2_apply, gatv2_init, segment_softmax
from .policies import (
    BackwardPolicyParams,
    ForwardPolicyParams,
    GraphInputs,
    backward_policy_batch,
    backward_policy_init,
    backward_policy_logprobs,
    forward_policy_alpha,
    forward_policy_init,
    forward_policy_logits,
    graph_from_seed,
)

__all__ = [
    "GATv2Params", "gatv2_apply", "gatv2_init", "segment_softmax",
    "BackwardPolicyParams", "ForwardPolicyParams", "GraphInputs",
    "backward_policy_batch", "backward_policy_init", "backward_policy_logprobs",
    "forward_policy_alpha", "forward_policy_init", "forward_policy_logits",
    "graph_from_seed",
]
