"""The SPAI GFlowNet: policies + rollout + reward + TB loss, end-to-end jit.

Functional analogue of the reference ``GFlowNet`` class
(gflownet/gflownet.py:12-197) wired for the SPAI env:

* one GATv2 forward pass produces the static action logits (the reference
  recomputes the identical forward every rollout step — see
  rollout.gumbel_topk_rollout docstring),
* a Gumbel-top-k sort samples the whole batch of trajectories,
* rewards replay the action lists through the fixed-pattern residual plan,
* the backward LSTM scores trajectories, and
* the textbook TB loss closes the loop with trained log Z (B7) and the
  policy's learned α (B5).

Everything composes under ``jax.jit`` / ``jax.grad`` with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..env import spai, spai_dia
from ..models import policies as pol
from .loss import log_reward, trajectory_balance_loss
from .rollout import Rollout, gumbel_topk_rollout


def _batched_rewards(env, actions, alpha):
    """Dispatch to the matching env implementation (COO plan vs DIA band)."""
    if isinstance(env, spai_dia.SpaiDiaEnv):
        return spai_dia.batched_rewards(env, actions, alpha)
    return spai.batched_rewards(env, actions, alpha)


class GFlowNetParams(NamedTuple):
    forward: pol.ForwardPolicyParams
    backward: pol.BackwardPolicyParams
    log_z: jax.Array  # trained log-partition estimate (B7)


class GFlowNetConfig(NamedTuple):
    hidden_dim: int = 4          # reference GFlowNet100.py:180
    heads: int = 4               # reference policy.py:19
    num_actions: int = 0         # nnz + 1 (env-dependent)
    loss: str = "tb"             # tb | vargrad (see gfn.loss)
    temperature: float = 1.0     # rollout sampling temperature (>1 explores)
    alpha_fixed: float = -1.0    # >=0 pins the reward mix α (learned if <0)


def init_params(key, cfg: GFlowNetConfig, dtype=jnp.float32) -> GFlowNetParams:
    kf, kb = jax.random.split(key)
    return GFlowNetParams(
        forward=pol.forward_policy_init(
            kf, cfg.hidden_dim, cfg.num_actions, heads=cfg.heads, dtype=dtype
        ),
        backward=pol.backward_policy_init(
            kb, cfg.hidden_dim, cfg.num_actions, dtype=dtype
        ),
        log_z=jnp.zeros((), dtype),
    )


class SampleOut(NamedTuple):
    rollout: Rollout
    rewards: jax.Array   # [B]
    alpha: jax.Array     # scalar (sigmoid of the learned mixing parameter)
    logits: jax.Array    # [A] static policy logits (diagnostics)


def sample(params: GFlowNetParams, env: spai.SpaiEnv, graph: pol.GraphInputs,
           cfg: GFlowNetConfig, key, batch_size: int) -> SampleOut:
    """Analogue of reference ``sample_states`` (gflownet/gflownet.py:125-197):
    rollout a batch, then score terminal states through the env."""
    logits = pol.forward_policy_logits(
        params.forward, graph, cfg.num_actions, cfg.hidden_dim, cfg.heads
    )
    alpha = pol.forward_policy_alpha(params.forward)
    if cfg.alpha_fixed >= 0:
        alpha = jnp.asarray(cfg.alpha_fixed, logits.dtype)
    sample_logits = logits / cfg.temperature if cfg.temperature != 1.0 else logits
    batched = jnp.broadcast_to(sample_logits, (batch_size, cfg.num_actions))
    rollout = gumbel_topk_rollout(batched, key, terminal_action=cfg.num_actions - 1)
    if cfg.temperature != 1.0:
        # re-score the sampled trajectories under the untempered policy so
        # the TB objective sees the true P_F (off-policy exploration)
        from .rollout import sequential_logprobs
        lps = jax.vmap(lambda a: sequential_logprobs(logits, a))(
            jax.lax.stop_gradient(rollout.actions))
        rollout = rollout._replace(fwd_logprobs=lps)
    rewards = _batched_rewards(env, rollout.actions, alpha)
    return SampleOut(rollout=rollout, rewards=rewards, alpha=alpha, logits=logits)


def loss_fn(params: GFlowNetParams, env: spai.SpaiEnv, graph: pol.GraphInputs,
            cfg: GFlowNetConfig, key, batch_size: int):
    """TB loss for one sampled batch; returns (loss, aux dict).

    Gradients flow through the forward log-probs (recomputed differentiably
    from the logits along the sampled — stop-gradiented — action order), the
    backward LSTM, α (via the reward mix), and log Z.
    """
    out = sample(params, env, graph, cfg, key, batch_size)
    # The rollout's per-step log-probs are differentiable w.r.t. the logits
    # (gather along the — discrete, grad-free — sampled order), and rewards
    # are differentiable w.r.t. α: no recomputation needed.
    actions = jax.lax.stop_gradient(out.rollout.actions)
    back_lp = pol.backward_policy_batch(params.backward, actions, cfg.hidden_dim)

    if cfg.loss == "vargrad":
        from .loss import vargrad_loss

        loss = vargrad_loss(
            log_reward(out.rewards),
            out.rollout.fwd_logprobs.sum(-1),
            back_lp.sum(-1),
        )
    else:
        loss = trajectory_balance_loss(
            params.log_z,
            log_reward(out.rewards),
            out.rollout.fwd_logprobs.sum(-1),
            back_lp.sum(-1),
        )
    aux = {
        "rewards": out.rewards,
        "alpha": out.alpha,
        "lengths": out.rollout.lengths,
        "loss": loss,
    }
    return loss, aux
