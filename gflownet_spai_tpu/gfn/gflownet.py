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
    flow: pol.FlowHeadParams | None = None   # state flows (SubTB-λ only)


class GFlowNetConfig(NamedTuple):
    hidden_dim: int = 4          # reference GFlowNet100.py:180
    heads: int = 4               # reference policy.py:19
    num_actions: int = 0         # nnz + 1 (env-dependent)
    loss: str = "tb"             # tb | vargrad | subtb (see gfn.loss)
    temperature: float = 1.0     # rollout sampling temperature (>1 explores)
    alpha_fixed: float = -1.0    # >=0 pins the reward mix α (learned if <0)
    subtb_lambda: float = 0.9    # λ for loss="subtb"
    backward: str = "lstm"       # lstm (reference parity) | linear | uniform
                                 # — see models/policies "TPU-native
                                 # backward policies" (lstm is O(T) serial)
    reward_beta: float = 1.0     # reward exponent: the sampler targets
                                 # P(x) ∝ R(x)^β (log-reward scaled by β).
                                 # β > 1 sharpens toward the reward optimum
                                 # — the standard GFlowNet reward
                                 # temperature; needed when the optimum
                                 # (e.g. a deeply thinned pattern) is a
                                 # vanishing fraction of a huge state space
    edge_feats: bool = False     # value-aware action-head channel: adds
                                 # feats[A, F] @ feat_w to the logits
                                 # (models.policies.action_features) —
                                 # lets the policy express "delete small-
                                 # magnitude entries" with ONE weight
                                 # instead of learning every fc column
                                 # independently.  Zero-init: logits start
                                 # reference-exact.
    terminal_bias: float = 0.0   # initial terminal-logit offset — the
                                 # start-short curriculum for 1M-action
                                 # spaces (models.policies
                                 # forward_policy_init docstring)
    t_cap: int = 0               # >0 caps dense-rollout trajectories at
                                 # t_cap steps — the 112k-action profile
                                 # showed ~190/265 ms of the step was
                                 # O(B·A) machinery on T=A-padded
                                 # trajectories (rollout.gumbel_topk_rollout
                                 # docstring).  With loss=subtb, truncated
                                 # samples train as partial trajectories;
                                 # tb/vargrad weight-0 them.


def init_params(key, cfg: GFlowNetConfig, dtype=jnp.float32) -> GFlowNetParams:
    kf, kb = jax.random.split(key)
    if cfg.backward == "linear":
        backward = pol.linear_backward_init(
            kb, cfg.hidden_dim, cfg.num_actions, dtype=dtype)
    elif cfg.backward == "uniform":
        backward = None
    else:
        backward = pol.backward_policy_init(
            kb, cfg.hidden_dim, cfg.num_actions, dtype=dtype)
    return GFlowNetParams(
        forward=pol.forward_policy_init(
            kf, cfg.hidden_dim, cfg.num_actions, heads=cfg.heads,
            dtype=dtype, terminal_bias=cfg.terminal_bias,
            edge_feats=cfg.edge_feats,
        ),
        backward=backward,
        log_z=jnp.zeros((), dtype),
        flow=(pol.flow_head_init(cfg.num_actions, dtype)
              if cfg.loss == "subtb" else None),
    )


def backward_logprobs(params: GFlowNetParams, cfg: GFlowNetConfig,
                      actions: jax.Array) -> jax.Array:
    """[B, T] actions → [B, T] log P_B under the configured backward policy."""
    if cfg.backward == "linear":
        return pol.linear_backward_batch(params.backward, actions)
    if cfg.backward == "uniform":
        return pol.uniform_backward_logprobs(
            actions, terminal_action=cfg.num_actions - 1)
    return pol.backward_policy_batch(params.backward, actions, cfg.hidden_dim)


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
    rollout = gumbel_topk_rollout(batched, key,
                                  terminal_action=cfg.num_actions - 1,
                                  t_cap=cfg.t_cap if cfg.t_cap > 0 else None)
    if cfg.temperature != 1.0:
        # re-score the sampled trajectories under the untempered policy so
        # the TB objective sees the true P_F (off-policy exploration);
        # trajectory_logprobs is the O(A log A) static-logits evaluator
        from .rollout import trajectory_logprobs
        lps = jax.vmap(lambda a: trajectory_logprobs(logits, a))(
            jax.lax.stop_gradient(rollout.actions))
        rollout = rollout._replace(fwd_logprobs=lps)
    rewards = _batched_rewards(env, rollout.actions, alpha)
    return SampleOut(rollout=rollout, rewards=rewards, alpha=alpha, logits=logits)


def loss_fn(params: GFlowNetParams, env: spai.SpaiEnv, graph: pol.GraphInputs,
            cfg: GFlowNetConfig, key, batch_size: int, replay=None):
    """TB loss for one sampled batch; returns (loss, aux dict).

    Gradients flow through the forward log-probs (recomputed differentiably
    from the logits along the sampled — stop-gradiented — action order), the
    backward LSTM, α (via the reward mix), and log Z.

    ``replay`` (optional): ``(actions [R,T], valid [R])`` trajectories from
    the top-k buffer (gfn.replay), re-scored off-policy under the current
    policy via ``trajectory_logprobs`` and with the reward recomputed at the
    current α (stored buffer rewards only prioritize what stays in the
    buffer); invalid slots (buffer not yet filled) are weight-0.
    """
    out = sample(params, env, graph, cfg, key, batch_size)
    # The rollout's per-step log-probs are differentiable w.r.t. the logits
    # (gather along the — discrete, grad-free — sampled order), and rewards
    # are differentiable w.r.t. α: no recomputation needed.
    actions = jax.lax.stop_gradient(out.rollout.actions)
    fwd_lp = out.rollout.fwd_logprobs
    log_r = cfg.reward_beta * log_reward(out.rewards)
    lengths = out.rollout.lengths
    weights = None
    terminated = None
    if cfg.t_cap > 0:
        # capped rollout: samples whose terminal missed the prefix are
        # partial trajectories — subtb trains them against the learned
        # flow at the truncation point; tb/vargrad weight-0 them
        terminated = jnp.any(actions == cfg.num_actions - 1, axis=-1)
        if cfg.loss != "subtb":
            weights = terminated.astype(fwd_lp.dtype)

    if replay is not None:
        from .rollout import trajectory_logprobs

        r_actions, r_valid = replay
        r_fwd = jax.vmap(lambda a: trajectory_logprobs(out.logits, a))(r_actions)
        r_rewards = _batched_rewards(env, r_actions, out.alpha)
        actions = jnp.concatenate([actions, r_actions], 0)
        fwd_lp = jnp.concatenate([fwd_lp, r_fwd], 0)
        log_r = jnp.concatenate(
            [log_r, cfg.reward_beta * log_reward(r_rewards)], 0)
        lengths = jnp.concatenate(
            [lengths, (r_actions >= 0).sum(-1).astype(lengths.dtype)], 0)
        fresh_w = (jnp.ones((batch_size,), fwd_lp.dtype) if weights is None
                   else weights)
        weights = jnp.concatenate([fresh_w, r_valid.astype(fwd_lp.dtype)], 0)
        if terminated is not None:
            # replay entries are complete trajectories (invalid slots are
            # weight-0 regardless)
            terminated = jnp.concatenate(
                [terminated, jnp.ones_like(r_valid)], 0)

    back_lp = backward_logprobs(params, cfg, actions)

    if cfg.loss == "vargrad":
        from .loss import vargrad_loss

        loss = vargrad_loss(
            log_r, fwd_lp.sum(-1), back_lp.sum(-1), weights=weights,
        )
    elif cfg.loss == "subtb":
        from .loss import subtb_loss

        log_flows = pol.flow_head_logF(params.flow, actions)
        loss = subtb_loss(
            log_flows, log_r, fwd_lp, back_lp, lengths,
            lam=cfg.subtb_lambda, weights=weights, terminated=terminated,
        )
    else:
        loss = trajectory_balance_loss(
            params.log_z, log_r, fwd_lp.sum(-1), back_lp.sum(-1),
            weights=weights,
        )
    aux = {
        "rewards": out.rewards,
        "alpha": out.alpha,
        "lengths": out.rollout.lengths,
        "loss": loss,
        "actions": jax.lax.stop_gradient(out.rollout.actions),
    }
    return loss, aux
