"""Trajectory-balance loss (Bengio et al. 2022, arXiv:2201.13259).

Textbook TB in log space:

    L(τ) = ( log Z + Σ_t log P_F(a_t|s_t) − log R(x) − Σ_t log P_B(...) )²

Fixes relative to the reference implementation (gflownet/utils.py:228-278):
* B7 — log Z is a *trained* parameter (the reference registered total_flow
  as an untrainable buffer, gflownet/gflownet.py:16).
* B8 — no per-batch max subtraction (the reference's "log-sum-exp trick"
  at utils.py:264-269 subtracts per-batch maxima from each side, which
  changes the objective — there is no sum-exp to stabilize); and log-probs
  come straight from logits (no softmax→log(p+eps) round trip).
* Rewards can be ≤ 0 (the reference's metric goes negative whenever the
  residual ratio exceeds 1 with α > 0, producing log(negative) = NaN and a
  skipped epoch, GFlowNet100.py:307-309).  We clamp at ``reward_floor``
  instead, which keeps every sample training; ``log_reward_fn`` can
  override for envs with well-behaved positive rewards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_reward(rewards: jax.Array, floor: float = 1e-9) -> jax.Array:
    """log(max(R, floor)) — the reference's ``log(R + eps)`` with the NaN
    branch replaced by clamping (see module docstring)."""
    return jnp.log(jnp.maximum(rewards, floor))


def trajectory_balance_loss(
    log_z: jax.Array,
    log_rewards: jax.Array,
    fwd_logprob_sum: jax.Array,
    back_logprob_sum: jax.Array,
) -> jax.Array:
    """Mean squared TB discrepancy over a batch.  All inputs [B] except
    ``log_z`` (scalar)."""
    delta = log_z + fwd_logprob_sum - log_rewards - back_logprob_sum
    return jnp.mean(delta * delta)


def vargrad_loss(
    log_rewards: jax.Array,
    fwd_logprob_sum: jax.Array,
    back_logprob_sum: jax.Array,
) -> jax.Array:
    """VarGrad form of TB (Richter et al. 2020; Zhang et al. 2023 for
    GFlowNets): the batch variance of ``δ_b = log R + Σlog P_B − Σlog P_F``.

    Equivalent optimum to TB with log Z replaced by its per-batch empirical
    estimate — no trained log Z, and markedly more stable when trajectory
    length (hence |Σlog P_F|) is large, e.g. 10⁵-action SPAI problems where
    plain TB losses reach 1e9 in f32."""
    delta = log_rewards + back_logprob_sum - fwd_logprob_sum
    return jnp.var(delta)
