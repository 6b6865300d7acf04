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


def _weighted_mean(x: jax.Array, weights) -> jax.Array:
    if weights is None:
        return jnp.mean(x)
    w = weights.astype(x.dtype)
    return jnp.sum(w * x) / jnp.maximum(jnp.sum(w), 1e-30)


def trajectory_balance_loss(
    log_z: jax.Array,
    log_rewards: jax.Array,
    fwd_logprob_sum: jax.Array,
    back_logprob_sum: jax.Array,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Mean squared TB discrepancy over a batch.  All inputs [B] except
    ``log_z`` (scalar).  ``weights`` (optional [B]) down-weights entries,
    e.g. invalid replay-buffer slots (gfn.replay)."""
    delta = log_z + fwd_logprob_sum - log_rewards - back_logprob_sum
    return _weighted_mean(delta * delta, weights)


def subtb_loss(
    log_flows: jax.Array,
    log_rewards: jax.Array,
    fwd_logprobs: jax.Array,
    back_logprobs: jax.Array,
    lengths: jax.Array,
    lam: float = 0.9,
    weights: jax.Array | None = None,
    terminated: jax.Array | None = None,
) -> jax.Array:
    """Sub-trajectory balance, SubTB(λ) (Madan et al. 2022,
    arXiv:2209.12782), in O(T) per trajectory.

    Why: plain TB squares ``Σ_t log P_F`` whose magnitude grows linearly in
    trajectory length, so the loss scale grows ~quadratically (observed
    ~1e5 on olm500's ~1e5-step trajectories — CLAUDE.md gap list).  SubTB
    balances every sub-trajectory s_i→s_j against learned state flows,
    giving length-local credit assignment.

    For one trajectory with states s_0..s_L (s_L = terminal object, flow
    := R) the loss is

        Σ_{0≤i<j≤L} λ^{j−i} A_{ij}² / Σ_{0≤i<j≤L} λ^{j−i},
        A_{ij} = log F(s_i) − log F(s_j) + Σ_{t=i+1}^{j} (log P_F − log P_B)

    With c_t = log F(s_t) − P_t (P_t the prefix sum of log P_F − log P_B),
    A_{ij} = c_i − c_j, and the pair sum collapses to per-j terms
    ``S_j c_j² − 2 c_j M_j + Q_j`` where S/M/Q are λ-discounted prefix
    aggregates — first-order linear recurrences evaluated with
    ``lax.associative_scan`` (log-depth, no λ^{−i} blow-up: every factor is
    a decaying power of λ).

    Args: ``log_flows`` [B, T+1] learned log F(s_t) for t = 0..T (the slot
    at t = lengths[b] is replaced by ``log_rewards[b]`` internally);
    ``fwd_logprobs``/``back_logprobs`` [B, T] padded per-step log-probs;
    ``lengths`` [B] number of actions incl. the terminal one.

    ``terminated`` (optional bool [B], default all-True): entries that are
    PARTIAL trajectories — a prefix that never reached the terminal action
    (e.g. the sharded sampler's ``t_cap``-truncated rollouts) — keep the
    LEARNED flow at slot ``lengths[b]`` instead of substituting the reward.
    Every sub-trajectory balance term inside the prefix is still exact
    (Madan et al. 2022 §3: SubTB is defined on arbitrary sub-trajectories),
    so truncated samples train F/P_F/P_B rather than being zero-weighted.
    """
    B, T = fwd_logprobs.shape
    dtype = fwd_logprobs.dtype
    lam = float(lam)

    prefix = jnp.concatenate(
        [jnp.zeros((B, 1), dtype),
         jnp.cumsum(fwd_logprobs - back_logprobs, axis=-1)], axis=-1
    )                                                     # [B, T+1]
    t_ids = jnp.arange(T + 1, dtype=lengths.dtype)[None, :]
    L = lengths[:, None]
    at_end = t_ids == L
    if terminated is not None:
        at_end = at_end & terminated[:, None]
    logF = jnp.where(at_end, log_rewards[:, None], log_flows)
    valid = t_ids <= L
    c = jnp.where(valid, logF - prefix, 0.0)              # [B, T+1]

    # m_j = Σ_{i<j} λ^{j−i} c_i  via  m_j = λ(m_{j−1} + c_{j−1});
    # q_j likewise with c²; s_j = Σ_{i<j} λ^{j−i} closed-form.  Both are
    # first-order linear recurrences — ops.scan.linear_scan runs them with
    # the analytic one-reverse-scan adjoint (the default associative_scan
    # AD through the combinator tree was the train-step bound at 112k
    # actions — docs/BENCH.md round-3 decomposition)
    from ..ops.scan import linear_scan

    a = jnp.full((B, T), lam, dtype)
    m_sc = linear_scan(a, lam * c[:, :-1], axis=-1)
    q_sc = linear_scan(a, lam * c[:, :-1] ** 2, axis=-1)
    zeros = jnp.zeros((B, 1), dtype)
    m = jnp.concatenate([zeros, m_sc], axis=-1)           # [B, T+1]
    q = jnp.concatenate([zeros, q_sc], axis=-1)
    jf = t_ids.astype(dtype)
    if lam == 1.0:
        s = jf
    else:
        s = lam * (1.0 - jnp.power(lam, jf)) / (1.0 - lam)

    term = s * c * c - 2.0 * c * m + q
    wmask = (t_ids >= 1) & valid
    total = jnp.sum(jnp.where(wmask, term, 0.0), axis=-1)  # [B]
    wsum = jnp.sum(jnp.where(wmask, s, 0.0), axis=-1)
    # guard must be ≥ f32 min-normal: XLA compiles with flush-to-zero, so a
    # subnormal like 1e-38 becomes 0 and a length-0 (weight-0 replay) entry
    # would produce 0/0 = NaN that survives 0-weighting
    return _weighted_mean(total / jnp.maximum(wsum, 1e-30), weights)


def vargrad_loss(
    log_rewards: jax.Array,
    fwd_logprob_sum: jax.Array,
    back_logprob_sum: jax.Array,
    weights: jax.Array | None = None,
) -> jax.Array:
    """VarGrad form of TB (Richter et al. 2020; Zhang et al. 2023 for
    GFlowNets): the batch variance of ``δ_b = log R + Σlog P_B − Σlog P_F``.

    Equivalent optimum to TB with log Z replaced by its per-batch empirical
    estimate — no trained log Z, and markedly more stable when trajectory
    length (hence |Σlog P_F|) is large, e.g. 10⁵-action SPAI problems where
    plain TB losses reach 1e9 in f32."""
    delta = log_rewards + back_logprob_sum - fwd_logprob_sum
    if weights is None:
        return jnp.var(delta)
    mean = _weighted_mean(delta, weights)
    return _weighted_mean((delta - mean) ** 2, weights)
