"""Top-k reward replay buffer for off-policy TB/SubTB training.

The SPAI reward landscape is sparse (most thinnings are mediocre; a few
patterns are good), so on-policy TB can forget rare high-reward
trajectories.  The buffer keeps the top-K trajectories seen so far (by
reward, deduplicated), and each epoch a few of them are re-scored under the
*current* policy with ``rollout.trajectory_logprobs`` (valid off-policy:
TB/SubTB are trajectory-wise objectives, so any trajectory source works as
long as P_F is evaluated under the current policy).

Pure-functional and jit-compatible: the buffer is a fixed-size pytree
threaded through the train state; empty slots carry reward −inf and are
masked out of the loss via the weights vector.

The reference has nothing like this (on-policy only); closest prior art is
the replay usage in GFlowNet practice (e.g. Deleu et al. / Shen et al.
training recipes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG = -jnp.inf


class ReplayBuffer(NamedTuple):
    actions: jax.Array   # int32 [K, T], -1 padded
    rewards: jax.Array   # [K], -inf marks an empty slot


def replay_init(capacity: int, traj_len: int, dtype=jnp.float32) -> ReplayBuffer:
    return ReplayBuffer(
        actions=jnp.full((capacity, traj_len), -1, jnp.int32),
        rewards=jnp.full((capacity,), _NEG, dtype),
    )


def _signatures(actions: jax.Array) -> jax.Array:
    """Order-sensitive int32 trajectory hash (wraparound arithmetic); used
    to deduplicate identical trajectories before the top-k cut."""
    T = actions.shape[-1]
    # two independent LCG-style weight streams (constants int32-safe;
    # wraparound multiplication is the point); collisions need both to hit
    w1 = (jnp.arange(T, dtype=jnp.int32) * 1103515245 + 97) | 1
    w2 = (jnp.arange(T, dtype=jnp.int32) * 40503 + 1013904223) | 1
    a = actions.astype(jnp.int32) + 2
    return jnp.stack([(a * w1).sum(-1), (a * w2).sum(-1)], axis=-1)  # [N, 2]


def replay_update(buf: ReplayBuffer, actions: jax.Array,
                  rewards: jax.Array) -> ReplayBuffer:
    """Merge a fresh batch into the buffer, keep top-K unique by reward."""
    K = buf.rewards.shape[0]
    cand_a = jnp.concatenate([buf.actions, actions.astype(jnp.int32)], 0)
    cand_r = jnp.concatenate(
        [buf.rewards, rewards.astype(buf.rewards.dtype)], 0)
    sig = _signatures(cand_a)                                   # [N, 2]
    order = jnp.argsort(sig[:, 0])
    s_sorted = sig[order]
    dup = jnp.concatenate([
        jnp.zeros((1,), bool),
        (s_sorted[1:] == s_sorted[:-1]).all(-1),
    ])
    r_sorted = jnp.where(dup, _NEG, cand_r[order])
    _, top = jax.lax.top_k(r_sorted, K)
    keep = order[top]
    # r_sorted (not cand_r) so duplicate entries stay −inf-marked even when
    # they make the cut (fewer than K unique candidates)
    return ReplayBuffer(actions=cand_a[keep], rewards=r_sorted[top])


def replay_resize(buf: ReplayBuffer, traj_len: int) -> ReplayBuffer:
    """Change the trajectory width (the adaptive-t_cap ladder recompiles
    the sharded step at a new cap — parallel.sampler).  Growing pads with
    −1; shrinking drops entries that no longer fit (their tail would be a
    different, unterminated trajectory) by marking them empty."""
    K, T = buf.actions.shape
    if traj_len == T:
        return buf
    if traj_len > T:
        pad = jnp.full((K, traj_len - T), -1, jnp.int32)
        return buf._replace(actions=jnp.concatenate([buf.actions, pad], 1))
    fits = (buf.actions[:, traj_len:] < 0).all(axis=1)
    return ReplayBuffer(
        actions=jnp.where(fits[:, None], buf.actions[:, :traj_len], -1),
        rewards=jnp.where(fits, buf.rewards, _NEG),
    )


def replay_sample(buf: ReplayBuffer, key, num: int,
                  prioritized: float = 0.0):
    """Draw ``num`` filled slots with replacement.  Returns
    (actions [num, T], rewards [num], valid [num]) — ``valid`` is False
    while the buffer is empty, masking the loss contribution.

    ``prioritized`` (static α ≥ 0): rank-based prioritization — slot with
    reward-rank r (0 = best) is drawn with P ∝ (1 + r)^(−α).  α = 0 is
    uniform (default); rank-based rather than reward-proportional because
    SPAI rewards are an affine mix on an arbitrary scale (can be negative),
    so softmax-of-reward would be scale-sensitive (Schaul et al. 2016's
    rank variant, arXiv:1511.05952)."""
    filled = jnp.isfinite(buf.rewards)
    if prioritized > 0.0:
        # rank among filled slots: empty slots sort last (−inf rewards)
        rank = jnp.argsort(jnp.argsort(-buf.rewards))
        logits = jnp.where(
            filled, -prioritized * jnp.log1p(rank.astype(buf.rewards.dtype)),
            _NEG)
    else:
        logits = jnp.where(filled, 0.0, _NEG)
    any_filled = filled.any()
    safe_logits = jnp.where(any_filled, logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(key, safe_logits, shape=(num,))
    return (buf.actions[idx], buf.rewards[idx],
            jnp.broadcast_to(any_filled, (num,)) & filled[idx])
