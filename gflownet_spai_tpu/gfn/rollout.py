"""Trajectory samplers.

``gumbel_topk_rollout`` — the TPU-native sampler for static-logit
environments (the SPAI env).  Key observation (SURVEY.md §3.1): the
reference's rollout state never evolves — the policy sees the same static
graph every step and only the taken-action mask changes
(gflownet/gflownet.py:164-172 commented-out env update; policy.py:65-69).
Sequentially sampling a masked categorical without replacement from *fixed*
logits is exactly the Plackett–Luce order distribution, which the Gumbel
top-k trick samples in one shot: perturb logits with Gumbel noise, sort
descending; the prefix up to (and including) the terminal action *is* the
trajectory.  One sort + one cumulative logsumexp replaces the reference's
O(steps × GAT-forward) loop (1,147 sequential steps observed in its only
recorded run, SURVEY.md §6) with identical sampling distribution and
identical per-step forward probabilities.

``scan_rollout`` — the general per-step sampler (lax.scan of masked
categoricals) for envs whose mask/state evolves, e.g. the grid toy env.
Also serves as the oracle the Gumbel path is tested against.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Rollout(NamedTuple):
    """Batched trajectory record — the functional analogue of the reference's
    mutable ``Log`` (gflownet/log.py:10-22): ``-1``-padded actions and
    per-step chosen-action forward log-probs (padding contributes 0)."""
    actions: jax.Array       # int32[B, T]
    fwd_logprobs: jax.Array  # float[B, T]
    lengths: jax.Array       # int32[B]  (includes the terminal step)


def _suffix_logsumexp(x: jax.Array) -> jax.Array:
    """s[t] = logsumexp(x[t:]) along the last axis (analytic one-scan
    adjoint — ops.scan.suffix_logsumexp; this [B, A] normalizer is the
    biggest differentiable tensor in the SPAI loss)."""
    from ..ops.scan import suffix_logsumexp

    return suffix_logsumexp(x)


def gumbel_topk_rollout(logits: jax.Array, key, terminal_action: int,
                        gumbels: jax.Array | None = None,
                        t_cap: int | None = None) -> Rollout:
    """Sample a batch of delete-until-terminal trajectories from static logits.

    ``logits``: float[B, A] (A = num_actions, terminal included).
    Returns trajectories padded to T = A.  ``gumbels`` (optional [B, A])
    overrides the noise — used by the sharded sampler's exactness test
    (parallel.sampler), where each rows-shard draws its own slice.

    ``t_cap`` (optional): cap the materialized trajectory at the first
    ``t_cap`` steps of the perturbed order — trajectories pad to
    T = t_cap.  The on-chip profile of the 112k-action train step showed
    ~190 of 265 ms was O(B·A) machinery (scans/gathers/elementwise on
    [B, T=A] tensors) from this full-width padding; with the cap only the
    noise + one ``top_k`` touch [B, A] and everything downstream is
    [B, t_cap].  A sample whose terminal action misses the prefix keeps
    the WHOLE prefix with no −1 padding (lengths = t_cap, no terminal
    action present) — SubTB trains those as partial trajectories
    (gfn.loss.subtb_loss ``terminated``); TB/vargrad callers must
    weight-0 them.  Per-step log-probs of the prefix are identical to the
    uncapped path (the suffix normalizer becomes prefix-cumsum + total
    tail mass — additions only, the sharded sampler's trick).
    """
    B, A = logits.shape
    g = jax.random.gumbel(key, (B, A), logits.dtype) if gumbels is None \
        else gumbels
    if t_cap is not None and t_cap < A:
        cap = int(t_cap)
        _, idx = jax.lax.top_k(logits + g, cap)            # [B, cap] prefix
        sorted_logits = jnp.take_along_axis(logits, idx, axis=-1)
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        sumexp = jnp.sum(jnp.exp(logits - m), -1, keepdims=True)   # [B, 1]
        ex = jnp.exp(sorted_logits - m)                    # [B, cap]
        tail = jnp.maximum(sumexp - jnp.sum(ex, -1, keepdims=True), 0.0)
        suffix = jnp.flip(jnp.cumsum(jnp.flip(ex, -1), -1), -1) + tail
        step_lp = sorted_logits - (m + jnp.log(jnp.maximum(suffix, 1e-30)))
        hit = idx == terminal_action
        found = jnp.any(hit, axis=-1)
        k = jnp.argmax(hit, axis=-1)
        t_ids = jnp.arange(cap)[None, :]
        on_traj = jnp.where(found[:, None], t_ids <= k[:, None], True)
        actions = jnp.where(on_traj, idx, -1).astype(jnp.int32)
        fwd_lp = jnp.where(on_traj, step_lp, 0.0)
        lengths = jnp.where(found, k + 1, cap).astype(jnp.int32)
        return Rollout(actions=actions, fwd_logprobs=fwd_lp, lengths=lengths)
    order = jnp.argsort(-(logits + g), axis=-1)            # [B, A] descending
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    denom = _suffix_logsumexp(sorted_logits)               # lse over remaining set
    step_lp = sorted_logits - denom                        # log P(pick order[t] | remaining)

    k = jnp.argmax(order == terminal_action, axis=-1)      # terminal's position
    t_ids = jnp.arange(A)[None, :]
    on_traj = t_ids <= k[:, None]
    actions = jnp.where(on_traj, order, -1).astype(jnp.int32)
    fwd_lp = jnp.where(on_traj, step_lp, 0.0)
    return Rollout(actions=actions, fwd_logprobs=fwd_lp, lengths=(k + 1).astype(jnp.int32))


def trajectory_logprobs(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """Per-step log-probs of a given ``-1``-padded trajectory under
    sequential masked-categorical semantics, in O(A + T).

    Same result as ``sequential_logprobs`` (which is O(A²): a T-step scan
    each carrying an A-sized taken-mask), exploiting static logits: the
    remaining action set at step t is the DISJOINT union of the
    never-taken set and the taken suffix {a_t, …, a_L}, so

        denom_t = logaddexp(lse(untaken), suffix-lse(taken logits)[t])

    — one masked reduction over [A] (a scalar, exact: no subtraction of
    taken mass from the total, hence no cancellation) plus one [T] suffix
    scan.  The earlier formulation ordered the FULL logit vector per
    trajectory ("taken first, untaken after" + [A]-suffix-lse); its
    per-sample [A] argsort/gather/scatter-add was 96 of the 333 ms
    1M-action train step (replay re-scoring, docs/BENCH.md round 5).
    Used for off-policy re-scoring (temperature sampling, replay buffers,
    demonstration warm-starts) where trajectories were NOT produced by the
    current policy's Gumbel sort.
    """
    from ..ops.scan import suffix_logsumexp

    A = logits.shape[0]
    valid = actions >= 0
    a_safe = jnp.where(valid, actions, 0)
    taken = jnp.where(valid, logits[a_safe], -jnp.inf)        # [T]
    # untaken = all ids never visited; padding steps write the spare slot
    idx = jnp.where(valid, actions, A)
    mask = jnp.ones((A + 1,), bool).at[idx].set(False)[:A]
    any_un = mask.any()
    masked = jnp.where(mask, logits, -jnp.inf)
    # all-taken guard: lse over an all(-inf) row is -inf with a NaN grad —
    # route the degenerate case around the reduction
    un_lse = jnp.where(
        any_un,
        jax.nn.logsumexp(jnp.where(any_un, masked, 0.0)),
        -jnp.inf)
    denom = jnp.logaddexp(un_lse, suffix_logsumexp(taken))    # [T]
    return jnp.where(valid, taken - denom, 0.0)


def sequential_logprobs(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """Oracle: per-step log-probs of a given ``-1``-padded trajectory under
    sequential masked-categorical semantics (the reference's sampler,
    gflownet/gflownet.py:135-179 + policy.py:65-69 masking).  [A]→[T]."""
    A = logits.shape[0]

    def step(taken, a):
        masked = jnp.where(taken, -jnp.inf, logits)
        lp = masked[a] - jax.nn.logsumexp(masked)
        lp = jnp.where(a < 0, 0.0, lp)
        taken = jnp.where(a >= 0, taken.at[jnp.maximum(a, 0)].set(True), taken)
        return taken, lp

    _, lps = jax.lax.scan(step, jnp.zeros((A,), bool), actions)
    return lps


def scan_rollout(
    policy_logits_fn: Callable,   # (state, step) -> [A] logits (already masked)
    update_fn: Callable,          # (state, action) -> state
    init_state,
    key,
    terminal_action: int,
    max_steps: int,
):
    """Generic per-step rollout for envs with evolving state/mask.

    Returns (final_state, Rollout) with T = max_steps.  Samples that hit
    ``terminal_action`` stop; their remaining slots are ``-1`` / 0.
    """

    def step(carry, key_t):
        state, done, t = carry
        logits = policy_logits_fn(state, t)
        a = jax.random.categorical(key_t, logits)
        lp = jax.nn.log_softmax(logits)[a]
        a_out = jnp.where(done, -1, a).astype(jnp.int32)
        lp_out = jnp.where(done, 0.0, lp)
        new_state = update_fn(state, a)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(done, old, new), new_state, state
        )
        done = done | (a_out == terminal_action)
        return (state, done, t + 1), (a_out, lp_out)

    keys = jax.random.split(key, max_steps)
    (state, done, _), (actions, lps) = jax.lax.scan(
        step, (init_state, jnp.asarray(False), 0), keys
    )
    lengths = jnp.sum((actions >= 0).astype(jnp.int32))
    return state, Rollout(actions=actions, fwd_logprobs=lps, lengths=lengths)
