"""First-order linear recurrence with an optimal adjoint.

``linear_scan(a, b)`` computes the cumulative recurrence

    h_t = a_t · h_{t−1} + b_t        (h_{−1} = 0)

via ``jax.lax.associative_scan`` (O(log T) depth), but with a CUSTOM VJP:
JAX's default AD differentiates through the log-depth combinator tree,
costing several forward-scan equivalents in time and saving every tree
level as residuals.  The analytic adjoint of a linear recurrence is
itself one linear recurrence, run in reverse:

    ḡ given ∂L/∂h = ĥ:   g_t = ĥ_t + a_{t+1} · g_{t+1}
    ∂L/∂b_t = g_t
    ∂L/∂a_t = g_t ⊙ h_{t−1}

so the backward pass is exactly one more associative scan + two
elementwise products — the train-step decomposition at 112k actions put
~180 of the 280 ms epoch in the backward of these scans (SubTB + the
linear backward policy; docs/BENCH.md round-3 notes).

``a`` and ``b`` must have the same shape (broadcast OUTSIDE the call —
``jnp.broadcast_to`` carries the sum-transpose in its own AD).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _combine(lhs, rhs):
    a1, b1 = lhs
    a2, b2 = rhs
    return a1 * a2, a2 * b1 + b2


def _scan(a, b, axis: int):
    _, h = jax.lax.associative_scan(_combine, (a, b), axis=axis)
    return h


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def linear_scan(a: jax.Array, b: jax.Array, axis: int = 0) -> jax.Array:
    """h_t = a_t·h_{t−1} + b_t along ``axis``; h has b's shape."""
    return _scan(a, b, axis)


def _linear_scan_fwd(a, b, axis):
    h = _scan(a, b, axis)
    return h, (a, h)


def _linear_scan_bwd(axis, res, hbar):
    a, h = res
    ax = axis if axis >= 0 else hbar.ndim + axis
    flip = lambda x: jnp.flip(x, ax)
    # a_{t+1} with a 1-pad past the end (no successor)
    ones = jnp.ones_like(jax.lax.slice_in_dim(a, 0, 1, axis=ax))
    a_next = jnp.concatenate(
        [jax.lax.slice_in_dim(a, 1, a.shape[ax], axis=ax), ones], axis=ax)
    g = flip(_scan(flip(a_next), flip(hbar), ax))
    zeros = jnp.zeros_like(jax.lax.slice_in_dim(h, 0, 1, axis=ax))
    h_prev = jnp.concatenate(
        [zeros, jax.lax.slice_in_dim(h, 0, h.shape[ax] - 1, axis=ax)],
        axis=ax)
    return (g * h_prev, g)


linear_scan.defvjp(_linear_scan_fwd, _linear_scan_bwd)


def _suffix_lse(x: jax.Array) -> jax.Array:
    ax = x.ndim - 1
    return jnp.flip(jax.lax.cumlogsumexp(jnp.flip(x, ax), axis=ax), ax)


@jax.custom_vjp
def suffix_logsumexp(x: jax.Array) -> jax.Array:
    """s_t = logsumexp(x[t:]) along the LAST axis, with the analytic
    adjoint instead of AD through ``cumlogsumexp``'s combinator tree.

    ∂L/∂x_u = e^{x_u−s_u} · D_u with D_u = e^{s_u−s_{u−1}}·D_{u−1} + ŝ_u
    (s is non-increasing, so every exponent is ≤ 0 — fully stable), i.e.
    the backward pass is ONE ``linear_scan``.  This is the normalizer of
    the rollout's differentiable per-step log-probs
    (gfn.rollout._suffix_logsumexp) — a [B, A] tensor at SPAI scale."""
    return _suffix_lse(x)


def _suffix_lse_fwd(x):
    s = _suffix_lse(x)
    return s, (x, s)


def _suffix_lse_bwd(res, sbar):
    x, s = res
    ax = x.ndim - 1
    finite = jnp.isfinite(s)
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(s, 0, 1, axis=ax),
         jax.lax.slice_in_dim(s, 0, s.shape[ax] - 1, axis=ax)], axis=ax)
    both = finite & jnp.isfinite(prev)
    a = jnp.where(both, jnp.exp(jnp.minimum(s - jnp.where(both, prev, 0.0),
                                            0.0)), 0.0)
    r = jnp.where(finite & (sbar != 0), sbar, 0.0)
    d = linear_scan(a, r, axis=ax)
    xbar = jnp.where(jnp.isfinite(x) & finite,
                     jnp.exp(jnp.minimum(x - jnp.where(finite, s, 0.0), 0.0))
                     * d, 0.0)
    return (xbar,)


suffix_logsumexp.defvjp(_suffix_lse_fwd, _suffix_lse_bwd)
