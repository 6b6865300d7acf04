"""Multi-RHS preconditioned CG over the transposed-RHS DIA SpMM kernel.

Solves ``A·X = B`` for K right-hand sides simultaneously with RHS held in
[K, n] layout (each system a contiguous row), so every A-application is one
``ops.dia.spmm_dia_t`` — the wide-K TPU kernel whose window DMAs are
contiguous bursts (docs/ROADMAP.md SpMM item).  The K systems are
independent (this is batched CG, not block-Krylov): each column has its own
α/β/convergence flag, converged systems freeze (α=0) while the rest run.

The reference has no multi-RHS surface (scipy gmres is one RHS per call,
GFlowNet100.py:61-93); this is north-star scale-out API for amortizing the
matrix traffic across solves — the DIA data is read once per iteration for
all K systems instead of K times.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.dia import DIA, spmm_dia_t_padded
from .linop import LinOp


class CGMultiResult(NamedTuple):
    xt: jax.Array          # [K, n] solutions
    residuals: jax.Array   # [maxiter, K] ‖r_k‖ history, NaN once converged
    iterations: jax.Array  # int32[K]
    converged: jax.Array   # bool[K]


def _dia_apply_t(d: DIA, vt: jax.Array) -> jax.Array:
    """[Kp, n_pad] → [Kp, n_pad] through the transposed kernel (re-pads the
    halo each call; rows beyond n stay zero because the DIA data is
    zero-padded)."""
    h = d.halo
    buf = jnp.zeros((vt.shape[0], h + d.n_pad + h), d.data.dtype)
    buf = jax.lax.dynamic_update_slice(buf, vt, (0, h))
    return spmm_dia_t_padded(d, buf)


def _as_multi_op(op):
    if op is None:
        return None
    if isinstance(op, DIA):
        return LinOp(data=op, fn=_dia_apply_t)
    return op  # LinOp or callable taking/returning [Kp, n_pad]


@partial(jax.jit, static_argnames=("maxiter",))
def _cg_multi_impl(a_op, bt, x0t, m_op, maxiter: int, rtol, atol):
    kp, n_pad = bt.shape
    dtype = bt.dtype

    def rowdot(u, v):
        return jnp.sum(u * v, axis=1)

    bnorm = jnp.sqrt(rowdot(bt, bt))
    tol = jnp.maximum(rtol * bnorm, atol)

    x0 = jnp.zeros_like(bt) if x0t is None else x0t
    r0 = bt - a_op(x0)
    z0 = m_op(r0) if m_op is not None else r0
    p0 = z0
    rnorm0 = jnp.sqrt(rowdot(r0, r0))
    done0 = rnorm0 <= tol

    # f32 FTZ guard: XLA flushes subnormals, so the inactive-lane divide
    # guard must be ≥1e-30 (CLAUDE.md trap)
    tiny = jnp.asarray(1e-30, dtype)

    def body(state):
        x, r, z, p, rz, it, hist, done, iters = state
        ap = a_op(p)
        pap = rowdot(p, ap)
        active = ~done
        alpha = jnp.where(active, rz / jnp.where(active, pap, tiny), 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * ap
        z = m_op(r) if m_op is not None else r
        rz_new = rowdot(r, z)
        beta = jnp.where(active, rz_new / jnp.where(active, rz, tiny), 0.0)
        p = jnp.where(active[:, None], z + beta[:, None] * p, p)
        rnorm = jnp.sqrt(rowdot(r, r))
        hist = hist.at[it].set(jnp.where(active, rnorm, jnp.nan))
        newly = active & (rnorm <= tol)
        iters = jnp.where(newly, it + 1, iters)
        done = done | newly
        return x, r, z, p, jnp.where(active, rz_new, rz), it + 1, hist, done, iters

    def cond(state):
        *_, it, _, done, _ = state
        return (~jnp.all(done)) & (it < maxiter)

    hist0 = jnp.full((maxiter, kp), jnp.nan, dtype)
    iters0 = jnp.where(done0, 0, maxiter).astype(jnp.int32)
    x, r, *_, hist, done, iters = jax.lax.while_loop(
        cond, body,
        (x0, r0, z0, p0, rowdot(r0, z0), jnp.asarray(0, jnp.int32),
         hist0, done0, iters0),
    )
    return CGMultiResult(xt=x, residuals=hist, iterations=iters, converged=done)


def cg_multi(
    a,
    bt: jax.Array,
    x0t: Optional[jax.Array] = None,
    m=None,
    maxiter: int = 1000,
    rtol: float = 1e-5,
    atol: float = 0.0,
) -> CGMultiResult:
    """Batched preconditioned CG for ``bt`` in [K, n] layout.

    ``a`` / ``m``: DIA matrices (fast path) or LinOps/callables mapping
    [Kp, n_pad] → [Kp, n_pad].  Returns solutions in the same [K, n] layout
    with per-system residual histories / iteration counts / convergence.
    """
    a_op = _as_multi_op(a)
    m_op = _as_multi_op(m)
    k, n = bt.shape
    if isinstance(a, DIA):
        from ..ops.dia import _round_up, _spmm_t_tiles

        kb, _ = _spmm_t_tiles(a, max(8, _round_up(k, 8)))
        kp, n_pad = _round_up(k, kb), a.n_pad

        def _pad(vt):
            buf = jnp.zeros((kp, n_pad), a.data.dtype)
            return jax.lax.dynamic_update_slice(buf, vt.astype(a.data.dtype),
                                                (0, 0))

        btp = _pad(bt)
        x0t = _pad(x0t) if x0t is not None else None
    else:
        btp, kp, n_pad = bt, k, n
    res = _cg_multi_impl(a_op, btp, x0t, m_op, maxiter, rtol, atol)
    return CGMultiResult(
        xt=res.xt[:k, :n],
        residuals=res.residuals[:, :k],
        iterations=res.iterations[:k],
        converged=res.converged[:k],
    )
