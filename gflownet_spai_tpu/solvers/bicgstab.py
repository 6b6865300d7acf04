"""BiCGStab for nonsymmetric systems — no restarts, two SpMVs/iteration.

Complements GMRES (which needs O(restart·n) basis memory) for large
nonsymmetric problems; same history/iteration-count semantics as the other
solvers and the same static-shape ``lax.while_loop`` structure.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class BiCGStabResult(NamedTuple):
    x: jax.Array
    residuals: jax.Array   # [maxiter] ‖r‖ history, NaN-padded
    iterations: jax.Array
    converged: jax.Array


from .linop import LinOp, as_linop


def _identity(x):
    return x


def _bicgstab_impl(
    a_op: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    m_op: Optional[Callable] = None,
    maxiter: int = 1000,
    rtol: float = 1e-5,
    atol: float = 0.0,
) -> BiCGStabResult:
    """Right-preconditioned BiCGStab: solves A M⁻¹... (preconditioner applied
    as ``m_op`` ≈ A⁻¹ action on intermediate vectors, scipy-style)."""
    m_op = m_op or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)
    eps = jnp.asarray(1e-38, b.dtype)

    r0 = b - a_op(x0)
    rhat = r0

    def body(state):
        x, r, p, v, rho, alpha, omega, it, hist, done = state
        rho_new = jnp.dot(rhat, r)
        # ρ or ω collapse = Lanczos breakdown: freeze the iterate and stop
        # (substituting an epsilon silently corrupts x — measured blowup to
        # 1e50 on strongly nonsymmetric systems)
        breakdown = (jnp.abs(rho_new) < eps * 1e6) | (jnp.abs(omega) < eps * 1e6)
        beta = (rho_new / jnp.where(rho == 0, eps, rho)) * (
            alpha / jnp.where(omega == 0, eps, omega))
        p = r + beta * (p - omega * v)
        phat = m_op(p)
        v = a_op(phat)
        rv = jnp.dot(rhat, v)
        breakdown = breakdown | (jnp.abs(rv) < eps * 1e6)
        alpha_new = rho_new / jnp.where(rv == 0, eps, rv)
        s = r - alpha_new * v
        snorm = jnp.linalg.norm(s)
        # half-step convergence: x + α p̂ already good enough
        half_done = snorm <= tol
        shat = m_op(s)
        t = a_op(shat)
        tt = jnp.dot(t, t)
        omega_new = jnp.dot(t, s) / jnp.where(tt == 0, eps, tt)
        x_half = x + alpha_new * phat
        x_full = x_half + omega_new * shat
        r_full = s - omega_new * t
        rnorm = jnp.where(half_done, snorm, jnp.linalg.norm(r_full))
        diverged = rnorm > 1e6 * bnorm   # runaway recursion → stop early
        stop = (breakdown | half_done | diverged
                | (rnorm <= tol) | ~jnp.isfinite(rnorm))
        x = jnp.where(breakdown, x, jnp.where(half_done, x_half, x_full))
        r = jnp.where(breakdown, r, jnp.where(half_done, s, r_full))
        hist = hist.at[it].set(rnorm)
        it = it + 1
        return (x, r, p, v, rho_new, alpha_new, omega_new, it, hist, stop)

    def cond(state):
        *_, it, _, done = state
        return (~done) & (it < maxiter)

    hist0 = jnp.full((maxiter,), jnp.nan, b.dtype)
    zero = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    state = (x0, r0, zero, zero, one, one, one,
             jnp.asarray(0, jnp.int32), hist0, jnp.linalg.norm(r0) <= tol)
    x, r, *_, it, hist, done = jax.lax.while_loop(cond, body, state)
    return BiCGStabResult(
        x=x, residuals=hist, iterations=it,
        converged=jnp.linalg.norm(b - a_op(x)) <= tol,
    )


_bicgstab_static = partial(
    jax.jit, static_argnames=("a_op", "m_op", "maxiter")
)(_bicgstab_impl)
_bicgstab_dynamic = partial(jax.jit, static_argnames=("maxiter",))(_bicgstab_impl)


def bicgstab(
    a_op,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    m_op=None,
    maxiter: int = 1000,
    rtol: float = 1e-5,
    atol: float = 0.0,
) -> BiCGStabResult:
    """BiCGStab; ``a_op``/``m_op`` may be callables, LinOps, or containers."""
    a_op = as_linop(a_op)
    m_op = as_linop(m_op) if m_op is not None else None
    if isinstance(a_op, LinOp) or isinstance(m_op, LinOp):
        # dynamic path: both operands must be pytrees (wrap a plain callable)
        from .linop import wrap_plain

        if not isinstance(a_op, LinOp):
            a_op = wrap_plain(a_op)
        if m_op is not None and not isinstance(m_op, LinOp):
            m_op = wrap_plain(m_op)
        run = _bicgstab_dynamic
    else:
        run = _bicgstab_static
    return run(a_op, b, x0, m_op, maxiter=maxiter, rtol=rtol, atol=atol)


def solve_with_bicgstab(a, b, m=None, maxiter: int = 1000, rtol: float = 1e-5):
    """Harness wrapper mirroring ``solve_with_gmres``."""
    import time

    t0 = time.time()
    res = bicgstab(a, b, m_op=m, maxiter=maxiter, rtol=rtol)
    jax.block_until_ready(res.x)
    elapsed = time.time() - t0
    return res.x, res.residuals[: int(res.iterations)], int(res.iterations), elapsed
