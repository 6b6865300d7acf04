"""Preconditioned conjugate gradients (SPD systems) with residual history.

Companion to the GMRES harness for the SPD configs in BASELINE.json
(Poisson / bcsstk-class matrices): same history/iteration-count semantics,
same static-shape ``lax.while_loop`` structure.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    residuals: jax.Array   # [maxiter] ‖r_k‖ history, NaN-padded
    iterations: jax.Array
    converged: jax.Array


from .linop import LinOp, as_linop


def _identity(x):
    return x


def _cg_impl(
    a_op: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    m_op: Optional[Callable] = None,
    maxiter: int = 1000,
    rtol: float = 1e-5,
    atol: float = 0.0,
) -> CGResult:
    m_op = m_op or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    r0 = b - a_op(x0)
    z0 = m_op(r0)
    # promote the whole carry to one dtype up front: a float64 operator on
    # a float32 b otherwise flips the carry dtype inside the loop body
    # (while_loop requires identical input/output carry types)
    dt = jnp.result_type(r0.dtype, z0.dtype)
    x0, r0, z0 = x0.astype(dt), r0.astype(dt), z0.astype(dt)
    p0 = z0

    def body(state):
        x, r, z, p, rz, it, hist, done = state
        ap = a_op(p)
        alpha = rz / jnp.dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = m_op(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        rnorm = jnp.linalg.norm(r)
        hist = hist.at[it].set(rnorm)
        it = it + 1
        done = rnorm <= tol
        return x, r, z, p, rz_new, it, hist, done

    def cond(state):
        *_, it, _, done = state
        return (~done) & (it < maxiter)

    hist0 = jnp.full((maxiter,), jnp.nan, b.dtype)
    x, r, *_, it, hist, done = jax.lax.while_loop(
        cond, body,
        (x0, r0, z0, p0, jnp.dot(r0, z0), jnp.asarray(0, jnp.int32), hist0,
         jnp.linalg.norm(r0) <= tol),
    )
    return CGResult(x=x, residuals=hist, iterations=it, converged=done)


# static (plain callables, baked-in) vs dynamic (LinOp pytree args) entry
# points over the same body — see solvers.linop and gmres for rationale
_cg_static = partial(
    jax.jit, static_argnames=("a_op", "m_op", "maxiter")
)(_cg_impl)
_cg_dynamic = partial(jax.jit, static_argnames=("maxiter",))(_cg_impl)


def cg(
    a_op,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    m_op=None,
    maxiter: int = 1000,
    rtol: float = 1e-5,
    atol: float = 0.0,
) -> CGResult:
    """Preconditioned CG; ``a_op``/``m_op`` may be callables, LinOps, or
    sparse containers."""
    a_op = as_linop(a_op)
    m_op = as_linop(m_op) if m_op is not None else None
    if isinstance(a_op, LinOp) or isinstance(m_op, LinOp):
        # dynamic path: both operands must be pytrees (wrap a plain callable)
        from .linop import wrap_plain

        if not isinstance(a_op, LinOp):
            a_op = wrap_plain(a_op)
        if m_op is not None and not isinstance(m_op, LinOp):
            m_op = wrap_plain(m_op)
        run = _cg_dynamic
    else:
        run = _cg_static
    return run(a_op, b, x0, m_op, maxiter=maxiter, rtol=rtol, atol=atol)


def cg_matrix(a, b, m=None, maxiter: int = 1000, rtol: float = 1e-5) -> CGResult:
    return cg(as_linop(a), b, m_op=None if m is None else as_linop(m),
              maxiter=maxiter, rtol=rtol)


def solve_with_cg(a, b, m=None, maxiter: int = 1000, rtol: float = 1e-5):
    """Harness wrapper mirroring ``solve_with_gmres``."""
    import time

    t0 = time.time()
    res = cg(a, b, m_op=m, maxiter=maxiter, rtol=rtol)
    jax.block_until_ready(res.x)
    elapsed = time.time() - t0
    return res.x, res.residuals[: int(res.iterations)], int(res.iterations), elapsed
