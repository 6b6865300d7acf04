"""Weighted-Jacobi iteration riding the fused k-step DIA kernel.

The reference has no stationary solver (its harness is scipy GMRES,
reference GFlowNet100.py:61-93); this module is north-star surface: a
smoother/solver whose per-sweep cost is the temporally-blocked SpMV
(``ops.dia.spmv_dia_power``) — measured 525 Gnnz/s on Poisson-1M vs 107
for a plain chained apply (docs/BENCH.md).

Weighted Jacobi for A·x = b with weight ω:

    x ← x + ω·D⁻¹·(b − A·x)  =  M·x + c,   M = I − ω·D⁻¹·A,  c = ω·D⁻¹·b

M has A's sparsity pattern (same DIA offsets), so k sweeps fuse into one
diagonal-data read via the affine fused kernel (``add=c``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.dia import (
    DIA,
    dia_pad_pp,
    dia_power_data,
    dia_power_ok,
    dia_power_stream_ok,
    dia_pp_tile,
    spmv_dia,
    spmv_dia_power,
)


class JacobiResult(NamedTuple):
    x: jax.Array           # [n] solution estimate
    residual: jax.Array    # scalar ‖b − A·x‖₂ at exit
    iterations: int        # sweeps performed (static)


def jacobi_iteration_matrix(d: DIA, omega: float = 2.0 / 3.0) -> DIA:
    """M = I − ω·D⁻¹·A in DIA with A's offsets.  Rows with a zero/missing
    diagonal keep x unchanged (their M row is the identity row)."""
    if 0 not in d.offsets:
        raise ValueError("Jacobi needs an explicit main diagonal")
    c = d.offsets.index(0)
    diag = d.data[c]
    safe = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
    rows = []
    for s in range(d.ndiags):
        m_row = -omega * d.data[s] / safe
        if s == c:
            m_row = jnp.where(jnp.abs(diag) > 0, 1.0 - omega, 1.0)
        else:
            m_row = jnp.where(jnp.abs(diag) > 0, m_row, 0.0)
        rows.append(m_row)
    return dataclasses.replace(d, data=jnp.stack(rows))


def jacobi_constant(d: DIA, b: jax.Array, omega: float = 2.0 / 3.0) -> jax.Array:
    """c = ω·D⁻¹·b padded to [n_pad]."""
    c = d.offsets.index(0)
    diag = d.data[c]
    safe = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
    bp = jnp.pad(b.astype(d.data.dtype), (0, d.n_pad - b.shape[0]))
    return jnp.where(jnp.abs(diag) > 0, omega * bp / safe, 0.0)


def jacobi(d: DIA, b: jax.Array, x0: jax.Array | None = None,
           omega: float = 2.0 / 3.0, iters: int = 100,
           fuse_k: int = 8) -> JacobiResult:
    """Run ``iters`` weighted-Jacobi sweeps (rounded up to a multiple of
    2·fuse_k so the fused ping-pong chain stays fixed-role), then report
    the true residual.  jit-safe; ``iters``/``fuse_k``/``omega`` static."""
    m = jacobi_iteration_matrix(d, omega)
    k = 1
    kk = fuse_k
    while kk >= 2:          # largest feasible fusion ≤ fuse_k
        if dia_power_ok(m, kk) or dia_power_stream_ok(m, kk):
            k = kk
            break
        kk //= 2
    c = jacobi_constant(d, b, omega)
    tr = dia_pp_tile(m) or m.halo
    cq = dia_pad_pp(m, c[: d.n])
    x_init = jnp.zeros((d.n,), d.data.dtype) if x0 is None else x0
    xq = dia_pad_pp(m, x_init)
    zq = jnp.zeros_like(xq)

    pairs = max(1, -(-iters // (2 * k)))

    if k > 1:
        mk = dia_power_data(m, k)

        def body(_, cbuf):
            x, z = cbuf
            z = spmv_dia_power(m, mk, x, z, k=k, add=cq)
            x = spmv_dia_power(m, mk, z, x, k=k, add=cq)
            return (x, z)
    else:
        def body(_, cbuf):
            x, z = cbuf
            z = spmv_dia_pingpong_affine(m, x, z, cq)
            x = spmv_dia_pingpong_affine(m, z, x, cq)
            return (x, z)

    xq, zq = jax.lax.fori_loop(0, pairs, body, (xq, zq))
    x = jax.lax.slice(xq, (tr,), (tr + d.n,))
    r = b.astype(x.dtype) - spmv_dia(d, x)[: d.n]
    return JacobiResult(x=x, residual=jnp.linalg.norm(r),
                        iterations=pairs * 2 * k)


def spmv_dia_pingpong_affine(m: DIA, xq: jax.Array, zq: jax.Array,
                             cq: jax.Array) -> jax.Array:
    """One affine sweep z = M·x + c in the padded layout (fallback path
    when the fused kernel doesn't apply: k=1 via two plain jnp passes)."""
    p = (xq.shape[0] - m.n_pad) // 2
    acc = jnp.zeros((m.n_pad,), jnp.promote_types(m.data.dtype, xq.dtype))
    for s, off in enumerate(m.offsets):
        sl = jax.lax.slice(xq, (p + off,), (p + off + m.n_pad,))
        acc = acc + m.data[s] * sl
    acc = acc + jax.lax.slice(cq, (p,), (p + m.n_pad,))
    return jax.lax.dynamic_update_slice(zq, acc, (p,))


# --- polynomial-Jacobi preconditioner operator ---------------------------

def _jacobi_sweeps_apply(data, r, *, k: int, pairs: int, n: int):
    m, datak, c_scale = data
    c = c_scale * jnp.pad(r.astype(m.data.dtype), (0, m.n_pad - r.shape[0]))
    tr = dia_pp_tile(m) or m.halo
    cq = dia_pad_pp(m, c[: n])
    xq = jnp.zeros_like(cq)
    zq = jnp.zeros_like(cq)

    if k > 1:
        def body(_, cbuf):
            x, z = cbuf
            z = spmv_dia_power(m, datak, x, z, k=k, add=cq)
            x = spmv_dia_power(m, datak, z, x, k=k, add=cq)
            return (x, z)
    else:
        def body(_, cbuf):
            x, z = cbuf
            z = spmv_dia_pingpong_affine(m, x, z, cq)
            x = spmv_dia_pingpong_affine(m, z, x, cq)
            return (x, z)

    xq, _ = jax.lax.fori_loop(0, pairs, body, (xq, zq))
    return jax.lax.slice(xq, (tr,), (tr + n,)).astype(r.dtype)


def jacobi_sweeps_op(d: DIA, omega: float = 2.0 / 3.0, sweeps: int = 16,
                     fuse_k: int = 8):
    """LinOp r ↦ x_sweeps — a fixed number of weighted-Jacobi sweeps from a
    zero initial guess, i.e. the POLYNOMIAL preconditioner
    P = Σ_{i<sweeps} Mⁱ·ωD⁻¹ (M = I − ωD⁻¹A).  A fixed linear operator, so
    valid for GMRES/BiCGStab (generally nonsymmetric — CG wants a
    symmetrized variant).  Rides the fused affine kernel at k sweeps per
    diagonal read (solvers/jacobi.py header; measured 9 µs/sweep on
    Poisson-1M)."""
    from functools import partial
    from .linop import LinOp

    m = jacobi_iteration_matrix(d, omega)
    k = 1
    kk = fuse_k
    while kk >= 2:
        if dia_power_ok(m, kk) or dia_power_stream_ok(m, kk):
            k = kk
            break
        kk //= 2
    pairs = max(1, -(-sweeps // (2 * k)))
    datak = dia_power_data(m, k) if k > 1 else jnp.zeros((0,), m.data.dtype)
    c0 = d.offsets.index(0)
    diag = d.data[c0]
    c_scale = jnp.where(jnp.abs(diag) > 0, omega / jnp.where(
        jnp.abs(diag) > 0, diag, 1.0), 0.0)
    return LinOp(
        data=(m, datak, c_scale),
        fn=partial(_jacobi_sweeps_apply, k=k, pairs=pairs, n=d.n),
    )
