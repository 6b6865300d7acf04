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
    dia_power_tile,
    dia_pp_tile,
    spmv_dia,
    spmv_dia_power,
)


def _pick_power_config(m: DIA, fuse_k: int, sweeps: int) -> tuple[int, int]:
    """(k, tile) for the fused affine kernel: among feasible fused configs
    (per-k tiles from ``dia_power_tile``, so a big halo shrinks the tile
    instead of forcing a lower k), pick the one minimizing modeled HBM
    elements per sweep per row — data windows re-read 2(k−1)h/tr
    redundantly, so the largest k is NOT always cheapest at small tiles.
    Returns (1, 0) when no fused config beats the unfused affine sweep."""
    from ..ops.dia import dia_power_ok

    h, nd = m.halo, m.ndiags
    best_k, best_tr = 1, 0
    best_cost = float(nd + 3)          # unfused: data + x + c + out per row
    kk = min(fuse_k, max(1, sweeps // 2))
    while kk >= 2:
        tr = dia_power_tile(m, kk)
        if tr:
            win_d = tr + 2 * (kk - 1) * h
            if dia_power_ok(m, kk, tr):
                # resident kernel: x and c live whole in VMEM and are read
                # once (≈ tr per tile), not at streamed window widths —
                # charging win_x here overestimated resident configs near
                # ties (ADVICE r1)
                win_x, win_c = tr, tr
            else:
                win_x, win_c = tr + 2 * kk * h, win_d
            cost = (nd * win_d + win_x + win_c + tr) / (kk * tr)
            # a modeled tie against the UNFUSED baseline prefers the fused
            # kernel (at the minimal tile nd·win_d ≈ (nd+3)·k·tr exactly, so
            # strict '<' used to reject a feasible fused config); among fused
            # configs the first (largest-k) winner keeps priority
            if cost < best_cost or (best_k == 1 and cost == best_cost):
                best_k, best_tr, best_cost = kk, tr, cost
        kk //= 2
    return best_k, best_tr


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
    k, trk = _pick_power_config(m, fuse_k, iters)
    c = jacobi_constant(d, b, omega)
    tr = trk or dia_pp_tile(m) or m.halo
    cq = dia_pad_pp(m, c[: d.n], tr=tr)
    x_init = jnp.zeros((d.n,), d.data.dtype) if x0 is None else x0
    xq = dia_pad_pp(m, x_init, tr=tr)
    zq = jnp.zeros_like(xq)

    pairs = max(1, -(-iters // (2 * k)))

    if k > 1:
        mk = dia_power_data(m, k, tr=tr)

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

def _jacobi_sweeps_apply(data, r, *, k: int, pairs: int, n: int,
                         tile: int | None = None):
    m, datak, c_scale = data
    c = c_scale * jnp.pad(r.astype(m.data.dtype), (0, m.n_pad - r.shape[0]))
    cq = dia_pad_pp(m, c[: n], tr=tile)
    tr = (cq.shape[0] - m.n_pad) // 2             # derive P from the buffer
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
    P = Σ_{i<sweeps} Mⁱ·ωD⁻¹ (M = I − ωD⁻¹A).  A fixed linear operator;
    for symmetric A it is itself symmetric (D⁻¹(I−ωAD⁻¹)ⁱ = (I−ωD⁻¹A)ⁱD⁻¹)
    and SPD for 0 < ω·λmax(D⁻¹A) < 2 (verified numerically: eigs of P on
    poisson32 ∈ [0.125, 0.99] at ω=2/3, sweeps=6) — so valid for CG as
    well as GMRES/BiCGStab.  Rides the fused affine kernel at k sweeps per
    diagonal read (solvers/stationary.py header; measured 9 µs/sweep on
    Poisson-1M)."""
    from functools import partial
    from .linop import LinOp

    m = jacobi_iteration_matrix(d, omega)
    # fusion granularity is 2·k sweeps (fixed-role call pair); cap k at
    # sweeps//2 so small sweep counts aren't silently inflated (a k=8
    # op asked for 4 sweeps would otherwise run 16)
    k, trk = _pick_power_config(m, fuse_k, sweeps)
    pairs = max(1, -(-sweeps // (2 * k)))
    datak = (dia_power_data(m, k, tr=trk) if k > 1
             else jnp.zeros((0,), m.data.dtype))
    c0 = d.offsets.index(0)
    diag = d.data[c0]
    c_scale = jnp.where(jnp.abs(diag) > 0, omega / jnp.where(
        jnp.abs(diag) > 0, diag, 1.0), 0.0)
    return LinOp(
        data=(m, datak, c_scale),
        fn=partial(_jacobi_sweeps_apply, k=k, pairs=pairs, n=d.n,
                   tile=trk or None),
    )


# --- Chebyshev polynomial preconditioner ----------------------------------

def estimate_lmax(d: DIA, iters: int = 20, seed: int = 0) -> jax.Array:
    """Power-iteration estimate of λmax(A) (scalar, jit-safe).  A few
    percent over-estimation is fine for Chebyshev bounds — callers
    typically scale by 1.05."""
    import jax.random as jr

    v = jr.normal(jr.PRNGKey(seed), (d.n,), d.data.dtype)

    def body(_, v):
        w = spmv_dia(d, v)[: d.n]
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
    w = spmv_dia(d, v)[: d.n]
    return jnp.dot(v, w) / jnp.dot(v, v)


def chebyshev_coeffs(lmin: float, lmax: float, degree: int):
    """Per-step (aᵢ, bᵢ) for the Chebyshev semi-iteration solving A·z = r
    from z₀ = 0 (Saad, Iterative Methods, Alg. 12.1):

        d₀ = r/θ,  z₁ = d₀
        ρᵢ = 1/(2σ₁ − ρᵢ₋₁);  dᵢ = ρᵢρᵢ₋₁·dᵢ₋₁ + (2ρᵢ/δ)(r − A·zᵢ)
        zᵢ₊₁ = zᵢ + dᵢ

    expressed uniformly as dᵢ = aᵢ·dᵢ₋₁ + bᵢ·(r − A·zᵢ) with a₀ = 0,
    b₀ = 1/θ."""
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta
    coeffs = [(0.0, 1.0 / theta)]
    rho_prev = 1.0 / sigma1
    for _ in range(1, degree):
        rho = 1.0 / (2.0 * sigma1 - rho_prev)
        coeffs.append((rho * rho_prev, 2.0 * rho / delta))
        rho_prev = rho
    return coeffs


def _chebyshev_apply(data, r, *, coeffs, n: int):
    d, _ = data
    rr = r[: n]
    z = jnp.zeros_like(rr)
    dd = jnp.zeros_like(rr)
    for (a, b) in coeffs:
        resid = rr - spmv_dia(d, z)[: n]
        dd = a * dd + b * resid
        z = z + dd
    return z.astype(r.dtype)


def _chebyshev_apply_fused(data, r, *, coeff_calls, k: int, n: int):
    from ..ops.dia import spmv_dia_cheby

    from ..ops.dia import dia_pad_pp as _pad_pp   # late: respects test patches

    d, datak = data
    rq = _pad_pp(d, r[: n].astype(d.data.dtype))
    tr = (rq.shape[0] - d.n_pad) // 2             # derive P from the buffer
    bufs = [jnp.zeros_like(rq) for _ in range(4)]   # zA, ddA, zB, ddB
    for i, cc in enumerate(coeff_calls):            # unrolled: static coeffs
        src, dst = (0, 2) if i % 2 == 0 else (2, 0)
        z_out, dd_out = spmv_dia_cheby(
            d, datak, bufs[src], bufs[src + 1], rq,
            bufs[dst], bufs[dst + 1], cc, k)
        bufs[dst], bufs[dst + 1] = z_out, dd_out
    final = 0 if len(coeff_calls) % 2 == 0 else 2
    return jax.lax.slice(bufs[final if len(coeff_calls) else 0],
                         (tr,), (tr + n,)).astype(r.dtype)


def chebyshev_op(d: DIA, lmax: float, lmin: float | None = None,
                 degree: int = 16, fuse_k: int = 4):
    """LinOp r ↦ z_degree — the degree-``degree`` Chebyshev polynomial
    approximation of A⁻¹r over [lmin, lmax] (a polynomial in A: symmetric,
    and SPD when the polynomial is positive on the spectrum — the standard
    Chebyshev preconditioner).  Near-optimal iteration cuts for CG:
    κ(P·A) ≈ ((1+ε)/(1−ε))² with ε = exp(−2·degree/√(lmax/lmin)).
    ``lmin`` defaults to lmax/30 (the usual smoother heuristic; pass the
    true λmin for full preconditioning strength).  ``lmax``/``lmin`` are
    python floats (static).

    When the fused Chebyshev kernel fits (``dia_cheby_ok``), the apply
    runs ``fuse_k`` semi-iteration steps per diagonal-data read (degree
    rounds UP to a multiple of fuse_k — a slightly higher degree only
    strengthens P)."""
    from functools import partial
    from ..ops.dia import dia_cheby_ok
    from .linop import LinOp

    if lmin is None:
        lmin = lmax / 30.0
    k = 1
    kk = min(fuse_k, max(1, degree // 2))
    while kk >= 2:
        if dia_cheby_ok(d, kk):
            k = kk
            break
        kk //= 2
    if k > 1:
        degree_eff = -(-degree // k) * k
        coeffs = chebyshev_coeffs(float(lmin), float(lmax), degree_eff)
        coeff_calls = tuple(tuple(coeffs[i:i + k])
                            for i in range(0, degree_eff, k))
        datak = dia_power_data(d, k)
        return LinOp(data=(d, datak),
                     fn=partial(_chebyshev_apply_fused,
                                coeff_calls=coeff_calls, k=k, n=d.n))
    coeffs = tuple(chebyshev_coeffs(float(lmin), float(lmax), degree))
    dummy = jnp.zeros((0,), d.data.dtype)
    return LinOp(data=(d, dummy),
                 fn=partial(_chebyshev_apply, coeffs=coeffs, n=d.n))


# --- multi-RHS weighted Jacobi (fused over sweeps AND right-hand sides) --

def jacobi_multirhs(d: DIA, b: jax.Array, x0: jax.Array | None = None,
                    omega: float = 2.0 / 3.0, iters: int = 100,
                    fuse_k: int = 8) -> JacobiResult:
    """Weighted Jacobi for K systems A·X = B at once (``b``: [K, n]).

    Rides ``ops.dia.spmv_dia_power_rhs``: one widened diagonal-data read
    serves k dependent sweeps × K right-hand sides, so the per-(sweep, rhs)
    diagonal traffic drops k·K-fold vs a chained single-RHS apply — the
    multi-RHS temporal-blocked smoother from the round-1 gap list
    (CLAUDE.md; VERDICT r1 #8).  Residual reported per RHS ([K])."""
    from ..ops.dia import (dia_pad_pp_rhs, dia_power_rhs_ok,
                           spmv_dia_power_rhs)

    K = b.shape[0]
    m = jacobi_iteration_matrix(d, omega)
    # reuse the 1-RHS tile/k model, then check the K-scaled VMEM fit
    k, trk = _pick_power_config(m, fuse_k, iters)
    while k > 1 and not dia_power_rhs_ok(m, k, K, trk or dia_pp_tile(m)):
        k //= 2
        trk = dia_power_tile(m, k) if k > 1 else 0
    c = jax.vmap(lambda bb: jacobi_constant(d, bb, omega))(b)   # [K, n_pad]
    tr = trk or dia_pp_tile(m) or m.halo
    cq = dia_pad_pp_rhs(m, c[:, : d.n], tr=tr)
    x_init = (jnp.zeros((K, d.n), d.data.dtype) if x0 is None else x0)
    xq = dia_pad_pp_rhs(m, x_init, tr=tr)
    zq = jnp.zeros_like(xq)
    pairs = max(1, -(-iters // (2 * k)))

    if k > 1:
        mk = dia_power_data(m, k, tr=tr)

        def body(_, cbuf):
            x, z = cbuf
            z = spmv_dia_power_rhs(m, mk, x, z, k=k, add=cq)
            x = spmv_dia_power_rhs(m, mk, z, x, k=k, add=cq)
            return (x, z)
    else:
        dummy = jnp.zeros((0, m.ndiags, 0), m.data.dtype)

        def body(_, cbuf):
            x, z = cbuf
            z = spmv_dia_power_rhs(m, dummy, x, z, k=1, add=cq)
            x = spmv_dia_power_rhs(m, dummy, z, x, k=1, add=cq)
            return (x, z)

    xq, zq = jax.lax.fori_loop(0, pairs, body, (xq, zq))
    x = jax.lax.slice(xq, (0, tr), (K, tr + d.n))
    r = b.astype(x.dtype) - jax.vmap(lambda xx: spmv_dia(d, xx)[: d.n])(x)
    return JacobiResult(x=x, residual=jnp.linalg.norm(r, axis=-1),
                        iterations=pairs * 2 * k)
