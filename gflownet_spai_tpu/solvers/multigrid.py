"""Aggregation V-cycle preconditioner on the fused DIA kernels.

Extends the smoother family the validate harness compares against
(weighted Jacobi ``jacobi_sweeps_op``, Chebyshev ``chebyshev_op`` —
solvers/stationary.py): a geometric-ish multigrid V-cycle whose every
smoothing sweep rides the temporally-blocked fused SpMV
(``ops.dia.spmv_dia_power``: k sweeps per diagonal-data read), and whose
grid-transfer operators are reshape/repeat — no gathers anywhere.

Coarsening is size-2 aggregation on the (RCM-ordered) row index:

    P z_c = repeat(z_c, 2)           (piecewise-constant prolongation)
    R r   = ½·(r[0::2] + r[1::2])    (its scaled adjoint, R = ½ Pᵀ)
    A_c   = R A P                    (Galerkin; DIA again, offsets ≈ off/2)

Consecutive-index aggregation is the right choice for banded/RCM matrices
(neighbors in index are neighbors in the graph), and halves the bandwidth
per level so every coarse operator stays DIA.  The Galerkin product is
precomputed as ONE scatter-add over static index maps at op construction
(A's values are constant during a solve).

With symmetric smoothing (equal pre/post weighted-Jacobi sweeps) and
R ∝ Pᵀ the V-cycle operator is symmetric for symmetric A — usable as a
CG preconditioner when it stays PD (the validate harness's CG-breakdown
fallback catches the indefinite case, validate/__main__.py).

The reference has no solver stack at all (scipy GMRES only, reference
GFlowNet100.py:61-93); north-star surface per BASELINE.json.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.dia import (
    DIA,
    dia_pad_pp,
    dia_power_data,
    dia_pp_tile,
    spmv_dia,
)
from .linop import LinOp
from .stationary import (
    _pick_power_config,
    jacobi_iteration_matrix,
    spmv_dia_pingpong_affine,
)

_ALIGN = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def galerkin_coarse_dia(d: DIA) -> DIA:
    """A_c = ½ Pᵀ A P for size-2 aggregation, in DIA.  One jnp scatter-add
    over host-precomputed (static) index maps; offsets roughly halve."""
    n = d.n
    n_c = (n + 1) // 2
    src_list, ii_list, dc_list = [], [], []
    for s, off in enumerate(d.offsets):
        lo = max(0, -off)
        hi = min(n, n - off)
        if hi <= lo:
            continue
        i = np.arange(lo, hi, dtype=np.int64)
        src_list.append(s * d.n_pad + i)
        ii_list.append(i // 2)
        dc_list.append((i + off) // 2 - i // 2)
    if not src_list:
        raise ValueError("empty matrix")
    src = np.concatenate(src_list)
    big_i = np.concatenate(ii_list)
    dc = np.concatenate(dc_list)
    c_offs = np.unique(dc)
    sc_of = {int(o): k for k, o in enumerate(c_offs)}
    sc = np.asarray([sc_of[int(x)] for x in dc])
    n_cpad = _round_up(n_c, _ALIGN)
    dst = sc * n_cpad + big_i
    flat = jnp.zeros((len(c_offs) * n_cpad,), d.data.dtype)
    flat = flat.at[jnp.asarray(dst)].add(
        0.5 * d.data.reshape(-1)[jnp.asarray(src)])
    return DIA(
        data=flat.reshape(len(c_offs), n_cpad),
        offsets=tuple(int(o) for o in c_offs),
        shape=(n_c, n_c),
        nnz=int(len(dst)),
    )


def restrict(r: jax.Array) -> jax.Array:
    """½·(r[0::2] + r[1::2]) with odd-length zero pad: [n] → [(n+1)//2]."""
    n = r.shape[0]
    rp = jnp.pad(r, (0, n % 2))
    return 0.5 * rp.reshape(-1, 2).sum(axis=1)


def prolong(z_c: jax.Array, n: int) -> jax.Array:
    """Piecewise-constant interpolation: [(n+1)//2] → [n]."""
    return jnp.repeat(z_c, 2)[:n]


def _level_setup(a: DIA, omega: float, sweeps_max: int, fuse_k: int):
    """Per-level static smoother config + device data."""
    m = jacobi_iteration_matrix(a, omega)
    k, trk = _pick_power_config(m, fuse_k, sweeps_max)
    datak = (dia_power_data(m, k, tr=trk) if k > 1
             else jnp.zeros((0,), m.data.dtype))
    c0 = a.offsets.index(0)
    diag = a.data[c0]
    nz = jnp.abs(diag) > 0
    c_scale = jnp.where(nz, omega / jnp.where(nz, diag, 1.0), 0.0)
    tr = trk or dia_pp_tile(m) or m.halo
    meta = {"k": k, "tr": tr, "n": a.n}
    return meta, (a, m, datak, c_scale)


def _sweeps(level_meta, level_data, r, x0, sweeps: int):
    """``sweeps`` weighted-Jacobi sweeps on A·x = r from ``x0`` (None =
    zero start), through the fused affine kernel when configured."""
    from ..ops.dia import spmv_dia_power

    a, m, datak, c_scale = level_data
    k, tr, n = level_meta["k"], level_meta["tr"], level_meta["n"]
    if sweeps <= 0:
        # 0 sweeps means 0 sweeps — not one fused 2k block (ADVICE r3)
        return r * 0 if x0 is None else x0[:n]
    c = c_scale * jnp.pad(r.astype(m.data.dtype), (0, m.n_pad - r.shape[0]))
    cq = dia_pad_pp(m, c[:n], tr=tr)
    xq = (jnp.zeros_like(cq) if x0 is None
          else dia_pad_pp(m, x0[:n].astype(m.data.dtype), tr=tr))
    zq = jnp.zeros_like(cq)
    pairs = max(1, -(-sweeps // (2 * k)))

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
    return jax.lax.slice(xq, (tr,), (tr + n,))


def _vcycle_apply(data, r, *, metas, pre: int, post: int, coarse_sweeps: int,
                  gamma: int = 1):
    levels = data
    r = r.astype(levels[0][0].data.dtype)

    def coarse_solve(l, rc):
        """γ recursive visits of level l (γ=1: V-cycle, γ=2: W-cycle)."""
        zc = cycle(l, rc)
        for _ in range(gamma - 1):
            if l == len(metas) - 1:
                break              # re-visiting the coarsest is a no-op gain
            rc2 = rc - spmv_dia(levels[l][0], zc)[: metas[l]["n"]]
            zc = zc + cycle(l, rc2)
        return zc

    def cycle(l, rl):
        meta, lvl = metas[l], levels[l]
        if l == len(metas) - 1:
            return _sweeps(meta, lvl, rl, None, coarse_sweeps)
        z = _sweeps(meta, lvl, rl, None, pre)
        a = lvl[0]
        rf = rl - spmv_dia(a, z)[: meta["n"]]
        zc = coarse_solve(l + 1, restrict(rf))
        z = z + prolong(zc, meta["n"])
        return _sweeps(meta, lvl, rl, z, post)

    return cycle(0, r[: metas[0]["n"]])


def _vcycle_apply_cheb(data, r, *, fns, gamma: int = 1):
    """Chebyshev-smoothed V-cycle body.  ``data``: per level
    (A_dia, smoother_data, coarse_data-or-None); ``fns``: per level the
    (static) smoother/coarse LinOp fns.  Pre-smooth from zero is one op
    apply; post-smoothing from z costs one extra SpMV for the residual.
    ``gamma=2`` = W-cycle (each intermediate level re-descends once)."""
    levels = data
    r = r.astype(levels[0][0].data.dtype)

    def coarse_solve(l, rc):
        zc = cycle(l, rc)
        for _ in range(gamma - 1):
            if l == len(levels) - 1:
                break
            rc2 = rc - spmv_dia(levels[l][0], zc)[: levels[l][0].n]
            zc = zc + cycle(l, rc2)
        return zc

    def cycle(l, rl):
        a, sm_data, co_data = levels[l]
        sm_fn, co_fn = fns[l]
        n = a.n
        if l == len(levels) - 1:
            return co_fn(co_data, rl)
        z = sm_fn(sm_data, rl)
        rf = rl - spmv_dia(a, z)[:n]
        zc = coarse_solve(l + 1, restrict(rf))
        z = z + prolong(zc, n)
        # post-smooth: z + P(r − A z) — same polynomial, valid symmetric
        # smoothing (keeps the V-cycle symmetric for symmetric A)
        rf2 = rl - spmv_dia(a, z)[:n]
        return z + sm_fn(sm_data, rf2)

    return cycle(0, r[: levels[0][0].n])


def vcycle_op(d: DIA, omega: float = 2.0 / 3.0, pre: int = 2, post: int = 2,
              levels: int = 2, coarse_sweeps: int = 16,
              fuse_k: int = 8, min_coarse_n: int = 2048,
              smoother: str = "jacobi",
              cheb_degree: int = 8, cheb_lmin_ratio: float = 4.0,
              cheb_coarse_degree: int = 32, gamma: int = 1) -> LinOp:
    """LinOp r ↦ z — one aggregation V-cycle on A (see module docstring).

    ``levels`` counts grids including the finest (2 = the classic two-level
    method); coarsening stops early at ``min_coarse_n`` rows.  All knobs
    static; A's values live in the LinOp data pytree (payload rule).

    ``gamma=2`` turns the cycle into a W-cycle: every intermediate level
    re-descends once more on its updated residual (2^depth coarse visits).
    Coarse levels are cheap on TPU only until the launch floor — W-cycles
    trade more small-kernel launches for fewer CG iterations, so measure
    (tpu_tests/bench latency floors dominate below ~100k rows).

    ``smoother="chebyshev"`` (VERDICT r3 item 8) replaces weighted Jacobi
    with a degree-``cheb_degree`` Chebyshev polynomial targeting the upper
    spectrum [λmax/``cheb_lmin_ratio``, λmax] per level (λmax by power
    iteration at setup) — a far stronger smoother per launch, riding the
    same fused temporally-blocked kernels; the coarsest level applies a
    degree-``cheb_coarse_degree`` polynomial once.  Symmetric (pre + post
    use the same polynomial), so CG-valid for SPD A."""
    if levels < 2:
        raise ValueError("vcycle_op needs levels >= 2")
    if smoother == "chebyshev":
        from .stationary import chebyshev_op, estimate_lmax

        datas, fns = [], []
        a = d
        for l in range(levels):
            is_coarse = l == levels - 1 or a.n <= min_coarse_n
            lmax = 1.05 * float(estimate_lmax(a, iters=20))
            sm = chebyshev_op(a, lmax=lmax, lmin=lmax / cheb_lmin_ratio,
                              degree=cheb_degree, fuse_k=fuse_k)
            co = None
            if is_coarse:
                # coarsest: wider interval (acts as an approximate solve)
                co = chebyshev_op(a, lmax=lmax, lmin=lmax / 30.0,
                                  degree=cheb_coarse_degree, fuse_k=fuse_k)
            datas.append((a, sm.data, co.data if co else None))
            fns.append((sm.fn, co.fn if co else None))
            if is_coarse:
                break
            a = galerkin_coarse_dia(a)
        return LinOp(
            data=tuple(datas),
            fn=partial(_vcycle_apply_cheb, fns=tuple(fns), gamma=gamma),
        )
    metas, datas = [], []
    a = d
    for l in range(levels):
        # k is chosen from the sweep count this level actually runs, so
        # pre=2 executes 2 sweeps, not one fused 2·fuse_k block (ADVICE r3):
        # non-coarsest levels run pre- and post-smoothing, the coarsest runs
        # coarse_sweeps.  _sweeps still rounds odd counts up to a ping-pong
        # pair (even), by construction of the fused kernel.
        is_coarse = l == levels - 1 or a.n <= min_coarse_n
        lvl_sweeps = (coarse_sweeps if is_coarse
                      else min((s for s in (pre, post) if s > 0), default=1))
        meta, data = _level_setup(a, omega, lvl_sweeps, fuse_k)
        metas.append(meta)
        datas.append(data)
        if is_coarse:
            break
        a = galerkin_coarse_dia(a)
    return LinOp(
        data=tuple(datas),
        fn=partial(_vcycle_apply, metas=tuple(metas), pre=pre, post=post,
                   coarse_sweeps=coarse_sweeps, gamma=gamma),
    )
