"""Level-scheduled sparse triangular solves.

Replaces the dense `solve_triangular` validation path (O(n²) memory) for
large factors: a host-side topological analysis groups rows into dependency
levels, then each level solves in one vectorized segment-sum step.  Level
count is matrix-dependent (2k−1 for a k×k Poisson grid, n for a dense band)
— matrices with pathological level counts should stay on the dense path.

Used by ``ilu_solve_op(..., sparse=True)`` so the ILU baseline scales past
a few thousand rows.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.types import COO
from ..sparse.convert import coo_to_scipy


class TriSolvePlan:
    """Host-built schedule for ``L x = b`` (lower=True) or ``U x = b``."""

    def __init__(self, t: COO, lower: bool = True, unit_diagonal: bool = False):
        T = coo_to_scipy(t).tocsr()
        n = T.shape[0]
        indptr, indices, data = T.indptr, T.indices, T.data
        self.n = n
        self.lower = lower
        self.unit = unit_diagonal

        order = range(n) if lower else range(n - 1, -1, -1)
        level = np.zeros(n, np.int64)
        for i in order:
            deps = indices[indptr[i]:indptr[i + 1]]
            deps = deps[deps < i] if lower else deps[deps > i]
            if len(deps):
                level[i] = level[deps].max() + 1
        self.num_levels = int(level.max()) + 1 if n else 0

        # per-level row sets and their off-diagonal entries, padded
        diag = np.ones(n, data.dtype)
        if not unit_diagonal:
            for i in range(n):
                row = slice(indptr[i], indptr[i + 1])
                dpos = np.nonzero(indices[row] == i)[0]
                if len(dpos) == 0 or data[row][dpos[0]] == 0.0:
                    raise ZeroDivisionError(f"zero diagonal at row {i}")
                diag[i] = data[row][dpos[0]]

        self.levels: List[Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]] = []
        for lev in range(self.num_levels):
            rows = np.nonzero(level == lev)[0]
            ent_r, ent_c, ent_v = [], [], []
            for k, i in enumerate(rows):
                row = slice(indptr[i], indptr[i + 1])
                cols = indices[row]
                vals = data[row]
                off = (cols < i) if lower else (cols > i)
                ent_r.extend([k] * off.sum())
                ent_c.extend(cols[off])
                ent_v.extend(vals[off])
            self.levels.append((
                jnp.asarray(rows, jnp.int32),
                jnp.asarray(np.asarray(ent_r, np.int64), jnp.int32),
                jnp.asarray(np.asarray(ent_c, np.int64), jnp.int32),
                jnp.asarray(np.asarray(ent_v, data.dtype)),
                jnp.asarray(diag[rows]),
            ))

    def bidiagonal(self):
        """(sub_or_sup, diag) arrays when every row's off-diagonal
        dependency set is exactly {i−1} (lower) / {i+1} (upper) or empty —
        the associative-scan fast path (None otherwise)."""
        n = self.n
        dt = np.asarray(self.levels[0][3]).dtype if self.levels else np.float64
        sub = np.zeros(n, dt)
        diag = np.ones(n, dt)
        for lev in self.levels:
            rows, er, ec, ev, dg = (np.asarray(a) for a in lev)
            diag[rows] = dg
            if len(er) == 0:
                continue
            if len(np.unique(er)) != len(er):       # >1 dep on some row
                return None
            want = rows[er] + (-1 if self.lower else 1)
            if not np.array_equal(ec, want):
                return None
            sub[rows[er]] = ev
        return (jnp.asarray(sub), jnp.asarray(diag))

    def padded(self):
        """Uniform [num_levels, W]-padded level arrays for the lax.scan
        solve (memory-safe at any level count; pads scatter to slot n)."""
        n = self.n
        wr = max((len(np.asarray(l[0])) for l in self.levels), default=1)
        we = max((len(np.asarray(l[1])) for l in self.levels), default=1)
        wr, we = max(wr, 1), max(we, 1)
        L = len(self.levels)
        dt = np.asarray(self.levels[0][3]).dtype if self.levels else np.float64
        rows = np.full((L, wr), n, np.int32)         # pad rows → slot n
        er = np.zeros((L, we), np.int32)
        ec = np.zeros((L, we), np.int32)
        ev = np.zeros((L, we), dt)
        dg = np.ones((L, wr), dt)
        for i, lev in enumerate(self.levels):
            r, e_r, e_c, e_v, d = (np.asarray(a) for a in lev)
            rows[i, :len(r)] = r
            dg[i, :len(r)] = d
            er[i, :len(e_r)] = e_r
            ec[i, :len(e_c)] = e_c
            ev[i, :len(e_v)] = e_v
            er[i, len(e_r):] = wr                    # pad entries → seg wr
        return (jnp.asarray(rows), jnp.asarray(er), jnp.asarray(ec),
                jnp.asarray(ev), jnp.asarray(dg))

    def solve(self, b: jax.Array) -> jax.Array:
        return _levels_solve(self.levels, b)


def _levels_solve(levels, b: jax.Array) -> jax.Array:
    """Apply a level schedule (pure function of the plan's level arrays, so
    it can sit behind a LinOp with the levels as pytree data)."""
    x = jnp.zeros_like(b)
    for rows, er, ec, ev, dg in levels:
        acc = jax.ops.segment_sum(ev * x[ec], er, num_segments=rows.shape[0])
        x = x.at[rows].set((b[rows] - acc) / dg.astype(b.dtype))
    return x


def _scan_levels_solve(padded, b: jax.Array) -> jax.Array:
    """lax.scan over uniform padded levels — one compiled step regardless
    of level count (the unrolled form blows up tracing past a few hundred
    levels; a 100k-level tridiagonal factor would otherwise fall to the
    dense O(n²) path)."""
    rows_a, er_a, ec_a, ev_a, dg_a = padded
    n = b.shape[0]
    wr = rows_a.shape[1]
    x0 = jnp.zeros((n + 1,), b.dtype)                # slot n absorbs pads
    bp = jnp.pad(b, (0, 1))

    def body(x, lev):
        rows, er, ec, ev, dg = lev
        acc = jax.ops.segment_sum(ev.astype(b.dtype) * x[ec], er,
                                  num_segments=wr + 1)[:wr]
        xi = (bp[rows] - acc) / dg.astype(b.dtype)
        return x.at[rows].set(xi), None

    x, _ = jax.lax.scan(body, x0, (rows_a, er_a, ec_a, ev_a, dg_a))
    return x[:n]


def _bidiag_solve(sub, diag, b: jax.Array, lower: bool) -> jax.Array:
    """x_i = (b_i − sub_i·x_{i∓1})/diag_i as a first-order linear
    recurrence via ``associative_scan`` — O(log n) depth (upper solves
    run on the reversed arrays)."""
    s = sub.astype(b.dtype)
    d = diag.astype(b.dtype)
    bb = b
    if not lower:
        s, d, bb = s[::-1], d[::-1], b[::-1]
    a = -s / d
    c = bb / d
    a = a.at[0].set(0.0)

    def combine(lhs, rhs):
        a1, c1 = lhs
        a2, c2 = rhs
        return a1 * a2, a2 * c1 + c2

    _, x = jax.lax.associative_scan(combine, (a, c))
    return x[::-1] if not lower else x


def _ilu_levels_apply(data, x):
    l_levels, u_levels = data
    return _levels_solve(u_levels, _levels_solve(l_levels, x))


_UNROLL_MAX_LEVELS = 64      # beyond this the unrolled program is too big


def _tri_apply_fns(plan: "TriSolvePlan"):
    """(fn, data) applying one triangular solve, picking the best form:
    associative-scan bidiagonal → unrolled levels → lax.scan levels."""
    bi = plan.bidiagonal()
    if bi is not None:
        from functools import partial
        return partial(_bidiag_solve_data, lower=plan.lower), bi
    if plan.num_levels <= _UNROLL_MAX_LEVELS:
        return _levels_solve_data, plan.levels
    return _scan_levels_solve_data, plan.padded()


def _bidiag_solve_data(data, b, *, lower):
    sub, diag = data
    return _bidiag_solve(sub, diag, b, lower)


def _levels_solve_data(data, b):
    return _levels_solve(data, b)


def _scan_levels_solve_data(data, b):
    return _scan_levels_solve(data, b)


def _ilu_two_solve_apply(data, x, *, fl, fu):
    dl, du = data
    return fu(du, fl(dl, x))


def sparse_ilu_solve_op(L: COO, U: COO, max_levels: int | None = None):
    """x ↦ U⁻¹ L⁻¹ x with sparse triangular solves, as a LinOp (the
    schedule arrays travel as jit arguments — solvers.linop).

    Per factor the best form is chosen automatically: bidiagonal factors
    (tridiagonal-class matrices: olm*, convdiff) run as an O(log n)
    associative scan; ≤64 levels run the unrolled level schedule; anything
    else runs the lax.scan level schedule (memory-safe at any level
    count).  ``max_levels`` is kept for API compatibility: when set,
    returns None past the cap (legacy dense-fallback callers)."""
    from functools import partial
    from .linop import LinOp

    pl_ = TriSolvePlan(L, lower=True)
    pu = TriSolvePlan(U, lower=False)
    if max_levels is not None and max(pl_.num_levels, pu.num_levels) > max_levels:
        return None
    fl, dl = _tri_apply_fns(pl_)
    fu, du = _tri_apply_fns(pu)
    return LinOp(data=(dl, du), fn=partial(_ilu_two_solve_apply, fl=fl, fu=fu))
