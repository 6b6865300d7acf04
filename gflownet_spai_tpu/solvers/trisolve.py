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


def _ilu_levels_apply(data, x):
    l_levels, u_levels = data
    return _levels_solve(u_levels, _levels_solve(l_levels, x))


def sparse_ilu_solve_op(L: COO, U: COO, max_levels: int | None = None):
    """x ↦ U⁻¹ L⁻¹ x with level-scheduled sparse solves, as a LinOp (the
    level arrays travel as jit arguments — solvers.linop).

    Returns None when either factor's level count exceeds ``max_levels``
    (caller should fall back to the dense path)."""
    from .linop import LinOp

    pl_ = TriSolvePlan(L, lower=True)
    pu = TriSolvePlan(U, lower=False)
    if max_levels is not None and max(pl_.num_levels, pu.num_levels) > max_levels:
        return None
    return LinOp(data=(pl_.levels, pu.levels), fn=_ilu_levels_apply)
