"""Preconditioner operators for the validation harness.

* ``ilu_solve_op``  — the reference's baseline: apply ``(LU)⁻¹`` from an
  incomplete factorization via two triangular solves (reference
  GFlowNet100.py:126-132 wraps scipy ``spilu.solve`` in a LinearOperator).
  Validation-path implementation: dense triangular solves on the densified
  factors (the test matrices are ≤ O(1k) rows; this is offline validation,
  not the measured path — SURVEY.md §7 layer 3).
* ``spai_op``       — apply a sampled SPAI matrix M (one SpMV): the
  GFlowNet's product.
* ``jacobi_op``     — diagonal scaling, the cheap sanity baseline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..sparse.ops import spmv
from ..sparse.types import COO


def ilu_solve_op(L: COO, U: COO, dense_max_n: int = 4096):
    """x ↦ U⁻¹ L⁻¹ x.  Dense triangular solves up to ``dense_max_n`` rows;
    larger factors use the level-scheduled sparse solver (solvers.trisolve)
    so memory stays O(nnz) instead of O(n²)."""
    if L.shape[0] > dense_max_n:
        from .trisolve import sparse_ilu_solve_op

        op = sparse_ilu_solve_op(L, U)
        if op is not None:
            return op
    Ld = L.todense()
    Ud = U.todense()

    def op(x):
        y = jax.scipy.linalg.solve_triangular(Ld, x.astype(Ld.dtype), lower=True)
        z = jax.scipy.linalg.solve_triangular(Ud, y, lower=False)
        return z.astype(x.dtype)   # keep the solver's carry dtype stable

    return op


def spai_op(m: COO):
    """x ↦ M x — the sampled sparse approximate inverse."""
    return partial(spmv, m)


def spai_op_sym(m: COO):
    """x ↦ ½(M + Mᵀ)x — symmetrized application for CG, which requires an
    SPD preconditioner (a thinned/classic SPAI M is generally
    nonsymmetric even for SPD A)."""
    mt = COO(row=m.col, col=m.row, data=m.data, shape=(m.shape[1], m.shape[0]))

    def op(x):
        return 0.5 * (spmv(m, x) + spmv(mt, x))

    return op


def jacobi_op(a: COO):
    diag = jnp.zeros((a.shape[0],), a.data.dtype).at[a.row].add(
        jnp.where(a.row == a.col, a.data, 0.0)
    )
    inv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    return lambda x: inv * x
