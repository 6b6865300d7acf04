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

All operators are returned as ``LinOp`` (fn, data) pairs, so the factor /
matrix arrays ride the solvers' jit boundaries as device arguments instead
of compile-payload constants (see solvers.linop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.ops import spmv
from ..sparse.types import COO
from .linop import LinOp, _matvec_sparse


def _dense_ilu_apply(data, x):
    Ld, Ud = data
    y = jax.scipy.linalg.solve_triangular(Ld, x.astype(Ld.dtype), lower=True)
    z = jax.scipy.linalg.solve_triangular(Ud, y, lower=False)
    return z.astype(x.dtype)   # keep the solver's carry dtype stable


def ilu_solve_op(L: COO, U: COO, dense_max_n: int = 4096) -> LinOp:
    """x ↦ U⁻¹ L⁻¹ x.  Dense triangular solves up to ``dense_max_n`` rows;
    larger factors use the level-scheduled sparse solver (solvers.trisolve)
    so memory stays O(nnz) instead of O(n²)."""
    if L.shape[0] > dense_max_n:
        from .trisolve import sparse_ilu_solve_op

        op = sparse_ilu_solve_op(L, U)
        if op is not None:
            return op
    return LinOp(data=(L.todense(), U.todense()), fn=_dense_ilu_apply)


def spai_op(m) -> LinOp:
    """x ↦ M x — the sampled sparse approximate inverse.  Accepts COO or
    DIA; pass DIA for banded M so the apply rides the Pallas SpMV instead
    of the gather-based COO path (measured 40 ms vs sub-ms per CG iteration
    at 250k rows)."""
    from ..ops.dia import DIA
    from .linop import _matvec_dia

    if isinstance(m, DIA):
        return LinOp(data=m, fn=_matvec_dia)
    return LinOp(data=m, fn=_matvec_sparse)


def _sym_apply(data, x):
    m, mt = data
    return 0.5 * (spmv(m, x) + spmv(mt, x))


def _sym_apply_dia(data, x):
    from ..ops.dia import spmv_dia

    m, mt = data
    return 0.5 * (spmv_dia(m, x) + spmv_dia(mt, x))


def spai_op_sym(m) -> LinOp:
    """x ↦ ½(M + Mᵀ)x — symmetrized application for CG, which requires an
    SPD preconditioner (a thinned/classic SPAI M is generally
    nonsymmetric even for SPD A).  COO or DIA (see ``spai_op``)."""
    from ..ops.dia import DIA, dia_transpose

    if isinstance(m, DIA):
        return LinOp(data=(m, dia_transpose(m)), fn=_sym_apply_dia)
    mt = COO(row=m.col, col=m.row, data=m.data, shape=(m.shape[1], m.shape[0]))
    return LinOp(data=(m, mt), fn=_sym_apply)


def _diag_apply(inv, x):
    return inv * x


def jacobi_op(a: COO) -> LinOp:
    diag = jnp.zeros((a.shape[0],), a.data.dtype).at[a.row].add(
        jnp.where(a.row == a.col, a.data, 0.0)
    )
    inv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    return LinOp(data=inv, fn=_diag_apply)
