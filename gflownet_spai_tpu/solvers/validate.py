"""Validation harness: GMRES/CG iteration-count comparison.

The reference's acceptance metric (SURVEY.md §3.4): solve ``A x = b`` with
GMRES, unpreconditioned vs ILU vs the sampled SPAI pattern, and compare
iteration counts, residual histories, and wall-clock (reference
GFlowNet100.py:61-93,98-132).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..env import ilu as ilu_mod
from ..env import spai as spai_mod
from ..sparse.types import COO
from .gmres import solve_with_gmres
from .cg import solve_with_cg
from .precond import ilu_solve_op, spai_op


@dataclasses.dataclass
class SolveReport:
    iterations: int
    elapsed: float
    final_residual: float
    converged: bool

    def to_dict(self):
        return dataclasses.asdict(self)


def _report(a, b, x, residuals, iters, elapsed, rtol) -> SolveReport:
    """``converged`` is judged on the solver-independent true residual
    ‖b − A x‖ ≤ rtol·‖b‖ (a maxiter-exhausted or degenerate-preconditioner
    run must not report success just because its history is finite)."""
    from ..sparse.ops import spmv

    final = float(residuals[-1]) if len(residuals) else float("nan")
    true_res = float(jnp.linalg.norm(b - spmv(a, x)) / jnp.linalg.norm(b))
    return SolveReport(
        iterations=iters, elapsed=elapsed, final_residual=final,
        converged=bool(true_res <= rtol),
    )


def validate_preconditioners(
    a: COO,
    b: Optional[jnp.ndarray] = None,
    sampled_m: Optional[COO] = None,
    maxiter: int = 10260,
    restart: int = 30,
    method: str = "gmres",
    seed_method: str = "ilu0",
    jacobi_poly: int = 0,
) -> Dict[str, SolveReport]:
    """Run the reference comparison: none vs ILU vs (optionally) sampled
    SPAI.  ``jacobi_poly`` > 0 adds a polynomial-Jacobi row (that many
    weighted-Jacobi sweeps as the preconditioner; symmetric & SPD for
    symmetric A, so valid for CG too)."""
    n = a.shape[0]
    if b is None:
        b = jnp.ones((n,), a.data.dtype)
    solve = solve_with_gmres if method == "gmres" else solve_with_cg
    rtol = 1e-5
    kw = dict(maxiter=maxiter, rtol=rtol)
    if method == "gmres":
        kw["restart"] = restart

    out: Dict[str, SolveReport] = {}
    out["none"] = _report(a, b, *solve(a, b, None, **kw), rtol=100 * rtol)

    L, U = ilu_mod.ilu0(a)   # spilu factors are pattern-only (permutation dropped)
    out["ilu"] = _report(a, b, *solve(a, b, ilu_solve_op(L, U), **kw),
                         rtol=100 * rtol)

    if sampled_m is not None:
        out["spai"] = _report(a, b, *solve(a, b, spai_op(sampled_m), **kw),
                              rtol=100 * rtol)
    if jacobi_poly > 0:
        from ..ops.dia import coo_to_dia
        from .stationary import jacobi_sweeps_op

        op = jacobi_sweeps_op(coo_to_dia(a), sweeps=jacobi_poly)
        out["jacobi_poly"] = _report(a, b, *solve(a, b, op, **kw),
                                     rtol=100 * rtol)
    return out


def best_sampled_matrix(env, actions: jnp.ndarray,
                        rewards: jnp.ndarray) -> COO:
    """Extract the highest-reward sampled preconditioner from a batch of
    trajectories as a COO matrix (for GMRES validation).  Works for both
    the COO-plan env and the DIA-band env (whose edge enumeration differs)."""
    from ..env import spai_dia

    best = int(jnp.argmax(rewards))
    keep = spai_mod.keep_mask_from_actions(actions[best], env.num_edges)
    if isinstance(env, spai_dia.SpaiDiaEnv):
        seed_coo = spai_dia.edge_coo(env)
    else:
        seed_coo = env.seed
    vals = seed_coo.data * keep.astype(seed_coo.data.dtype)
    return COO(row=seed_coo.row, col=seed_coo.col, data=vals,
               shape=seed_coo.shape)
