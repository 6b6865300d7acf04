"""Iterative solvers (GMRES, CG) and the preconditioner validation harness."""

from .gmres import GMRESResult, gmres, gmres_matrix, solve_with_gmres
from .cg import CGResult, cg, cg_matrix, solve_with_cg
from .bicgstab import BiCGStabResult, bicgstab, solve_with_bicgstab
from .multirhs import CGMultiResult, cg_multi
from .stationary import (
    JacobiResult, chebyshev_op, estimate_lmax, jacobi,
    jacobi_iteration_matrix, jacobi_sweeps_op,
)
from .precond import ilu_solve_op, jacobi_op, spai_op
from .trisolve import TriSolvePlan, sparse_ilu_solve_op
from .validate import SolveReport, best_sampled_matrix, validate_preconditioners

__all__ = [
    "GMRESResult", "gmres", "gmres_matrix", "solve_with_gmres",
    "CGResult", "cg", "cg_matrix", "solve_with_cg",
    "BiCGStabResult", "bicgstab", "solve_with_bicgstab",
    "CGMultiResult", "cg_multi",
    "JacobiResult", "chebyshev_op", "estimate_lmax", "jacobi",
    "jacobi_iteration_matrix", "jacobi_sweeps_op",
    "ilu_solve_op", "jacobi_op", "spai_op",
    "TriSolvePlan", "sparse_ilu_solve_op",
    "SolveReport", "best_sampled_matrix", "validate_preconditioners",
]
