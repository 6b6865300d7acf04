"""ILU factorizations and the ILU seed-pattern builder.

The GFlowNet's action space is the nnz set of ``tril(L) @ triu(U)`` from an
incomplete LU of A (reference GFlowNet100.py:119-159).  This is offline
setup, not the measured path (SURVEY.md §7 layer 3), so it runs host-side:

* ``ilu0``        — first-party ILU(0) (no fill) in NumPy, no pivoting.
* ``spilu_lu``    — scipy SuperLU ``spilu`` wrapper (reference-exact path).
* ``seed_pattern``— L@U product as a COO matrix, the env's initial matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sparse.types import COO
from ..sparse.convert import coo_to_scipy, scipy_to_coo


def ilu0(a: COO):
    """ILU(0): incomplete LU on the sparsity pattern of A, no pivoting.

    Returns ``(L, U)`` as COO with unit-diagonal L (diagonal stored).
    Suitable for the diagonally-dominant / SPD test matrices; use
    ``spilu_lu`` for matrices that need pivoting.
    """
    A = coo_to_scipy(a).tocsr().astype(np.float64)
    n = A.shape[0]
    from .. import native
    if native.available():
        import scipy.sparse as sp

        lu_vals = native.ilu0_values(A.indptr, A.indices, A.data)
        LU = sp.csr_matrix((lu_vals, A.indices, A.indptr), shape=(n, n))
        L = sp.tril(LU, k=-1) + sp.eye(n, format="csr")
        U = sp.triu(LU, k=0)
        return scipy_to_coo(L), scipy_to_coo(U)
    indptr, indices, data = A.indptr, A.indices, A.data.copy()
    # column-position lookup per row for O(1) pattern membership
    pos = [dict(zip(indices[indptr[i]:indptr[i + 1]],
                    range(indptr[i], indptr[i + 1]))) for i in range(n)]
    for i in range(n):
        row_i = pos[i]
        for jp in range(indptr[i], indptr[i + 1]):
            j = indices[jp]
            if j >= i:
                continue
            # L factor: a_ij / u_jj
            jj = pos[j].get(j)
            if jj is None or data[jj] == 0.0:
                raise ZeroDivisionError(f"zero pivot at row {j} in ILU(0)")
            lij = data[jp] / data[jj]
            data[jp] = lij
            # eliminate: a_ik -= l_ij * u_jk for k > j, k in pattern(i)
            for kp in range(indptr[j], indptr[j + 1]):
                k = indices[kp]
                if k <= j:
                    continue
                ip = row_i.get(k)
                if ip is not None:
                    data[ip] -= lij * data[kp]
    import scipy.sparse as sp

    LU = sp.csr_matrix((data, indices, indptr), shape=(n, n))
    L = sp.tril(LU, k=-1) + sp.eye(n, format="csr")
    U = sp.triu(LU, k=0)
    return scipy_to_coo(L), scipy_to_coo(U)


def spilu_lu(a: COO, **spilu_kwargs):
    """scipy ``spilu`` factorization → (L, U) as COO.

    Parity with reference GFlowNet100.py:126,137-138: ``L = tril(ilu.L)``,
    ``U = triu(ilu.U)`` (no-ops on SuperLU's triangular factors, kept for
    fidelity).  Note SuperLU permutes rows/columns; like the reference, the
    permutation is dropped — the *pattern* is what matters here.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = coo_to_scipy(a).tocsc()
    ilu = spla.spilu(A, **spilu_kwargs)
    L = sp.tril(ilu.L.tocsr(), format="csr")
    U = sp.triu(ilu.U.tocsr(), format="csr")
    return scipy_to_coo(L), scipy_to_coo(U)


def seed_pattern(a: COO, method: str = "ilu0", dtype=jnp.float32, **kwargs) -> COO:
    """Initial preconditioner matrix M0 = L @ U (sparse product), the matrix
    whose nnz set becomes the GFlowNet action space (reference
    GFlowNet100.py:141-153 builds exactly this as ``initial_matrix``)."""
    if method == "ilu0":
        L, U = ilu0(a)
    elif method == "spilu":
        L, U = spilu_lu(a, **kwargs)
    elif method == "pattern":  # A's own pattern as fallback (on-TPU friendly)
        return COO(row=a.row, col=a.col, data=a.data.astype(dtype), shape=a.shape)
    elif method == "spai":
        # principled variant (docs/ROADMAP.md #8): seed with the classic-SPAI
        # approximate INVERSE min ‖A·M − I‖_F, so thinning trades genuine
        # preconditioner quality against cost.  The reference thins LU ≈ A
        # itself (GFlowNet100.py:137-153), which scores ‖M·A − I‖ of a
        # matrix that approximates A, not A⁻¹ — measurably bad on
        # unstructured SPD problems (see validate on bcsstk03).
        from ..solvers.spai_classic import spai_classic

        m0 = spai_classic(a, k=kwargs.get("k", 1), dtype=dtype)
        return m0
    else:
        raise ValueError(f"unknown seed method {method!r}")
    LU = coo_to_scipy(L) @ coo_to_scipy(U)
    seed = scipy_to_coo(LU.tocoo())
    # reference stores the initial matrix float32 (GFlowNet100.py:149)
    return COO(row=seed.row, col=seed.col, data=seed.data.astype(dtype), shape=seed.shape)
