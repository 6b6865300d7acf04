"""Classic SPAI: per-column least-squares optimality vs dense NumPy oracle,
and preconditioning quality (CG/GMRES iteration reduction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_scipy
from gflownet_spai_tpu.solvers.spai_classic import SpaiPlan, power_pattern, spai_classic
from gflownet_spai_tpu.solvers import cg, gmres
from gflownet_spai_tpu.sparse.ops import spmv
from functools import partial


def _dense_spai_oracle(A, P):
    """Column-by-column dense least squares on pattern P (NumPy)."""
    n = A.shape[0]
    M = np.zeros((n, n))
    for j in range(n):
        J = np.nonzero(P[:, j])[0]
        if len(J) == 0:
            continue
        I = np.nonzero((np.abs(A[:, J]).sum(axis=1)) > 0)[0]
        e = (I == j).astype(np.float64)
        m, *_ = np.linalg.lstsq(A[np.ix_(I, J)], e, rcond=None)
        M[J, j] = m
    return M


@pytest.mark.parametrize("name,k", [("LF10_like", 1), ("olm500_like", 1), ("LF10_like", 2)])
def test_spai_matches_dense_oracle(name, k):
    a = gallery.get(name)
    A = coo_to_scipy(a).toarray()
    pat = power_pattern(a, k)
    P = np.asarray(pat.todense()) != 0
    m = SpaiPlan(a, pat, dtype=jnp.float64).solve()
    M = np.asarray(m.todense())
    want = _dense_spai_oracle(A, P)
    np.testing.assert_allclose(M, want, atol=1e-8)


def test_spai_reduces_frobenius_residual():
    a = gallery.get("poisson32")
    A = coo_to_scipy(a).toarray()
    n = A.shape[0]
    m = spai_classic(a, k=1, dtype=jnp.float64)
    M = np.asarray(m.todense())
    base = np.linalg.norm(A - np.eye(n), "fro")  # M = I baseline
    got = np.linalg.norm(A @ M - np.eye(n), "fro")
    assert got < 0.5 * base
    # richer pattern is at least as good
    m2 = spai_classic(a, k=2, dtype=jnp.float64)
    got2 = np.linalg.norm(A @ np.asarray(m2.todense()) - np.eye(n), "fro")
    assert got2 <= got + 1e-8


def test_spai_preconditioner_cuts_iterations():
    a = gallery.get("poisson32")
    n = a.shape[0]
    b = jnp.ones((n,), jnp.float64)
    plain = gmres(partial(spmv, a), b, restart=30, maxiter=3000, rtol=1e-8)
    m = spai_classic(a, k=2, dtype=jnp.float64)
    pre = gmres(partial(spmv, a), b, m_op=partial(spmv, m), restart=30,
                maxiter=3000, rtol=1e-8)
    assert pre.converged
    assert int(pre.iterations) < int(plain.iterations), (
        int(pre.iterations), int(plain.iterations)
    )


def test_power_pattern_growth():
    a = gallery.get("poisson32")
    p1 = power_pattern(a, 1)
    p2 = power_pattern(a, 2)
    assert p2.nnz > p1.nnz
    # A^1 pattern == pattern of A
    assert p1.nnz == a.nnz


def test_power_pattern_max_nnz_per_col():
    a = gallery.get("poisson32")
    p = power_pattern(a, 2, max_nnz_per_col=5)
    import numpy as np
    counts = np.bincount(np.asarray(p.col), minlength=1024)
    assert counts.max() <= 5
    # diagonal (largest weight) must survive the truncation
    dense = np.asarray(p.todense())
    assert (np.diag(dense) != 0).all()
