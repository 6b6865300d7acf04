"""Native C++ host library vs the pure-Python fallbacks."""

import numpy as np
import pytest

import jax.numpy as jnp

from gflownet_spai_tpu import native, sparse
from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_scipy


@pytest.fixture(scope="session", autouse=True)
def ensure_built():
    if not native.available():
        assert native.build(), "g++ build of native/gfnspai.cpp failed"


def test_native_mtx_parser_matches_python(tmp_path):
    coo = gallery.get("poisson32")
    path = tmp_path / "p.mtx"
    sparse.write_mtx(path, coo)
    nr, nc, rows, cols, vals = native.parse_mtx(path)
    assert (nr, nc) == coo.shape
    np.testing.assert_array_equal(rows, np.asarray(coo.row))
    np.testing.assert_array_equal(cols, np.asarray(coo.col))
    np.testing.assert_allclose(vals, np.asarray(coo.data))


def test_native_parser_symmetric(tmp_path):
    path = tmp_path / "s.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n3 2 -1.0\n3 3 2.0\n")
    got = np.asarray(sparse.read_mtx(path).todense())
    import scipy.io
    np.testing.assert_allclose(got, scipy.io.mmread(str(path)).toarray())


def test_native_parser_pattern_field(tmp_path):
    path = tmp_path / "pat.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 2\n1 1\n2 2\n")
    got = np.asarray(sparse.read_mtx(path).todense())
    np.testing.assert_allclose(got, np.eye(2))


def test_native_ilu0_matches_python():
    from gflownet_spai_tpu.env.ilu import ilu0

    a = gallery.get("poisson32")
    # python fallback path, forced
    A = coo_to_scipy(a).tocsr()
    lu_native = native.ilu0_values(A.indptr.astype(np.int64),
                                   A.indices.astype(np.int64), A.data)
    # oracle property: (A - L·U) vanishes on pattern(A)
    import scipy.sparse as sp
    n = A.shape[0]
    LU = sp.csr_matrix((lu_native, A.indices, A.indptr), shape=(n, n))
    L = sp.tril(LU, k=-1) + sp.eye(n, format="csr")
    U = sp.triu(LU, k=0)
    diff = (A - L @ U).toarray()
    np.testing.assert_allclose(diff[A.toarray() != 0], 0.0, atol=1e-10)


def test_native_ilu0_zero_pivot():
    import scipy.sparse as sp
    A = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 1.0]]))
    A.eliminate_zeros()
    with pytest.raises(ZeroDivisionError):
        native.ilu0_values(A.indptr.astype(np.int64),
                           A.indices.astype(np.int64), A.data)


def test_native_rcm_quality():
    from gflownet_spai_tpu.ops.rcm import bandwidth, permute
    from gflownet_spai_tpu.sparse.types import COO

    rng = np.random.default_rng(0)
    base = coo_to_scipy(gallery.get("olm500_like")).toarray()[:200, :200]
    p = rng.permutation(200)
    coo = COO.fromdense(base[np.ix_(p, p)])
    G = coo_to_scipy(coo)
    G = (abs(G) + abs(G).T).tocsr()
    perm = native.rcm(G.indptr.astype(np.int64), G.indices.astype(np.int64))
    assert sorted(perm) == list(range(200))
    assert bandwidth(permute(coo, perm)) <= 5


def test_native_spgemm_plan_matches_python():
    from gflownet_spai_tpu.sparse.ops import SpGEMMPlan, spgemm

    a = gallery.get("LF10_like")
    A = coo_to_scipy(a)
    got = spgemm(a, a)   # uses native plan when available
    np.testing.assert_allclose(
        np.asarray(got.todense()), (A @ A).toarray(), rtol=1e-9, atol=1e-12
    )
    plan = SpGEMMPlan(a, a)
    # pair_out sorted ascending (required by segment_sum indices_are_sorted)
    po = np.asarray(plan.pair_out)
    assert (np.diff(po) >= 0).all()


def test_parser_skew_symmetric_both_paths(tmp_path):
    """Skew-symmetric coordinate files mirror off-diagonals with -v
    (native parser and the Python fallback, both vs scipy's reader)."""
    import scipy.io

    path = tmp_path / "skew.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        f.write("% a comment line\n")
        f.write("4 4 3\n2 1 1.5\n3 1 -2.0\n4 3 0.25\n")
    want = scipy.io.mmread(str(path)).toarray()
    got_native = np.asarray(sparse.read_mtx(path).todense())
    np.testing.assert_allclose(got_native, want)
    # force the Python fallback by gzipping (read_mtx routes .gz to Python)
    import gzip, shutil

    gzpath = tmp_path / "skew.mtx.gz"
    with open(path, "rb") as src, gzip.open(gzpath, "wb") as dst:
        shutil.copyfileobj(src, dst)
    got_py = np.asarray(sparse.read_mtx(gzpath).todense())
    np.testing.assert_allclose(got_py, want)


def test_parser_suitesparse_quirks(tmp_path):
    """Real SuiteSparse files carry quirks the writer never produces:
    multiple %-comment lines, Fortran-style exponents, integer field,
    unsorted entries.  Both parser paths must agree with scipy."""
    import scipy.io

    path = tmp_path / "quirky.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("%-------------------------------------------\n")
        f.write("% name: test/quirky   id: 0\n")
        f.write("%-------------------------------------------\n")
        f.write("3 3 5\n")
        f.write("3 3 4.0e+00\n1 1 1.0E-01\n2 2 -3.25e2\n3 1 2\n1 3 -7.5e-03\n")
    want = scipy.io.mmread(str(path)).toarray()
    np.testing.assert_allclose(np.asarray(sparse.read_mtx(path).todense()), want)
    import gzip, shutil

    gzpath = tmp_path / "quirky.mtx.gz"
    with open(path, "rb") as src, gzip.open(gzpath, "wb") as dst:
        shutil.copyfileobj(src, dst)
    np.testing.assert_allclose(np.asarray(sparse.read_mtx(gzpath).todense()), want)

    ipath = tmp_path / "int.mtx"
    with open(ipath, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer symmetric\n")
        f.write("3 3 4\n1 1 2\n2 1 -1\n3 2 -1\n3 3 2\n")
    want = scipy.io.mmread(str(ipath)).toarray()
    np.testing.assert_allclose(np.asarray(sparse.read_mtx(ipath).todense()), want)
