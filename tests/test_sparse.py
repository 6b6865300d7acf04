"""Sparse containers, conversions, IO, and reference ops vs scipy/NumPy oracles."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from gflownet_spai_tpu import sparse
from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_csr, csr_to_bsr, csr_to_ell, coo_to_scipy
from gflownet_spai_tpu.sparse.ops import SpGEMMPlan, spgemm, spmm, spmv, frobenius_sq_minus_identity


def _rand_coo(m, n, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="coo")
    return sparse.scipy_to_coo(a), a.tocsr()


@pytest.fixture(params=["LF10_like", "olm500_like", "poisson32"])
def mat(request):
    coo = gallery.get(request.param)
    return coo, coo_to_scipy(coo)


def test_coo_dense_roundtrip():
    coo, a = _rand_coo(37, 53, seed=1)
    np.testing.assert_allclose(np.asarray(coo.todense()), a.toarray())
    back = sparse.COO.fromdense(a.toarray())
    np.testing.assert_allclose(np.asarray(back.todense()), a.toarray())


def test_conversions_match_dense(mat):
    coo, a = mat
    dense = a.toarray()
    csr = coo_to_csr(coo, canonical=True)
    np.testing.assert_allclose(np.asarray(csr.todense()), dense)
    ell = csr_to_ell(csr)
    np.testing.assert_allclose(np.asarray(ell.todense()), dense)
    ell128 = csr_to_ell(csr, pad_multiple=128)
    assert ell128.width % 128 == 0
    np.testing.assert_allclose(np.asarray(ell128.todense()), dense)


def test_bsr_conversion():
    coo, a = _rand_coo(64, 256, density=0.05, seed=2)
    csr = coo_to_csr(coo, canonical=True)
    bsr = csr_to_bsr(csr, blockshape=(8, 128))
    np.testing.assert_allclose(np.asarray(bsr.todense()), a.toarray())


def test_spmv_all_formats(mat):
    coo, a = mat
    n = coo.shape[1]
    x = np.random.default_rng(0).standard_normal(n)
    want = a @ x
    csr = coo_to_csr(coo, canonical=True)
    np.testing.assert_allclose(np.asarray(spmv(coo, jnp.asarray(x))), want, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(spmv(csr, jnp.asarray(x))), want, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(spmv(csr_to_ell(csr), jnp.asarray(x))), want, rtol=1e-10
    )


def test_spmv_bsr():
    coo, a = _rand_coo(64, 128, density=0.05, seed=3)
    x = np.random.default_rng(1).standard_normal(128)
    bsr = csr_to_bsr(coo_to_csr(coo, canonical=True), blockshape=(8, 128))
    np.testing.assert_allclose(np.asarray(spmv(bsr, jnp.asarray(x))), a @ x, rtol=1e-10)


def test_spmm(mat):
    coo, a = mat
    b = np.random.default_rng(2).standard_normal((coo.shape[1], 7))
    want = a @ b
    csr = coo_to_csr(coo, canonical=True)
    np.testing.assert_allclose(np.asarray(spmm(coo, jnp.asarray(b))), want, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(spmm(csr_to_ell(csr), jnp.asarray(b))), want, rtol=1e-10
    )


def test_spgemm_fixed_pattern(mat):
    coo, a = mat
    want = (a @ a).toarray()
    got = spgemm(coo, coo)
    np.testing.assert_allclose(np.asarray(got.todense()), want, rtol=1e-9, atol=1e-12)
    # numeric re-run with scaled values on the same plan
    plan = SpGEMMPlan(coo, coo)
    vals2 = plan.numeric(coo.data * 2.0, coo.data)
    np.testing.assert_allclose(
        np.asarray(plan.out_coo(vals2).todense()), 2.0 * want, rtol=1e-9, atol=1e-12
    )


def test_spgemm_rectangular():
    x, xs = _rand_coo(23, 41, density=0.15, seed=5)
    y, ys = _rand_coo(41, 17, density=0.2, seed=6)
    got = spgemm(x, y)
    np.testing.assert_allclose(
        np.asarray(got.todense()), (xs @ ys).toarray(), rtol=1e-9, atol=1e-12
    )


def test_frobenius_minus_identity(mat):
    coo, a = mat
    n = coo.shape[0]
    c = spgemm(coo, coo)
    want = np.linalg.norm((a @ a).toarray() - np.eye(n), "fro") ** 2
    got = frobenius_sq_minus_identity(c.row, c.col, c.data, n)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_mtx_roundtrip(tmp_path, mat):
    coo, a = mat
    path = tmp_path / "m.mtx"
    sparse.write_mtx(path, coo)
    back = sparse.read_mtx(path)
    np.testing.assert_allclose(np.asarray(back.todense()), a.toarray(), rtol=1e-12)
    # scipy agrees with our parser
    import scipy.io
    sci = scipy.io.mmread(str(path)).toarray()
    np.testing.assert_allclose(np.asarray(back.todense()), sci, rtol=1e-12)


def test_mtx_symmetric(tmp_path):
    path = tmp_path / "s.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n3 2 -1.0\n3 3 2.0\n")
    got = np.asarray(sparse.read_mtx(path).todense())
    import scipy.io
    want = scipy.io.mmread(str(path)).toarray()
    np.testing.assert_allclose(got, want)


def test_gallery_spd():
    for name in ("LF10_like", "bcsstk03_like", "poisson32"):
        a = coo_to_scipy(gallery.get(name)).toarray()
        np.testing.assert_allclose(a, a.T, err_msg=name)
        w = np.linalg.eigvalsh(a)
        assert w.min() > 0, f"{name} not SPD"


def test_gallery_olm_nonsymmetric():
    a = coo_to_scipy(gallery.get("olm500_like")).toarray()
    assert not np.allclose(a, a.T)


# ---------------------------------------------------------------------------
# utility surface (reference gflownet/utils.py parity)
# ---------------------------------------------------------------------------

def test_flatten_unflatten_roundtrip():
    from gflownet_spai_tpu.sparse.utils import flatten_coo, unflatten_coo
    coo = gallery.get("LF10_like")
    flat = flatten_coo(coo)
    assert flat.shape == (1, 18 * 18)
    back = unflatten_coo(flat, (18, 18))
    np.testing.assert_allclose(
        np.asarray(back.todense()), np.asarray(coo.todense())
    )
    with pytest.raises(ValueError, match="unflatten"):
        unflatten_coo(flat, (17, 18))


def test_sparse_one_hot():
    from gflownet_spai_tpu.sparse.utils import sparse_one_hot
    oh = sparse_one_hot(jnp.asarray([2, 0, 1]), 4)
    want = np.zeros((3, 4)); want[0, 2] = want[1, 0] = want[2, 1] = 1
    np.testing.assert_allclose(np.asarray(oh.todense()), want)


def test_concat_coo():
    from gflownet_spai_tpu.sparse.utils import concat_coo
    a, As = _rand_coo(5, 7, seed=10)
    b, Bs = _rand_coo(3, 7, seed=11)
    v = concat_coo([a, b], axis=0)
    np.testing.assert_allclose(
        np.asarray(v.todense()), np.vstack([As.toarray(), Bs.toarray()])
    )
    c, Cs = _rand_coo(5, 2, seed=12)
    h = concat_coo([a, c], axis=1)
    np.testing.assert_allclose(
        np.asarray(h.todense()), np.hstack([As.toarray(), Cs.toarray()])
    )
    with pytest.raises(ValueError, match="must match"):
        concat_coo([a, b], axis=1)


def test_delete_edges_flat():
    from gflownet_spai_tpu.sparse.utils import delete_edges_flat
    coo = gallery.get("LF10_like")
    flat = delete_edges_flat(coo, jnp.asarray([0, 5, -1], jnp.int32))
    dense = np.asarray(flat.todense()).reshape(18, 18)
    orig = np.asarray(coo.todense())
    r, c = np.asarray(coo.row), np.asarray(coo.col)
    want = orig.copy()
    want[r[0], c[0]] = 0.0
    want[r[5], c[5]] = 0.0
    np.testing.assert_allclose(dense, want)


def test_gallery_parametric_names():
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("poisson128")
    assert a.shape == (128 * 128, 128 * 128)
    b = gallery.get("convdiff300")
    assert b.shape == (300, 300)
    import pytest

    with pytest.raises(KeyError):
        gallery.get("nosuchmatrix")


def test_rowblock_numeric_matches_dense_product():
    """rowblock.numeric values (row-major C order) equal the dense M·A on
    the symbolic pattern; unsorted seed COO is rejected."""
    import jax
    import scipy.sparse as sp
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import random_spd
    from gflownet_spai_tpu.sparse.types import COO

    a = random_spd(60, density=0.06, seed=7)
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32), shape=a.shape)
    plan = RB.build_rowblock_plan(a, a)
    got = np.asarray(RB.numeric(plan, a.data))
    A = coo_to_scipy(a).toarray()
    C = A @ A
    want = C[np.asarray(plan.out_row), np.asarray(plan.out_col)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # residual matches the dense Frobenius form
    r2 = float(RB.residual_sq_batch(plan, a.data[None, :])[0])
    want_r2 = np.linalg.norm(C - np.eye(60), "fro") ** 2
    np.testing.assert_allclose(r2, want_r2, rtol=1e-4)

    bad = COO(row=a.col, col=a.row, data=a.data, shape=a.shape)  # col-major
    with pytest.raises(ValueError, match="row-major"):
        RB.build_rowblock_plan(bad, a)


def test_rowblock_overflow_routing_matches_dense():
    """Tiny caps force every row through the gather overflow sub-plan; the
    residual and numeric values must not change (guards the ILU-fill case
    where single wide rows would dense-pad to TiB)."""
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import random_spd
    from gflownet_spai_tpu.sparse.types import COO

    a = random_spd(60, density=0.06, seed=7)
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32), shape=a.shape)
    ref = RB.build_rowblock_plan(a, a)
    assert ref.n_overflow_slots == 0
    ov = RB.build_rowblock_plan(a, a, max_block_slots=16)   # everything spills
    assert ov.n_overflow_slots == ov.out_nnz and not ov.gvals
    mixed = RB.build_rowblock_plan(a, a, max_block_slots=128)  # some spill
    assert 0 < mixed.n_overflow_slots < mixed.out_nnz
    rng = np.random.default_rng(3)
    mv = (np.asarray(a.data) * (rng.random(a.nnz) > 0.3)).astype(np.float32)
    want_r = float(RB.residual_sq_batch(ref, jnp.asarray(mv)[None])[0])
    want_c = np.asarray(RB.numeric(ref, jnp.asarray(mv)))
    for plan in (ov, mixed):
        got_r = float(RB.residual_sq_batch(plan, jnp.asarray(mv)[None])[0])
        np.testing.assert_allclose(got_r, want_r, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(RB.numeric(plan, jnp.asarray(mv))),
                                   want_c, rtol=1e-4, atol=1e-5)


def test_rowblock_bf16_storage_accumulates_f32():
    """gemm_dtype=bfloat16 plans: G reads at half traffic, residuals within
    bf16 input noise of the f32 plan (f32 MXU accumulation — the einsum
    output dtype must NOT be bf16)."""
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import random_spd
    from gflownet_spai_tpu.sparse.types import COO

    a = random_spd(60, density=0.06, seed=9)
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32),
            shape=a.shape)
    plan32 = RB.build_rowblock_plan(a, a)
    plan16 = RB.build_rowblock_plan(a, a, gemm_dtype=jnp.bfloat16)
    assert plan16.gvals[0].dtype == jnp.bfloat16
    m = jnp.stack([a.data, a.data * 0.5])
    r32 = np.asarray(RB.residual_sq_batch(plan32, m))
    r16 = np.asarray(RB.residual_sq_batch(plan16, m))
    assert r16.dtype == np.float32
    np.testing.assert_allclose(r16, r32, rtol=2e-2)
    # make_env knob plumbs through
    from gflownet_spai_tpu.env.spai import make_env
    env = make_env(a, original=a, reward_path="rowblock",
                   rowblock_dtype=jnp.bfloat16)
    assert env.rb.gvals[0].dtype == jnp.bfloat16


def test_rowblock_layout_and_class_step_equivalence():
    """The "mc" (batch-in-sublanes) G-block layout and the finer ×1.25
    class ladder produce the same residuals/numeric values as the default
    plan — and the finer ladder strictly reduces padded slots."""
    import numpy as np
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import get

    a = get("orsirr_like32")
    ref = RB.build_rowblock_plan(a, a)
    rng = np.random.default_rng(5)
    m_vals = jnp.asarray(rng.random((4, a.nnz)), jnp.float32)
    want = RB.residual_norm_batch(ref, m_vals)
    want_c = RB.numeric(ref, m_vals[0])

    for kw in ({"layout": "mc"}, {"class_step": 1.25},
               {"layout": "mc", "class_step": 1.25}):
        plan = RB.build_rowblock_plan(a, a, **kw)
        got = RB.residual_norm_batch(plan, m_vals)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, err_msg=str(kw))
        np.testing.assert_allclose(np.asarray(RB.numeric(plan, m_vals[0])),
                                   np.asarray(want_c), rtol=1e-5,
                                   atol=1e-6, err_msg=str(kw))

    fine = RB.build_rowblock_plan(a, a, class_step=1.25)
    assert fine.padded_slots <= ref.padded_slots
    with pytest.raises(ValueError, match="layout"):
        RB.build_rowblock_plan(a, a, layout="zz")


def test_rowblock_mc_layout_shards_over_rows():
    """The dp residual provider handles an "mc"-layout plan (bucket rows
    sharded over the mesh rows axis) identically to single-device."""
    import dataclasses
    import numpy as np
    from gflownet_spai_tpu.env import make_env
    from gflownet_spai_tpu.parallel import make_mesh
    from gflownet_spai_tpu.parallel.dp import sharded_rowblock_residual_norms
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import get

    a = get("orsirr_like32")
    env = make_env(a, original=a, reward_path="rowblock")
    env = dataclasses.replace(
        env, rb=RB.build_rowblock_plan(a, a, layout="mc", class_step=1.25))
    mesh = make_mesh(dp=1, rows=8)
    rng = np.random.default_rng(6)
    m_vals = jnp.asarray(rng.random((3, a.nnz)), jnp.float32)
    got = sharded_rowblock_residual_norms(mesh, env, m_vals)
    want = RB.residual_norm_batch(env.rb, m_vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_rowblock_gram_compression_matches_exact():
    """compress="gram" (quadratic-form residual) matches the explicit
    product to ~f32-cancellation precision, single-device and rows-sharded,
    and numeric() honestly refuses."""
    import dataclasses
    import numpy as np
    from gflownet_spai_tpu.env import make_env
    from gflownet_spai_tpu.parallel import make_mesh
    from gflownet_spai_tpu.parallel.dp import sharded_rowblock_residual_norms
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import get

    a = get("orsirr_like32")
    ref = RB.build_rowblock_plan(a, a)
    gram = RB.build_rowblock_plan(a, a, compress="gram")
    # gram blocks are [R, mp, mp]: strictly smaller than [R, cp, mp]
    assert gram.padded_slots < ref.padded_slots
    rng = np.random.default_rng(9)
    m_vals = jnp.asarray(rng.random((4, a.nnz)), jnp.float32)
    want = RB.residual_norm_batch(ref, m_vals)
    got = RB.residual_norm_batch(gram, m_vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3)

    env = make_env(a, original=a, reward_path="rowblock",
                   rowblock_compress="gram")
    mesh = make_mesh(dp=1, rows=8)
    got_sh = sharded_rowblock_residual_norms(mesh, env, m_vals)
    np.testing.assert_allclose(np.asarray(got_sh), np.asarray(want),
                               rtol=2e-3)

    with pytest.raises(NotImplementedError, match="gram"):
        RB.numeric(gram, m_vals[0])
    with pytest.raises(ValueError, match="compress"):
        RB.build_rowblock_plan(a, a, compress="zz")


def test_rowblock_window_order_matches_sorted():
    """order="window" (gather-free reward): same residuals as the sorted
    plan once the keep mask follows the plan's edge permutation; the
    permutation is a bijection over edges; gram composes; the env
    integration (make_env) permutes its seed consistently."""
    import numpy as np
    from gflownet_spai_tpu.env import make_env
    from gflownet_spai_tpu.env.spai import batched_residual_norms
    from gflownet_spai_tpu.sparse import rowblock as RB
    from gflownet_spai_tpu.sparse.gallery import get

    a = get("orsirr_like32")
    ref = RB.build_rowblock_plan(a, a)
    win = RB.build_rowblock_plan(a, a, order="window")
    perm = np.asarray(win.edge_perm)
    assert sorted(perm.tolist()) == list(range(a.nnz))     # bijection
    assert win.win_off and len(win.win_off) == len(win.gvals)
    # window mode has ZERO m-axis padding
    assert sum(g.shape[0] * g.shape[2] for g in win.gvals) == sum(
        int((np.asarray(w) < a.nnz).sum()) for w in ref.win_idx)

    rng = np.random.default_rng(11)
    m_sorted = jnp.asarray(rng.random((4, a.nnz)), jnp.float32)
    want = RB.residual_norm_batch(ref, m_sorted)
    got = RB.residual_norm_batch(win, m_sorted[:, perm])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    wg = RB.build_rowblock_plan(a, a, order="window", compress="gram")
    got_g = RB.residual_norm_batch(wg, m_sorted[:, np.asarray(wg.edge_perm)])
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want),
                               rtol=2e-3)

    # env integration: the permuted seed's keep masks score identically
    env_s = make_env(a, original=a, reward_path="rowblock")
    env_w = make_env(a, original=a, reward_path="rowblock",
                     rowblock_order="window")
    keep = jnp.asarray(rng.random((3, a.nnz)) > 0.3)
    want_e = batched_residual_norms(env_s, keep)
    got_e = batched_residual_norms(env_w, keep[:, perm])
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=1e-5)
    # same edge SET under both enumerations
    k_old = np.asarray(env_s.seed.row) * a.shape[1] + np.asarray(env_s.seed.col)
    k_new = np.asarray(env_w.seed.row) * a.shape[1] + np.asarray(env_w.seed.col)
    assert set(k_old.tolist()) == set(k_new.tolist())


def test_gallery_hangglider_kkt_structure():
    """hangGlider3_like: symmetric INDEFINITE KKT stand-in at the real
    matrix's scale (reference GFlowNet_test.py:20-23; n=10,260 is the
    reference's gmres maxiter)."""
    a = gallery.get("hangGlider3_like")
    assert a.shape == (10259, 10259)
    As = coo_to_scipy(a).tocsr()
    assert abs(As - As.T).max() == 0           # symmetric
    # indefinite: the dual block carries the negative regularization, and
    # the saddle structure puts real negative eigenvalues well below it
    d = As.diagonal()
    assert d.min() < 0 < d.max()
    # block sizes: 4T primal + 3(T-1) dual
    T = 1466
    assert (d[:4 * T] > 0).all() and (d[4 * T:] < 0).all()
