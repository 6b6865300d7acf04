"""DIA/BELL formats, RCM, and kernel jnp paths vs oracles (CPU).

The Pallas TPU paths are exercised by ``tests/tpu/test_kernels_tpu.py``
(run on the real chip) and by bench.py; on CPU the same public entry
points dispatch to the jnp implementations tested here.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_csr, coo_to_scipy
from gflownet_spai_tpu.ops import (
    BELL,
    bandwidth,
    coo_to_dia,
    csr_to_bell,
    dia_to_coo,
    dia_transpose,
    n_diagonals,
    permute,
    rcm_permutation,
    rcm_reorder,
    spmm_bell,
    spmv_dia,
)


@pytest.fixture(params=["LF10_like", "olm500_like", "poisson32"])
def mat(request):
    coo = gallery.get(request.param)
    return coo, coo_to_scipy(coo)


def test_dia_roundtrip(mat):
    coo, A = mat
    d = coo_to_dia(coo)
    np.testing.assert_allclose(np.asarray(d.todense()), A.toarray())
    back = dia_to_coo(d)
    np.testing.assert_allclose(np.asarray(back.todense()), A.toarray())


def test_dia_spmv_matches_scipy(mat):
    coo, A = mat
    d = coo_to_dia(coo)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(coo.shape[1]))
    y = spmv_dia(d, x)
    np.testing.assert_allclose(np.asarray(y), A @ np.asarray(x), rtol=1e-10)


def test_dia_transpose(mat):
    coo, A = mat
    d = coo_to_dia(coo)
    dt = dia_transpose(d)
    np.testing.assert_allclose(np.asarray(dt.todense()), A.T.toarray())


def test_dia_spmv_grad():
    coo = gallery.get("LF10_like")
    d = coo_to_dia(coo)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(18))

    def f(data, x):
        import dataclasses
        d2 = dataclasses.replace(d, data=data)
        return jnp.sum(spmv_dia(d2, x) ** 2)

    g_data, g_x = jax.grad(f, argnums=(0, 1))(d.data, x)
    # finite-difference check on x
    eps = 1e-6
    f0 = float(f(d.data, x))
    e0 = jnp.zeros_like(x).at[3].set(eps)
    fd = (float(f(d.data, x + e0)) - f0) / eps
    np.testing.assert_allclose(float(g_x[3]), fd, rtol=1e-3)
    # and on data
    ed = jnp.zeros_like(d.data).at[0, 5].set(eps)
    fd2 = (float(f(d.data + ed, x)) - f0) / eps
    np.testing.assert_allclose(float(g_data[0, 5]), fd2, rtol=1e-3, atol=1e-6)


def test_dia_max_diags_guard():
    rng = np.random.default_rng(2)
    dense = rng.standard_normal((64, 64)) * (rng.random((64, 64)) < 0.3)
    from gflownet_spai_tpu.sparse.types import COO
    coo = COO.fromdense(dense)
    with pytest.raises(ValueError, match="diagonals"):
        coo_to_dia(coo, max_diags=10)


# ---------------------------------------------------------------------------
# RCM
# ---------------------------------------------------------------------------

def test_rcm_reduces_bandwidth():
    rng = np.random.default_rng(3)
    n = 200
    # a banded matrix scrambled by a random permutation
    base = coo_to_scipy(gallery.get("olm500_like")).toarray()[:n, :n]
    p = rng.permutation(n)
    scrambled = base[np.ix_(p, p)]
    from gflownet_spai_tpu.sparse.types import COO
    coo = COO.fromdense(scrambled)
    bw0 = bandwidth(coo)
    reordered, perm = rcm_reorder(coo)
    bw1 = bandwidth(reordered)
    assert bw1 < bw0
    assert bw1 <= 5  # olm band is 1; RCM should nearly recover it
    assert n_diagonals(reordered) < n_diagonals(coo)


def test_rcm_vs_scipy():
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    coo = gallery.get("poisson32")
    ours = rcm_permutation(coo)
    A = coo_to_scipy(coo)
    sci = np.asarray(reverse_cuthill_mckee(A.tocsr(), symmetric_mode=True))
    # permutations may differ; compare achieved bandwidth quality
    bw_ours = bandwidth(permute(coo, ours))
    bw_sci = bandwidth(permute(coo, sci.astype(np.int64)))
    assert bw_ours <= bw_sci * 1.5 + 2


def test_permute_preserves_spectrum():
    coo = gallery.get("LF10_like")
    reordered, perm = rcm_reorder(coo)
    w0 = np.sort(np.linalg.eigvalsh(np.asarray(coo.todense())))
    w1 = np.sort(np.linalg.eigvalsh(np.asarray(reordered.todense())))
    np.testing.assert_allclose(w0, w1, rtol=1e-9)


# ---------------------------------------------------------------------------
# BELL
# ---------------------------------------------------------------------------

def test_bell_roundtrip_and_spmm():
    rng = np.random.default_rng(4)
    A = sp.random(128, 256, density=0.05, random_state=rng, format="coo")
    from gflownet_spai_tpu.sparse import scipy_to_coo
    csr = coo_to_csr(scipy_to_cooA := scipy_to_coo(A), canonical=True)
    bell = csr_to_bell(csr, blockshape=(8, 128))
    np.testing.assert_allclose(np.asarray(bell.todense()), A.toarray(), rtol=1e-10)
    x = rng.standard_normal((256, 16))
    y = spmm_bell(bell, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-8)


def test_spmm_dia_matches_scipy(mat):
    from gflownet_spai_tpu.ops.dia import spmm_dia
    coo, A = mat
    d = coo_to_dia(coo)
    x = np.random.default_rng(7).standard_normal((coo.shape[1], 6))
    y = spmm_dia(d, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-10)


def test_dia_no_center_diagonal():
    """Strictly-triangular matrix: no zero offset in the DIA set."""
    from gflownet_spai_tpu.sparse.types import COO
    dense = np.triu(np.random.default_rng(8).standard_normal((20, 20)), 1)
    dense[np.abs(dense) < 1.2] = 0.0
    coo = COO.fromdense(dense)
    if coo.nnz == 0:
        pytest.skip("degenerate draw")
    d = coo_to_dia(coo)
    assert 0 not in d.offsets
    x = jnp.asarray(np.random.default_rng(9).standard_normal(20))
    np.testing.assert_allclose(np.asarray(spmv_dia(d, x)), dense @ np.asarray(x),
                               rtol=1e-10, atol=1e-12)


def test_dia_single_diagonal():
    from gflownet_spai_tpu.sparse.types import COO
    dense = np.diag(np.arange(1.0, 9.0))
    d = coo_to_dia(COO.fromdense(dense))
    assert d.offsets == (0,)
    x = jnp.arange(8.0)
    np.testing.assert_allclose(np.asarray(spmv_dia(d, x)), dense @ np.arange(8.0))


def test_halo_spmv_guard():
    from gflownet_spai_tpu.parallel import halo_spmv, make_mesh, partition_dia
    from gflownet_spai_tpu.ops.dia import DIA
    # bandwidth 5000 > shard size when split 8 ways at 8192 rows
    n = 8192
    data = np.zeros((2, n), np.float32); data[0, :] = 1.0; data[1, :n-5000] = 1.0
    d = partition_dia(DIA(data=jnp.asarray(data), offsets=(0, 5000),
                          shape=(n, n), nnz=2*n), 8)
    mesh = make_mesh(dp=1, rows=8)
    with pytest.raises(ValueError, match="halo"):
        halo_spmv(mesh, d, jnp.ones((d.n_pad,), jnp.float32))


def test_pallas_dia_kernels_interpret_mode():
    """Run the actual Pallas kernel bodies (interpret mode, CPU) against the
    jnp reference — validates kernel semantics without the chip."""
    from gflownet_spai_tpu.ops.dia import (
        _pad_x, _spmv_pallas, _spmv_pallas_stream, spmv_dia_jnp,
    )
    from gflownet_spai_tpu.ops.dia import DIA

    k = 64
    n = k * k
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, 4096), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    d = DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
            shape=(n, n), nnz=int((data != 0).sum()))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    want = np.asarray(spmv_dia_jnp(d, x))

    y_res = np.asarray(_spmv_pallas(d, _pad_x(d, x), interpret=True))[:n]
    np.testing.assert_allclose(y_res, want, rtol=2e-6, atol=1e-5)

    xu = jnp.pad(x, (0, d.n_pad - n))
    y_str = np.asarray(_spmv_pallas_stream(d, xu, interpret=True))[:n]
    np.testing.assert_allclose(y_str, want, rtol=2e-6, atol=1e-5)


def test_pallas_dia_stream2_interpret_mode():
    from gflownet_spai_tpu.ops.dia import DIA, _pad_x, _spmv_pallas_stream2, spmv_dia_jnp

    k = 64
    n = k * k
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, 4096), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    d = DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
            shape=(n, n), nnz=int((data != 0).sum()))
    x = jnp.asarray(np.random.default_rng(3).standard_normal(n), jnp.float32)
    want = np.asarray(spmv_dia_jnp(d, x))
    y = np.asarray(_spmv_pallas_stream2(d, _pad_x(d, x), interpret=True))[:n]
    np.testing.assert_allclose(y, want, rtol=2e-6, atol=1e-5)


def test_pallas_bell_interpret_mode():
    """Run the BELL MXU kernel body in interpret mode vs the jnp path."""
    from gflownet_spai_tpu.ops.bsr import _spmm_bell_pallas, spmm_bell_jnp
    rng = np.random.default_rng(5)
    A = sp.random(64, 256, density=0.08, random_state=rng, format="coo",
                  dtype=np.float32)
    from gflownet_spai_tpu.sparse import scipy_to_coo
    bell = csr_to_bell(coo_to_csr(scipy_to_coo(A), canonical=True),
                       blockshape=(8, 128))
    x = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    want = np.asarray(spmm_bell_jnp(bell, x))
    # patch interpret through pallas_call via monkey context: the helper has
    # no flag, so wrap with pltpu interpret mode
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_spmm_bell_pallas(bell, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_bell_resident_interpret_mode():
    """The X-resident BELL kernel (VMEM column tile, in-kernel W reduction)
    must match the jnp path; exercises multiple K tiles and dynamic-slice
    gathers."""
    from gflownet_spai_tpu.ops.bsr import (
        _resident_bk, _spmm_bell_pallas_resident, spmm_bell_jnp,
    )
    rng = np.random.default_rng(6)
    A = sp.random(64, 512, density=0.06, random_state=rng, format="coo",
                  dtype=np.float32)
    from gflownet_spai_tpu.sparse import scipy_to_coo
    bell = csr_to_bell(coo_to_csr(scipy_to_coo(A), canonical=True),
                       blockshape=(8, 128))
    x = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    bk = _resident_bk(bell, 256)
    assert bk == 256
    want = np.asarray(spmm_bell_jnp(bell, x))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_spmm_bell_pallas_resident(bell, x, 128))  # 2 K-tiles
        got1 = np.asarray(_spmm_bell_pallas_resident(bell, x, bk))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got1, want, rtol=1e-4, atol=1e-4)


def test_pallas_dia_spmm_interpret_mode():
    """Wide-K Pallas DIA SpMM (2-D windows, in-kernel DMAs) vs jnp path,
    multi-tile in both grid dims."""
    from gflownet_spai_tpu.ops import dia as dia_mod
    from gflownet_spai_tpu.ops.dia import DIA, _spmm_dia_pallas, spmm_dia_jnp

    k = 64
    n = k * k
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, 4096), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    d = DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
            shape=(n, n), nnz=int((data != 0).sum()))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4096, 256)), jnp.float32)
    want = np.asarray(spmm_dia_jnp(d, x))
    orig = dia_mod._MAX_VMEM_BYTES
    try:
        # force tr = 1024 → 4 row tiles × 2 K tiles
        dia_mod._MAX_VMEM_BYTES = (2 * (1024 + 2 * d.halo) * 128
                                   + 2 * 5 * 1024 + 2 * 1024 * 128 + 64) * 4
        got = np.asarray(_spmm_dia_pallas(d, x, interpret=True))[:n]
    finally:
        dia_mod._MAX_VMEM_BYTES = orig
    np.testing.assert_allclose(got, want[:n], rtol=1e-5, atol=1e-4)


def test_pallas_dia_spmm_t_interpret_mode():
    """Transposed-RHS Pallas DIA SpMM ([K, n] layout, contiguous window
    bursts) vs the jnp oracle, multi-tile in both grid dims."""
    from gflownet_spai_tpu.ops import dia as dia_mod
    from gflownet_spai_tpu.ops.dia import (
        DIA, _spmm_dia_t_pallas, dia_pad_xt, spmm_dia_t_jnp)

    k = 64
    n = k * k
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, 4096), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    d = DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
            shape=(n, n), nnz=int((data != 0).sum()))
    xt = jnp.asarray(
        np.random.default_rng(1).standard_normal((200, n)), jnp.float32)
    want = np.asarray(spmm_dia_t_jnp(d, xt))
    orig = dia_mod._MAX_VMEM_BYTES
    try:
        # shrink the budget so the grid is multi-tile in both dims: only
        # (kb=8, tr=2048) fits → 25 K-tiles × 2 lane tiles
        dia_mod._MAX_VMEM_BYTES = (dia_mod._spmm_t_need(d, 8, 2048) + 64) * 4
        kb, tr = dia_mod._spmm_t_tiles(d, 200)
        assert d.n_pad // tr >= 2, (kb, tr)
        xtp = dia_pad_xt(d, xt)
        assert xtp.shape[0] % kb == 0 and xtp.shape[0] // kb >= 2, (
            xtp.shape, kb)
        got = np.asarray(_spmm_dia_t_pallas(d, xtp, interpret=True))[:200, :n]
    finally:
        dia_mod._MAX_VMEM_BYTES = orig
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_spmm_dia_t_matches_spmm():
    """Transposed-RHS public entry equals the [n, K] path (CPU jnp route)."""
    from gflownet_spai_tpu.ops.dia import spmm_dia, spmm_dia_t

    rng = np.random.default_rng(7)
    n = 300
    a = sp.diags(
        [rng.standard_normal(n - 3), rng.standard_normal(n),
         rng.standard_normal(n - 2)], [-3, 0, 2], format="coo")
    from gflownet_spai_tpu.sparse.convert import scipy_to_coo
    d = coo_to_dia(scipy_to_coo(a))
    x = jnp.asarray(rng.standard_normal((n, 9)), jnp.float32)
    want = np.asarray(spmm_dia(d, x))
    got = np.asarray(spmm_dia_t(d, jnp.asarray(x).T)).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _poisson_dia(k, n_pad=None):
    import gflownet_spai_tpu.ops.dia as dia_mod
    n = k * k
    n_pad = n_pad or dia_mod._round_up(n, 1024)
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, n_pad), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    from gflownet_spai_tpu.ops.dia import DIA
    return DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
               shape=(n, n), nnz=int((data != 0).sum()))


def test_pallas_dia_spmv_io_interpret_mode():
    """Padded-IO SpMV kernels (resident + streamed): y comes back in the
    same [P + n_pad + P] layout with zeroed halo blocks, so a chain needs
    no repack.  Multi-interior-block grid (n_pad = 4·P), static scale."""
    from gflownet_spai_tpu.ops.dia import (
        _spmv_io_tile, _spmv_pallas_io, _spmv_pallas_io_stream, dia_pad_io,
        spmv_dia_jnp,
    )

    d = _poisson_dia(256)                      # n = n_pad = 65536
    tr = _spmv_io_tile(d)
    assert tr == 16384 and d.n_pad // tr == 4
    x = jnp.asarray(np.random.default_rng(5).standard_normal(d.n), jnp.float32)
    want = np.asarray(spmv_dia_jnp(d, x)) * 0.5
    xq = dia_pad_io(d, x)
    for fn in (_spmv_pallas_io, _spmv_pallas_io_stream):
        yq = np.asarray(fn(d, xq, scale=0.5, interpret=True))
        assert yq.shape == xq.shape
        np.testing.assert_allclose(yq[tr:tr + d.n], want, rtol=2e-6, atol=1e-5)
        assert not yq[:tr].any() and not yq[tr + d.n_pad:].any()


def test_spmv_dia_padded_io_jnp_path_chains():
    """CPU jnp fallback of the padded-IO API: chained applies equal repeated
    spmv_dia_jnp, halo blocks stay zero."""
    from gflownet_spai_tpu.ops.dia import dia_pad_io, spmv_dia_padded_io, spmv_dia_jnp

    d = _poisson_dia(16)
    x = jnp.asarray(np.random.default_rng(6).standard_normal(d.n), jnp.float32)
    xq = dia_pad_io(d, x)
    p = (xq.shape[0] - d.n_pad) // 2
    for _ in range(3):
        xq = spmv_dia_padded_io(d, xq, scale=0.2)
        x = spmv_dia_jnp(d, x) * 0.2
    np.testing.assert_allclose(np.asarray(xq[p:p + d.n]), np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    assert not np.asarray(xq[:p]).any()


def test_pallas_dia_spmv_pingpong_interpret_mode():
    """Ping-pong SpMV kernels (resident + streamed): y lands in the
    interior blocks of the aliased second buffer, halo blocks keep its
    (zero) contents, grid covers interior only."""
    from gflownet_spai_tpu.ops.dia import (
        _spmv_pallas_pp, _spmv_pallas_pp_stream, dia_pad_pp, dia_pp_tile,
        spmv_dia_jnp,
    )

    d = _poisson_dia(256)                      # n = n_pad = 65536
    tr = dia_pp_tile(d)
    assert tr and d.n_pad % tr == 0 and tr >= d.halo
    x = jnp.asarray(np.random.default_rng(7).standard_normal(d.n), jnp.float32)
    want = np.asarray(spmv_dia_jnp(d, x)) * 0.5
    xq = dia_pad_pp(d, x)
    yq0 = jnp.zeros_like(xq)
    for fn in (_spmv_pallas_pp, _spmv_pallas_pp_stream):
        yq = np.asarray(fn(d, xq, yq0, scale=0.5, interpret=True))
        assert yq.shape == xq.shape
        np.testing.assert_allclose(yq[tr:tr + d.n], want, rtol=2e-6, atol=1e-5)
        assert not yq[:tr].any() and not yq[tr + d.n_pad:].any()


def test_spmv_dia_pingpong_jnp_path_chains():
    """CPU jnp fallback of the ping-pong API: the (x, y)-swap chain equals
    repeated spmv_dia_jnp; both buffers' halo blocks stay zero."""
    from gflownet_spai_tpu.ops.dia import dia_pad_pp, spmv_dia_pingpong, spmv_dia_jnp

    d = _poisson_dia(16)
    x = jnp.asarray(np.random.default_rng(8).standard_normal(d.n), jnp.float32)
    xq = dia_pad_pp(d, x)
    yq = jnp.zeros_like(xq)
    p = (xq.shape[0] - d.n_pad) // 2
    for _ in range(3):
        yq = spmv_dia_pingpong(d, xq, yq, scale=0.2)
        xq, yq = yq, xq
        x = spmv_dia_jnp(d, x) * 0.2
    np.testing.assert_allclose(np.asarray(xq[p:p + d.n]), np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    assert not np.asarray(xq[:p]).any() and not np.asarray(yq[:p]).any()


@pytest.mark.parametrize("k", [2, 3, 4])
def test_pallas_dia_spmv_power_interpret_mode(k):
    """Fused k-step (temporally-blocked) SpMV: z = sᵏ·Aᵏ·x with one
    widened data window per tile; multi-block grid exercises the window
    overlap; halo blocks of the aliased buffer stay zero."""
    from gflownet_spai_tpu.ops import dia as D

    d = _poisson_dia(256)                      # n = n_pad = 65536
    rng = np.random.default_rng(9)
    orig = D.dia_pp_tile
    D.dia_pp_tile = lambda dd: 8192            # 8 blocks, tr = 8·halo
    try:
        x = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        from gflownet_spai_tpu.ops.dia import spmv_dia_jnp
        want = x
        for _ in range(k):
            want = spmv_dia_jnp(d, want) * 0.3
        want = np.asarray(want)
        xq = D.dia_pad_pp(d, x)
        zq = jnp.zeros_like(xq)
        dk = D.dia_power_data(d, k)
        z = np.asarray(D._spmv_pallas_power(d, dk, xq, zq, scale=0.3, k=k,
                                            interpret=True))
        tr = 8192
        np.testing.assert_allclose(z[tr:tr + d.n], want, rtol=3e-6, atol=1e-4)
        assert not z[:tr].any() and not z[tr + d.n_pad:].any()
        # jnp fallback (public entry on CPU) matches too
        zj = np.asarray(D.spmv_dia_power(d, dk, xq, zq, scale=0.3, k=k))
        np.testing.assert_allclose(zj[tr:tr + d.n], want, rtol=3e-6, atol=1e-4)
    finally:
        D.dia_pp_tile = orig


def test_pallas_dia_spmv_power_affine_interpret_mode():
    """Affine fused k-step kernel: each pass is cur ← s·A·cur + c (the
    weighted-Jacobi sweep shape); matches k explicit affine jnp passes."""
    from gflownet_spai_tpu.ops import dia as D

    k = 3
    d = _poisson_dia(256)
    rng = np.random.default_rng(10)
    orig = D.dia_pp_tile
    D.dia_pp_tile = lambda dd: 8192
    try:
        from gflownet_spai_tpu.ops.dia import spmv_dia_jnp
        x = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        c = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        want = x
        for _ in range(k):
            want = spmv_dia_jnp(d, want) * 0.3 + c
        want = np.asarray(want)
        xq = D.dia_pad_pp(d, x)
        cq = D.dia_pad_pp(d, c)
        zq = jnp.zeros_like(xq)
        dk = D.dia_power_data(d, k)
        tr = 8192
        z = np.asarray(D._spmv_pallas_power(d, dk, xq, zq, scale=0.3, k=k,
                                            cq=cq, interpret=True))
        np.testing.assert_allclose(z[tr:tr + d.n], want, rtol=3e-6, atol=1e-4)
        assert not z[:tr].any() and not z[tr + d.n_pad:].any()
        zj = np.asarray(D.spmv_dia_power(d, dk, xq, zq, scale=0.3, k=k,
                                         add=cq))
        np.testing.assert_allclose(zj[tr:tr + d.n], want, rtol=3e-6, atol=1e-4)
    finally:
        D.dia_pp_tile = orig


def test_pallas_dia_spmv_power_stream_interpret_mode():
    """Streamed fused k-step kernel (x/c window DMAs from HBM): matches
    the resident kernel's oracle, plain and affine."""
    from gflownet_spai_tpu.ops import dia as D

    k = 3
    d = _poisson_dia(256)
    rng = np.random.default_rng(12)
    orig = D.dia_pp_tile
    D.dia_pp_tile = lambda dd: 8192
    try:
        from gflownet_spai_tpu.ops.dia import spmv_dia_jnp
        x = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        c = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        want_p = x
        want_a = x
        for _ in range(k):
            want_p = spmv_dia_jnp(d, want_p) * 0.3
            want_a = spmv_dia_jnp(d, want_a) * 0.3 + c
        xq = D.dia_pad_pp(d, x)
        cq = D.dia_pad_pp(d, c)
        zq = jnp.zeros_like(xq)
        dk = D.dia_power_data(d, k)
        tr = 8192
        z = np.asarray(D._spmv_pallas_power_stream(
            d, dk, xq, zq, scale=0.3, k=k, interpret=True))
        np.testing.assert_allclose(z[tr:tr + d.n], np.asarray(want_p),
                                   rtol=3e-6, atol=1e-4)
        assert not z[:tr].any() and not z[tr + d.n_pad:].any()
        za = np.asarray(D._spmv_pallas_power_stream(
            d, dk, xq, zq, scale=0.3, k=k, cq=cq, interpret=True))
        np.testing.assert_allclose(za[tr:tr + d.n], np.asarray(want_a),
                                   rtol=3e-6, atol=1e-4)
    finally:
        D.dia_pp_tile = orig


def test_pallas_dia_cheby_interpret_mode():
    """Fused Chebyshev kernel: k semi-iteration steps with static per-pass
    coefficients match the explicit recurrence (z/dd carried, r constant),
    in interpret mode and via the public dispatcher's jnp fallback."""
    from gflownet_spai_tpu.ops import dia as D
    from gflownet_spai_tpu.solvers.stationary import chebyshev_coeffs

    k = 3
    d = _poisson_dia(256)
    rng = np.random.default_rng(16)
    orig = D.dia_pp_tile
    D.dia_pp_tile = lambda dd: 8192
    try:
        from gflownet_spai_tpu.ops.dia import spmv_dia_jnp
        r = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        coeffs = tuple(chebyshev_coeffs(0.5, 8.0, k))
        # oracle: explicit recurrence
        z = jnp.zeros_like(r)
        dd = jnp.zeros_like(r)
        for (a, b) in coeffs:
            dd = a * dd + b * (r - spmv_dia_jnp(d, z))
            z = z + dd
        want_z, want_dd = np.asarray(z), np.asarray(dd)

        tr = 8192
        rq = D.dia_pad_pp(d, r)
        z0 = jnp.zeros_like(rq)
        dk = D.dia_power_data(d, k)
        zo, ddo = D._spmv_pallas_cheby(
            d, dk, z0, jnp.zeros_like(rq), rq,
            jnp.zeros_like(rq), jnp.zeros_like(rq), coeffs, k,
            interpret=True)
        np.testing.assert_allclose(np.asarray(zo)[tr:tr + d.n], want_z,
                                   rtol=3e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ddo)[tr:tr + d.n], want_dd,
                                   rtol=3e-5, atol=1e-3)
        assert not np.asarray(zo)[:tr].any()
        # public dispatcher (jnp fallback on CPU) agrees
        zj, ddj = D.spmv_dia_cheby(
            d, dk, z0, jnp.zeros_like(rq), rq,
            jnp.zeros_like(rq), jnp.zeros_like(rq), coeffs, k)
        np.testing.assert_allclose(np.asarray(zj)[tr:tr + d.n], want_z,
                                   rtol=3e-5, atol=1e-3)
    finally:
        D.dia_pp_tile = orig


def test_chebyshev_fused_apply_matches_plain():
    """chebyshev_op's fused multi-call apply (padded ping-pong chain over
    spmv_dia_cheby) equals the plain per-step recurrence apply."""
    import gflownet_spai_tpu.solvers.stationary as J
    from gflownet_spai_tpu.ops import dia as D

    d = _poisson_dia(256)
    rng = np.random.default_rng(17)
    orig = D.dia_pp_tile
    D.dia_pp_tile = lambda dd: 8192     # tr = 8·halo → fuse_k up to 8
    try:
        r = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
        op_fused = J.chebyshev_op(d, lmax=8.0, lmin=0.5, degree=8, fuse_k=4)
        op_plain = J.chebyshev_op(d, lmax=8.0, lmin=0.5, degree=8, fuse_k=1)
        np.testing.assert_allclose(np.asarray(op_fused(r)),
                                   np.asarray(op_plain(r)),
                                   rtol=3e-5, atol=1e-3)
    finally:
        D.dia_pp_tile = orig


def test_dia_power_tile_admits_big_halo():
    """Per-k tile selection (dia_power_tile) returns a usable tile for the
    k=8 / halo-4096 class where BOTH matrix-global _ok checks fail — the
    case that used to force the solver down to a lower k (ADVICE r1)."""
    from gflownet_spai_tpu.ops import dia as D

    h, n = 4096, 1 << 21
    d = D.DIA(data=jnp.zeros((3, n), jnp.float32), offsets=(-h, 0, h),
              shape=(n, n), nnz=3 * n)
    tglob = D.dia_pp_tile(d)
    assert tglob and not D.dia_power_ok(d, 8, tglob)
    assert not D.dia_power_stream_ok(d, 8, tglob)
    tr = D.dia_power_tile(d, 8)
    assert tr > 0 and n % tr == 0 and tr >= 8 * d.halo
    assert D.dia_power_ok(d, 8, tr) or D.dia_power_stream_ok(d, 8, tr)


@pytest.mark.parametrize("affine", [False, True])
def test_pallas_dia_spmv_power_nondefault_tile_interpret(affine):
    """Fused k-step kernels at a NON-default tile (buffers + datak built at
    tr=2048 on a 4096-row tridiagonal): the kernel derives the tile from
    the buffer shapes, so per-k tiles from dia_power_tile ride the same
    entry points (ADVICE r1: this path had no coverage)."""
    from gflownet_spai_tpu.ops import dia as D
    from gflownet_spai_tpu.ops.dia import spmv_dia_jnp

    k, tr = 2, 2048
    n = 4096
    rng = np.random.default_rng(11)
    data = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    d = D.DIA(data=data, offsets=(-1, 0, 1), shape=(n, n), nnz=3 * n)
    assert tr != D.dia_pp_tile(d)              # genuinely non-default
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    c = jnp.asarray(rng.standard_normal(n), jnp.float32) if affine else None
    want = x
    for _ in range(k):
        want = spmv_dia_jnp(d, want) * 0.3
        if affine:
            want = want + c
    want = np.asarray(want)
    xq = D.dia_pad_pp(d, x, tr=tr)
    cq = D.dia_pad_pp(d, c, tr=tr) if affine else None
    zq = jnp.zeros_like(xq)
    dk = D.dia_power_data(d, k, tr=tr)
    assert dk.shape[0] == n // tr == 2         # multi-block grid
    z = np.asarray(D._spmv_pallas_power(d, dk, xq, zq, scale=0.3, k=k,
                                        cq=cq, interpret=True))
    np.testing.assert_allclose(z[tr:tr + n], want, rtol=3e-6, atol=1e-4)
    assert not z[:tr].any() and not z[tr + n:].any()
    # the streamed variant accepts the same non-default-tile buffers
    zs = np.asarray(D._spmv_pallas_power_stream(d, dk, xq, zq, scale=0.3,
                                                k=k, cq=cq, interpret=True))
    np.testing.assert_allclose(zs[tr:tr + n], want, rtol=3e-6, atol=1e-4)
    # public dispatcher (jnp fallback on CPU) agrees on the same buffers
    zj = np.asarray(D.spmv_dia_power(d, dk, xq, zq, scale=0.3, k=k, add=cq))
    np.testing.assert_allclose(zj[tr:tr + n], want, rtol=3e-6, atol=1e-4)


def test_spmv_dia_power_rhs_interpret_and_fallback():
    """Multi-RHS fused k-step: the Pallas kernel (interpret) and the jnp
    fallback must both equal K independent chained affine applies."""
    from gflownet_spai_tpu.ops import dia as D
    from gflownet_spai_tpu.ops.dia import spmv_dia_jnp

    k, tr, n, K = 2, 2048, 4096, 8
    rng = np.random.default_rng(12)
    data = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    d = D.DIA(data=data, offsets=(-1, 0, 1), shape=(n, n), nnz=3 * n)
    X = jnp.asarray(rng.standard_normal((K, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((K, n)), jnp.float32)
    want = np.stack([
        np.asarray(_chain(d, X[i], C[i], k, spmv_dia_jnp)) for i in range(K)
    ])
    xq = D.dia_pad_pp_rhs(d, X, tr=tr)
    cq = D.dia_pad_pp_rhs(d, C, tr=tr)
    zq = jnp.zeros_like(xq)
    dk = D.dia_power_data(d, k, tr=tr)
    z = np.asarray(D._spmv_pallas_power_rhs(d, dk, xq, zq, scale=0.3, k=k,
                                            cq=cq, interpret=True))
    np.testing.assert_allclose(z[:, tr:tr + n], want, rtol=3e-6, atol=1e-4)
    assert not z[:, :tr].any() and not z[:, tr + n:].any()
    zj = np.asarray(D.spmv_dia_power_rhs(d, dk, xq, zq, scale=0.3, k=k,
                                         add=cq))
    np.testing.assert_allclose(zj[:, tr:tr + n], want, rtol=3e-6, atol=1e-4)


def _chain(d, x, c, k, apply_fn):
    cur = x
    for _ in range(k):
        cur = apply_fn(d, cur) * 0.3 + c
    return cur


def test_jacobi_multirhs_matches_single():
    """K-RHS fused Jacobi == K independent jacobi() runs."""
    from gflownet_spai_tpu.ops.dia import coo_to_dia
    from gflownet_spai_tpu.solvers.stationary import jacobi, jacobi_multirhs

    d = coo_to_dia(gallery.get("poisson32"))
    d = type(d)(data=d.data.astype(jnp.float32), offsets=d.offsets,
                shape=d.shape, nnz=d.nnz)
    rng = np.random.default_rng(13)
    K = 4
    B = jnp.asarray(rng.standard_normal((K, d.n)), jnp.float32)
    multi = jacobi_multirhs(d, B, iters=24)
    assert multi.x.shape == (K, d.n) and multi.residual.shape == (K,)
    for i in range(K):
        single = jacobi(d, B[i], iters=24)
        np.testing.assert_allclose(np.asarray(multi.x[i]),
                                   np.asarray(single.x), rtol=2e-5, atol=2e-5)


def test_fused_power_bf16_diagonals():
    """bf16 diagonal storage with f32 buffers: fused k-step stays within
    bf16 tolerance of the f32 result (dominant HBM traffic halves)."""
    from gflownet_spai_tpu.ops import dia as D
    from gflownet_spai_tpu.ops.dia import dia_astype, spmv_dia_jnp

    k, tr, n = 2, 2048, 4096
    rng = np.random.default_rng(14)
    data = jnp.asarray(rng.standard_normal((3, n)) * 0.2, jnp.float32)
    d = D.DIA(data=data, offsets=(-1, 0, 1), shape=(n, n), nnz=3 * n)
    db = dia_astype(d, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    want = x
    for _ in range(k):
        want = spmv_dia_jnp(d, want) * 0.3
    xq = D.dia_pad_pp(db, x, tr=tr)
    assert xq.dtype == jnp.float32          # buffers promote past bf16
    zq = jnp.zeros_like(xq)
    dk = D.dia_power_data(db, k, tr=tr)
    assert dk.dtype == jnp.bfloat16
    z = np.asarray(D._spmv_pallas_power(db, dk, xq, zq, scale=0.3, k=k,
                                        interpret=True))
    np.testing.assert_allclose(z[tr:tr + n], np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    zj = np.asarray(D.spmv_dia_power(db, dk, xq, zq, scale=0.3, k=k))
    np.testing.assert_allclose(zj[tr:tr + n], np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_linear_scan_matches_default_ad():
    """ops.scan.linear_scan: values and (custom one-reverse-scan) VJP match
    the default associative_scan and its autodiff, on both axes."""
    import jax
    import numpy as np
    from gflownet_spai_tpu.ops.scan import linear_scan

    rng = np.random.default_rng(3)
    B, T, H = 3, 37, 5

    def ref(a, b, axis):
        def comb(l, r):
            a1, b1 = l
            a2, b2 = r
            return a1 * a2, a2 * b1 + b2
        return jax.lax.associative_scan(comb, (a, b), axis=axis)[1]

    for shape, axis in (((T, H), 0), ((B, T), -1)):
        a = jnp.asarray(rng.uniform(0.2, 0.95, shape), jnp.float32)
        b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(linear_scan(a, b, axis=axis)),
            np.asarray(ref(a, b, axis)), rtol=1e-6, atol=1e-6)

        f_new = lambda a, b: jnp.sum(linear_scan(a, b, axis=axis) * tgt)
        f_ref = lambda a, b: jnp.sum(ref(a, b, axis) * tgt)
        ga = jax.grad(f_new, argnums=(0, 1))(a, b)
        gr = jax.grad(f_ref, argnums=(0, 1))(a, b)
        for x, y, name in zip(ga, gr, "ab"):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"axis={axis} grad {name}")


def test_suffix_logsumexp_custom_vjp_matches_default():
    """ops.scan.suffix_logsumexp: values + gradients match flip∘cumlogsumexp
    and its default AD, including −inf (masked-action) entries."""
    import jax
    import numpy as np
    from gflownet_spai_tpu.ops.scan import suffix_logsumexp

    rng = np.random.default_rng(8)
    B, A = 4, 200
    x_np = rng.standard_normal((B, A)) * 3.0
    x_np[:, -7:] = -np.inf          # padded action tail
    x = jnp.asarray(x_np, jnp.float32)
    tgt_np = rng.standard_normal((B, A)).astype(np.float32)
    tgt_np[:, -7:] = 0.0            # cotangents vanish on the pad
    tgt = jnp.asarray(tgt_np)

    def ref(x):
        return jnp.flip(jax.lax.cumlogsumexp(jnp.flip(x, 1), axis=1), 1)

    np.testing.assert_allclose(np.asarray(suffix_logsumexp(x)),
                               np.asarray(ref(x)), rtol=1e-6, atol=1e-6)
    g_new = jax.grad(lambda x: jnp.sum(
        jnp.where(tgt != 0, suffix_logsumexp(x) * tgt, 0.0)))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        jnp.where(tgt != 0, ref(x) * tgt, 0.0)))(x)
    # the custom adjoint is finite EVERYWHERE (default AD of cumlogsumexp
    # NaNs on the −inf pad — exactly what the guard exists for); compare
    # on the finite lanes
    assert np.isfinite(np.asarray(g_new)).all()
    fin = np.isfinite(x_np)
    np.testing.assert_allclose(np.asarray(g_new)[fin],
                               np.asarray(g_ref)[fin],
                               rtol=2e-4, atol=2e-5)
