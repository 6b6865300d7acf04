"""Pallas kernel correctness + throughput on the real TPU chip.

Run manually (not part of the CPU suite): ``python -m pytest tpu_tests/ -q``.
Timing note: on the axon tunnel ``block_until_ready`` is unreliable —
measurements force a scalar readback and difference two iteration counts
(see bench.py helpers).
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the TPU chip"
)


def _timed_chain(fn, x0, iters_lo=100, iters_hi=1100, reps=3):
    """Per-iteration wall time via the two-point chained-loop method.
    Needs O(1000) iteration separation to rise above tunnel latency noise."""
    @jax.jit
    def chain(x, iters):
        return jnp.sum(jax.lax.fori_loop(0, iters, lambda _, x: fn(x), x))

    out = {iters_lo: [], iters_hi: []}
    for it in (iters_lo, iters_hi):
        float(chain(x0, it))             # warm/compile
    for _ in range(reps):
        for it in (iters_lo, iters_hi):
            t0 = time.time()
            float(chain(x0, it))
            out[it].append(time.time() - t0)
    import numpy as _np
    return (_np.median(out[iters_hi]) - _np.median(out[iters_lo])) / (
        iters_hi - iters_lo
    )


def test_dia_spmv_correct_and_fast():
    from gflownet_spai_tpu.ops import coo_to_dia, spmv_dia
    from gflownet_spai_tpu.sparse import gallery
    from gflownet_spai_tpu.sparse.convert import coo_to_scipy

    coo = gallery.get("poisson32")          # 1024×1024, 4992 nnz
    d = coo_to_dia(coo)
    A = coo_to_scipy(coo)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1024), jnp.float32)
    y = spmv_dia(d, x)
    np.testing.assert_allclose(np.asarray(y), A @ np.asarray(x), rtol=2e-5)


def test_dia_spmv_large_poisson_throughput():
    from gflownet_spai_tpu.ops.dia import DIA, spmv_dia

    k = 1000
    n = k * k
    i = np.arange(n)
    r, c = i // k, i % k
    offsets = (-k, -1, 0, 1, k)
    n_pad = 1 << 20
    data = np.zeros((5, n_pad), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    nnz = int((data != 0).sum())
    d = DIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n), nnz=nnz)
    from gflownet_spai_tpu.ops.dia import dia_pad_x, spmv_dia_padded

    h = d.halo
    xp0 = dia_pad_x(d, jnp.ones((n,), jnp.float32))

    def step(xp):
        y = spmv_dia_padded(d, xp)
        return jax.lax.dynamic_update_slice(xp, y * 0.2, (h,))

    dt = _timed_chain(step, xp0)
    gnnz = nnz / dt / 1e9
    print(f"\nDIA SpMV poisson-1M (padded chain): {dt*1e6:.1f} us → {gnnz:.1f} Gnnz/s")
    # Chain ceiling ≈ 114 Gnnz/s (kernel 5.6 B/nnz + repack 1.6 B/nnz at
    # 819 GB/s); measured 103–109 across runs (kernel alone: 145).  Assert
    # comfortably above the BASELINE.json 70%-of-roofline bar with margin
    # for tunnel timing variance.
    assert gnnz > 95.0, gnnz


def test_bell_spmm_correct():
    import scipy.sparse as sp
    from gflownet_spai_tpu.ops import csr_to_bell, spmm_bell
    from gflownet_spai_tpu.sparse import scipy_to_coo
    from gflownet_spai_tpu.sparse.convert import coo_to_csr

    rng = np.random.default_rng(1)
    A = sp.random(1024, 2048, density=0.02, random_state=rng, format="coo",
                  dtype=np.float32)
    bell = csr_to_bell(coo_to_csr(scipy_to_coo(A), canonical=True),
                       blockshape=(8, 128))
    x = rng.standard_normal((2048, 256)).astype(np.float32)
    y = spmm_bell(bell, jnp.asarray(x))     # dispatches the resident kernel
    # f32 accumulation-order noise vs scipy's f32 ordering: atol covers it
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=2e-2, atol=6e-2)
    # both pallas kernels must agree tightly with the jnp path (accumulation
    # order differs → not bit-exact)
    from gflownet_spai_tpu.ops.bsr import (
        _resident_bk, _spmm_bell_pallas, _spmm_bell_pallas_resident,
        spmm_bell_jnp,
    )
    want = np.asarray(spmm_bell_jnp(bell, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-4)
    bk = _resident_bk(bell, 256)
    assert bk is not None
    y_res = np.asarray(_spmm_bell_pallas_resident(bell, jnp.asarray(x), bk))
    y_str = np.asarray(_spmm_bell_pallas(bell, jnp.asarray(x)))
    np.testing.assert_allclose(y_res, want, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(y_str, want, rtol=1e-5, atol=1e-4)


def test_gmres_with_dia_operator():
    from functools import partial
    from gflownet_spai_tpu.ops import coo_to_dia, spmv_dia
    from gflownet_spai_tpu.solvers import gmres
    from gflownet_spai_tpu.sparse import gallery

    coo = gallery.get("olm500_like")
    import jax.numpy as jnp
    d = coo_to_dia(coo)
    # f32 on TPU
    import dataclasses
    d = dataclasses.replace(d, data=d.data.astype(jnp.float32))
    b = jnp.ones((500,), jnp.float32)
    res = gmres(partial(spmv_dia, d), b, restart=30, maxiter=2000, rtol=1e-4)
    assert bool(res.converged)


def test_dia_spmv_streamed_large():
    """x > VMEM → the HBM-streamed kernel path; correctness vs stencil."""
    from gflownet_spai_tpu.ops.dia import DIA, spmv_dia, _x_fits_vmem

    k = 2048
    n = k * k                      # 4M rows, 16MB x → streamed
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, n), np.float32)
    data[2, :] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    d = DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
            shape=(n, n), nnz=int((data != 0).sum()))
    assert not _x_fits_vmem(d)
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_dia(d, jnp.asarray(x)))
    rng = np.random.default_rng(1)
    for row in rng.integers(0, n, 50):
        rr, cc = row // k, row % k
        want = 4 * x[row]
        if rr > 0: want -= x[row - k]
        if cc > 0: want -= x[row - 1]
        if cc < k - 1: want -= x[row + 1]
        if rr < k - 1: want -= x[row + k]
        assert abs(y[row] - want) < 1e-3 * max(1, abs(want))


def test_stream_v1_vs_v2_throughput():
    """Compare the two streamed-kernel variants at 84M nnz (informational;
    asserts only that v2 is correct and not drastically slower)."""
    from gflownet_spai_tpu.ops.dia import (
        DIA, _pad_x, _spmv_pallas_stream, _spmv_pallas_stream2,
    )

    k = 4096
    n = k * k
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, n), np.float32)
    data[2, :] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    d = DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
            shape=(n, n), nnz=int((data != 0).sum()))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    xp = _pad_x(d, x)

    y1 = np.asarray(_spmv_pallas_stream(d, x))
    y2 = np.asarray(_spmv_pallas_stream2(d, xp))
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-4)

    import time

    h = d.halo

    # each chain feeds y back into x (Jacobi-like) so the loop body depends
    # on the carry — a loop-invariant body gets hoisted by XLA and the
    # two-point differencing then measures pure tunnel noise
    def step_v1(dd, xu):
        return _spmv_pallas_stream(dd, xu) * 0.2

    def step_v2(dd, xp):
        y = _spmv_pallas_stream2(dd, xp)
        return jax.lax.dynamic_update_slice(xp, y * 0.2, (h,))

    def bench(step, arg):
        # d rides as a jit ARGUMENT — closed over, its 335 MB of diagonals
        # become compile-payload constants (HTTP 413 over the tunnel)
        @jax.jit
        def chain(dd, a, iters):
            return jnp.sum(jax.lax.fori_loop(
                0, iters, lambda _, a: step(dd, a), a))
        ts = {}
        for it in (5, 55):
            float(chain(d, arg, it))
        for rep in range(3):
            for it in (5, 55):
                t0 = time.time()
                float(chain(d, arg, it))
                ts.setdefault(it, []).append(time.time() - t0)
        return (np.median(ts[55]) - np.median(ts[5])) / 50

    t1 = bench(step_v1, x)
    t2 = bench(step_v2, xp)
    print(f"\nstream v1: {d.nnz/t1/1e9:.1f} Gnnz/s, v2: {d.nnz/t2/1e9:.1f} Gnnz/s")
    assert t2 < 3 * t1


def test_dia_reward_path_vs_coo_on_chip():
    """Reward throughput: gather-based COO pair plan vs banded DIA product
    at 60k-nnz seed (informational print + correctness cross-check)."""
    import time
    from gflownet_spai_tpu.sparse.gallery import conv_diffusion
    from gflownet_spai_tpu.sparse.types import COO
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env import spai as coo_env
    from gflownet_spai_tpu.env import spai_dia as dia_env

    a = conv_diffusion(20_000)
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32), shape=a.shape)
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    e_coo = make_env(seed, original=a)
    e_dia = dia_env.make_dia_env(seed, a)
    keep = jnp.asarray(np.random.default_rng(0).random((4, e_coo.num_edges)) > 0.3)

    def bench(fn, env, lo, hi):
        @jax.jit
        def chain(keep, iters):
            def body(_, acc):
                # alpha depends (negligibly) on the carry so the body is not
                # loop-invariant — otherwise XLA hoists it out of the loop
                # and the differencing measures nothing
                alpha = jnp.asarray(0.5) + 1e-38 * acc
                return acc + jnp.sum(jax.vmap(
                    lambda k: fn(env, k, alpha))(keep))
            return jax.lax.fori_loop(0, iters, body, 0.0)
        ts = {}
        for it in (lo, hi):
            float(chain(keep, it))
        for rep in range(2):
            for it in (lo, hi):
                t0 = time.time()
                float(chain(keep, it))
                ts.setdefault(it, []).append(time.time() - t0)
        return (np.median(ts[hi]) - np.median(ts[lo])) / (hi - lo)

    # the DIA reward is microseconds — it needs thousands of iterations of
    # separation to rise above tunnel timing noise (ms-scale jitter)
    t_dia = bench(dia_env.reward, e_dia, 10, 4010)
    t_coo = bench(coo_env.reward, e_coo, 10, 110)
    print(f"\nbatch-4 reward: dia {t_dia*1e3:.2f} ms, coo {t_coo*1e3:.2f} ms, "
          f"speedup {t_coo/t_dia:.1f}x")
    assert t_dia < t_coo  # the banded path must win on TPU


def test_dia_spmv_power_fused_on_chip():
    """Fused k-step SpMV (temporal blocking): on-chip correctness vs k jnp
    applies, and the fused chain must beat the single-step ping-pong chain
    (it reads the diagonals once per k applies — measured 525 vs 107
    Gnnz/s at k=8 on Poisson-1M)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from functools import partial
    from bench import poisson_dia
    from gflownet_spai_tpu.ops import dia as D

    k = 8
    d = poisson_dia(1000)
    assert D.dia_power_ok(d, k)
    dk = D.dia_power_data(d, k)
    tr = D.dia_pp_tile(d)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(d.n).astype(np.float32))
    xq = D.dia_pad_pp(d, x)

    @jax.jit
    def fused(d, dk, xq):
        return D.spmv_dia_power(d, dk, xq, jnp.zeros_like(xq), scale=0.2, k=k)

    @jax.jit
    def ref(d, x):
        for _ in range(k):
            x = D.spmv_dia_jnp(d, x) * 0.2
        return x

    got = np.asarray(fused(d, dk, xq))
    want = np.asarray(ref(d, x))
    denom = np.abs(want).max()
    assert np.abs(got[tr:tr + d.n] - want).max() / denom < 1e-5
    assert not got[:tr].any() and not got[tr + d.n_pad:].any()

    @partial(jax.jit, static_argnums=())
    def chain_fused(d, dk, xq, pairs):
        def body(_, c):
            x, z = c
            z = D.spmv_dia_power(d, dk, x, z, scale=0.2, k=k)
            x = D.spmv_dia_power(d, dk, z, x, scale=0.2, k=k)
            return (x, z)
        x, z = jax.lax.fori_loop(0, pairs, body, (xq, jnp.zeros_like(xq)))
        return jnp.sum(x * 1e-30)

    @jax.jit
    def chain_pp(d, xq, pairs):
        def body(_, c):
            x, y = c
            y = D.spmv_dia_pingpong(d, x, y, scale=0.2)
            x = D.spmv_dia_pingpong(d, y, x, scale=0.2)
            return (x, y)
        x, y = jax.lax.fori_loop(0, pairs, body, (xq, jnp.zeros_like(xq)))
        return jnp.sum(x * 1e-30)

    def two_point(chain, args, lo, hi, per_pair):
        for it in (lo, hi):
            float(chain(*args, it))
        ts = {lo: [], hi: []}
        for _ in range(3):
            for it in (lo, hi):
                t0 = time.time()
                float(chain(*args, it))
                ts[it].append(time.time() - t0)
        return (np.median(ts[hi]) - np.median(ts[lo])) / (hi - lo) / per_pair

    t_fused = two_point(chain_fused, (d, dk, xq), 50, 450, 2 * k)
    t_pp = two_point(chain_pp, (d, xq), 50, 450, 2)
    print(f"\nfused k={k}: {d.nnz/t_fused/1e9:.1f} Gnnz/s, "
          f"ping-pong: {d.nnz/t_pp/1e9:.1f} Gnnz/s")
    assert t_fused < t_pp  # temporal blocking must win


def test_chebyshev_fused_on_chip():
    """Fused Chebyshev kernel (z resident, dd/r window DMAs, two aliased
    outputs) matches the explicit recurrence on the real chip, and the
    chebyshev_op preconditioner cuts Poisson-1M CG iterations ~degree×."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import poisson_dia
    from gflownet_spai_tpu.ops import dia as D
    from gflownet_spai_tpu.solvers import cg
    from gflownet_spai_tpu.solvers.stationary import (
        chebyshev_coeffs, chebyshev_op,
    )

    d = poisson_dia(1000)
    k = 2
    assert D.dia_cheby_ok(d, k)
    coeffs = tuple(chebyshev_coeffs(2e-5, 8.4, k))
    rng = np.random.default_rng(20)
    r = jnp.asarray(rng.standard_normal(d.n).astype(np.float32))
    tr = D.dia_pp_tile(d)
    rq = D.dia_pad_pp(d, r)
    dk = D.dia_power_data(d, k)
    z0 = jnp.zeros_like(rq)

    @jax.jit
    def fused(d, dk, rq):
        return D.spmv_dia_cheby(d, dk, jnp.zeros_like(rq),
                                jnp.zeros_like(rq), rq,
                                jnp.zeros_like(rq), jnp.zeros_like(rq),
                                coeffs, k)

    @jax.jit
    def oracle(d, r):
        z = jnp.zeros_like(r)
        dd = jnp.zeros_like(r)
        for (a, b) in coeffs:
            dd = a * dd + b * (r - D.spmv_dia_jnp(d, z))
            z = z + dd
        return z, dd

    zo, ddo = fused(d, dk, rq)
    zw, ddw = oracle(d, r)
    scale = float(jnp.abs(zw).max())
    assert float(jnp.abs(zo[tr:tr + d.n] - zw).max()) / scale < 1e-5
    assert float(jnp.abs(zo[:tr]).max()) == 0.0

    b = jnp.ones((d.n,), jnp.float32)
    base = cg(d, b, maxiter=2500, rtol=1e-5)
    lmin = 8.0 * np.sin(np.pi / 2002.0) ** 2
    pre = cg(d, b, m_op=chebyshev_op(d, lmax=8.4, lmin=lmin, degree=32),
             maxiter=2500, rtol=1e-5)
    print(f"\nCG iters: none {int(base.iterations)}, "
          f"chebyshev(32) {int(pre.iterations)}")
    assert bool(pre.converged)
    assert int(pre.iterations) * 10 < int(base.iterations)


def test_dia_spmv_power_streamed_on_chip():
    """Streamed fused k-step kernel at 84M nnz (x beyond VMEM residency):
    correct vs k jnp applies and faster than the ping-pong stream."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import poisson_dia
    from gflownet_spai_tpu.ops import dia as D

    k = 4
    d = poisson_dia(4096)
    assert not D.dia_power_ok(d, k) and D.dia_power_stream_ok(d, k)
    dk = D.dia_power_data(d, k)
    tr = D.dia_pp_tile(d)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal(d.n).astype(np.float32))
    xq = D.dia_pad_pp(d, x)

    @jax.jit
    def fused(d, dk, xq):
        return D.spmv_dia_power(d, dk, xq, jnp.zeros_like(xq), scale=0.2, k=k)

    @jax.jit
    def ref(d, x):
        for _ in range(k):
            x = D.spmv_dia_jnp(d, x) * 0.2
        return x

    got = np.asarray(fused(d, dk, xq))
    want = np.asarray(ref(d, x))
    assert np.abs(got[tr:tr + d.n] - want).max() / np.abs(want).max() < 1e-5
    assert not got[:tr].any() and not got[tr + d.n_pad:].any()


def _poisson_dia(k, n_pad=None):
    import gflownet_spai_tpu.ops.dia as dia_mod
    from gflownet_spai_tpu.ops.dia import DIA

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
    rng = np.random.default_rng(7)
    data[:, :n] += 0.01 * rng.standard_normal((5, n)).astype(np.float32) * (
        data[:, :n] != 0)
    return DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
               shape=(n, n), nnz=int((data != 0).sum()))


def test_segment_kernels_on_chip():
    """Real-Mosaic segment softmax/sum/broadcast + grads vs the jnp tile
    implementations (round 2: the GAT scatter substrate)."""
    from gflownet_spai_tpu.ops import segment as seg

    rng = np.random.default_rng(30)
    n, e = 20000, 150000
    ids = rng.integers(0, n, e)
    tiles = seg.build_seg_tiles(ids, n, tile_nodes=128)
    T, S = tiles.tiles, tiles.slots
    scores = jnp.asarray(rng.standard_normal((T, S)), jnp.float32)
    got = np.asarray(jax.jit(
        lambda s: seg.segment_softmax_tiles(tiles, s))(scores))
    want = np.asarray(seg.segment_softmax_tiles_jnp(tiles, scores))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    D = 16
    vals = jnp.asarray(rng.standard_normal((T, S, D)), jnp.float32)
    mask = jnp.asarray(
        (np.asarray(tiles.local_dst) < tiles.tile_nodes)[..., None])
    vals = vals * mask
    got_s = np.asarray(jax.jit(
        lambda v: seg.segment_sum_tiles(tiles, v))(vals))
    want_s = np.asarray(seg.segment_sum_tiles_jnp(tiles, vals))
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-4)

    # gradient through the custom VJPs compiles and matches jnp
    tgt = jnp.asarray(rng.standard_normal((T, S)), jnp.float32)
    g_p = np.asarray(jax.jit(jax.grad(
        lambda s: jnp.sum(seg.segment_softmax_tiles(tiles, s) * tgt)))(scores))
    g_j = np.asarray(jax.grad(
        lambda s: jnp.sum(seg.segment_softmax_tiles_jnp(tiles, s) * tgt))(scores))
    np.testing.assert_allclose(g_p, g_j, rtol=1e-3, atol=1e-5)


def test_spmv_dia_power_rhs_on_chip():
    """Multi-RHS fused k-step on real Mosaic vs K chained jnp applies."""
    from gflownet_spai_tpu.ops import dia as D

    k, K = 4, 8
    d = _poisson_dia(512)
    rng = np.random.default_rng(31)
    X = jnp.asarray(rng.standard_normal((K, d.n)), jnp.float32)
    # the 1-RHS-optimal dia_pp_tile (65536 here) fails the K-scaled VMEM
    # model — pick the largest n_pad divisor the multi-RHS model admits
    # (jacobi_multirhs does the equivalent fallback internally)
    tr = max(t for t in range(1024, D.dia_pp_tile(d) + 1, 1024)
             if d.n_pad % t == 0 and D.dia_power_rhs_ok(d, k, K, t))
    assert tr == 16384
    xq = D.dia_pad_pp_rhs(d, X, tr=tr)
    dk = D.dia_power_data(d, k, tr=tr)

    @jax.jit
    def fused(d, dk, xq):
        return D.spmv_dia_power_rhs(d, dk, xq, jnp.zeros_like(xq),
                                    scale=0.2, k=k)

    got = np.asarray(fused(d, dk, xq))
    want = np.stack([
        np.asarray(_chain_jnp(d, X[i], k)) for i in range(K)
    ])
    assert np.abs(got[:, tr:tr + d.n] - want).max() / np.abs(want).max() < 1e-5


def _chain_jnp(d, x, k):
    from gflownet_spai_tpu.ops.dia import spmv_dia_jnp
    for _ in range(k):
        x = spmv_dia_jnp(d, x) * 0.2
    return x


def test_fused_power_bf16_on_chip():
    """bf16 diagonals + f32 buffers through the real fused kernel."""
    from gflownet_spai_tpu.ops import dia as D
    from gflownet_spai_tpu.ops.dia import dia_astype

    k = 4
    d = _poisson_dia(512)
    db = dia_astype(d, jnp.bfloat16)
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.standard_normal(d.n), jnp.float32)
    tr = D.dia_pp_tile(db)
    xq = D.dia_pad_pp(db, x)
    assert xq.dtype == jnp.float32
    dk = D.dia_power_data(db, k)

    @jax.jit
    def fused(db, dk, xq):
        return D.spmv_dia_power(db, dk, xq, jnp.zeros_like(xq),
                                scale=0.2, k=k)

    got = np.asarray(fused(db, dk, xq))
    want = np.asarray(_chain_jnp(d, x, k))
    denom = np.abs(want).max()
    assert np.abs(got[tr:tr + d.n] - want).max() / denom < 3e-2


def test_gather_windows_and_tiled_gat_on_chip():
    """Real-Mosaic windowed-onehot src gather (SrcWindows plan: scalar-
    prefetched window blocks) + the full gather-free tiled GATv2 forward
    vs the dense scatter path (round 2: GAT absolute speed)."""
    from gflownet_spai_tpu.models.policies import (
        forward_policy_init, forward_policy_pooled, graph_from_seed,
        tiled_graph_from_seed)
    from gflownet_spai_tpu.ops import segment as seg
    from gflownet_spai_tpu.sparse.gallery import orsirr_like

    # kernel-level parity on a banded+jumps graph (outlier routing live)
    rng = np.random.default_rng(31)
    n, e = 20000, 150000
    dst = rng.integers(0, n, e)
    src = np.clip(dst + rng.integers(-200, 200, e), 0, n - 1)
    jump = rng.random(e) < 0.02
    src[jump] = rng.integers(0, n, jump.sum())
    tiles = seg.build_seg_tiles(dst, n, tile_nodes=128)
    src_t = np.asarray(seg.to_tiles(tiles, jnp.asarray(src, jnp.int32)))
    plan = seg.build_src_windows(tiles, src_t, n)
    vals = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    got = np.asarray(jax.jit(lambda v: seg.gather_rows_windows(
        plan, tiles, jnp.asarray(src_t), v))(vals))
    want = np.asarray(seg.gather_rows_windows_jnp(plan, tiles, vals))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # grad through the custom VJP compiles (scatter-add path)
    g = np.asarray(jax.jit(jax.grad(lambda v: jnp.sum(
        seg.gather_rows_windows(plan, tiles, jnp.asarray(src_t), v) ** 2)))(
        vals))
    assert np.isfinite(g).all()

    # end-to-end policy embedding: tiled (all Pallas kernels) == dense
    seed_m = orsirr_like(40, dtype=np.float32)   # n=1600, unstructured
    from gflownet_spai_tpu.env.ilu import seed_pattern
    sp = seed_pattern(seed_m, method="ilu0", dtype=jnp.float32)
    gd = graph_from_seed(sp)
    tg = tiled_graph_from_seed(sp)
    params = forward_policy_init(jax.random.PRNGKey(3), 4, sp.nnz + 1)
    want_e = np.asarray(jax.jit(
        lambda p: forward_policy_pooled(p, gd, 4))(params))
    got_e = np.asarray(jax.jit(
        lambda p: forward_policy_pooled(p, tg, 4))(params))
    np.testing.assert_allclose(got_e, want_e, rtol=2e-3, atol=2e-4)


def test_gat_fused_kernel_on_chip():
    """One-launch fused GATv2 tile kernel (ops.gat_fused): real-Mosaic
    forward + analytic backward vs the f32 jnp reference, both variants."""
    from gflownet_spai_tpu.ops import gat_fused as gf
    from gflownet_spai_tpu.ops import segment as seg

    rng = np.random.default_rng(7)
    n, e, H, D = 2200, 18000, 4, 4
    HD = H * D
    tiles = seg.build_seg_tiles(rng.integers(0, n, e), n, tile_nodes=128)
    T, S = tiles.tiles, tiles.slots
    attr = jnp.asarray(rng.standard_normal(T * S), jnp.float32)
    w_e = jnp.asarray(rng.standard_normal(HD), jnp.float32)
    att = jnp.asarray(rng.standard_normal((H, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((tiles.n_pad, HD)), jnp.float32)
    for uniform in (False, True):
        xs = jnp.asarray(rng.standard_normal(
            (1 if uniform else T * S, HD)), jnp.float32)
        xd = jnp.asarray(rng.standard_normal(
            (1 if uniform else tiles.n_pad, HD)), jnp.float32)
        got = jax.jit(lambda *a: gf.gat_tile_fused(tiles, *a))(
            attr, xs, xd, w_e, att)
        want = gf.gat_tile_fused_jnp(tiles, attr, xs, xd, w_e, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-5)
        gp = jax.jit(jax.grad(
            lambda xs, xd, w, a: jnp.sum(
                gf.gat_tile_fused(tiles, attr, xs, xd, w, a) * tgt),
            argnums=(0, 1, 2, 3)))(xs, xd, w_e, att)
        gj = jax.grad(
            lambda xs, xd, w, a: jnp.sum(
                gf.gat_tile_fused_jnp(tiles, attr, xs, xd, w, a) * tgt),
            argnums=(0, 1, 2, 3))(xs, xd, w_e, att)
        # the accumulated weight grads (w_e, att) can be near-zero by
        # cancellation over ~18k random-sign slot summands, so floor the
        # tolerance on the LARGEST grad's scale — both sides are f32 sums
        # in different reduction orders and share ~sqrt(N)·eps noise
        gscale = max(float(jnp.max(jnp.abs(b_))) for b_ in gj)
        for a_, b_, name in zip(gp, gj, ("xs", "xd", "w_e", "att")):
            assert float(jnp.max(jnp.abs(a_ - b_))) <= 1e-4 * gscale, (
                f"uniform={uniform} grad {name}")


def test_gat_bucketed_policy_forward_on_chip():
    """Bucketed-S fused-GAT ladder (GatBucket path in gatv2_apply_tiled)
    on real Mosaic: full 2-layer pooled policy forward + parameter grads
    vs the uniform-S fused path, on a skew-degree graph that produces
    multiple ladder classes."""
    from gflownet_spai_tpu.models.policies import (forward_policy_init,
                                                   forward_policy_pooled,
                                                   tiled_graph_from_seed)
    from gflownet_spai_tpu.sparse.convert import coo_sort_dedup
    from gflownet_spai_tpu.sparse.types import COO

    rng = np.random.default_rng(5)
    n, e = 3000, 30000
    r = rng.integers(0, n, e)
    # moderate skew: 8% of edges cluster on a 512-node hub region, the
    # rest stay banded — yields a multi-class ladder while every tile's
    # slot count stays inside the fused kernel's VMEM envelope (the
    # uniform-S path OOMs past S ≈ 5k regardless of bucketing)
    c = np.where(rng.random(e) < 0.08, rng.integers(0, 512, e),
                 np.clip(r + rng.integers(-60, 61, e), 0, n - 1))
    sp = coo_sort_dedup(COO(row=jnp.asarray(r, jnp.int32),
                            col=jnp.asarray(c, jnp.int32),
                            data=jnp.asarray(
                                rng.standard_normal(e), jnp.float32),
                            shape=(n, n)))
    tg0 = tiled_graph_from_seed(sp, bucket_step=None)
    tg = tiled_graph_from_seed(sp, bucket_step=1.5)
    assert tg.gat_buckets is not None and len(tg.gat_buckets) >= 2
    params = forward_policy_init(jax.random.PRNGKey(3), 4, sp.nnz + 1)

    want = np.asarray(jax.jit(
        lambda p: forward_policy_pooled(p, tg0, 4))(params))
    got = np.asarray(jax.jit(
        lambda p: forward_policy_pooled(p, tg, 4))(params))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    g0 = jax.jit(jax.grad(
        lambda p: jnp.sum(forward_policy_pooled(p, tg0, 4) ** 2)))(params)
    g1 = jax.jit(jax.grad(
        lambda p: jnp.sum(forward_policy_pooled(p, tg, 4) ** 2)))(params)
    l0 = jax.tree_util.tree_leaves(g0)
    gscale = max(float(jnp.max(jnp.abs(x))) for x in l0)
    for a_, b_ in zip(l0, jax.tree_util.tree_leaves(g1)):
        assert float(jnp.max(jnp.abs(a_ - b_))) <= 2e-3 * gscale
