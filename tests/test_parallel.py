"""Multi-chip logic on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_scipy
from gflownet_spai_tpu.ops import coo_to_dia, dia_pad_x
from gflownet_spai_tpu.ops.dia import spmv_dia
from gflownet_spai_tpu.parallel import (
    halo_spmv,
    make_dp_train_step,
    make_mesh,
    partition_dia,
    sharded_residual_norms,
    spmv_allgather,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(dp=2, rows=4)


@pytest.fixture(scope="module")
def rows_mesh():
    return make_mesh(dp=1, rows=8)


def test_halo_spmv_matches_single_device(rows_mesh):
    coo = gallery.get("poisson32")          # bandwidth 32 ≤ shard sizes
    d = partition_dia(coo_to_dia(coo), 8)
    A = coo_to_scipy(coo)
    x = np.zeros(d.n_pad)
    x[: coo.shape[0]] = np.random.default_rng(0).standard_normal(coo.shape[0])
    y = halo_spmv(rows_mesh, d, jnp.asarray(x))
    want = A @ x[: coo.shape[0]]
    np.testing.assert_allclose(np.asarray(y)[: coo.shape[0]], want, rtol=1e-10)


def test_halo_spmv_under_jit(rows_mesh):
    coo = gallery.get("olm500_like")
    d = partition_dia(coo_to_dia(coo), 8)
    A = coo_to_scipy(coo)
    x = np.zeros(d.n_pad)
    x[:500] = np.random.default_rng(1).standard_normal(500)
    fn = jax.jit(lambda x: halo_spmv(rows_mesh, d, x))
    y = fn(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y)[:500], A @ x[:500], rtol=1e-10)


def test_allgather_spmv_matches(rows_mesh):
    coo = gallery.get("poisson32")
    d = partition_dia(coo_to_dia(coo), 8)
    A = coo_to_scipy(coo)
    x = np.zeros(d.n_pad)
    x[:1024] = np.random.default_rng(2).standard_normal(1024)
    y = spmv_allgather(rows_mesh, d, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y)[:1024], A @ x[:1024], rtol=1e-10)


def test_sharded_residual_matches_local(mesh8):
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env.spai import residual_norm
    from gflownet_spai_tpu.parallel.dp import _pad_pairs

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float64)
    env = make_env(seed, original=a)
    rng = np.random.default_rng(3)
    B = 4
    keep = jnp.asarray(rng.random((B, env.num_edges)) > 0.3)
    m_vals = env.seed.data[None, :] * keep.astype(env.seed.data.dtype)

    real_out = env.plan.out_nnz
    env_p = _pad_pairs(env, mesh8.shape["rows"])
    got = sharded_residual_norms(mesh8, env_p, m_vals, real_out)
    want = jax.vmap(lambda k: residual_norm(env, k))(keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_dp_train_step_runs_and_improves(mesh8):
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models import graph_from_seed

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-3)
    step, env_p = make_dp_train_step(mesh8, env, graph, cfg, opt, batch_size=8)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for e in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, loss, rewards = step(params, opt_state, sub)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert rewards.shape == (8,)
    assert np.mean(losses[-15:]) < np.mean(losses[:15]), (
        np.mean(losses[:15]), np.mean(losses[-15:])
    )


def test_dp_matches_single_device_gradients():
    """dp=1, rows=1 mesh must reproduce the unsharded loss exactly."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import loss_fn
    from gflownet_spai_tpu.models import graph_from_seed

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=1, rows=1)
    opt = optax.sgd(0.0)
    step, _ = make_dp_train_step(mesh, env, graph, cfg, opt, batch_size=4)
    key = jax.random.PRNGKey(42)
    sub = jax.random.fold_in(key, 0)   # dp axis index 0 fold
    _, _, loss_dp, _ = step(params, opt.init(params), key)
    loss_ref, _ = loss_fn(params, env, graph, cfg, sub, 4)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)


def test_distributed_gmres_and_cg(rows_mesh):
    from gflownet_spai_tpu.parallel import distributed_cg, distributed_gmres

    coo = gallery.get("poisson32")
    d = coo_to_dia(coo)
    A = coo_to_scipy(coo)
    b = jnp.ones((1024,), jnp.float64)
    res = distributed_gmres(rows_mesh, d, b, restart=30, maxiter=2000, rtol=1e-8)
    np.testing.assert_allclose(A @ np.asarray(res.x), np.ones(1024), atol=1e-5)
    res2 = distributed_cg(rows_mesh, d, b, maxiter=2000, rtol=1e-8)
    assert bool(res2.converged)
    np.testing.assert_allclose(A @ np.asarray(res2.x), np.ones(1024), atol=1e-5)
    # single-device solution agrees
    from functools import partial
    from gflownet_spai_tpu.ops.dia import spmv_dia
    ref = np.asarray(
        __import__("gflownet_spai_tpu.solvers", fromlist=["gmres"]).gmres(
            partial(spmv_dia, d), b, restart=30, maxiter=2000, rtol=1e-8).x)
    np.testing.assert_allclose(np.asarray(res.x), ref, atol=1e-6)


def test_halo_spmv_diagonal_only(rows_mesh):
    """offsets=(0,) regression: halo must never be 0 (a zero halo turned
    x[-halo:] into the full segment and shifted every shard's data)."""
    from gflownet_spai_tpu.sparse.types import COO

    diagvals = np.arange(1.0, 8193.0)
    d = partition_dia(coo_to_dia(COO.fromdense(np.diag(diagvals))), 8)
    x = np.random.default_rng(4).standard_normal(d.n_pad)
    y = np.asarray(halo_spmv(rows_mesh, d, jnp.asarray(x)))
    np.testing.assert_allclose(y[:8192], diagvals * x[:8192], rtol=1e-10)


def test_tp_sharded_logits_match_replicated(rows_mesh):
    """Column-sharded action head must reproduce the replicated logits
    exactly, including the padded-head case (A not divisible by shards)."""
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import forward_policy_logits
    from gflownet_spai_tpu.parallel import shard_head, sharded_policy_logits
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    assert env.num_actions % rows_mesh.shape["rows"] != 0  # padding exercised

    want = forward_policy_logits(params.forward, graph, env.num_actions, 4)
    fwd_sharded = shard_head(rows_mesh, params.forward)
    got = sharded_policy_logits(rows_mesh, fwd_sharded, graph,
                                env.num_actions, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # the rollout composes with sharded logits under GSPMD
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout

    @jax.jit
    def roll(fwd):
        logits = sharded_policy_logits(rows_mesh, fwd, graph,
                                       env.num_actions, 4)
        batched = jnp.broadcast_to(logits, (4, env.num_actions))
        return gumbel_topk_rollout(batched, jax.random.PRNGKey(1),
                                   terminal_action=env.num_actions - 1)
    r = roll(fwd_sharded)
    assert np.asarray(r.lengths).min() >= 1


def test_dp_train_with_replay_and_subtb(tmp_path):
    """dp=2 mesh + replay buffer + subTB loss end-to-end via the train CLI
    path (buffer fills from dp-gathered fresh batches)."""
    from gflownet_spai_tpu.train.config import TrainConfig
    from gflownet_spai_tpu.train.loop import train

    cfg = TrainConfig(matrix="LF10_like", num_epochs=6, batch_size=4,
                      dp_devices=2, loss="subtb", replay_size=8,
                      replay_samples=2, platform="cpu",
                      out_dir=str(tmp_path))
    state, history = train(cfg)
    assert np.isfinite(history).all()
    assert np.isfinite(np.asarray(state.replay.rewards)).sum() >= 4


def test_halo_spmv_power_matches_sequential(rows_mesh):
    """Communication-avoiding fused k-step: one k·halo exchange per k
    applies equals k sequential halo_spmv applies (and the scipy oracle)."""
    from gflownet_spai_tpu.parallel import halo_spmv_power

    coo = gallery.get("poisson128")        # 16384 rows → 2048/shard
    d = partition_dia(coo_to_dia(coo), 8)
    A = coo_to_scipy(coo)
    n = coo.shape[0]
    x = np.zeros(d.n_pad)
    x[:n] = np.random.default_rng(2).standard_normal(n)

    k, s = 2, 0.3
    z = halo_spmv_power(rows_mesh, d, jnp.asarray(x), k=k, scale=s)
    want = x[:n]
    for _ in range(k):
        want = s * (A @ want)
    np.testing.assert_allclose(np.asarray(z)[:n], want, rtol=2e-5, atol=1e-7)

    # k·halo exceeding the shard size must raise, not corrupt
    with pytest.raises(ValueError, match="halo"):
        halo_spmv_power(rows_mesh, d, jnp.asarray(x), k=4)


def test_distributed_jacobi_matches_single_device(rows_mesh):
    """Comm-avoiding distributed Jacobi (one k·halo exchange per k fused
    sweeps) equals the single-device weighted-Jacobi iteration."""
    from gflownet_spai_tpu.parallel import distributed_jacobi

    coo = gallery.get("poisson128")
    d = coo_to_dia(coo)
    A = coo_to_scipy(coo).tocsr()
    n = coo.shape[0]
    rng = np.random.default_rng(5)
    b = rng.standard_normal(n)

    x, rnorm = distributed_jacobi(rows_mesh, d, jnp.asarray(b),
                                  iters=24, k=2)
    # sequential oracle
    Dinv = 1.0 / A.diagonal()
    want = np.zeros(n)
    for _ in range(24):
        want = want + (2.0 / 3.0) * Dinv * (b - A @ want)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=1e-6)
    assert float(rnorm) < np.linalg.norm(b)
