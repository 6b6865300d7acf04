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


@pytest.mark.parametrize("backend", ["rowblock", "dia"])
def test_dp_fast_reward_matches_single_device(backend, mesh8):
    """dp must compose with the FAST reward backends (VERDICT r1 #5: the
    round-1 dp path forced the slow COO pair plan).  A (dp=4, rows=2) —
    (dp=8, rows=1) for dia — mesh with sgd(0) must reproduce the
    single-device loss: same folded keys per dp shard + pmean."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env import spai_dia
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import loss_fn
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.sparse.types import COO

    # olm500 for dia (its ILU LU-product has dense diagonals); poisson32's
    # LU fill carries phantom zero slots that the DIA env rejects
    a = gallery.get("olm500_like" if backend == "dia" else "poisson32")
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32),
            shape=a.shape)
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    if backend == "dia":
        env = spai_dia.make_dia_env(seed, a)
        graph = graph_from_seed(spai_dia.edge_coo(env))
        mesh = make_mesh(dp=8, rows=1)
    else:
        env = make_env(seed, original=a, reward_path="rowblock")
        graph = graph_from_seed(seed)
        mesh = make_mesh(dp=4, rows=2)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions,
                         backward="linear")
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.sgd(0.0)
    dp = mesh.shape["dp"]
    b_local = 2
    step, _ = make_dp_train_step(mesh, env, graph, cfg, opt,
                                 batch_size=b_local * dp)
    key = jax.random.PRNGKey(42)
    _, _, loss_dp, rewards = step(params, opt.init(params), key)
    # reference: mean over the dp shards of the single-device loss at each
    # shard's folded key (pmean semantics)
    ref_losses, ref_rewards = [], []
    for i in range(dp):
        sub = jax.random.fold_in(key, i)
        l, aux = loss_fn(params, env, graph, cfg, sub, b_local)
        ref_losses.append(float(l))
        ref_rewards.append(np.asarray(aux["rewards"]))
    np.testing.assert_allclose(float(loss_dp), np.mean(ref_losses), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(rewards),
                               np.concatenate(ref_rewards), rtol=2e-4)


def test_dp_replay_weighting_matches_single_device(mesh8):
    """Replicated replays weighted valid/dp: the dp loss equals the
    single-device weighted loss EXACTLY for TB when every shard samples the
    same fresh trajectories (dp=1 sanity) and matches the closed form for
    dp=4 (VERDICT r1 weak #3)."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.loss import (log_reward,
                                            trajectory_balance_loss)
    from gflownet_spai_tpu.gfn.gflownet import backward_logprobs
    from gflownet_spai_tpu.gfn.rollout import trajectory_logprobs
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import (forward_policy_alpha,
                                                   forward_policy_logits)
    from gflownet_spai_tpu.env import spai as spai_mod

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions,
                         backward="linear")
    params = init_params(jax.random.PRNGKey(0), cfg)
    dp = 4
    mesh = make_mesh(dp=dp, rows=2)
    opt = optax.sgd(0.0)
    b_local = 2
    R, T = 3, env.num_actions
    rng = np.random.default_rng(8)
    r_actions = np.full((R, T), -1, np.int32)
    for i in range(R):
        k = rng.integers(1, 20)
        r_actions[i, :k] = rng.choice(env.num_edges, size=k, replace=False)
        r_actions[i, k] = env.num_edges   # terminal
    r_actions = jnp.asarray(r_actions)
    r_valid = jnp.asarray([True, True, False])
    step, _ = make_dp_train_step(mesh, env, graph, cfg, opt,
                                 batch_size=b_local * dp, replay_samples=R)
    key = jax.random.PRNGKey(7)
    _, _, loss_dp, _, fresh = step(params, opt.init(params), key,
                                   r_actions, r_valid)
    # closed-form reference: global weighted TB over all fresh trajectories
    # (weight 1) + the replay set ONCE (weight valid)
    logits = forward_policy_logits(params.forward, graph, cfg.num_actions,
                                   cfg.hidden_dim, cfg.heads)
    alpha = forward_policy_alpha(params.forward)
    all_actions = jnp.concatenate([jnp.asarray(fresh), r_actions], 0)
    fwd = jax.vmap(lambda x: trajectory_logprobs(logits, x))(all_actions)
    back = backward_logprobs(params, cfg, all_actions)
    rew = spai_mod.batched_rewards(env, all_actions, alpha)
    w = jnp.concatenate([jnp.ones((b_local * dp,)),
                         r_valid.astype(jnp.float32)])
    want = trajectory_balance_loss(params.log_z, log_reward(rew),
                                   fwd.sum(-1), back.sum(-1), weights=w)
    np.testing.assert_allclose(float(loss_dp), float(want), rtol=2e-5)


def test_sharded_sampler_exact_vs_replicated(rows_mesh):
    """Sharded Gumbel-top-k (head + sort sharded over rows, VERDICT r1 #4):
    replaying the SAME per-shard noise through the replicated sampler must
    reproduce actions and per-step forward log-probs exactly for every
    sample whose terminal lands in the merged prefix — and with
    t_cap = num_actions every sample does."""
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import forward_policy_logits
    from gflownet_spai_tpu.parallel import (replicated_oracle_gumbels,
                                            shard_head, sharded_rollout)

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A)
    params = init_params(jax.random.PRNGKey(0), cfg)
    p_sharded = shard_head(rows_mesh, params.forward)
    B = 3
    key = jax.random.PRNGKey(9)

    for t_cap, expect_all_valid in ((A, True), (64, False)):
        out = sharded_rollout(rows_mesh, p_sharded, graph, A, 4, key,
                              batch_size=B, t_cap=t_cap)
        logits = forward_policy_logits(params.forward, graph, A, 4)
        g = replicated_oracle_gumbels(key, A, p_sharded.fc_w.shape[1],
                                      rows_mesh.shape["rows"], B)
        want = gumbel_topk_rollout(jnp.broadcast_to(logits, (B, A)),
                                   key, terminal_action=A - 1, gumbels=g)
        valid = np.asarray(out.valid)
        if expect_all_valid:
            assert valid.all()
        top = out.rollout.actions.shape[1]
        for b in range(B):
            if not valid[b]:
                continue
            np.testing.assert_array_equal(
                np.asarray(out.rollout.actions[b]),
                np.asarray(want.actions[b, :top]))
            np.testing.assert_allclose(
                np.asarray(out.rollout.fwd_logprobs[b]),
                np.asarray(want.fwd_logprobs[b, :top]), rtol=2e-4, atol=2e-5)
            assert int(out.rollout.lengths[b]) == int(want.lengths[b])


def test_sharded_sampler_train_step(mesh8):
    """Full train step with rollout + head + logprobs sharded over rows and
    batch over dp: loss matches the manual TB computed from the oracle
    trajectories (same per-shard noise), and Adam training improves."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env.spai import batched_rewards
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import backward_logprobs
    from gflownet_spai_tpu.gfn.loss import log_reward, trajectory_balance_loss
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import (forward_policy_alpha,
                                                   forward_policy_logits)
    from gflownet_spai_tpu.parallel import replicated_oracle_gumbels
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear")
    params = init_params(jax.random.PRNGKey(0), cfg)
    dp, R = mesh8.shape["dp"], mesh8.shape["rows"]
    b_local = 2

    step, shard_fwd, env_p = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, optax.sgd(0.0),
        batch_size=b_local * dp, t_cap=A)
    p_sh = shard_fwd(params)
    _, _, loss_sh, rewards_sh, valid, _ = step(
        p_sh, optax.sgd(0.0).init(p_sh), jax.random.PRNGKey(5))
    assert np.asarray(valid).all()          # t_cap = A ⇒ always exact

    # oracle: replay each dp shard's noise through the replicated sampler
    logits = forward_policy_logits(params.forward, graph, A, 4)
    alpha = forward_policy_alpha(params.forward)
    a_pad = p_sh.forward.fc_w.shape[1]
    losses = []
    for i in range(dp):
        k_i = jax.random.fold_in(jax.random.PRNGKey(5), i)
        g = replicated_oracle_gumbels(k_i, A, a_pad, R, b_local)
        roll = gumbel_topk_rollout(jnp.broadcast_to(logits, (b_local, A)),
                                   k_i, terminal_action=A - 1, gumbels=g)
        rew = batched_rewards(env, roll.actions, alpha)
        back = backward_logprobs(params, cfg, roll.actions)
        losses.append(float(trajectory_balance_loss(
            params.log_z, log_reward(rew),
            roll.fwd_logprobs.sum(-1), back.sum(-1))))
    np.testing.assert_allclose(float(loss_sh), np.mean(losses), rtol=2e-4)

    # and it trains: Adam for a few steps must reduce the loss (t_cap = A:
    # an untrained near-uniform policy has ~A/2-long trajectories, so a
    # short prefix would weight-0 whole batches by design)
    opt = optax.adam(5e-3)
    step2, shard_fwd2, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, opt, batch_size=b_local * dp, t_cap=A)
    p2 = shard_fwd2(init_params(jax.random.PRNGKey(1), cfg))
    st = opt.init(p2)
    key = jax.random.PRNGKey(2)
    hist = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        p2, st, loss, _, v, _ = step2(p2, st, sub)
        hist.append(float(loss))
        assert np.isfinite(hist[-1])
    assert np.mean(hist[-10:]) < np.mean(hist[:10])


def test_distributed_jacobi_auto_reduces_k(rows_mesh):
    """A k whose k·halo exceeds the shard must auto-reduce (not raise) and
    still converge to the single-device Jacobi answer."""
    from gflownet_spai_tpu.ops.dia import coo_to_dia
    from gflownet_spai_tpu.parallel.solvers import distributed_jacobi
    from gflownet_spai_tpu.solvers.stationary import jacobi

    coo = gallery.get("poisson32")      # n=1024 → 8 shards of 1024 n_pad/8
    d = coo_to_dia(coo)
    b = jnp.ones((1024,), jnp.float64)
    # halo = 1024-aligned = 1024 = shard size ⇒ any k > 1 must reduce to 1
    x, res = distributed_jacobi(rows_mesh, d, b, iters=60, k=8)
    want = jacobi(d, b, iters=60)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want.x),
                               rtol=1e-6, atol=1e-8)


def test_sharded_sampler_subtb_matches_oracle(mesh8):
    """SubTB(λ) on the sharded sampler: the loss equals the replicated
    subtb_loss computed from the oracle trajectories (same per-shard
    noise), flow head and all."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env.spai import batched_rewards
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import backward_logprobs
    from gflownet_spai_tpu.gfn.loss import log_reward, subtb_loss
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import (flow_head_logF,
                                                   forward_policy_alpha,
                                                   forward_policy_logits)
    from gflownet_spai_tpu.parallel import replicated_oracle_gumbels
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear", loss="subtb", subtb_lambda=0.9)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert params.flow is not None
    dp, R = mesh8.shape["dp"], mesh8.shape["rows"]
    b_local = 2

    step, shard_fwd, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, optax.sgd(0.0),
        batch_size=b_local * dp, t_cap=A)
    p_sh = shard_fwd(params)
    _, _, loss_sh, _, valid, lengths_sh = step(
        p_sh, optax.sgd(0.0).init(p_sh), jax.random.PRNGKey(5))
    assert np.asarray(valid).all()

    logits = forward_policy_logits(params.forward, graph, A, 4)
    alpha = forward_policy_alpha(params.forward)
    a_pad = p_sh.forward.fc_w.shape[1]
    losses = []
    for i in range(dp):
        k_i = jax.random.fold_in(jax.random.PRNGKey(5), i)
        g = replicated_oracle_gumbels(k_i, A, a_pad, R, b_local)
        roll = gumbel_topk_rollout(jnp.broadcast_to(logits, (b_local, A)),
                                   k_i, terminal_action=A - 1, gumbels=g)
        rew = batched_rewards(env, roll.actions, alpha)
        back = backward_logprobs(params, cfg, roll.actions)
        lf = flow_head_logF(params.flow, roll.actions)
        losses.append(float(subtb_loss(
            lf, log_reward(rew), roll.fwd_logprobs, back, roll.lengths,
            lam=cfg.subtb_lambda)))
    np.testing.assert_allclose(float(loss_sh), np.mean(losses), rtol=2e-4)


def test_sharded_rollout_temperature(rows_mesh):
    """Temperature on the sharded sampler: the SORT runs on logits/τ (same
    trajectories as the dense tempered sampler with the same per-shard
    noise) while the reported log-probs stay those of the UNtempered
    policy (off-policy re-scoring, matching gfn.gflownet.sample)."""
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn.rollout import (gumbel_topk_rollout,
                                               trajectory_logprobs)
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import forward_policy_logits
    from gflownet_spai_tpu.parallel import (replicated_oracle_gumbels,
                                            shard_head, sharded_rollout)

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    params = init_params(jax.random.PRNGKey(0),
                         GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A))
    p_sharded = shard_head(rows_mesh, params.forward)
    B, tau = 3, 2.5
    key = jax.random.PRNGKey(11)

    out = sharded_rollout(rows_mesh, p_sharded, graph, A, 4, key,
                          batch_size=B, t_cap=A, temperature=tau)
    assert np.asarray(out.valid).all()
    logits = forward_policy_logits(params.forward, graph, A, 4)
    g = replicated_oracle_gumbels(key, A, p_sharded.fc_w.shape[1],
                                  rows_mesh.shape["rows"], B)
    want = gumbel_topk_rollout(jnp.broadcast_to(logits / tau, (B, A)),
                               key, terminal_action=A - 1, gumbels=g)
    np.testing.assert_array_equal(np.asarray(out.rollout.actions),
                                  np.asarray(want.actions))
    # log-probs = UNtempered trajectory re-scoring, not the tempered ones
    want_lp = jax.vmap(lambda t: trajectory_logprobs(logits, t))(want.actions)
    np.testing.assert_allclose(np.asarray(out.rollout.fwd_logprobs),
                               np.asarray(want_lp), rtol=2e-4, atol=2e-5)


def test_sharded_sampler_replay_matches_oracle(mesh8):
    """Sharded sampler + replay buffer (VERDICT r2 weak #4): with
    t_cap = A the step's loss equals the replicated weighted-TB oracle —
    per dp shard, fresh oracle trajectories at weight 1 concatenated with
    the replicated replayed ones at weight valid/dp, then averaged."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env.spai import batched_rewards
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import backward_logprobs
    from gflownet_spai_tpu.gfn.loss import log_reward, trajectory_balance_loss
    from gflownet_spai_tpu.gfn.rollout import (gumbel_topk_rollout,
                                               trajectory_logprobs)
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import (forward_policy_alpha,
                                                   forward_policy_logits)
    from gflownet_spai_tpu.parallel import replicated_oracle_gumbels
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear")
    params = init_params(jax.random.PRNGKey(0), cfg)
    dp, R = mesh8.shape["dp"], mesh8.shape["rows"]
    b_local, S = 2, 3

    # hand-built replay: two real trajectories + one invalid slot
    rng = np.random.default_rng(3)
    r_np = np.full((S, A), -1, np.int32)
    for s in range(S - 1):
        length = rng.integers(3, 9)
        acts = rng.choice(A - 1, size=length - 1, replace=False)
        r_np[s, :length - 1] = acts
        r_np[s, length - 1] = A - 1          # terminal
    r_actions = jnp.asarray(r_np)
    r_valid = jnp.asarray([True, True, False])

    step, shard_fwd, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, optax.sgd(0.0),
        batch_size=b_local * dp, t_cap=A, replay_samples=S)
    p_sh = shard_fwd(params)
    _, _, loss_sh, rewards_sh, valid, _, actions_out = step(
        p_sh, optax.sgd(0.0).init(p_sh), jax.random.PRNGKey(5),
        r_actions, r_valid)
    assert np.asarray(valid).all()
    assert actions_out.shape == (b_local * dp, A)

    logits = forward_policy_logits(params.forward, graph, A, 4)
    alpha = forward_policy_alpha(params.forward)
    a_pad = p_sh.forward.fc_w.shape[1]
    r_fwd = jax.vmap(lambda t: trajectory_logprobs(logits, t))(r_actions)
    r_rew = batched_rewards(env, r_actions, alpha)
    r_back = backward_logprobs(params, cfg, r_actions)
    losses = []
    for i in range(dp):
        k_i = jax.random.fold_in(jax.random.PRNGKey(5), i)
        g = replicated_oracle_gumbels(k_i, A, a_pad, R, b_local)
        roll = gumbel_topk_rollout(jnp.broadcast_to(logits, (b_local, A)),
                                   k_i, terminal_action=A - 1, gumbels=g)
        rew = batched_rewards(env, roll.actions, alpha)
        back = backward_logprobs(params, cfg, roll.actions)
        fwd = jnp.concatenate([roll.fwd_logprobs, r_fwd], 0)
        bck = jnp.concatenate([back, r_back], 0)
        lr = jnp.concatenate([log_reward(rew), log_reward(r_rew)], 0)
        w = jnp.concatenate([jnp.ones((b_local,)),
                             r_valid.astype(jnp.float32) / dp], 0)
        losses.append(float(trajectory_balance_loss(
            params.log_z, lr, fwd.sum(-1), bck.sum(-1), weights=w)))
    np.testing.assert_allclose(float(loss_sh), np.mean(losses), rtol=2e-4)


def test_sharded_sampler_replay_trains_end_to_end(mesh8):
    """Train CLI path: --sampler sharded + --replay-size compose (the buffer
    fills at t_cap width, losses stay finite, loss improves)."""
    from gflownet_spai_tpu.train import TrainConfig, train

    cfg = TrainConfig(
        matrix="LF10_like", batch_size=4, num_epochs=40, lr=5e-3,
        sampler="sharded", dp_devices=2, rows_devices=4,
        replay_size=8, replay_samples=2, replay_prioritized=1.0,
        backward="linear", temperature=1.3,
        out_dir="/tmp/sharded_replay_run", log_every=100,
    )
    state, history = train(cfg, progress=False)
    assert np.isfinite(history).all()
    assert np.isfinite(np.asarray(state.replay.rewards)).any()
    assert np.mean(history[-10:]) < np.mean(history[:10])


def test_sharded_sampler_short_tcap_wins_with_trained_policy(rows_mesh):
    """The t_cap < A payoff exists exactly for early-terminating policies
    (VERDICT r2 weak #4): with a terminal-biased head (what config-4
    training converges to — mean length ~3 at 112k actions,
    runs/c4id2_orsirr150) a t_cap ≪ A prefix keeps valid_frac = 1 and
    bit-matches the dense rollout, while the untrained near-uniform
    policy weight-0s (almost) every sample at the same cap."""
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.models.policies import forward_policy_logits
    from gflownet_spai_tpu.parallel import (replicated_oracle_gumbels,
                                            shard_head, sharded_rollout)

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # "trained": terminal logit dominated — the policy terminates within
    # a few steps almost surely (Gumbel noise spread ~ a few units)
    fwd_trained = params.forward._replace(
        fc_b=params.forward.fc_b.at[A - 1].add(12.0))
    B, t_cap = 4, 32
    key = jax.random.PRNGKey(7)

    out = sharded_rollout(rows_mesh, shard_head(rows_mesh, fwd_trained),
                          graph, A, 4, key, batch_size=B, t_cap=t_cap)
    assert np.asarray(out.valid).all()
    assert int(np.max(np.asarray(out.rollout.lengths))) <= t_cap
    # bit-match vs the dense sampler under the same per-shard noise
    logits = forward_policy_logits(fwd_trained, graph, A, 4)
    g = replicated_oracle_gumbels(
        key, A, shard_head(rows_mesh, fwd_trained).fc_w.shape[1],
        rows_mesh.shape["rows"], B)
    want = gumbel_topk_rollout(jnp.broadcast_to(logits, (B, A)), key,
                               terminal_action=A - 1, gumbels=g)
    for b in range(B):
        L = int(want.lengths[b])
        np.testing.assert_array_equal(
            np.asarray(out.rollout.actions[b, :L]),
            np.asarray(want.actions[b, :L]))

    # the same cap on the untrained policy: ~uniform logits put the
    # terminal deep in the order — every sample weight-0s
    out_u = sharded_rollout(rows_mesh, shard_head(rows_mesh, params.forward),
                            graph, A, 4, key, batch_size=B, t_cap=t_cap)
    assert not np.asarray(out_u.valid).any()


def test_sharded_sampler_composes_with_window_order_env(mesh8):
    """--sampler sharded × --rowblock-order window: the rows-sharded
    residual provider consumes the window plan (win_idx carries exact
    permuted coordinates) and training stays finite and improves."""
    import optax
    from gflownet_spai_tpu.env import make_env
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("orsirr_like32")
    env = make_env(a, original=a, reward_path="rowblock",
                   rowblock_order="window", baseline="identity")
    graph = graph_from_seed(env.seed)          # the PERMUTED enumeration
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear")
    opt = optax.adam(5e-3)
    step, shard_fwd, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, opt, batch_size=4, t_cap=A)
    p = shard_fwd(init_params(jax.random.PRNGKey(0), cfg))
    st = opt.init(p)
    key = jax.random.PRNGKey(3)
    hist = []
    for _ in range(12):
        key, sub = jax.random.split(key)
        p, st, loss, rewards, valid, _ = step(p, st, sub)
        hist.append(float(loss))
        assert np.isfinite(hist[-1])
    assert np.asarray(valid).all()
    assert np.isfinite(np.asarray(rewards)).all()


def test_sharded_sampler_partial_subtb_signal_at_short_tcap(mesh8):
    """t_cap ≪ A on an UNTRAINED (near-uniform) policy: no rollout
    terminates inside the prefix, yet with loss=subtb the truncated
    prefixes train as partial trajectories (learned flow at the truncation
    point) — finite nonzero loss, nonzero gradients, params move.  With
    partial_subtb=False the whole batch is weight-0 (the round-3 foot-gun
    this feature removes)."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear", loss="subtb")
    dp = mesh8.shape["dp"]
    opt = optax.sgd(1e-3)
    t_cap = 16
    assert t_cap < A // 4

    step, shard_fwd, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, opt, batch_size=2 * dp, t_cap=t_cap)
    p0 = shard_fwd(init_params(jax.random.PRNGKey(0), cfg))
    p1, _, loss, _, valid, lengths = step(p0, opt.init(p0),
                                          jax.random.PRNGKey(7))
    assert not np.asarray(valid).any()          # nothing terminated...
    assert np.isfinite(float(loss)) and float(loss) > 0.0   # ...real loss
    assert (np.asarray(lengths) == t_cap).all()
    moved = any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)))
    assert moved                                 # gradients flowed

    step_z, shard_fwd_z, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, opt, batch_size=2 * dp, t_cap=t_cap,
        partial_subtb=False)
    pz = shard_fwd_z(init_params(jax.random.PRNGKey(0), cfg))
    _, _, loss_z, _, valid_z, _ = step_z(pz, opt.init(pz),
                                         jax.random.PRNGKey(7))
    assert not np.asarray(valid_z).any()
    assert float(loss_z) == 0.0                  # all weight-0: no signal


def test_cap_ladder_decisions():
    """CapLadder: shrinks to next_pow2(margin·maxP95) only after a full
    window of ≥95% termination, floors at cap_min, resets history."""
    from gflownet_spai_tpu.train.loop import CapLadder

    lad = CapLadder(cap=4096, cap_min=64, margin=4.0, window=3)
    full = np.full(16, 100)
    term = np.ones(16, bool)
    assert lad.observe(full, term) is None          # window not full
    assert lad.observe(full, term) is None
    got = lad.observe(full, term)                   # 3rd epoch: decide
    assert got == 512                               # next_pow2(4*100) = 512
    assert lad.cap == 512
    # history reset: needs a fresh window before the next shrink
    short = np.full(16, 10)
    assert lad.observe(short, term) is None
    assert lad.observe(short, term) is None
    assert lad.observe(short, term) == 64           # floor: pow2(40)=64=cap_min
    # termination dips below 95% → no decision even with a full window
    lad2 = CapLadder(cap=1024, cap_min=64, margin=4.0, window=2)
    mixed = np.array([True] * 9 + [False] * 7)      # 56% terminated
    assert lad2.observe(short, mixed) is None
    assert lad2.observe(short, mixed) is None
    assert lad2.cap == 1024
    # never grows: want >= cap is a no-op
    lad3 = CapLadder(cap=128, cap_min=64, margin=4.0, window=1)
    assert lad3.observe(np.full(8, 100), np.ones(8, bool)) is None
    assert lad3.cap == 128


def test_sharded_gat_pooled_matches_replicated(mesh8):
    """parallel.gat: the tile-sharded policy forward (fused GAT per shard +
    one all_gather of the layer-2 node features + psum'd mean pool) equals
    the replicated forward_policy_pooled on the same tiled graph — values
    and parameter gradients (VERDICT r3 item 6)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from gflownet_spai_tpu.env import seed_pattern
    from gflownet_spai_tpu.models.policies import (
        forward_policy_init, forward_policy_pooled, tiled_graph_from_seed)
    from gflownet_spai_tpu.parallel.gat import (
        ShardedTiledGraph, shard_tiled_graph, sharded_policy_pooled)

    a = gallery.get("orsirr_like32")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    tg = tiled_graph_from_seed(seed, tile_nodes=32)
    assert tg.srcwin is not None
    params = forward_policy_init(jax.random.PRNGKey(2), 4, seed.nnz + 1)

    want = forward_policy_pooled(params, tg, 4, 4)

    R = mesh8.shape["rows"]
    sg, meta = shard_tiled_graph(tg, R)
    g_spec = ShardedTiledGraph(
        x=P(), src_t=P("rows"), attr_t=P("rows", None),
        local_dst=P("rows", None), lsrc=P("rows", None), blk=P("rows"),
        out_slot=P("rows"), out_src=P("rows"))
    p_spec = jax.tree_util.tree_map(lambda _: P(), params)

    def f(p, g):
        return shard_map(
            lambda p, g: sharded_policy_pooled(p, g, meta, 4, 4),
            mesh=mesh8, in_specs=(p_spec, g_spec), out_specs=P(),
            check_vma=False)(p, g)

    got = f(params, sg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    gw = jax.grad(lambda p: jnp.sum(forward_policy_pooled(p, tg, 4, 4) ** 2)
                  )(params)
    gg = jax.grad(lambda p: jnp.sum(f(p, sg) ** 2))(params)
    for x, y in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=5e-4, atol=5e-6)


def test_sharded_sampler_with_sharded_gat_trains(mesh8):
    """End-to-end: make_sharded_sampler_train_step auto-shards the GAT when
    handed a TiledGraphInputs — training stays finite and the loss falls."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models.policies import tiled_graph_from_seed
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("orsirr_like32")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a, baseline="identity")
    tg = tiled_graph_from_seed(env.seed, tile_nodes=32)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear", loss="subtb")
    opt = optax.adam(5e-3)
    step, shard_fwd, _ = make_sharded_sampler_train_step(
        mesh8, env, tg, cfg, opt, batch_size=4, t_cap=A)
    p = shard_fwd(init_params(jax.random.PRNGKey(0), cfg))
    st = opt.init(p)
    key = jax.random.PRNGKey(3)
    hist = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        p, st, loss, rewards, valid, _ = step(p, st, sub)
        hist.append(float(loss))
        assert np.isfinite(hist[-1])
    assert np.asarray(valid).all()
    assert np.isfinite(np.asarray(rewards)).all()
    assert np.mean(hist[-10:]) < np.mean(hist[:10])


def test_sharded_rollout_edge_feats_matches_dense_logits(rows_mesh):
    """--edge-feats on the sharded sampler (ROADMAP r4 perf #2): the
    value-aware channel is added shard-locally from the sliced [A_pad/R, F]
    feature rows, so the assembled per-shard logits must equal the dense
    path's ``forward_policy_logits`` (which adds feats @ feat_w on the full
    vector) for a NONZERO feat_w."""
    from gflownet_spai_tpu.env import seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models.policies import (forward_policy_logits,
                                                   graph_from_seed)
    from gflownet_spai_tpu.parallel import shard_head, sharded_rollout

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="spai", k=1)
    graph = graph_from_seed(seed)
    A = seed.nnz + 1
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         edge_feats=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fwd = params.forward._replace(feat_w=jnp.asarray([-1.7]))
    p_sharded = shard_head(rows_mesh, fwd)

    out = sharded_rollout(rows_mesh, p_sharded, graph, A, 4,
                          jax.random.PRNGKey(7), batch_size=2, t_cap=A)
    want = np.asarray(forward_policy_logits(fwd, graph, A, 4))
    got = np.asarray(out.logits_local).reshape(-1)[:A]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    # and the channel actually moved the logits vs feat_w = 0
    out0 = sharded_rollout(rows_mesh, shard_head(rows_mesh, params.forward),
                           graph, A, 4, jax.random.PRNGKey(7),
                           batch_size=2, t_cap=A)
    assert np.abs(np.asarray(out0.logits_local).reshape(-1)[:A - 1]
                  - want[:A - 1]).max() > 1e-3


def test_sharded_sampler_train_step_edge_feats(mesh8):
    """Full sharded train step with the edge-feats channel: finite, trains,
    and feat_w receives a gradient (it sits on the sampled log-probs)."""
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models.policies import graph_from_seed
    from gflownet_spai_tpu.parallel.sampler import (
        make_sharded_sampler_train_step)

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="spai", k=1)
    env = make_env(seed, original=a, baseline="identity")
    graph = graph_from_seed(seed)
    A = env.num_actions
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear", loss="subtb", edge_feats=True,
                         alpha_fixed=0.9)
    opt = optax.adam(5e-3)
    step, shard_fwd, _ = make_sharded_sampler_train_step(
        mesh8, env, graph, cfg, opt, batch_size=4, t_cap=A)
    p = shard_fwd(init_params(jax.random.PRNGKey(0), cfg))
    assert p.forward.feat_w is not None
    st = opt.init(p)
    key = jax.random.PRNGKey(11)
    fw0 = float(p.forward.feat_w[0])
    for _ in range(5):
        key, sub = jax.random.split(key)
        p, st, loss, rewards, valid, _ = step(p, st, sub)
        assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(rewards)).all()
    assert float(p.forward.feat_w[0]) != fw0   # gradient reached the channel
