"""Integration: the SPAI training loop learns on small matrices (loss ↓),
grid toy env trains to the known target distribution, checkpoints roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.train import TrainConfig, make_train_step, setup, train


@pytest.fixture(scope="module")
def lf10_setup():
    cfg = TrainConfig(matrix="LF10_like", batch_size=8, num_epochs=60, lr=5e-3,
                      hidden_dim=4, dtype="float32")
    return cfg, setup(cfg)


def test_train_step_runs_and_is_finite(lf10_setup):
    cfg, (a, seed, env, graph, mcfg, opt, state) = lf10_setup
    step = make_train_step(cfg, env, graph, mcfg, opt)
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))
    assert not bool(m["skipped"])
    assert np.asarray(m["lengths"]).min() >= 1


def test_loss_decreases_on_lf10(tmp_path):
    cfg = TrainConfig(matrix="LF10_like", batch_size=16, num_epochs=150, lr=5e-3,
                      hidden_dim=4, out_dir=str(tmp_path / "run"))
    _, history = train(cfg, progress=False)
    early = np.mean(history[:20])
    late = np.mean(history[-20:])
    assert late < early, (early, late)
    # reference-style summary CSV exists with the right header
    header = (tmp_path / "run" / "training_log.csv").read_text().splitlines()[0]
    assert header == "epoch,num_actions,loss,reward"


def test_checkpoint_resume(tmp_path):
    out = str(tmp_path / "ckpt_run")
    cfg = TrainConfig(matrix="LF10_like", batch_size=4, num_epochs=5, lr=1e-3,
                      out_dir=out)
    state, _ = train(cfg, progress=False)
    cfg2 = TrainConfig(matrix="LF10_like", batch_size=4, num_epochs=8, lr=1e-3,
                       out_dir=out, resume=True)
    state2, history2 = train(cfg2, progress=False)
    assert int(state.epoch) == 5
    assert int(state2.epoch) == 8
    assert len(history2) == 3  # resumed from epoch 5, ran 3 more


def test_grid_gflownet_learns_target_distribution():
    """Train a tiny MLP GFlowNet on the 8×8 grid env with uniform backward
    policy; the sampled distribution should concentrate on high-reward bands
    (the de-facto upstream sanity check, SURVEY.md §4)."""
    from gflownet_spai_tpu.env import grid as G
    from gflownet_spai_tpu.gfn.rollout import scan_rollout
    from gflownet_spai_tpu.gfn.loss import trajectory_balance_loss
    import optax

    g = G.GridEnv(size=8)
    H = 32

    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "w1": jax.random.normal(k1, (g.state_dim, H)) * 0.1,
            "b1": jnp.zeros(H),
            "w2": jax.random.normal(k2, (H, 3)) * 0.1,
            "b2": jnp.zeros(3),
            "log_z": jnp.zeros(()),
        }

    def logits(params, idx):
        x = jax.nn.one_hot(idx, g.state_dim)
        h = jax.nn.relu(x @ params["w1"] + params["b1"])
        out = h @ params["w2"] + params["b2"]
        return jnp.where(G.mask(g, idx), out, -jnp.inf)

    def rollout_batch(params, key, B=64):
        keys = jax.random.split(key, B)
        return jax.vmap(
            lambda k: scan_rollout(
                lambda s, t: logits(params, s),
                lambda s, a: G.update(g, s, a),
                jnp.asarray(0), k, G.TERMINATE, max_steps=15,
            )
        )(keys)

    def loss_fn(params, key):
        finals, rolls = rollout_batch(params, key)
        rewards = G.reward(g, finals)
        # uniform backward: each state has exactly one parent path choice set;
        # P_B = 1/(#parents); on the grid #parents = moves made so far, but the
        # standard upstream toy uses P_B = 1 product (tree-structured DAG is
        # false here, yet TB still trains; we use 1/n_parents for correctness)
        coord_r = finals // g.size
        coord_c = finals % g.size
        n_moves = rolls.lengths - 1
        # number of distinct trajectories to (r,c) is binom(r+c, r); uniform
        # backward over parents gives log P_B = -log binom(r+c, r)
        logbinom = (
            jax.scipy.special.gammaln(coord_r + coord_c + 1.0)
            - jax.scipy.special.gammaln(coord_r + 1.0)
            - jax.scipy.special.gammaln(coord_c + 1.0)
        )
        return trajectory_balance_loss(
            params["log_z"],
            jnp.log(rewards),
            rolls.fwd_logprobs.sum(-1),
            -logbinom,
        )

    params = init(jax.random.PRNGKey(0))
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        l, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(300):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        losses.append(float(l))
    assert np.mean(losses[-30:]) < np.mean(losses[:30])

    # sample and check mass concentrates on reward bands
    finals, _ = rollout_batch(params, jax.random.PRNGKey(99), B=512)
    r = np.asarray(G.reward(g, finals))
    assert (r > 0.5).mean() > 0.35, f"only {(r > 0.5).mean():.2%} in high-reward bands"


def test_train_tiled_graph_rowblock_end_to_end(tmp_path):
    """Full train loop with the round-2 large-scale substrates forced on
    (tiled GAT graph + rowblock reward): runs, improves, checkpoints."""
    from gflownet_spai_tpu.models.policies import TiledGraphInputs
    from gflownet_spai_tpu.train.config import TrainConfig
    from gflownet_spai_tpu.train.loop import make_train_step, setup

    cfg = TrainConfig(matrix="poisson32", num_epochs=12, batch_size=4,
                      backward="linear", loss="subtb", lr=5e-3,
                      env_format="rowblock", gat_tiled_min_edges=1,
                      out_dir=str(tmp_path))
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    assert isinstance(graph, TiledGraphInputs)
    assert env.rb is not None
    step = make_train_step(cfg, env, graph, mcfg, opt)
    losses = []
    for _ in range(cfg.num_epochs):
        state, m = step(state)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    # (no improvement assert: 12 epochs of batch-4 SubTB is noise-dominated;
    # convergence is covered by the gfn/train suites on the plain path)
    from gflownet_spai_tpu.train.loop import (restore_checkpoint,
                                              save_checkpoint)

    save_checkpoint(cfg.out_dir, state)
    restored = restore_checkpoint(cfg.out_dir, state)
    assert int(restored.epoch) == int(state.epoch)
    np.testing.assert_allclose(np.asarray(restored.params.log_z),
                               np.asarray(state.params.log_z))


def test_train_sharded_sampler_end_to_end(tmp_path):
    """`--sampler sharded` through the train() driver: the rollout's action
    head + Gumbel top-k + per-step log-probs run over the rows axis (no
    [B, A] materialization), composed with dp batch sharding and the SubTB
    flow head — finite losses, exact t_cap=0 (= num_actions) ⇒ every
    sample valid, metrics stream carries valid_frac."""
    import json

    cfg = TrainConfig(matrix="LF10_like", num_epochs=6, batch_size=8,
                      backward="linear", loss="subtb", lr=5e-3,
                      sampler="sharded", dp_devices=2, rows_devices=4,
                      out_dir=str(tmp_path / "run"))
    state, history = train(cfg, progress=False)
    assert len(history) == 6 and np.isfinite(history).all()
    recs = [json.loads(l) for l in
            (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert all(r["valid_frac"] == 1.0 for r in recs)   # t_cap = A ⇒ exact
    assert all(r["mean_len"] >= 1.0 for r in recs)


def test_train_sharded_sampler_tiled_bucketed_graph(tmp_path):
    """Sharded sampler × tiled graph × --gat-bucket-step: the graph travels
    as a shard_map ARGUMENT, so bucket SegTiles would reach the fused
    kernel's static args as tracers — train setup must skip the bucket
    build for this sampler at ANY rows count (the round-5 c5auto 1M-run
    crash: rows=1 slipped past the rows>1-only skip)."""
    cfg = TrainConfig(matrix="LF10_like", num_epochs=2, batch_size=4,
                      backward="linear", loss="subtb",
                      sampler="sharded", dp_devices=1, rows_devices=1,
                      gat_tiled_min_edges=1, gat_bucket_step=1.5,
                      t_cap=64, t_cap_auto=True, replay_size=4,
                      replay_samples=2,
                      out_dir=str(tmp_path / "run"))
    state, history = train(cfg, progress=False)
    assert len(history) == 2 and np.isfinite(history).all()


def test_replay_seed_magnitude_thinning(tmp_path):
    """Demonstration-seeded replay: the buffer holds the magnitude-ordered
    thinning trajectories with their true rewards after setup."""
    import numpy as np
    from gflownet_spai_tpu.train import TrainConfig, setup
    from gflownet_spai_tpu.train.loop import (
        seed_replay_with_magnitude_thinning)

    cfg = TrainConfig(matrix="bcsstk03_like", seed_method="spai", seed_k=2,
                      reward_baseline="identity", replay_size=8,
                      replay_seed_fracs="0.25,0.5", alpha_fixed=0.9,
                      out_dir=str(tmp_path))
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    state = seed_replay_with_magnitude_thinning(env, state, cfg, alpha=0.9)
    filled = np.isfinite(np.asarray(state.replay.rewards))
    assert filled.sum() == 2
    rewards = np.asarray(state.replay.rewards)[filled]
    # the magnitude-thinned patterns must beat keep-everything at α=0.9
    # (oracle: 50% of a k=2 SPAI seed deletes at ~zero residual cost)
    from gflownet_spai_tpu.gfn.gflownet import _batched_rewards
    import jax.numpy as jnp

    keep_all = np.full((1, 2), -1, np.int32)
    keep_all[0, 0] = env.num_edges          # immediate terminal
    r_keep = float(_batched_rewards(env, jnp.asarray(keep_all),
                                    jnp.asarray(0.9))[0])
    assert rewards.max() > r_keep + 100
    # trajectory shape: k smallest deletions then terminal then -1 padding
    acts = np.asarray(state.replay.actions)[filled]
    for row in acts:
        k = int((row >= 0).sum()) - 1
        assert row[k] == env.num_edges
        mags = np.abs(np.asarray(env.seed.data))
        # all deleted entries are among the (k + tolerance) smallest
        thresh = np.sort(mags)[k - 1]
        assert (mags[row[:k]] <= thresh + 1e-12).all()


def test_warmstart_on_demonstrations_snaps_policy_to_demo_depth():
    """Supervised warm-start (ROADMAP r4 quality #6 fallback): cross-entropy
    on the magnitude-thinning demonstrations must (a) reduce the demo NLL,
    (b) move the SAMPLED trajectory depth near the demonstration depth, and
    (c) push feat_w negative (small-magnitude entries favored)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gflownet_spai_tpu.gfn import gflownet as gfn
    from gflownet_spai_tpu.train import loop as L
    from gflownet_spai_tpu.train.config import TrainConfig

    cfg = TrainConfig(matrix="LF10_like", seed_method="spai", seed_k=2,
                      reward_baseline="identity", loss="subtb",
                      backward="linear", replay_size=8, replay_samples=2,
                      alpha_fixed=0.98, edge_feats=True,
                      replay_seed_fracs="0.5", warmstart_epochs=150,
                      num_epochs=1, batch_size=8, plateau_patience=0)
    a, seed, env, graph, mcfg, opt, state = L.setup(cfg)
    state = L.seed_replay_with_magnitude_thinning(env, state, cfg,
                                                  alpha=0.98)
    state = L.warmstart_on_demonstrations(env, graph, mcfg, state, cfg, opt)
    out = gfn.sample(state.params, env, graph, mcfg, jax.random.PRNGKey(0),
                     batch_size=8)
    depth = int(0.5 * env.num_edges) + 1
    mean_len = float(out.rollout.lengths.mean())
    assert abs(mean_len - depth) < 0.25 * depth
    assert float(state.params.forward.feat_w[0]) < -0.1
    # optimizer state was re-initialized for the GFlowNet phase
    assert int(state.epoch) == 0


def test_magnitude_demos_dia_env_uses_edge_enumeration():
    """DIA envs store the band layout in env.seed.data — the demos must
    come from the (diag, row) EDGE enumeration (spai_dia.edge_coo), whose
    ids are the action ids."""
    import numpy as np
    from gflownet_spai_tpu.env import spai_dia
    from gflownet_spai_tpu.train import loop as L
    from gflownet_spai_tpu.train.config import TrainConfig

    cfg = TrainConfig(matrix="LF10_like", seed_method="spai", seed_k=2)
    a, seed, env, graph, mcfg, opt, state = L.setup(cfg)
    assert isinstance(env, spai_dia.SpaiDiaEnv)   # the banded path
    demos = L._magnitude_demos(env, [0.5], env.num_actions)
    acts = demos[0][demos[0] >= 0]
    assert acts[-1] == env.num_edges              # terminates
    vals = np.abs(np.asarray(spai_dia.edge_coo(env).data))
    deleted = acts[:-1]
    kept = np.setdiff1d(np.arange(env.num_edges), deleted)
    assert vals[deleted].max() <= vals[kept].min() + 1e-12


def test_sharded_replay_tcap_resume(tmp_path):
    """The runs/c4id_auto_orsirr450 crash (VERDICT r4 item 1): a sharded
    run with replay on and t_cap < num_actions stores [K, t_cap] replay
    buffers; the resume template must honor the STORED width (orbax
    restores strictly by shape) and the restored buffer must survive the
    sharded transform (resized, not wiped)."""
    out = str(tmp_path / "run")
    kw = dict(matrix="LF10_like", batch_size=8, backward="linear",
              loss="subtb", lr=5e-3, sampler="sharded", dp_devices=2,
              rows_devices=4, replay_size=8, replay_samples=2, t_cap=8,
              out_dir=out)
    cfg = TrainConfig(num_epochs=4, **kw)
    state, _ = train(cfg, progress=False)
    assert state.replay.actions.shape == (8, 8)
    cfg2 = TrainConfig(num_epochs=7, resume=True, **kw)
    state2, history2 = train(cfg2, progress=False)
    assert int(state2.epoch) == 7
    assert len(history2) == 3
    assert state2.replay.actions.shape == (8, 8)


def test_restore_checkpoint_conforms_replay_width(tmp_path):
    """restore_checkpoint must adapt the replay template to the stored
    trajectory width instead of throwing the orbax shape error."""
    from gflownet_spai_tpu.gfn.replay import replay_init, replay_update
    from gflownet_spai_tpu.train.loop import (restore_checkpoint,
                                              save_checkpoint)

    cfg = TrainConfig(matrix="LF10_like", replay_size=4, t_cap=8)
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    assert state.replay.actions.shape[1] == 8
    acts = jnp.full((1, 8), -1, jnp.int32).at[0, 0].set(env.num_edges)
    state = state._replace(
        replay=replay_update(state.replay, acts, jnp.asarray([3.5])))
    save_checkpoint(str(tmp_path), state)
    # template at a DIFFERENT width (e.g. resume with a changed --t-cap,
    # or the old num_actions-wide template): must not throw
    wide = state._replace(replay=replay_init(4, env.num_actions))
    restored = restore_checkpoint(str(tmp_path), wide)
    assert restored.replay.actions.shape == (4, 8)
    filled = np.isfinite(np.asarray(restored.replay.rewards))
    assert filled.sum() == 1
    np.testing.assert_allclose(
        np.asarray(restored.replay.rewards)[filled], [3.5])


def test_sharded_transform_adopts_shrunken_cap():
    """Resume mid-cap-ladder: a restored replay narrower than --t-cap with
    --t-cap-auto means the prior run's ladder had shrunk — the adapter must
    adopt the stored cap (and keep the buffer) rather than restart wide."""
    from gflownet_spai_tpu.gfn.replay import replay_init
    from gflownet_spai_tpu.train.loop import _make_sharded_sampler_adapter

    cfg = TrainConfig(matrix="LF10_like", batch_size=4, backward="linear",
                      loss="subtb", sampler="sharded", dp_devices=2,
                      rows_devices=4, replay_size=4, replay_samples=2,
                      t_cap=16, t_cap_auto=True, t_cap_min=4)
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    step, transform = _make_sharded_sampler_adapter(cfg, env, graph, mcfg,
                                                    opt)
    # simulate a restore from a run whose ladder had shrunk 16 -> 8
    state = state._replace(replay=replay_init(4, 8))
    state = transform(state)
    assert state.replay.actions.shape == (4, 8)   # adopted, not re-widened
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))
    assert int(m["t_cap"]) == 8


def test_cap_ladder_shrinks_and_grows_back():
    """CapLadder: shrinks on stable termination, GROWS back x2 when the
    termination rate collapses at a shrunken cap (the config.py t_cap_auto
    contract), never past the starting cap."""
    from gflownet_spai_tpu.train.loop import CapLadder

    lad = CapLadder(cap=4096, cap_min=64, margin=4.0, window=3)
    # stable short trajectories: P95 = 20 -> next_pow2(80) = 128
    for _ in range(2):
        assert lad.observe([20] * 8, [True] * 8) is None
    assert lad.observe([20] * 8, [True] * 8) == 128
    assert lad.cap == 128
    # termination collapses at the shrunken cap -> grow x2
    for _ in range(2):
        assert lad.observe([128] * 8, [False] * 8) is None
    assert lad.observe([128] * 8, [False] * 8) == 256
    # keeps growing toward (but never past) the starting cap
    for _ in range(3):
        lad.observe([256] * 8, [False] * 8)
    assert lad.cap == 512
    for _ in range(12):
        lad.observe([512] * 8, [False] * 8)
    assert lad.cap <= 4096
    # at the starting cap, collapse no longer changes anything
    lad.cap = 4096
    for _ in range(6):
        assert lad.observe([4096] * 8, [False] * 8) is None
