"""GFlowNet core: Gumbel-top-k rollout equivalence, policies, TB loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.gfn.rollout import (
    gumbel_topk_rollout,
    sequential_logprobs,
    scan_rollout,
)
from gflownet_spai_tpu.gfn.loss import log_reward, trajectory_balance_loss
from gflownet_spai_tpu.models import (
    backward_policy_batch,
    backward_policy_init,
    backward_policy_logprobs,
    forward_policy_alpha,
    forward_policy_init,
    forward_policy_logits,
    graph_from_seed,
)
from gflownet_spai_tpu.models.gat import gatv2_apply, gatv2_init, segment_softmax


# ---------------------------------------------------------------------------
# rollout
# ---------------------------------------------------------------------------

def test_gumbel_logprobs_match_sequential_oracle():
    """Per-step fwd log-probs of a Gumbel-sampled trajectory must equal the
    sequential masked-categorical evaluation of the same action sequence."""
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (3, 12), jnp.float64)
    roll = gumbel_topk_rollout(logits, key, terminal_action=11)
    for b in range(3):
        want = sequential_logprobs(logits[b], roll.actions[b])
        np.testing.assert_allclose(
            np.asarray(roll.fwd_logprobs[b]), np.asarray(want), rtol=1e-10
        )


def test_gumbel_trajectory_structure():
    key = jax.random.PRNGKey(2)
    logits = jnp.zeros((8, 6))
    roll = gumbel_topk_rollout(logits, key, terminal_action=5)
    acts = np.asarray(roll.actions)
    lens = np.asarray(roll.lengths)
    for b in range(8):
        traj = acts[b][acts[b] >= 0]
        assert len(traj) == lens[b]
        assert traj[-1] == 5                      # ends with terminal
        assert 5 not in traj[:-1]
        assert len(set(traj.tolist())) == len(traj)  # no repeats (masking invariant)
        assert (acts[b][lens[b]:] == -1).all()


def test_gumbel_distribution_matches_sequential_sampler():
    """Statistical check of the Plackett–Luce equivalence on 3 actions
    (terminal = 2): full-trajectory frequencies vs exact probabilities."""
    logits = jnp.asarray([0.3, -0.5, 0.1], jnp.float64)
    N = 40000
    roll = gumbel_topk_rollout(
        jnp.broadcast_to(logits, (N, 3)), jax.random.PRNGKey(3), terminal_action=2
    )
    acts = np.asarray(roll.actions)
    # enumerate all trajectories ending in 2: (2,), (0,2), (1,2), (0,1,2), (1,0,2)
    seqs = [(2,), (0, 2), (1, 2), (0, 1, 2), (1, 0, 2)]
    p = np.exp(np.asarray(logits) - np.logaddexp.reduce(np.asarray(logits)))

    def exact_prob(seq):
        remaining = [0, 1, 2]
        prob = 1.0
        for a in seq:
            z = sum(p[r] for r in remaining)
            prob *= p[a] / z
            remaining.remove(a)
        return prob

    for seq in seqs:
        want = exact_prob(seq)
        got = np.mean([tuple(a[a >= 0]) == seq for a in acts])
        assert abs(got - want) < 4 * np.sqrt(want * (1 - want) / N) + 1e-3, (seq, got, want)


def test_scan_rollout_grid():
    from gflownet_spai_tpu.env import grid as G

    g = G.GridEnv(size=5)

    def logits_fn(idx, t):
        m = G.mask(g, idx)
        return jnp.where(m, 0.0, -jnp.inf)

    def update_fn(idx, a):
        return G.update(g, idx, a)

    keys = jax.random.split(jax.random.PRNGKey(4), 64)
    finals, rolls = jax.vmap(
        lambda k: scan_rollout(logits_fn, update_fn, jnp.asarray(0), k,
                               G.TERMINATE, max_steps=12)
    )(keys)
    finals = np.asarray(finals)
    assert (finals >= 0).all() and (finals < 25).all()
    # positions must be reachable by down/right moves only
    acts = np.asarray(rolls.actions)
    for b in range(64):
        traj = acts[b][acts[b] >= 0]
        assert traj[-1] == G.TERMINATE
        r, c = finals[b] // 5, finals[b] % 5
        downs = (traj == G.DOWN).sum()
        rights = (traj == G.RIGHT).sum()
        assert (r, c) == (downs, rights)


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

def test_segment_softmax_vs_dense():
    key = jax.random.PRNGKey(0)
    scores = jax.random.normal(key, (10, 4), jnp.float64)
    seg = jnp.asarray([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
    out = np.asarray(segment_softmax(scores, seg, 4))
    s = np.asarray(scores)
    for i in range(4):
        m = np.asarray(seg) == i
        want = np.exp(s[m]) / np.exp(s[m]).sum(0)
        np.testing.assert_allclose(out[m], want, rtol=1e-10)


def test_gatv2_permutation_equivariance():
    """Relabeling edge order must not change node outputs."""
    key = jax.random.PRNGKey(5)
    p = gatv2_init(key, 3, 4, heads=2, dtype=jnp.float64)
    N, E = 6, 10
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    dst = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    x = jnp.asarray(rng.standard_normal((N, 3)))
    ea = jnp.asarray(rng.standard_normal((E, 1)))
    out1 = gatv2_apply(p, x, src, dst, ea, N, 2, 4)
    perm = rng.permutation(E)
    out2 = gatv2_apply(p, x, src[perm], dst[perm], ea[perm], N, 2, 4)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-10)


def test_gatv2_attention_normalized():
    """With identical node features, an isolated node (self-loop only)
    aggregates exactly its own transformed feature + bias."""
    key = jax.random.PRNGKey(6)
    p = gatv2_init(key, 2, 3, heads=1, dtype=jnp.float64)
    N = 4
    x = jnp.ones((N, 2), jnp.float64)
    src = jnp.asarray([0, 1], jnp.int32)
    dst = jnp.asarray([1, 0], jnp.int32)
    ea = jnp.asarray([[0.5], [0.2]])
    out = gatv2_apply(p, x, src, dst, ea, N, 1, 3)
    want_isolated = (x[2] @ p.w_src + p.b_src) + p.bias
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(want_isolated), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(out[2]), rtol=1e-12)


def test_forward_policy_shapes_and_alpha():
    from gflownet_spai_tpu.sparse import gallery
    from gflownet_spai_tpu.env import seed_pattern

    seed = seed_pattern(gallery.get("LF10_like"), method="ilu0", dtype=jnp.float64)
    g = graph_from_seed(seed)
    A = seed.nnz + 1
    p = forward_policy_init(jax.random.PRNGKey(7), 4, A, dtype=jnp.float64)
    logits = forward_policy_logits(p, g, A, 4)
    assert logits.shape == (A,)
    assert np.isfinite(np.asarray(logits)).all()
    assert float(forward_policy_alpha(p)) == pytest.approx(0.5)  # sigmoid(0)


def test_backward_policy_padding_contributes_zero():
    p = backward_policy_init(jax.random.PRNGKey(8), 4, 10, dtype=jnp.float64)
    acts = jnp.asarray([3, 1, 9, -1, -1, -1], jnp.int32)
    lp = np.asarray(backward_policy_logprobs(p, acts, 4))
    assert (lp[3:] == 0.0).all()
    np.testing.assert_allclose(np.exp(lp[:3]).sum(), 1.0, rtol=1e-10)
    # batch version agrees
    lp_b = np.asarray(backward_policy_batch(p, acts[None, :], 4))
    np.testing.assert_allclose(lp_b[0], lp, rtol=1e-12)


def test_backward_policy_ignores_trailing_padding():
    """The LSTM carry freezes on padded steps: padding must not change the
    distribution over valid steps."""
    p = backward_policy_init(jax.random.PRNGKey(9), 4, 12, dtype=jnp.float64)
    a1 = jnp.asarray([5, 2, 11, -1, -1], jnp.int32)
    a2 = jnp.asarray([5, 2, 11, -1, -1, -1, -1, -1], jnp.int32)
    lp1 = np.asarray(backward_policy_logprobs(p, a1, 4))
    lp2 = np.asarray(backward_policy_logprobs(p, a2, 4))
    np.testing.assert_allclose(lp1[:3], lp2[:3], rtol=1e-12)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def test_tb_loss_zero_at_balance():
    lz = jnp.asarray(1.5)
    lr = jnp.asarray([0.5, -0.2])
    f = jnp.asarray([-2.0, -1.0])
    b = lz + f - lr
    assert float(trajectory_balance_loss(lz, lr, f, b)) == pytest.approx(0.0)


def test_tb_loss_textbook_value():
    lz = jnp.asarray(0.0)
    lr = jnp.asarray([0.0])
    f = jnp.asarray([-1.0])
    b = jnp.asarray([0.0])
    assert float(trajectory_balance_loss(lz, lr, f, b)) == pytest.approx(1.0)


def test_log_reward_clamps_negative():
    r = jnp.asarray([-5.0, 0.0, 2.0])
    lr = np.asarray(log_reward(r))
    assert np.isfinite(lr).all()
    np.testing.assert_allclose(lr[2], np.log(2.0))


def test_gradients_flow_to_all_parameter_groups():
    """TB loss must produce nonzero grads for GAT, fc head, α, log Z, and
    the backward LSTM (the reference's check_gradients audit,
    GFlowNet100.py:192-198, as an assertion)."""
    import jax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import loss_fn
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions)
    params = init_params(jax.random.PRNGKey(0), cfg)
    grads, _ = jax.grad(loss_fn, has_aux=True)(
        params, env, graph, cfg, jax.random.PRNGKey(1), 8
    )

    def norm(t):
        return float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(t)))

    assert norm(grads.forward.gat1) > 0, "no grad into GAT layer 1"
    assert norm(grads.forward.gat2) > 0, "no grad into GAT layer 2"
    assert norm(grads.forward.fc_w) > 0, "no grad into action head"
    assert abs(float(grads.forward.alpha)) > 0, "no grad into alpha"
    assert abs(float(grads.log_z)) > 0, "no grad into log Z"
    assert norm(grads.backward) > 0, "no grad into backward LSTM"
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all()), "non-finite gradient"


def test_reward_f32_f64_consistency():
    """f32 rewards must track the f64 oracle within solver-grade tolerance
    (SURVEY.md §7 hard part #5 numerics-parity check)."""
    import numpy as np
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.env.spai import reward
    from gflownet_spai_tpu.sparse import gallery
    from gflownet_spai_tpu.sparse.types import COO

    a64 = gallery.get("olm500_like")
    seed64 = seed_pattern(a64, method="ilu0", dtype=jnp.float64)
    env64 = make_env(seed64, original=a64)
    a32 = COO(row=a64.row, col=a64.col, data=a64.data.astype(jnp.float32),
              shape=a64.shape)
    seed32 = COO(row=seed64.row, col=seed64.col,
                 data=seed64.data.astype(jnp.float32), shape=seed64.shape)
    env32 = make_env(seed32, original=a32)
    rng = np.random.default_rng(0)
    for _ in range(3):
        keep = jnp.asarray(rng.random(env64.num_edges) > 0.4)
        r64 = float(reward(env64, keep, jnp.asarray(0.5)))
        r32 = float(reward(env32, keep, jnp.asarray(0.5, jnp.float32)))
        assert abs(r64 - r32) < 1e-2 * max(1.0, abs(r64)), (r64, r32)


def test_vargrad_loss_properties():
    from gflownet_spai_tpu.gfn.loss import vargrad_loss
    lr = jnp.asarray([1.0, 2.0, 0.5])
    f = jnp.asarray([-3.0, -2.0, -3.5])
    # perfectly balanced: delta constant -> zero variance
    b = f - lr + 7.0
    assert float(vargrad_loss(lr, f, b)) == pytest.approx(0.0)
    b2 = b.at[0].add(1.0)
    assert float(vargrad_loss(lr, f, b2)) > 0


def test_vargrad_training_improves_on_lf10():
    import optax
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import loss_fn
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions,
                         loss="vargrad")
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, env, graph, cfg, key, 16)
        u, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, u), opt_state, l

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(120):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        losses.append(float(l))
    assert np.mean(losses[-20:]) < np.mean(losses[:20])


def test_temperature_rescoring_exact():
    """With temperature != 1, logged fwd log-probs must be the *untempered*
    policy's probabilities of the sampled trajectories."""
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params, sample
    from gflownet_spai_tpu.gfn.rollout import sequential_logprobs
    from gflownet_spai_tpu.models import graph_from_seed, forward_policy_logits
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float64)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=env.num_actions,
                         temperature=2.5)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    out = sample(params, env, graph, cfg, jax.random.PRNGKey(3), batch_size=4)
    logits = forward_policy_logits(params.forward, graph, cfg.num_actions, 4)
    for b in range(4):
        want = sequential_logprobs(logits, out.rollout.actions[b])
        np.testing.assert_allclose(
            np.asarray(out.rollout.fwd_logprobs[b]), np.asarray(want),
            rtol=1e-10)


def _subtb_bruteforce(log_flows, log_rewards, fwd_lp, back_lp, lengths, lam):
    """O(T²) reference for subtb_loss: explicit pair sum per trajectory."""
    B, T = fwd_lp.shape
    out = []
    for b in range(B):
        L = int(lengths[b])
        P = np.concatenate([[0.0], np.cumsum(fwd_lp[b] - back_lp[b])])
        logF = np.array(log_flows[b], np.float64)
        logF[L] = log_rewards[b]
        num, den = 0.0, 0.0
        for i in range(L + 1):
            for j in range(i + 1, L + 1):
                A = logF[i] - logF[j] + (P[j] - P[i])
                w = lam ** (j - i)
                num += w * A * A
                den += w
        out.append(num / den)
    return float(np.mean(out))


@pytest.mark.parametrize("lam", [0.5, 0.9, 1.0])
def test_subtb_loss_matches_bruteforce(lam):
    from gflownet_spai_tpu.gfn.loss import subtb_loss

    rng = np.random.default_rng(0)
    B, T = 3, 7
    lengths = np.array([3, 7, 1], np.int32)
    fwd = rng.standard_normal((B, T))
    back = rng.standard_normal((B, T))
    for b in range(B):                       # padding beyond length is zero
        fwd[b, lengths[b]:] = 0.0
        back[b, lengths[b]:] = 0.0
    flows = rng.standard_normal((B, T + 1))
    rewards = rng.standard_normal(B)

    got = float(subtb_loss(
        jnp.asarray(flows), jnp.asarray(rewards), jnp.asarray(fwd),
        jnp.asarray(back), jnp.asarray(lengths), lam=lam,
    ))
    want = _subtb_bruteforce(flows, rewards, fwd, back, lengths, lam)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_subtb_zero_at_perfect_flows():
    """If flows exactly telescope the transition log-probs and terminate at
    log R, every sub-trajectory is balanced and the loss is 0."""
    from gflownet_spai_tpu.gfn.loss import subtb_loss

    rng = np.random.default_rng(1)
    B, T = 2, 5
    lengths = np.full((B,), T, np.int32)
    fwd = rng.standard_normal((B, T))
    back = rng.standard_normal((B, T))
    log_r = rng.standard_normal(B)
    P = np.concatenate([np.zeros((B, 1)), np.cumsum(fwd - back, -1)], -1)
    # logF_t = logR + (P_t − P_T) makes every A_ij = c_i − c_j vanish
    flows = log_r[:, None] + P - P[:, -1:]
    loss = float(subtb_loss(
        jnp.asarray(flows), jnp.asarray(log_r), jnp.asarray(fwd),
        jnp.asarray(back), jnp.asarray(lengths), lam=0.8,
    ))
    assert abs(loss) < 1e-10


def test_subtb_gradients_flow_and_trains_on_lf10(tmp_path):
    from gflownet_spai_tpu.train.config import TrainConfig
    from gflownet_spai_tpu.train.loop import train

    cfg = TrainConfig(matrix="LF10_like", num_epochs=8, batch_size=4,
                      loss="subtb", subtb_lambda=0.9, platform="cpu",
                      out_dir=str(tmp_path))
    state, history = train(cfg)
    assert np.isfinite(history).all()
    # flow head received gradient updates (non-zero after training)
    assert float(jnp.abs(state.params.flow.poly_w).sum()) > 0
    assert float(jnp.abs(state.params.flow.edge_d).sum()) > 0


def test_trajectory_logprobs_matches_sequential_oracle():
    from gflownet_spai_tpu.gfn.rollout import (
        gumbel_topk_rollout, sequential_logprobs, trajectory_logprobs,
    )

    A = 12
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (A,))
    roll = gumbel_topk_rollout(
        jnp.broadcast_to(logits, (6, A)), jax.random.PRNGKey(4),
        terminal_action=A - 1,
    )
    for b in range(6):
        fast = trajectory_logprobs(logits, roll.actions[b])
        slow = sequential_logprobs(logits, roll.actions[b])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   rtol=1e-6, atol=1e-6)
        # and both match the rollout's own per-step log-probs
        np.testing.assert_allclose(np.asarray(fast),
                                   np.asarray(roll.fwd_logprobs[b]),
                                   rtol=1e-5, atol=1e-5)


def test_trajectory_logprobs_short_padding():
    """T < A and heavy padding: padded slots contribute exactly 0."""
    from gflownet_spai_tpu.gfn.rollout import (
        sequential_logprobs, trajectory_logprobs,
    )

    A = 9
    logits = jax.random.normal(jax.random.PRNGKey(5), (A,))
    actions = jnp.asarray([4, 0, 8, -1, -1], jnp.int32)     # T=5 < A
    fast = trajectory_logprobs(logits, actions)
    slow = sequential_logprobs(logits, jnp.pad(actions, (0, A - 5),
                                               constant_values=-1))[:5]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(fast[3:]).sum()) == 0.0


# ---------------------------------------------------------------------------
# replay buffer
# ---------------------------------------------------------------------------

def test_replay_buffer_topk_and_dedup():
    from gflownet_spai_tpu.gfn.replay import (
        replay_init, replay_sample, replay_update,
    )

    buf = replay_init(capacity=3, traj_len=4)
    a1 = jnp.asarray([[0, 3, -1, -1], [1, 3, -1, -1]], jnp.int32)
    buf = replay_update(buf, a1, jnp.asarray([5.0, 7.0]))
    r = np.asarray(buf.rewards)
    assert set(r[np.isfinite(r)].tolist()) == {5.0, 7.0}

    # same trajectories again: dedup keeps the buffer at 2 unique entries
    buf = replay_update(buf, a1, jnp.asarray([5.0, 7.0]))
    r = np.asarray(buf.rewards)
    assert np.isfinite(r).sum() == 2

    # a better trajectory displaces the worst once capacity is exceeded
    a2 = jnp.asarray([[2, 3, -1, -1], [0, 1, 3, -1]], jnp.int32)
    buf = replay_update(buf, a2, jnp.asarray([9.0, 6.0]))
    r = np.asarray(buf.rewards)
    assert np.isfinite(r).sum() == 3
    assert set(r.tolist()) == {9.0, 7.0, 6.0}

    # sampling returns only filled slots, marked valid
    acts, rews, valid = replay_sample(buf, jax.random.PRNGKey(0), 8)
    assert bool(valid.all())
    assert all(float(x) in {9.0, 7.0, 6.0} for x in np.asarray(rews))


def test_replay_sample_empty_buffer_is_invalid():
    from gflownet_spai_tpu.gfn.replay import replay_init, replay_sample

    buf = replay_init(capacity=4, traj_len=3)
    _, _, valid = replay_sample(buf, jax.random.PRNGKey(1), 5)
    assert not bool(valid.any())


def test_replay_training_runs_and_buffer_fills(tmp_path):
    from gflownet_spai_tpu.train.config import TrainConfig
    from gflownet_spai_tpu.train.loop import train

    cfg = TrainConfig(matrix="LF10_like", num_epochs=10, batch_size=4,
                      replay_size=8, replay_samples=2, platform="cpu",
                      out_dir=str(tmp_path))
    state, history = train(cfg)
    assert np.isfinite(history).all()
    r = np.asarray(state.replay.rewards)
    assert np.isfinite(r).sum() >= 4          # buffer accumulated samples
    # buffer is sorted-by-construction top-k: rewards are the best seen
    csv = (tmp_path / "detailed_training_log.csv").read_text().splitlines()[1:]
    seen = [float(line.split(",")[-1]) for line in csv]
    assert np.isclose(r[np.isfinite(r)].max(), max(seen), rtol=1e-5)


def test_subtb_weight_zero_length_zero_entry_is_finite():
    """Regression: a length-0 weight-0 (empty replay slot) entry used to
    produce 0/0 = NaN because the 1e-38 divide guard is subnormal in f32
    and XLA flushes it to zero."""
    from gflownet_spai_tpu.gfn.loss import subtb_loss

    B, T = 2, 5
    loss = subtb_loss(
        jnp.zeros((B, T + 1)), jnp.asarray([1.0, 2.0]),
        jnp.zeros((B, T)), jnp.zeros((B, T)),
        jnp.asarray([3, 0], jnp.int32), lam=0.9,
        weights=jnp.asarray([1.0, 0.0]),
    )
    assert np.isfinite(float(loss))


def test_uniform_backward_closed_form():
    """Uniform-parent backward: −log(t) per deletion, 0 on terminal/padding."""
    from gflownet_spai_tpu.models.policies import uniform_backward_logprobs

    term = 5
    actions = jnp.asarray([[2, 0, 4, term, -1, -1],
                           [term, -1, -1, -1, -1, -1]], jnp.int32)
    lp = np.asarray(uniform_backward_logprobs(actions, terminal_action=term))
    np.testing.assert_allclose(
        lp[0], [-np.log(1), -np.log(2), -np.log(3), 0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(lp[1], np.zeros(6), atol=1e-6)


def test_linear_backward_matches_sequential_recurrence():
    """Associative-scan linear backward equals an explicit per-step loop,
    and padding contributes exactly zero / freezes the carry."""
    from gflownet_spai_tpu.models.policies import (
        linear_backward_init, linear_backward_logprobs,
    )

    A, H, T = 12, 6, 9
    p = linear_backward_init(jax.random.PRNGKey(3), H, A)
    actions = jnp.asarray([7, 2, 0, 11, 4, -1, -1, -1, -1], jnp.int32)
    got = np.asarray(linear_backward_logprobs(p, actions))

    # sequential oracle
    h = np.zeros(H)
    for t in range(T):
        a_t = int(actions[t])
        if a_t < 0:
            continue
        g = 1.0 / (1.0 + np.exp(-float(p.emb_g[a_t])))
        h = g * h + (1.0 - g) * np.asarray(p.emb_v[a_t])
    logits = h @ np.asarray(p.fc_w) + np.asarray(p.fc_b)
    n_valid = 5
    masked = np.where(np.arange(T) < n_valid, logits[:T], -np.inf)
    mx = masked.max()
    logp = masked - (mx + np.log(np.exp(masked - mx).sum()))
    want = np.where(np.arange(T) < n_valid, logp, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (got[n_valid:] == 0).all()


@pytest.mark.parametrize("backward", ["linear", "uniform"])
def test_training_with_tpu_native_backward(backward):
    """End-to-end train steps run and the loss is finite with the parallel
    backward policies (lstm parity is covered by the rest of the suite)."""
    from gflownet_spai_tpu.train import TrainConfig, make_train_step, setup

    cfg = TrainConfig(matrix="LF10_like", batch_size=4, num_epochs=3,
                      backward=backward)
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    step = make_train_step(cfg, env, graph, mcfg, opt)
    losses = []
    for _ in range(3):
        state, m = step(state)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)


def test_replay_prioritized_sampling_distribution():
    """Rank-based priority: higher-reward slots are drawn ∝ (1+rank)^−α;
    empty slots never drawn; α=0 stays uniform."""
    from gflownet_spai_tpu.gfn.replay import replay_init, replay_sample, replay_update

    buf = replay_init(capacity=4, traj_len=3)
    acts = jnp.asarray([[0, 2, -1], [1, 2, -1], [0, 1, 2]], jnp.int32)
    buf = replay_update(buf, acts, jnp.asarray([10.0, 5.0, 1.0]))

    n = 4000
    _, rews, valid = replay_sample(buf, jax.random.PRNGKey(7), n,
                                   prioritized=2.0)
    assert bool(valid.all())
    rews = np.asarray(rews)
    counts = {r: int((rews == r).sum()) for r in (10.0, 5.0, 1.0)}
    # P ∝ 1, 1/4, 1/9 → normalized ≈ .734, .183, .082
    assert counts[10.0] > counts[5.0] > counts[1.0]
    np.testing.assert_allclose(counts[10.0] / n, 36 / 49, atol=0.05)

    _, rews_u, _ = replay_sample(buf, jax.random.PRNGKey(8), n)
    u = {r: int((np.asarray(rews_u) == r).sum()) / n for r in (10.0, 5.0, 1.0)}
    for f in u.values():
        np.testing.assert_allclose(f, 1 / 3, atol=0.05)


def test_subtb_partial_trajectory_keeps_learned_flow_at_truncation():
    """gfn.loss.subtb_loss(terminated=...): a non-terminated entry must be
    scored with the LEARNED flow at slot L (not the reward).  Equivalent
    formulation check: terminated=False == terminated=True with the reward
    set to the learned flow value."""
    import jax.numpy as jnp
    import numpy as np
    from gflownet_spai_tpu.gfn.loss import subtb_loss

    rng = np.random.default_rng(3)
    B, T = 1, 5
    log_flows = jnp.asarray(rng.standard_normal((B, T + 1)), jnp.float32)
    fwd = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    back = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    lengths = jnp.asarray([T], jnp.int32)
    log_r = jnp.asarray([2.5], jnp.float32)

    l_part = subtb_loss(log_flows, log_r, fwd, back, lengths,
                        terminated=jnp.asarray([False]))
    l_equiv = subtb_loss(log_flows, log_flows[:, T], fwd, back, lengths,
                         terminated=jnp.asarray([True]))
    np.testing.assert_allclose(float(l_part), float(l_equiv), rtol=1e-6)
    # and it differs from the reward-substituted loss (reward != flow here)
    l_full = subtb_loss(log_flows, log_r, fwd, back, lengths)
    assert abs(float(l_part) - float(l_full)) > 1e-4


def test_replay_resize_shrink_and_grow():
    import jax.numpy as jnp
    import numpy as np
    from gflownet_spai_tpu.gfn.replay import ReplayBuffer, replay_resize

    buf = ReplayBuffer(
        actions=jnp.asarray([[3, 9, -1, -1], [1, 2, 5, 7]], jnp.int32),
        rewards=jnp.asarray([10.0, 20.0], jnp.float32),
    )
    small = replay_resize(buf, 2)
    # entry 0 fits in 2 slots; entry 1 (4 actions) is dropped
    np.testing.assert_array_equal(np.asarray(small.actions),
                                  [[3, 9], [-1, -1]])
    assert np.asarray(small.rewards)[0] == 10.0
    assert not np.isfinite(np.asarray(small.rewards)[1])
    big = replay_resize(buf, 6)
    np.testing.assert_array_equal(
        np.asarray(big.actions),
        [[3, 9, -1, -1, -1, -1], [1, 2, 5, 7, -1, -1]])
    np.testing.assert_array_equal(np.asarray(big.rewards),
                                  np.asarray(buf.rewards))
    assert replay_resize(buf, 4) is buf


def test_gumbel_topk_rollout_t_cap_prefix_parity():
    """The capped rollout's prefix (actions AND per-step log-probs) is
    bit-identical in distribution to the uncapped path: same noise → same
    first-t_cap order; log-probs agree to numerical tolerance (the suffix
    normalizer becomes prefix-cumsum + total tail mass under the cap)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout

    rng = np.random.default_rng(11)
    B, A, cap = 6, 300, 32
    logits = jnp.asarray(rng.standard_normal((B, A)) * 2, jnp.float32)
    g = jnp.asarray(rng.gumbel(size=(B, A)), jnp.float32)
    term = A - 1

    full = gumbel_topk_rollout(logits, None, term, gumbels=g)
    capped = gumbel_topk_rollout(logits, None, term, gumbels=g, t_cap=cap)
    assert capped.actions.shape == (B, cap)

    full_a = np.asarray(full.actions)
    full_lp = np.asarray(full.fwd_logprobs)
    cap_a = np.asarray(capped.actions)
    cap_lp = np.asarray(capped.fwd_logprobs)
    full_len = np.asarray(full.lengths)
    for b in range(B):
        if full_len[b] <= cap:
            # terminated inside the prefix: identical trajectory + padding
            np.testing.assert_array_equal(cap_a[b], full_a[b, :cap])
            np.testing.assert_allclose(cap_lp[b], full_lp[b, :cap],
                                       rtol=1e-5, atol=1e-6)
            assert capped.lengths[b] == full_len[b]
        else:
            # truncated: the whole prefix is kept (no -1), same order as
            # the uncapped sort, log-probs match the uncapped per-step lps
            assert (cap_a[b] >= 0).all()
            # uncapped actions are -1 beyond the terminal, so compare
            # against the order: recompute from the perturbed sort
            order = np.asarray(jnp.argsort(-(logits + g), axis=-1))[b]
            np.testing.assert_array_equal(cap_a[b], order[:cap])
            sorted_logits = np.asarray(logits)[b][order]
            # reference suffix logsumexp
            slse = np.logaddexp.reduce(sorted_logits[::-1])  # total
            ref = []
            tail = np.logaddexp.reduce(
                np.sort(sorted_logits)[::-1][::-1])  # noop; compute directly
            suf = np.full(A, -np.inf)
            acc = -np.inf
            for t in range(A - 1, -1, -1):
                acc = np.logaddexp(acc, sorted_logits[t])
                suf[t] = acc
            ref_lp = sorted_logits[:cap] - suf[:cap]
            np.testing.assert_allclose(cap_lp[b], ref_lp,
                                       rtol=1e-5, atol=1e-6)
            assert capped.lengths[b] == cap


def test_loss_fn_t_cap_subtb_trains_on_truncated_batches():
    """Dense loss_fn with cfg.t_cap ≪ typical trajectory length: subtb
    stays finite with nonzero gradients (partial trajectories); tb
    weight-0s the truncated samples (loss 0 when nothing terminates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gflownet_spai_tpu.env import make_env, seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.gfn.gflownet import loss_fn
    from gflownet_spai_tpu.models import graph_from_seed
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("bcsstk03_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = make_env(seed, original=a)
    graph = graph_from_seed(seed)
    A = env.num_actions
    cap = 16
    assert cap < A // 4

    cfg = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                         backward="linear", loss="subtb", t_cap=cap)
    params = init_params(jax.random.PRNGKey(0), cfg)
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, env, graph, cfg, jax.random.PRNGKey(4), 8)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert aux["actions"].shape == (8, cap)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0

    cfg_tb = cfg._replace(loss="tb")
    params_tb = init_params(jax.random.PRNGKey(0), cfg_tb)
    loss_tb, _ = loss_fn(params_tb, env, graph, cfg_tb,
                         jax.random.PRNGKey(4), 8)
    assert float(loss_tb) == 0.0      # nothing terminated → all weight-0


def test_edge_feats_channel_zero_init_parity_and_effect():
    """The value-aware action-head channel (edge_feats): zero-init leaves
    the logits reference-exact; a negative feat_w raises small-magnitude
    entries' logits relative to large ones (terminal unshifted)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gflownet_spai_tpu.env import seed_pattern
    from gflownet_spai_tpu.gfn import GFlowNetConfig, init_params
    from gflownet_spai_tpu.models.policies import (
        forward_policy_logits, graph_from_seed)
    from gflownet_spai_tpu.sparse import gallery

    a = gallery.get("LF10_like")
    seed = seed_pattern(a, "spai", k=2)
    g = graph_from_seed(seed)
    A = seed.nnz + 1
    cfg_on = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A,
                            edge_feats=True)
    cfg_off = GFlowNetConfig(hidden_dim=4, heads=4, num_actions=A)
    p_on = init_params(jax.random.PRNGKey(0), cfg_on)
    p_off = init_params(jax.random.PRNGKey(0), cfg_off)
    assert p_on.forward.feat_w is not None and p_off.forward.feat_w is None
    l_on = forward_policy_logits(p_on.forward, g, A, 4)
    l_off = forward_policy_logits(p_off.forward, g, A, 4)
    np.testing.assert_allclose(np.asarray(l_on), np.asarray(l_off),
                               rtol=1e-6)           # zero-init parity

    fw = p_on.forward._replace(feat_w=jnp.asarray([-2.0]))
    l_neg = np.asarray(forward_policy_logits(fw, g, A, 4))
    shift = l_neg - np.asarray(l_on)
    mags = np.abs(np.asarray(seed.data))
    small, big = np.argmin(mags), np.argmax(mags)
    assert shift[small] > shift[big]                # small entries favored
    assert shift[-1] == 0.0                         # terminal untouched
