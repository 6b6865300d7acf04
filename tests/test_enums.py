"""Edge-enumeration versioning (train.enums).

Window-order rowblock plans define the action-id enumeration
(sparse.rowblock docstring); checkpoints stamp it (enum.json +
enum_perm.npy) and restores verify / remap / refuse.  VERDICT r3 item 5 —
what makes ``rowblock_order="window"`` safe as the default.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gflownet_spai_tpu.train import TrainConfig, setup
from gflownet_spai_tpu.train.loop import restore_checkpoint, save_checkpoint
from gflownet_spai_tpu.train import enums


def _cfg(order, out_dir, backward="linear", loss="subtb"):
    return TrainConfig(
        matrix="orsirr_like32", env_format="rowblock",
        rowblock_order=order, reward_baseline="identity",
        backward=backward, loss=loss, batch_size=2,
        replay_size=4, replay_samples=1, plateau_patience=0,
        out_dir=str(out_dir),
    )


def _edge_match_perm(seed_new, seed_old):
    """o_idx with new edge j == old edge o_idx[j], by (row, col) matching."""
    n = seed_old.shape[1]
    key_old = np.asarray(seed_old.row).astype(np.int64) * n + np.asarray(
        seed_old.col)
    key_new = np.asarray(seed_new.row).astype(np.int64) * n + np.asarray(
        seed_new.col)
    order_old = np.argsort(key_old)
    pos = np.searchsorted(key_old[order_old], key_new)
    return order_old[pos]


def test_enum_roundtrip_remaps_across_orders(tmp_path):
    """Train-order sorted → checkpoint → restore under window order: the
    id-indexed params are permuted so the policy DISTRIBUTION is preserved
    (forward logits follow the edge relabeling exactly; backward/flow
    log-probs of corresponding trajectories are identical)."""
    from gflownet_spai_tpu.models import policies as pol

    cfg_s = _cfg("sorted", tmp_path / "run")
    _, _, env_s, graph_s, mcfg, opt, state = setup(cfg_s)
    save_checkpoint(cfg_s.out_dir, state, env=env_s)
    meta = enums.load_enum_meta(cfg_s.out_dir)
    assert meta is not None and meta["order"] == "sorted"

    cfg_w = _cfg("window", tmp_path / "run")
    _, _, env_w, graph_w, mcfg_w, opt_w, state_w = setup(cfg_w)
    assert env_w.rb.edge_perm is not None    # window really permuted
    restored = restore_checkpoint(cfg_w.out_dir, state_w)
    new_state, remapped = enums.reconcile(
        cfg_w.out_dir, env_w, restored, backward="linear", opt=opt_w)
    assert remapped

    o_idx = _edge_match_perm(env_w.seed, env_s.seed)
    assert (o_idx != np.arange(o_idx.shape[0])).any()

    # forward logits: new action j ≡ old action o_idx[j] (same edge)
    lg_old = np.asarray(pol.forward_policy_logits(
        state.params.forward, graph_s, env_s.num_actions, cfg_s.hidden_dim))
    lg_new = np.asarray(pol.forward_policy_logits(
        new_state.params.forward, graph_w, env_w.num_actions,
        cfg_w.hidden_dim))
    np.testing.assert_allclose(lg_new[:-1], lg_old[o_idx], rtol=1e-6)
    np.testing.assert_allclose(lg_new[-1], lg_old[-1], rtol=1e-6)  # terminal

    # backward (linear) + flow head: a trajectory expressed in each
    # enumeration scores identical log-probs
    rng = np.random.default_rng(0)
    E = env_s.num_edges
    acts_old = np.full((3, 6), -1, np.int32)
    for b in range(3):
        k = rng.integers(1, 5)
        acts_old[b, :k] = rng.choice(E, size=k, replace=False)
        acts_old[b, k] = E                     # terminal
    inv = np.empty(E, np.int64)
    inv[o_idx] = np.arange(E)
    acts_new = np.where(acts_old < 0, acts_old,
                        np.where(acts_old == E, E, inv[np.minimum(acts_old, E - 1)]))
    lp_old = np.asarray(pol.linear_backward_batch(
        state.params.backward, jnp.asarray(acts_old)))
    lp_new = np.asarray(pol.linear_backward_batch(
        new_state.params.backward, jnp.asarray(acts_new)))
    np.testing.assert_allclose(lp_new, lp_old, rtol=1e-6, atol=1e-7)
    lf_old = np.asarray(pol.flow_head_logF(
        state.params.flow, jnp.asarray(acts_old)))
    lf_new = np.asarray(pol.flow_head_logF(
        new_state.params.flow, jnp.asarray(acts_new)))
    np.testing.assert_allclose(lf_new, lf_old, rtol=1e-6, atol=1e-7)

    # replay buffer actions were remapped with the same lut
    got = np.asarray(new_state.replay.actions)
    want = np.asarray(enums.remap_actions(
        restored.replay.actions, o_idx, E))
    np.testing.assert_array_equal(got, want)


def test_enum_same_order_is_noop(tmp_path):
    cfg = _cfg("window", tmp_path / "run")
    _, _, env, _, _, opt, state = setup(cfg)
    save_checkpoint(cfg.out_dir, state, env=env)
    restored = restore_checkpoint(cfg.out_dir, state)
    out, remapped = enums.reconcile(cfg.out_dir, env, restored,
                                    backward="linear", opt=opt)
    assert not remapped
    np.testing.assert_array_equal(np.asarray(out.params.forward.fc_w),
                                  np.asarray(restored.params.forward.fc_w))


def test_enum_lstm_refuses_cross_order(tmp_path):
    cfg_s = _cfg("sorted", tmp_path / "run", backward="lstm", loss="tb")
    _, _, env_s, _, _, _, state = setup(cfg_s)
    save_checkpoint(cfg_s.out_dir, state, env=env_s)
    cfg_w = _cfg("window", tmp_path / "run", backward="lstm", loss="tb")
    _, _, env_w, _, _, _, state_w = setup(cfg_w)
    restored = restore_checkpoint(cfg_w.out_dir, state_w)
    with pytest.raises((ValueError, SystemExit)):
        enums.reconcile(cfg_w.out_dir, env_w, restored, backward="lstm")


def test_enum_different_edge_set_refuses(tmp_path):
    cfg_a = _cfg("sorted", tmp_path / "run")
    _, _, env_a, _, _, _, state = setup(cfg_a)
    save_checkpoint(cfg_a.out_dir, state, env=env_a)
    # same nnz count is not required for the refusal — any other matrix
    cfg_b = TrainConfig(matrix="LF10_like", out_dir=str(tmp_path / "run"))
    _, _, env_b, _, _, _, state_b = setup(cfg_b)
    with pytest.raises(SystemExit):
        enums.reconcile(cfg_b.out_dir, env_b, state_b, backward="linear")


def test_enum_missing_stamp_warns(tmp_path):
    cfg = _cfg("window", tmp_path / "run")
    _, _, env, _, _, _, state = setup(cfg)
    (tmp_path / "run" / "checkpoint").mkdir(parents=True, exist_ok=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out, remapped = enums.reconcile(str(tmp_path / "run"), env, state,
                                        backward="linear")
    assert not remapped and out is state
    assert any("enumeration stamp" in str(x.message) for x in w)
