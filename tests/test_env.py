"""SPAI env: reward parity vs an independent NumPy re-derivation of the
reference formula, ILU seed builders, grid env semantics."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_scipy
from gflownet_spai_tpu import env as env_mod
from gflownet_spai_tpu.env import grid as grid_env


def _numpy_reward_oracle(seed_dense, original_dense, deleted_edges, alpha):
    """Independent NumPy statement of the reference reward
    (preconditioner.py:64,137-165 as documented in SURVEY.md §3.3)."""
    n = seed_dense.shape[0]
    rows, cols = np.nonzero(seed_dense)
    M = seed_dense.copy()
    for e in deleted_edges:
        M[rows[e], cols[e]] = 0.0
    res = np.linalg.norm(M @ original_dense - np.eye(n), "fro")
    base_res = np.linalg.norm(original_dense @ original_dense - np.eye(n), "fro")
    flops = 2 * np.count_nonzero(M) * n
    base_flops = 2 * np.count_nonzero(original_dense) * n
    metric = alpha * (1 - res / base_res) + (1 - alpha) * (1 - flops / base_flops)
    return metric * 1000.0


@pytest.fixture(scope="module")
def lf10_env():
    a = gallery.get("LF10_like")
    seed = env_mod.seed_pattern(a, method="ilu0", dtype=jnp.float64)
    return a, seed, env_mod.make_env(seed, original=a)


def test_reward_parity_vs_numpy_oracle(lf10_env):
    a, seed, env = lf10_env
    seed_dense = np.asarray(seed.todense())
    orig_dense = np.asarray(a.todense())
    rng = np.random.default_rng(0)
    for alpha in (0.0, 0.5, 0.73):
        deleted = rng.choice(env.num_edges, size=10, replace=False)
        actions = np.full(env.num_actions, -1, dtype=np.int32)
        actions[:10] = deleted
        actions[10] = env.terminal_action  # terminal action then padding
        got = env_mod.reward_from_actions(env, jnp.asarray(actions), jnp.asarray(alpha))
        want = _numpy_reward_oracle(seed_dense, orig_dense, deleted, alpha)
        np.testing.assert_allclose(float(got), want, rtol=1e-9)


def test_reward_no_deletions_reference_baseline(lf10_env):
    """With original=seed (the reference driver's wiring, GFlowNet100.py:173)
    and nothing deleted, both ratios are 1 → reward = 0 exactly."""
    _, seed, _ = lf10_env
    env_ref = env_mod.make_env(seed)  # original defaults to seed
    actions = jnp.full((env_ref.num_actions,), -1, dtype=jnp.int32)
    got = env_mod.reward_from_actions(env_ref, actions, jnp.asarray(0.5))
    np.testing.assert_allclose(float(got), 0.0, atol=1e-9)


def test_batched_rewards_jit(lf10_env):
    a, seed, env = lf10_env
    B, T = 4, env.num_actions
    rng = np.random.default_rng(1)
    actions = np.full((B, T), -1, dtype=np.int32)
    for b in range(B):
        k = rng.integers(0, 20)
        actions[b, :k] = rng.choice(env.num_edges, size=k, replace=False)
        actions[b, k] = env.terminal_action
    fn = jax.jit(env_mod.batched_rewards)
    got = np.asarray(fn(env, jnp.asarray(actions), jnp.asarray(0.4)))
    seed_dense = np.asarray(seed.todense())
    orig_dense = np.asarray(a.todense())
    for b in range(B):
        dele = [x for x in actions[b] if 0 <= x < env.num_edges]
        want = _numpy_reward_oracle(seed_dense, orig_dense, dele, 0.4)
        np.testing.assert_allclose(got[b], want, rtol=1e-9)


def test_keep_mask_ignores_terminal_and_padding():
    actions = jnp.asarray([3, -1, 5, 5, -1], dtype=jnp.int32)
    keep = env_mod.keep_mask_from_actions(actions, 6)
    np.testing.assert_array_equal(
        np.asarray(keep), [True, True, True, False, True, False]
    )
    # terminal action (== num_edges) must not delete an edge
    actions = jnp.asarray([6, 0], dtype=jnp.int32)
    keep = env_mod.keep_mask_from_actions(actions, 6)
    assert not keep[0] and np.asarray(keep)[1:].all()


def test_ilu0_exact_on_pattern():
    """ILU(0) residual (A − L·U) must vanish on the pattern of A."""
    a = gallery.get("poisson32")
    L, U = env_mod.ilu0(a)
    prod = coo_to_scipy(L) @ coo_to_scipy(U)
    A = coo_to_scipy(a)
    diff = (A - prod).toarray()
    mask = np.asarray(A.toarray()) != 0
    np.testing.assert_allclose(diff[mask], 0.0, atol=1e-10)


def test_ilu0_exact_for_banded_full_lu():
    """For a tridiagonal matrix ILU(0) == exact LU, so L@U == A."""
    a = gallery.get("olm500_like")
    L, U = env_mod.ilu0(a)
    prod = (coo_to_scipy(L) @ coo_to_scipy(U)).toarray()
    np.testing.assert_allclose(prod, coo_to_scipy(a).toarray(), atol=1e-9)


def test_spilu_seed_matches_scipy_route():
    a = gallery.get("LF10_like")
    seed = env_mod.seed_pattern(a, method="spilu", dtype=jnp.float64)
    # independent scipy computation
    import scipy.sparse.linalg as spla
    ilu = spla.spilu(coo_to_scipy(a).tocsc())
    LU = (sp.tril(ilu.L.tocsr()) @ sp.triu(ilu.U.tocsr())).toarray()
    np.testing.assert_allclose(np.asarray(seed.todense()), LU, rtol=1e-10)


# ---------------------------------------------------------------------------
# grid env
# ---------------------------------------------------------------------------

def test_grid_semantics():
    g = grid_env.GridEnv(size=8)
    idx = jnp.asarray(0)
    idx = grid_env.update(g, idx, jnp.asarray(grid_env.DOWN))
    assert int(idx) == 8
    idx = grid_env.update(g, idx, jnp.asarray(grid_env.RIGHT))
    assert int(idx) == 9
    m = np.asarray(grid_env.mask(g, jnp.asarray([7, 56, 63, 20])))
    assert m[0].tolist() == [True, False, True]    # right edge
    assert m[1].tolist() == [False, True, True]    # bottom edge
    assert m[2].tolist() == [False, False, True]   # corner
    assert m[3].tolist() == [True, True, True]


def test_grid_reward_bands():
    g = grid_env.GridEnv(size=16)
    r_center = float(grid_env.reward(g, jnp.asarray(8 * 16 + 8)))
    r_corner = float(grid_env.reward(g, jnp.asarray(0)))
    assert r_center == pytest.approx(0.01)
    assert r_corner == pytest.approx(0.01 + 0.5)  # corner is outside both rings? ring1 only


def test_spai_seed_method():
    """seed_pattern(method='spai') seeds with the classic-SPAI approximate
    inverse: ‖A·M0 − I‖ must beat the identity baseline."""
    a = gallery.get("bcsstk03_like")
    seed = env_mod.seed_pattern(a, method="spai", dtype=jnp.float64)
    A = np.asarray(a.todense())
    M = np.asarray(seed.todense())
    n = A.shape[0]
    assert np.linalg.norm(A @ M - np.eye(n)) < 0.5 * np.linalg.norm(A - np.eye(n))


# ---------------------------------------------------------------------------
# Row-block reward backend (sparse.rowblock — the MXU path for unstructured)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["bcsstk03_like", "olm500_like", "poisson32"])
def test_rowblock_env_matches_pair_env(name):
    """env(reward_path='rowblock') must produce the same batched rewards and
    residual norms as the pair-plan env, per-action-list (VERDICT r1 #1)."""
    from gflownet_spai_tpu.env import ilu, spai
    from gflownet_spai_tpu.sparse.types import COO

    a = gallery.get(name)
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32),
            shape=a.shape)
    seed = ilu.seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env_pair = spai.make_env(seed, original=a)
    env_rb = spai.make_env(seed, original=a, reward_path="rowblock")
    assert env_rb.rb is not None and env_rb.plan is None
    np.testing.assert_allclose(float(env_rb.baseline_residual),
                               float(env_pair.baseline_residual), rtol=1e-5)
    rng = np.random.default_rng(5)
    B, T = 3, 40
    acts = np.full((B, T), -1, np.int32)
    for b in range(B):
        k = rng.integers(1, T)
        acts[b, :k] = rng.choice(env_pair.num_edges, size=k, replace=False)
    acts = jnp.asarray(acts)
    alpha = jnp.asarray(0.37, jnp.float32)
    r_pair = np.asarray(spai.batched_rewards(env_pair, acts, alpha))
    r_rb = np.asarray(spai.batched_rewards(env_rb, acts, alpha))
    np.testing.assert_allclose(r_rb, r_pair, rtol=5e-4, atol=5e-3)
    # batched residual entry point agrees across backends too
    keep = jax.vmap(lambda x: spai.keep_mask_from_actions(
        x, env_pair.num_edges))(acts)
    np.testing.assert_allclose(
        np.asarray(spai.batched_residual_norms(env_rb, keep)),
        np.asarray(spai.batched_residual_norms(env_pair, keep)),
        rtol=5e-5)


def test_rowblock_env_is_jit_argument_safe():
    """The rowblock env must pass through jit as an ARGUMENT (pytree), so
    its G blocks never become closure constants (CLAUDE.md payload rule)."""
    from gflownet_spai_tpu.env import ilu, spai
    from gflownet_spai_tpu.sparse.types import COO

    a = gallery.get("poisson32")
    a = COO(row=a.row, col=a.col, data=a.data.astype(jnp.float32),
            shape=a.shape)
    seed = ilu.seed_pattern(a, method="ilu0", dtype=jnp.float32)
    env = spai.make_env(seed, original=a, reward_path="rowblock")

    @jax.jit
    def f(env, keep):
        return spai.batched_residual_norms(env, keep)

    keep = jnp.ones((2, env.num_edges), bool)
    out = f(env, keep)
    assert out.shape == (2,)
    # full-keep residual = ‖LU·A − I‖ with nothing deleted
    want = np.asarray(spai.residual_norm(env, keep[0]))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_reward_baseline_identity_modes():
    """baseline="identity" gives sqrt(n) on all three env backends and
    make_env rejects unknown modes; the matrix default is unchanged."""
    import numpy as np
    import pytest
    from gflownet_spai_tpu.env.spai import make_env
    from gflownet_spai_tpu.env.spai_dia import make_dia_env
    from gflownet_spai_tpu.sparse.gallery import get

    a = get("poisson32")        # n=1024, banded (valid for the DIA env too)
    want = np.sqrt(1024.0)
    e_pair = make_env(a, original=a, baseline="identity")
    e_rb = make_env(a, original=a, reward_path="rowblock",
                    baseline="identity")
    e_dia = make_dia_env(a, a, baseline="identity", allow_phantom=True)
    for e in (e_pair, e_rb, e_dia):
        np.testing.assert_allclose(float(e.baseline_residual), want)
    assert float(make_env(a, original=a).baseline_residual) != want
    with pytest.raises(ValueError, match="baseline"):
        make_env(a, original=a, baseline="nope")
    with pytest.raises(ValueError, match="baseline"):
        make_dia_env(a, a, baseline="nope", allow_phantom=True)


def test_reward_baseline_auto_resolution():
    """"auto" keeps the reference matrix baseline when it discriminates
    (seed=A: ratio 1) and switches to identity — with a warning — when
    ‖A·A−I‖ dwarfs the seed residual (approximate-inverse seed on an
    unscaled matrix: the config-4 degeneracy, VERDICT r2 weak #1).
    Explicit "matrix" on a degenerate pair warns but is honored."""
    import warnings

    import numpy as np
    import pytest
    from gflownet_spai_tpu.env import ilu
    from gflownet_spai_tpu.env.spai import make_env, resolve_baseline
    from gflownet_spai_tpu.sparse.gallery import get

    a = get("poisson32")
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # no warning on the sane pair
        assert resolve_baseline(a, a, "auto") == "matrix"
        e = make_env(a, original=a, baseline="auto")
    assert float(e.baseline_residual) > np.sqrt(1024.0)

    o = get("orsirr_like48")
    seed = ilu.seed_pattern(o, method="spai", dtype=np.float32)
    with pytest.warns(UserWarning, match="identity"):
        assert resolve_baseline(seed, o, "auto") == "identity"
    with pytest.warns(UserWarning, match="identity"):
        e_id = make_env(seed, original=o, baseline="auto",
                        reward_path="rowblock")
    np.testing.assert_allclose(float(e_id.baseline_residual),
                               np.sqrt(o.shape[0]), rtol=1e-6)
    with pytest.warns(UserWarning, match="DEGENERATE"):
        assert resolve_baseline(seed, o, "matrix") == "matrix"
