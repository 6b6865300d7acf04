"""DIA fast-path env: banded SpGEMM vs scipy, reward parity with the COO env."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.convert import coo_to_scipy
from gflownet_spai_tpu.ops import coo_to_dia
from gflownet_spai_tpu.ops.dia import frobenius_sq_minus_identity_dia, spgemm_dia
from gflownet_spai_tpu.env import make_env, seed_pattern
from gflownet_spai_tpu.env import spai as coo_env
from gflownet_spai_tpu.env import spai_dia as dia_env


@pytest.mark.parametrize("name", ["LF10_like", "olm500_like", "poisson32"])
def test_spgemm_dia_matches_scipy(name):
    coo = gallery.get(name)
    d = coo_to_dia(coo)
    c = spgemm_dia(d, d)
    A = coo_to_scipy(coo)
    np.testing.assert_allclose(
        np.asarray(c.todense()), (A @ A).toarray(), rtol=1e-9, atol=1e-10
    )


def test_frobenius_dia():
    coo = gallery.get("olm500_like")
    d = coo_to_dia(coo)
    c = spgemm_dia(d, d)
    A = coo_to_scipy(coo).toarray()
    want = np.linalg.norm(A @ A - np.eye(500), "fro") ** 2
    np.testing.assert_allclose(float(frobenius_sq_minus_identity_dia(c)), want,
                               rtol=1e-9)


@pytest.fixture(scope="module")
def envs():
    a = gallery.get("olm500_like")
    seed = seed_pattern(a, method="ilu0", dtype=jnp.float64)
    e_coo = make_env(seed, original=a)
    e_dia = dia_env.make_dia_env(seed, a)
    return seed, e_coo, e_dia


def test_dia_env_reward_parity(envs):
    """Same kept-edge SET must give the same reward in both envs.

    Enumerations differ: map DIA edge ids to (row, col) pairs and build the
    corresponding COO keep mask."""
    seed, e_coo, e_dia = envs
    assert e_dia.num_edges == e_coo.num_edges

    edge_coo_dia = dia_env.edge_coo(e_dia)      # DIA enumeration → (r, c)
    rng = np.random.default_rng(0)
    for alpha in (0.3, 0.7):
        keep_dia = jnp.asarray(rng.random(e_dia.num_edges) > 0.4)
        # translate: kept (r,c) set → COO-order mask
        kept_rc = set(
            (int(r), int(c))
            for r, c, k in zip(np.asarray(edge_coo_dia.row),
                               np.asarray(edge_coo_dia.col),
                               np.asarray(keep_dia)) if k
        )
        keep_coo = jnp.asarray([
            (int(r), int(c)) in kept_rc
            for r, c in zip(np.asarray(e_coo.seed.row),
                            np.asarray(e_coo.seed.col))
        ])
        r_dia = float(dia_env.reward(e_dia, keep_dia, jnp.asarray(alpha)))
        r_coo = float(coo_env.reward(e_coo, keep_coo, jnp.asarray(alpha)))
        np.testing.assert_allclose(r_dia, r_coo, rtol=1e-9)


def test_dia_env_batched_and_jit(envs):
    _, _, e_dia = envs
    B, T = 3, e_dia.num_actions
    rng = np.random.default_rng(1)
    actions = np.full((B, T), -1, np.int32)
    for b in range(B):
        k = rng.integers(0, 50)
        actions[b, :k] = rng.choice(e_dia.num_edges, size=k, replace=False)
        actions[b, k] = e_dia.terminal_action
    fn = jax.jit(dia_env.batched_rewards)
    out = np.asarray(fn(e_dia, jnp.asarray(actions), jnp.asarray(0.5)))
    assert out.shape == (B,)
    assert np.isfinite(out).all()


def test_edge_coo_values_match_seed(envs):
    seed, _, e_dia = envs
    ec = dia_env.edge_coo(e_dia)
    np.testing.assert_allclose(
        np.asarray(ec.todense()), np.asarray(seed.todense()), rtol=1e-12
    )
