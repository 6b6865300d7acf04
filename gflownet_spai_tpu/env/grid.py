"""Toy 2D grid environment — the sanity-check env (reference grid.py:5-34).

Pure-JAX port of the upstream GFlowNet library's grid world: actions are
{down, right, terminate}; the reward has known modes at ring bands around
the center, so correct GFlowNet training is checkable in seconds.  Used as
the fast integration test of the generic sampler/TB-loss stack
(SURVEY.md §4 "toy environment as sanity harness").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

DOWN, RIGHT, TERMINATE = 0, 1, 2
NUM_ACTIONS = 3


@dataclasses.dataclass(frozen=True)
class GridEnv:
    size: int

    @property
    def state_dim(self) -> int:
        return self.size * self.size

    @property
    def num_actions(self) -> int:
        return NUM_ACTIONS


jax.tree_util.register_dataclass(GridEnv, data_fields=[], meta_fields=["size"])


def update(env: GridEnv, idx: jax.Array, action: jax.Array) -> jax.Array:
    """State index after an action (reference grid.py:11-16 semantics,
    on integer cell indices instead of one-hots)."""
    idx = jnp.where(action == DOWN, idx + env.size, idx)
    idx = jnp.where(action == RIGHT, idx + 1, idx)
    return idx


def mask(env: GridEnv, idx: jax.Array) -> jax.Array:
    """Legal-action mask (reference grid.py:18-25): no RIGHT on the right
    edge, no DOWN on the bottom edge; TERMINATE always legal."""
    one = idx + 1
    right_edge = (one > 0) & (one % env.size == 0)
    bottom_edge = one > env.size * (env.size - 1)
    return jnp.stack(
        [~bottom_edge, ~right_edge, jnp.ones_like(right_edge)], axis=-1
    )


def reward(env: GridEnv, idx: jax.Array) -> jax.Array:
    """Banded reward R0 + R1·[ring1] + R2·[ring2] (reference grid.py:27-34)."""
    coord = jnp.stack([idx // env.size, idx % env.size], axis=-1)
    R0, R1, R2 = 1e-2, 0.5, 2.0
    norm = jnp.abs(coord / (env.size - 1) - 0.5)
    r1 = jnp.prod((0.25 < norm).astype(jnp.float32), axis=-1)
    r2 = jnp.prod(((0.3 < norm) & (norm < 0.4)).astype(jnp.float32), axis=-1)
    return R0 + R1 * r1 + R2 * r2
