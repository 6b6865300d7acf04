"""TP-lite: action-head (logit) sharding over the ``rows`` mesh axis.

The forward policy's only large tensor is the action head
``fc_w: [hidden, max_num_actions]`` — for a 10M-nnz seed at hidden 32
that is 1.3 GB replicated.  SURVEY.md §2's parallelism table calls this
out as the one TP case worth having ("optional sharded Linear(hidden →
max_actions) when the action space is huge").

Design: the GATv2 trunk + mean-pool is tiny and replicated; the head
matmul runs inside ``shard_map`` with ``fc_w``/``fc_b`` column-sharded
over ``rows``, producing action-sharded logits.  Everything downstream
(Gumbel perturbation + argsort in the rollout) composes under GSPMD —
XLA gathers the [A] logits where needed (4 MB at 1M actions, negligible
next to the 128×-replicated head it replaces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import policies as pol


def pad_head(p: pol.ForwardPolicyParams, n_shards: int) -> pol.ForwardPolicyParams:
    """Pad the head's action dim to a multiple of the shard count (padded
    logits are sliced off by ``num_actions`` downstream)."""
    A = p.fc_w.shape[1]
    target = -(-A // n_shards) * n_shards
    if target == A:
        return p
    pad = target - A
    return p._replace(
        fc_w=jnp.pad(p.fc_w, ((0, 0), (0, pad))),
        fc_b=jnp.pad(p.fc_b, (0, pad)),
    )


def shard_head(mesh: Mesh, p: pol.ForwardPolicyParams,
               axis: str = "rows") -> pol.ForwardPolicyParams:
    """Place the (padded) head shards on the mesh; trunk stays replicated."""
    p = pad_head(p, mesh.shape[axis])
    return p._replace(
        fc_w=jax.device_put(p.fc_w, NamedSharding(mesh, P(None, axis))),
        fc_b=jax.device_put(p.fc_b, NamedSharding(mesh, P(axis))),
    )


def sharded_policy_logits(mesh: Mesh, p: pol.ForwardPolicyParams,
                          g: pol.GraphInputs, num_actions: int,
                          hidden_dim: int, heads: int = 4,
                          axis: str = "rows") -> jax.Array:
    """Action logits [num_actions] with the head matmul sharded over
    ``axis``.  Matches ``forward_policy_logits`` exactly (tested)."""
    pooled = pol.forward_policy_pooled(p, g, hidden_dim, heads)

    def head(pooled, w, b):
        return pooled @ w + b

    logits = shard_map(
        head, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis)),
        out_specs=P(axis),
    )(pooled, p.fc_w, p.fc_b)
    return logits[:num_actions]
