"""SPAI environment on the DIA fast path (banded matrices).

Same reward semantics as ``env.spai`` (see that module's parity notes) but
the whole reward pipeline is gather/scatter-free on TPU:

* the seed pattern and A live in DIA form;
* the GFlowNet's edge/action enumeration is **(diagonal, row) order**, so
  each diagonal's edges form one contiguous segment of the action space and
  the keep-mask applies via ``ndiags`` static slice-updates;
* ``M·A`` values come from the banded DIA×DIA product (``ops.spgemm_dia``)
  — statically shifted FMAs instead of the pair-plan's gathers.

Edge enumeration differs from ``env.spai``'s row-major COO order; rewards
agree for corresponding edge *sets* (tested), and the policy graph emitted
by ``graph_inputs`` uses the same enumeration so action ids line up.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dia import (
    DIA,
    coo_to_dia,
    dia_to_coo,
    frobenius_sq_minus_identity_dia,
    spgemm_dia,
)
from ..sparse.types import COO


@dataclasses.dataclass(frozen=True)
class SpaiDiaEnv:
    seed: DIA                     # seed pattern values (M0)
    original: DIA                 # A
    # per-diagonal contiguous edge segments: edge e of diag s covers rows
    # [row_start[s], row_start[s] + seg_len[s])  at flat offset seg_off[s]
    row_start: Tuple[int, ...] = dataclasses.field(metadata={"pytree": False})
    seg_len: Tuple[int, ...] = dataclasses.field(metadata={"pytree": False})
    seg_off: Tuple[int, ...] = dataclasses.field(metadata={"pytree": False})
    baseline_residual: jax.Array = None
    baseline_flops: float = 0.0

    @property
    def n(self) -> int:
        return self.seed.n

    @property
    def num_edges(self) -> int:
        return int(self.seg_off[-1] + self.seg_len[-1]) if self.seg_len else 0

    @property
    def num_actions(self) -> int:
        return self.num_edges + 1

    @property
    def terminal_action(self) -> int:
        return self.num_edges


jax.tree_util.register_dataclass(
    SpaiDiaEnv,
    data_fields=["seed", "original", "baseline_residual"],
    meta_fields=["row_start", "seg_len", "seg_off", "baseline_flops"],
)


def has_phantom_slots(seed_d: DIA) -> int:
    """Number of in-range diagonal slots holding a stored ZERO.  The DIA
    action enumeration is slot-based (contiguous per diagonal); zero-valued
    slots would become phantom edges that diverge from the COO env's
    nnz-based action space and flop counts."""
    data = np.asarray(seed_d.data)
    n = seed_d.n
    phantom = 0
    for s, d in enumerate(seed_d.offsets):
        start, length = max(0, -d), n - abs(d)
        phantom += int((data[s, start:start + length] == 0).sum())
    return phantom


def make_dia_env(seed: COO | DIA, original: COO | DIA,
                 allow_phantom: bool = False,
                 baseline: str = "matrix") -> SpaiDiaEnv:
    """``baseline``: "matrix" = ‖A·A−I‖_F (reference formula, B11-fixed)
    or "identity" = √n (see env.spai.make_env — the non-degenerate
    normalizer for approximate-inverse seeds)."""
    seed_d = seed if isinstance(seed, DIA) else coo_to_dia(seed)
    orig_d = original if isinstance(original, DIA) else coo_to_dia(original)
    phantom = has_phantom_slots(seed_d)
    if phantom and not allow_phantom:
        raise ValueError(
            f"seed pattern has {phantom} zero-valued slots inside its "
            "diagonals; the DIA action space would diverge from the COO "
            "env's (phantom edges). Use the COO env (env_format='coo') or "
            "pass allow_phantom=True."
        )
    if orig_d.n_pad != seed_d.n_pad:
        target = max(orig_d.n_pad, seed_d.n_pad)
        seed_d = _repad(seed_d, target)
        orig_d = _repad(orig_d, target)
    n = seed_d.n
    row_start, seg_len, seg_off = [], [], []
    off_acc = 0
    for d in seed_d.offsets:
        start = max(0, -d)
        length = n - abs(d)
        row_start.append(start)
        seg_len.append(length)
        seg_off.append(off_acc)
        off_acc += length
    from .spai import resolve_baseline
    baseline = resolve_baseline(dia_to_coo(seed_d), dia_to_coo(orig_d),
                                baseline)
    if baseline == "identity":
        base_res = jnp.asarray(float(n) ** 0.5, seed_d.data.dtype)
    else:
        base = spgemm_dia(orig_d, orig_d)
        base_res = jnp.sqrt(frobenius_sq_minus_identity_dia(base))
    return SpaiDiaEnv(
        seed=seed_d,
        original=orig_d,
        row_start=tuple(row_start),
        seg_len=tuple(seg_len),
        seg_off=tuple(seg_off),
        baseline_residual=base_res,
        baseline_flops=2.0 * orig_d.nnz * orig_d.shape[1],
    )


def _repad(d: DIA, n_pad: int) -> DIA:
    return dataclasses.replace(
        d, data=jnp.pad(d.data, ((0, 0), (0, n_pad - d.n_pad)))
    )


def edge_coo(env: SpaiDiaEnv) -> COO:
    """Seed edges as COO *in the (diag, row) action enumeration* — feed this
    to ``models.graph_from_seed`` so GAT edge ids match action ids."""
    rows, cols, vals = [], [], []
    data = np.asarray(env.seed.data)
    for s, d in enumerate(env.seed.offsets):
        i = np.arange(env.row_start[s], env.row_start[s] + env.seg_len[s])
        rows.append(i)
        cols.append(i + d)
        vals.append(data[s, i])
    return COO(
        row=jnp.asarray(np.concatenate(rows), jnp.int32),
        col=jnp.asarray(np.concatenate(cols), jnp.int32),
        data=jnp.asarray(np.concatenate(vals)),
        shape=env.seed.shape,
    )


def masked_seed(env: SpaiDiaEnv, keep: jax.Array) -> DIA:
    """Apply the [num_edges] keep mask to the seed — ndiags static
    slice-updates, no scatter."""
    rows = []
    for s in range(env.seed.ndiags):
        seg = jax.lax.dynamic_slice(keep, (env.seg_off[s],), (env.seg_len[s],))
        diag_mask = jnp.zeros((env.seed.n_pad,), env.seed.data.dtype)
        diag_mask = jax.lax.dynamic_update_slice(
            diag_mask, seg.astype(env.seed.data.dtype), (env.row_start[s],)
        )
        rows.append(env.seed.data[s] * diag_mask)
    return dataclasses.replace(env.seed, data=jnp.stack(rows))


def residual_norm(env: SpaiDiaEnv, keep: jax.Array) -> jax.Array:
    m = masked_seed(env, keep)
    c = spgemm_dia(m, env.original)
    return jnp.sqrt(frobenius_sq_minus_identity_dia(c))


def kept_nnz(env: SpaiDiaEnv, keep: jax.Array) -> jax.Array:
    """Count of kept edges with a genuinely nonzero seed value (zero-valued
    phantom slots — possible under allow_phantom — contribute no flops)."""
    total = jnp.zeros((), env.seed.data.dtype)
    for s in range(env.seed.ndiags):
        seg = jax.lax.dynamic_slice(keep, (env.seg_off[s],), (env.seg_len[s],))
        vals = jax.lax.slice(
            env.seed.data[s], (env.row_start[s],),
            (env.row_start[s] + env.seg_len[s],),
        )
        total = total + jnp.sum(
            seg.astype(env.seed.data.dtype) * (vals != 0)
        )
    return total


def reward(env: SpaiDiaEnv, keep: jax.Array, alpha: jax.Array) -> jax.Array:
    res_ratio = residual_norm(env, keep) / env.baseline_residual
    flops = 2.0 * kept_nnz(env, keep) * env.seed.shape[1]
    comp_ratio = flops / env.baseline_flops
    metric = alpha * (1.0 - res_ratio) + (1.0 - alpha) * (1.0 - comp_ratio)
    return metric * 1000.0


def reward_from_actions(env: SpaiDiaEnv, actions: jax.Array,
                        alpha: jax.Array) -> jax.Array:
    from .spai import keep_mask_from_actions

    keep = keep_mask_from_actions(actions, env.num_edges)
    return reward(env, keep, alpha)


def batched_rewards(env: SpaiDiaEnv, actions: jax.Array,
                    alpha: jax.Array) -> jax.Array:
    return jax.vmap(lambda a: reward_from_actions(env, a, alpha))(actions)
