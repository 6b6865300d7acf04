"""SPAI preconditioner environment — pure functions over static patterns.

Re-implements the semantics of the reference ``PreconditionerEnv``
(reference preconditioner.py:11-165) in a TPU-native shape:

* A *state* is a boolean keep-mask over the seed pattern's nnz edge set
  (the reference's states-never-evolve rollout semantics, SURVEY.md §3.1),
  not a mutable sparse tensor.
* The reward path ``‖M·A − I‖_F`` reuses a precomputed fixed-pattern
  SpGEMM plan (symbolic product computed once at env construction), so a
  batched reward is one vmapped gather/FMA/segment-sum — no per-sample
  Python loop (contrast reference preconditioner.py:37-52).

Bug-ledger resolutions baked in (SURVEY.md §2):
* B5  — α is the value threaded in from the policy (sigmoid of a learned
        scalar), passed explicitly; no hidden ``self.alpha``.
* B9  — flops(M) = 2·nnz(M)·ncols exactly as the reference's sparse branch
        (preconditioner.py:72); the ratio vs baseline makes the convention
        cancel.
* B11 — the residual baseline defaults to the true system matrix A
        (``original``), while ``reference_baseline=True`` reproduces the
        reference driver's ``original_matrix=initial_matrix`` wiring
        (GFlowNet100.py:173) for parity testing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.types import COO
from ..sparse.ops import SpGEMMPlan, frobenius_sq_minus_identity
from ..sparse import rowblock as _rowblock


@dataclasses.dataclass(frozen=True)
class SpaiEnv:
    """Static environment description (host-built once per matrix).

    Pytree leaves are the value arrays; pattern/plan metadata is static.

    Two interchangeable residual backends (same semantics, tested equal):

    * ``plan``  — the pair plan (gather + segment-sum).  Exact and simple,
      but TPU scalarizes the per-pair gathers: ~170× slower than banded DIA
      at 1M nnz (docs/BENCH.md round 1).
    * ``rb``    — the row-block plan (``sparse.rowblock``): bucketed dense
      G-blocks make the batched reward a handful of MXU einsums.  The
      default for large unstructured seeds (train auto-dispatch).  Its
      arrays are pytree DATA so they ride as jit arguments, never closure
      constants (CLAUDE.md payload rule).
    """

    # seed pattern M0 (the ILU LU-product): edge set = action space
    seed: COO
    # the matrix the preconditioner is scored against ("original_matrix")
    original: COO
    # symbolic plan for pattern(M0 · original); None when rb carries it
    plan: SpGEMMPlan | None = dataclasses.field(metadata={"pytree": False})
    # baseline scalars (reference preconditioner.py:28-29)
    baseline_residual: jax.Array = None
    baseline_flops: float = 0.0
    # row-block residual plan (MXU path for unstructured patterns)
    rb: _rowblock.RowBlockPlan | None = None

    @property
    def n(self) -> int:
        return self.seed.shape[0]

    @property
    def num_edges(self) -> int:
        return self.seed.nnz

    @property
    def num_actions(self) -> int:
        """nnz + 1: one delete-action per edge plus the terminal action
        (reference preconditioner.py:16)."""
        return self.seed.nnz + 1

    @property
    def terminal_action(self) -> int:
        return self.seed.nnz


jax.tree_util.register_dataclass(
    SpaiEnv,
    data_fields=["seed", "original", "baseline_residual", "rb"],
    meta_fields=["plan", "baseline_flops"],
)


def _to_scipy(m: COO):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (np.asarray(m.data, np.float64),
         (np.asarray(m.row), np.asarray(m.col))),
        shape=m.shape,
    )


def _baseline_residual_host(original: COO) -> float:
    """‖A·A − I‖_F computed host-side in float64 (setup-only; used by the
    rowblock path so no device pair plan is ever built at 1M+ nnz)."""
    import scipy.sparse as sp

    a = _to_scipy(original)
    c = (a @ a - sp.eye(original.shape[0], format="csr")).tocoo()
    return float(np.sqrt(np.sum(c.data * c.data)))


def _seed_residual_host(seed: COO, original: COO) -> float:
    """‖M₀·A − I‖_F for the untouched seed (host-side, setup-only) — the
    top of the residual range the policy can actually explore."""
    import scipy.sparse as sp

    c = (_to_scipy(seed) @ _to_scipy(original)
         - sp.eye(original.shape[0], format="csr")).tocoo()
    return float(np.sqrt(np.sum(c.data * c.data)))


#: ``baseline="matrix"`` is declared non-discriminating when
#: ‖A·A−I‖ exceeds this multiple of ‖M₀·A−I‖: the reachable residual range
#: then maps to a vanishing slice of ``res/baseline`` and the flops term
#: dominates the reward (measured on orsirr_like: thinning a classic-SPAI
#: seed to GMRES divergence still scored ≈967/1000 — VERDICT r2 weak #1).
DEGENERACY_FACTOR = 20.0


def resolve_baseline(seed: COO, original: COO, baseline: str) -> str:
    """Resolve a ``baseline`` choice (``matrix``/``identity``/``auto``) to a
    concrete mode, warning loudly when the matrix baseline cannot rank the
    preconditioners the seed reaches.

    ``auto`` picks ``identity`` whenever ‖A·A−I‖ > 20·‖M₀·A−I‖ (an
    approximate-inverse seed on an unscaled matrix — the config-4 class)
    and the reference's ``matrix`` formula otherwise."""
    return _resolve_baseline_with_value(seed, original, baseline)[0]


def _resolve_baseline_with_value(seed: COO, original: COO, baseline: str):
    """(mode, ‖A·A−I‖ or None) — the resolved mode plus the host baseline
    residual already computed while resolving, so make_env never pays the
    multi-second scipy A@A product twice at 1M+ nnz (ADVICE r3)."""
    if baseline == "identity":
        return "identity", None
    if baseline not in ("matrix", "auto"):
        raise ValueError(f"unknown baseline {baseline!r}")
    import warnings

    base = _baseline_residual_host(original)
    seed_res = _seed_residual_host(seed, original)
    degenerate = base > DEGENERACY_FACTOR * max(seed_res, 1e-30)
    if not degenerate:
        return "matrix", base
    detail = (
        f"reward baseline ‖A·A−I‖={base:.3e} is {base / max(seed_res, 1e-30):.0f}× "
        f"the seed residual ‖M0·A−I‖={seed_res:.3e}: the residual term of the "
        "reward saturates near its maximum for EVERY reachable pattern and the "
        "flops term drives the policy toward deleting everything "
        "(env.spai.make_env docstring; measured on orsirr_like)."
    )
    if baseline == "auto":
        warnings.warn(
            "reward_baseline='auto' resolved to 'identity': " + detail,
            stacklevel=2)
        return "identity", None
    warnings.warn(
        "DEGENERATE reward baseline: " + detail +
        " Pass reward_baseline='identity' (or 'auto').",
        stacklevel=2)
    return "matrix", base


def make_env(seed: COO, original: Optional[COO] = None,
             reward_path: str = "pair",
             rowblock_dtype=None,
             baseline: str = "matrix",
             rowblock_layout: str = "cm",
             rowblock_class_step: float = 1.5,
             rowblock_compress: str = "none",
             rowblock_order: str = "sorted") -> SpaiEnv:
    """Build the environment.  ``original`` defaults to ``seed`` which
    reproduces the reference driver's (questionable) baseline wiring
    (GFlowNet100.py:173); pass the true A for the corrected objective.

    ``reward_path``: ``"pair"`` (gather plan — exact semantics, fine on
    CPU/small) or ``"rowblock"`` (bucketed dense MXU plan — the TPU path
    for large unstructured seeds; identical residuals, tested).
    ``rowblock_dtype``: G-block storage dtype (default: seed dtype);
    ``jnp.bfloat16`` halves the G-read traffic the batched reward is bound
    by, with f32 MXU accumulation (~1e-3 relative residual noise).

    ``baseline`` — the residual normalizer in the reward's
    ``1 − res/baseline`` term:

    * ``"matrix"``  — ‖A·A − I‖_F, the reference's formula with the B11
      intent fix (reference preconditioner.py:28).  DEGENERATE whenever
      ‖A·A − I‖ ≫ ‖M₀·A − I‖ (unscaled matrices with O(1) entries: the
      ratio saturates near 0, the residual term stops discriminating, and
      the flops term drives the policy to delete everything — measured on
      orsirr_like: thinning a classic-SPAI seed to divergence still scored
      reward ≈ 967/1000).
    * ``"identity"`` — ‖0·A − I‖_F = √n, the empty-preconditioner residual:
      M = 0 scores exactly 0 on the residual term and light thinning of a
      good M₀ moves the ratio measurably, so residual quality and flops
      genuinely trade off.  The principled choice for ``seed_method=spai``
      at scale.
    * ``"auto"``     — ``matrix`` unless it is degenerate for this
      seed/matrix pair (``resolve_baseline``: ‖A·A−I‖ > 20·‖M₀·A−I‖), in
      which case ``identity`` with a warning."""
    if original is None:
        original = seed
    baseline, cached_base = _resolve_baseline_with_value(
        seed, original, baseline)
    identity = baseline == "identity"
    sqrt_n = jnp.asarray(np.sqrt(float(original.shape[0])), seed.data.dtype)
    if reward_path == "rowblock":
        rb = _rowblock.build_rowblock_plan(
            seed, original,
            gemm_dtype=rowblock_dtype or seed.data.dtype,
            layout=rowblock_layout, class_step=rowblock_class_step,
            compress=rowblock_compress, order=rowblock_order)
        if rb.edge_perm is not None:
            # window-order plans DEFINE the edge enumeration: the env's
            # seed (→ action ids, policy graph, keep masks) follows it, so
            # each bucket's m-value windows are contiguous slices and the
            # batched reward runs gather-free (sparse.rowblock docstring)
            p = rb.edge_perm
            seed = COO(row=seed.row[p], col=seed.col[p],
                       data=seed.data[p], shape=seed.shape)
        base_res = sqrt_n if identity else jnp.asarray(
            cached_base if cached_base is not None
            else _baseline_residual_host(original), seed.data.dtype)
        base_flops = 2.0 * original.nnz * original.shape[1]
        return SpaiEnv(seed=seed, original=original, plan=None,
                       baseline_residual=base_res, baseline_flops=base_flops,
                       rb=rb)
    plan = SpGEMMPlan(seed, original)
    # ‖original·original − I‖_F  (reference preconditioner.py:28 computes
    # calculate_residual(original, original))
    if identity:
        base_res = sqrt_n
    else:
        base_plan = (plan if original is seed
                     else SpGEMMPlan(original, original))
        base_vals = base_plan.numeric(original.data, original.data)
        base_res = jnp.sqrt(
            frobenius_sq_minus_identity(
                base_plan.out_row, base_plan.out_col, base_vals,
                original.shape[0]
            )
        )
    base_flops = 2.0 * original.nnz * original.shape[1]  # preconditioner.py:72
    return SpaiEnv(
        seed=seed,
        original=original,
        plan=plan,
        baseline_residual=base_res,
        baseline_flops=base_flops,
    )


# ---------------------------------------------------------------------------
# State transitions
# ---------------------------------------------------------------------------

def keep_mask_from_actions(actions: jax.Array, num_edges: int) -> jax.Array:
    """Action list (``-1``-padded, may contain the terminal index) → keep
    mask over edges.  Parity: the reference filters ``-1`` then deletes the
    listed edge positions (preconditioner.py:38-43, utils.py:323).

    Works on a single trajectory ``[T]`` (vmap for a batch).
    """
    valid = (actions >= 0) & (actions < num_edges)
    idx = jnp.where(valid, actions, num_edges)  # dump invalid into a slot we drop
    keep = jnp.ones(num_edges + 1, dtype=bool).at[idx].set(False)
    return keep[:num_edges]


def masked_values(env: SpaiEnv, keep: jax.Array) -> jax.Array:
    """Values of the thinned preconditioner M on the (static) seed pattern."""
    return env.seed.data * keep.astype(env.seed.data.dtype)


def residual_norm(env: SpaiEnv, keep: jax.Array) -> jax.Array:
    """``‖M·original − I‖_F`` with M = seed values masked by ``keep``.
    Parity: reference ``calculate_residual`` (preconditioner.py:79-93)."""
    if env.rb is not None:
        m_vals = masked_values(env, keep)
        return _rowblock.residual_norm_batch(env.rb, m_vals[None, :])[0]
    m_vals = masked_values(env, keep)
    c_vals = env.plan.numeric(m_vals, env.original.data)
    return jnp.sqrt(
        frobenius_sq_minus_identity(
            env.plan.out_row, env.plan.out_col, c_vals, env.n
        )
    )


def batched_residual_norms(env: SpaiEnv, keep: jax.Array) -> jax.Array:
    """[B, num_edges] keep masks → [B] residual norms, through whichever
    backend the env carries (rowblock: ONE batched MXU call)."""
    m_vals = env.seed.data[None, :] * keep.astype(env.seed.data.dtype)
    if env.rb is not None:
        return _rowblock.residual_norm_batch(env.rb, m_vals)
    return jax.vmap(
        lambda mv: jnp.sqrt(frobenius_sq_minus_identity(
            env.plan.out_row, env.plan.out_col,
            env.plan.numeric(mv, env.original.data), env.n))
    )(m_vals)


def matrix_flops(env: SpaiEnv, keep: jax.Array) -> jax.Array:
    """2·nnz(M)·ncols (reference preconditioner.py:68-72 sparse branch)."""
    nnz = jnp.sum(keep.astype(env.seed.data.dtype))
    return 2.0 * nnz * env.seed.shape[1]


def evaluate_preconditioner(env: SpaiEnv, keep: jax.Array, alpha: jax.Array) -> jax.Array:
    """α(1−res_ratio) + (1−α)(1−flop_ratio) — reference
    preconditioner.py:137-165 with B5 resolved (α passed in)."""
    res_ratio = residual_norm(env, keep) / env.baseline_residual
    comp_ratio = matrix_flops(env, keep) / env.baseline_flops
    return alpha * (1.0 - res_ratio) + (1.0 - alpha) * (1.0 - comp_ratio)


def reward(env: SpaiEnv, keep: jax.Array, alpha: jax.Array) -> jax.Array:
    """Terminal reward = metric × 1000 (reference preconditioner.py:64)."""
    return evaluate_preconditioner(env, keep, alpha) * 1000.0


def reward_from_actions(env: SpaiEnv, actions: jax.Array, alpha: jax.Array) -> jax.Array:
    """Full replay path of reference ``env.update`` (preconditioner.py:32-52)
    for one trajectory; vmap over a batch of action lists."""
    keep = keep_mask_from_actions(actions, env.num_edges)
    return reward(env, keep, alpha)


def rewards_from_keep(env: SpaiEnv, keep: jax.Array, alpha: jax.Array) -> jax.Array:
    """[B, num_edges] keep masks → [B] rewards; the batched residual runs
    as ONE call so the rowblock backend sees the whole batch (its dense
    einsums amortize the G reads over B — the point of the design)."""
    res_ratio = batched_residual_norms(env, keep) / env.baseline_residual
    nnz = jnp.sum(keep.astype(env.seed.data.dtype), axis=-1)
    comp_ratio = 2.0 * nnz * env.seed.shape[1] / env.baseline_flops
    metric = alpha * (1.0 - res_ratio) + (1.0 - alpha) * (1.0 - comp_ratio)
    return metric * 1000.0


def batched_rewards(env: SpaiEnv, actions: jax.Array, alpha: jax.Array) -> jax.Array:
    """``actions``: int32[B, T] (-1 padded) → rewards float[B]."""
    keep = jax.vmap(
        lambda a: keep_mask_from_actions(a, env.num_edges))(actions)
    return rewards_from_keep(env, keep, alpha)
