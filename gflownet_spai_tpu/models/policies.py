"""Forward (GATv2) and backward (LSTM) policies for the SPAI GFlowNet.

Forward policy — parity with reference policy.py:25-73:
  GATv2(1 → hidden, 4 heads, edge_dim=1) → ReLU → GATv2(4·hidden → hidden,
  1 head) → ReLU → global mean pool over the 2n node set → Linear(hidden →
  max_num_actions) → slice to the live nnz+1 actions → mask already-taken
  actions to −inf.  Also owns the learned reward-mixing scalar ``alpha``
  (reported as sigmoid; reference policy.py:32,71).

  Deviation from the reference (deliberate, B8): the policy returns *logits*,
  not softmax probabilities — all downstream math stays in log space.

Backward policy — parity with reference policy.py:75-129: an LSTM over the
``-1``-padded action-index sequence; the last valid hidden state feeds a
linear head of size max_num_actions whose first ``n_valid`` entries are
softmaxed into per-step backward probabilities, padded with 1.0 (so padding
contributes log 0 to the trajectory sum).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gat import GATv2Params, gatv2_apply, gatv2_apply_tiled, gatv2_init


# ---------------------------------------------------------------------------
# Forward policy
# ---------------------------------------------------------------------------

class ForwardPolicyParams(NamedTuple):
    gat1: GATv2Params
    gat2: GATv2Params
    fc_w: jax.Array     # [hidden, max_num_actions]
    fc_b: jax.Array     # [max_num_actions]
    alpha: jax.Array    # learned scalar, init 0.0 (reference policy.py:32)
    feat_w: jax.Array | None = None  # [F] value-aware logit channel weight
                                     # (None = reference-parity head)


class GraphInputs(NamedTuple):
    """Static graph of the seed pattern (reference ``state_to_data``,
    gflownet/gflownet.py:223-257): node features all-ones over 2n nodes,
    edges = seed nonzeros, edge features = seed values.

    ``action_feats`` [A, F]: static per-ACTION features for the
    value-aware logit channel (``action_feature_logits``) — currently
    F = 1, the scale-free log edge magnitude (0 for the terminal).  Only
    read when the policy carries a non-None ``feat_w``."""
    x: jax.Array         # [2n, 1]
    edge_src: jax.Array  # int32[nnz]
    edge_dst: jax.Array  # int32[nnz]
    edge_attr: jax.Array # [nnz, 1]
    action_feats: jax.Array | None = None   # [nnz+1, F]


def action_features(seed) -> jax.Array:
    """[nnz+1, 1] static per-action features: log(|v| / geomean|v|) of each
    deletable edge (scale-free "how small is this entry"), 0 for the
    terminal action.  With one learned weight on this channel the policy
    can express "delete small-magnitude entries first" directly — the
    reference's pooled@fc head (policy.py:59-63) must otherwise learn
    every action column independently from trajectory reward alone."""
    v = jnp.abs(seed.data) + 1e-30
    logv = jnp.log(v)
    f = logv - jnp.mean(logv)
    return jnp.concatenate([f, jnp.zeros((1,), f.dtype)])[:, None]


def graph_from_seed(seed) -> GraphInputs:
    n2 = 2 * seed.shape[0]
    return GraphInputs(
        x=jnp.ones((n2, 1), seed.data.dtype),
        edge_src=seed.row,
        edge_dst=seed.col,
        edge_attr=seed.data[:, None],
        action_feats=action_features(seed),
    )


class TiledGraphInputs(NamedTuple):
    """The static graph in the node-tile layout (ops.segment.SegTiles):
    per-edge arrays pre-permuted into [T·S] slot order with self-loops and
    their mean-filled edge features already appended — the large-nnz GAT
    substrate (no runtime scatter/sort/permutation)."""
    x: jax.Array          # [1, 1] — UNIFORM node features (the reference
                          # graph's all-ones x); shape[0] == 1 statically
                          # tells the GAT that layer-1 node transforms are
                          # node-independent, erasing both layer-1 gathers
    src_t: jax.Array      # int32[T·S]
    dst_t: jax.Array      # int32[T·S]
    attr_t: jax.Array     # [T·S, 1]
    tiles: object         # ops.segment.SegTiles (registered pytree)
    srcwin: object = None # ops.segment.SrcWindows — windowed-onehot plan
                          # for the layer-2 src-row gather (None = XLA
                          # gather)
    action_feats: jax.Array | None = None   # [nnz+1, F] action-ordered
                          # (NOT slot-ordered) — see GraphInputs
    gat_buckets: tuple | None = None        # tuple[models.gat.GatBucket] —
                          # bucketed-S fused-GAT layout (slot widths on a
                          # geometric ladder; ops.segment.SegBuckets)


def tiled_graph_from_seed(seed, tile_nodes: int = 128,
                          bucket_step: float | None = 1.5,
                          ) -> TiledGraphInputs:
    """Host-side build of the tile-layout graph (reference ``state_to_data``
    semantics, gflownet/gflownet.py:223-257, + GATv2Conv's add_self_loops
    with fill_value='mean' — mean of raw edge features equals mean of the
    linearly transformed ones, so it bakes in statically)."""
    import numpy as np

    from ..ops.segment import (build_seg_buckets, build_seg_tiles,
                               build_src_windows, to_tiles)
    from .gat import GatBucket

    n2 = 2 * seed.shape[0]
    loops = jnp.arange(n2, dtype=seed.row.dtype)
    src = jnp.concatenate([seed.row, loops])
    dst = jnp.concatenate([seed.col, loops])
    mean_attr = jnp.full((n2,), jnp.mean(seed.data), seed.data.dtype)
    attr = jnp.concatenate([seed.data, mean_attr])
    tiles = build_seg_tiles(np.asarray(dst), n2, tile_nodes=tile_nodes)
    src_t = to_tiles(tiles, src)
    gat_buckets = None
    if bucket_step is not None:
        sb = build_seg_buckets(np.asarray(dst), n2, tile_nodes=tile_nodes,
                               class_step=bucket_step)
        bks = []
        for tb, idx in zip(sb.tiles, sb.tile_idx):
            src_b = to_tiles(tb, src)
            bks.append(GatBucket(
                tiles=tb, tile_idx=idx, src_t=src_b,
                attr_t=to_tiles(tb, attr)[:, None],
                srcwin=build_src_windows(tb, np.asarray(src_b), n2)))
        gat_buckets = tuple(bks)
    return TiledGraphInputs(
        x=jnp.ones((1, 1), seed.data.dtype),
        src_t=src_t,
        dst_t=to_tiles(tiles, dst),
        attr_t=to_tiles(tiles, attr)[:, None],
        tiles=tiles,
        srcwin=build_src_windows(tiles, np.asarray(src_t), n2),
        action_feats=action_features(seed),
        gat_buckets=gat_buckets,
    )


def forward_policy_init(key, hidden_dim: int, max_num_actions: int,
                        node_features: int = 1, heads: int = 4,
                        dtype=jnp.float32,
                        terminal_bias: float = 0.0,
                        edge_feats: bool = False) -> ForwardPolicyParams:
    """``terminal_bias`` raises the terminal action's initial logit — a
    start-short curriculum for huge action spaces: an untrained
    (near-uniform) policy has ~A/2-step trajectories, so at 1M actions the
    terminal never enters a t_cap-sized rollout prefix and SubTB has no
    reward anchor to learn termination from (measured: mean_len pinned at
    t_cap for 800+ epochs at A=1e6).  A bias of b puts the terminal at
    expected sorted position ≈ A·P(Gumbel > b) ≈ A·e^{−b} — e.g. b=8 at
    A=1e6 starts trajectories at depth ~300, and the policy then deepens
    them as the reward warrants.  0 (default) = reference-parity init."""
    k1, k2, k3 = jax.random.split(key, 3)
    lim = jnp.sqrt(1.0 / hidden_dim)
    fc_b = jnp.zeros((max_num_actions,), dtype)
    if terminal_bias:
        fc_b = fc_b.at[max_num_actions - 1].set(terminal_bias)
    return ForwardPolicyParams(
        gat1=gatv2_init(k1, node_features, hidden_dim, heads, dtype=dtype),
        gat2=gatv2_init(k2, heads * hidden_dim, hidden_dim, 1, dtype=dtype),
        fc_w=jax.random.uniform(k3, (hidden_dim, max_num_actions), dtype, -lim, lim),
        fc_b=fc_b,
        alpha=jnp.zeros((), dtype),
        feat_w=jnp.zeros((1,), dtype) if edge_feats else None,
    )


def forward_policy_pooled(p: ForwardPolicyParams, g, hidden_dim: int,
                          heads: int = 4) -> jax.Array:
    """GATv2 ×2 + global mean pool → the [hidden] graph embedding (the part
    of the forward policy *before* the action head; split out so the head
    can be sharded over a mesh axis — parallel/tp.py).  Dispatches on the
    graph container: ``TiledGraphInputs`` rides the Pallas tile kernels."""
    if isinstance(g, TiledGraphInputs):
        n_nodes = g.tiles.num_nodes
        bks = getattr(g, "gat_buckets", None)
        h = gatv2_apply_tiled(p.gat1, g.x, g.tiles, g.src_t, g.dst_t,
                              g.attr_t, n_nodes, heads, hidden_dim,
                              srcwin=g.srcwin, buckets=bks)
        h = jax.nn.relu(h)
        h = gatv2_apply_tiled(p.gat2, h, g.tiles, g.src_t, g.dst_t,
                              g.attr_t, n_nodes, 1, hidden_dim,
                              srcwin=g.srcwin, buckets=bks)
    else:
        n_nodes = g.x.shape[0]
        h = gatv2_apply(p.gat1, g.x, g.edge_src, g.edge_dst, g.edge_attr,
                        n_nodes, heads, hidden_dim)
        h = jax.nn.relu(h)
        h = gatv2_apply(p.gat2, h, g.edge_src, g.edge_dst, g.edge_attr,
                        n_nodes, 1, hidden_dim)
    h = jax.nn.relu(h)
    return h.mean(axis=0)                         # global_mean_pool, batch=1


def forward_policy_logits(p: ForwardPolicyParams, g: GraphInputs,
                          num_actions: int, hidden_dim: int,
                          heads: int = 4) -> jax.Array:
    """Action logits [num_actions] for the static seed graph.

    Because the rollout state never mutates the graph (SURVEY.md §3.1), this
    is called ONCE per rollout and the taken-action mask is applied outside —
    the reference recomputes this identical forward every step
    (gflownet/gflownet.py:145).
    """
    pooled = forward_policy_pooled(p, g, hidden_dim, heads)
    logits = pooled @ p.fc_w + p.fc_b             # [max_num_actions]
    logits = logits[:num_actions]                 # slice to live nnz+1
    if p.feat_w is not None and getattr(g, "action_feats", None) is not None:
        # value-aware channel: one learned weight per static per-action
        # feature (zero-init → reference-parity logits at start)
        logits = logits + g.action_feats[:num_actions] @ p.feat_w
    return logits


def forward_policy_alpha(p: ForwardPolicyParams) -> jax.Array:
    return jax.nn.sigmoid(p.alpha)


# ---------------------------------------------------------------------------
# State-flow head (SubTB-λ only)
# ---------------------------------------------------------------------------

class FlowHeadParams(NamedTuple):
    """log F(s_t) for the SubTB(λ) objective (gfn.loss.subtb_loss).

    A rollout state is fully described by the set of deleted edges
    (SURVEY.md §3.1 — the graph itself never evolves), so the flow head
    parameterizes

        log F(s_t) = w · [1, t̂, t̂², t̂³]  +  Σ_{u≤t} d[a_u],   t̂ = t/T

    a smooth depth trend (flows shrink roughly linearly in log-space as
    edges are deleted) plus a learned per-edge flow delta ``d`` — both
    O(1)-cheap per step (one cumsum of gathered scalars), which matters at
    10⁵-step trajectories.  The t=0 intercept doubles as log Z.
    """
    poly_w: jax.Array   # [4]
    edge_d: jax.Array   # [max_num_actions]


def flow_head_init(max_num_actions: int, dtype=jnp.float32) -> FlowHeadParams:
    return FlowHeadParams(
        poly_w=jnp.zeros((4,), dtype),
        edge_d=jnp.zeros((max_num_actions,), dtype),
    )


def flow_head_logF(p: FlowHeadParams, actions: jax.Array) -> jax.Array:
    """[B, T] padded action matrix → [B, T+1] log F(s_t) for t = 0..T."""
    B, T = actions.shape
    dtype = p.poly_w.dtype
    t_hat = (jnp.arange(T + 1, dtype=dtype) / jnp.asarray(T, dtype))[None, :]
    base = (p.poly_w[0] + p.poly_w[1] * t_hat + p.poly_w[2] * t_hat**2
            + p.poly_w[3] * t_hat**3)                      # [1, T+1]
    valid = actions >= 0
    d = jnp.where(valid, p.edge_d[jnp.maximum(actions, 0)], 0.0)
    cum = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), jnp.cumsum(d, axis=-1)], axis=-1
    )                                                      # [B, T+1]
    return base + cum


# ---------------------------------------------------------------------------
# Backward policy
# ---------------------------------------------------------------------------

class BackwardPolicyParams(NamedTuple):
    w_ih: jax.Array   # [input_dim, 4*hidden]
    w_hh: jax.Array   # [hidden, 4*hidden]
    b: jax.Array      # [4*hidden]
    fc_w: jax.Array   # [hidden, max_num_actions]
    fc_b: jax.Array   # [max_num_actions]


def backward_policy_init(key, hidden_dim: int, max_num_actions: int,
                         input_dim: int = 1, dtype=jnp.float32) -> BackwardPolicyParams:
    k1, k2, k3 = jax.random.split(key, 3)
    lim = jnp.sqrt(1.0 / hidden_dim)
    u = lambda k, s: jax.random.uniform(k, s, dtype, -lim, lim)
    return BackwardPolicyParams(
        w_ih=u(k1, (input_dim, 4 * hidden_dim)),
        w_hh=u(k2, (hidden_dim, 4 * hidden_dim)),
        b=jnp.zeros((4 * hidden_dim,), dtype),
        fc_w=u(k3, (hidden_dim, max_num_actions)),
        fc_b=jnp.zeros((max_num_actions,), dtype),
    )


def _lstm_cell(p: BackwardPolicyParams, carry, x_t):
    h, c = carry
    gates = x_t @ p.w_ih + h @ p.w_hh + p.b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


def backward_policy_logprobs(p: BackwardPolicyParams, actions: jax.Array,
                             hidden_dim: int) -> jax.Array:
    """Per-step backward log-probabilities for one trajectory.

    ``actions``: int32[T], ``-1``-padded.  Returns float[T] where entry t is
    ``log P_B(step t)``; padded steps contribute exactly 0 (the reference
    pads probabilities with 1.0, policy.py:125).

    The scan replaces the reference's per-sample Python loop + packed
    sequences (policy.py:93-113): we run the LSTM over the full padded
    sequence but freeze the carry on padded steps, which is equivalent to
    stopping at the last valid step.
    """
    T = actions.shape[0]
    valid = actions >= 0
    n_valid = jnp.sum(valid.astype(jnp.int32))
    xs = actions.astype(p.w_ih.dtype)[:, None]          # input_dim = 1

    def step(carry, inp):
        x_t, v = inp
        new_carry, h = _lstm_cell(p, carry, x_t)
        carry = jax.tree_util.tree_map(
            lambda new, old: jnp.where(v, new, old), new_carry, carry
        )
        return carry, None

    h0 = jnp.zeros((hidden_dim,), p.w_ih.dtype)
    (h_last, _), _ = jax.lax.scan(step, (h0, h0), (xs, valid))

    logits = h_last @ p.fc_w + p.fc_b                   # [max_num_actions]
    step_ids = jnp.arange(T)
    # softmax over the first n_valid entries, evaluated at position t
    masked = jnp.where(step_ids < n_valid, logits[:T], -jnp.inf)
    logp = jax.nn.log_softmax(masked)
    return jnp.where(step_ids < n_valid, logp, 0.0)


def backward_policy_batch(p: BackwardPolicyParams, actions: jax.Array,
                          hidden_dim: int) -> jax.Array:
    """[B, T] action matrix → [B, T] backward log-probs (vmap of the above)."""
    return jax.vmap(lambda a: backward_policy_logprobs(p, a, hidden_dim))(actions)


# --- TPU-native backward policies ------------------------------------------
#
# The LSTM above reproduces the reference's backward policy (policy.py:
# 75-129), but its recurrence is an irreducible serial chain: 28k-step
# trajectories cost ~42 ms forward / ~120 ms with gradients on a v5e, and
# ``lax.scan(unroll=…)`` does not help (measured — the dependency chain,
# not loop overhead, is the cost).  A backward policy is just *some*
# distribution over parents, so the framework also offers:
#
#   * ``uniform`` — P_B uniform over the t deleted edges of state s_t
#     (the standard GFlowNet default): closed form, zero parameters, O(1).
#   * ``linear`` — a gated LINEAR recurrence h_t = σ(g_t)·h_{t−1} +
#     (1−σ(g_t))·v_t over learned per-action embeddings, evaluated by
#     ``jax.lax.associative_scan`` in O(log T) depth, with the same
#     last-valid-step readout as the LSTM.  Learned and parallel.

def uniform_backward_logprobs(actions: jax.Array,
                              terminal_action: int) -> jax.Array:
    """[B, T] actions → [B, T] log P_B under the uniform-parent policy.

    After the (t+1)-th deletion the state has t+1 deleted edges, any of
    which could have been deleted last: log P_B = −log(t+1).  The terminal
    transition is deterministic backward (contributes 0); padding
    contributes 0 (reference pads probability 1, policy.py:125)."""
    B, T = actions.shape
    deletion = (actions >= 0) & (actions != terminal_action)
    t_idx = jnp.cumsum(deletion.astype(jnp.int32), axis=-1)   # 1-based count
    lp = -jnp.log(t_idx.astype(jnp.float32))
    return jnp.where(deletion, lp, 0.0)


class LinearBackwardParams(NamedTuple):
    emb_g: jax.Array   # [max_num_actions] per-action gate pre-activation
    emb_v: jax.Array   # [max_num_actions, hidden] per-action value
    fc_w: jax.Array    # [hidden, max_num_actions]
    fc_b: jax.Array    # [max_num_actions]


def linear_backward_init(key, hidden_dim: int, max_num_actions: int,
                         dtype=jnp.float32) -> LinearBackwardParams:
    k1, k2 = jax.random.split(key)
    lim = jnp.sqrt(1.0 / hidden_dim)
    return LinearBackwardParams(
        emb_g=jnp.ones((max_num_actions,), dtype),   # σ(1) ≈ 0.73 retention
        emb_v=jax.random.uniform(k1, (max_num_actions, hidden_dim), dtype,
                                 -lim, lim),
        fc_w=jax.random.uniform(k2, (hidden_dim, max_num_actions), dtype,
                                -lim, lim),
        fc_b=jnp.zeros((max_num_actions,), dtype),
    )


def linear_backward_logprobs(p: LinearBackwardParams,
                             actions: jax.Array) -> jax.Array:
    """One trajectory: int32[T] −1-padded actions → float[T] log P_B.

    h_t = a_t·h_{t−1} + b_t with a_t = σ(emb_g[act_t]) (1 on padding — the
    carry freezes, matching the LSTM's pad handling) and b_t =
    (1−a_t)·emb_v[act_t] (0 on padding).  First-order linear recurrences
    compose associatively: (a₁,b₁)∘(a₂,b₂) = (a₁a₂, a₂b₁+b₂), so the whole
    sequence evaluates in O(log T) parallel depth."""
    T = actions.shape[0]
    valid = actions >= 0
    n_valid = jnp.sum(valid.astype(jnp.int32))
    idx = jnp.maximum(actions, 0)
    a = jnp.where(valid, jax.nn.sigmoid(p.emb_g[idx]), 1.0)[:, None]
    b = jnp.where(valid[:, None], (1.0 - a) * p.emb_v[idx], 0.0)

    # optimal-adjoint scan (ops.scan): the analytic VJP is ONE reverse
    # scan instead of AD through the combinator tree — the backward of
    # these scans was the 112k-action train step's bound (BENCH round 3)
    from ..ops.scan import linear_scan

    h = linear_scan(jnp.broadcast_to(a, b.shape), b)
    h_last = h[-1]                                       # carry froze on pads
    logits = h_last @ p.fc_w + p.fc_b
    step_ids = jnp.arange(T)
    masked = jnp.where(step_ids < n_valid, logits[:T], -jnp.inf)
    logp = jax.nn.log_softmax(masked)
    return jnp.where(step_ids < n_valid, logp, 0.0)


def linear_backward_batch(p: LinearBackwardParams,
                          actions: jax.Array) -> jax.Array:
    return jax.vmap(lambda aa: linear_backward_logprobs(p, aa))(actions)
