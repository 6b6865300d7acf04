"""Row-sharded GATv2 policy forward (VERDICT r3 item 6).

At 1M+ edges the policy forward dominates the sharded train step (119.6 ms
at 1.58M edges replicated — docs/BENCH.md round-3), because the sampler's
``shard_map`` ran ``forward_policy_pooled`` REPLICATED on every rows-shard.
The node-tile layout (ops.segment.SegTiles) already makes tiles
independent, so this module shards the TILE axis over ``rows``:

* layer 1 (uniform node features — the policy graph's all-ones x) is
  embarrassingly parallel: each shard runs the fused GAT kernel
  (ops.gat_fused) on its tile block only;
* layer 2's src-row gather crosses tiles, so the layer-1 output is
  transformed locally (``h_loc @ w_src`` — [n_loc, hidden], the SMALL
  per-node tensor) and ``all_gather``-ed once (nodes ≪ edges: the [N, h]
  feature matrix is ~3 orders smaller than the [T·S, H·D] slot tensors
  that stay shard-local); the windowed-onehot gather plan
  (ops.segment.SrcWindows) is pre-split per shard host-side;
* the global mean pool is a masked local sum + ``psum``.

Exactness: identical math to the replicated
``models.policies.forward_policy_pooled`` on a TiledGraphInputs — tested
on the virtual CPU mesh (tests/test_parallel.py), gradients included
(shard_map transposes the all_gather/psum pair automatically).

Reference substrate parity: the per-edge GAT hot loop,
/root/reference/policy.py:21,29,49-55.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.policies import ForwardPolicyParams, TiledGraphInputs
from ..ops.segment import SegTiles, SrcWindows

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedTiledGraph(NamedTuple):
    """Per-tile graph arrays padded so the tile axis splits evenly over the
    rows mesh axis; built once host-side by ``shard_tiled_graph``.  All
    leading dims are T_pad (or T_pad·S / R·O) so a ``P("rows")`` in_spec
    hands each shard its contiguous tile block."""
    x: jax.Array          # [1, 1] uniform node features (replicated)
    src_t: jax.Array      # int32[T_pad·S]
    attr_t: jax.Array     # [T_pad·S, 1]
    local_dst: jax.Array  # int32[T_pad, S]
    lsrc: jax.Array       # int32[T_pad, S] window-local src (2·win = miss)
    blk: jax.Array        # int32[T_pad]
    out_slot: jax.Array   # int32[R·O] shard-LOCAL flat slot ids (T_loc·S pad)
    out_src: jax.Array    # int32[R·O]


class ShardedGraphMeta(NamedTuple):
    tiles: int            # T_pad (global)
    slots: int
    tile_nodes: int
    num_nodes: int
    win: int
    rows_pad: int
    n_shards: int


def shard_tiled_graph(g: TiledGraphInputs, n_shards: int):
    """Pad + re-lay a TiledGraphInputs for tile-sharded execution.
    Returns ``(ShardedTiledGraph, ShardedGraphMeta)``."""
    t0: SegTiles = g.tiles
    sw: SrcWindows = g.srcwin
    if sw is None:
        raise ValueError("shard_tiled_graph needs a srcwin plan "
                         "(tiled_graph_from_seed builds one)")
    if getattr(g, "gat_buckets", None):
        # the sharded forward consumes the uniform tile layout only; the
        # bucketed-S ladder does not survive the tile-axis split (each
        # ladder class has its own T_b — a per-class shard would need its
        # own padding/outlier plans).  Train setup avoids building buckets
        # for this path (train.loop._graph); warn direct callers.
        print("shard_tiled_graph: dropping gat_buckets (sharded GAT runs "
              "the uniform tile layout)", flush=True)
    T, S, TN = t0.tiles, t0.slots, t0.tile_nodes
    T_pad = _round_up(T, n_shards)
    pad_t = T_pad - T
    ld = np.asarray(t0.local_dst)
    src = np.asarray(g.src_t).reshape(T, S)
    attr = np.asarray(g.attr_t).reshape(T, S)
    lsrc = np.asarray(sw.lsrc)
    blk = np.asarray(sw.blk)
    if pad_t:
        # empty tiles: every slot is padding (local_dst = TN → zero onehot,
        # lsrc = 2·win → gathered 0); they also widen the node padding
        ld = np.concatenate([ld, np.full((pad_t, S), TN, np.int32)])
        src = np.concatenate([src, np.zeros((pad_t, S), src.dtype)])
        attr = np.concatenate([attr, np.zeros((pad_t, S), attr.dtype)])
        lsrc = np.concatenate(
            [lsrc, np.full((pad_t, S), 2 * sw.win, np.int32)])
        blk = np.concatenate([blk, np.zeros((pad_t,), np.int32)])

    # split the outlier fixup list by owning shard, with shard-local slot
    # ids; pad every shard to one common (lane-rounded) length
    T_loc = T_pad // n_shards
    o_slot = np.asarray(sw.out_slot)
    o_src = np.asarray(sw.out_src)
    real = o_slot < T * S
    o_slot, o_src = o_slot[real], o_src[real]
    owner = o_slot // (T_loc * S)
    per = [(o_slot[owner == s] - s * T_loc * S, o_src[owner == s])
           for s in range(n_shards)]
    o_max = _round_up(max([len(p[0]) for p in per] + [1]), _LANE)
    slot_out = np.full((n_shards, o_max), T_loc * S, np.int32)
    src_out = np.zeros((n_shards, o_max), np.int32)
    for s, (sl, sr) in enumerate(per):
        slot_out[s, :len(sl)] = sl
        src_out[s, :len(sr)] = sr

    sg = ShardedTiledGraph(
        x=g.x,
        src_t=jnp.asarray(src.reshape(-1)),
        attr_t=jnp.asarray(attr.reshape(-1, 1)),
        local_dst=jnp.asarray(ld),
        lsrc=jnp.asarray(lsrc),
        blk=jnp.asarray(blk),
        out_slot=jnp.asarray(slot_out.reshape(-1)),
        out_src=jnp.asarray(src_out.reshape(-1)),
    )
    meta = ShardedGraphMeta(
        tiles=T_pad, slots=S, tile_nodes=TN, num_nodes=t0.num_nodes,
        win=sw.win, rows_pad=sw.rows_pad, n_shards=n_shards,
    )
    return sg, meta


def _local_tiles(meta: ShardedGraphMeta, local_dst) -> SegTiles:
    T_loc = meta.tiles // meta.n_shards
    return SegTiles(
        perm=jnp.zeros((0,), jnp.int32),          # unused by the kernels
        local_dst=local_dst,
        num_nodes=meta.num_nodes, num_edges=0,
        tiles=T_loc, tile_nodes=meta.tile_nodes, slots=meta.slots,
    )


def sharded_policy_pooled(p: ForwardPolicyParams, sg: ShardedTiledGraph,
                          meta: ShardedGraphMeta, hidden_dim: int,
                          heads: int = 4, axis: str = "rows",
                          interpret: bool = False) -> jax.Array:
    """The [hidden] pooled policy embedding, computed tile-sharded.  Call
    INSIDE a shard_map over ``axis`` with ``sg`` arrays sharded P(axis)
    (x replicated).  Matches ``models.policies.forward_policy_pooled``."""
    from ..ops.gat_fused import gat_tile_fused
    from ..ops.segment import gather_rows_windows

    T_loc = meta.tiles // meta.n_shards
    S, TN = meta.slots, meta.tile_nodes
    n_loc = T_loc * TN
    tiles_loc = _local_tiles(meta, sg.local_dst)
    j = jax.lax.axis_index(axis)
    gid = j * n_loc + jnp.arange(n_loc, dtype=jnp.int32)
    node_mask = (gid < meta.num_nodes)[:, None]

    # ---- layer 1 (uniform x: both gathers vanish) ----
    H1, D1 = heads, hidden_dim
    xs1 = sg.x @ p.gat1.w_src + p.gat1.b_src       # [1, H1·D1]
    xd1 = sg.x @ p.gat1.w_dst
    h = gat_tile_fused(tiles_loc, sg.attr_t.reshape(-1), xs1, xd1,
                       p.gat1.w_edge[0], p.gat1.att.reshape(H1, D1),
                       interpret=interpret)        # [n_loc, H1·D1]
    h = jnp.where(node_mask, jax.nn.relu(h + p.gat1.bias), 0.0)

    # ---- layer 2 (heads=1): local transform, ONE all_gather of the small
    # per-node features, windowed src gather, local fused kernel ----
    xs2_loc = h @ p.gat2.w_src + p.gat2.b_src      # [n_loc, D2]
    xd2_loc = h @ p.gat2.w_dst
    xs2 = jax.lax.all_gather(xs2_loc, axis).reshape(-1, hidden_dim)
    n_tot = xs2.shape[0]
    if meta.rows_pad > n_tot:
        xs2 = jnp.pad(xs2, ((0, meta.rows_pad - n_tot), (0, 0)))
    else:
        xs2 = xs2[:meta.rows_pad]
    sw_loc = SrcWindows(
        lsrc=sg.lsrc, blk=sg.blk, out_slot=sg.out_slot, out_src=sg.out_src,
        win=meta.win, rows_pad=meta.rows_pad,
    )
    xs2_slot = gather_rows_windows(sw_loc, tiles_loc, sg.src_t, xs2,
                                   interpret=interpret)   # [T_loc·S, D2]
    h2 = gat_tile_fused(tiles_loc, sg.attr_t.reshape(-1), xs2_slot, xd2_loc,
                        p.gat2.w_edge[0], p.gat2.att.reshape(1, hidden_dim),
                        interpret=interpret)       # [n_loc, D2]
    h2 = jnp.where(node_mask, jax.nn.relu(h2 + p.gat2.bias), 0.0)

    # ---- masked global mean pool ----
    pooled = jax.lax.psum(jnp.sum(h2, axis=0), axis) / meta.num_nodes
    return pooled
