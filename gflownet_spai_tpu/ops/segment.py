"""Pallas segment-softmax / segment-sum: the GAT scatter substrate on TPU.

The reference's GAT rides torch_scatter's CUDA segment kernels (reference
policy.py:21,29 via torch_geometric — SURVEY.md §2 row L0).  On TPU,
``jax.ops.segment_sum/max`` lower to sorted-scatter HLOs that serialize; and
Mosaic has no arbitrary vector scatter at all.  The TPU-native shape is a
**node-tile layout**: group edges by destination node into tiles of ``TN``
consecutive nodes × ``S`` edge slots (padded), computed ONCE per static
graph.  Inside a tile every segment op becomes dense 2-D math:

* one-hot membership ``onehot[v, s] = (local_dst[s] == v)``  — a compare
  against a broadcasted iota,
* segment-max / softmax — masked row reductions over the S (lane) axis,
* segment-sum of features — ``onehot @ vals``: an MXU matmul.

No scatter, no gather, no sort at runtime; every tensor is grid-mapped with
static block shapes (Pallas double-buffers the streaming).  Tiles are
disjoint in edge slots, so outputs write racelessly.

Semantics match ``jax.ops.segment_*`` on sorted segments exactly (jnp
reference implementations below are the test oracles and the CPU path).
"""

from __future__ import annotations

import dataclasses
from functools import partial


import numpy as np
import jax
import jax.numpy as jnp

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class SegTiles:
    """Static node-tile layout for a fixed segment structure.

    ``perm``: int32[T·S] — edge-slot → original edge index (padding slots
    point at index E, i.e. one past the end — callers append a dummy row).
    ``local_dst``: int32[T, S] — destination node id within the tile
    (0..TN−1), TN for padding slots.
    """

    perm: jax.Array
    local_dst: jax.Array
    num_nodes: int = dataclasses.field(metadata={"static": True})
    num_edges: int = 0
    tiles: int = 0
    tile_nodes: int = 0
    slots: int = 0

    @property
    def n_pad(self) -> int:
        return self.tiles * self.tile_nodes


jax.tree_util.register_dataclass(
    SegTiles,
    data_fields=["perm", "local_dst"],
    meta_fields=["num_nodes", "num_edges", "tiles", "tile_nodes", "slots"],
)


def build_seg_tiles(ids, num_nodes: int, tile_nodes: int = 128) -> SegTiles:
    """Host-side layout build from arbitrary (unsorted) segment ids [E].

    ``S`` = the max edge count over node tiles, rounded to the lane width;
    skew within a tile only costs padding slots, never correctness."""
    ids = np.asarray(ids, np.int64)
    E = len(ids)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    T = _round_up(max(num_nodes, 1), tile_nodes) // tile_nodes
    # edges per tile via the sorted boundaries
    bounds = np.searchsorted(sorted_ids, np.arange(T + 1) * tile_nodes)
    counts = np.diff(bounds)
    S = _round_up(max(int(counts.max()) if T else 1, 1), _LANE)
    perm = np.full((T, S), E, np.int64)
    local = np.full((T, S), tile_nodes, np.int64)
    for t in range(T):
        k = int(counts[t])
        perm[t, :k] = order[bounds[t]:bounds[t + 1]]
        local[t, :k] = sorted_ids[bounds[t]:bounds[t + 1]] - t * tile_nodes
    return SegTiles(
        perm=jnp.asarray(perm.reshape(-1), jnp.int32),
        local_dst=jnp.asarray(local, jnp.int32),
        num_nodes=num_nodes,
        num_edges=E,
        tiles=T,
        tile_nodes=tile_nodes,
        slots=S,
    )


@dataclasses.dataclass(frozen=True)
class SegBuckets:
    """Bucketed-S tile layout: tiles grouped by per-tile edge count into a
    geometric ladder of slot widths (rowblock's class-ladder idea applied
    to the GAT substrate).

    ``build_seg_tiles`` pads every tile to the GLOBAL max edge count, so a
    skewed degree distribution wastes slots (measured 0.48 utilization at
    the 1.7M-edge policy graph — docs/BENCH.md round 4); since the fused
    GAT kernel's work is proportional to T·S, that is a ~2× tax.  Here
    each bucket ``b`` holds the tiles whose (lane-rounded) edge count fits
    its ladder class ``S_b``, as a self-contained :class:`SegTiles` over
    ``T_b`` tiles, plus ``tile_idx[b]`` mapping bucket-tile → global tile
    index.  Node-side arrays stay in GLOBAL tile order; per-bucket node
    blocks are stitched with one [T_b, TN, C] row-block gather/scatter
    (≈13 MB at n=200k — negligible next to the slot-work saved).
    """

    tiles: tuple          # tuple[SegTiles, ...] (shared tile_nodes)
    tile_idx: tuple       # tuple[int32[T_b], ...] global tile indices

    @property
    def slot_total(self) -> int:
        return sum(t.tiles * t.slots for t in self.tiles)


jax.tree_util.register_dataclass(
    SegBuckets, data_fields=["tiles", "tile_idx"], meta_fields=[])


def build_seg_buckets(ids, num_nodes: int, tile_nodes: int = 128,
                      class_step: float = 1.5) -> SegBuckets:
    """Host-side bucketed layout build (same inputs as ``build_seg_tiles``).

    Ladder classes start at one lane (128 slots) and grow by
    ``class_step`` (lane-rounded, strictly increasing), so the number of
    kernel variants to compile is O(log(S_max/128)).  A graph with no
    skew degenerates to a single bucket identical to ``build_seg_tiles``.
    """
    ids = np.asarray(ids, np.int64)
    E = len(ids)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    T = _round_up(max(num_nodes, 1), tile_nodes) // tile_nodes
    bounds = np.searchsorted(sorted_ids, np.arange(T + 1) * tile_nodes)
    counts = np.diff(bounds)
    s_max = _round_up(max(int(counts.max()) if T else 1, 1), _LANE)
    ladder = [_LANE]
    while ladder[-1] < s_max:
        ladder.append(min(max(_round_up(int(ladder[-1] * class_step), _LANE),
                              ladder[-1] + _LANE), s_max))
    ladder = np.asarray(ladder, np.int64)
    need = np.maximum(_round_up(1, _LANE),
                      ((counts + _LANE - 1) // _LANE) * _LANE)
    cls = np.searchsorted(ladder, need)           # per-tile ladder class
    b_tiles, b_idx = [], []
    for c in np.unique(cls):
        sel = np.nonzero(cls == c)[0]
        S = int(ladder[c])
        perm = np.full((len(sel), S), E, np.int64)
        local = np.full((len(sel), S), tile_nodes, np.int64)
        for i, t in enumerate(sel):
            k = int(counts[t])
            perm[i, :k] = order[bounds[t]:bounds[t + 1]]
            local[i, :k] = sorted_ids[bounds[t]:bounds[t + 1]] \
                - t * tile_nodes
        b_tiles.append(SegTiles(
            perm=jnp.asarray(perm.reshape(-1), jnp.int32),
            local_dst=jnp.asarray(local, jnp.int32),
            num_nodes=len(sel) * tile_nodes,
            num_edges=E,
            tiles=len(sel),
            tile_nodes=tile_nodes,
            slots=S,
        ))
        b_idx.append(jnp.asarray(sel, jnp.int32))
    return SegBuckets(tiles=tuple(b_tiles), tile_idx=tuple(b_idx))


def to_tiles(tiles: SegTiles, vals: jax.Array) -> jax.Array:
    """[E, ...] edge array → [T·S, ...] tile-slot layout (one static gather;
    for hot paths, store edge data in tile layout from the start and skip
    this).  Padding slots read an appended zero row."""
    zero = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
    return jnp.concatenate([vals, zero], axis=0)[tiles.perm]


def from_tiles(tiles: SegTiles, vals_t: jax.Array) -> jax.Array:
    """Inverse of ``to_tiles`` for per-edge outputs: scatter tile slots back
    to original edge order (static permutation)."""
    out = jnp.zeros((tiles.num_edges + 1,) + vals_t.shape[1:], vals_t.dtype)
    return out.at[tiles.perm].set(vals_t)[: tiles.num_edges]


# ---------------------------------------------------------------------------
# jnp reference implementations (CPU path + interpret-mode oracles)
# ---------------------------------------------------------------------------

def _onehot(local_dst_row: jax.Array, tn: int) -> jax.Array:
    v = jax.lax.broadcasted_iota(jnp.int32, (tn, local_dst_row.shape[-1]), 0)
    return v == local_dst_row


def segment_softmax_tiles_jnp(tiles: SegTiles, scores_t: jax.Array) -> jax.Array:
    """[T, S] per-slot scores → [T, S] softmax within segments (padding → 0)."""

    def one(s, lid):
        oh = _onehot(lid[None, :], tiles.tile_nodes)            # [TN, S]
        m = jnp.max(jnp.where(oh, s[None, :], -jnp.inf), axis=1, keepdims=True)
        z = jnp.where(oh, s[None, :] - m, -jnp.inf)
        ex = jnp.exp(z)
        den = jnp.sum(ex, axis=1, keepdims=True)
        return jnp.sum(ex / jnp.maximum(den, 1e-30), axis=0)

    return jax.vmap(one)(scores_t, tiles.local_dst)


def segment_sum_tiles_jnp(tiles: SegTiles, vals_t: jax.Array) -> jax.Array:
    """[T, S, D] per-slot values → [T·TN, D] per-node sums."""

    def one(v, lid):
        oh = _onehot(lid[None, :], tiles.tile_nodes).astype(v.dtype)
        return jnp.matmul(oh, v, precision="highest")           # [TN, D]

    return jax.vmap(one)(vals_t, tiles.local_dst).reshape(tiles.n_pad, -1)


def segment_max_tiles_jnp(tiles: SegTiles, vals_t: jax.Array) -> jax.Array:
    """[T, S] per-slot values → [T·TN] per-node max (−inf where empty)."""

    def one(v, lid):
        oh = _onehot(lid[None, :], tiles.tile_nodes)
        return jnp.max(jnp.where(oh, v[None, :], -jnp.inf), axis=1)

    return jax.vmap(one)(vals_t, tiles.local_dst).reshape(tiles.n_pad)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _softmax_kernel(tn: int, heads: int):
    # blocks are [1, H, S]: Mosaic needs the sublane dim of a block to be
    # 8-divisible OR equal to the array's — matching the full H axis
    # satisfies the latter, and looping the (static, tiny) head count
    # inside one kernel instance amortizes the per-tile launch overhead
    # 4× vs one pallas_call per head
    def kernel(ids_ref, s_ref, out_ref):
        lid = ids_ref[0, 0, :][None, :]                         # [1, S]
        oh = jax.lax.broadcasted_iota(
            jnp.int32, (tn, lid.shape[-1]), 0) == lid           # [TN, S]
        for hh in range(heads):
            s = s_ref[0, hh, :][None, :]                        # [1, S]
            m = jnp.max(jnp.where(oh, s, -1e30), axis=1, keepdims=True)
            z = jnp.where(oh, s - m, -1e30)
            ex = jnp.exp(z)
            den = jnp.sum(ex, axis=1, keepdims=True)
            out_ref[0, hh, :] = jnp.sum(
                ex / jnp.maximum(den, 1e-30), axis=0)

    return kernel


def _softmax_pallas(tn: int, interpret: bool, local_dst, scores_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, S = scores_t.shape
    out = pl.pallas_call(
        _softmax_kernel(tn, H),
        out_shape=jax.ShapeDtypeStruct((T, H, S), scores_t.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, S), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * S * tn,
            bytes_accessed=3 * T * S * 4,
            transcendentals=T * S * tn,
        ),
        interpret=interpret,
    )(local_dst.reshape(T, 1, S), scores_t)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _softmax_tiles_p(tn: int, interpret: bool, local_dst, scores_t):
    return _softmax_pallas(tn, interpret, local_dst, scores_t)


def _softmax_tiles_fwd(tn, interpret, local_dst, scores_t):
    y = _softmax_pallas(tn, interpret, local_dst, scores_t)
    return y, (local_dst, y)


def _softmax_tiles_bwd(tn, interpret, res, g):
    # dℓ/ds = y ⊙ (g − Σ_seg y·g): one segment-sum + one broadcast — both
    # tile matmuls, so the backward pass is Pallas too.  Heads fold into
    # the matmul's D axis ([T, S, H]).
    local_dst, y = res
    yg = jnp.moveaxis(y * g, 1, 2)                                # [T, S, H]
    seg = _sum_pallas(tn, interpret, local_dst, yg)               # [T,TN,H]
    dot = _broadcast_pallas(tn, interpret, local_dst, seg)        # [T, S, H]
    return (None, y * (g - jnp.moveaxis(dot, 2, 1)))


_softmax_tiles_p.defvjp(_softmax_tiles_fwd, _softmax_tiles_bwd)


def segment_softmax_tiles(tiles: SegTiles, scores_t: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Pallas segment softmax over the tile layout: [T, S] → [T, S].
    Grid over tiles; everything dense 2-D in VMEM (see module docstring).
    Differentiable (custom VJP — the backward pass is segment-sum +
    broadcast, i.e. two more tile matmuls).  Falls back to jnp off-TPU."""
    if not (_use_pallas() or interpret):
        return segment_softmax_tiles_jnp(tiles, scores_t)
    T, S = scores_t.shape
    return _softmax_tiles_p(tiles.tile_nodes, interpret, tiles.local_dst,
                            scores_t[:, None, :])[:, 0, :]


def segment_softmax_tiles_mh(tiles: SegTiles, scores_t: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Multi-head segment softmax: [T, H, S] → [T, H, S] in ONE kernel
    (the GAT path — one launch per tile regardless of head count)."""
    if not (_use_pallas() or interpret):
        return jax.vmap(lambda st: segment_softmax_tiles_jnp(tiles, st),
                        in_axes=1, out_axes=1)(scores_t)
    return _softmax_tiles_p(tiles.tile_nodes, interpret, tiles.local_dst,
                            scores_t)



def _mm_split(oh, x, oh_left: bool = True):
    """Onehot-sided matmul as 2 DEFAULT-precision passes on the hi/lo split
    of the real operand (~f32-exact: the 0/1 operand is exactly
    bf16-representable, so only lo's own bf16 cast rounds, <= 2^-18 rel).
    Replaces precision="highest" (6 passes) in the tile kernels —
    bench_gat_fused measured the narrow-N onehot matmuls MXU-bound at
    ~6-25% lane utilization, so pass count is the whole cost."""
    dt = x.dtype
    hi = x.astype(jnp.bfloat16).astype(dt)
    lo = x - hi
    if oh_left:
        return (jnp.matmul(oh, hi, preferred_element_type=dt)
                + jnp.matmul(oh, lo, preferred_element_type=dt))
    return (jnp.matmul(hi, oh, preferred_element_type=dt)
            + jnp.matmul(lo, oh, preferred_element_type=dt))

def _sum_kernel(tn: int):
    def kernel(ids_ref, v_ref, out_ref):
        lid = ids_ref[0, 0, :][None, :]                         # [1, S]
        v = v_ref[0]                                            # [S, D]
        oh = (jax.lax.broadcasted_iota(
            jnp.int32, (tn, lid.shape[-1]), 0) == lid).astype(v.dtype)
        out_ref[0] = _mm_split(oh, v)

    return kernel


def _sum_pallas(tn: int, interpret: bool, local_dst, vals_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, S, D = vals_t.shape
    return pl.pallas_call(
        _sum_kernel(tn),
        out_shape=jax.ShapeDtypeStruct((T, tn, D), vals_t.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, D), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * S * tn * D,
            bytes_accessed=(T * S * D + T * tn * D + T * S) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(local_dst.reshape(T, 1, S), vals_t)


def _broadcast_kernel(tn: int):
    def kernel(ids_ref, v_ref, out_ref):
        lid = ids_ref[0, 0, :][None, :]                         # [1, S]
        v = v_ref[0]                                            # [TN, D]
        oh = (jax.lax.broadcasted_iota(
            jnp.int32, (tn, lid.shape[-1]), 0) == lid).astype(v.dtype)
        out_ref[0] = _mm_split(oh.T, v)                          # [S, D]

    return kernel


def _broadcast_pallas(tn: int, interpret: bool, local_dst, node_vals):
    """Node→slot broadcast [T, TN, D] → [T, S, D]: ``onehotᵀ @ v`` per tile
    (the transpose of the segment-sum matmul — its VJP, and useful on its
    own for per-node values needed per edge)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, tn_in, D = node_vals.shape
    S = local_dst.shape[1]
    return pl.pallas_call(
        _broadcast_kernel(tn),
        out_shape=jax.ShapeDtypeStruct((T, S, D), node_vals.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, D), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * S * tn * D,
            bytes_accessed=(T * S * D + T * tn * D + T * S) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(local_dst.reshape(T, 1, S), node_vals)


def segment_broadcast_tiles_jnp(tiles: SegTiles, node_vals: jax.Array) -> jax.Array:
    """[T, TN, D] per-node values → [T, S, D] per-slot (padding → 0)."""

    def one(v, lid):
        oh = _onehot(lid[None, :], tiles.tile_nodes).astype(v.dtype)
        return jnp.matmul(oh.T, v, precision="highest")

    return jax.vmap(one)(node_vals, tiles.local_dst)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _broadcast_tiles_p(tn: int, interpret: bool, local_dst, node_vals):
    return _broadcast_pallas(tn, interpret, local_dst, node_vals)


def _broadcast_tiles_fwd(tn, interpret, local_dst, node_vals):
    return _broadcast_pallas(tn, interpret, local_dst, node_vals), local_dst


def _broadcast_tiles_bwd(tn, interpret, local_dst, g):
    # linear op: VJP = slot→node segment-sum (onehot @ g) — also Pallas
    return (None, _sum_pallas(tn, interpret, local_dst, g))


_broadcast_tiles_p.defvjp(_broadcast_tiles_fwd, _broadcast_tiles_bwd)


def segment_broadcast_tiles(tiles: SegTiles, node_vals: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Pallas node→slot broadcast: [T, TN, D] → [T, S, D] (padding slots →
    0).  Differentiable (custom VJP = the segment-sum kernel).  This is the
    gather-free form of ``vals[dst]`` for per-node values needed per edge —
    dst ids are tile-local by construction, so the 'gather' is an
    ``onehotᵀ @ v`` MXU matmul per tile."""
    if not (_use_pallas() or interpret):
        return segment_broadcast_tiles_jnp(tiles, node_vals)
    return _broadcast_tiles_p(tiles.tile_nodes, interpret, tiles.local_dst,
                              node_vals)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sum_tiles_p(tn: int, interpret: bool, local_dst, vals_t):
    return _sum_pallas(tn, interpret, local_dst, vals_t)


def _sum_tiles_fwd(tn, interpret, local_dst, vals_t):
    return _sum_pallas(tn, interpret, local_dst, vals_t), local_dst


def _sum_tiles_bwd(tn, interpret, local_dst, g):
    # linear op: VJP = node→slot broadcast (onehotᵀ @ g) — also Pallas
    return (None, _broadcast_pallas(tn, interpret, local_dst, g))


_sum_tiles_p.defvjp(_sum_tiles_fwd, _sum_tiles_bwd)


def segment_sum_tiles(tiles: SegTiles, vals_t: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Pallas segment sum over the tile layout: [T, S, D] → [T·TN, D] —
    one [TN, S] @ [S, D] MXU matmul per tile.  Differentiable (custom VJP
    = the broadcast kernel)."""
    if not (_use_pallas() or interpret):
        return segment_sum_tiles_jnp(tiles, vals_t)
    out = _sum_tiles_p(tiles.tile_nodes, interpret, tiles.local_dst, vals_t)
    return out.reshape(tiles.n_pad, vals_t.shape[-1])


# ---------------------------------------------------------------------------
# Windowed src-row gather: vals[src] as onehot-window matmuls
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SrcWindows:
    """Static plan turning the per-slot src-row gather ``vals[src_t]`` into
    per-tile onehot-window MXU matmuls (TPU has no vectorized gather).

    Per dst tile the plan stores a node-row WINDOW of 2·``win`` rows
    starting at block ``blk[t]``·win (node ids cluster around each dst
    tile on RCM/banded graphs: an edge (i → j) exists only where the seed
    has a nonzero, so src rows live within the matrix bandwidth of the
    tile's dst range).  ``lsrc[t, s]`` = src id − blk[t]·win, in
    [0, 2·win) for in-window slots and 2·win (→ gathered 0) otherwise.
    The few out-of-window edges (long-range couplings) are routed to a
    compact outlier list fixed up with one small XLA gather+scatter.
    """

    lsrc: jax.Array       # int32[T, S] window-local src ids (2·win = miss)
    blk: jax.Array        # int32[T] window block index (start = blk·win)
    out_slot: jax.Array   # int32[O] flat slot index of outlier edges (T·S = pad)
    out_src: jax.Array    # int32[O] src node id of outlier edges (0 = pad)
    win: int = 0          # window block height (rows); window = 2 blocks
    rows_pad: int = 0     # vals must be padded to this many rows

    @property
    def n_outliers(self) -> int:
        return int(self.out_slot.shape[0])


jax.tree_util.register_dataclass(
    SrcWindows,
    data_fields=["lsrc", "blk", "out_slot", "out_src"],
    meta_fields=["win", "rows_pad"],
)


def build_src_windows(tiles: SegTiles, src_ids, num_rows: int,
                      win: int | None = None,
                      outlier_cap: float = 0.02) -> SrcWindows:
    """Host-side plan build.  ``src_ids``: int[T·S] global src row per slot
    (padding slots may hold anything — they are forced out-of-window so the
    kernel writes 0, which downstream masking already ignores).

    ``win`` is auto-picked as the smallest power-of-two ≥128 whose windows
    (centered on each tile's median src) leave ≤ ``outlier_cap`` of real
    edges outside, capped at 8192 rows (VMEM: 2·win·D·4 B must fit)."""
    src = np.asarray(src_ids, np.int64).reshape(tiles.tiles, tiles.slots)
    real = np.asarray(tiles.local_dst) < tiles.tile_nodes        # [T, S]
    T, S = src.shape
    med = np.zeros((T,), np.int64)
    for t in range(T):
        r = src[t][real[t]]
        med[t] = np.int64(np.median(r)) if r.size else 0

    def plan(w):
        blk = np.clip(med - w, 0, None) // w
        lsrc = src - (blk * w)[:, None]
        inwin = (lsrc >= 0) & (lsrc < 2 * w) & real
        return blk, lsrc, inwin

    total_real = max(int(real.sum()), 1)
    if win is None:
        win = 128
        while win < 8192:
            _, _, inwin = plan(win)
            if (total_real - int(inwin.sum())) / total_real <= outlier_cap:
                break
            win *= 2
    blk, lsrc, inwin = plan(win)
    miss = real & ~inwin
    o_t, o_s = np.nonzero(miss)
    out_slot = o_t * S + o_s
    out_src = src[miss]
    o_pad = _round_up(max(len(out_slot), 1), _LANE)
    out_slot = np.pad(out_slot, (0, o_pad - len(out_slot)),
                      constant_values=T * S)
    out_src = np.pad(out_src, (0, o_pad - len(out_src)))
    lsrc = np.where(inwin, lsrc, 2 * win)
    # the (blk+1) window block must exist: pad rows to a multiple of win,
    # plus one extra block past the top
    rows_pad = (_round_up(max(num_rows, 1), win) // win + 1) * win
    return SrcWindows(
        lsrc=jnp.asarray(lsrc, jnp.int32),
        blk=jnp.asarray(blk, jnp.int32),
        out_slot=jnp.asarray(out_slot, jnp.int32),
        out_src=jnp.asarray(out_src, jnp.int32),
        win=int(win), rows_pad=int(rows_pad),
    )


def gather_rows_windows_jnp(plan: SrcWindows, tiles: SegTiles,
                            vals: jax.Array) -> jax.Array:
    """Oracle/CPU path: the same slot values the kernel produces
    ([T·S, D]; out-of-window slots come from the outlier fixup)."""
    T, S = plan.lsrc.shape
    base = plan.blk[:, None] * plan.win + plan.lsrc            # [T, S]
    ok = plan.lsrc < 2 * plan.win
    safe = jnp.where(ok, base, 0)
    got = jnp.where(ok.reshape(-1)[:, None], vals[safe.reshape(-1)], 0.0)
    fix = vals[plan.out_src]
    return got.at[plan.out_slot].set(fix, mode="drop")


def _gather_win_kernel(win: int, slots: int):
    def kernel(blk_ref, lsrc_ref, w1_ref, w2_ref, out_ref):
        del blk_ref                                # consumed by index maps
        lid = lsrc_ref[0, 0, :][:, None]           # [S, 1]
        # build the [S, W] onehots directly (no in-kernel transpose —
        # Mosaic lowers iota-compare + matmul natively)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (slots, win), 1)
        oh1 = (i1 == lid).astype(w1_ref.dtype)          # [S, W]
        oh2 = (i1 == (lid - win)).astype(w1_ref.dtype)
        out_ref[0] = _mm_split(oh1, w1_ref[...]) + _mm_split(oh2, w2_ref[...])

    return kernel


def _gather_win_pallas(plan: SrcWindows, vals, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, S = plan.lsrc.shape
    D = vals.shape[-1]
    W = plan.win
    vp = jnp.pad(vals, ((0, plan.rows_pad - vals.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t, blk: (t, 0, 0)),
            pl.BlockSpec((W, D), lambda t, blk: (blk[t], 0)),
            pl.BlockSpec((W, D), lambda t, blk: (blk[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda t, blk: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _gather_win_kernel(W, S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, S, D), vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * S * 2 * W * D,
            bytes_accessed=(T * S * D + 2 * T * W * D + T * S) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.blk, plan.lsrc.reshape(T, 1, S), vp, vp)
    return out.reshape(T * S, D)


def _scatter_win_kernel(win: int, slots: int):
    """Transpose of ``_gather_win_kernel``: per-tile window partials
    gᵀ @ oh — [D, S] ⋅ [S, W] MXU contractions (out-of-window slots have a
    zero onehot row, exactly as in the forward).  Output orientation is
    [D, W]: D is tiny (the hidden width, ~4), so putting it in LANES tiles
    4→128 and makes the partial tensor 32× its logical size (measured: the
    [T, 2, W, D] first cut wrote 6.6 GB of padded HBM — 50 ms); with W in
    lanes the physical size is the logical one."""
    def kernel(lsrc_ref, g_ref, o1_ref, o2_ref):
        lid = lsrc_ref[0, 0, :][:, None]                    # [S, 1]
        i1 = jax.lax.broadcasted_iota(jnp.int32, (slots, win), 1)
        oh1 = (i1 == lid).astype(g_ref.dtype)               # [S, W]
        oh2 = (i1 == (lid - win)).astype(g_ref.dtype)
        g = g_ref[0]                                        # [S, D]
        dn = (((0,), (0,)), ((), ()))                       # contract S·S
        hi = g.astype(jnp.bfloat16).astype(g.dtype)         # _mm_split form
        lo = g - hi
        dg = lambda x, oh: jax.lax.dot_general(
            x, oh, dn, preferred_element_type=g.dtype)
        o1_ref[0] = dg(hi, oh1) + dg(lo, oh1)               # [D, W]
        o2_ref[0] = dg(hi, oh2) + dg(lo, oh2)

    return kernel


def _scatter_win_pallas(plan: SrcWindows, g, n: int, interpret: bool):
    """Windowed scatter-add: Σ_{slots s: src[s]=r} g[s] → [n, D].

    The plain ``.at[src_t].add`` sorted-scatter scalarizes on TPU — it was
    57 + 8 ms of the 333 ms 1M-action train step (the layer-2 src-gather
    backward, docs/BENCH.md round 5).  Here each tile reduces its slots
    onto its two src windows with MXU contractions (the forward kernel's
    transpose); the [T, D, W] partials then land with TWO T-index block
    scatters over whole windows, and one small [rows, D] relayout at the
    end undoes the lane orientation."""
    from jax.experimental import pallas as pl

    T, S = plan.lsrc.shape
    D = g.shape[-1]
    W = plan.win
    p1, p2 = pl.pallas_call(
        _scatter_win_kernel(W, S),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, S, D), lambda t: (t, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, D, W), lambda t: (t, 0, 0)),
                   pl.BlockSpec((1, D, W), lambda t: (t, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((T, D, W), g.dtype),
                   jax.ShapeDtypeStruct((T, D, W), g.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * S * 2 * W * D,
            bytes_accessed=(T * S * D + 2 * T * W * D + T * S) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(plan.lsrc.reshape(T, 1, S), g.reshape(T, S, D))
    nwin = plan.rows_pad // W + 1
    acc = jnp.zeros((nwin, D, W), g.dtype)
    acc = acc.at[plan.blk].add(p1)
    acc = acc.at[plan.blk + 1].add(p2)
    return jnp.swapaxes(acc, 1, 2).reshape(nwin * W, D)[:n]


def _plan_of(meta, lsrc, blk, out_slot, out_src) -> SrcWindows:
    """Rebuild the SrcWindows view from hashable meta ints + its arrays.
    The arrays travel in DIFFERENTIABLE argument positions (None
    cotangents): under ``shard_map`` the graph is an operand, so plan
    arrays arrive as tracers — and custom_vjp rejects tracers in
    nondiff_argnums (same shape as the gat_fused ``_tiles_of`` fix)."""
    win, rows_pad = meta
    return SrcWindows(lsrc=lsrc, blk=blk, out_slot=out_slot,
                      out_src=out_src, win=win, rows_pad=rows_pad)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_rows_p(meta, interpret: bool, lsrc, blk, out_slot, out_src,
                   src_t, vals):
    plan = _plan_of(meta, lsrc, blk, out_slot, out_src)
    got = _gather_win_pallas(plan, vals, interpret)
    fix = vals[plan.out_src]
    return got.at[plan.out_slot].set(fix, mode="drop")


def _gather_rows_fwd(meta, interpret, lsrc, blk, out_slot, out_src,
                     src_t, vals):
    out = _gather_rows_p(meta, interpret, lsrc, blk, out_slot, out_src,
                         src_t, vals)
    return out, (lsrc, blk, out_slot, out_src, src_t, vals.shape[0])


def _gather_rows_bwd(meta, interpret, res, g):
    lsrc, blk, out_slot, out_src, src_t, n = res
    nones = (None, None, None, None, None)
    if not (_use_pallas() or interpret):
        # VJP of a row gather = scatter-add by src id (XLA sorted-scatter)
        dv = jnp.zeros((n, g.shape[-1]), g.dtype).at[src_t].add(
            g, mode="drop")
        return (*nones, dv)
    plan = _plan_of(meta, lsrc, blk, out_slot, out_src)
    # windowed MXU scatter (the forward kernel's transpose).  Outlier
    # slots' lsrc is the 2·win miss marker → zero onehot column in the
    # window path, so their cotangent routes ONLY through the fixup list
    # (mirroring the forward's .at[out_slot].set overwrite).
    dv = _scatter_win_pallas(plan, g, n, interpret)
    g_flat = g.reshape(-1, g.shape[-1])
    slot_ok = plan.out_slot < g_flat.shape[0]
    safe_slot = jnp.where(slot_ok, plan.out_slot, 0)
    fix_g = jnp.where(slot_ok[:, None], g_flat[safe_slot], 0.0)
    dv = dv.at[plan.out_src].add(fix_g, mode="drop")
    return (*nones, dv)


_gather_rows_p.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_rows_windows(plan: SrcWindows, tiles: SegTiles, src_t,
                        vals: jax.Array, interpret: bool = False) -> jax.Array:
    """``vals[src_t]`` ([T·S, D]) without a gather: per-tile onehot-window
    MXU matmuls + a compact outlier fixup (see ``SrcWindows``).  Padding
    slots produce 0 (downstream tile ops mask them).  Differentiable; the
    VJP is the same scatter-add the plain gather's AD performs.  Falls back
    to the XLA gather off-TPU."""
    if not (_use_pallas() or interpret):
        zero = jnp.zeros((1, vals.shape[-1]), vals.dtype)
        ext = jnp.concatenate([vals, zero], axis=0)
        safe = jnp.where(src_t < vals.shape[0], src_t, vals.shape[0])
        return ext[safe]
    return _gather_rows_p((plan.win, plan.rows_pad), interpret,
                          plan.lsrc, plan.blk, plan.out_slot, plan.out_src,
                          src_t, vals)
