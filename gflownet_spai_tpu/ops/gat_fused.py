"""Fully-fused GATv2 tile kernel: score → softmax → weighted segment-sum
in ONE Pallas launch per node tile.

The tiled GAT substrate (ops.segment + models.gat.gatv2_apply_tiled) runs
the per-edge elementwise chain between its Pallas calls in XLA over
[T·S, H·D] slot tensors — ~3 extra HBM round trips of the largest arrays
in the layer (VERDICT r2 weak #6; docs/ROADMAP round-2 item 1).  This
module folds the whole per-tile dataflow into one kernel, so the slot
tensors live only in VMEM:

    e        = attr ⊗ w_e                      (edge_dim = 1 outer product)
    xd_slot  = onehotᵀ @ xd_tile               (dst broadcast — matmul)
    msg      = xs_slot + xd_slot + e
    act      = leaky_relu(msg)
    scores   = act @ blockdiag(att)            ([S, HD] @ [HD, H] matmul)
    α        = segment-softmax(scores)          (onehot matmuls, see below)
    out      = onehot @ (xs_slot ⊙ (α @ E))    (weighted segment-sum)

Only ``out`` ([TN, HD] per tile) and the kernel inputs touch HBM.  The
multi-head segment softmax uses a true per-SEGMENT stability shift
(masked sublane max per head + one ``onehotᵀ`` broadcast matmul — see
``_segshift``; ADVICE r3 flagged the earlier tile-level shift, which
underflowed segments far below the tile max); the per-segment
normalizers are then ``onehot @ exp(scores)`` followed by the
``onehotᵀ`` broadcast — two MXU matmuls covering every head at once.  Padding slots have an all-zero
onehot column, so their normalizer is exactly 0 and they are masked by
``where(den > 0, ex/den, 0)`` without needing the slot ids in sublane
layout.

The backward pass is a second fused kernel that *recomputes* the forward
in VMEM (the residuals it would otherwise save are exactly the slot
tensors fusion exists to keep out of HBM) and emits
``(∂xs_slot, ∂xd, ∂att, ∂w_e)`` — per-tile weight grads are summed
outside.  ``attr`` (the seed's edge values) is static graph data and
gets no gradient, matching the unfused path where it enters via a
constant.

Substrate parity: reference policy.py:21,29 (torch_geometric GATv2Conv /
torch_scatter CUDA segment kernels — SURVEY.md §2 row L0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .segment import SegTiles


def _blockdiag_att(att: jax.Array) -> jax.Array:
    """[H, D] attention vectors → [H·D, H] block-diagonal score matrix so
    ``scores = act @ A`` computes the per-head einsum in one matmul."""
    H, D = att.shape
    eye = jnp.eye(H, dtype=att.dtype)                       # [H, H]
    return (att[:, :, None] * eye[:, None, :]).reshape(H * D, H)


def _expand_mat(heads: int, out_dim: int, dtype) -> jax.Array:
    """[H, H·D] 0/1 matrix broadcasting per-head α to per-(head, channel)."""
    eye = jnp.eye(heads, dtype=dtype)
    return jnp.repeat(eye, out_dim, axis=1)                 # [H, H*D]


# ---------------------------------------------------------------------------
# jnp reference (CPU path + VJP oracle)
# ---------------------------------------------------------------------------

def gat_tile_fused_jnp(tiles: SegTiles, attr: jax.Array, xs_slot: jax.Array,
                       xd: jax.Array, w_e: jax.Array, att: jax.Array,
                       negative_slope: float = 0.2) -> jax.Array:
    """Reference semantics of the fused kernel ([T·S]-flat slot inputs →
    [n_pad, H·D] node outputs).  ``xs_slot``: [T·S, HD] (or [1, HD] for
    uniform source features); ``xd``: [n_pad, HD] node features (or
    [1, HD] uniform); ``attr``: [T·S] edge scalars; ``w_e``: [HD];
    ``att``: [H, D]."""
    T, S, TN = tiles.tiles, tiles.slots, tiles.tile_nodes
    H, D = att.shape
    HD = H * D
    oh = (jax.lax.broadcasted_iota(
        jnp.int32, (T, TN, S), 1) == tiles.local_dst[:, None, :])
    ohf = oh.astype(attr.dtype)                             # [T, TN, S]
    e = attr[:, None] * w_e[None, :]                        # [T·S, HD]
    if xd.shape[0] == 1:
        xd_slot = jnp.broadcast_to(xd, (T * S, HD))
    else:
        xd_t = xd.reshape(T, TN, HD)
        xd_slot = jnp.einsum("tvs,tvc->tsc", ohf, xd_t,
                             precision="highest").reshape(T * S, HD)
    msg = xs_slot + xd_slot + e                             # broadcasts [1,HD]
    act = jax.nn.leaky_relu(msg, negative_slope)
    scores = jnp.matmul(act, _blockdiag_att(att),
                        precision="highest")                # [T·S, H]
    sc_t = scores.reshape(T, S, H)
    # per-SEGMENT stability shift (ADVICE r3: a tile-level shift underflows
    # any segment sitting ~88+ below the tile max and silently zeroes it);
    # padding slots (all-zero onehot column) shift by their own score → 1
    masked = jnp.where(oh[..., None], sc_t[:, None, :, :],
                       jnp.asarray(-1e30, sc_t.dtype))      # [T, TN, S, H]
    segmax = jnp.max(masked, axis=2)                        # [T, TN, H]
    colsum = jnp.sum(ohf, axis=1)                           # [T, S]
    shift = (jnp.einsum("tvs,tvh->tsh", ohf, segmax, precision="highest")
             + (1.0 - colsum)[..., None] * sc_t)
    ex = jnp.exp(sc_t - shift)
    den = jnp.einsum("tvs,tsh->tvh", ohf, ex, precision="highest")
    den_s = jnp.einsum("tvs,tvh->tsh", ohf, den, precision="highest")
    alpha = jnp.where(den_s > 0, ex / jnp.where(den_s > 0, den_s, 1.0), 0.0)
    al_hd = jnp.matmul(alpha.reshape(T * S, H), _expand_mat(H, D, attr.dtype),
                       precision="highest")
    wgt = (xs_slot * al_hd).reshape(T, S, HD)
    out = jnp.einsum("tvs,tsc->tvc", ohf, wgt, precision="highest")
    return out.reshape(T * TN, HD)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _segshift(ohT_b, ohT_f, scores, tn: int, prec: str = "split"):
    """Per-SEGMENT softmax stability shift in [S, H] layout (ADVICE r3: a
    tile-level shift silently zeroes segments ~88+ below the tile max).
    Per head: a masked sublane max over the [S, TN] slot→node onehot gives
    the segment max [TN, 1] (the [TN]→[TN,1] lane→sublane relayout is the
    proven _gather_win_kernel pattern); the maxes of ALL heads plus a
    ones column are then broadcast back to slots with ONE [S, TN]@[TN, H+1]
    matmul — bench_gat_fused measured the earlier per-head width-1
    broadcasts at 22.7 of layer-1's 50.4 ms (a width-1 matmul uses 1/128
    of the MXU lanes and each head paid it separately).  Padding slots
    (all-zero onehot row) shift by their OWN score so exp() = 1 there —
    their zero onehot column keeps them out of every normalizer."""
    H = scores.shape[1]
    dt = scores.dtype
    neg = jnp.asarray(-1e30, dt)
    cols = []
    for h in range(H):
        masked = jnp.where(ohT_b, scores[:, h:h + 1], neg)  # [S, TN]
        cols.append(jnp.max(masked, axis=0)[:, None])       # [TN, 1]
    cols.append(jnp.ones((tn, 1), dt))
    seg_all = jnp.concatenate(cols, axis=1)                 # [TN, H+1]
    bcast = _mm_oh(ohT_f, seg_all, prec)                    # [S, H+1]
    shift, colsum = bcast[:, :H], bcast[:, H:]
    return shift + (1.0 - colsum) * scores


def _mm_oh(oh, x, prec: str, oh_left: bool = True):
    """Matmul where ``oh`` is a 0/1 (exactly bf16-representable) operand.

    ``prec="split"``: two DEFAULT (single-bf16-pass) matmuls on the hi/lo
    split of the real operand — x = hi + lo exactly in f32, so the only
    rounding is lo's own bf16 cast (≤ 2⁻¹⁸ relative of x): ~f32-accurate
    at 2 MXU passes instead of HIGHEST's 6.  Mosaic has no HIGH lowering,
    hence the manual split."""
    dt = x.dtype
    if prec == "split":
        hi = x.astype(jnp.bfloat16).astype(dt)
        lo = x - hi
        if oh_left:
            return (jnp.matmul(oh, hi, preferred_element_type=dt)
                    + jnp.matmul(oh, lo, preferred_element_type=dt))
        return (jnp.matmul(hi, oh, preferred_element_type=dt)
                + jnp.matmul(lo, oh, preferred_element_type=dt))
    a, b = (oh, x) if oh_left else (x, oh)
    return jnp.matmul(a, b, precision=prec, preferred_element_type=dt)


def _fwd_kernel(tn: int, uniform: bool, negative_slope: float,
                segshift: bool = True, oh_prec: str = "split"):
    """``segshift``/``oh_prec`` are perf-experiment knobs (bench_gat_fused):
    segshift=False falls back to the tile-level softmax shift (pre-ADVICE-r3
    behavior — only safe when per-tile score spread ≲ 80); ``oh_prec`` sets
    the precision of the ONEHOT-sided matmuls only (one operand exactly
    bf16-representable ⇒ the 2-pass "split" already reproduces ~f32 — the
    mixed-operand score/act matmuls stay at highest)."""
    def kernel(lid_ref, attr_ref, xs_ref, xd_ref, we_ref, A_ref, E_ref,
               out_ref):
        lid = lid_ref[0, 0, :][None, :]                     # [1, S]
        S = lid.shape[-1]
        ohf = (jax.lax.broadcasted_iota(jnp.int32, (tn, S), 0)
               == lid).astype(we_ref.dtype)                 # [TN, S]
        ohT_b = (jax.lax.broadcasted_iota(jnp.int32, (S, tn), 1)
                 == lid_ref[0, 0, :][:, None])              # [S, TN]
        ohT_f = ohT_b.astype(we_ref.dtype)
        a_col = attr_ref[0, 0, :][:, None]                  # [S, 1]
        e = a_col * we_ref[...]                             # [S, HD]
        if uniform:
            msg = e + xs_ref[...] + xd_ref[...]             # rows broadcast
        else:
            xd_slot = _mm_oh(ohf.T, xd_ref[0], oh_prec)
            msg = e + xs_ref[0] + xd_slot
        act = jnp.where(msg > 0, msg, negative_slope * msg)
        scores = jnp.matmul(act, A_ref[...], precision="highest",
                            preferred_element_type=e.dtype)  # [S, H]
        if segshift:
            shift = _segshift(ohT_b, ohT_f, scores, tn)
        else:
            shift = jnp.max(scores)
        ex = jnp.exp(scores - shift)
        den = _mm_oh(ohf, ex, oh_prec)                       # [TN, H]
        den_s = _mm_oh(ohf.T, den, oh_prec)                  # [S, H]
        alpha = jnp.where(den_s > 0, ex / jnp.where(den_s > 0, den_s, 1.0),
                          0.0)
        al_hd = _mm_oh(E_ref[...], alpha, oh_prec,
                       oh_left=False)                        # [S, HD]
        wgt = (xs_ref[...] if uniform else xs_ref[0]) * al_hd
        out_ref[0] = _mm_oh(ohf, wgt, oh_prec)

    return kernel


def _bwd_kernel(tn: int, uniform: bool, negative_slope: float):
    def kernel(lid_ref, attr_ref, xs_ref, xd_ref, we_ref, A_ref, E_ref,
               g_ref, dxs_ref, dxd_ref, dA_ref, dwe_ref):
        lid = lid_ref[0, 0, :][None, :]
        S = lid.shape[-1]
        dt = we_ref.dtype
        ohf = (jax.lax.broadcasted_iota(jnp.int32, (tn, S), 0)
               == lid).astype(dt)
        ohT_b = (jax.lax.broadcasted_iota(jnp.int32, (S, tn), 1)
                 == lid_ref[0, 0, :][:, None])              # [S, TN]
        ohT_f = ohT_b.astype(dt)
        a_col = attr_ref[0, 0, :][:, None]
        xs = xs_ref[...] if uniform else xs_ref[0]
        e = a_col * we_ref[...]
        if uniform:
            msg = e + xs + xd_ref[...]
        else:
            xd_slot = _mm_oh(ohf.T, xd_ref[0], "split")
            msg = e + xs + xd_slot
        act = jnp.where(msg > 0, msg, negative_slope * msg)
        scores = jnp.matmul(act, A_ref[...], precision="highest",
                            preferred_element_type=dt)
        ex = jnp.exp(scores - _segshift(ohT_b, ohT_f, scores, tn))
        den = _mm_oh(ohf, ex, "split")
        den_s = _mm_oh(ohf.T, den, "split")
        alpha = jnp.where(den_s > 0, ex / jnp.where(den_s > 0, den_s, 1.0),
                          0.0)
        al_hd = _mm_oh(E_ref[...], alpha, "split", oh_left=False)

        g = g_ref[0]                                         # [TN, HD]
        wgt_bar = _mm_oh(ohf.T, g, "split")                  # [S, HD]
        xs_bar1 = wgt_bar * al_hd
        al_hd_bar = wgt_bar * (jnp.broadcast_to(xs, al_hd.shape)
                               if uniform else xs)
        al_bar = _mm_oh(E_ref[...].T, al_hd_bar, "split",
                        oh_left=False)                       # [S, H]
        t1 = alpha * al_bar
        seg = _mm_oh(ohf, t1, "split")                       # [TN, H]
        segb = _mm_oh(ohf.T, seg, "split")                   # [S, H]
        s_bar = alpha * (al_bar - segb)                      # [S, H]
        act_bar = jnp.matmul(s_bar, A_ref[...].T, precision="highest",
                             preferred_element_type=dt)      # [S, HD]
        m_bar = jnp.where(msg > 0, act_bar, negative_slope * act_bar)
        dA_ref[0] = jnp.matmul(act.T, s_bar, precision="highest",
                               preferred_element_type=dt)    # [HD, H]
        dwe_ref[0] = jnp.matmul(a_col.T, m_bar, precision="highest",
                                preferred_element_type=dt)   # [1, HD]
        if uniform:
            ones = jnp.ones((1, S), dt)
            dxs_ref[0] = _mm_oh(ones, xs_bar1 + m_bar, "split")
            dxd_ref[0] = _mm_oh(ones, m_bar, "split")
        else:
            dxs_ref[0] = xs_bar1 + m_bar                     # [S, HD]
            dxd_ref[0] = _mm_oh(ohf, m_bar, "split")

    return kernel


def _run_fwd(tiles: SegTiles, negative_slope, interpret,
             attr, xs, xd, w_e, att,
             segshift: bool = True, oh_prec: str = "split"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, S, TN = tiles.tiles, tiles.slots, tiles.tile_nodes
    H, D = att.shape
    HD = H * D
    uniform = xs.shape[0] == 1
    A_blk = _blockdiag_att(att)
    E_exp = _expand_mat(H, D, att.dtype)
    xs_in = xs if uniform else xs.reshape(T, S, HD)
    xd_in = xd if xd.shape[0] == 1 else xd.reshape(T, TN, HD)
    xs_spec = (pl.BlockSpec((1, HD), lambda t: (0, 0)) if uniform
               else pl.BlockSpec((1, S, HD), lambda t: (t, 0, 0)))
    xd_spec = (pl.BlockSpec((1, HD), lambda t: (0, 0)) if xd.shape[0] == 1
               else pl.BlockSpec((1, TN, HD), lambda t: (t, 0, 0)))
    out = pl.pallas_call(
        _fwd_kernel(TN, uniform, negative_slope, segshift, oh_prec),
        out_shape=jax.ShapeDtypeStruct((T, TN, HD), att.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            xs_spec,
            xd_spec,
            pl.BlockSpec((1, HD), lambda t: (0, 0)),
            pl.BlockSpec((HD, H), lambda t: (0, 0)),
            pl.BlockSpec((H, HD), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TN, HD), lambda t: (t, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * S * TN * (2 * HD + 2 * H) + 8 * T * S * HD,
            bytes_accessed=(T * S * (2 + (0 if uniform else HD))
                            + 2 * T * TN * HD) * 4,
            transcendentals=T * S * H,
        ),
        interpret=interpret,
    )(tiles.local_dst.reshape(T, 1, S), attr.reshape(T, 1, S),
      xs_in, xd_in, w_e[None, :], A_blk, E_exp)
    return out.reshape(T * TN, HD)


def _run_bwd(tiles: SegTiles, negative_slope, interpret,
             attr, xs, xd, w_e, att, g):
    from jax.experimental import pallas as pl

    T, S, TN = tiles.tiles, tiles.slots, tiles.tile_nodes
    H, D = att.shape
    HD = H * D
    uniform = xs.shape[0] == 1
    A_blk = _blockdiag_att(att)
    E_exp = _expand_mat(H, D, att.dtype)
    xs_in = xs if uniform else xs.reshape(T, S, HD)
    xd_in = xd if xd.shape[0] == 1 else xd.reshape(T, TN, HD)
    xs_spec = (pl.BlockSpec((1, HD), lambda t: (0, 0)) if uniform
               else pl.BlockSpec((1, S, HD), lambda t: (t, 0, 0)))
    xd_spec = (pl.BlockSpec((1, HD), lambda t: (0, 0)) if xd.shape[0] == 1
               else pl.BlockSpec((1, TN, HD), lambda t: (t, 0, 0)))
    dxs_shape = ((T, 1, HD) if uniform else (T, S, HD))
    dxs_spec = (pl.BlockSpec((1, 1, HD), lambda t: (t, 0, 0)) if uniform
                else pl.BlockSpec((1, S, HD), lambda t: (t, 0, 0)))
    dxd_shape = ((T, 1, HD) if xd.shape[0] == 1 else (T, TN, HD))
    dxd_spec = (pl.BlockSpec((1, 1, HD), lambda t: (t, 0, 0))
                if xd.shape[0] == 1
                else pl.BlockSpec((1, TN, HD), lambda t: (t, 0, 0)))
    dxs, dxd, dA, dwe = pl.pallas_call(
        _bwd_kernel(TN, uniform, negative_slope),
        out_shape=(
            jax.ShapeDtypeStruct(dxs_shape, att.dtype),
            jax.ShapeDtypeStruct(dxd_shape, att.dtype),
            jax.ShapeDtypeStruct((T, HD, H), att.dtype),
            jax.ShapeDtypeStruct((T, 1, HD), att.dtype),
        ),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0)),
            xs_spec,
            xd_spec,
            pl.BlockSpec((1, HD), lambda t: (0, 0)),
            pl.BlockSpec((HD, H), lambda t: (0, 0)),
            pl.BlockSpec((H, HD), lambda t: (0, 0)),
            pl.BlockSpec((1, TN, HD), lambda t: (t, 0, 0)),
        ],
        out_specs=(
            dxs_spec,
            dxd_spec,
            pl.BlockSpec((1, HD, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, HD), lambda t: (t, 0, 0)),
        ),
        interpret=interpret,
    )(tiles.local_dst.reshape(T, 1, S), attr.reshape(T, 1, S),
      xs_in, xd_in, w_e[None, :], A_blk, E_exp,
      g.reshape(T, TN, HD))
    # per-tile weight grads → totals; blockdiag/expand transposes undone
    dA_blk = jnp.sum(dA, axis=0)                             # [HD, H]
    datt = jnp.stack([dA_blk[h * D:(h + 1) * D, h] for h in range(H)])
    dwe_tot = jnp.sum(dwe, axis=0)[0]                        # [HD]
    if uniform:
        dxs_out = jnp.sum(dxs, axis=0)                       # [1, HD]
    else:
        dxs_out = dxs.reshape(T * S, HD)
    if xd.shape[0] == 1:
        dxd_out = jnp.sum(dxd, axis=0)                       # [1, HD]
    else:
        dxd_out = dxd.reshape(T * TN, HD)
    return dxs_out, dxd_out, dwe_tot, datt


def _tiles_of(meta, local_dst) -> SegTiles:
    """Rebuild the SegTiles view the kernels consume from hashable meta
    ints + the ``local_dst`` array.  ``local_dst`` must travel in a
    DIFFERENTIABLE argument position (None cotangent) rather than inside
    the nondiff tiles object: under ``shard_map`` the graph is an operand,
    so its arrays arrive as tracers — and custom_vjp rejects tracers in
    nondiff_argnums (the round-5 c5auto 1M sharded-sampler crash).
    ``perm`` is unused by the kernels; ``local_dst`` stands in."""
    T, S, TN, num_nodes, num_edges = meta
    return SegTiles(perm=local_dst, local_dst=local_dst,
                    num_nodes=num_nodes, num_edges=num_edges,
                    tiles=T, tile_nodes=TN, slots=S)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gat_fused_p(meta, negative_slope, interpret, local_dst,
                 attr, xs, xd, w_e, att):
    return _run_fwd(_tiles_of(meta, local_dst), negative_slope, interpret,
                    attr, xs, xd, w_e, att)


def _gat_fused_fwd(meta, negative_slope, interpret, local_dst,
                   attr, xs, xd, w_e, att):
    out = _run_fwd(_tiles_of(meta, local_dst), negative_slope, interpret,
                   attr, xs, xd, w_e, att)
    return out, (local_dst, attr, xs, xd, w_e, att)


def _gat_fused_bwd(meta, negative_slope, interpret, res, g):
    local_dst, attr, xs, xd, w_e, att = res
    dxs, dxd, dwe, datt = _run_bwd(_tiles_of(meta, local_dst),
                                   negative_slope, interpret,
                                   attr, xs, xd, w_e, att, g)
    return (None, None, dxs, dxd, dwe, datt)


_gat_fused_p.defvjp(_gat_fused_fwd, _gat_fused_bwd)


#: Scoped-VMEM budget guard for the fused kernel, as a TN·S product: the
#: kernel materializes ~5 [TN, S]-class f32 buffers (onehot, its
#: transpose, masked-shift temporaries) plus the [S, HD] slot chain inside
#: one launch, so TN·S ≳ 5·10⁵ (S ≈ 5k at TN=128) overflows the 16 MiB
#: core VMEM (measured, docs/ROADMAP.md #1).  Above this, route to the
#: jnp reference — XLA tiles the same math through HBM: slower per edge,
#: but only the few outlier tiles of a degree-clustered graph land there
#: (the bucket ladder isolates them in their own high-S classes).
FUSED_MAX_TN_S = 128 * 4096


def fits_fused_vmem(tiles: SegTiles) -> bool:
    """True when a tile layout's per-launch working set fits the fused
    kernel's scoped-VMEM model (see ``FUSED_MAX_TN_S``)."""
    return tiles.tile_nodes * tiles.slots <= FUSED_MAX_TN_S


def gat_tile_fused(tiles: SegTiles, attr: jax.Array, xs_slot: jax.Array,
                   xd: jax.Array, w_e: jax.Array, att: jax.Array,
                   negative_slope: float = 0.2,
                   interpret: bool = False) -> jax.Array:
    """One-launch-per-tile fused GATv2 step (see module docstring).

    ``attr``:    [T·S] edge scalars in slot order (edge_dim = 1).
    ``xs_slot``: [T·S, H·D] source-transformed slot features, or [1, H·D]
                 for uniform node features (both layer-1 gathers vanish).
    ``xd``:      [n_pad, H·D] target-transformed node features (or [1, H·D]
                 uniform) — the dst broadcast happens in-kernel.
    ``w_e``:     [H·D] edge transform row; ``att``: [H, D].

    Returns [n_pad, H·D] aggregated node features (no bias).
    Differentiable in (xs_slot, xd, w_e, att); ``attr`` is static graph
    data.  Falls back to the jnp reference off-TPU and for layouts whose
    slot width exceeds the kernel's VMEM budget (``fits_fused_vmem`` —
    a degree-clustered graph previously hard-OOMed, VERDICT r4 weak #8)."""
    if not (jax.default_backend() == "tpu" or interpret):
        return gat_tile_fused_jnp(tiles, attr, xs_slot, xd, w_e, att,
                                  negative_slope)
    if not fits_fused_vmem(tiles):
        # trace-time note (once per compile): this layout pays the HBM
        # path — with a bucket ladder only the outlier classes land here
        print(f"gat_tile_fused: TN*S = {tiles.tile_nodes}*{tiles.slots} "
              f"exceeds the fused kernel's VMEM budget "
              f"({FUSED_MAX_TN_S}); using the XLA/HBM path for "
              f"{tiles.tiles} tile(s)", flush=True)
        return gat_tile_fused_jnp(tiles, attr, xs_slot, xd, w_e, att,
                                  negative_slope)
    meta = (tiles.tiles, tiles.slots, tiles.tile_nodes,
            tiles.num_nodes, tiles.num_edges)
    return _gat_fused_p(meta, float(negative_slope), interpret,
                        tiles.local_dst, attr, xs_slot, xd, w_e, att)
