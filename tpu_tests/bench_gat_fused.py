"""Decompose the fused-GAT step cost on chip (ROADMAP r4 perf #1).

Round-4 state: at 112k actions the fused GAT fwd+bwd is the train-step
bound (~26 of 52.5 ms); at 1M actions it is ~0.6 s of the 0.70 s epoch.
Naive roofline accounting (MXU passes + VPU elementwise) predicts 10-20x
LESS than the measured 69 ns/edge, so the bound is NOT obvious — this
bench times the pieces and the experiment knobs before any optimization
(the round-3 lesson: measure the decomposition first).

    timeout 1800 python tpu_tests/bench_gat_fused.py [--n 200000] [--hidden 8]

Pieces timed (chained-fori two-point differencing, utils.profiling.timed):
  pooled       full 2-layer policy forward (the trained path)
  L1-fused     layer-1 fused kernel alone (uniform x -> no gathers)
  L2-gather    layer-2 src-window gather kernel alone
  L2-fused     layer-2 fused kernel alone (pre-gathered xs input)
  L2-chain     gather + fused (what the layer actually runs)
Knobs on the dominant kernel:
  noshift      tile-level softmax shift instead of per-segment
  oh-split     onehot-sided matmuls as 2x1-pass hi/lo split (~f32-exact)
  oh-default   onehot-sided matmuls at 1-pass bf16 (accuracy probe only)
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from gflownet_spai_tpu.models import policies as pol
from gflownet_spai_tpu.models.gat import gatv2_apply_tiled
from gflownet_spai_tpu.ops import gat_fused, segment
from gflownet_spai_tpu.sparse.convert import coo_sort_dedup
from gflownet_spai_tpu.sparse.types import COO
from gflownet_spai_tpu.utils.profiling import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--tile-nodes", type=int, default=128)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = args.n
    nnz_off = 4 * n
    r = rng.integers(0, n, nnz_off)
    c = np.clip(r + rng.integers(-40, 41, nnz_off), 0, n - 1)
    keep = r != c
    rows = np.concatenate([r[keep], c[keep], np.arange(n)])
    cols = np.concatenate([c[keep], r[keep], np.arange(n)])
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    seed = coo_sort_dedup(COO(row=jnp.asarray(rows, jnp.int32),
                              col=jnp.asarray(cols, jnp.int32),
                              data=jnp.asarray(vals), shape=(n, n)))
    tg = pol.tiled_graph_from_seed(seed, tile_nodes=args.tile_nodes)
    tiles, srcwin = tg.tiles, tg.srcwin
    T, S, TN = tiles.tiles, tiles.slots, tiles.tile_nodes
    E = T * S
    bslots = sum(b.tiles.tiles * b.tiles.slots for b in tg.gat_buckets)
    print(f"n={n} seed nnz={seed.nnz} T={T} S={S} TN={TN} "
          f"slots={E} util={tg.tiles.num_edges / E:.2f} "
          f"win={srcwin.win} outliers={srcwin.n_outliers}")
    print(f"buckets: {[(b.tiles.tiles, b.tiles.slots) for b in tg.gat_buckets]}"
          f" slots={bslots} ({bslots / E:.2f} of uniform)")

    H, D = args.heads, args.hidden
    params = pol.forward_policy_init(jax.random.PRNGKey(0), D, seed.nnz + 1,
                                     heads=H)
    res = {"n": n, "hidden": D, "slots": E}

    def t(name, fn, carry, scalarize, lo=5, hi=25):
        dt = timed(fn, carry, scalarize=scalarize, iters_lo=lo, iters_hi=hi)
        print(f"{name:12s} {dt*1e3:8.3f} ms   {E/dt/1e9:7.2f} Gslot/s")
        res[name] = dt * 1e3
        return dt

    # ---- full pooled forward (uniform-S baseline vs bucketed ladder) ----
    tg0 = tg._replace(gat_buckets=None)

    def pooled_step(carry):
        x, p = carry
        v = pol.forward_policy_pooled(p, tg0._replace(x=x), D, H)
        return (x + v[0] * 0.0, p)

    def pooled_bkt_step(carry):
        x, p = carry
        v = pol.forward_policy_pooled(p, tg._replace(x=x), D, H)
        return (x + v[0] * 0.0, p)

    x0 = jnp.ones((1, 1), jnp.float32)
    t("pooled", pooled_step, (x0, params), lambda c: jnp.sum(c[0]))
    t("pooled-bkt", pooled_bkt_step, (x0, params), lambda c: jnp.sum(c[0]))
    v0 = pol.forward_policy_pooled(params, tg0, D, H)
    v1 = pol.forward_policy_pooled(params, tg, D, H)
    rel = float(jnp.max(jnp.abs(v1 - v0))
                / jnp.maximum(jnp.max(jnp.abs(v0)), 1e-30))
    print(f"             pooled bucketed-vs-uniform max rel err: {rel:.2e}")
    res["pooled_bkt_err"] = rel

    # ---- layer-1 fused alone (uniform) ----------------------------------
    p1 = params.gat1
    attr_flat = tg.attr_t.reshape(-1)

    def l1_step(carry):
        xs, = carry
        out = gat_fused.gat_tile_fused(
            tiles, attr_flat, xs, xs * 0.5, p1.w_edge[0],
            p1.att.reshape(H, D))
        return (xs + out[0, :1] * 0.0,)

    xs_u = jnp.ones((1, H * D), jnp.float32)
    t("L1-fused", l1_step, (xs_u,), lambda c: jnp.sum(c[0]))

    # ---- layer-2 pieces (non-uniform, heads=1) --------------------------
    n_pad = tiles.n_pad
    xnodes = jax.random.normal(jax.random.PRNGKey(1), (n_pad, D))
    p2att = params.gat2.att.reshape(1, D)
    w_e2 = params.gat2.w_edge[0][:D]

    def gather_step(carry):
        x, = carry
        got = segment.gather_rows_windows(srcwin, tiles, tg.src_t, x)
        return (x + got[:1, :] * 0.0,)

    t("L2-gather", gather_step, (xnodes,), lambda c: jnp.sum(c[0]))

    xs_slot = segment.gather_rows_windows(srcwin, tiles, tg.src_t, xnodes)
    xs_slot = jax.block_until_ready(xs_slot)

    def l2_fused(carry, **kw):
        xs, xd = carry
        out = gat_fused._run_fwd(tiles, 0.2, False, attr_flat, xs, xd,
                                 w_e2, p2att, **kw)
        return (xs + out[0, :1] * 0.0, xd)

    t("L2-fused", l2_fused, (xs_slot, xnodes), lambda c: jnp.sum(c[0]))

    def l2_chain(carry):
        x, = carry
        got = segment.gather_rows_windows(srcwin, tiles, tg.src_t, x)
        out = gat_fused._run_fwd(tiles, 0.2, False, attr_flat, got, x,
                                 w_e2, p2att)
        return (x + out[:1, :] * 0.0,)

    t("L2-chain", l2_chain, (xnodes,), lambda c: jnp.sum(c[0]))

    # ---- knobs on the layer-2 fused kernel ------------------------------
    base = gat_fused._run_fwd(tiles, 0.2, False, attr_flat, xs_slot, xnodes,
                              w_e2, p2att)
    for name, kw in (("noshift", dict(segshift=False)),
                     ("oh-split", dict(oh_prec="split")),
                     ("oh-default", dict(oh_prec="default"))):
        got = gat_fused._run_fwd(tiles, 0.2, False, attr_flat, xs_slot,
                                 xnodes, w_e2, p2att, **kw)
        err = float(jnp.max(jnp.abs(got - base))
                    / jnp.maximum(jnp.max(jnp.abs(base)), 1e-30))
        t(name, lambda c, kw=kw: l2_fused(c, **kw), (xs_slot, xnodes),
          lambda c: jnp.sum(c[0]))
        print(f"             max rel err vs base: {err:.2e}")
        res[name + "_err"] = err

    # ---- layer-1 knobs (the uniform kernel is most of `pooled`) ---------
    def l1_var(carry, **kw):
        xs, = carry
        out = gat_fused._run_fwd(tiles, 0.2, False, attr_flat, xs, xs * 0.5,
                                 p1.w_edge[0], p1.att.reshape(H, D), **kw)
        return (xs + out[0, :1] * 0.0,)

    for name, kw in (("L1-noshift", dict(segshift=False)),
                     ("L1-oh-split", dict(oh_prec="split"))):
        t(name, lambda c, kw=kw: l1_var(c, **kw), (xs_u,),
          lambda c: jnp.sum(c[0]))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
