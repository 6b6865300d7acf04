"""On-chip reward-path benchmark: pair-plan gathers vs rowblock MXU plan.

Run on the TPU (no JAX_PLATFORMS override):
    timeout 600 python tpu_tests/bench_reward.py [--n 200000] [--batch 16]

Measures the batched SPAI reward residual ‖M·A−I‖_F for an unstructured
seed at ≥1M pairs (VERDICT r1 #1 acceptance: the rowblock path must land
within ~10× of the banded DIA reward instead of the pair plan's 170×).
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from gflownet_spai_tpu.env import ilu, spai
from gflownet_spai_tpu.sparse import gallery
from gflownet_spai_tpu.sparse.types import COO
from gflownet_spai_tpu.utils.profiling import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--skip-pair", action="store_true",
                    help="skip the (very slow) pair-plan baseline")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 G-block storage (f32 accumulation)")
    ap.add_argument("--layout", default="cm", choices=["cm", "mc"],
                    help="G-block layout: mc = batch on sublanes / C cols "
                         "on lanes (sparse.rowblock)")
    ap.add_argument("--class-step", type=float, default=1.5,
                    help="size-class ladder spacing (1.25 = finer buckets)")
    ap.add_argument("--gram", action="store_true",
                    help="gram-compressed plan (quadratic-form residual: "
                         "~4-5x fewer FLOPs/bytes, ~1e-3-class precision)")
    ap.add_argument("--window", action="store_true",
                    help="window-order plan: gather-free batched reward "
                         "(the plan defines the edge enumeration)")
    args = ap.parse_args()

    # unstructured: random SPD-ish pattern, ~9 nnz/row, couplings within a
    # bounded reach (config-4-class PDE structure: the ILU LU-product fill
    # stays bounded; unbounded random reach makes single LU rows O(10⁴)
    # wide, which exercises the overflow path instead of the MXU path)
    rng = np.random.default_rng(0)
    n = args.n
    nnz_off = 4 * n
    r = rng.integers(0, n, nnz_off)
    c = np.clip(r + rng.integers(-40, 41, nnz_off), 0, n - 1)
    keep = r != c
    rows = np.concatenate([r[keep], c[keep], np.arange(n)])
    cols = np.concatenate([c[keep], r[keep], np.arange(n)])
    vals = np.concatenate([
        rng.standard_normal(keep.sum()) * 0.05,
        rng.standard_normal(keep.sum()) * 0.05,
        np.full(n, 4.0),
    ]).astype(np.float32)
    from gflownet_spai_tpu.sparse.convert import coo_sort_dedup
    a = coo_sort_dedup(COO(row=jnp.asarray(rows, jnp.int32),
                           col=jnp.asarray(cols, jnp.int32),
                           data=jnp.asarray(vals), shape=(n, n)))
    seed = ilu.seed_pattern(a, method="ilu0", dtype=jnp.float32)
    print(f"n={n} nnz(A)={a.nnz} nnz(seed)={seed.nnz}")

    B = args.batch
    keep_mask = jnp.asarray(rng.random((B, seed.nnz)) > 0.2)

    t0 = time.time()
    env_rb = spai.make_env(seed, original=a, reward_path="rowblock",
                           rowblock_dtype=jnp.bfloat16 if args.bf16 else None,
                           rowblock_layout=args.layout,
                           rowblock_class_step=args.class_step,
                           rowblock_compress="gram" if args.gram else "none",
                           rowblock_order="window" if args.window
                           else "sorted")
    print(f"rowblock build: {time.time()-t0:.1f}s  pairs={env_rb.rb.npairs} "
          f"padded={env_rb.rb.padded_slots} "
          f"buckets={[tuple(g.shape) for g in env_rb.rb.gvals]}")

    # carry-threaded step (TIMING TRAP: a fori_loop body that doesn't
    # depend on the carry gets hoisted — CLAUDE.md); env rides inside the
    # carry so its arrays are jit args, not closure constants
    def step(carry):
        km, env = carry
        r = spai.batched_residual_norms(env, km)
        return (km ^ (r[:, None] < -1e30), env)

    # window-order plans permute the edge enumeration: apply the same
    # permutation to the mask so the pair-plan cross-check compares the
    # SAME thinned pattern
    keep_rb = (keep_mask if env_rb.rb.edge_perm is None
               else keep_mask[:, env_rb.rb.edge_perm])
    out = np.asarray(spai.batched_residual_norms(env_rb, keep_rb))
    dt = timed(step, (keep_rb, env_rb),
               scalarize=lambda c: jnp.sum(c[0]), iters_lo=5, iters_hi=25)
    pairs_rate = env_rb.rb.npairs * B / dt
    print(f"rowblock: {dt*1e3:.3f} ms/batch({B})  "
          f"{dt*1e3/B:.3f} ms/sample  {pairs_rate/1e9:.1f} Gpair/s")
    result = {"rowblock_ms_per_batch": dt * 1e3, "batch": B,
              "pairs": env_rb.rb.npairs, "gpairs_per_s": pairs_rate / 1e9}

    if not args.skip_pair:
        env_pair = spai.make_env(seed, original=a)
        out_p = np.asarray(spai.batched_residual_norms(env_pair, keep_mask))
        np.testing.assert_allclose(out_p, out,
                                   rtol=2e-2 if args.bf16 else 5e-4)
        dtp = timed(step, (keep_mask, env_pair),
                    scalarize=lambda c: jnp.sum(c[0]), iters_lo=2, iters_hi=6)
        print(f"pair-plan: {dtp*1e3:.3f} ms/batch({B})  speedup "
              f"{dtp/dt:.1f}×")
        result["pair_ms_per_batch"] = dtp * 1e3
        result["speedup"] = dtp / dt
    print(json.dumps(result))


if __name__ == "__main__":
    main()
