"""On-chip GATv2 forward benchmark: XLA sorted-scatter vs the node-tile
Pallas segment kernels (ops.segment) at ≥1M edges.

Run on the TPU:
    timeout 900 python tpu_tests/bench_gat.py [--n 500000] [--hidden 8]

VERDICT r1 #3 acceptance: an on-chip number for a ≥1M-edge GATv2 forward
(the reference GAT scatter substrate, policy.py:21,29).
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from gflownet_spai_tpu.models.policies import (
    forward_policy_init, forward_policy_logits, graph_from_seed,
    tiled_graph_from_seed)
from gflownet_spai_tpu.sparse.convert import coo_sort_dedup
from gflownet_spai_tpu.sparse.types import COO
from gflownet_spai_tpu.utils.profiling import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--skip-scatter", action="store_true")
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
    E = seed.nnz + 2 * n   # + self-loops over the 2n node set
    print(f"n={n} edges(with loops)={E}")

    num_actions = seed.nnz + 1
    params = forward_policy_init(jax.random.PRNGKey(0), args.hidden,
                                 num_actions)
    tg = tiled_graph_from_seed(seed)
    print(f"tiles: T={tg.tiles.tiles} S={tg.tiles.slots} "
          f"TN={tg.tiles.tile_nodes} "
          f"slot util={E / (tg.tiles.tiles * tg.tiles.slots):.2f}")

    def step_t(carry):
        x, p = carry
        logits = forward_policy_logits(p, tg._replace(x=x), num_actions,
                                       args.hidden)
        return (x + logits[0] * 0.0, p)

    x0 = jnp.ones((2 * n, 1), jnp.float32)
    got = forward_policy_logits(params, tg, num_actions, args.hidden)
    dt = timed(step_t, (x0, params),
               scalarize=lambda c: jnp.sum(c[0]), iters_lo=5, iters_hi=25)
    print(f"tiled GAT fwd: {dt*1e3:.3f} ms  ({E/dt/1e9:.2f} Gedge/s)")
    result = {"tiled_ms": dt * 1e3, "edges": E,
              "gedges_per_s": E / dt / 1e9}

    if not args.skip_scatter:
        g = graph_from_seed(seed)

        def step_s(carry):
            x, p = carry
            logits = forward_policy_logits(p, g._replace(x=x), num_actions,
                                           args.hidden)
            return (x + logits[0] * 0.0, p)

        want = forward_policy_logits(params, g, num_actions, args.hidden)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-3, atol=5e-4)
        dts = timed(step_s, (x0, params),
                    scalarize=lambda c: jnp.sum(c[0]), iters_lo=2, iters_hi=8)
        print(f"scatter GAT fwd: {dts*1e3:.3f} ms  speedup {dts/dt:.1f}×")
        result["scatter_ms"] = dts * 1e3
        result["speedup"] = dts / dt
    print(json.dumps(result))


if __name__ == "__main__":
    main()
