"""On-chip benchmark: streamed fused k-step SpMV at PER-K tiles.

    timeout 1200 python tpu_tests/bench_fused_perk.py [--grid 4096] [--k 8]

The k=8 / halo-4096 class (Poisson 4096²) exceeds the VMEM model with the
matrix-global ``dia_pp_tile`` — ``dia_power_tile(d, k)`` shrinks the tile
per k instead of forcing a lower k (round-1 gap; covered by unit tests,
this records the BENCH row).  Chained dependent applies y ← 0.2·A·y, same
two-point fori_loop timing as bench.py.
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import poisson_dia
from gflownet_spai_tpu.ops import dia as D
from gflownet_spai_tpu.utils.profiling import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=4096)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    k = args.k

    d = poisson_dia(args.grid)
    tr_global = D.dia_pp_tile(d)
    tr = D.dia_power_tile(d, k)
    print(f"n={d.n} nnz={d.nnz} halo={d.halo} "
          f"pp_tile={tr_global} power_tile(k={k})={tr}")
    if not tr:
        raise SystemExit(f"no per-k tile admits k={k}")
    # the point of the row: the global tile must NOT admit this k
    print(f"global-tile admits k={k}: "
          f"{D.dia_power_ok(d, k, tr_global) or D.dia_power_stream_ok(d, k, tr_global)}; "
          f"per-k tile streams: {D.dia_power_stream_ok(d, k, tr)} "
          f"resident: {D.dia_power_ok(d, k, tr)}")

    dk = D.dia_power_data(d, k, tr=tr)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(d.n).astype(np.float32))
    xq = D.dia_pad_pp(d, x, tr=tr)
    zq = jnp.zeros_like(xq)

    # correctness vs k jnp applies
    got = np.asarray(jax.jit(lambda d, dk, xq: D.spmv_dia_power(
        d, dk, xq, jnp.zeros_like(xq), scale=0.2, k=k))(d, dk, xq))
    want = x
    for _ in range(k):
        want = D.spmv_dia_jnp(d, want) * 0.2
    want = np.asarray(want)
    rel = np.abs(got[tr:tr + d.n] - want).max() / np.abs(want).max()
    print(f"correct: rel={rel:.2e}")
    assert rel < 1e-5

    # fixed-role ping-pong chain: 2 fused calls per loop step = 2k applies
    def step(carry):
        xq, zq, d, dk = carry
        zq = D.spmv_dia_power(d, dk, xq, zq, scale=0.2, k=k)
        xq = D.spmv_dia_power(d, dk, zq, xq, scale=0.2, k=k)
        return (xq, zq, d, dk)

    dt = timed(step, (xq, zq, d, dk),
               scalarize=lambda c: jnp.sum(c[0][:8]),
               iters_lo=20, iters_hi=120)
    per_apply = dt / (2 * k)
    rate = d.nnz / per_apply
    print(f"{dt*1e3:.3f} ms per 2k applies → {per_apply*1e6:.1f} µs/apply "
          f"= {rate/1e9:.1f} Gnnz/s")
    print(json.dumps({"grid": args.grid, "k": k, "tile": tr,
                      "us_per_apply": per_apply * 1e6,
                      "gnnz_per_s": rate / 1e9}))


if __name__ == "__main__":
    main()
