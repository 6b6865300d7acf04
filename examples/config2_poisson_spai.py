"""BASELINE config 2: 2D 5-point Poisson — sampled SPAI vs static
power-pattern SPAI, CG iteration parity.

Two parts (scales chosen so each runs in minutes):

* ``--part classic`` (default grid 1000 → the 1M-row config-2 problem):
  classic power-pattern SPAI (pattern of A, batched-QR least squares) as a
  CG preconditioner on the real chip, vs unpreconditioned and Jacobi.
  A applies through the Pallas DIA SpMV; M through the symmetrized SPAI
  operator (CG needs an SPD preconditioner).

* ``--part sampled`` (default grid 64): the GFlowNet thins the classic-SPAI
  seed (``--seed-method spai``) and the validation harness compares CG
  iteration counts of the sampled pattern against classic SPAI / ILU /
  none — the "CG iteration parity" half of the config.

Usage:
    python examples/config2_poisson_spai.py --part classic --grid 1000
    python examples/config2_poisson_spai.py --part sampled --grid 64
"""

from __future__ import annotations

import argparse
import json
import time


def run_classic(grid: int) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gflownet_spai_tpu.ops.dia import coo_to_dia
    from gflownet_spai_tpu.solvers.cg import cg
    from gflownet_spai_tpu.solvers.linop import as_linop
    from gflownet_spai_tpu.solvers.precond import jacobi_op, spai_op_sym
    from gflownet_spai_tpu.solvers.spai_classic import spai_classic
    from gflownet_spai_tpu.sparse.gallery import poisson2d
    from gflownet_spai_tpu.sparse.types import COO

    a = poisson2d(grid, dtype=np.float32)
    n = a.shape[0]
    print(f"A: poisson {grid}x{grid} grid, n={n}, nnz={a.nnz}", flush=True)

    t0 = time.time()
    m = spai_classic(a, k=1)          # power-pattern(A^1) least squares
    t_spai = time.time() - t0
    print(f"classic SPAI built in {t_spai:.1f}s, nnz(M)={m.nnz}", flush=True)

    d = coo_to_dia(a)
    d = dataclasses.replace(d, data=d.data.astype(jnp.float32))
    a_lin = as_linop(d)               # Pallas DIA SpMV, operand as jit arg
    b = jnp.ones((n,), jnp.float32)

    # M shares A's banded pattern → apply it through the Pallas DIA SpMV
    m_dia = coo_to_dia(m)
    m_dia = dataclasses.replace(m_dia, data=m_dia.data.astype(jnp.float32))

    out = {"n": n, "nnz_A": a.nnz, "nnz_M": m.nnz, "spai_build_s": t_spai}
    for tag, m_op in (("none", None), ("jacobi", jacobi_op(a)),
                      ("classic_spai", spai_op_sym(m_dia))):
        t0 = time.time()
        res = cg(a_lin, b, m_op=m_op, maxiter=2000, rtol=1e-5)
        iters = int(res.iterations)
        elapsed = time.time() - t0
        out[tag] = {"iters": iters, "converged": bool(res.converged),
                    "wall_s": round(elapsed, 2)}
        print(f"CG[{tag}]: {iters} iters, converged={bool(res.converged)}, "
              f"{elapsed:.2f}s (incl. compile)", flush=True)
    return out


def run_sampled(grid: int, epochs: int) -> dict:
    from gflownet_spai_tpu.validate.__main__ import main as validate_main

    out_dir = f"runs/config2_sampled_{grid}"
    rc = validate_main([
        "--matrix", f"poisson{grid}", "--epochs", str(epochs),
        "--batch-size", "8", "--seed-method", "spai", "--method", "cg",
        "--alpha-fixed", "0.98", "--out-dir", out_dir,
        # ~20k-step trajectories: subTB keeps the loss scale sane, replay
        # retains the rare high-reward thinnings
        "--loss", "subtb", "--replay-size", "16",
    ])
    assert rc == 0
    with open(f"{out_dir}/validation.json") as f:
        return json.load(f)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--part", choices=["classic", "sampled"], default="classic")
    p.add_argument("--grid", type=int, default=None)
    p.add_argument("--epochs", type=int, default=150)
    args = p.parse_args()
    if args.part == "classic":
        result = run_classic(args.grid or 1000)
    else:
        result = run_sampled(args.grid or 64, args.epochs)
    print(json.dumps(result))
