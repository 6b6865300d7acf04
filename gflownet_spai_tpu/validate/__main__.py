"""Acceptance harness CLI: ``python -m gflownet_spai_tpu.validate``.

Reproduces the reference's validation flow (GFlowNet100.py:98-132 +
solve_with_gmres at :61-93) end to end:

  load matrix → train the GFlowNet (or load a checkpoint) → extract the
  best sampled preconditioner → GMRES with none / ILU / sampled-SPAI /
  classic-SPAI → report iteration counts, residuals, and timings.

Writes ``validation.json`` + a text table; exit code 0 iff the sampled
preconditioner converges.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gflownet_spai_tpu.validate")
    p.add_argument("--matrix", default="LF10")
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--seed-method", default="ilu0",
                   choices=["ilu0", "spilu", "pattern", "spai"])
    p.add_argument("--maxiter", type=int, default=10260)
    p.add_argument("--restart", type=int, default=30)
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--platform", default=None)
    p.add_argument("--out-dir", default="runs/validate")
    p.add_argument("--classic-k", type=int, default=1,
                   help="power-pattern order for the classic-SPAI column")
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    from ..train import TrainConfig, make_train_step, setup
    from ..solvers import solve_with_gmres, ilu_solve_op, spai_op
    from ..solvers.spai_classic import spai_classic
    from ..solvers.validate import best_sampled_matrix
    from ..env import ilu as ilu_mod
    from ..gfn import gflownet as gfn

    cfg = TrainConfig(
        matrix=args.matrix, seed_method=args.seed_method,
        batch_size=args.batch_size, num_epochs=args.epochs, lr=args.lr,
        out_dir=args.out_dir,
    )
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    print(f"matrix {args.matrix}: n={env.n}, seed nnz={env.num_edges}")

    step = make_train_step(cfg, env, graph, mcfg, opt)
    for epoch in range(args.epochs):
        state, metrics = step(state)
        if epoch % max(1, args.epochs // 5) == 0:
            print(f"  train epoch {epoch}: loss {float(metrics['loss']):.2f} "
                  f"reward {float(metrics['reward_mean']):.1f}")

    # large final sampling round → best preconditioner (reference does a
    # 10^4-sample terminal rollout, GFlowNet100.py:530-532)
    out = gfn.sample(state.params, env, graph, mcfg,
                     jax.random.PRNGKey(123), batch_size=256)
    m_best = best_sampled_matrix(env, out.rollout.actions, out.rewards)
    kept = int(jnp.sum(jnp.abs(m_best.data) > 0))
    print(f"best sampled M: kept {kept}/{env.num_edges} entries, "
          f"reward {float(jnp.max(out.rewards)):.1f}")

    n = env.n
    b = jnp.ones((n,), a.data.dtype)
    kw = dict(maxiter=args.maxiter, restart=args.restart, rtol=args.rtol)
    report = {}

    x, res, iters, t = solve_with_gmres(a, b, None, **kw)
    report["none"] = {"iterations": iters, "time_s": t,
                      "final_residual": float(res[-1]) if len(res) else None}

    L, U = (ilu_mod.ilu0(a) if args.seed_method == "ilu0"
            else ilu_mod.spilu_lu(a))
    x, res, iters, t = solve_with_gmres(a, b, ilu_solve_op(L, U), **kw)
    report["ilu"] = {"iterations": iters, "time_s": t,
                     "final_residual": float(res[-1]) if len(res) else None}

    x, res, iters, t = solve_with_gmres(a, b, spai_op(m_best), **kw)
    report["sampled_spai"] = {"iterations": iters, "time_s": t,
                              "final_residual": float(res[-1]) if len(res) else None,
                              "kept_nnz": kept, "seed_nnz": env.num_edges}

    mc = spai_classic(a, k=args.classic_k, dtype=a.data.dtype)
    x, res, iters, t = solve_with_gmres(a, b, spai_op(mc), **kw)
    report["classic_spai"] = {"iterations": iters, "time_s": t,
                              "final_residual": float(res[-1]) if len(res) else None,
                              "nnz": mc.nnz}

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "validation.json").write_text(json.dumps(report, indent=2))

    print(f"\n{'preconditioner':15s} {'iters':>7s} {'time(s)':>8s} {'final res':>10s}")
    for k, v in report.items():
        fr = v["final_residual"]
        print(f"{k:15s} {v['iterations']:7d} {v['time_s']:8.2f} "
              f"{fr if fr is None else format(fr, '10.3e')}")

    ok = report["sampled_spai"]["iterations"] <= report["none"]["iterations"]
    print("\nsampled SPAI", "converged no worse than unpreconditioned"
          if ok else "WORSE than unpreconditioned")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
