"""Magnitude-thinning ORACLE: the reward/iteration landscape a thinning
run has to climb, computed before any training is launched.

For each fraction f it zeroes the f·nnz smallest-|value| entries of the
classic-SPAI seed M₀ (the same demonstrations `--replay-seed-thinning`
injects — train/loop._magnitude_demos) and reports

* the env's EXACT reward (identity baseline: res_ratio = ‖M_f·A−I‖_F/√n,
  flops ratio = nnz(M_f)/nnz(A) — env/spai.py:332, reference
  preconditioner.py:64,163 with B5/B9/B11 resolved), per requested α, and
* (--gmres / --cg) scipy iteration counts of the thinned preconditioner,
  the reference's acceptance metric (GFlowNet100.py:61-93).

Why this exists: the α landscape trap (docs/ROADMAP.md #7) — with
baseline=identity the flops term anchors to nnz(A), so a k-step seed
denser than A can place the reward optimum at delete-everything or
keep-everything depending on α.  Round 4 burned a training run learning
this on bcsstk03; the oracle answers it in a minute with no training.

Usage:
    python examples/thinning_oracle.py --matrix orsirr_like150 --seed-k 2 \
        --alphas 0.95,0.98 --fracs 0,0.1,0.2,0.3,0.4,0.5,0.6 [--gmres]
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--matrix", default="orsirr_like150")
    p.add_argument("--seed-k", type=int, default=2, dest="seed_k")
    p.add_argument("--alphas", default="0.95,0.98")
    p.add_argument("--fracs", default="0,0.1,0.2,0.3,0.4,0.5,0.6")
    p.add_argument("--gmres", action="store_true",
                   help="also run scipy GMRES per fraction (slow)")
    p.add_argument("--cg", action="store_true",
                   help="also run scipy CG per fraction (SPD matrices)")
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from gflownet_spai_tpu.env import ilu
    from gflownet_spai_tpu.sparse import gallery
    from gflownet_spai_tpu.sparse.types import COO

    a = gallery.get(args.matrix)
    t0 = time.time()
    seed = ilu.seed_pattern(a, method="spai", k=args.seed_k)
    print(f"seed: classic SPAI k={args.seed_k}, nnz {seed.nnz} "
          f"({seed.nnz / a.nnz:.2f}x nnz(A)={a.nnz}) "
          f"built in {time.time() - t0:.1f}s", flush=True)

    n = a.shape[0]
    A = sp.csr_matrix(
        (np.asarray(a.data, np.float64),
         (np.asarray(a.row), np.asarray(a.col))), shape=a.shape)
    m_row = np.asarray(seed.row)
    m_col = np.asarray(seed.col)
    m_val = np.asarray(seed.data, np.float64)
    order = np.argsort(np.abs(m_val))  # smallest first = demo deletion order
    alphas = [float(x) for x in args.alphas.split(",") if x]
    fracs = [float(x) for x in args.fracs.split(",") if x]
    sqrt_n = np.sqrt(float(n))
    eye = sp.identity(n, format="csr")
    b = A @ np.ones(n)

    def iters_of(M):
        it = {"n": 0}

        def cb(_):
            it["n"] += 1

        solver = spla.gmres if args.gmres else spla.cg
        kw = (dict(restart=None, callback_type="pr_norm")
              if args.gmres else {})
        x, info = solver(A, b, rtol=args.rtol, maxiter=10260,
                         M=M, callback=cb, **kw)
        res = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        return it["n"], res

    rows = []
    for f in fracs:
        kdel = int(f * len(m_val))
        keep = np.ones(len(m_val), bool)
        keep[order[:kdel]] = False
        M = sp.csr_matrix((m_val[keep], (m_row[keep], m_col[keep])),
                          shape=a.shape)
        res = sp.linalg.norm(M @ A - eye)
        res_ratio = res / sqrt_n
        comp_ratio = keep.sum() / a.nnz
        row = {"frac": f, "nnz": int(keep.sum()),
               "residual": float(res), "res_ratio": float(res_ratio),
               "comp_ratio": float(comp_ratio)}
        for al in alphas:
            row[f"reward_a{al}"] = float(
                1000.0 * (al * (1 - res_ratio) + (1 - al) * (1 - comp_ratio)))
        if args.gmres or args.cg:
            linop = spla.LinearOperator(A.shape, matvec=lambda v, M=M: M @ v)
            row["iters"], row["true_res"] = iters_of(linop)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # where does each alpha put the optimum?
    for al in alphas:
        best = max(rows, key=lambda r: r[f"reward_a{al}"])
        print(f"alpha={al}: reward optimum at frac={best['frac']} "
              f"(reward {best[f'reward_a{al}']:.1f})", flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
