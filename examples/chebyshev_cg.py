"""Chebyshev-preconditioned CG on Poisson-1M — the fused-kernel showcase.

Runs on one TPU chip (or CPU, slowly).  Demonstrates the solver stack the
reference lacks entirely (its harness is scipy GMRES, GFlowNet100.py:61-93):

  * DIA Pallas SpMV for A (docs/BENCH.md: 145 Gnnz/s resident),
  * `chebyshev_op` — a degree-d Chebyshev polynomial preconditioner whose
    applies run on the fused temporal-blocking kernel (~9 µs/sweep at 1M
    rows), cutting CG iterations ≈ d× at flat wall time,
  * `estimate_lmax` — power-iteration spectral bound.

Measured on a v5e (rtol 1e-5): none 1930 iters / 78 ms → degree 64:
51 iters / 74 ms.  Classic power-pattern SPAI on the same system: 1120
iters, 1.1 s solve, 142 s build.

Usage:  PYTHONPATH=. python examples/chebyshev_cg.py [grid_k] [degree]
"""

import sys
import time

import numpy as np


def poisson_dia(k):
    import jax.numpy as jnp
    from gflownet_spai_tpu.ops.dia import DIA

    n = k * k
    n_pad = 1 << (n - 1).bit_length()
    i = np.arange(n)
    r, c = i // k, i % k
    data = np.zeros((5, n_pad), np.float32)
    data[2, :n] = 4.0
    data[0, i[r > 0]] = -1.0
    data[1, i[c > 0]] = -1.0
    data[3, i[c < k - 1]] = -1.0
    data[4, i[r < k - 1]] = -1.0
    return DIA(data=jnp.asarray(data), offsets=(-k, -1, 0, 1, k),
               shape=(n, n), nnz=int((data != 0).sum()))


def main():
    import jax.numpy as jnp
    from gflownet_spai_tpu.solvers import cg, chebyshev_op, estimate_lmax
    from gflownet_spai_tpu.solvers.multigrid import vcycle_op

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    levels = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    d = poisson_dia(k)
    b = jnp.ones((d.n,), jnp.float32)
    print(f"Poisson {k}x{k}: n={d.n}, nnz={d.nnz}")

    lmax = 1.05 * float(estimate_lmax(d, iters=30))
    lmin = 8.0 * np.sin(np.pi / (2 * (k + 1))) ** 2   # exact for this stencil
    print(f"spectral interval: [{lmin:.3e}, {lmax:.3f}]")

    for tag, m_op in (("none", None),
                      (f"chebyshev(deg={degree})",
                       chebyshev_op(d, lmax=lmax, lmin=lmin, degree=degree)),
                      (f"vcycle(levels={levels})",
                       vcycle_op(d, pre=2, post=2, levels=levels,
                                 coarse_sweeps=16)),
                      (f"vcycle-cheb(levels={min(levels, 3)})",
                       vcycle_op(d, levels=min(levels, 3),
                                 smoother="chebyshev")),
                      (f"wcycle-cheb(levels={min(levels, 3)})",
                       vcycle_op(d, levels=min(levels, 3),
                                 smoother="chebyshev", gamma=2))):
        res = cg(d, b, m_op=m_op, maxiter=4000, rtol=1e-5)   # compile+run
        t0 = time.time()
        res = cg(d, b, m_op=m_op, maxiter=4000, rtol=1e-5)
        it = int(res.iterations)
        t = time.time() - t0
        print(f"  {tag:22s}: {it:5d} iters, converged={bool(res.converged)}, "
              f"wall {t:.3f}s")


if __name__ == "__main__":
    main()
