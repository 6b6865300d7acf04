"""On-chip sweep: ping-pong SpMV chain vs the padded+repack chain.

Run: PYTHONPATH=/root/.axon_site:. timeout 1800 python tpu_tests/sweep_padded_io.py

Times a Jacobi-style chained SpMV (the bench.py shape) ways:
  (a) current default: spmv_dia_padded + dynamic_update_slice repack
  (b) ping-pong aliased kernel (y into the swapped same-layout buffer,
      interior blocks only) at several tiles P — resident or streamed
      per VMEM fit.
Two-point chained fori_loop differencing; d passes as a jit ARGUMENT
(336 MB of diagonals at 4096² blows the remote-compile payload as a
closure constant).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed_chain(chain, d, x0, lo, hi, reps=5):
    t0 = time.time()
    for it in (lo, hi):
        float(chain(d, x0, it))
    compile_s = time.time() - t0
    samples = {lo: [], hi: []}
    for _ in range(reps):
        for it in (lo, hi):
            t0 = time.time()
            float(chain(d, x0, it))
            samples[it].append(time.time() - t0)
    dt = (np.median(samples[hi]) - np.median(samples[lo])) / (hi - lo)
    return dt, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from gflownet_spai_tpu.ops import dia as D

    sys.path.insert(0, "/root/repo")
    from bench import poisson_dia

    print(f"devices: {jax.devices()}", flush=True)

    @jax.jit
    def chain_a(d, xp, iters):
        h = d.halo

        def body(_, xp):
            y = D.spmv_dia_padded(d, xp)
            return jax.lax.dynamic_update_slice(xp, y * 0.2, (h,))
        return jnp.sum(jax.lax.fori_loop(0, iters, body, xp))

    @jax.jit
    def chain_pp(d, xq, iters):
        # two fixed-role calls per loop step: each pallas alias is
        # slot-preserving, so XLA never copies the carry buffers (a
        # (y, x) swap carry forces a copy per iter — measured: erases
        # the aliasing win entirely)
        def body(_, c):
            x, y = c
            y = D.spmv_dia_pingpong(d, x, y, scale=0.2)
            x = D.spmv_dia_pingpong(d, y, x, scale=0.2)
            return (x, y)
        x, y = jax.lax.fori_loop(0, iters, body, (xq, jnp.zeros_like(xq)))
        return jnp.sum(x)

    for k in (1000, 4096):
        d = poisson_dia(k)
        h = d.halo
        print(f"\n=== poisson {k}^2: n={d.n}, n_pad={d.n_pad}, nnz={d.nnz}, "
              f"halo={h} ===", flush=True)
        lo, hi = (100, 600) if k <= 2000 else (20, 120)

        xp0 = D.dia_pad_x(d, jnp.ones((d.n,), jnp.float32))
        dt, cs = timed_chain(chain_a, d, xp0, lo, hi)
        print(f"  (a) padded+repack default : {dt*1e6:8.1f} us/op  "
              f"{d.nnz/dt/1e9:6.1f} Gnnz/s  (compile {cs:.1f}s)", flush=True)

        orig = D.dia_pp_tile
        try:
            for mult in (16, 32, 64, 128, 256):
                tr = mult * D._ALIGN
                if tr < h or d.n_pad % tr:
                    continue
                D.dia_pp_tile = lambda dd, tr=tr: tr
                res_ok = D._pp_resident_ok(d, tr)
                str_ok = (2 * (tr + 2 * h) + (3 * d.ndiags + 8) * tr
                          <= D._MAX_VMEM_BYTES // 4)
                if not (res_ok or str_ok):
                    print(f"  P={tr:7d}: no VMEM fit", flush=True)
                    continue
                xq0 = D.dia_pad_pp(d, jnp.ones((d.n,), jnp.float32))
                try:
                    dt, cs = timed_chain(chain_pp, d, xq0, lo, hi)
                except Exception as e:  # noqa: BLE001
                    print(f"  P={tr:7d}: FAILED {type(e).__name__}: "
                          f"{str(e)[:150]}", flush=True)
                    continue
                dt /= 2.0   # two SpMVs per loop step
                mode = "resident" if res_ok else "streamed"
                print(f"  (b) ping-pong P={tr:6d} {mode:8s}: {dt*1e6:8.1f} "
                      f"us/op  {d.nnz/dt/1e9:6.1f} Gnnz/s  (compile {cs:.1f}s)",
                      flush=True)
        finally:
            D.dia_pp_tile = orig


if __name__ == "__main__":
    main()
