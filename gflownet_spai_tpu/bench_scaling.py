"""Weak-scaling harness: halo-exchange SpMV across mesh sizes.

``python -m gflownet_spai_tpu.bench_scaling --devices 1,2,4,8`` keeps the
per-device row count constant and reports time + parallel efficiency per
mesh size (BASELINE.json: ≥80% weak-scaling at 2+ hosts).

On this environment only virtual CPU devices exist (one physical host), so
the printed efficiencies measure the sharded program's overhead structure,
not ICI — the harness is the piece that runs unchanged on a real pod slice.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(device_counts, rows_per_device: int, width: int = 5, reps: int = 5):
    import jax
    import jax.numpy as jnp

    from .ops.dia import DIA, _ALIGN
    from .parallel import halo_spmv, make_mesh, partition_dia

    results = []
    for p in device_counts:
        n = rows_per_device * p
        k = max(1, int(np.sqrt(n)))          # stencil stride
        i = np.arange(n)
        offsets = (-k, -1, 0, 1, k)
        data = np.zeros((5, n), np.float32)
        data[2, :] = 4.0
        data[0, k:] = -1.0
        data[1, 1:] = -1.0
        data[3, :-1] = -1.0
        data[4, :-k] = -1.0
        nnz = int((data != 0).sum())
        d = DIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n), nnz=nnz)
        d = partition_dia(d, p)
        mesh = make_mesh(dp=1, rows=p)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(d.n_pad),
                        jnp.float32)

        fn = jax.jit(lambda x, d=d, mesh=mesh: halo_spmv(mesh, d, x))
        float(jnp.sum(fn(x)))               # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(jnp.sum(fn(x)))
            ts.append(time.time() - t0)
        t = float(np.median(ts))
        results.append({
            "devices": p, "rows": n, "nnz": nnz, "time_s": t,
            "nnz_per_s": nnz / t,
        })
    base = results[0]
    for r in results:
        # weak scaling: ideal time is constant while total work grows
        r["efficiency"] = base["time_s"] / r["time_s"]
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gflownet_spai_tpu.bench_scaling")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--rows-per-device", type=int, default=262144)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--multihost", action="store_true",
                    help="bootstrap jax.distributed first (parallel.multihost)"
                         " — the weak-scaling sweep a real pod runs unmodified")
    args = ap.parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from .parallel.multihost import initialize_from_env, process_summary

        initialize_from_env()
        print(json.dumps(process_summary()))
    counts = [int(x) for x in args.devices.split(",")]
    if max(counts) > len(jax.devices()):
        raise SystemExit(
            f"need {max(counts)} devices, have {len(jax.devices())} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for CPU)"
        )
    results = run(counts, args.rows_per_device)
    for r in results:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
