"""Tracing / profiling utilities.

Covers the reference's memory instrumentation (``log_memory_usage`` /
``malloc_usage``, reference gflownet/utils.py:280-293) plus the TPU-native
additions SURVEY.md §5 calls for: ``jax.profiler`` trace contexts, device
memory stats, and per-kernel roofline counters (nnz/s, effective GB/s).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def log_memory_usage(stage: str) -> Dict[str, float]:
    """Host RSS/VMS (+ per-device TPU memory when exposed).  Parity with
    reference gflownet/utils.py:280-285, device part replaces torch.cuda."""
    import psutil

    mem = psutil.Process().memory_info()
    out = {"rss_mb": mem.rss / 2**20, "vms_mb": mem.vms / 2**20}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[f"{dev.id}_bytes_in_use_mb"] = stats.get("bytes_in_use", 0) / 2**20
    print(f"[{stage}] " + " ".join(f"{k}={v:.1f}" for k, v in out.items()),
          flush=True)
    return out


def malloc_usage(description: str, top: int = 10) -> None:
    """tracemalloc line stats (parity: reference gflownet/utils.py:287-293).
    Requires ``tracemalloc.start()`` beforehand."""
    import tracemalloc

    snapshot = tracemalloc.take_snapshot()
    print(f"\nMemory usage at {description}:")
    for stat in snapshot.statistics("lineno")[:top]:
        print(stat)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """``jax.profiler`` trace context — view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, scalarize: Optional[Callable] = None,
          iters_lo: int = 100, iters_hi: int = 1100, reps: int = 3) -> float:
    """Per-call wall time of ``fn(carry) -> carry`` via the chained
    two-point method (see bench.py: ``block_until_ready`` is unreliable on
    tunneled TPUs, so we difference two jitted fori_loop lengths and force a
    scalar readback)."""
    import jax.numpy as jnp

    scalarize = scalarize or (lambda x: jnp.sum(jax.tree_util.tree_leaves(x)[0]))

    @jax.jit
    def chain(carry, iters):
        out = jax.lax.fori_loop(0, iters, lambda _, c: fn(c), carry)
        return scalarize(out)

    carry0 = args[0]
    for it in (iters_lo, iters_hi):
        float(chain(carry0, it))
    samples = {iters_lo: [], iters_hi: []}
    for _ in range(reps):
        for it in (iters_lo, iters_hi):
            t0 = time.time()
            float(chain(carry0, it))
            samples[it].append(time.time() - t0)
    return float(
        (np.median(samples[iters_hi]) - np.median(samples[iters_lo]))
        / (iters_hi - iters_lo)
    )


def roofline_report(nnz: int, seconds_per_op: float,
                    bytes_per_nnz: float = 5.6,
                    hbm_gbps: float = 819.0) -> Dict[str, float]:
    """nnz/s + fraction of the HBM roofline for a sparse kernel —
    the north-star metric (BASELINE.json: 'nnz/s per chip')."""
    nnz_per_s = nnz / seconds_per_op
    roofline = hbm_gbps * 1e9 / bytes_per_nnz
    return {
        "nnz_per_s": nnz_per_s,
        "gnnz_per_s": nnz_per_s / 1e9,
        "effective_gbps": nnz_per_s * bytes_per_nnz / 1e9,
        "roofline_fraction": nnz_per_s / roofline,
    }
