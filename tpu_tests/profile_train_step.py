"""On-chip jax.profiler decomposition of the config-4 train step.

VERDICT r3 weak #1: the 112k-action epoch is ~0.28 s with ~180 ms never
attributed to a named kernel.  This captures a device trace of the full
jitted step (rollout + SubTB loss + backward + Adam) at the round-3
recipe's exact shapes and prints per-HLO-op device time, grouped.

Run:  timeout 3000 python tpu_tests/profile_train_step.py
      [--matrix orsirr_like150] [--steps 2] [--out /tmp/prof_step]

Uses the persistent compile cache (CLAUDE.md round-3 notes) so repeat
runs skip the multi-minute remote compile.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def parse_trace(logdir: str):
    """Aggregate device-side op durations from the newest trace.json.gz."""
    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    count = collections.Counter()
    sample_args = {}
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in str(pids.get(e["pid"], "")):
            continue
        name = e.get("name", "?")
        dur[name] += e.get("dur", 0)
        count[name] += 1
        if name not in sample_args and e.get("args"):
            sample_args[name] = e["args"]
    return dur, count, sample_args


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--matrix", default="orsirr_like150")
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--out", default="/tmp/prof_step")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--t-cap", type=int, default=0, dest="t_cap")
    args = p.parse_args()

    from gflownet_spai_tpu.train import TrainConfig, make_train_step, setup

    cfg = TrainConfig(
        matrix=args.matrix, seed_method="spai", batch_size=args.batch_size,
        lr=2e-3, plateau_patience=0, reward_baseline="identity",
        loss="subtb", backward="linear", replay_size=32, replay_samples=4,
        replay_prioritized=1.0, alpha_fixed=0.98, t_cap=args.t_cap,
    )
    print(f"devices: {jax.devices()}", flush=True)
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    print(f"n={env.n} actions={env.num_actions} edges={graph.edge_src.shape if hasattr(graph, 'edge_src') else 'tiled'}",
          flush=True)
    step = make_train_step(cfg, env, graph, mcfg, opt)

    import time
    t0 = time.time()
    for i in range(args.warmup):
        state, metrics = step(state)
        loss = float(metrics["loss"])  # forces completion through the tunnel
        print(f"warmup {i}: loss {loss:.2f}  (+{time.time()-t0:.1f}s)",
              flush=True)

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, metrics = step(state)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()

    dur, count, sargs = parse_trace(args.out)
    total = sum(dur.values())
    print(f"\ntotal device time {total/1e3:.1f} ms over {args.steps} steps "
          f"({total/1e3/args.steps:.1f} ms/step)\n")
    print(f"{'ms':>9s} {'n':>5s}  op")
    for name, d in dur.most_common(args.top):
        extra = ""
        a_ = sargs.get(name) or {}
        ln = a_.get("long_name") or a_.get("tf_op") or ""
        if ln:
            extra = f"  [{str(ln)[:90]}]"
        print(f"{d/1e3:9.3f} {count[name]:5d}  {name[:70]}{extra}")


if __name__ == "__main__":
    main()
