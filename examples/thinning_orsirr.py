"""Thinning AT SCALE: the deep-thinning recipe on the orsirr class.

VERDICT r4 item 2: the −37.9%-nnz-at-equal-iters result existed only on
the 112-row bcsstk03 toy; this launcher runs the same three-mechanism
recipe (edge-feats + terminal-weighted warm-start + β/λ —
examples/thinning_demo.py) at 291k actions (orsirr_like150, k=2 seed)
and, with k=450, at the 1M north-star scale.

The target landscape is AUDITED first (examples/thinning_oracle.py,
docs/BENCH.md round 5): on orsirr_like150's k=2 seed (291,513 nnz =
2.60× nnz(A)), α = 0.95 places the reward optimum at 40% deletion
(683.4 vs keep-all's 638.4), and scipy GMRES confirms the whole 20–50%
band beats the acceptance bar — keep-all (= classic k=2) 273 iters,
thin-40% 271 iters at 40% fewer nonzeros.

Recipe deltas vs the bcsstk03 demo, and why:

* ``--alpha-fixed 0.95``   — 3.5× the thinning contrast of α=0.98 at
                             the same frac-0.4 optimum (oracle table).
* ``--t-cap 163840``       — trajectories to the optimum are ~116k
                             deletions; the cap bounds the [B, T] SubTB
                             machinery below the full 291k action width
                             while still containing every demonstration
                             (deepest = 145,758 steps at frac 0.5).
* ``--terminal-bias 0``    — the warm-start owns the initial depth; the
                             start-short curriculum is for keep-all runs.

Usage (one v5e; ~1 h total incl. the one-time compile):

    python examples/thinning_orsirr.py [k=150] [epochs=3000]
"""

import subprocess
import sys


def main():
    k = sys.argv[1] if len(sys.argv) > 1 else "150"
    epochs = sys.argv[2] if len(sys.argv) > 2 else "3000"
    run = f"runs/thin_orsirr{k}"
    common = [
        "--matrix", f"orsirr_like{k}",
        "--seed-method", "spai", "--seed-k", "2",
        "--reward-baseline", "identity",
        "--loss", "subtb", "--subtb-lambda", "1.0", "--backward", "linear",
        "--replay-size", "32", "--replay-samples", "4",
        "--replay-prioritized", "1.0",
        "--alpha-fixed", "0.95", "--lr", "1e-3", "--plateau-patience", "0",
        "--reward-beta", "50", "--edge-feats",
        "--replay-seed-thinning", "0.3,0.4,0.5",
        "--t-cap", "163840",
    ]
    train = [sys.executable, "-m", "gflownet_spai_tpu.train", *common,
             "--warmstart-epochs", "6000",
             "--epochs", epochs, "--batch-size", "16",
             "--checkpoint-every", "500", "--log-every", "50",
             "--out-dir", run]
    validate = [sys.executable, "-m", "gflownet_spai_tpu.validate", *common,
                "--classic-k", "2", "--wall-repeats", "3",
                "--from-checkpoint", run, "--final-samples", "128",
                "--out-dir", run + "_val"]
    print("+", " ".join(train), flush=True)
    subprocess.run(train, check=True)
    print("+", " ".join(validate), flush=True)
    subprocess.run(validate, check=True)


if __name__ == "__main__":
    main()
