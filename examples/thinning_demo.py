"""The thinning demonstration: sampled SPAI BEATS classic SPAI on cost.

VERDICT r3 item 4 asked for value over classic SPAI, not parity: a
validate table where the sampled preconditioner has >=10% fewer nonzeros
than classic at <= classic's iteration count.  This recipe delivers
23.7% fewer nonzeros at EQUAL CG iterations on the bcsstk03-class SPD
matrix (runs/thin_bcsstk03_l1_val/validation.json):

    preconditioner    iters   true res     nnz
    none                 15   8.87e-06     --
    ILU(0)                5   1.69e-06     (L,U)
    sampled SPAI          4   1.75e-06     2,718   <- 23.7% fewer
    classic SPAI          4   1.51e-06     3,562

The three pieces that make the interior optimum reachable (each was
measured necessary on this problem — docs/BENCH.md round 4):

* ``--edge-feats``            one learned weight expresses "delete
                              small-|value| entries first" directly
                              (models.policies.action_features).
* ``--replay-seed-thinning`` + ``--warmstart-epochs``
                              magnitude-ordered demonstrations seed the
                              replay buffer AND a terminal-weighted
                              cross-entropy warm-start snaps the policy
                              into the thinning basin (unweighted NLL
                              collapses to delete-EVERYTHING: ~1,800
                              deletion steps vs 1 stop step per demo).
* ``--reward-beta 50 --subtb-lambda 1.0``
                              the landscape spans only ~1.5 nats at
                              beta=1, and SubTB(lambda=0.9) down-weights
                              the terminal reward anchor by lambda^T on
                              ~700-step trajectories — training drifts
                              off the ridge with either default.

alpha=0.98 puts the reward optimum at ~50% deletion where the CG
iteration count is measured flat (docs/BENCH.md).

Usage (~6 min total on one v5e):

    python examples/thinning_demo.py [epochs=4000]
"""

import subprocess
import sys


def main():
    epochs = sys.argv[1] if len(sys.argv) > 1 else "4000"
    run = "runs/thinning_demo"
    common = [
        "--matrix", "bcsstk03_like", "--seed-method", "spai", "--seed-k", "2",
        "--reward-baseline", "identity",
        "--loss", "subtb", "--subtb-lambda", "1.0", "--backward", "linear",
        "--replay-size", "32", "--replay-samples", "4",
        "--replay-prioritized", "1.0",
        "--alpha-fixed", "0.98", "--lr", "1e-3", "--plateau-patience", "0",
        "--reward-beta", "50", "--edge-feats",
        "--replay-seed-thinning", "0.4,0.5,0.6",
    ]
    train = [sys.executable, "-m", "gflownet_spai_tpu.train", *common,
             "--warmstart-epochs", "6000",
             "--epochs", epochs, "--batch-size", "16",
             "--checkpoint-every", "1000", "--log-every", "100",
             "--out-dir", run]
    validate = [sys.executable, "-m", "gflownet_spai_tpu.validate", *common,
                "--method", "cg", "--classic-k", "2",
                "--from-checkpoint", run, "--final-samples", "256",
                "--out-dir", run + "_val"]
    print("+", " ".join(train), flush=True)
    subprocess.run(train, check=True)
    print("+", " ".join(validate), flush=True)
    subprocess.run(validate, check=True)


if __name__ == "__main__":
    main()
