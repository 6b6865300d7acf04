"""End-to-end SPAI pipeline as a worked example.

Loads/generates a matrix, builds the ILU seed pattern, trains the GFlowNet,
extracts the best sampled preconditioner, and validates with GMRES — the
whole reference workflow (GFlowNet100.py) in ~40 lines of library calls.

Run:  PYTHONPATH=. python examples/spai_pipeline.py [--matrix olm500_like]
"""

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="olm500_like")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from gflownet_spai_tpu.train import TrainConfig, train
    from gflownet_spai_tpu.train.loop import setup
    from gflownet_spai_tpu.gfn import gflownet as gfn
    from gflownet_spai_tpu.solvers import solve_with_gmres, ilu_solve_op, spai_op
    from gflownet_spai_tpu.solvers.validate import best_sampled_matrix
    from gflownet_spai_tpu.env import ilu0

    cfg = TrainConfig(matrix=args.matrix, num_epochs=args.epochs,
                      batch_size=16, lr=5e-3, out_dir="runs/example")
    state, history = train(cfg, progress=True)

    # re-create the env and draw a big sample with the trained policy
    a, seed, env, graph, mcfg, _, _ = setup(cfg)
    out = gfn.sample(state.params, env, graph, mcfg,
                     jax.random.PRNGKey(99), batch_size=512)
    m = best_sampled_matrix(env, out.rollout.actions, out.rewards)
    print(f"best sampled reward: {float(out.rewards.max()):.1f}")

    b = jnp.ones((a.shape[0],), a.data.dtype)
    for name, op in [
        ("none", None),
        ("ilu0", ilu_solve_op(*ilu0(a))),
        ("sampled SPAI", spai_op(m)),
    ]:
        _, res, iters, t = solve_with_gmres(a, b, op, maxiter=3000)
        print(f"{name:14s} GMRES iters = {iters:5d}  ({t:.2f}s)")


if __name__ == "__main__":
    main()
