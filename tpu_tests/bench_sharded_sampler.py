"""On-chip sharded-sampler step time at a ≥100k-action space.

Run on the TPU (one chip → mesh (dp=1, rows=1); the point is the SAMPLER
ALGORITHM cost, not the collectives — t_cap replaces the full [B, A]
perturbed argsort of the dense rollout with a [B, t_cap] top-k + prefix
log-probs, which only pays off for policies that terminate early
(VERDICT r2 weak #4 / SURVEY §7 hard part 3):

    timeout 3000 python tpu_tests/bench_sharded_sampler.py \
        [--checkpoint runs/c4id2_orsirr150] [--t-cap 128]

With ``--checkpoint`` it loads the trained config-4 policy
(orsirr_like150, 112k actions, mean trajectory length ~3 after
training), reports the valid fraction at the given t_cap, and times
dense vs sharded-with-cap sampling steps.
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from gflownet_spai_tpu.utils.profiling import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="orsirr_like150")
    ap.add_argument("--checkpoint", default="runs/c4id2_orsirr150")
    ap.add_argument("--t-cap", type=int, default=128, dest="t_cap")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from gflownet_spai_tpu.train import TrainConfig
    from gflownet_spai_tpu.train.loop import restore_checkpoint, setup
    from gflownet_spai_tpu.models import policies as pol
    from gflownet_spai_tpu.parallel import make_mesh, shard_head
    from gflownet_spai_tpu.parallel.sampler import sharded_rollout
    from gflownet_spai_tpu.gfn.rollout import gumbel_topk_rollout

    cfg = TrainConfig(
        matrix=args.matrix, seed_method="spai", reward_baseline="identity",
        loss="subtb", backward="linear", replay_size=32, replay_samples=4,
        replay_prioritized=1.0, alpha_fixed=0.98, batch_size=16,
        plateau_patience=0, lr=2e-3, out_dir=args.checkpoint)
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    A = mcfg.num_actions
    print(f"matrix {args.matrix}: num_actions={A}")
    restored = restore_checkpoint(args.checkpoint, state)
    trained = restored is not None
    if trained:
        state = restored
        print(f"restored trained policy at epoch {int(state.epoch)}")
    else:
        print("no checkpoint — timing the UNTRAINED policy "
              "(expect valid_frac ~ t_cap/A)")

    mesh = make_mesh(dp=1, rows=1)
    p_sh = shard_head(mesh, state.params.forward)
    B, t_cap = args.batch, args.t_cap

    out = sharded_rollout(mesh, p_sh, graph, A, cfg.hidden_dim,
                          jax.random.PRNGKey(0), batch_size=B, t_cap=t_cap,
                          heads=cfg.heads)
    vf = float(jnp.mean(out.valid.astype(jnp.float32)))
    lens = np.asarray(out.rollout.lengths)
    print(f"t_cap={t_cap}: valid_frac={vf:.3f} "
          f"lengths min/mean/max = {lens.min()}/{lens.mean():.1f}/{lens.max()}")

    def step_sh(carry):
        key, p = carry
        key, sub = jax.random.split(key)
        o = sharded_rollout(mesh, p, graph, A, cfg.hidden_dim, sub,
                            batch_size=B, t_cap=t_cap, heads=cfg.heads)
        return (jax.random.fold_in(key, o.rollout.actions[0, 0]), p)

    dt_sh = timed(step_sh, (jax.random.PRNGKey(1), p_sh),
                  scalarize=lambda c: jnp.sum(c[0]), iters_lo=5, iters_hi=25)
    print(f"sharded rollout (t_cap={t_cap}): {dt_sh*1e3:.3f} ms/step")

    def step_dense(carry):
        key, p = carry
        key, sub = jax.random.split(key)
        logits = pol.forward_policy_logits(p, graph, A, cfg.hidden_dim,
                                           cfg.heads)
        r = gumbel_topk_rollout(jnp.broadcast_to(logits, (B, A)), sub,
                                terminal_action=A - 1)
        return (jax.random.fold_in(key, r.actions[0, 0]), p)

    dt_d = timed(step_dense, (jax.random.PRNGKey(1), state.params.forward),
                 scalarize=lambda c: jnp.sum(c[0]), iters_lo=5, iters_hi=25)
    print(f"dense rollout (full [B,{A}] sort): {dt_d*1e3:.3f} ms/step  "
          f"speedup {dt_d/dt_sh:.1f}x")
    print(json.dumps({
        "num_actions": A, "batch": B, "t_cap": t_cap, "trained": trained,
        "valid_frac": vf, "sharded_ms": dt_sh * 1e3, "dense_ms": dt_d * 1e3,
        "speedup": dt_d / dt_sh,
    }))


if __name__ == "__main__":
    main()
