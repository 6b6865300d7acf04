"""Toy grid-world GFlowNet — the classic sanity check (reference grid.py).

Trains a small MLP policy with the generic per-step sampler and uniform
backward policy; prints the fraction of samples landing in the high-reward
rings (should exceed ~40% after training vs ~6% at random).

Run:  PYTHONPATH=. python examples/grid_gfn.py [--cpu]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from gflownet_spai_tpu.env import grid as G
from gflownet_spai_tpu.gfn.loss import trajectory_balance_loss
from gflownet_spai_tpu.gfn.rollout import scan_rollout


def main(size=8, hidden=32, epochs=400, batch=64):
    g = G.GridEnv(size=size)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "w1": jax.random.normal(k1, (g.state_dim, hidden)) * 0.1,
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, 3)) * 0.1,
        "b2": jnp.zeros(3),
        "log_z": jnp.zeros(()),
    }

    def logits(params, idx):
        h = jax.nn.relu(jax.nn.one_hot(idx, g.state_dim) @ params["w1"] + params["b1"])
        return jnp.where(G.mask(g, idx), h @ params["w2"] + params["b2"], -jnp.inf)

    def rollout(params, key, n):
        keys = jax.random.split(key, n)
        return jax.vmap(lambda k: scan_rollout(
            lambda s, t: logits(params, s), lambda s, a: G.update(g, s, a),
            jnp.asarray(0), k, G.TERMINATE, max_steps=2 * size,
        ))(keys)

    def loss_fn(params, key):
        finals, rolls = rollout(params, key, batch)
        r, c = finals // g.size, finals % g.size
        logbinom = (jax.scipy.special.gammaln(r + c + 1.0)
                    - jax.scipy.special.gammaln(r + 1.0)
                    - jax.scipy.special.gammaln(c + 1.0))
        return trajectory_balance_loss(
            params["log_z"], jnp.log(G.reward(g, finals)),
            rolls.fwd_logprobs.sum(-1), -logbinom)

    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        l, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    key = jax.random.PRNGKey(1)
    for e in range(epochs):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        if e % 100 == 0:
            print(f"epoch {e}: loss {float(l):.3f}")

    finals, _ = rollout(params, jax.random.PRNGKey(2), 2048)
    hit = float((np.asarray(G.reward(g, finals)) > 0.5).mean())
    print(f"samples in high-reward rings: {hit:.1%}")


if __name__ == "__main__":
    main()
