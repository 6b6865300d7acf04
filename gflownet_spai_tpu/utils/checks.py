"""Invariant checks and NaN screens.

Encodes the reference's ad-hoc manual checks (SURVEY.md §4) as callable
validators, plus jit-compatible finite-value screens:

* ``find_duplicate_actions``    — no action repeats within a trajectory
  (reference ``find_column_duplicates``, GFlowNet100.py:490-516).
* ``check_rollout_invariants``  — padding after terminal, terminal present,
  fwd log-probs 0 on padding (reference Log semantics, log.py:67-87).
* ``finite_or_skip``            — the NaN/Inf loss guard as a reusable
  combinator (reference GFlowNet100.py:307-309).
* ``checkify_nan_screen``       — jax.checkify wrapper that raises on
  non-finite intermediates in debug runs.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_duplicate_actions(actions, ignore_value: int = -1) -> List[Tuple[int, int]]:
    """Returns [(sample, action)] for any action appearing more than once in
    a trajectory.  ``actions``: [B, T] with padding = ``ignore_value``."""
    a = np.asarray(actions)
    dups = []
    for b in range(a.shape[0]):
        traj = a[b][a[b] != ignore_value]
        vals, counts = np.unique(traj, return_counts=True)
        for v in vals[counts > 1]:
            dups.append((b, int(v)))
    return dups


def check_rollout_invariants(rollout, terminal_action: int) -> None:
    """Asserts the masking/padding invariants on a Rollout (host-side)."""
    a = np.asarray(rollout.actions)
    lp = np.asarray(rollout.fwd_logprobs)
    lens = np.asarray(rollout.lengths)
    assert not find_duplicate_actions(a), "repeated action in a trajectory"
    for b in range(a.shape[0]):
        k = lens[b]
        assert a[b, k - 1] == terminal_action, f"sample {b}: no terminal at end"
        assert (a[b, k:] == -1).all(), f"sample {b}: non-pad after terminal"
        assert (lp[b, k:] == 0.0).all(), f"sample {b}: nonzero pad log-prob"
        assert np.all(lp[b, :k] <= 1e-7), f"sample {b}: positive log-prob"


def finite_or_skip(loss: jax.Array, grads):
    """(loss, grads) → (masked grads, skipped flag): zero update on
    non-finite loss — jit-compatible version of the reference's epoch skip."""
    good = jnp.isfinite(loss)
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads
    )
    return grads, ~good


def checkify_nan_screen(fn: Callable) -> Callable:
    """Wrap ``fn`` with jax.checkify float checks; the returned function
    raises on NaN/Inf intermediates (debug tool, not for the hot path)."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
