"""Edge-enumeration versioning for checkpoints.

The SPAI action space IS the seed pattern's edge list: action ``j`` deletes
edge ``j`` of the enumeration the env was built with (reference
preconditioner.py:14-16 — ``num_actions = init_nnz + 1``).  Two env
backends define their own enumeration order:

* ``rowblock_order="window"`` permutes the seed so every reward bucket's
  m-value windows are contiguous slices (``sparse.rowblock`` — the 11.5×
  gather-free reward path), and
* the DIA env enumerates edges diagonal-major.

A checkpoint trained under one enumeration is therefore meaningless under
another *unless* the id-indexed parameters are permuted to match.  This
module stamps the enumeration into every checkpoint
(``checkpoint/enum.json`` + the canonical→enumeration permutation as
``enum_perm.npy``) and, on restore, either verifies it, REMAPS the
id-indexed parameter slices across orders (exact for the ``linear`` /
``uniform`` backward policies — their action ids only enter as gather
indices), or refuses loudly (the reference-parity ``lstm`` backward feeds
raw ids as scalar LSTM inputs, which no permutation can fix).

VERDICT r3 "Next round" item 5; enables window-order-by-default.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

ENUM_VERSION = 1


def _hash_edges(row: np.ndarray, col: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(row, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(col, dtype=np.int64).tobytes())
    return h.hexdigest()[:16]


def _canonical_perm(row: np.ndarray, col: np.ndarray) -> np.ndarray:
    """perm such that (row, col)[perm] is row-major sorted — the
    order-independent canonical enumeration of the pattern."""
    return np.lexsort((col, row))


def enumeration_meta(env) -> dict:
    """Enumeration descriptor of a live env (SpaiEnv or SpaiDiaEnv).

    ``enum_hash`` fingerprints the actual (order-sensitive) enumeration;
    ``canonical_hash`` fingerprints the edge SET (order-free) — remap is
    legal iff canonical matches while enum differs.  ``to_canonical`` is
    the permutation p with ``edges[p] == canonical edges`` (returned as an
    array, stored as .npy next to enum.json)."""
    from ..env import spai_dia

    if isinstance(env, spai_dia.SpaiDiaEnv):
        edges = spai_dia.edge_coo(env)
        order = "dia"
    else:
        edges = env.seed
        order = ("window" if (env.rb is not None
                              and env.rb.edge_perm is not None) else "sorted")
    row = np.asarray(edges.row)
    col = np.asarray(edges.col)
    p = _canonical_perm(row, col)
    return {
        "enum_version": ENUM_VERSION,
        "order": order,
        "num_edges": int(row.shape[0]),
        "enum_hash": _hash_edges(row, col),
        "canonical_hash": _hash_edges(row[p], col[p]),
        "to_canonical": p,
    }


def save_enum_meta(out_dir: str, env) -> None:
    base = Path(out_dir).absolute() / "checkpoint"
    base.mkdir(parents=True, exist_ok=True)
    meta = enumeration_meta(env)
    np.save(base / "enum_perm.npy", meta.pop("to_canonical"))
    (base / "enum.json").write_text(json.dumps(meta, indent=2))


def load_enum_meta(run_dir: str) -> Optional[dict]:
    base = Path(run_dir).absolute() / "checkpoint"
    f = base / "enum.json"
    if not f.exists():
        return None
    meta = json.loads(f.read_text())
    perm = base / "enum_perm.npy"
    meta["to_canonical"] = np.load(perm) if perm.exists() else None
    return meta


def _permute_head(arr: jnp.ndarray, o_idx: np.ndarray, axis: int):
    """Permute the first ``len(o_idx)`` action slots of an id-indexed axis
    (terminal slot and any padding beyond stay in place):
    ``new[j] = old[o_idx[j]]``."""
    n = o_idx.shape[0]
    idx = np.arange(arr.shape[axis])
    idx[:n] = o_idx
    return jnp.take(arr, jnp.asarray(idx), axis=axis)


def remap_params(params, o_idx: np.ndarray, backward: str):
    """Return params with every action-id-indexed slice permuted so that
    new action ``j`` reads the weights old action ``o_idx[j]`` had.

    Exact for ``backward in ("linear", "uniform")``.  Raises for ``lstm``
    (ids are scalar inputs there — not permutable)."""
    if backward == "lstm":
        raise ValueError(
            "cannot remap an LSTM-backward checkpoint across edge "
            "enumerations: the reference-parity LSTM consumes raw action "
            "ids as numeric inputs (models/policies.py "
            "backward_policy_logprobs).  Re-validate with the enumeration "
            "the run was trained with.")
    fwd = params.forward._replace(
        fc_w=_permute_head(params.forward.fc_w, o_idx, axis=1),
        fc_b=_permute_head(params.forward.fc_b, o_idx, axis=0),
    )
    bwd = params.backward
    if backward == "linear" and bwd is not None:
        bwd = bwd._replace(
            emb_g=_permute_head(bwd.emb_g, o_idx, axis=0),
            emb_v=_permute_head(bwd.emb_v, o_idx, axis=0),
        )
    flow = params.flow
    if flow is not None:
        flow = flow._replace(
            edge_d=_permute_head(flow.edge_d, o_idx, axis=0))
    return params._replace(forward=fwd, backward=bwd, flow=flow)


def remap_actions(actions: jnp.ndarray, o_idx: np.ndarray,
                  num_edges: int) -> jnp.ndarray:
    """Remap an int action array (−1-padded, terminal id = num_edges) from
    the OLD enumeration to the new one: ``new_id = inv(o_idx)[old_id]``."""
    lut = np.empty(num_edges + 1, np.int32)
    lut[o_idx] = np.arange(num_edges, dtype=np.int32)
    lut[num_edges] = num_edges                       # terminal id fixed
    valid = actions >= 0
    safe = jnp.where(valid, actions, 0)
    return jnp.where(valid, jnp.asarray(lut)[safe], actions)


def reconcile(run_dir: str, env, state, backward: str, opt=None,
              strict_missing: bool = False):
    """Verify (or repair) a restored TrainState against the CURRENT env's
    enumeration.  Returns (state, remapped: bool).

    * identical enumeration → no-op;
    * same edge set, different order → permute the id-indexed params (and
      replay-buffer actions); Adam moments / LR state are re-initialized
      when ``opt`` is given (a documented reset — like the sharded-sampler
      transform), since moment tensors would otherwise be misaligned;
    * different edge set (or an un-remappable lstm backward) → SystemExit
      with a loud message;
    * missing enum.json (pre-versioning checkpoint) → warn and trust the
      caller's flags unless ``strict_missing``.
    """
    cur = enumeration_meta(env)
    saved = load_enum_meta(run_dir)
    if saved is None:
        import warnings

        msg = (f"checkpoint {run_dir} has no enumeration stamp "
               "(pre-versioning run): ensure --rowblock-order / env format "
               "match the training run")
        if strict_missing:
            raise SystemExit(msg)
        warnings.warn(msg, stacklevel=2)
        return state, False
    if saved["enum_hash"] == cur["enum_hash"]:
        return state, False
    if saved["canonical_hash"] != cur["canonical_hash"]:
        raise SystemExit(
            f"checkpoint {run_dir} was trained on a DIFFERENT edge set "
            f"(saved canonical {saved['canonical_hash']}, current "
            f"{cur['canonical_hash']}): matrix / seed-method / "
            "rowblock build params do not match the training run.")
    if saved.get("to_canonical") is None:
        raise SystemExit(
            f"checkpoint {run_dir}: enumeration order differs "
            f"({saved['order']} → {cur['order']}) and enum_perm.npy is "
            "missing — cannot remap.")
    # new action j's edge sits at canonical rank r = argsort-position;
    # old id of that edge = saved_perm[rank_of_canonical].  Using
    # edges[p] == canonical: old_of_canonical[k] = saved_to_canonical[k]
    # inverted... both perms map enum→canonical positions:
    #   canonical edge k == old edge saved_p[k] == new edge cur_p[k]
    # so  o_idx[cur_p[k]] = saved_p[k].
    saved_p = np.asarray(saved["to_canonical"])
    cur_p = np.asarray(cur["to_canonical"])
    o_idx = np.empty_like(saved_p)
    o_idx[cur_p] = saved_p
    new_params = remap_params(state.params, o_idx, backward)
    new_replay = state.replay
    if new_replay is not None:
        new_replay = new_replay._replace(
            actions=remap_actions(new_replay.actions, o_idx,
                                  cur["num_edges"]))
    opt_state = state.opt_state
    if opt is not None:
        opt_state = opt.init(new_params)
    print(f"enumeration remap: checkpoint order {saved['order']!r} → "
          f"current {cur['order']!r} ({cur['num_edges']} actions); "
          "optimizer state re-initialized")
    return state._replace(params=new_params, replay=new_replay,
                          opt_state=opt_state), True
