"""Jit-compiled training loop for the SPAI GFlowNet.

Mirrors the reference epoch loop (GFlowNet100.py:278-323): sample a batch
of trajectories, TB loss, NaN/Inf guard, ReduceLROnPlateau, Adam step — but
the whole step (rollout → reward → loss → grads → update) is one compiled
XLA program.  Metrics land in the reference's CSV schema plus a JSONL
stream; checkpoints go through orbax (capability absent in the reference —
SURVEY.md §5 "Checkpoint / resume").
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env import ilu, spai
from ..gfn import gflownet as gfn
from ..gfn.replay import ReplayBuffer, replay_init, replay_sample, replay_update
from ..models import policies as pol
from ..sparse import gallery, read_mtx
from ..sparse.types import COO
from .config import TrainConfig


class TrainState(NamedTuple):
    params: gfn.GFlowNetParams
    opt_state: optax.OptState
    key: jax.Array
    epoch: jax.Array
    replay: Optional["ReplayBuffer"] = None   # top-k buffer (replay_size > 0)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam + plateau LR decay (reference GFlowNet100.py:266-267).

    The reference steps ``ReduceLROnPlateau`` on the raw per-epoch stochastic
    loss, which on a noisy TB objective collapses the LR to ~0 within tens of
    epochs (measured: α/log Z freeze by epoch 40 on LF10).  We therefore
    (a) average ``patience`` epochs before comparing (``accumulation_size``),
    (b) add an equal cooldown, and (c) floor the decay at 5% of the base LR.
    Set ``plateau_patience=0`` to disable the schedule entirely.
    """
    if cfg.plateau_patience <= 0:
        return optax.adam(cfg.lr)
    return optax.chain(
        optax.adam(cfg.lr),
        optax.contrib.reduce_on_plateau(
            factor=cfg.plateau_factor,
            patience=cfg.plateau_patience,
            cooldown=cfg.plateau_patience,
            accumulation_size=max(1, cfg.plateau_patience),
            min_scale=0.05,
        ),
    )


def load_matrix(cfg: TrainConfig) -> COO:
    try:
        return gallery.get(cfg.matrix)   # fixed names + poisson<k>/convdiff<n>
    except KeyError:
        pass
    from pathlib import Path

    if not Path(cfg.matrix).exists():
        raise FileNotFoundError(
            f"matrix {cfg.matrix!r}: not a gallery name "
            f"({', '.join(sorted(gallery.GALLERY))}, poisson<k>, convdiff<n>) "
            f"and no such .mtx file"
        )
    return read_mtx(cfg.matrix)


def setup(cfg: TrainConfig):
    """Host-side setup: matrix → seed pattern → env/graph/params/opt."""
    dtype = jnp.dtype(cfg.dtype)
    a = load_matrix(cfg)
    a = COO(row=a.row, col=a.col, data=a.data.astype(dtype), shape=a.shape)
    seed = ilu.seed_pattern(a, method=cfg.seed_method, dtype=dtype,
                            **({"k": cfg.seed_k}
                               if cfg.seed_method == "spai" else {}))

    from ..env import spai_dia
    from ..ops.rcm import n_diagonals

    fmt = cfg.env_format
    if fmt == "auto":
        # banded problems with fully-dense diagonals (no phantom slots — see
        # spai_dia.has_phantom_slots) take the gather-free DIA path; big
        # unstructured seeds take the rowblock dense-bucket MXU path
        # (pair-plan gathers scalarize on TPU); every backend composes with
        # the dp/rows mesh step (parallel.dp residual providers)
        fmt = "coo"
        if (not cfg.reference_baseline
                and n_diagonals(seed) <= cfg.dia_max_diags
                and n_diagonals(a) <= cfg.dia_max_diags):
            from ..ops.dia import coo_to_dia
            if spai_dia.has_phantom_slots(coo_to_dia(seed)) == 0:
                fmt = "dia"
        if fmt == "coo" and seed.nnz >= cfg.rowblock_min_nnz:
            fmt = "rowblock"
    def _graph(edges):
        # the policy graph switches to the node-tile Pallas segment
        # substrate at scale (edge ids don't matter to the GAT — only the
        # fc action head maps to action ids, and it is edge-order-free)
        if edges.nnz >= cfg.gat_tiled_min_edges:
            bstep = cfg.gat_bucket_step or None
            if bstep and cfg.sampler == "sharded":
                # the sharded sampler's forward consumes the uniform tile
                # layout only — at rows > 1 shard_tiled_graph would discard
                # buckets (ADVICE r4), and at rows == 1 the graph travels
                # as a shard_map ARGUMENT, so bucket SegTiles would reach
                # the fused kernel's static args as tracers and fail the
                # jit trace.  Skip the build for this sampler entirely.
                print("gat buckets: disabled under the sharded sampler "
                      "(uniform tile layout)", flush=True)
                bstep = None
            return pol.tiled_graph_from_seed(edges, bucket_step=bstep)
        return pol.graph_from_seed(edges)

    if fmt == "dia":
        env = spai_dia.make_dia_env(seed, a, baseline=cfg.reward_baseline)
        # edge/action ids follow the DIA enumeration → graph must too
        graph = _graph(spai_dia.edge_coo(env))
    else:
        env = spai.make_env(
            seed, original=None if cfg.reference_baseline else a,
            reward_path="rowblock" if fmt == "rowblock" else "pair",
            rowblock_dtype=jnp.bfloat16 if cfg.rowblock_bf16 else None,
            baseline=cfg.reward_baseline,
            rowblock_layout=cfg.rowblock_layout,
            rowblock_class_step=cfg.rowblock_class_step,
            rowblock_compress=cfg.rowblock_compress,
            rowblock_order=cfg.rowblock_order)
        # env.seed, not the local seed: window-order rowblock plans define
        # their own edge enumeration and the graph/action ids must match
        seed = env.seed
        graph = _graph(env.seed)
    # the trajectory cap applies to the DENSE sampler via the model config
    # (rollout.gumbel_topk_rollout t_cap); the sharded sampler takes it as
    # its own static argument instead (parallel.sampler)
    dense_cap = cfg.t_cap if (cfg.sampler == "dense" and cfg.t_cap > 0) else 0
    mcfg = gfn.GFlowNetConfig(
        hidden_dim=cfg.hidden_dim, heads=cfg.heads,
        num_actions=env.num_actions, loss=cfg.loss,
        temperature=cfg.temperature, alpha_fixed=cfg.alpha_fixed,
        subtb_lambda=cfg.subtb_lambda, backward=cfg.backward,
        reward_beta=cfg.reward_beta,
        terminal_bias=cfg.terminal_bias,
        edge_feats=cfg.edge_feats,
        t_cap=min(dense_cap, env.num_actions),
    )
    params = gfn.init_params(jax.random.PRNGKey(cfg.prng_seed), mcfg, dtype=dtype)
    opt = make_optimizer(cfg)
    # replay template width follows cfg.t_cap for BOTH samplers: the
    # sharded adapter re-inits its buffer at the ladder cap (= cfg.t_cap)
    # anyway, and a num_actions-wide template breaks dense→sharded
    # checkpoint resume (orbax restores by stored shape)
    traj_w = (min(cfg.t_cap, env.num_actions) if cfg.t_cap > 0 else 0) \
        or env.num_actions
    state = TrainState(
        params=params,
        opt_state=opt.init(params),
        key=jax.random.PRNGKey(cfg.prng_seed + 1),
        epoch=jnp.zeros((), jnp.int32),
        replay=(replay_init(cfg.replay_size, traj_w, dtype)
                if cfg.replay_size > 0 else None),
    )
    return a, seed, env, graph, mcfg, opt, state


def make_train_step(cfg: TrainConfig, env, graph, mcfg, opt):
    """One fully-jitted epoch: rollout + loss + guard + update.

    ``env`` travels as a jit ARGUMENT (its value/plan arrays are pytree
    leaves), never as closure constants — at 1M-nnz rowblock scale the
    G blocks are O(100 MB) and closure constants ship in the remote-compile
    payload (CLAUDE.md HTTP-413 rule)."""

    use_replay = cfg.replay_size > 0

    def step(state: TrainState, env):
        key, sub, rkey = jax.random.split(state.key, 3)
        replay_arg = None
        if use_replay:
            r_actions, _, r_valid = replay_sample(
                state.replay, rkey, cfg.replay_samples,
                prioritized=cfg.replay_prioritized)
            replay_arg = (r_actions, r_valid)
        (loss, aux), grads = jax.value_and_grad(gfn.loss_fn, has_aux=True)(
            state.params, env, graph, mcfg, sub, cfg.batch_size,
            replay=replay_arg,
        )
        # NaN/Inf guard — reference skips the epoch (GFlowNet100.py:307-309);
        # here bad steps contribute a zero update but still advance LR state.
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = opt.update(
            grads, state.opt_state, state.params,
            value=jnp.where(good, loss, jnp.inf),
        )
        params = optax.apply_updates(state.params, updates)
        new_replay = state.replay
        if use_replay:
            new_replay = replay_update(
                state.replay, aux["actions"], aux["rewards"])
        new_state = TrainState(
            params=params, opt_state=opt_state, key=key,
            epoch=state.epoch + 1, replay=new_replay,
        )
        metrics = {
            "loss": loss,
            "reward_mean": jnp.mean(aux["rewards"]),
            "reward_max": jnp.max(aux["rewards"]),
            "alpha": aux["alpha"],
            "log_z": params.log_z,
            "mean_len": jnp.mean(aux["lengths"].astype(jnp.float32)),
            "lengths": aux["lengths"],
            "rewards": aux["rewards"],
            "skipped": ~good,
        }
        return new_state, metrics

    jitted = jax.jit(step, donate_argnums=(0,))
    return lambda state: jitted(state, env)


def _make_dp_step_adapter(cfg: TrainConfig, env, graph, mcfg, opt):
    """Wrap the mesh-parallel step in the single-device step's interface."""
    from ..parallel import make_dp_train_step, make_mesh

    mesh = make_mesh(dp=cfg.dp_devices, rows=cfg.rows_devices)
    use_replay = cfg.replay_size > 0
    dp_step, _ = make_dp_train_step(
        mesh, env, graph, mcfg, opt, batch_size=cfg.batch_size,
        replay_samples=cfg.replay_samples if use_replay else 0,
    )

    def step(state: TrainState):
        key, rkey = jax.random.split(state.key)
        new_replay = state.replay
        if use_replay:
            r_actions, _, r_valid = replay_sample(
                state.replay, rkey, cfg.replay_samples,
                prioritized=cfg.replay_prioritized)
            params, opt_state, loss, rewards, actions = dp_step(
                state.params, state.opt_state, state.key, r_actions, r_valid
            )
            new_replay = replay_update(state.replay, actions, rewards)
        else:
            params, opt_state, loss, rewards = dp_step(
                state.params, state.opt_state, state.key
            )
        new_state = TrainState(
            params=params, opt_state=opt_state, key=key,
            epoch=state.epoch + 1, replay=new_replay,
        )
        metrics = {
            "loss": loss,
            "reward_mean": jnp.mean(rewards),
            "reward_max": jnp.max(rewards),
            # report the EFFECTIVE reward-mix α: a fixed α never reads the
            # learned logit (gfn.gflownet loss_fn), so sigmoid(alpha) would
            # log a constant 0.5 that the reward didn't use
            "alpha": (jnp.asarray(mcfg.alpha_fixed, jnp.float32)
                      if mcfg.alpha_fixed >= 0
                      else jax.nn.sigmoid(params.forward.alpha)),
            "log_z": params.log_z,
            "mean_len": jnp.zeros(()),
            "lengths": jnp.zeros_like(rewards, dtype=jnp.int32),
            "rewards": rewards,
            "skipped": ~jnp.isfinite(loss),
        }
        return new_state, metrics

    return step


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(1, x)))))


class CapLadder:
    """Adaptive t_cap schedule (decision logic only; the adapter owns the
    recompiles).  ``observe(lengths, valid)`` returns the new cap when it
    changes, else None:

    * SHRINK once ≥95% of rollouts have terminated inside the current cap
      for ``window`` straight epochs and ``next_pow2(margin ·
      max-window-P95)`` sits strictly below it;
    * GROW back ×2 (never past the starting cap) when the termination
      rate collapses at a shrunken cap — window-mean valid < 50% — so an
      over-eager shrink can't strand training without a reward anchor
      (the config.py t_cap_auto contract).

    History resets after any change."""

    def __init__(self, cap: int, cap_min: int, margin: float, window: int):
        self.cap = cap
        self.cap0 = cap
        self.cap_min = cap_min
        self.margin = margin
        self.window = window
        self._p95: list = []
        self._term: list = []

    def observe(self, lengths, valid):
        self._p95.append(float(np.percentile(np.asarray(lengths), 95)))
        self._term.append(float(np.mean(np.asarray(valid))))
        if len(self._p95) < self.window:
            return None
        self._p95 = self._p95[-self.window:]
        self._term = self._term[-self.window:]
        term_mean = float(np.mean(self._term))
        if term_mean < 0.5 and self.cap < self.cap0:
            self.cap = min(self.cap0, 2 * self.cap)
            self._p95, self._term = [], []
            return self.cap
        if min(self._term) < 0.95:
            return None
        want = max(self.cap_min,
                   _next_pow2(int(self.margin * max(self._p95))))
        if want >= self.cap:
            return None
        self.cap = want
        self._p95, self._term = [], []
        return want


def _make_sharded_sampler_adapter(cfg: TrainConfig, env, graph, mcfg, opt):
    """Wrap the sharded-sampler step (parallel.sampler) in the
    single-device step's interface.  The forward head is column-sharded
    over ``rows`` on entry (``transform``), which also re-initializes the
    optimizer state on the sharded params — resuming a dense checkpoint
    therefore resets Adam moments (params themselves carry over).  With
    replay on, ``transform`` likewise resets the buffer to the sampler's
    ``t_cap`` trajectory width.

    ``cfg.t_cap_auto`` arms the adaptive cap LADDER (VERDICT r3 item 3):
    once ≥95% of rollouts terminate inside the cap for ``t_cap_window``
    straight epochs, the cap shrinks to
    ``next_pow2(t_cap_margin · max-window-P95(len))`` (floored at
    ``t_cap_min``) and the step is recompiled at the new static width —
    each ladder level compiles once (the persistent cache carries it
    across runs).  Early training stays at the starting cap, where
    ``loss=subtb`` trains truncated rollouts as partial trajectories (no
    zero-weighted batches at any cap — parallel.sampler docstring)."""
    from ..gfn.replay import replay_resize
    from ..parallel import make_mesh
    from ..parallel.sampler import make_sharded_sampler_train_step

    mesh = make_mesh(dp=cfg.dp_devices, rows=cfg.rows_devices)
    t_cap0 = cfg.t_cap or mcfg.num_actions
    use_replay = cfg.replay_size > 0

    def build(cap: int):
        return make_sharded_sampler_train_step(
            mesh, env, graph, mcfg, opt, batch_size=cfg.batch_size,
            t_cap=cap, replay_samples=cfg.replay_samples if use_replay else 0)

    sh_step, shard_fwd, _ = build(t_cap0)
    ladder = CapLadder(t_cap0, cfg.t_cap_min, cfg.t_cap_margin,
                       cfg.t_cap_window)
    current = {"step": sh_step}

    def transform(state: TrainState) -> TrainState:
        # restored checkpoints arrive COMMITTED to a single device; mixing
        # them with the mesh-sharded head in one jit is an error — place
        # everything replicated on the mesh first (no-op for fresh states)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state)
        params = shard_fwd(state.params)
        replay = state.replay
        if use_replay and replay is not None:
            # PRESERVE the buffer (restored checkpoints and demonstration
            # seeds both arrive through here); resize, don't re-init.  A
            # narrower-than-t_cap0 restored buffer means the prior run's
            # cap ladder had shrunk — adopt that cap so the resumed step
            # compiles where the run left off (VERDICT r4 item 1).
            stored_w = replay.actions.shape[1]
            if cfg.t_cap_auto and ladder.cap_min <= stored_w < ladder.cap:
                print(f"t_cap ladder resume: adopting stored cap {stored_w}",
                      flush=True)
                ladder.cap = stored_w
                current["step"], _, _ = build(stored_w)
            if stored_w != ladder.cap:
                replay = replay_resize(replay, ladder.cap)
        elif use_replay:
            replay = replay_init(cfg.replay_size, ladder.cap,
                                 jnp.dtype(cfg.dtype))
        return state._replace(params=params, opt_state=opt.init(params),
                              replay=replay)

    def _maybe_shrink(state, lengths, valid):
        old = ladder.cap
        want = ladder.observe(lengths, valid)
        if want is None:
            return state
        print(f"t_cap ladder: {old} -> {want}; recompiling step", flush=True)
        current["step"], _, _ = build(want)
        if state.replay is not None:
            state = state._replace(replay=replay_resize(state.replay, want))
        return state

    def step(state: TrainState):
        key, rkey = jax.random.split(state.key)
        new_replay = state.replay
        if use_replay:
            r_actions, _, r_valid = replay_sample(
                state.replay, rkey, cfg.replay_samples,
                prioritized=cfg.replay_prioritized)
            params, opt_state, loss, rewards, valid, lengths, actions = (
                current["step"](state.params, state.opt_state, state.key,
                                r_actions, r_valid))
            # invalid rollouts (terminal missed the prefix) never enter the
            # buffer — their reward scored a truncated pattern
            new_replay = replay_update(
                state.replay, actions,
                jnp.where(valid, rewards, -jnp.inf))
        else:
            params, opt_state, loss, rewards, valid, lengths = (
                current["step"](state.params, state.opt_state, state.key))
        new_state = TrainState(
            params=params, opt_state=opt_state, key=key,
            epoch=state.epoch + 1, replay=new_replay,
        )
        metrics = {
            "loss": loss,
            "reward_mean": jnp.mean(rewards),
            "reward_max": jnp.max(rewards),
            # report the EFFECTIVE reward-mix α: a fixed α never reads the
            # learned logit (gfn.gflownet loss_fn), so sigmoid(alpha) would
            # log a constant 0.5 that the reward didn't use
            "alpha": (jnp.asarray(mcfg.alpha_fixed, jnp.float32)
                      if mcfg.alpha_fixed >= 0
                      else jax.nn.sigmoid(params.forward.alpha)),
            "log_z": params.log_z,
            "mean_len": jnp.mean(lengths.astype(jnp.float32)),
            "lengths": lengths,
            "rewards": rewards,
            "skipped": ~jnp.isfinite(loss),
            "valid_frac": jnp.mean(valid.astype(jnp.float32)),
            "t_cap": ladder.cap,
        }
        if cfg.t_cap_auto:
            new_state = _maybe_shrink(new_state, lengths, valid)
        return new_state, metrics

    return step, transform


class MetricsWriter:
    """CSV schema parity with the reference (GFlowNet100.py:226-255:
    ``training_log.csv`` = epoch,num_actions,loss,reward and
    ``detailed_training_log.csv`` adds per-sample rows) + a JSONL stream."""

    def __init__(self, out_dir: str, resume: bool = False):
        self.dir = Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        # append on resume so prior-epoch metrics (and the trend report fed
        # from them) survive a checkpoint restart
        fresh = not (resume and (self.dir / "training_log.csv").exists())
        mode = "w" if fresh else "a"
        self.summary = open(self.dir / "training_log.csv", mode)
        self.detail = open(self.dir / "detailed_training_log.csv", mode)
        self.jsonl = open(self.dir / "metrics.jsonl", mode)
        if fresh:
            self.summary.write("epoch,num_actions,loss,reward\n")
            self.detail.write("epoch,sample_number,num_actions,loss,reward\n")

    def write(self, epoch: int, m: dict):
        loss = float(m["loss"])
        rewards = np.asarray(m["rewards"])
        lengths = np.asarray(m["lengths"])
        self.summary.write(
            f"{epoch},{int(lengths.max())},{loss},{rewards.mean()}\n"
        )
        for i, (r, l) in enumerate(zip(rewards, lengths)):
            self.detail.write(f"{epoch},{i + 1},{int(l)},{loss},{float(r)}\n")
        rec = {
            "epoch": epoch,
            "loss": loss,
            "reward_mean": float(m["reward_mean"]),
            "reward_max": float(m["reward_max"]),
            "alpha": float(m["alpha"]),
            "log_z": float(m["log_z"]),
            "mean_len": float(m["mean_len"]),
            "skipped": bool(m["skipped"]),
            "valid_frac": float(m.get("valid_frac", 1.0)),
            "wall_s": float(m.get("wall_s", 0.0)),
            "time": time.time(),
        }
        if "t_cap" in m:
            rec["t_cap"] = int(m["t_cap"])
        self.jsonl.write(json.dumps(rec) + "\n")

    def flush(self):
        for f in (self.summary, self.detail, self.jsonl):
            f.flush()

    def close(self):
        for f in (self.summary, self.detail, self.jsonl):
            f.close()


def save_checkpoint(out_dir: str, state: TrainState, env=None):
    import orbax.checkpoint as ocp

    path = Path(out_dir).absolute() / "checkpoint"
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path / f"epoch_{int(state.epoch)}", state, force=True)
    if env is not None:
        # stamp the edge enumeration (order + hash + canonical perm) so a
        # restore under a different enumeration remaps or refuses instead
        # of silently mis-indexing the action heads (train.enums)
        from .enums import save_enum_meta

        save_enum_meta(out_dir, env)


def _conform_to_stored(template, md):
    """Rebuild ``template`` so every array leaf matches the STORED
    checkpoint's shape/dtype (orbax restores strictly by shape).

    Metadata mirrors the saved pytree with NamedTuples as field-keyed
    dicts and tuples/lists as lists; array leaves carry shape/dtype.
    Shape drift is legitimate state, not corruption: replay buffers are
    [K, t_cap]-wide (cap ladder / --t-cap changes — the
    runs/c4id_auto_orsirr450 crash, VERDICT r4 item 1) and a sharded run
    stores the COLUMN-PADDED action head (parallel.tp.pad_head rounds A
    up to the rows count).  Callers re-conform restored leaves to the
    live run (replay_resize; pad_head is idempotent)."""
    if md is None or template is None:
        return template
    if hasattr(md, "shape") and not isinstance(md, dict):
        if (hasattr(template, "shape")
                and tuple(template.shape) != tuple(md.shape)):
            return jnp.zeros(tuple(md.shape), md.dtype)
        return template
    if isinstance(md, dict):
        if hasattr(template, "_fields"):
            return type(template)(**{
                f: _conform_to_stored(getattr(template, f), md.get(f))
                for f in template._fields})
        if isinstance(template, dict):
            return {k: _conform_to_stored(v, md.get(k))
                    for k, v in template.items()}
        return template
    if isinstance(md, (list, tuple)) and isinstance(template, (list, tuple)) \
            and len(md) == len(template):
        out = [_conform_to_stored(t, m) for t, m in zip(template, md)]
        return out if isinstance(template, list) else tuple(out)
    return template


def restore_checkpoint(out_dir: str, template: TrainState) -> Optional[TrainState]:
    """Restore the latest checkpoint, conforming the template to the
    STORED array shapes first (see ``_conform_to_stored``)."""
    import orbax.checkpoint as ocp

    base = Path(out_dir).absolute() / "checkpoint"
    if not base.exists():
        return None
    steps = sorted(base.glob("epoch_*"), key=lambda p: int(p.name.split("_")[1]))
    if not steps:
        return None
    with ocp.StandardCheckpointer() as ckpt:
        try:
            md = ckpt.metadata(steps[-1]).item_metadata.tree
        except Exception:
            md = None
        if md is not None:
            template = _conform_to_stored(template, md)
        return ckpt.restore(steps[-1], template)


def _magnitude_demos(env, fracs, T: int) -> np.ndarray:
    """[N, T] −1-padded demonstration trajectories: for each fraction f,
    delete the f·nnz SMALLEST-|value| seed entries in magnitude order, then
    terminate.  The edge enumeration is the env's (action ids) — for DIA
    envs that is the (diag, row) order of ``spai_dia.edge_coo``, not the
    band storage layout."""
    from ..env import spai_dia

    if isinstance(env, spai_dia.SpaiDiaEnv):
        vals = np.asarray(spai_dia.edge_coo(env).data)
    else:
        vals = np.asarray(env.seed.data)
    order = np.argsort(np.abs(vals))
    terminal = env.num_edges
    acts = np.full((len(fracs), T), -1, np.int32)
    for i, f in enumerate(fracs):
        k = min(int(f * env.num_edges), T - 1)
        acts[i, :k] = order[:k]
        acts[i, k] = terminal
    return acts


def warmstart_on_demonstrations(env, graph, mcfg, state: TrainState, cfg,
                                opt) -> TrainState:
    """Supervised warm-start (cfg.warmstart_epochs > 0): before GFlowNet
    training, maximize the forward policy's log P_F of the magnitude-
    thinning demonstration trajectories (cfg.replay_seed_fracs) — plain
    cross-entropy on the sequential action choices, terminal step included.

    Why: on-policy exploration from a terminate-early local optimum cannot
    reach a selective deep-thinning reward optimum (measured on
    bcsstk03_like k=2 seeds: replay anchoring alone moves mean trajectory
    length 2 → ~13 in 3,000 epochs against an optimum at ~1,800 deletions).
    The warm-start snaps the policy onto the demonstration ridge — with
    --edge-feats that is essentially one weight (feat_w) plus the terminal
    logit — and GFlowNet training then refines AROUND it on reward, which
    is the standard demonstration-bootstrap for GFlowNets.  The optimizer
    state is re-initialized afterwards so Adam moments don't carry the
    warm-start geometry into the (different) TB/SubTB objective."""
    import optax as _optax

    from ..gfn.rollout import trajectory_logprobs

    fracs = [float(x) for x in str(cfg.replay_seed_fracs).split(",") if x]
    if not fracs or cfg.warmstart_epochs <= 0:
        return state
    kmax = max(min(int(f * env.num_edges), env.num_actions - 1)
               for f in fracs)
    demos_np = _magnitude_demos(env, fracs, kmax + 1)
    demos = jnp.asarray(demos_np)
    lengths = (demos_np >= 0).sum(-1)
    # Balance the cross-entropy: a depth-k demo has k deletion steps but
    # only ONE termination step, so an unweighted NLL teaches "delete
    # small entries" ~k× harder than "stop here" — measured on bcsstk03
    # k=2 seeds (k ≈ 1,800) the unweighted warm-start collapses the
    # policy into the delete-EVERYTHING basin.  Weighting the terminal
    # step by the mean deletion depth gives both signals equal gradient
    # mass.
    w_term = float(np.mean(lengths - 1))
    term_pos = jnp.asarray(lengths - 1)
    is_term = (jnp.arange(demos.shape[1])[None, :] == term_pos[:, None])
    wopt = _optax.adam(cfg.warmstart_lr)

    def nll(params):
        logits = pol.forward_policy_logits(
            params.forward, graph, mcfg.num_actions, mcfg.hidden_dim,
            mcfg.heads)
        lps = jax.vmap(lambda a: trajectory_logprobs(logits, a))(demos)
        del_nll = -jnp.mean(jnp.sum(jnp.where(is_term, 0.0, lps), -1))
        term_nll = -jnp.mean(jnp.sum(jnp.where(is_term, lps, 0.0), -1))
        return del_nll + w_term * term_nll, (del_nll, term_nll)

    @jax.jit
    def wstep(params, wstate):
        (loss, aux), grads = jax.value_and_grad(nll, has_aux=True)(params)
        updates, wstate = wopt.update(grads, wstate, params)
        return _optax.apply_updates(params, updates), wstate, loss, aux

    params = state.params
    wstate = wopt.init(params)
    for i in range(cfg.warmstart_epochs):
        params, wstate, loss, (dn, tn) = wstep(params, wstate)
        if i % max(1, cfg.warmstart_epochs // 10) == 0:
            print(f"warmstart {i}: NLL {float(loss):.2f} "
                  f"(delete {float(dn):.2f}, stop {float(tn):.3f})",
                  flush=True)
    print(f"warmstart done: NLL {float(loss):.2f} "
          f"(delete {float(dn):.2f}, stop {float(tn):.3f})", flush=True)
    return state._replace(params=params, opt_state=opt.init(params))


def seed_replay_with_magnitude_thinning(env, state: TrainState, cfg,
                                        alpha: float) -> TrainState:
    """Demonstration-seed the replay buffer (``cfg.replay_seed_fracs``):
    for each fraction f, inject the trajectory that deletes the f·nnz
    SMALLEST-|value| seed entries (magnitude order) then terminates, with
    its true reward.  Off-policy-valid: replayed trajectories are always
    re-scored under the current policy (gfn.replay module docstring), so
    demonstrations only anchor the top-k buffer — the standard fix when
    the reward optimum (a selective deep thinning) is unreachable by
    on-policy exploration from a terminate-early policy."""
    fracs = [float(x) for x in str(cfg.replay_seed_fracs).split(",") if x]
    if not fracs or state.replay is None:
        return state
    T = state.replay.actions.shape[1]
    demos = _magnitude_demos(env, fracs, T)
    replay = state.replay
    for f, acts in zip(fracs, demos):
        acts_j = jnp.asarray(acts[None, :])
        r = gfn._batched_rewards(env, acts_j, jnp.asarray(alpha))
        replay = replay_update(replay, acts_j, r)
        print(f"replay seed: magnitude-thin {f:.0%} "
              f"({int((acts >= 0).sum()) - 1} deletions) "
              f"reward {float(r[0]):.1f}", flush=True)
    return state._replace(replay=replay)


def train(cfg: TrainConfig, progress: bool = True):
    """Full training run; returns (final TrainState, history list).

    With ``cfg.dp_devices > 1`` the step runs data-parallel over a
    ``(dp, 1)`` mesh (see parallel.dp); otherwise single device.
    """
    a, seed, env, graph, mcfg, opt, state = setup(cfg)
    if cfg.replay_seed_fracs:
        state = seed_replay_with_magnitude_thinning(
            env, state, cfg,
            alpha=cfg.alpha_fixed if cfg.alpha_fixed >= 0 else 0.5)
        if cfg.warmstart_epochs > 0:
            state = warmstart_on_demonstrations(env, graph, mcfg, state,
                                                cfg, opt)
    if cfg.resume:
        tmpl_w = (state.replay.actions.shape[1]
                  if state.replay is not None else None)
        restored = restore_checkpoint(cfg.out_dir, state)
        if restored is not None:
            from .enums import reconcile

            state, _ = reconcile(cfg.out_dir, env, restored,
                                 backward=cfg.backward, opt=opt)
            # restore_checkpoint honors the STORED replay width; conform
            # non-sharded paths back to this run's cap here (the sharded
            # adapter's transform owns its own width / ladder adoption)
            if (cfg.sampler != "sharded" and state.replay is not None
                    and tmpl_w is not None
                    and state.replay.actions.shape[1] != tmpl_w):
                from ..gfn.replay import replay_resize as _rsz

                state = state._replace(replay=_rsz(state.replay, tmpl_w))
    if cfg.sampler == "sharded":
        step, transform = _make_sharded_sampler_adapter(
            cfg, env, graph, mcfg, opt)
        state = transform(state)
    elif cfg.dp_devices > 1 or cfg.rows_devices > 1:
        step = _make_dp_step_adapter(cfg, env, graph, mcfg, opt)
    else:
        step = make_train_step(cfg, env, graph, mcfg, opt)
    writer = MetricsWriter(cfg.out_dir, resume=cfg.resume)
    history = []
    start_epoch = int(state.epoch)
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        state, metrics = step(state)
        metrics = jax.device_get(metrics)
        metrics["wall_s"] = time.time() - t0
        writer.write(epoch, metrics)
        if progress and epoch % cfg.log_every == 0:
            writer.flush()
            print(
                f"epoch {epoch} loss {float(metrics['loss']):.4f} "
                f"reward {float(metrics['reward_mean']):.2f} "
                f"alpha {float(metrics['alpha']):.3f} "
                f"len {float(metrics['mean_len']):.1f}",
                flush=True,
            )
        history.append(float(metrics["loss"]))
        if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            save_checkpoint(cfg.out_dir, state, env=env)
    save_checkpoint(cfg.out_dir, state, env=env)
    writer.close()
    try:
        from ..utils.reporting import render_training_report

        render_training_report(cfg.out_dir)
    except Exception as e:  # reporting must never fail a run
        print(f"report generation skipped: {e}")
    return state, history
