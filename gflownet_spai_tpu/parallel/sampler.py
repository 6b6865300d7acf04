"""Sharded Gumbel-top-k sampler: rollouts at huge action spaces.

At nnz ≈ 10⁶ the action space makes two things expensive on one device:
the action-head matmul/params (parallel.tp shards those) and the full
[B, A] Gumbel sort of the rollout (SURVEY.md §7 hard part 3; reference
policy.py:30,63 materializes [A]-sized logits per step).  This module
shards the SORT as well:

1. each ``rows`` shard perturbs its logit slice with its own folded-key
   Gumbel noise and takes a local top-``t_cap`` (one O(A/R log) pass),
2. an ``all_gather`` of the R·t_cap candidates (tiny: t_cap ≪ A) merges
   into the global top-``t_cap`` — EXACTLY the first t_cap entries of the
   global perturbed descending order, because every shard contributed its
   own top t_cap,
3. the trajectory is the merged prefix up to the terminal action; per-step
   forward log-probs come from suffix sums over the prefix plus the
   (psum'd) tail mass — additions only, no cancellation.

Exactness: when the terminal action lands inside the merged prefix the
trajectory and its log-probs equal the replicated ``gumbel_topk_rollout``
with the concatenated per-shard noise BIT-FOR-BIT in distribution terms
(tested exactly by replaying the same per-shard noise); samples whose
terminal falls outside the prefix are flagged ``valid=False`` (weight-0 in
the loss) — set ``t_cap = num_actions`` for unconditional exactness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..gfn.rollout import Rollout
from ..models import policies as pol


class ShardedRollout(NamedTuple):
    rollout: Rollout       # actions/logprobs padded to T = t_cap
    valid: jax.Array       # bool[B] — terminal action inside the prefix
    logits_local: jax.Array  # [A_pad/R] this-shard logits (diagnostics)


def _padded_action_feats(graph, num_actions: int, a_pad: int):
    """[A_pad, F] action-feature rows matching the padded head width, or
    None when the graph carries no ``action_feats`` (models.policies:
    the value-aware logit channel reads static per-action features in
    action-id order — the same enumeration as the head's columns, so the
    column sharding of ``tp.shard_head`` slices both identically)."""
    feats = getattr(graph, "action_feats", None)
    if feats is None:
        return None
    feats = feats[:num_actions]
    return jnp.pad(feats, ((0, a_pad - feats.shape[0]), (0, 0)))


def sharded_rollout(mesh: Mesh, p: pol.ForwardPolicyParams, graph,
                    num_actions: int, hidden_dim: int, key,
                    batch_size: int, t_cap: int, heads: int = 4,
                    axis: str = "rows",
                    temperature: float = 1.0) -> ShardedRollout:
    """Rollout a batch with head matmul + Gumbel top-k sharded over
    ``axis``.  ``p`` must carry a column-sharded head (``tp.shard_head``).
    No device ever materializes a [B, A] tensor — peak per-device is
    [B, A/R] + [B, R·t_cap].

    ``temperature`` tempers the SAMPLING distribution only (the perturbed
    sort runs on ``logits/τ``); the returned per-step log-probs are always
    evaluated under the untempered policy — the same off-policy re-scoring
    semantics as the dense path (gfn.gflownet.sample), and it falls out for
    free here because the suffix normalizers never depended on how the
    prefix was ordered.

    When ``p.feat_w`` is not None and the graph carries ``action_feats``,
    the value-aware logit channel (``--edge-feats``) is added shard-locally:
    each device holds only its [A_pad/R, F] feature slice."""
    pooled = pol.forward_policy_pooled(p, graph, hidden_dim, heads)
    A_pad = p.fc_w.shape[1]
    R = mesh.shape[axis]
    a_loc = A_pad // R
    k_loc = min(t_cap, a_loc)
    terminal = num_actions - 1
    feats = _padded_action_feats(graph, num_actions, A_pad) \
        if p.feat_w is not None else None
    use_feats = feats is not None
    if not use_feats:
        feats = jnp.zeros((R, 1), pooled.dtype)
        feat_w = jnp.zeros((1,), pooled.dtype)
    else:
        feat_w = p.feat_w

    def local(pooled, w, b, feats, feat_w, key):
        j = jax.lax.axis_index(axis)
        l_loc = pooled @ w + b                                 # [a_loc]
        if use_feats:
            l_loc = l_loc + feats @ feat_w
        gids = j * a_loc + jnp.arange(a_loc, dtype=jnp.int32)
        l_loc = jnp.where(gids < num_actions, l_loc, -jnp.inf)
        g = jax.random.gumbel(jax.random.fold_in(key, j),
                              (batch_size, a_loc), l_loc.dtype)
        pert = l_loc[None, :] / temperature + g                # [B, a_loc]

        # total logit mass (for the tail term of the suffix normalizers)
        m = jax.lax.pmax(jnp.max(l_loc), axis)
        sumexp = jax.lax.psum(
            jnp.sum(jnp.where(gids < num_actions,
                              jnp.exp(l_loc - m), 0.0)), axis)

        pv, pi = jax.lax.top_k(pert, k_loc)                    # [B, k_loc]
        cand_l = l_loc[pi]
        cand_id = gids[pi]
        # merge: gather every shard's candidates (R·k_loc ≪ A)
        all_pv = jax.lax.all_gather(pv, axis)                  # [R, B, k]
        all_l = jax.lax.all_gather(cand_l, axis)
        all_id = jax.lax.all_gather(cand_id, axis)
        flat_pv = jnp.moveaxis(all_pv, 0, 1).reshape(batch_size, R * k_loc)
        flat_l = jnp.moveaxis(all_l, 0, 1).reshape(batch_size, R * k_loc)
        flat_id = jnp.moveaxis(all_id, 0, 1).reshape(batch_size, R * k_loc)
        top = min(t_cap, R * k_loc)
        _, sel = jax.lax.top_k(flat_pv, top)                   # [B, top]
        s_l = jnp.take_along_axis(flat_l, sel, axis=-1)
        s_id = jnp.take_along_axis(flat_id, sel, axis=-1)

        # suffix normalizers: prefix right-cumsum + tail mass (additions only)
        ex = jnp.exp(s_l - m)                                  # [B, top]
        tail = jnp.maximum(sumexp - jnp.sum(ex, axis=-1, keepdims=True), 0.0)
        suffix = jnp.flip(jnp.cumsum(jnp.flip(ex, -1), -1), -1) + tail
        lse = m + jnp.log(jnp.maximum(suffix, 1e-30))
        step_lp = s_l - lse                                    # [B, top]

        hit = s_id == terminal
        found = jnp.any(hit, axis=-1)
        kpos = jnp.argmax(hit, axis=-1)                        # [B]
        t_ids = jnp.arange(top, dtype=jnp.int32)[None, :]
        on_traj = (t_ids <= kpos[:, None]) & found[:, None]
        actions = jnp.where(on_traj, s_id, -1).astype(jnp.int32)
        fwd_lp = jnp.where(on_traj, step_lp, 0.0)
        lengths = jnp.where(found, kpos + 1, top).astype(jnp.int32)
        return actions, fwd_lp, lengths, found, l_loc

    actions, fwd_lp, lengths, valid, l_loc = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis, None), P(), P()),
        out_specs=(P(), P(), P(), P(), P(axis)),
        check_vma=False,
    )(pooled, p.fc_w, p.fc_b, feats, feat_w, key)
    return ShardedRollout(
        rollout=Rollout(actions=actions, fwd_logprobs=fwd_lp, lengths=lengths),
        valid=valid,
        logits_local=l_loc,
    )


def replicated_oracle_gumbels(key, num_actions: int, a_pad: int, n_shards: int,
                              batch_size: int, dtype=jnp.float32) -> jax.Array:
    """The exact noise the sharded sampler draws, assembled on one device
    ([B, A]) — the test oracle feeds this to ``gumbel_topk_rollout`` to get
    bit-exact parity with the distributed path."""
    a_loc = a_pad // n_shards
    parts = [
        jax.random.gumbel(jax.random.fold_in(key, j), (batch_size, a_loc),
                          dtype)
        for j in range(n_shards)
    ]
    return jnp.concatenate(parts, axis=1)[:, :num_actions]


def make_sharded_sampler_train_step(mesh: Mesh, env, graph, cfg, opt,
                                    batch_size: int, t_cap: int,
                                    axis: str = "rows",
                                    replay_samples: int = 0,
                                    partial_subtb: bool = True):
    """Train step whose ROLLOUT is sharded too: the action head, the Gumbel
    top-k sort, and the per-step forward log-probs all run over ``axis``
    without any device materializing [B, A] (SURVEY.md §7 hard part 3;
    VERDICT r1 #4).  The reward residual shards through the same providers
    as parallel.dp; the batch shards over ``dp``.

    Returns ``(step_fn, sharded_params_template, padded_env)``:
    ``step_fn(params, opt_state, key) -> (params, opt_state, loss, rewards,
    valid, lengths)``.  ``params.forward`` must carry the column-sharded head
    (``tp.shard_head`` — the returned template has it applied); the optax
    state inherits the shardings via XLA propagation, so the update outside
    the shard_map stays sharded.

    Loss: TB, vargrad, or SubTB(λ) with trajectories capped at ``t_cap``
    steps (the SubTB flow head indexes action ids on the replicated
    [b, t_cap] prefix, so it needs no extra sharding).
    Samples whose terminal action falls outside the merged prefix:

    * ``loss="subtb"`` with ``partial_subtb=True`` (default) — they train
      as PARTIAL trajectories: every sub-trajectory balance term inside
      the prefix is exact, with the learned flow (not the reward) at the
      truncation point (``gfn.loss.subtb_loss(terminated=...)``).  A
      t_cap ≪ A run therefore gets full-batch signal from epoch 0 — the
      round-3 foot-gun where short prefixes zero-weighted whole batches
      early in training is gone.  Their ``valid`` flag still reports
      False (termination-rate diagnostics; replay exclusion).
    * TB / vargrad (need complete trajectories) — weight-0 as before
      (``t_cap = num_actions`` ⇒ always exact).  The per-step
    normalizers use suffix sums over the differentiable prefix logits plus
    the psum'd tail mass — gradients flow through shard_map's collective
    transposes, so no manual grad reductions are needed.

    ``cfg.temperature != 1`` tempers the sampling sort only; the loss sees
    untempered log-probs (see ``sharded_rollout``).

    ``replay_samples > 0`` composes the top-k replay buffer (gfn.replay):
    the step takes two extra args ``(replay_actions [S, t_cap],
    replay_valid [S])`` (replicated) and additionally returns the fresh
    batch's actions (padded to ``t_cap``) for the buffer update.  Replayed
    trajectories are re-scored under the current sharded policy by
    all-gathering the [A_pad] logits vector once (O(A) per device — fine;
    it is the [B, A] rollout tensors this sampler exists to avoid) and
    running ``rollout.trajectory_logprobs`` replicated; their loss weight
    is ``valid/dp``, the same exactness trick as ``parallel.dp``.
    """
    import optax

    from ..env import spai
    from ..gfn import gflownet as gfn
    from ..gfn.loss import (log_reward, subtb_loss, trajectory_balance_loss,
                            vargrad_loss)
    from ..gfn.rollout import trajectory_logprobs
    from .dp import _make_residual_provider
    from .tp import shard_head

    dp = mesh.shape["dp"]
    R = mesh.shape[axis]
    partial = bool(partial_subtb) and cfg.loss == "subtb"
    if batch_size % dp:
        raise ValueError(f"batch {batch_size} not divisible by dp={dp}")
    b_local = batch_size // dp
    env, aux, aux_specs, res_fn = _make_residual_provider(env, R)
    opt = optax.with_extra_args_support(opt)

    # value-aware logit channel (--edge-feats): slice the static [A_pad, F]
    # action features over `axis` alongside the head columns (the action-id
    # enumeration IS the column order, so P(axis) shards both identically)
    a_pad_total = -(-cfg.num_actions // R) * R
    use_feats = bool(getattr(cfg, "edge_feats", False))
    feats = _padded_action_feats(graph, cfg.num_actions, a_pad_total) \
        if use_feats else None
    if use_feats and feats is None:
        raise ValueError("cfg.edge_feats=True but the graph carries no "
                         "action_feats (models.policies.*_from_seed builds "
                         "them)")
    if feats is None:
        feats = jnp.zeros((R, 1), jnp.float32)

    # tile-shard the GAT forward over `axis` when the graph is tiled: at
    # 1M+ edges the replicated policy forward dominates the sharded step
    # (parallel.gat; VERDICT r3 item 6).  Non-tiled graphs (small runs)
    # stay replicated.
    gat_meta = None
    if R > 1 and isinstance(graph, pol.TiledGraphInputs) \
            and graph.srcwin is not None:
        from .gat import shard_tiled_graph

        graph, gat_meta = shard_tiled_graph(graph, R)

    num_actions = cfg.num_actions
    terminal = num_actions - 1
    num_edges = env.num_edges
    ncols = env.seed.shape[1]
    baseline_residual = env.baseline_residual
    baseline_flops = env.baseline_flops

    def _shard_fwd(params):
        return params._replace(forward=shard_head(mesh, params.forward, axis))

    def local(params, key, aux, graph_arg, feats_loc, r_actions, r_valid):
        j = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        if gat_meta is not None:
            from .gat import sharded_policy_pooled

            pooled = sharded_policy_pooled(
                params.forward, graph_arg, gat_meta,
                cfg.hidden_dim, cfg.heads, axis=axis)
        else:
            pooled = pol.forward_policy_pooled(params.forward, graph_arg,
                                               cfg.hidden_dim, cfg.heads)
        a_loc = params.forward.fc_w.shape[1]           # local slice width
        l_loc = pooled @ params.forward.fc_w + params.forward.fc_b
        if use_feats:
            l_loc = l_loc + feats_loc @ params.forward.feat_w
        gids = j * a_loc + jnp.arange(a_loc, dtype=jnp.int32)
        live = gids < num_actions
        l_loc = jnp.where(live, l_loc, -jnp.inf)

        # ---- sampling (gradient-free; tempered sort, untempered scoring) --
        g = jax.random.gumbel(jax.random.fold_in(key, j),
                              (b_local, a_loc), pooled.dtype)
        pert = jax.lax.stop_gradient(l_loc)[None, :] / cfg.temperature + g
        k_loc = min(t_cap, a_loc)
        pv, pi = jax.lax.top_k(pert, k_loc)
        cand_id = gids[pi]
        all_pv = jax.lax.all_gather(pv, axis)
        all_id = jax.lax.all_gather(cand_id, axis)
        flat_pv = jnp.moveaxis(all_pv, 0, 1).reshape(b_local, R * k_loc)
        flat_id = jnp.moveaxis(all_id, 0, 1).reshape(b_local, R * k_loc)
        top = min(t_cap, R * k_loc)
        _, sel = jax.lax.top_k(flat_pv, top)
        s_id = jnp.take_along_axis(flat_id, sel, axis=-1)      # [b, top]

        # ---- differentiable per-step log-probs ----
        lid = s_id - j * a_loc
        mine = (lid >= 0) & (lid < a_loc)
        l_mine = jnp.where(mine, l_loc[jnp.clip(lid, 0, a_loc - 1)], 0.0)
        l_full = jax.lax.psum(jnp.where(mine, l_mine, 0.0), axis)  # [b, top]
        # pmax has no AD rule — take the global max via a (differentiable)
        # all_gather of the shard maxima, on stop-gradient values (m is an
        # lse shift: its analytic gradient contribution cancels anyway)
        local_max = jnp.max(jnp.where(live, jax.lax.stop_gradient(l_loc),
                                      -1e30))
        m = jnp.max(jax.lax.all_gather(local_max, axis))
        sumexp = jax.lax.psum(
            jnp.sum(jnp.where(live, jnp.exp(l_loc - m), 0.0)), axis)
        ex = jnp.exp(l_full - m)
        tail = jnp.maximum(sumexp - jnp.sum(ex, -1, keepdims=True), 0.0)
        suffix = jnp.flip(jnp.cumsum(jnp.flip(ex, -1), -1), -1) + tail
        step_lp = l_full - (m + jnp.log(jnp.maximum(suffix, 1e-30)))

        hit = s_id == terminal
        valid = jnp.any(hit, axis=-1)
        kpos = jnp.argmax(hit, axis=-1)
        t_ids = jnp.arange(top, dtype=jnp.int32)[None, :]
        if partial:
            # SubTB trains on PARTIAL trajectories (gfn.loss.subtb_loss
            # ``terminated``): a sample whose terminal missed the merged
            # prefix keeps the whole prefix as a sub-trajectory — learned
            # flow at the truncation point instead of the reward — so
            # t_cap ≪ A never zero-weights a batch (VERDICT r3 item 3)
            on_traj = jnp.where(valid[:, None], t_ids <= kpos[:, None], True)
        else:
            on_traj = (t_ids <= kpos[:, None]) & valid[:, None]
        actions = jax.lax.stop_gradient(
            jnp.where(on_traj, s_id, -1).astype(jnp.int32))
        fwd_lp = jnp.where(on_traj, step_lp, 0.0)
        lengths = jnp.where(valid, kpos + 1, top).astype(jnp.int32)

        terminated = valid
        w = jnp.ones_like(valid, fwd_lp.dtype) if partial else (
            valid.astype(fwd_lp.dtype))
        if replay_samples:
            # pad the fresh prefix to the buffer width (no-op when
            # top == t_cap; padding is -1 actions / log-prob 0)
            pad = t_cap - top
            if pad:
                actions = jnp.pad(actions, ((0, 0), (0, pad)),
                                  constant_values=-1)
                fwd_lp = jnp.pad(fwd_lp, ((0, 0), (0, pad)))
            # off-policy re-scoring: ONE [A_pad] logits vector per device
            # (fine — the sampler exists to avoid [B, A], not [A])
            full_l = jax.lax.all_gather(l_loc, axis).reshape(-1)
            r_fwd = jax.vmap(
                lambda t: trajectory_logprobs(full_l, t))(r_actions)
            actions = jnp.concatenate(
                [actions, r_actions.astype(jnp.int32)], 0)
            fwd_lp = jnp.concatenate([fwd_lp, r_fwd], 0)
            lengths = jnp.concatenate(
                [lengths, (r_actions >= 0).sum(-1).astype(lengths.dtype)], 0)
            # weight valid/dp: replicated replays carry exactly the
            # single-device weight in the pmean'd weighted mean (parallel.dp)
            w = jnp.concatenate([w, r_valid.astype(fwd_lp.dtype) / dp], 0)
            # replay entries are complete trajectories (invalid slots are
            # weight-0 regardless)
            terminated = jnp.concatenate(
                [terminated, jnp.ones_like(r_valid)], 0)

        # ---- reward + loss ----
        alpha = pol.forward_policy_alpha(params.forward)
        if cfg.alpha_fixed >= 0:
            alpha = jnp.asarray(cfg.alpha_fixed, pooled.dtype)
        keep = jax.vmap(
            lambda a: spai.keep_mask_from_actions(a, num_edges))(actions)
        res, kept_nnz = res_fn(keep, aux)
        res_ratio = res / baseline_residual
        comp_ratio = 2.0 * kept_nnz * ncols / baseline_flops
        rewards = (alpha * (1 - res_ratio)
                   + (1 - alpha) * (1 - comp_ratio)) * 1000.0

        log_r = getattr(cfg, 'reward_beta', 1.0) * log_reward(rewards)
        back_lp = gfn.backward_logprobs(params, cfg, actions)
        if cfg.loss == "vargrad":
            loss = vargrad_loss(log_r, fwd_lp.sum(-1),
                                back_lp.sum(-1), weights=w)
        elif cfg.loss == "subtb":
            # the flow head indexes action ids — replicated params, [b, top]
            # work (top = t_cap ≪ A), so SubTB(λ) needs no extra sharding
            log_flows = pol.flow_head_logF(params.flow, actions)
            loss = subtb_loss(log_flows, log_r, fwd_lp,
                              back_lp, lengths, lam=cfg.subtb_lambda,
                              weights=w,
                              terminated=terminated if partial else None)
        else:
            loss = trajectory_balance_loss(
                params.log_z, log_r,
                fwd_lp.sum(-1), back_lp.sum(-1), weights=w)
        loss = jax.lax.pmean(loss, "dp")
        return (loss, rewards[:b_local], valid, lengths[:b_local],
                actions[:b_local])

    def loss_fn(params, key, aux, graph_arg, feats_arg, r_actions, r_valid):
        fwd = jax.tree_util.tree_map(lambda _: P(), params.forward)
        fwd = fwd._replace(fc_w=P(None, axis), fc_b=P(axis))
        p_spec = jax.tree_util.tree_map(lambda _: P(), params)
        p_spec = p_spec._replace(forward=fwd)
        if gat_meta is not None:
            from .gat import ShardedTiledGraph

            g_spec = ShardedTiledGraph(
                x=P(), src_t=P(axis), attr_t=P(axis, None),
                local_dst=P(axis, None), lsrc=P(axis, None), blk=P(axis),
                out_slot=P(axis), out_src=P(axis))
        else:
            g_spec = jax.tree_util.tree_map(lambda _: P(), graph_arg)
        out = shard_map(
            local, mesh=mesh,
            in_specs=(p_spec, P(), aux_specs, g_spec, P(axis, None), P(),
                      P()),
            out_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
            check_vma=False,
        )(params, key, aux, graph_arg, feats_arg, r_actions, r_valid)
        loss, rewards, valid, lengths, actions = out
        return loss, (rewards, valid, lengths, actions)

    @jax.jit
    def _step(params, opt_state, key, r_actions, r_valid):
        (loss, (rewards, valid, lengths, actions)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                params, key, aux, graph, feats, r_actions, r_valid))
        updates, opt_state = opt.update(grads, opt_state, params, value=loss)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rewards, valid, lengths, actions

    if replay_samples:
        step = _step
    else:
        dummy_a = jnp.full((1, t_cap), -1, jnp.int32)
        dummy_v = jnp.zeros((1,), bool)

        def step(params, opt_state, key):
            return _step(params, opt_state, key, dummy_a, dummy_v)[:6]

    return step, _shard_fwd, env
