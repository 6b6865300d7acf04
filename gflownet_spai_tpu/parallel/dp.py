"""Data-parallel + row-parallel training step over a device mesh.

Replicated policy parameters, trajectory batch sharded over ``dp``,
gradients all-reduced with ``psum`` inside ``shard_map``.  The reward
residual composes with every env backend (VERDICT r1 #5 — the round-1 dp
path forced the slow COO pair plan):

* **pair** (COO plan)   — pair lists sharded over ``rows``, two-stage psum
  (partial C values, then the Frobenius scalar);
* **rowblock**          — each size-class bucket's row dimension sharded
  over ``rows``, partial squared-residual sums psum-reduced (the dense
  G blocks are the only large arrays and they split cleanly);
* **dia**               — the banded kernels are gather-free and the band
  is small; replicated per device, ``rows`` unused by the reward.

This is the TPU-native replacement for the reference's absent distribution
story (SURVEY.md §2 parallelism inventory: "no torch.distributed anywhere").
"""

from __future__ import annotations

import copy
import dataclasses

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..env import spai, spai_dia
from ..gfn import gflownet as gfn
from ..gfn.loss import log_reward, trajectory_balance_loss
from ..gfn.rollout import gumbel_topk_rollout
from ..models import policies as pol
from ..sparse import rowblock as _rowblock


def _pad_pairs(env: spai.SpaiEnv, n_shards: int) -> spai.SpaiEnv:
    """Pad the SpGEMM pair lists to a multiple of the rows-axis size so they
    shard evenly.  Padding pairs are routed to a dedicated dump slot
    appended to the output pattern, which the residual body excludes."""
    plan = env.plan
    npairs = plan.npairs
    target = -(-npairs // n_shards) * n_shards
    if target == npairs:
        return env
    pad = target - npairs
    new_plan = copy.copy(plan)
    new_plan.pair_a = jnp.concatenate([plan.pair_a, jnp.zeros((pad,), jnp.int32)])
    new_plan.pair_b = jnp.concatenate([plan.pair_b, jnp.zeros((pad,), jnp.int32)])
    new_plan.pair_out = jnp.concatenate(
        [plan.pair_out, jnp.full((pad,), plan.out_nnz, jnp.int32)])
    new_plan.out_row = jnp.concatenate([plan.out_row, jnp.full((1,), -1, jnp.int32)])
    new_plan.out_col = jnp.concatenate([plan.out_col, jnp.full((1,), -2, jnp.int32)])
    new_plan.out_nnz = plan.out_nnz + 1
    new_plan.npairs = target
    new_plan.real_out = plan.out_nnz   # genuine slots (dump excluded)
    return dataclasses.replace(env, plan=new_plan)


def _pad_rowblock(plan: _rowblock.RowBlockPlan,
                  n_shards: int) -> _rowblock.RowBlockPlan:
    """Pad each bucket's row count to a multiple of the rows-axis size.
    Padding rows have zero G blocks, window indices at the appended zero
    slot, and no diagonal — they contribute exactly 0 to the residual."""
    gram = plan.compress == "gram"
    gv, wi, dp_, ln = [], [], [], []
    lins = plan.lin if gram else (None,) * len(plan.gvals)
    for g, w, d, li in zip(plan.gvals, plan.win_idx, plan.diag_pos, lins):
        r = g.shape[0]
        if gram:
            cp, mp = g.shape[2], g.shape[2]      # H is [R, mp, mp]
        else:
            cp = g.shape[1] if plan.layout == "cm" else g.shape[2]
            mp = g.shape[2] if plan.layout == "cm" else g.shape[1]
        target = -(-r // n_shards) * n_shards
        pad = target - r
        if pad:
            g = jnp.concatenate(
                [g, jnp.zeros((pad,) + g.shape[1:], g.dtype)])
            w = jnp.concatenate(
                [w, jnp.full((pad, w.shape[1]), plan.nnz_m, jnp.int32)])
            d = jnp.concatenate([d, jnp.full((pad,), cp, jnp.int32)])
            if gram:
                li = jnp.concatenate(
                    [li, jnp.zeros((pad, li.shape[1]), li.dtype)])
        gv.append(g); wi.append(w); dp_.append(d); ln.append(li)
    # Clear the contiguous-window metadata: padded row counts invalidate the
    # win_off/win_w slice extents, and any later residual_sq_batch on this
    # plan would slice past the true window region.  Dropping them forces
    # the win_idx gather path, which the padding above keeps correct.
    return dataclasses.replace(
        plan, gvals=tuple(gv), win_idx=tuple(wi), diag_pos=tuple(dp_),
        lin=tuple(ln) if gram else plan.lin, win_off=(), win_w=())


def _residual_body(orig_data, out_nnz: int, n: int, real_out: int,
                   m_vals, pa, pb, po, orow, ocol):
    """Rows-sharded ‖M·A − I‖_F body: call *inside* a shard_map whose
    ``rows`` axis shards the pair arrays.  [B, nnz_local-pairs] → [B].
    ``orig_data`` is passed explicitly (replicated shard_map arg) so big
    value arrays never ride as closure constants (CLAUDE.md jit rule)."""
    prod = m_vals[:, pa] * orig_data[pb]                      # [B, pairs/R]
    partial_out = jax.vmap(
        lambda p: jax.ops.segment_sum(p, po, num_segments=out_nnz)
    )(prod)
    c = jax.lax.psum(partial_out, "rows")[:, :real_out]       # [B, real]
    diag = (orow == ocol)[:real_out]
    s2 = jnp.sum(c * c, axis=-1)
    sd = jnp.sum(jnp.where(diag[None, :], c, 0.0), axis=-1)
    return jnp.sqrt(s2 - 2.0 * sd + jnp.asarray(n, c.dtype))


def _rowblock_residual_body(plan_meta, m_vals, gvals, win_idx, diag_pos,
                            ov_arrays, lin=()):
    """Rows-sharded rowblock residual: bucket rows sharded over ``rows``,
    local partial Σ(y−δ)² psum-reduced.  [B, nnz_m] (replicated) → [B].
    The overflow sub-plan is replicated, so its contribution is divided by
    the rows-axis size before the psum (counted once globally).
    ``n_missing`` in the meta already folds the gram diag const."""
    nnz_m, n_missing, n_ov, rows, layout, compress = plan_meta
    B = m_vals.shape[0]
    acc = jnp.zeros((B,), m_vals.dtype)
    if compress == "gram":
        kt = jnp.concatenate(
            [m_vals, jnp.zeros((B, 1), m_vals.dtype)], axis=1).T
        for h, idx, li in zip(gvals, win_idx, lin):
            kwin = kt[idx].astype(h.dtype)               # [R, mp, B]
            t = jnp.einsum("rmn,rnb->rmb", h, kwin, precision="highest")
            q = jnp.sum(t * kwin.astype(t.dtype), axis=1)
            l2 = jnp.einsum("rm,rmb->rb", li, kwin, precision="highest")
            acc = acc + jnp.sum(q - l2, axis=0).astype(acc.dtype)
    elif layout == "mc":
        k2 = jnp.concatenate(
            [m_vals, jnp.zeros((B, 1), m_vals.dtype)], axis=1)
        for g, idx, dpos in zip(gvals, win_idx, diag_pos):
            kwin = k2[:, idx]                            # [B, R, mp]
            y = jnp.einsum("brm,rmc->brc", kwin.astype(g.dtype), g,
                           precision="highest")
            cp = g.shape[2]
            e = (jnp.arange(cp, dtype=jnp.int32)[None, :]
                 == dpos[:, None]).astype(y.dtype)
            acc = acc + jnp.sum(
                jnp.square(y - e[None]), axis=(1, 2)).astype(acc.dtype)
    else:
        kt = jnp.concatenate(
            [m_vals, jnp.zeros((B, 1), m_vals.dtype)], axis=1).T
        for g, idx, dpos in zip(gvals, win_idx, diag_pos):
            kwin = kt[idx]
            y = jnp.einsum("rcm,rmb->rcb", g, kwin.astype(g.dtype),
                           precision="highest")
            cp = g.shape[1]
            e = (jnp.arange(cp, dtype=jnp.int32)[None, :]
                 == dpos[:, None]).astype(y.dtype)
            acc = acc + jnp.sum(
                jnp.square(y - e[..., None]), axis=(0, 1)).astype(acc.dtype)
    if n_ov:
        ov_pair_m, ov_w, ov_seg, ov_diag = ov_arrays
        prod = m_vals[:, ov_pair_m] * ov_w[None, :].astype(m_vals.dtype)
        c = jax.vmap(lambda p: jax.ops.segment_sum(
            p, ov_seg, num_segments=n_ov))(prod)
        c = c - ov_diag.astype(c.dtype)[None, :]
        acc = acc + jnp.sum(c * c, axis=-1) / rows
    acc = jax.lax.psum(acc, "rows")
    # gram's expanded quadratic can go ~eps·n negative near zero residual —
    # clamp before the sqrt so the reward never NaNs (ADVICE r3 medium).
    return jnp.sqrt(jnp.maximum(acc + jnp.asarray(n_missing, acc.dtype), 0.0))


def _make_residual_provider(env, rows: int):
    """Returns ``(env_padded, aux, aux_specs, fn)`` with
    ``fn(keep [b, E], aux) -> (res_norms [b], kept_nnz [b])`` valid inside
    a shard_map over mesh axes ("dp", "rows").  ``aux`` carries every large
    array as an explicit operand (payload rule)."""
    if isinstance(env, spai_dia.SpaiDiaEnv):
        seed_meta = env.seed
        orig_meta = env.original

        def fn_dia(keep, aux):
            seed_data, orig_data = aux
            e = dataclasses.replace(
                env,
                seed=dataclasses.replace(seed_meta, data=seed_data),
                original=dataclasses.replace(orig_meta, data=orig_data),
            )
            res = jax.vmap(lambda k: spai_dia.residual_norm(e, k))(keep)
            nnz = jax.vmap(lambda k: spai_dia.kept_nnz(e, k))(keep)
            return res, nnz.astype(res.dtype)

        aux = (env.seed.data, env.original.data)
        return env, aux, (P(), P()), fn_dia

    if env.rb is not None:
        rb = _pad_rowblock(env.rb, rows)
        env = dataclasses.replace(env, rb=rb)
        meta = (rb.nnz_m, rb.n_missing_diag + rb.n_bucket_diag,
                rb.n_overflow_slots, rows, rb.layout, rb.compress)
        seed_dtype = env.seed.data.dtype

        def fn_rb(keep, aux):
            seed_data, gvals, win_idx, diag_pos, ov_arrays, lin = aux
            m_vals = seed_data[None, :] * keep.astype(seed_dtype)
            res = _rowblock_residual_body(meta, m_vals, gvals, win_idx,
                                          diag_pos, ov_arrays, lin=lin)
            return res, jnp.sum(keep, -1).astype(res.dtype)

        ov_arrays = (rb.ov_pair_m, rb.ov_w, rb.ov_seg, rb.ov_diag)
        aux = (env.seed.data, rb.gvals, rb.win_idx, rb.diag_pos, ov_arrays,
               rb.lin)
        specs = (P(),
                 tuple(P("rows") for _ in rb.gvals),
                 tuple(P("rows") for _ in rb.win_idx),
                 tuple(P("rows") for _ in rb.diag_pos),
                 (P(), P(), P(), P()),
                 tuple(P("rows") for _ in rb.lin))
        return env, aux, specs, fn_rb

    # COO pair plan (rows-sharded pairs)
    real_out = env.plan.out_nnz
    env = _pad_pairs(env, rows)
    plan = env.plan
    n = env.n
    out_nnz = plan.out_nnz
    seed_dtype = env.seed.data.dtype

    def fn_pair(keep, aux):
        seed_data, orig_data, pa, pb, po, orow, ocol = aux
        m_vals = seed_data[None, :] * keep.astype(seed_dtype)
        res = _residual_body(orig_data, out_nnz, n, real_out,
                             m_vals, pa, pb, po, orow, ocol)
        return res, jnp.sum(keep, -1).astype(res.dtype)

    aux = (env.seed.data, env.original.data, plan.pair_a, plan.pair_b,
           plan.pair_out, plan.out_row, plan.out_col)
    specs = (P(), P(), P("rows"), P("rows"), P("rows"), P(), P())
    return env, aux, specs, fn_pair


def sharded_residual_norms(mesh: Mesh, env: spai.SpaiEnv, m_vals: jax.Array,
                           real_out: int | None = None) -> jax.Array:
    """Standalone rows-sharded residual: [B, nnz] masked values → [B] norms.
    ``env`` must be pre-padded with ``_pad_pairs`` when rows > 1."""
    plan = env.plan
    # default excludes the _pad_pairs dump slot when the env was padded
    real = real_out if real_out is not None else getattr(
        plan, "real_out", plan.out_nnz)

    def local(orig_data, m_vals_rep, pa, pb, po, orow, ocol):
        return _residual_body(orig_data, plan.out_nnz, env.n, real,
                              m_vals_rep, pa, pb, po, orow, ocol)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("rows"), P("rows"), P("rows"), P(), P()),
        out_specs=P(),
    )(env.original.data, m_vals, plan.pair_a, plan.pair_b, plan.pair_out,
      plan.out_row, plan.out_col)


def sharded_rowblock_residual_norms(mesh: Mesh, env: spai.SpaiEnv,
                                    m_vals: jax.Array) -> jax.Array:
    """Standalone rows-sharded ROWBLOCK residual: [B, nnz] masked values →
    [B] norms.  Buckets padded internally to the rows-axis size."""
    rows = mesh.shape["rows"]
    rb = _pad_rowblock(env.rb, rows)
    meta = (rb.nnz_m, rb.n_missing_diag + rb.n_bucket_diag,
            rb.n_overflow_slots, rows, rb.layout, rb.compress)

    def local(m_vals_rep, gvals, win_idx, diag_pos, ov_arrays, lin):
        return _rowblock_residual_body(meta, m_vals_rep, gvals, win_idx,
                                       diag_pos, ov_arrays, lin=lin)

    specs = (P(),
             tuple(P("rows") for _ in rb.gvals),
             tuple(P("rows") for _ in rb.win_idx),
             tuple(P("rows") for _ in rb.diag_pos),
             (P(), P(), P(), P()),
             tuple(P("rows") for _ in rb.lin))
    return shard_map(local, mesh=mesh, in_specs=specs, out_specs=P())(
        m_vals, rb.gvals, rb.win_idx, rb.diag_pos,
        (rb.ov_pair_m, rb.ov_w, rb.ov_seg, rb.ov_diag), rb.lin)


def make_dp_train_step(mesh: Mesh, env, graph: pol.GraphInputs,
                       cfg: gfn.GFlowNetConfig, opt: optax.GradientTransformation,
                       batch_size: int, replay_samples: int = 0):
    """Fully-sharded train step over mesh axes (dp, rows).

    Params/opt-state replicated; per-device sub-batches roll out with
    device-folded PRNG keys; reward residuals sharded over ``rows`` through
    whichever backend the env carries (pair plan / rowblock / DIA — see
    module docstring); grads ``pmean``-reduced over ``dp``.  Returns
    ``(jitted_step, padded_env)``.

    With ``replay_samples > 0`` the step takes two extra arguments
    ``(replay_actions [R, T], replay_valid [R])`` (replicated — every dp
    shard re-scores the same replayed trajectories; their loss weight is
    ``valid/dp`` so the weighted batch mean matches the single-device loop
    EXACTLY for tb/subtb: Σnum_i/(dp·den) == global Σw·l/Σw when every
    device sees the same denominator.  vargrad remains approximate — pmean
    of per-device variances ≠ the global variance) and additionally returns
    the fresh batch's actions so the caller can update the buffer
    (gfn.replay).
    """
    dp = mesh.shape["dp"]
    rows = mesh.shape["rows"]
    if batch_size % dp:
        raise ValueError(f"batch {batch_size} not divisible by dp={dp}")
    b_local = batch_size // dp
    env, aux, aux_specs, res_fn = _make_residual_provider(env, rows)
    opt = optax.with_extra_args_support(opt)

    baseline_residual = env.baseline_residual
    baseline_flops = env.baseline_flops
    num_edges = env.num_edges
    ncols = env.seed.shape[1]

    def local_loss(params, key, aux, r_actions, r_valid):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        logits = pol.forward_policy_logits(
            params.forward, graph, cfg.num_actions, cfg.hidden_dim, cfg.heads
        )
        # honor the full GFlowNetConfig (alpha pinning / temperature / loss)
        alpha = pol.forward_policy_alpha(params.forward)
        if cfg.alpha_fixed >= 0:
            alpha = jnp.asarray(cfg.alpha_fixed, logits.dtype)
        sample_logits = logits / cfg.temperature if cfg.temperature != 1.0 else logits
        batched = jnp.broadcast_to(sample_logits, (b_local, cfg.num_actions))
        roll = gumbel_topk_rollout(batched, key, terminal_action=cfg.num_actions - 1)
        fresh_actions = jax.lax.stop_gradient(roll.actions)
        fwd_lp = roll.fwd_logprobs
        if cfg.temperature != 1.0:
            from ..gfn.rollout import trajectory_logprobs

            fwd_lp = jax.vmap(lambda a: trajectory_logprobs(logits, a))(fresh_actions)
        actions = fresh_actions
        lengths = roll.lengths
        weights = None
        if replay_samples:
            from ..gfn.rollout import trajectory_logprobs

            r_fwd = jax.vmap(lambda a: trajectory_logprobs(logits, a))(r_actions)
            actions = jnp.concatenate([fresh_actions, r_actions], 0)
            fwd_lp = jnp.concatenate([fwd_lp, r_fwd], 0)
            lengths = jnp.concatenate(
                [lengths, (r_actions >= 0).sum(-1).astype(lengths.dtype)], 0)
            # weight valid/dp: replicated replays then carry exactly the
            # single-device weight in the pmean'd weighted mean (docstring)
            weights = jnp.concatenate(
                [jnp.ones((b_local,), fwd_lp.dtype),
                 r_valid.astype(fwd_lp.dtype) / dp], 0)

        keep = jax.vmap(
            lambda a: spai.keep_mask_from_actions(a, num_edges)
        )(actions)
        res, kept_nnz = res_fn(keep, aux)
        res_ratio = res / baseline_residual
        flops = 2.0 * kept_nnz * ncols
        comp_ratio = flops / baseline_flops
        rewards = (alpha * (1 - res_ratio) + (1 - alpha) * (1 - comp_ratio)) * 1000.0
        log_r = getattr(cfg, "reward_beta", 1.0) * log_reward(rewards)

        back_lp = gfn.backward_logprobs(params, cfg, actions)
        if cfg.loss == "vargrad":
            from ..gfn.loss import vargrad_loss

            loss = vargrad_loss(log_r,
                                fwd_lp.sum(-1), back_lp.sum(-1),
                                weights=weights)
        elif cfg.loss == "subtb":
            from ..gfn.loss import subtb_loss

            log_flows = pol.flow_head_logF(params.flow, actions)
            loss = subtb_loss(log_flows, log_r,
                              fwd_lp, back_lp, lengths,
                              lam=cfg.subtb_lambda, weights=weights)
        else:
            loss = trajectory_balance_loss(
                params.log_z, log_r,
                fwd_lp.sum(-1), back_lp.sum(-1), weights=weights,
            )
        return loss, (rewards[:b_local], fresh_actions)

    def sharded(params, opt_state, key, aux, r_actions, r_valid):
        (loss, (rewards, actions)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, key, aux,
                                      r_actions, r_valid)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        updates, opt_state = opt.update(grads, opt_state, params, value=loss)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, rewards, actions

    smapped = shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(), P(), aux_specs, P(), P()),
        out_specs=(P(), P(), P(), P("dp"), P("dp")),
        check_vma=False,
    )

    # big arrays enter as jit ARGUMENTS (CLAUDE.md closure rule), with the
    # public step(params, opt_state, key) signature preserved by the wrapper
    jitted = jax.jit(smapped)
    t_len = cfg.num_actions

    if replay_samples:
        def step_fn(params, opt_state, key, r_actions, r_valid):
            return jitted(params, opt_state, key, aux, r_actions, r_valid)
    else:
        dummy_a = jnp.full((1, t_len), -1, jnp.int32)
        dummy_v = jnp.zeros((1,), bool)

        def step_fn(params, opt_state, key):
            return jitted(params, opt_state, key, aux, dummy_a, dummy_v)[:4]

    return step_fn, env
