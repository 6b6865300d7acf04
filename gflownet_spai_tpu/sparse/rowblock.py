"""Row-block fixed-pattern SpGEMM: the TPU shape of ``‖M·A − I‖_F`` for
UNSTRUCTURED patterns.

The reference recomputes a full sparse×sparse product per reward call
(``torch.mm`` at reference preconditioner.py:79-93).  The round-1 rebuild
turned that into a static pair plan (``sparse.ops.SpGEMMPlan``): per-pair
gathers + a segment-sum.  Correct everywhere, but TPU has no vector gather —
XLA scalarizes the ``data[pair_a]`` loads and the reward at 1M+ nnz runs
~170× slower than the banded DIA path (docs/BENCH.md round 1).

This module removes the gathers entirely by exploiting CSR adjacency:

* C = M·A row r only reads M's row-r values — a **contiguous** slice
  ``m_vals[indptr[r] : indptr[r+1]]`` when M is stored row-major (the seed
  COO is).
* pattern(C) is static, so the map from (M row-r values) → (C row-r values)
  is a **constant dense matrix** ``G_r[c, k] = A[k_th col of M row r,
  c_th col of C row r]`` — a reshuffled copy of A's values.
* Therefore ``C[r, :] = G_r @ m_window_r`` — and for a **batch** of masked
  value vectors (the GFlowNet reward scores B trajectories at once) it is
  ``[c_r × m_r] @ [m_r × B]``: a dense matmul on the MXU.

Rows are bucketed by padded (c_r, m_r) size class so the whole product is a
handful of batched einsums ``[R, cp, mp] @ [R, mp, B]`` plus one contiguous
row-window gather per bucket — no scatter, no per-pair indexing, FLOPs ≈
npairs·B/density on the MXU instead of npairs serialized gathers.

The Frobenius residual needs no C materialization at all:
``‖C − I‖²_F = Σ_buckets Σ_{r,c} (y[r,c,b] − δ)² + (#rows with no diagonal
in pattern C)`` — padding slots contribute exactly 0 because G's padding is
zero and the window gather reads an appended zero row.

Everything here is a registered pytree so plans travel as **jit arguments**
(never closure constants — CLAUDE.md payload rule; G is O(100 MB) at 1M
nnz).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .types import COO


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _size_class(x: int, align: int = 8, step: float = 1.5) -> int:
    """Pad-to-class: multiples of ``align`` up to 4·align, then a ×``step``-
    spaced ladder (step=1.5: 48, 64, 96, 128, 192, …) — bounds per-row
    padding waste at <step× while keeping the bucket count (≈ distinct XLA
    einsums) small.  Measured on the 1M-nnz reward bench: pow-2 classes
    padded 16×, the 1.5 ladder ~11×; ``step=1.25`` trades ~2× the bucket
    count for another ~15% padded-slot reduction (see build_rowblock_plan
    ``class_step``)."""
    x = max(x, 1)
    if x <= 4 * align:
        return _round_up(x, align)
    c = 4 * align
    while c < x:
        c = _round_up(max(int(c * step), c + 1), align)
    return c


@dataclasses.dataclass(frozen=True)
class RowBlockPlan:
    """Static plan for C = M·A with fixed patterns, M values variable.

    Per-bucket leaves (tuples, one entry per size class):
      gvals[b]    : float[R, cp, mp]  — dense G blocks (A values placed);
                                        [R, mp, cp] when ``layout="mc"``
                                        (batch-in-sublanes einsum — see
                                        residual_sq_batch)
      win_idx[b]  : int32[R, mp]      — indices into m_vals (CSR window;
                                        padding points at the appended 0)
      diag_pos[b] : int32[R]          — position of (r, r) within C row r's
                                        pattern, or cp when absent
      out_pos[b]  : int32[R, cp]      — flat position in the row-major C
                                        pattern (padding → out_nnz)

    Overflow rows (too wide / too sparse for a dense block — the ILU fill
    of long-range couplings can make single rows O(10⁴) wide, which would
    dense-pad to TiB): those go through a compact pair/gather sub-plan that
    covers only their slots.  On PDE-class matrices this is empty or a tiny
    fraction; it bounds the dense storage at ``max_block_slots`` per row
    and ``pad_ratio_cap``× the true multiply count per row.
      ov_pair_m : int32[P]  — index into m_vals per overflow pair
      ov_w      : float[P]  — constant A value per overflow pair
      ov_seg    : int32[P]  — overflow C-slot id (sorted ascending)
      ov_diag   : bool[S]   — overflow slot is a diagonal entry
      ov_out_pos: int32[S]  — overflow slot position in the C pattern
    """

    gvals: Tuple[jax.Array, ...]
    win_idx: Tuple[jax.Array, ...]
    diag_pos: Tuple[jax.Array, ...]
    out_pos: Tuple[jax.Array, ...]
    ov_pair_m: jax.Array
    ov_w: jax.Array
    ov_seg: jax.Array
    ov_diag: jax.Array
    ov_out_pos: jax.Array
    out_row: jax.Array            # int32[out_nnz] pattern of C (row-major)
    out_col: jax.Array            # int32[out_nnz]
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    nnz_m: int = 0
    out_nnz: int = 0
    n_missing_diag: int = 0       # rows of C with no diagonal slot
    npairs: int = 0               # true (unpadded) multiply count
    n_overflow_slots: int = 0     # C slots handled by the gather sub-plan
    layout: str = "cm"            # G block axis order: "cm" = [R, cp, mp]
                                  # (batch in lanes), "mc" = [R, mp, cp]
                                  # (batch in sublanes, C cols in lanes —
                                  # the MXU-friendly shape at small batch)
    compress: str = "none"        # "gram": gvals hold H_r = G_rᵀG_r
                                  # [R, mp, mp] and ``lin`` holds 2·G_rᵀe_r —
                                  # the residual runs on the quadratic form
                                  # ‖G_rk−e_r‖² = kᵀH_rk − linᵀk + δ_diag,
                                  # eliminating the cp dimension entirely
                                  # (~cp̄/mp̄ ≈ 4.4× fewer FLOPs and bytes)
    n_bucket_diag: int = 0        # gram const: bucket rows whose C row has
                                  # a diagonal slot (Σ‖e_r‖²)
    lin: Tuple[jax.Array, ...] = ()   # gram: 2·G_rᵀe_r per bucket [R, mp]
    # window-order mode (order="window"): the plan DEFINES the edge
    # enumeration — ``edge_perm`` maps new edge id → original sorted-CSR
    # entry; bucket b's windows are the static contiguous slice
    # m_vals[win_off[b] : win_off[b] + R_b·win_w[b]].reshape(R_b, w) —
    # NO gather (measured: the kt[idx] window gather was 47 of the 56 ms
    # reward at 22M pairs; the einsums are 0.5 ms)
    win_off: Tuple[int, ...] = ()
    win_w: Tuple[int, ...] = ()
    edge_perm: jax.Array | None = None

    @property
    def padded_slots(self) -> int:
        return sum(int(g.shape[0] * g.shape[1] * g.shape[2]) for g in self.gvals)


jax.tree_util.register_dataclass(
    RowBlockPlan,
    data_fields=["gvals", "win_idx", "diag_pos", "out_pos", "lin",
                 "ov_pair_m", "ov_w", "ov_seg", "ov_diag", "ov_out_pos",
                 "out_row", "out_col", "edge_perm"],
    meta_fields=["shape", "nnz_m", "out_nnz", "n_missing_diag", "npairs",
                 "n_overflow_slots", "layout", "compress", "n_bucket_diag",
                 "win_off", "win_w"],
)


def _to_scipy_csr(coo: COO, pattern_only: bool = False):
    import scipy.sparse as sp

    data = np.ones(coo.nnz, np.float64) if pattern_only else np.asarray(
        coo.data, np.float64)
    m = sp.csr_matrix(
        (data, (np.asarray(coo.row), np.asarray(coo.col))), shape=coo.shape)
    m.sort_indices()
    return m


def build_rowblock_plan(m_pattern: COO, a: COO,
                        gemm_dtype=jnp.float32,
                        max_block_slots: int = 32768,
                        pad_ratio_cap: float = 64.0,
                        class_step: float = 1.5,
                        layout: str = "cm",
                        compress: str = "none",
                        order: str = "sorted") -> RowBlockPlan:
    """Host-side symbolic phase (runs once per seed pattern).

    ``m_pattern``: the seed (row-major sorted COO — its entry order IS the
    m_vals order the numeric phase consumes).  ``a``: the system matrix with
    values (constant during training).

    Rows whose dense block would exceed ``max_block_slots`` (cp·mp after
    class padding) or inflate the multiply count more than ``pad_ratio_cap``×
    are routed to the gather-based overflow sub-plan instead of a dense
    bucket (see RowBlockPlan docstring).

    ``class_step``: size-class ladder spacing (1.5 default; 1.25 ≈ −15%
    padded slots for ~2× the einsum count).  ``layout``: G-block axis order
    — "mc" puts the batch on MXU sublanes and the C columns on lanes
    (the per-row matmuls become [B, mp] @ [mp, cp]), which beats "cm"'s
    batch-in-lanes shape whenever B < cp (i.e. every practical batch).

    ``compress="gram"``: store per-row Gram blocks H_r = G_rᵀG_r [mp, mp]
    and the linear term 2·G_rᵀe_r instead of G — the residual becomes
    Σ_r (k_rᵀH_rk_r − linᵀk_r) + consts, removing the cp dimension
    (~cp̄/mp̄ ≈ 4–5× fewer FLOPs and HBM bytes).  PRECISION NOTE: the
    expanded quadratic cancels ‖G_rk‖² against 2·y[diag]; the summed f32
    round-off is ~eps·Σ‖G_rk_r‖² ≈ eps·n, i.e. a relative residual error
    up to ~eps·n/res² — ~1e-3-relative at the config-4 scale, same class
    as bf16 G storage.  Reward-path use only; ``numeric`` (C values)
    raises under gram.

    ``order="window"``: THE GATHER KILLER.  Rows are bucketed by their
    EXACT window width (plus the cp class), and the plan defines a new
    edge enumeration (``edge_perm``) in which every bucket's windows form
    one contiguous slice of m_vals — the per-eval ``kt[win_idx]`` gather
    (measured 47 of the 56 ms batched reward at 22M pairs; TPU has no
    vector gather) disappears into static reshapes.  The CALLER must
    permute the seed COO by ``edge_perm`` so action ids match
    (env.spai.make_env does).  No m-axis padding exists in this mode.
    """
    import scipy.sparse as sp

    n, _ = m_pattern.shape
    # win_idx indexes the caller's m_vals in the seed's OWN entry order, so
    # that order must already be row-major sorted (== CSR data order)
    mkey = (np.asarray(m_pattern.row).astype(np.int64) * m_pattern.shape[1]
            + np.asarray(m_pattern.col))
    if len(mkey) and not np.all(np.diff(mkey) > 0):
        raise ValueError("m_pattern must be row-major sorted and deduplicated"
                         " (coo_sort_dedup)")
    m_csr = _to_scipy_csr(m_pattern, pattern_only=True)
    a_csr = _to_scipy_csr(a)
    # symbolic product pattern, canonical (sorted cols per row)
    c_pat = (m_csr @ sp.csr_matrix(
        (np.ones(a_csr.nnz), a_csr.indices, a_csr.indptr), shape=a.shape))
    c_pat.sort_indices()
    c_indptr = c_pat.indptr.astype(np.int64)
    c_cols = c_pat.indices.astype(np.int64)
    m_indptr = m_csr.indptr.astype(np.int64)
    m_cols = m_csr.indices.astype(np.int64)

    m_r = np.diff(m_indptr)                      # [n] window widths
    c_r = np.diff(c_indptr)                      # [n] C row widths
    live = m_r > 0                               # rows that produce output

    # enumerate pairs fully vectorized: pair p = (M entry i, A entry j),
    # C slot o; dense-block coordinates (row r, jc = o − c_indptr[r],
    # jm = i − m_indptr[r])
    a_counts = np.diff(a_csr.indptr)[m_cols]     # per-M-entry pair counts
    pair_i = np.repeat(np.arange(len(m_cols)), a_counts)
    offs = np.concatenate([[0], np.cumsum(a_counts)])
    within = np.arange(int(a_counts.sum())) - np.repeat(offs[:-1], a_counts)
    pair_j = a_csr.indptr[m_cols[pair_i]] + within
    m_rows = np.repeat(np.arange(n), m_r)        # row of M entry i
    r_of_pair = m_rows[pair_i]
    jm = pair_i - m_indptr[r_of_pair]
    # column of the pair's C slot = column of A entry j; its position within
    # the (sorted) C row pattern via ONE global searchsorted — each row's
    # keys are offset into disjoint ranges so no per-row loop is needed
    acol = a_csr.indices[pair_j].astype(np.int64)
    stride = a.shape[1] + 1
    keyed_ccols = c_cols + np.repeat(np.arange(n), c_r) * stride
    jc = np.searchsorted(keyed_ccols, acol + r_of_pair * stride)
    jc = jc - c_indptr[r_of_pair]

    # bucket rows by padded size class (vectorized: class table lookup up to
    # the max width, then one argsort groups rows per class)
    if layout not in ("cm", "mc"):
        raise ValueError(f"unknown rowblock layout {layout!r}")
    if compress not in ("none", "gram"):
        raise ValueError(f"unknown rowblock compress {compress!r}")
    if order not in ("sorted", "window"):
        raise ValueError(f"unknown rowblock order {order!r}")
    if compress == "gram" or order == "window":
        layout = "cm"        # staging layout; gram blocks are [R, mp, mp]

    def _classes_of(widths):
        table = np.array([_size_class(int(x), step=class_step) for x in
                          range(int(widths.max()) + 1)] or [8])
        return table[widths]

    # window mode: the m-axis buckets by EXACT width (zero padding, and
    # each bucket's windows become one contiguous slice of the permuted
    # edge enumeration — see docstring)
    mp_class = m_r.copy() if order == "window" else _classes_of(m_r)
    cp_class = _classes_of(c_r)
    # pairs per row (for the pad-ratio overflow criterion)
    pairs_r = np.zeros(n, np.int64)
    np.add.at(pairs_r, np.repeat(np.arange(n), m_r), a_counts)
    block_slots = cp_class.astype(np.int64) * mp_class
    overflow = live & ((block_slots > max_block_slots)
                       | (block_slots > pad_ratio_cap * np.maximum(pairs_r, 1)))
    key_of_row = cp_class * (2 ** 32) + mp_class
    live_rows = np.nonzero(live & ~overflow)[0]
    uniq_keys, inv = np.unique(key_of_row[live_rows], return_inverse=True)
    r_order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[r_order], np.arange(len(uniq_keys) + 1))
    classes = {
        (int(k // (2 ** 32)), int(k % (2 ** 32))):
            live_rows[r_order[bounds[i]:bounds[i + 1]]]
        for i, k in enumerate(uniq_keys)
    }

    # diagonal bookkeeping (same keyed-searchsorted trick)
    dsearch = np.searchsorted(keyed_ccols, np.arange(n) * stride + np.arange(n))
    found = (dsearch < c_indptr[1:]) & (dsearch >= c_indptr[:-1])
    found &= np.where(found, c_cols[np.minimum(dsearch, len(c_cols) - 1)]
                      == np.arange(n), False)
    diag_present = found
    dpos_all = np.where(found, dsearch - c_indptr[:-1], -1)

    stage_dt = np.float64 if jnp.dtype(gemm_dtype) == jnp.float64 else np.float32
    a_data = np.asarray(a_csr.data, stage_dt)
    bucket_of_row = np.full(n, -1)
    slot_of_row = np.full(n, -1)
    nb = len(classes)
    g_np, w_np, d_np, o_np = [None] * nb, [None] * nb, [None] * nb, [None] * nb
    win_off, win_w, perm_parts = [], [], []
    off_acc = 0
    for b, (key, rows) in enumerate(sorted(classes.items())):
        cp, mp = key
        rows = np.asarray(rows)
        bucket_of_row[rows] = b
        slot_of_row[rows] = np.arange(len(rows))
        R = len(rows)
        # f32 host staging unless a f64 plan is requested (bf16 plans cast
        # at device upload): halves the transient footprint at 1M nnz
        g_np[b] = np.zeros((R, cp, mp) if layout == "cm" else (R, mp, cp),
                           stage_dt)
        col_ids = np.arange(mp)[None, :]
        if order == "window":
            # windows land contiguously in the permuted enumeration
            w_np[b] = off_acc + np.arange(R)[:, None] * mp + col_ids
            perm_parts.append(
                (m_indptr[rows][:, None] + col_ids).ravel())
            win_off.append(int(off_acc))
            win_w.append(int(mp))
            off_acc += R * mp
        else:
            w_np[b] = np.where(col_ids < m_r[rows][:, None],
                               m_indptr[rows][:, None] + col_ids,
                               len(m_cols))
        d_np[b] = np.where(dpos_all[rows] >= 0, dpos_all[rows], cp)
        oc = np.arange(cp)[None, :]
        o_np[b] = np.where(oc < c_r[rows][:, None],
                           c_indptr[rows][:, None] + oc, len(c_cols))
    # scatter all pair values into the dense blocks: ONE stable argsort
    # groups pairs by bucket (vs nb full-array masks — 2× build time at
    # 22M pairs), then each bucket scatters from its contiguous slice
    pb_b = bucket_of_row[r_of_pair]
    pb_s = slot_of_row[r_of_pair]
    pair_vals = a_data[pair_j]
    border = np.argsort(pb_b, kind="stable")
    bbounds = np.searchsorted(pb_b[border], np.arange(nb + 1) - 0.5)
    for b in range(nb):
        sl = border[bbounds[b]:bbounds[b + 1]]
        if layout == "cm":
            g_np[b][pb_s[sl], jc[sl], jm[sl]] = pair_vals[sl]
        else:
            g_np[b][pb_s[sl], jm[sl], jc[sl]] = pair_vals[sl]

    # gram compression: fold the cp dimension into per-row quadratic forms
    lin_np = []
    n_bucket_diag = 0
    if compress == "gram":
        for b in range(nb):
            G = g_np[b]                                   # [R, cp, mp]
            R, cp, mp = G.shape
            d = d_np[b]
            has = d < cp
            n_bucket_diag += int(has.sum())
            lin = 2.0 * G[np.arange(R), np.where(has, d, 0), :]
            lin[~has] = 0.0
            g_np[b] = np.einsum("rcm,rcn->rmn", G, G,
                                optimize=True).astype(stage_dt)
            lin_np.append(lin.astype(stage_dt))

    # overflow sub-plan (gather path for the routed-out rows)
    ov_rows = np.nonzero(overflow)[0]
    ov_c = c_r[ov_rows]
    S = int(ov_c.sum())
    slot_base = np.zeros(n, np.int64)
    if len(ov_rows):
        slot_base[ov_rows] = np.concatenate([[0], np.cumsum(ov_c)[:-1]])
    sel = overflow[r_of_pair]
    ov_pair_m = pair_i[sel]
    ov_w = a_data[pair_j[sel]]
    edge_perm = None
    if order == "window":
        # overflow rows' windows close out the permuted enumeration
        o_starts = m_indptr[ov_rows]
        o_lens = m_r[ov_rows]
        tot = int(o_lens.sum())
        tail = (np.repeat(o_starts, o_lens)
                + np.arange(tot)
                - np.repeat(np.concatenate([[0], np.cumsum(o_lens)[:-1]])
                            if len(o_lens) else np.zeros(0, np.int64),
                            o_lens))
        edge_perm = np.concatenate(
            [p for p in perm_parts] + [tail]).astype(np.int64)
        if len(edge_perm) != len(m_cols):
            raise AssertionError("window permutation must cover every edge")
        inv_perm = np.empty(len(m_cols), np.int64)
        inv_perm[edge_perm] = np.arange(len(m_cols))
        ov_pair_m = inv_perm[ov_pair_m]
    ov_seg = slot_base[r_of_pair[sel]] + jc[sel]
    within_slot = np.arange(S) - np.repeat(slot_base[ov_rows], ov_c)
    ov_out_pos = np.repeat(c_indptr[ov_rows], ov_c) + within_slot
    ov_diag = within_slot == np.repeat(dpos_all[ov_rows], ov_c)

    out_rows_np = np.repeat(np.arange(n), c_r).astype(np.int32)
    return RowBlockPlan(
        gvals=tuple(jnp.asarray(g, gemm_dtype) for g in g_np),
        win_idx=tuple(jnp.asarray(w, jnp.int32) for w in w_np),
        diag_pos=tuple(jnp.asarray(d, jnp.int32) for d in d_np),
        out_pos=tuple(jnp.asarray(o, jnp.int32) for o in o_np),
        ov_pair_m=jnp.asarray(ov_pair_m, jnp.int32),
        ov_w=jnp.asarray(ov_w, gemm_dtype),
        ov_seg=jnp.asarray(ov_seg, jnp.int32),
        ov_diag=jnp.asarray(ov_diag),
        ov_out_pos=jnp.asarray(ov_out_pos, jnp.int32),
        out_row=jnp.asarray(out_rows_np),
        out_col=jnp.asarray(c_cols, jnp.int32),
        shape=(m_pattern.shape[0], a.shape[1]),
        nnz_m=int(len(m_cols)),
        out_nnz=int(len(c_cols)),
        n_missing_diag=int(n - diag_present.sum()),
        npairs=int(len(pair_i)),
        n_overflow_slots=S,
        layout=layout,
        compress=compress,
        n_bucket_diag=n_bucket_diag,
        lin=tuple(jnp.asarray(l, gemm_dtype) for l in lin_np),
        win_off=tuple(win_off),
        win_w=tuple(win_w),
        edge_perm=(None if edge_perm is None
                   else jnp.asarray(edge_perm, jnp.int32)),
    )


# ---------------------------------------------------------------------------
# Numeric phase (jit-compiled; plan travels as an argument)
# ---------------------------------------------------------------------------

def _acc_dtype(gemm_dtype):
    """MXU accumulation dtype: f32 for bf16 storage, else the storage dtype."""
    return (jnp.float32 if jnp.dtype(gemm_dtype) == jnp.bfloat16
            else jnp.dtype(gemm_dtype))


def residual_sq_batch(plan: RowBlockPlan, m_vals: jax.Array) -> jax.Array:
    """``‖M·A − I‖²_F`` for a batch of M value vectors.

    ``m_vals``: float[B, nnz_m] (the seed values masked per trajectory).
    Returns float[B].  One contiguous-window gather + one batched dense
    einsum per size-class bucket; the −I correction folds into a per-slot
    one-hot, and rows whose C pattern misses the diagonal add +1 each.
    """
    B = m_vals.shape[0]
    acc = jnp.zeros((B,), m_vals.dtype)
    if plan.win_off:
        # window-order plan: NO gather — every bucket's windows are one
        # static contiguous slice of (the permuted) m_vals
        adt = _acc_dtype(plan.gvals[0].dtype if plan.gvals else m_vals.dtype)
        if plan.compress == "gram":
            for h, lin_b, off, w in zip(plan.gvals, plan.lin,
                                        plan.win_off, plan.win_w):
                R = h.shape[0]
                kwin = jax.lax.slice(
                    m_vals, (0, off), (B, off + R * w)
                ).reshape(B, R, w).astype(h.dtype)
                t = jnp.einsum("rmn,brn->brm", h, kwin,
                               precision="highest",
                               preferred_element_type=adt)
                q = jnp.sum(t * kwin.astype(t.dtype), axis=2)      # [B, R]
                l2 = jnp.einsum("rm,brm->br", lin_b, kwin,
                                precision="highest",
                                preferred_element_type=adt)
                acc = acc + jnp.sum(q - l2, axis=1).astype(acc.dtype)
            acc = acc + _overflow_residual_sq(plan, m_vals)
            return acc + jnp.asarray(
                plan.n_missing_diag + plan.n_bucket_diag, acc.dtype)
        for g, dpos, off, w in zip(plan.gvals, plan.diag_pos,
                                   plan.win_off, plan.win_w):
            R, cp = g.shape[0], g.shape[1]
            kwin = jax.lax.slice(
                m_vals, (0, off), (B, off + R * w)
            ).reshape(B, R, w).astype(g.dtype)
            y = jnp.einsum("rcm,brm->brc", g, kwin,
                           precision="highest", preferred_element_type=adt)
            e = (jnp.arange(cp, dtype=jnp.int32)[None, :]
                 == dpos[:, None]).astype(y.dtype)                 # [R, cp]
            acc = acc + jnp.sum(
                jnp.square(y - e[None]), axis=(1, 2)).astype(acc.dtype)
        acc = acc + _overflow_residual_sq(plan, m_vals)
        return acc + jnp.asarray(plan.n_missing_diag, acc.dtype)
    if plan.compress == "gram":
        # Σ_r k_rᵀH_rk_r − linᵀk_r + consts (see build_rowblock_plan —
        # ~4–5× fewer FLOPs/bytes than the explicit product; ~1e-3-class
        # relative precision from the expanded-square cancellation)
        kt = jnp.concatenate(
            [m_vals, jnp.zeros((B, 1), m_vals.dtype)], axis=1).T
        for h, idx, lin in zip(plan.gvals, plan.win_idx, plan.lin):
            kwin = kt[idx].astype(h.dtype)               # [R, mp, B]
            t = jnp.einsum("rmn,rnb->rmb", h, kwin,
                           precision="highest",
                           preferred_element_type=_acc_dtype(h.dtype))
            q = jnp.sum(t * kwin.astype(t.dtype), axis=1)      # [R, B]
            l = jnp.einsum("rm,rmb->rb", lin, kwin,
                           precision="highest",
                           preferred_element_type=_acc_dtype(h.dtype))
            acc = acc + jnp.sum(q - l, axis=0).astype(acc.dtype)
        acc = acc + _overflow_residual_sq(plan, m_vals)
        return acc + jnp.asarray(
            plan.n_missing_diag + plan.n_bucket_diag, acc.dtype)
    if plan.layout == "mc":
        # batch on MXU sublanes, C columns on lanes: each row's product is
        # [B, mp] @ [mp, cp] — the lane dimension is cp (≫ B for every
        # practical batch) instead of B, so the MXU stops idling 1−B/128
        # of its lanes at small batch (VERDICT r2 weak #5)
        k2 = jnp.concatenate(
            [m_vals, jnp.zeros((B, 1), m_vals.dtype)], axis=1)  # [B, nnz+1]
        for g, idx, dpos in zip(plan.gvals, plan.win_idx, plan.diag_pos):
            kwin = k2[:, idx]                            # [B, R, mp]
            y = jnp.einsum("brm,rmc->brc", kwin.astype(g.dtype), g,
                           precision="highest",
                           preferred_element_type=_acc_dtype(g.dtype))
            cp = g.shape[2]
            e = (jnp.arange(cp, dtype=jnp.int32)[None, :]
                 == dpos[:, None]).astype(y.dtype)       # [R, cp] δ slots
            acc = acc + jnp.sum(
                jnp.square(y - e[None]), axis=(1, 2)).astype(acc.dtype)
        acc = acc + _overflow_residual_sq(plan, m_vals)
        return acc + jnp.asarray(plan.n_missing_diag, acc.dtype)
    kt = jnp.concatenate(
        [m_vals, jnp.zeros((B, 1), m_vals.dtype)], axis=1).T   # [nnz+1, B]
    for g, idx, dpos in zip(plan.gvals, plan.win_idx, plan.diag_pos):
        kwin = kt[idx]                                   # [R, mp, B]
        # bf16 G (gemm_dtype=bfloat16 plans: half the G-read traffic, the
        # reward's bound) still accumulates f32 on the MXU
        y = jnp.einsum("rcm,rmb->rcb", g, kwin.astype(g.dtype),
                       precision="highest",
                       preferred_element_type=_acc_dtype(g.dtype))
        cp = g.shape[1]
        e = (jnp.arange(cp, dtype=jnp.int32)[None, :]
             == dpos[:, None]).astype(y.dtype)           # [R, cp] δ slots
        acc = acc + jnp.sum(
            jnp.square(y - e[..., None]), axis=(0, 1)).astype(acc.dtype)
    acc = acc + _overflow_residual_sq(plan, m_vals)
    return acc + jnp.asarray(plan.n_missing_diag, acc.dtype)


def _overflow_residual_sq(plan: RowBlockPlan, m_vals: jax.Array) -> jax.Array:
    """Σ(c − δ)² over the overflow slots (gather sub-plan).  [B, nnz] → [B];
    exactly 0 when no rows overflowed."""
    if plan.n_overflow_slots == 0:
        return jnp.zeros((m_vals.shape[0],), m_vals.dtype)
    prod = m_vals[:, plan.ov_pair_m] * plan.ov_w[None, :].astype(m_vals.dtype)
    c = jax.vmap(lambda p: jax.ops.segment_sum(
        p, plan.ov_seg, num_segments=plan.n_overflow_slots))(prod)
    c = c - plan.ov_diag.astype(c.dtype)[None, :]
    return jnp.sum(c * c, axis=-1)


def residual_norm_batch(plan: RowBlockPlan, m_vals: jax.Array) -> jax.Array:
    # gram compress evaluates the expanded quadratic k'Hk − lin'k + const;
    # its ~eps·n cancellation can leave the sum slightly negative when the
    # true residual is tiny — clamp so sqrt never NaNs the reward.
    return jnp.sqrt(jnp.maximum(residual_sq_batch(plan, m_vals), 0.0))


def numeric(plan: RowBlockPlan, m_vals: jax.Array) -> jax.Array:
    """Values of C = M·A on the (row-major) static pattern — the rowblock
    equivalent of ``SpGEMMPlan.numeric`` (testing / C-materializing users;
    the reward path never calls this)."""
    if plan.compress == "gram":
        raise NotImplementedError(
            "gram-compressed plans carry quadratic forms, not G — C values "
            "are unavailable (build with compress='none' for numeric())")
    kt = jnp.concatenate([m_vals, jnp.zeros((1,), m_vals.dtype)])
    out = jnp.zeros((plan.out_nnz + 1,), m_vals.dtype)
    spec = "rcm,rm->rc" if plan.layout == "cm" else "rmc,rm->rc"
    for g, idx, opos in zip(plan.gvals, plan.win_idx, plan.out_pos):
        y = jnp.einsum(spec, g, kt[idx].astype(g.dtype),
                       precision="highest",
                       preferred_element_type=_acc_dtype(g.dtype))
        out = out.at[opos.ravel()].set(y.ravel().astype(out.dtype))
    if plan.n_overflow_slots:
        c = jax.ops.segment_sum(
            m_vals[plan.ov_pair_m] * plan.ov_w.astype(m_vals.dtype),
            plan.ov_seg, num_segments=plan.n_overflow_slots)
        out = out.at[plan.ov_out_pos].set(c)
    return out[: plan.out_nnz]


def out_coo(plan: RowBlockPlan, c_data: jax.Array) -> COO:
    return COO(row=plan.out_row, col=plan.out_col, data=c_data,
               shape=plan.shape)
