"""Classic (static-pattern) SPAI:  min ‖A·M − I‖_F columnwise by batched QR.

The north-star capability beyond the reference (BASELINE.json:5): for a
prescribed sparsity pattern, each column solves the small dense least-squares
problem  min ‖A[I_j, J_j]·m_j − e_j[I_j]‖₂  where J_j is the allowed support
of column j and I_j the union of A's row patterns over J_j.

TPU-native shape: the per-column problems are ragged, so columns are
*bucketed* by padded problem size (SURVEY.md §7 hard part #6) and each
bucket is one ``vmap``-ed dense QR solve on [C, mI, mJ] tensors — batched
small matmuls that ride the MXU.  Symbolic work (index sets, bucketing,
gather plans) runs host-side once per pattern.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.convert import coo_sort_dedup, coo_to_scipy
from ..sparse.types import COO


def power_pattern(a: COO, k: int = 1, max_nnz_per_col: int | None = None) -> COO:
    """Pattern of A^k (boolean product, host-side) as an all-ones COO —
    the standard static SPAI pattern family."""
    A = coo_to_scipy(a)
    B = (abs(A) > 0).astype(np.int8)
    P = B.copy()
    for _ in range(k - 1):
        P = ((P @ B) > 0).astype(np.int8)
    P = P.tocsc()
    if max_nnz_per_col is not None:
        # keep the largest-|A^k| entries per column (weight = walk counts)
        W = abs(A)
        for _ in range(k - 1):
            W = W @ abs(A)
        W = W.tocsc()
        Pt = P.T.tolil()     # lil is row-major: row j of Pᵀ = column j of P
        for j in range(Pt.shape[0]):
            rows = np.asarray(Pt.rows[j])
            if len(rows) > max_nnz_per_col:
                w = np.asarray(W[rows, j].todense()).ravel()
                keep = rows[np.argsort(-w, kind="stable")[:max_nnz_per_col]]
                Pt.rows[j] = sorted(int(r) for r in keep)
                Pt.data[j] = [1] * max_nnz_per_col
        P = Pt.T.tocsc()
    coo = P.tocoo()
    return coo_sort_dedup(
        COO(
            row=jnp.asarray(coo.row, jnp.int32),
            col=jnp.asarray(coo.col, jnp.int32),
            data=jnp.ones(len(coo.row), a.data.dtype),
            shape=a.shape,
        )
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class _Bucket:
    cols: np.ndarray       # [C] column ids
    a_sub: jnp.ndarray     # [C, mI, mJ] dense gathered submatrices
    rhs: jnp.ndarray       # [C, mI] e_j restricted to I_j
    j_rows: np.ndarray     # [C, mJ] M-row index for each solution entry (−1 pad)


class SpaiPlan:
    """Host-built plan: per-column index sets bucketed by padded size.

    Fully vectorized symbolic phase (no per-column Python loop — measured
    ~60× at 250k columns, which makes the 1M-row config-2 problem build in
    seconds instead of ~20 minutes):

    * ``I_j`` (the union of A's row patterns over J_j) is exactly the
      column pattern of the boolean product ``|A|·|P|`` — one scipy SpGEMM.
    * the dense ``A[I_j, J_j]`` gathers become one global ``searchsorted``
      of the (row-major) nnz keys of A per bucket, chunked to bound memory.
    """

    _CHUNK = 65536   # bucket-fill chunk (bounds the [C, mI, mJ] temporaries)

    def __init__(self, a: COO, pattern: COO, pad: int = 8,
                 dtype=jnp.float32):
        A = coo_to_scipy(a).tocsc()
        P = coo_to_scipy(pattern).tocsc()
        n = a.shape[0]
        ncols = a.shape[1]
        self.shape = a.shape
        self.dtype = dtype

        # empty pattern columns fall back to {j} (parity with the reference
        # intent: every column solves at least the diagonal entry)
        P = P.copy()
        lenJ0 = np.diff(P.indptr)
        if (lenJ0 == 0).any():
            import scipy.sparse as sp

            empt = np.nonzero(lenJ0 == 0)[0]
            P = (P + sp.csc_matrix(
                (np.ones(len(empt)), (empt, empt)), shape=P.shape)).tocsc()
        S = ((abs(A) @ abs(P)) > 0).tocsc()          # I_j = S[:, j] pattern

        lenJ = np.diff(P.indptr)
        lenI = np.maximum(np.diff(S.indptr), 1)
        mJ_all = np.maximum(lenJ, 1)
        mJ_all = -(-mJ_all // pad) * pad
        # row budget must fit the live rows PLUS one unit row per padded
        # column (to keep R full-rank with zero padded solution entries)
        mI_all = lenI + (mJ_all - lenJ)
        mI_all = -(-mI_all // pad) * pad

        # global row-major nnz keys of A (base ncols+1 leaves room for the
        # out-of-range sentinels used by padded I rows / J columns)
        Ar = A.tocsr()
        Ar.sort_indices()
        base = np.int64(ncols + 1)
        a_rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(Ar.indptr))
        gkeys = a_rows * base + Ar.indices
        gdata = Ar.data

        sizes = np.stack([mI_all, mJ_all], 1)
        uniq, inv = np.unique(sizes, axis=0, return_inverse=True)
        self.buckets: List[_Bucket] = []
        for bi, (mI, mJ) in enumerate(uniq):
            js_all = np.nonzero(inv == bi)[0].astype(np.int32)
            subs, rhss, jrs = [], [], []
            for lo in range(0, len(js_all), self._CHUNK):
                js = js_all[lo:lo + self._CHUNK]
                C = len(js)
                ar = np.arange(mJ)
                validJ = ar[None, :] < lenJ[js][:, None]            # [C, mJ]
                Jpos = P.indptr[js][:, None] + np.minimum(
                    ar[None, :], np.maximum(lenJ[js][:, None] - 1, 0))
                J_mat = np.where(validJ, P.indices[Jpos], ncols)    # sentinel
                ai = np.arange(mI)
                validI = ai[None, :] < lenI[js][:, None]            # [C, mI]
                Ipos = S.indptr[js][:, None] + np.minimum(
                    ai[None, :], np.maximum(lenI[js][:, None] - 1, 0))
                I_mat = np.where(validI, S.indices[Ipos], n)        # sentinel

                keys = (I_mat[:, :, None].astype(np.int64) * base
                        + J_mat[:, None, :])                        # [C,mI,mJ]
                pos = np.searchsorted(gkeys, keys.ravel())
                pos_c = np.minimum(pos, len(gkeys) - 1)
                hit = (pos < len(gkeys)) & (gkeys[pos_c] == keys.ravel())
                a_sub = np.where(hit, gdata[pos_c], 0.0).reshape(C, mI, mJ)

                # padded columns: unit entry on a dedicated tail row so QR
                # stays full-rank and padded solution entries are zero
                padJ = ~validJ                                      # [C, mJ]
                tail_rows = (mI - mJ + ar)[None, :]                 # [1, mJ]
                c_ids = np.broadcast_to(np.arange(C)[:, None], padJ.shape)
                t_ids = np.broadcast_to(ar[None, :], padJ.shape)
                r_ids = np.broadcast_to(tail_rows, padJ.shape)
                a_sub[c_ids[padJ], r_ids[padJ], t_ids[padJ]] = 1.0

                rhs = (I_mat == js[:, None]).astype(np.float64)     # e_j|I
                j_rows = np.where(validJ, J_mat, -1).astype(np.int32)
                subs.append(a_sub); rhss.append(rhs); jrs.append(j_rows)
            self.buckets.append(_Bucket(
                cols=js_all,
                a_sub=jnp.asarray(np.concatenate(subs), dtype),
                rhs=jnp.asarray(np.concatenate(rhss), dtype),
                j_rows=np.concatenate(jrs),
            ))

    def solve(self) -> COO:
        """Solve every bucket (vmapped QR) and assemble M as COO."""
        rows_out, cols_out, vals_out = [], [], []

        @jax.jit
        def solve_bucket(a_sub, rhs):
            q, r = jnp.linalg.qr(a_sub)                 # [C,mI,mJ],[C,mJ,mJ]
            # TPU matmul default is one bf16 pass — not enough for the
            # least-squares projection (the QR itself runs full f32)
            qtb = jnp.einsum("cij,ci->cj", q, rhs, precision="highest")
            return jax.scipy.linalg.solve_triangular(r, qtb[..., None],
                                                     lower=False)[..., 0]

        for b in self.buckets:
            m = np.asarray(solve_bucket(b.a_sub, b.rhs))     # [C, mJ]
            live = b.j_rows >= 0
            c_ids = np.broadcast_to(b.cols[:, None], b.j_rows.shape)
            rows_out.append(b.j_rows[live])
            cols_out.append(c_ids[live])
            vals_out.append(m[live])

        return coo_sort_dedup(COO(
            row=jnp.asarray(np.concatenate(rows_out), jnp.int32),
            col=jnp.asarray(np.concatenate(cols_out), jnp.int32),
            data=jnp.asarray(np.concatenate(vals_out), self.dtype),
            shape=self.shape,
        ), sum_duplicates=False)


def spai_classic(a: COO, pattern: COO | None = None, k: int = 1,
                 pad: int = 8, dtype=jnp.float32) -> COO:
    """One-call classic SPAI: M minimising ‖A·M − I‖_F on ``pattern``
    (default: pattern of A^k)."""
    if pattern is None:
        pattern = power_pattern(a, k)
    return SpaiPlan(a, pattern, pad=pad, dtype=dtype).solve()
