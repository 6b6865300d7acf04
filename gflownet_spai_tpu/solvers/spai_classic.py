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
    """Host-built plan: per-column index sets bucketed by padded size."""

    def __init__(self, a: COO, pattern: COO, pad: int = 8,
                 dtype=jnp.float32):
        A = coo_to_scipy(a).tocsc()
        P = coo_to_scipy(pattern).tocsc()
        n = a.shape[0]
        self.shape = a.shape
        self.dtype = dtype

        cols_J: List[np.ndarray] = []
        cols_I: List[np.ndarray] = []
        for j in range(n):
            J = P.indices[P.indptr[j]:P.indptr[j + 1]]
            if len(J) == 0:
                J = np.asarray([j], np.int32)
            I = np.unique(A[:, J].tocoo().row).astype(np.int32)
            cols_J.append(J.astype(np.int32))
            cols_I.append(I)

        buckets: Dict[Tuple[int, int], List[int]] = {}
        for j in range(n):
            mJ = _round_up(max(len(cols_J[j]), 1), pad)
            # row budget must fit the live rows PLUS one unit row per padded
            # column (to keep R full-rank with zero padded solution entries)
            mI = _round_up(max(len(cols_I[j]), 1) + (mJ - len(cols_J[j])), pad)
            buckets.setdefault((mI, mJ), []).append(j)

        Ad = A.tocsr()
        self.buckets: List[_Bucket] = []
        for (mI, mJ), js in sorted(buckets.items()):
            C = len(js)
            a_sub = np.zeros((C, mI, mJ), np.float64)
            rhs = np.zeros((C, mI), np.float64)
            j_rows = -np.ones((C, mJ), np.int32)
            for c, j in enumerate(js):
                I, J = cols_I[j], cols_J[j]
                sub = Ad[I][:, J].toarray()
                a_sub[c, :len(I), :len(J)] = sub
                # padded columns get a unit entry on a dedicated zero row so
                # QR stays full-rank and the padded solution entries are zero
                for t in range(len(J), mJ):
                    a_sub[c, mI - mJ + t, t] = 1.0
                pos = np.nonzero(I == j)[0]
                if len(pos):
                    rhs[c, pos[0]] = 1.0
                j_rows[c, :len(J)] = J
            self.buckets.append(_Bucket(
                cols=np.asarray(js, np.int32),
                a_sub=jnp.asarray(a_sub, dtype),
                rhs=jnp.asarray(rhs, dtype),
                j_rows=j_rows,
            ))

    def solve(self) -> COO:
        """Solve every bucket (vmapped QR) and assemble M as COO."""
        rows_out, cols_out, vals_out = [], [], []

        @jax.jit
        def solve_bucket(a_sub, rhs):
            q, r = jnp.linalg.qr(a_sub)                 # [C,mI,mJ],[C,mJ,mJ]
            qtb = jnp.einsum("cij,ci->cj", q, rhs)
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
