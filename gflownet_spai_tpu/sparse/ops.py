"""Pure-JAX reference implementations of the sparse ops.

These are the semantic oracles (jit-compilable, differentiable, correct on
CPU/TPU) that the Pallas kernels in ``gflownet_spai_tpu.ops`` are tested
against and substituted for on the hot path.  Replaces the reference's L0
``torch.sparse`` kernels (SURVEY.md §2 row L0; e.g. ``torch.mm`` at
reference preconditioner.py:88).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .types import BSR, COO, CSR, ELL


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------

def spmv_coo(a: COO, x: jax.Array) -> jax.Array:
    return jax.ops.segment_sum(
        a.data * x[a.col], a.row, num_segments=a.shape[0]
    )


def spmv_csr(a: CSR, x: jax.Array) -> jax.Array:
    return spmv_coo(a.tocoo(), x)


def spmv_ell(a: ELL, x: jax.Array) -> jax.Array:
    # gather + FMA + row reduce; no scatter.  Padded slots contribute 0.
    return jnp.sum(a.data * x[a.cols], axis=1)


def spmv_bsr(a: BSR, x: jax.Array) -> jax.Array:
    bm, bn = a.blockshape
    counts = jnp.diff(a.indptr)
    brow = jnp.repeat(
        jnp.arange(a.shape[0] // bm, dtype=jnp.int32),
        counts,
        total_repeat_length=a.nblocks,
    )
    xb = x.reshape(-1, bn)[a.indices]          # [nblocks, bn]
    yb = jnp.einsum("kij,kj->ki", a.data, xb,
                    precision="highest")  # MXU per-block matvec, true f32
    out = jax.ops.segment_sum(yb, brow, num_segments=a.shape[0] // bm)
    return out.reshape(a.shape[0])


def spmv(a, x: jax.Array) -> jax.Array:
    if isinstance(a, COO):
        return spmv_coo(a, x)
    if isinstance(a, CSR):
        return spmv_csr(a, x)
    if isinstance(a, ELL):
        return spmv_ell(a, x)
    if isinstance(a, BSR):
        return spmv_bsr(a, x)
    return a @ x


# ---------------------------------------------------------------------------
# SpMM (sparse × dense)
# ---------------------------------------------------------------------------

def spmm_coo(a: COO, b: jax.Array) -> jax.Array:
    return jax.ops.segment_sum(
        a.data[:, None] * b[a.col], a.row, num_segments=a.shape[0]
    )


def spmm_ell(a: ELL, b: jax.Array) -> jax.Array:
    # [nrows, width, ncols_b] gather — contiguous in the lane dim.
    return jnp.einsum("rw,rwc->rc", a.data, b[a.cols],
                      precision="highest")


def spmm_bsr(a: BSR, b: jax.Array) -> jax.Array:
    bm, bn = a.blockshape
    counts = jnp.diff(a.indptr)
    brow = jnp.repeat(
        jnp.arange(a.shape[0] // bm, dtype=jnp.int32),
        counts,
        total_repeat_length=a.nblocks,
    )
    bb = b.reshape(-1, bn, b.shape[1])[a.indices]      # [nblocks, bn, k]
    yb = jnp.einsum("kij,kjc->kic", a.data, bb,
                    precision="highest")  # MXU block matmuls, true f32
    out = jax.ops.segment_sum(yb, brow, num_segments=a.shape[0] // bm)
    return out.reshape(a.shape[0], b.shape[1])


def spmm(a, b: jax.Array) -> jax.Array:
    if isinstance(a, COO):
        return spmm_coo(a, b)
    if isinstance(a, CSR):
        return spmm_coo(a.tocoo(), b)
    if isinstance(a, ELL):
        return spmm_ell(a, b)
    if isinstance(a, BSR):
        return spmm_bsr(a, b)
    return a @ b


# ---------------------------------------------------------------------------
# Fixed-pattern SpGEMM:  C = A @ B where pattern(C) is precomputed.
# ---------------------------------------------------------------------------

class SpGEMMPlan:
    """Symbolic product plan for ``C = A @ B`` with static patterns.

    The reference recomputes a full sparse×sparse product per reward call
    (``torch.mm`` at preconditioner.py:88).  On TPU we exploit that the
    patterns of A and B never change during training (only values do —
    SURVEY.md §7 "hard parts" #1): the symbolic phase runs once on the host,
    after which the numeric phase is a static gather + multiply +
    segment-sum, jit/vmap/grad-friendly.

    Attributes (all device arrays, static shapes):
      out_row/out_col : pattern of C             int32[out_nnz]
      pair_a          : index into A.data        int32[npairs]
      pair_b          : index into B.data        int32[npairs]
      pair_out        : index into C.data        int32[npairs] (sorted asc)
    """

    def __init__(self, a_coo: COO, b_coo: COO):
        ar, ac = np.asarray(a_coo.row), np.asarray(a_coo.col)
        br, bc = np.asarray(b_coo.row), np.asarray(b_coo.col)
        n_mid = a_coo.shape[1]
        if b_coo.shape[0] != n_mid:
            raise ValueError("inner dims mismatch")

        # native symbolic phase (requires row-sorted B so CSR data order
        # matches b_coo.data order)
        from .. import native
        b_key = br.astype(np.int64) * b_coo.shape[1] + bc.astype(np.int64)
        if native.available() and (len(b_key) == 0 or np.all(np.diff(b_key) >= 0)):
            indptr_b = np.zeros(n_mid + 1, np.int64)
            np.add.at(indptr_b, br.astype(np.int64) + 1, 1)
            indptr_b = np.cumsum(indptr_b)
            orow, ocol, pa, pb, po = native.spgemm_plan(
                ar, ac, n_mid, b_coo.shape[1], indptr_b, bc
            )
            self.shape = (a_coo.shape[0], b_coo.shape[1])
            self.out_row = jnp.asarray(orow, jnp.int32)
            self.out_col = jnp.asarray(ocol, jnp.int32)
            self.pair_a = jnp.asarray(pa, jnp.int32)
            self.pair_b = jnp.asarray(pb, jnp.int32)
            self.pair_out = jnp.asarray(po, jnp.int32)
            self.out_nnz = int(len(orow))
            self.npairs = int(len(pa))
            return
        # bucket B's entries by row (= A's col) to enumerate contributing pairs
        order_b = np.argsort(br, kind="stable")
        br_s, idx_b = br[order_b], order_b
        starts = np.searchsorted(br_s, np.arange(n_mid))
        ends = np.searchsorted(br_s, np.arange(n_mid) + 1)
        counts = (ends - starts)[ac]
        pair_a = np.repeat(np.arange(len(ar)), counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(counts.sum()) - np.repeat(offs[:-1], counts)
        pair_b = idx_b[starts[ac[pair_a]] + within]
        out_r = ar[pair_a].astype(np.int64)
        out_c = bc[pair_b].astype(np.int64)
        key = out_r * b_coo.shape[1] + out_c
        uniq, inv = np.unique(key, return_inverse=True)
        order = np.argsort(inv, kind="stable")

        self.shape = (a_coo.shape[0], b_coo.shape[1])
        self.out_row = jnp.asarray(uniq // b_coo.shape[1], jnp.int32)
        self.out_col = jnp.asarray(uniq % b_coo.shape[1], jnp.int32)
        self.pair_a = jnp.asarray(pair_a[order], jnp.int32)
        self.pair_b = jnp.asarray(pair_b[order], jnp.int32)
        self.pair_out = jnp.asarray(inv[order], jnp.int32)
        self.out_nnz = int(len(uniq))
        self.npairs = int(len(pair_a))

    def numeric(self, a_data: jax.Array, b_data: jax.Array) -> jax.Array:
        """Values of C on the precomputed pattern (segment-sum over pairs)."""
        prod = a_data[self.pair_a] * b_data[self.pair_b]
        return jax.ops.segment_sum(
            prod, self.pair_out, num_segments=self.out_nnz,
            indices_are_sorted=True,
        )

    def out_coo(self, c_data: jax.Array) -> COO:
        return COO(row=self.out_row, col=self.out_col, data=c_data, shape=self.shape)


def spgemm(a: COO, b: COO) -> COO:
    """General sparse×sparse product (symbolic + numeric in one call)."""
    plan = SpGEMMPlan(a, b)
    return plan.out_coo(plan.numeric(a.data, b.data))


# ---------------------------------------------------------------------------
# Norms / residuals
# ---------------------------------------------------------------------------

def frobenius_sq_minus_identity(row, col, data, n: int) -> jax.Array:
    """``‖ C − I ‖_F²`` for sparse C given in COO arrays (pattern static).

    Diagonal positions missing from the pattern each contribute 1; we add
    them via the closed form  ‖C−I‖² = Σ c² − 2 Σ_diag c + n .
    Accumulates in float32 with a compensated two-pass layout adequate for
    the parity tolerances (SURVEY.md §7 hard part #5).
    """
    diag = (row == col).astype(data.dtype)
    s2 = jnp.sum(data * data)
    sd = jnp.sum(diag * data)
    return s2 - 2.0 * sd + jnp.asarray(n, data.dtype)


def transpose_perm(coo: COO) -> np.ndarray:
    """Host-side permutation mapping COO entries to the transposed (col-major)
    order; used to build static transpose plans."""
    r, c = np.asarray(coo.row), np.asarray(coo.col)
    key = c.astype(np.int64) * coo.shape[0] + r
    return np.argsort(key, kind="stable")


def eye_coo(n: int, dtype=jnp.float32) -> COO:
    idx = jnp.arange(n, dtype=jnp.int32)
    return COO(row=idx, col=idx, data=jnp.ones(n, dtype), shape=(n, n))
