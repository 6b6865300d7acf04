"""Format conversions between sparse containers.

Sparsity *patterns* are static for the lifetime of a model/env instance
(the reference never changes structure inside the hot path either — see
SURVEY.md §3.1), so conversions run host-side in NumPy at setup time and
produce device arrays once.  Value-only updates reuse ``with_data``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .types import BSR, COO, CSR, ELL


def _np(x):
    return np.asarray(x)


def coo_sort_dedup(coo: COO, sum_duplicates: bool = True) -> COO:
    """Canonicalise a COO matrix: row-major sort, duplicates summed.

    Parity: ``torch.sparse_coo_tensor(...).coalesce()`` in the reference
    (e.g. gflownet/utils.py:124).
    """
    row, col, data = _np(coo.row), _np(coo.col), _np(coo.data)
    n = coo.shape[1]
    key = row.astype(np.int64) * n + col.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key, data = key[order], data[order]
    if sum_duplicates and len(key):
        uniq, inv = np.unique(key, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=data.dtype)
        np.add.at(summed, inv, data)
        key, data = uniq, summed
    return COO(
        row=jnp.asarray(key // n, jnp.int32),
        col=jnp.asarray(key % n, jnp.int32),
        data=jnp.asarray(data),
        shape=coo.shape,
    )


def coo_to_csr(coo: COO, canonical: bool = False) -> CSR:
    if not canonical:
        coo = coo_sort_dedup(coo)
    row = _np(coo.row)
    indptr = np.zeros(coo.shape[0] + 1, dtype=np.int32)
    np.add.at(indptr, row + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int32)
    return CSR(
        indptr=jnp.asarray(indptr),
        indices=coo.col,
        data=coo.data,
        shape=coo.shape,
    )


def csr_to_ell(csr: CSR, width: int | None = None, pad_multiple: int = 1) -> ELL:
    """CSR → padded ELLPACK.  ``width`` defaults to the max row length,
    rounded up to ``pad_multiple`` (use 128 to align the lane dimension
    for Pallas kernels)."""
    indptr, indices, data = _np(csr.indptr), _np(csr.indices), _np(csr.data)
    counts = np.diff(indptr)
    w = int(counts.max()) if len(counts) and width is None else (width or 1)
    w = max(w, 1)
    w = -(-w // pad_multiple) * pad_multiple
    nrows = csr.shape[0]
    cols = np.zeros((nrows, w), dtype=np.int32)
    vals = np.zeros((nrows, w), dtype=data.dtype)
    for i in range(nrows):
        lo, hi = indptr[i], indptr[i + 1]
        k = hi - lo
        if k > w:
            raise ValueError(f"row {i} has {k} nnz > ELL width {w}")
        cols[i, :k] = indices[lo:hi]
        vals[i, :k] = data[lo:hi]
    return ELL(cols=jnp.asarray(cols), data=jnp.asarray(vals), shape=csr.shape)


def csr_to_bsr(csr: CSR, blockshape=(8, 128)) -> BSR:
    """CSR → block CSR.  The matrix is zero-padded conceptually to block
    multiples; only blocks containing at least one nonzero are stored."""
    bm, bn = blockshape
    m, n = csr.shape
    if m % bm or n % bn:
        raise ValueError(f"shape {csr.shape} not divisible by block {blockshape}")
    indptr, indices, data = _np(csr.indptr), _np(csr.indices), _np(csr.data)
    counts = np.diff(indptr)
    row = np.repeat(np.arange(m, dtype=np.int32), counts)
    brow, bcol = row // bm, indices // bn
    key = brow.astype(np.int64) * (n // bn) + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    blocks = np.zeros((len(uniq), bm, bn), dtype=data.dtype)
    blocks[inv, row % bm, indices % bn] = data
    ub_row = (uniq // (n // bn)).astype(np.int32)
    ub_col = (uniq % (n // bn)).astype(np.int32)
    bindptr = np.zeros(m // bm + 1, dtype=np.int32)
    np.add.at(bindptr, ub_row + 1, 1)
    bindptr = np.cumsum(bindptr, dtype=np.int32)
    return BSR(
        indptr=jnp.asarray(bindptr),
        indices=jnp.asarray(ub_col),
        data=jnp.asarray(blocks),
        shape=csr.shape,
    )


def to_coo(x) -> COO:
    if isinstance(x, COO):
        return x
    if isinstance(x, CSR):
        return x.tocoo()
    if isinstance(x, (ELL, BSR)):
        return COO.fromdense(np.asarray(x.todense()))
    return COO.fromdense(x)


def scipy_to_coo(sp_matrix) -> COO:
    """scipy.sparse → COO (offline setup path, e.g. ILU seed patterns)."""
    c = sp_matrix.tocoo()
    return coo_sort_dedup(
        COO(
            row=jnp.asarray(c.row, jnp.int32),
            col=jnp.asarray(c.col, jnp.int32),
            data=jnp.asarray(c.data),
            shape=c.shape,
        )
    )


def coo_to_scipy(coo: COO):
    import scipy.sparse as sp

    return sp.coo_matrix(
        (_np(coo.data), (_np(coo.row), _np(coo.col))), shape=coo.shape
    ).tocsr()
