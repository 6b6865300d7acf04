"""Reverse Cuthill–McKee bandwidth reduction (host-side, first-party).

The bridge from unstructured matrices to the TPU DIA fast path: RCM
permutes rows/columns to cluster nonzeros near the main diagonal, after
which ``coo_to_dia`` stores few distinct diagonals and SpMV runs at the
roofline (see ops.dia docstring).  Pure-NumPy BFS implementation, tested
against ``scipy.sparse.csgraph.reverse_cuthill_mckee``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sparse.types import COO
from ..sparse.convert import coo_sort_dedup, coo_to_scipy


def bandwidth(coo: COO) -> int:
    if coo.nnz == 0:
        return 0
    return int(np.abs(np.asarray(coo.row).astype(np.int64)
                      - np.asarray(coo.col).astype(np.int64)).max())


def n_diagonals(coo: COO) -> int:
    return int(len(np.unique(np.asarray(coo.col).astype(np.int64)
                             - np.asarray(coo.row).astype(np.int64))))


def rcm_permutation(coo: COO) -> np.ndarray:
    """RCM ordering of the symmetrized adjacency graph.  Returns ``perm``
    such that ``A[perm][:, perm]`` has (near-)minimal bandwidth."""
    n = coo.shape[0]
    A = coo_to_scipy(coo)
    G = (abs(A) + abs(A).T).tocsr()   # symmetrize
    indptr, indices = G.indptr, G.indices
    from .. import native
    if native.available():
        return native.rcm(indptr, indices)
    degree = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    # process components, starting each from a minimum-degree node
    by_degree = np.argsort(degree, kind="stable")
    for seed in by_degree:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        head, pos = pos, pos + 1
        while head < pos:
            u = order[head]
            head += 1
            nbrs = indices[indptr[u]:indptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if len(nbrs):
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                order[pos:pos + len(nbrs)] = nbrs
                pos += len(nbrs)
    return order[::-1].copy()   # the "reverse" in RCM


def permute(coo: COO, perm: np.ndarray) -> COO:
    """Symmetric permutation B = A[perm][:, perm] (B[i,j] = A[perm[i], perm[j]])."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return coo_sort_dedup(COO(
        row=jnp.asarray(inv[np.asarray(coo.row)], jnp.int32),
        col=jnp.asarray(inv[np.asarray(coo.col)], jnp.int32),
        data=coo.data,
        shape=coo.shape,
    ), sum_duplicates=False)


def rcm_reorder(coo: COO):
    """Convenience: returns (permuted matrix, perm).  Solve ``A x = b`` as
    ``B y = b[perm]; x[perm] = y``."""
    perm = rcm_permutation(coo)
    return permute(coo, perm), perm
