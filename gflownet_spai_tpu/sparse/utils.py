"""Sparse-tensor utility surface — parity with reference gflownet/utils.py.

The reference round-trips matrices through flat ``1×n²`` COO tensors
(``resize_sparse_tensor`` :89-126 / ``resize_sparse_tensor_to_flat``
:128-164) and builds one-hot / concatenated sparse tensors (:169-226).
The TPU design doesn't need those shapes internally (states are dense
masks), but the utilities are part of the public capability surface, so
they're provided here on the COO container.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import COO


def flatten_coo(coo: COO) -> COO:
    """[m, n] → [1, m·n] with linear indices ``row·n + col`` (parity:
    ``resize_sparse_tensor_to_flat``, utils.py:128-164)."""
    m, n = coo.shape
    lin = coo.row.astype(jnp.int64) * n + coo.col.astype(jnp.int64)
    return COO(
        row=jnp.zeros_like(coo.row),
        col=lin.astype(coo.col.dtype if m * n < 2**31 else jnp.int64),
        data=coo.data,
        shape=(1, m * n),
    )


def unflatten_coo(coo: COO, shape) -> COO:
    """[1, m·n] → [m, n] (parity: ``resize_sparse_tensor``, utils.py:89-126)."""
    m, n = shape
    if coo.shape != (1, m * n):
        raise ValueError(
            f"cannot unflatten {coo.shape} into {shape}: element counts differ"
        )
    lin = coo.col.astype(jnp.int64)
    return COO(
        row=(lin // n).astype(jnp.int32),
        col=(lin % n).astype(jnp.int32),
        data=coo.data,
        shape=(m, n),
    )


def sparse_one_hot(indices: jax.Array, num_classes: int) -> COO:
    """[B] indices → sparse one-hot [B, num_classes] (parity:
    ``sparse_one_hot``, utils.py:169-185)."""
    b = indices.shape[0]
    return COO(
        row=jnp.arange(b, dtype=jnp.int32),
        col=indices.astype(jnp.int32),
        data=jnp.ones((b,), jnp.float32),
        shape=(b, num_classes),
    )


def concat_coo(mats, axis: int = 0) -> COO:
    """Concatenate COO matrices along an axis (parity:
    ``concatenate_sparse_tensors``, utils.py:188-226)."""
    if axis not in (0, 1):
        raise ValueError("axis must be 0 or 1")
    rows, cols, vals = [], [], []
    offset = 0
    other = None
    for m in mats:
        if other is None:
            other = m.shape[1 - axis]
        elif m.shape[1 - axis] != other:
            raise ValueError("non-concat dims must match")
        r = m.row + (offset if axis == 0 else 0)
        c = m.col + (offset if axis == 1 else 0)
        rows.append(r)
        cols.append(c)
        vals.append(m.data)
        offset += m.shape[axis]
    shape = (offset, other) if axis == 0 else (other, offset)
    return COO(
        row=jnp.concatenate(rows),
        col=jnp.concatenate(cols),
        data=jnp.concatenate(vals),
        shape=shape,
    )


def delete_edges_flat(coo: COO, edge_positions: jax.Array) -> COO:
    """Apply a delete-action list and emit the flat [1, n²] tensor — the
    exact shape of the reference's ``update_edges_and_convert_to_sparse``
    (utils.py:295-356): positions index the (sorted) nonzero list; deleted
    entries get value 0 (pattern retained for static shapes)."""
    valid = (edge_positions >= 0) & (edge_positions < coo.nnz)
    idx = jnp.where(valid, edge_positions, coo.nnz)   # dump slot for padding
    keep = jnp.ones((coo.nnz + 1,), bool).at[idx].set(False)[: coo.nnz]
    masked = COO(row=coo.row, col=coo.col,
                 data=coo.data * keep.astype(coo.data.dtype), shape=coo.shape)
    return flatten_coo(masked)
