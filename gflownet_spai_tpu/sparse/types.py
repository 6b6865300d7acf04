"""Sparse matrix containers as JAX pytrees.

TPU-native design notes
-----------------------
Unlike the reference's ``torch.sparse_coo_tensor`` objects (which carry dynamic
nnz and are manipulated with Python loops, e.g. reference
``gflownet/utils.py:295-356``), these containers are registered pytrees with
*static* shape/nnz metadata so every operation on them jit-compiles with static
shapes.  Values/indices are plain ``jnp`` arrays:

* ``COO``  — coordinate triples, the interchange format (Matrix Market IO,
  conversions).  Parity with ``market_matrix_to_sparse_tensor``
  (reference gflownet/utils.py:54-63).
* ``CSR``  — compressed sparse row; canonical compute format for SpMV/SpMM.
* ``ELL``  — padded ELLPACK (row-major fixed width).  This is the *TPU*
  execution format: a static-width gather + multiply + row-reduce maps onto
  the VPU with no scatter, and is what the Pallas kernels consume.
* ``BSR``  — block CSR with dense ``(bm, bn)`` blocks; blocks ride the MXU.

All index arrays are ``int32`` (TPU-native word), values default ``float32``.
Padding convention: padded entries have column index pointing at a valid
location (0) and value 0, so no masking is needed in inner loops.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Shape = Tuple[int, int]


def _register(cls):
    """Register a dataclass as a pytree: array fields are leaves, the rest static."""
    data_fields = [f.name for f in dataclasses.fields(cls) if f.metadata.get("pytree", True)]
    meta_fields = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("pytree", True)]
    jax.tree_util.register_dataclass(cls, data_fields, meta_fields)
    return cls


def static_field():
    return dataclasses.field(metadata={"pytree": False})


@_register
@dataclasses.dataclass(frozen=True)
class COO:
    """Coordinate-format sparse matrix. ``row``/``col``: int32[nnz], ``data``: [nnz]."""

    row: jax.Array
    col: jax.Array
    data: jax.Array
    shape: Shape = static_field()

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.data.dtype)
        return out.at[self.row, self.col].add(self.data)

    @staticmethod
    def fromdense(a, tol: float = 0.0) -> "COO":
        a = np.asarray(a)
        r, c = np.nonzero(np.abs(a) > tol)
        return COO(
            row=jnp.asarray(r, jnp.int32),
            col=jnp.asarray(c, jnp.int32),
            data=jnp.asarray(a[r, c]),
            shape=a.shape,
        )

    def with_data(self, data: jax.Array) -> "COO":
        return dataclasses.replace(self, data=data)


@_register
@dataclasses.dataclass(frozen=True)
class CSR:
    """Compressed sparse row. ``indptr``: int32[nrows+1], ``indices``: int32[nnz]."""

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    shape: Shape = static_field()

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    def todense(self) -> jax.Array:
        return self.tocoo().todense()

    def tocoo(self) -> COO:
        # repeat(row i, rowlen i) with static output size = nnz
        counts = jnp.diff(self.indptr)
        row = jnp.repeat(
            jnp.arange(self.shape[0], dtype=jnp.int32), counts, total_repeat_length=self.nnz
        )
        return COO(row=row, col=self.indices, data=self.data, shape=self.shape)

    def with_data(self, data: jax.Array) -> "CSR":
        return dataclasses.replace(self, data=data)


@_register
@dataclasses.dataclass(frozen=True)
class ELL:
    """Padded ELLPACK: ``cols``: int32[nrows, width], ``data``: [nrows, width].

    Padded slots hold col=0, data=0 — safe to gather and FMA without masking.
    This is the execution format of the TPU SpMV kernels (static width, no
    scatter, lane-friendly gathers).
    """

    cols: jax.Array
    data: jax.Array
    shape: Shape = static_field()

    @property
    def width(self) -> int:
        return int(self.data.shape[1])

    @property
    def dtype(self):
        return self.data.dtype

    def todense(self) -> jax.Array:
        nrows = self.shape[0]
        rows = jnp.broadcast_to(
            jnp.arange(nrows, dtype=jnp.int32)[:, None], self.cols.shape
        )
        out = jnp.zeros(self.shape, self.data.dtype)
        return out.at[rows.ravel(), self.cols.ravel()].add(self.data.ravel())


@_register
@dataclasses.dataclass(frozen=True)
class BSR:
    """Block CSR: dense ``(bm, bn)`` blocks so products ride the MXU.

    ``indptr``: int32[nrows/bm + 1], ``indices``: int32[nblocks] (block-col ids),
    ``data``: [nblocks, bm, bn].
    """

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    shape: Shape = static_field()

    @property
    def blockshape(self) -> Shape:
        return (int(self.data.shape[1]), int(self.data.shape[2]))

    @property
    def nblocks(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    def todense(self) -> jax.Array:
        bm, bn = self.blockshape
        n_block_rows = self.shape[0] // bm
        counts = jnp.diff(self.indptr)
        brow = jnp.repeat(
            jnp.arange(n_block_rows, dtype=jnp.int32),
            counts,
            total_repeat_length=self.nblocks,
        )
        out = jnp.zeros(
            (n_block_rows, self.shape[1] // bn, bm, bn), self.data.dtype
        )
        out = out.at[brow, self.indices].add(self.data)
        return out.transpose(0, 2, 1, 3).reshape(self.shape)


SparseMatrix = (COO, CSR, ELL, BSR)
