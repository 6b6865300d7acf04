"""Matrix Market IO (first-party, no scipy on the load path).

Parity target: ``market_matrix_to_sparse_tensor`` (reference
gflownet/utils.py:54-63) which loads ``.mtx`` → COO float64, and the CSR
loader ``load_mtx_file`` (reference GFlowNet100.py:44-46).  Supports the
coordinate and array formats, ``general``/``symmetric``/``skew-symmetric``
symmetry, real/integer/pattern fields.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from .types import COO
from .convert import coo_sort_dedup, coo_to_csr


def _open(path):
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def read_mtx(path, dtype=np.float64) -> COO:
    """Parse a Matrix Market file into a canonical (sorted) COO.

    Coordinate-format files use the native C++ parser when the library is
    built (``make -C native``); the pure-Python path below is the fallback
    and handles the array format."""
    if not str(path).endswith(".gz"):
        from .. import native
        if native.available():
            try:
                nr, nc, rows, cols, vals = native.parse_mtx(path)
                return COO(
                    row=jnp.asarray(rows, jnp.int32),
                    col=jnp.asarray(cols, jnp.int32),
                    data=jnp.asarray(vals.astype(dtype)),
                    shape=(nr, nc),
                )
            except ValueError:
                pass  # array format / unsupported header → Python path
    with _open(path) as f:
        header = f.readline().strip().lower().split()
        if len(header) < 5 or header[0] != "%%matrixmarket":
            raise ValueError(f"{path}: not a Matrix Market file")
        _, obj, fmt, field, symmetry = header[:5]
        if obj != "matrix":
            raise ValueError(f"{path}: unsupported object {obj!r}")
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        dims = line.split()
        if fmt == "coordinate":
            nrows, ncols, nnz = int(dims[0]), int(dims[1]), int(dims[2])
            body = np.loadtxt(f, ndmin=2) if nnz else np.zeros((0, 3))
            if body.shape[0] != nnz:
                raise ValueError(f"{path}: expected {nnz} entries, got {body.shape[0]}")
            row = body[:, 0].astype(np.int64) - 1
            col = body[:, 1].astype(np.int64) - 1
            if field == "pattern":
                data = np.ones(nnz, dtype=dtype)
            else:
                data = body[:, 2].astype(dtype)
        elif fmt == "array":
            nrows, ncols = int(dims[0]), int(dims[1])
            vals = np.loadtxt(f).ravel().astype(dtype)
            if symmetry == "general":
                full = vals.reshape(ncols, nrows).T  # column-major
                return COO.fromdense(full.astype(dtype))
            # symmetric array: lower triangle, column-major
            full = np.zeros((nrows, ncols), dtype=dtype)
            k = 0
            for j in range(ncols):
                for i in range(j, nrows):
                    full[i, j] = vals[k]
                    k += 1
            sign = -1.0 if symmetry == "skew-symmetric" else 1.0
            full = full + sign * np.triu(full.T, 1)
            return COO.fromdense(full)
        else:
            raise ValueError(f"{path}: unsupported format {fmt!r}")

    if symmetry in ("symmetric", "skew-symmetric", "hermitian"):
        off = row != col
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        row = np.concatenate([row, col[off]])
        col = np.concatenate([col, np.asarray(body[:, 0].astype(np.int64) - 1)[off]])
        data = np.concatenate([data, sign * data[off]])

    coo = COO(
        row=jnp.asarray(row, jnp.int32),
        col=jnp.asarray(col, jnp.int32),
        data=jnp.asarray(data),
        shape=(nrows, ncols),
    )
    return coo_sort_dedup(coo, sum_duplicates=False)


def write_mtx(path, coo: COO, comment: str = "") -> None:
    """Write a COO matrix in Matrix Market coordinate/real/general format."""
    row = np.asarray(coo.row) + 1
    col = np.asarray(coo.col) + 1
    data = np.asarray(coo.data)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"%{line}\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {len(data)}\n")
        for r, c, v in zip(row, col, data):
            f.write(f"{r} {c} {v:.17g}\n")


def read_mtx_vector(path, dtype=np.float64) -> jnp.ndarray:
    """Load a dense vector from .mtx — parity with ``load_vector_mtx``
    (reference GFlowNet100.py:48-58): densify and flatten."""
    coo = read_mtx(path, dtype=dtype)
    return jnp.asarray(coo.todense()).ravel()


def read_mtx_csr(path, dtype=np.float64):
    """Load .mtx directly to CSR — parity with ``load_mtx_file``
    (reference GFlowNet100.py:44-46)."""
    return coo_to_csr(read_mtx(path, dtype=dtype), canonical=True)
