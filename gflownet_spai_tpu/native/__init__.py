"""ctypes bindings for the native host library (native/gfnspai.cpp).

Build with ``make -C native`` (repo root); every entry point has a pure
Python/NumPy fallback, so the package works without the library — the
native paths just make host-side setup (parsing, ILU, RCM, symbolic
SpGEMM) fast at production matrix sizes.

``available()`` reports whether the .so is loaded; the high-level modules
(`sparse.io`, `env.ilu`, `ops.rcm`, `sparse.ops.SpGEMMPlan`) consult it
automatically.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).with_name("libgfnspai.so")
_lib: Optional[ct.CDLL] = None


def _try_load() -> Optional[ct.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ct.CDLL(str(_LIB_PATH))
    i64p = ct.POINTER(ct.c_int64)
    f64p = ct.POINTER(ct.c_double)
    lib.gfn_free.argtypes = [ct.c_void_p]
    lib.gfn_parse_mtx.argtypes = [
        ct.c_char_p, i64p, i64p, i64p,
        ct.POINTER(i64p), ct.POINTER(i64p), ct.POINTER(f64p),
    ]
    lib.gfn_ilu0.argtypes = [ct.c_int64, i64p, i64p, f64p, ct.POINTER(f64p)]
    lib.gfn_rcm.argtypes = [ct.c_int64, i64p, i64p, ct.POINTER(i64p)]
    lib.gfn_spgemm_plan.argtypes = [
        ct.c_int64, i64p, i64p, ct.c_int64, ct.c_int64, i64p, i64p,
        i64p, i64p,
        ct.POINTER(i64p), ct.POINTER(i64p),
        ct.POINTER(i64p), ct.POINTER(i64p), ct.POINTER(i64p),
    ]
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Compile the library in-tree (requires g++); returns success."""
    root = Path(__file__).resolve().parents[2]
    try:
        subprocess.run(
            ["make", "-C", str(root / "native")],
            check=True, capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def _take_i64(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.gfn_free(ptr)
    return arr


def _take_f64(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.gfn_free(ptr)
    return arr


def parse_mtx(path) -> Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """(nrows, ncols, rows, cols, vals) — sorted row-major, symmetry expanded."""
    lib = _try_load()
    assert lib is not None
    i64p = ct.POINTER(ct.c_int64)
    f64p = ct.POINTER(ct.c_double)
    nr, nc, nz = ct.c_int64(), ct.c_int64(), ct.c_int64()
    rp, cp, vp = i64p(), i64p(), f64p()
    rc = lib.gfn_parse_mtx(
        str(path).encode(), ct.byref(nr), ct.byref(nc), ct.byref(nz),
        ct.byref(rp), ct.byref(cp), ct.byref(vp),
    )
    if rc != 0:
        raise ValueError(f"gfn_parse_mtx({path}) failed with code {rc}")
    n = nz.value
    return (nr.value, nc.value, _take_i64(lib, rp, n), _take_i64(lib, cp, n),
            _take_f64(lib, vp, n))


def ilu0_values(indptr: np.ndarray, indices: np.ndarray,
                vals: np.ndarray) -> np.ndarray:
    """Combined L\\U values on the CSR pattern (unit-diagonal L implied)."""
    lib = _try_load()
    assert lib is not None
    n = len(indptr) - 1
    f64p = ct.POINTER(ct.c_double)
    ip = np.ascontiguousarray(indptr, np.int64)
    ix = np.ascontiguousarray(indices, np.int64)
    v = np.ascontiguousarray(vals, np.float64)
    out = f64p()
    rc = lib.gfn_ilu0(
        n,
        ip.ctypes.data_as(ct.POINTER(ct.c_int64)),
        ix.ctypes.data_as(ct.POINTER(ct.c_int64)),
        v.ctypes.data_as(f64p),
        ct.byref(out),
    )
    if rc != 0:
        raise ZeroDivisionError(f"ILU(0) zero pivot at row {rc - 1}")
    return _take_f64(lib, out, len(vals))


def rcm(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    lib = _try_load()
    assert lib is not None
    n = len(indptr) - 1
    i64p = ct.POINTER(ct.c_int64)
    ip = np.ascontiguousarray(indptr, np.int64)
    ix = np.ascontiguousarray(indices, np.int64)
    out = i64p()
    rc_ = lib.gfn_rcm(n, ip.ctypes.data_as(i64p), ix.ctypes.data_as(i64p),
                      ct.byref(out))
    if rc_ != 0:
        raise RuntimeError("gfn_rcm failed")
    return _take_i64(lib, out, n)


def spgemm_plan(rows_a: np.ndarray, cols_a: np.ndarray, n_mid: int,
                ncols_b: int, indptr_b: np.ndarray, indices_b: np.ndarray):
    """Returns (out_row, out_col, pair_a, pair_b, pair_out)."""
    lib = _try_load()
    assert lib is not None
    i64p = ct.POINTER(ct.c_int64)
    ra = np.ascontiguousarray(rows_a, np.int64)
    ca = np.ascontiguousarray(cols_a, np.int64)
    ib = np.ascontiguousarray(indptr_b, np.int64)
    jb = np.ascontiguousarray(indices_b, np.int64)
    out_nnz, n_pairs = ct.c_int64(), ct.c_int64()
    orow, ocol, pa, pb, po = i64p(), i64p(), i64p(), i64p(), i64p()
    rc_ = lib.gfn_spgemm_plan(
        len(ra), ra.ctypes.data_as(i64p), ca.ctypes.data_as(i64p),
        n_mid, ncols_b, ib.ctypes.data_as(i64p), jb.ctypes.data_as(i64p),
        ct.byref(out_nnz), ct.byref(n_pairs),
        ct.byref(orow), ct.byref(ocol), ct.byref(pa), ct.byref(pb),
        ct.byref(po),
    )
    if rc_ != 0:
        raise RuntimeError("gfn_spgemm_plan failed")
    k, m = out_nnz.value, n_pairs.value
    return (_take_i64(lib, orow, k), _take_i64(lib, ocol, k),
            _take_i64(lib, pa, m), _take_i64(lib, pb, m),
            _take_i64(lib, po, m))
