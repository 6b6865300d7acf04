"""LinOp: a linear operator as an (fn, data) pair that is itself a pytree.

Why this exists (CLAUDE.md / ops/dia.py module notes): the Krylov solvers
are jitted with their operator callables as *static* arguments, so any array
a callable closes over is baked into the compiled program as a constant.
Over the remote-compile tunnel that inflates the payload (HTTP 413 at
~300 MB) and re-ships the matrix on every retrace.  A ``LinOp`` splits the
operator into

* ``fn``   — a hashable module-level function ``fn(data, x) -> y`` that
  lives in the pytree *treedef* (static under jit), and
* ``data`` — an arbitrary pytree of arrays that travels as a normal device
  argument.

``LinOp`` is callable, so solver bodies use it exactly like a plain matvec
closure; passing one *through* a jit boundary keeps the arrays as
arguments.  The reference has no analogue (its scipy LinearOperators are
host-side, GFlowNet100.py:128-132) — this is TPU-native plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinOp:
    data: Any
    fn: Callable = dataclasses.field(metadata=dict(static=True))

    def __call__(self, x):
        return self.fn(self.data, x)


def _matvec_dia(d, x):
    from ..ops.dia import spmv_dia

    return spmv_dia(d, x)


def _matvec_sparse(a, x):
    from ..sparse.ops import spmv

    return spmv(a, x)


def as_linop(obj) -> "LinOp | Callable":
    """Sparse container → LinOp; callables (incl. LinOp) pass through."""
    if callable(obj):
        return obj
    from ..ops.dia import DIA

    if isinstance(obj, DIA):
        return LinOp(data=obj, fn=_matvec_dia)
    return LinOp(data=obj, fn=_matvec_sparse)


def _apply_plain(f, _data, x):
    return f(x)


def wrap_plain(f) -> LinOp:
    """Plain matvec callable → LinOp (empty data; ``f`` stays a closure
    constant).  Used when one operand of a solve is a LinOp and the other a
    plain callable, so both can travel the dynamic jit entry."""
    import functools

    return LinOp(data=(), fn=functools.partial(_apply_plain, f))
