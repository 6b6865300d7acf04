"""Distributed Krylov solvers: GMRES/CG over a row-partitioned DIA matrix.

The operator is the halo-exchange SpMV (`halo_spmv` — neighbor `ppermute`
only); every other solver operation (dots, norms, AXPYs, the Arnoldi basis)
is sharded by GSPMD propagation from the rows-sharded right-hand side, with
XLA inserting the `psum`s for reductions.  So the single-chip solver code in
``solvers/`` runs unchanged multi-chip — this module only handles padding,
sharding placement, and unpadding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dia import DIA, _round_up, _ALIGN
from .halo_spmv import halo_spmv, partition_dia, spmv_allgather
from ..solvers.gmres import GMRESResult, gmres
from ..solvers.cg import CGResult, cg
from ..solvers.linop import LinOp


def _prepare(mesh: Mesh, d: DIA, b: jax.Array, axis: str):
    n_shards = mesh.shape[axis]
    d = partition_dia(d, n_shards)
    bp = jnp.zeros((d.n_pad,), b.dtype).at[: b.shape[0]].set(b)
    bp = jax.device_put(bp, NamedSharding(mesh, P(axis)))
    # neighbor halo exchange needs halo ≤ shard; small/wide-band matrices
    # fall back to the all-gather operator (correct for any bandwidth)
    halo = _round_up(max((abs(o) for o in d.offsets), default=1), _ALIGN)
    op = halo_spmv if halo <= d.n_pad // n_shards else spmv_allgather
    return d, bp, op


def distributed_gmres(mesh: Mesh, d: DIA, b: jax.Array, axis: str = "rows",
                      restart: int = 30, maxiter: int = 1000,
                      rtol: float = 1e-5) -> GMRESResult:
    """Solve A x = b with A row-partitioned over ``mesh[axis]``.
    ``b``: unpadded [n]; the returned ``x`` is sliced back to [n]."""
    n = b.shape[0]
    d, bp, op = _prepare(mesh, d, b, axis)
    # LinOp: the partitioned diagonals ride as a jit argument (a closure
    # would bake them into the compile payload — solvers.linop)
    res = gmres(LinOp(data=d, fn=partial(op, mesh, axis=axis)), bp,
                restart=restart, maxiter=maxiter, rtol=rtol)
    return res._replace(x=res.x[:n])


def distributed_cg(mesh: Mesh, d: DIA, b: jax.Array, axis: str = "rows",
                   maxiter: int = 1000, rtol: float = 1e-5) -> CGResult:
    n = b.shape[0]
    d, bp, op = _prepare(mesh, d, b, axis)
    res = cg(LinOp(data=d, fn=partial(op, mesh, axis=axis)), bp,
             maxiter=maxiter, rtol=rtol)
    return res._replace(x=res.x[:n])
