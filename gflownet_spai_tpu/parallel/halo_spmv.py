"""Row-partitioned DIA SpMV with neighbor halo exchange.

The multi-chip SpMV (BASELINE.json config 5; SURVEY.md §5 "long-context"
row): A is row-partitioned over the ``rows`` mesh axis in DIA form; each
device holds its row block's diagonals and its x segment.  A banded matrix
only needs the *boundary* ``halo`` entries of each neighbor's x segment, so
the exchange is one bidirectional ``ppermute`` (rides ICI neighbor links,
no all-gather), overlapped by XLA with the local interior compute.

Edge devices receive zeros from ``ppermute``'s dropped shifts — exactly the
out-of-range zero semantics the DIA kernel already assumes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dia import DIA, spmv_dia_padded, _round_up, _ALIGN


def partition_dia(d: DIA, n_shards: int) -> DIA:
    """Re-pad a DIA matrix so its rows split evenly over ``n_shards`` —
    returns a DIA whose ``data`` second dim is ``n_shards · n_local``."""
    n_local = _round_up(-(-d.n_pad // n_shards), _ALIGN)
    total = n_local * n_shards
    if total != d.n_pad:
        import dataclasses
        data = jnp.pad(d.data, ((0, 0), (0, total - d.n_pad)))
        d = dataclasses.replace(d, data=data)
    return d


def halo_spmv(mesh: Mesh, d: DIA, x: jax.Array, axis: str = "rows") -> jax.Array:
    """y = A·x with A row-partitioned over ``mesh[axis]``.

    ``d`` must be pre-partitioned (``partition_dia``); ``x``: [n_pad_total].
    Works under jit; each shard runs the single-chip DIA kernel on its
    halo-extended segment.
    """
    n_shards = mesh.shape[axis]
    n_total = d.n_pad
    n_local = n_total // n_shards
    halo = _round_up(max(max((abs(o) for o in d.offsets), default=1), 1), _ALIGN)
    if halo > n_local:
        raise ValueError(f"halo {halo} exceeds shard size {n_local}")

    def local_spmv(data_local, x_local):
        # exchange boundaries: left neighbor's tail -> my left halo,
        # right neighbor's head -> my right halo (edge devices get zeros
        # from ppermute's dropped shifts)
        pairs_r = [(i, i + 1) for i in range(n_shards - 1)]
        pairs_l = [(i + 1, i) for i in range(n_shards - 1)]
        from_left = jax.lax.ppermute(x_local[n_local - halo:], axis, pairs_r)
        from_right = jax.lax.ppermute(x_local[:halo], axis, pairs_l)
        xp = jnp.concatenate([from_left, x_local, from_right])
        d_local = DIA(
            data=data_local,
            offsets=d.offsets,
            shape=(n_local, n_local),     # local block view
            nnz=d.nnz // n_shards,
        )
        # d_local.halo uses the same formula as `halo` above, so xp is
        # exactly the padded width spmv_dia_padded expects
        return spmv_dia_padded(d_local, xp)

    return shard_map(
        local_spmv, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )(d.data, x)


def halo_spmv_power(mesh: Mesh, d: DIA, x: jax.Array, k: int = 4,
                    scale: float = 1.0, axis: str = "rows") -> jax.Array:
    """z = (scale·A)ᵏ·x with A row-partitioned — COMMUNICATION-AVOIDING
    temporal blocking: ONE bidirectional ``ppermute`` of k·halo boundary
    entries per k dependent applies (same total bytes as k separate
    h-exchanges, but k× fewer communication rounds / sync points), then
    each shard runs the fused k-step kernel on its extended segment.

    Each shard extends its row block by k·halo rows of BOTH x and the
    diagonal data (the data exchange is loop-invariant under jit and gets
    hoisted out of solver loops); the fused intermediates near shard
    boundaries then use the true neighbor rows, and the garbage edge rows
    of the extended computation are discarded.  Jacobi/power iterations
    over a pod slice ride this at the single-chip fused rate between
    exchanges."""
    n_shards = mesh.shape[axis]
    n_total = d.n_pad
    n_local = n_total // n_shards
    h = _round_up(max(max((abs(o) for o in d.offsets), default=1), 1), _ALIGN)
    kh = k * h
    if kh > n_local:
        raise ValueError(f"k·halo {kh} exceeds shard size {n_local}")

    from ..ops.dia import dia_pad_pp, dia_power_data, dia_pp_tile, spmv_dia_power

    pairs_r = [(i, i + 1) for i in range(n_shards - 1)]
    pairs_l = [(i + 1, i) for i in range(n_shards - 1)]

    def local_power(data_local, x_local):
        # one exchange of k·halo boundary entries (x) + the matching
        # diagonal rows (data; static → hoisted by XLA in solver loops)
        xl = jax.lax.ppermute(x_local[n_local - kh:], axis, pairs_r)
        xr = jax.lax.ppermute(x_local[:kh], axis, pairs_l)
        dl = jax.lax.ppermute(data_local[:, n_local - kh:], axis, pairs_r)
        dr = jax.lax.ppermute(data_local[:, :kh], axis, pairs_l)
        xe = jnp.concatenate([xl, x_local, xr])
        de = jnp.concatenate([dl, data_local, dr], axis=1)
        n_ext = n_local + 2 * kh
        d_ext = DIA(data=de, offsets=d.offsets, shape=(n_ext, n_ext),
                    nnz=d.nnz // n_shards)
        datak = dia_power_data(d_ext, k)
        tr = dia_pp_tile(d_ext) or d_ext.halo
        xq = dia_pad_pp(d_ext, xe)
        zq = spmv_dia_power(d_ext, datak, xq, jnp.zeros_like(xq),
                            scale=scale, k=k)
        # center rows only: the ext-edge rows lack their own halo context
        return jax.lax.slice(zq, (tr + kh,), (tr + kh + n_local,))

    return shard_map(
        local_power, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )(d.data, x)


def spmv_allgather(mesh: Mesh, d: DIA, x: jax.Array, axis: str = "rows") -> jax.Array:
    """Baseline distributed SpMV: all-gather x then local rows — correct for
    any bandwidth, O(n) comm.  Used as the oracle for halo_spmv and for
    matrices whose bandwidth exceeds the shard size."""
    n_shards = mesh.shape[axis]
    n_total = d.n_pad
    n_local = n_total // n_shards
    import dataclasses

    def local_spmv(data_local, x_local):
        xg = jax.lax.all_gather(x_local, axis, tiled=True)      # [n_total]
        idx = jax.lax.axis_index(axis)
        d_full = DIA(data=jnp.zeros_like(data_local), offsets=d.offsets,
                     shape=(n_local, n_local), nnz=0)
        h = d_full.halo
        start = idx * n_local
        # window of x covering this row block's reach, clamped+zero-padded
        xp = jnp.pad(xg, (h, h))
        window = jax.lax.dynamic_slice(xp, (start,), (n_local + 2 * h,))
        d_local = dataclasses.replace(d_full, data=data_local, nnz=d.nnz // n_shards)
        return spmv_dia_padded(d_local, window)

    return shard_map(
        local_spmv, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )(d.data, x)
