"""DIA (diagonal) sparse format + the fused Pallas SpMV kernel.

Why DIA is the TPU-native SpMV format: Mosaic/XLA have no vectorized
arbitrary gather (measured: gather-based ELL SpMV runs at 0.09 Gnnz/s on a
v5e — 400× under roofline — because ``x[cols]`` serializes), but a matrix
stored by diagonals turns SpMV into statically-shifted contiguous FMAs:

    y[i] = Σ_s  data[s, i] · x[i + offsets[s]]

The Pallas kernel loads one aligned extended x-window per row tile and
applies every diagonal as a *static* in-register slice (lane shuffles, no
gather, one pass over memory).  Measured on the v5e: 145 Gnnz/s on 5-point
Poisson 1M rows ≈ the HBM roofline (~150 Gnnz/s at 5.6 B/nnz), vs 20.7
Gnnz/s for the best XLA formulation and 0.09 for gather-ELL.

Unstructured matrices reach this path via bandwidth-reducing RCM reordering
(``gflownet_spai_tpu.ops.rcm``); matrices with too many distinct diagonals
should use BSR (MXU path) or the jnp ELL fallback instead.

Storage convention (row-scaled): ``data[s, i] = A[i, i + offsets[s]]``,
zero where out of range.  ``data`` is padded to ``n_pad`` rows (multiple of
the row-tile) so every Pallas block is full.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.types import COO, Shape, static_field
from ..sparse.convert import coo_sort_dedup

_ALIGN = 1024          # Mosaic vector-load alignment for f32 1-D refs
_MAX_VMEM_BYTES = 15 * 1024 * 1024   # of the 16 MiB/core on v5e


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class DIA:
    """Diagonal-format sparse matrix (square).  ``data``: [ndiags, n_pad]."""

    data: jax.Array
    offsets: Tuple[int, ...] = static_field()
    shape: Shape = static_field()
    nnz: int = static_field()

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def n_pad(self) -> int:
        return int(self.data.shape[1])

    @property
    def ndiags(self) -> int:
        return len(self.offsets)

    @property
    def halo(self) -> int:
        # never 0 (a diagonal-only matrix still gets one aligned halo unit;
        # halo==0 turns x[-halo:] into a full-array slice downstream)
        reach = max((abs(o) for o in self.offsets), default=1)
        return _round_up(max(reach, 1), _ALIGN)

    def todense(self) -> jax.Array:
        n = self.n
        out = jnp.zeros(self.shape, self.data.dtype)
        i = jnp.arange(n)
        for s, off in enumerate(self.offsets):
            j = i + off
            valid = (j >= 0) & (j < n)
            out = out.at[jnp.where(valid, i, 0), jnp.where(valid, j, 0)].add(
                jnp.where(valid, self.data[s, :n], 0.0)
            )
        return out


jax.tree_util.register_dataclass(
    DIA, data_fields=["data"], meta_fields=["offsets", "shape", "nnz"]
)


def coo_to_dia(coo: COO, max_diags: int | None = None) -> DIA:
    """Host-side conversion; raises if the matrix has more distinct
    diagonals than ``max_diags`` (DIA would waste memory — use RCM first or
    a different format)."""
    if coo.shape[0] != coo.shape[1]:
        raise ValueError("DIA requires a square matrix")
    n = coo.shape[0]
    row = np.asarray(coo.row).astype(np.int64)
    col = np.asarray(coo.col).astype(np.int64)
    dat = np.asarray(coo.data)
    offs = np.unique(col - row)
    if max_diags is not None and len(offs) > max_diags:
        raise ValueError(
            f"{len(offs)} distinct diagonals > max_diags={max_diags}; "
            "apply RCM reordering or use ELL/BSR"
        )
    n_pad = _round_up(max(n, 1), _ALIGN)
    data = np.zeros((len(offs), n_pad), dat.dtype)
    off_index = {int(o): s for s, o in enumerate(offs)}
    diag_ids = np.asarray([off_index[int(o)] for o in (col - row)])
    # add.at: duplicate (row, col) entries sum (fancy assignment would
    # silently keep only the last one)
    np.add.at(data, (diag_ids, row), dat)
    return DIA(
        data=jnp.asarray(data),
        offsets=tuple(int(o) for o in offs),
        shape=coo.shape,
        nnz=int(len(dat)),
    )


def dia_to_coo(d: DIA) -> COO:
    n = d.n
    rows, cols, vals = [], [], []
    data = np.asarray(d.data)
    i = np.arange(n)
    for s, off in enumerate(d.offsets):
        j = i + off
        m = (j >= 0) & (j < n) & (data[s, :n] != 0)
        rows.append(i[m]); cols.append(j[m]); vals.append(data[s, :n][m])
    return coo_sort_dedup(COO(
        row=jnp.asarray(np.concatenate(rows), jnp.int32),
        col=jnp.asarray(np.concatenate(cols), jnp.int32),
        data=jnp.asarray(np.concatenate(vals)),
        shape=d.shape,
    ), sum_duplicates=False)


def dia_astype(d: DIA, dtype) -> DIA:
    """Cast the stored diagonals (e.g. bf16 storage for the fused k-step
    kernels: halves the dominant diagonal-read HBM traffic; the ping-pong
    buffers keep f32 so every accumulate stays full precision)."""
    return dataclasses.replace(d, data=d.data.astype(dtype))


def dia_transpose(d: DIA) -> DIA:
    """Aᵀ in DIA:  AT[j, j−off] = A[j+? ] — implemented as a static shift of
    each diagonal with negated offset (pure jnp, differentiable)."""
    n, n_pad = d.n, d.n_pad
    rows = []
    for s, off in enumerate(d.offsets):
        # AT_data[s', i] = AT[i, i−off] = A[i−off, i] ... source index i−off? no:
        # AT[i, i + (−off)] = A[i − off, i] = data[s, i − off]
        shifted = jnp.roll(d.data[s], off)
        # zero wrapped region
        idx = jnp.arange(n_pad)
        valid = (idx - off >= 0) & (idx - off < n)
        rows.append(jnp.where(valid, shifted, 0.0))
    return DIA(
        data=jnp.stack(rows),
        offsets=tuple(-o for o in d.offsets),
        shape=(d.shape[1], d.shape[0]),
        nnz=d.nnz,
    )


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------

def _pad_x(d: DIA, x: jax.Array) -> jax.Array:
    h = d.halo
    buf = jnp.zeros((h + d.n_pad + h,), x.dtype)
    return jax.lax.dynamic_update_slice(buf, x, (h,))


def spmv_dia_jnp(d: DIA, x: jax.Array) -> jax.Array:
    """Reference jnp implementation (CPU/grad path): static slices of the
    halo-padded x, one FMA per diagonal."""
    h = d.halo
    xp = _pad_x(d, x)
    n = d.n
    acc = jnp.zeros((n,), jnp.promote_types(d.data.dtype, x.dtype))
    for s, off in enumerate(d.offsets):
        acc = acc + d.data[s, :n] * jax.lax.slice(xp, (h + off,), (h + off + n,))
    return acc


def _pick_tile(d: DIA) -> int:
    """Row-tile size fitting VMEM: the whole padded x is resident, and
    Pallas double-buffers the grid-mapped diag/out tiles."""
    budget = _MAX_VMEM_BYTES // 4                     # f32 words
    x_words = d.n_pad + 2 * d.halo
    # 2× double-buffered (diag tile + out) + ext window copy + one slice
    # temp per diagonal + acc (measured from Mosaic scoped-vmem reports)
    per_row = 3 * d.ndiags + 4
    tr = (budget - x_words) // per_row
    tr = max(_ALIGN, (tr // _ALIGN) * _ALIGN)
    tr = min(tr, d.n_pad)
    # prefer a tile that divides n_pad exactly — avoids growing/copying the
    # output (n_pad is a multiple of _ALIGN, so _ALIGN always qualifies)
    while d.n_pad % tr:
        tr -= _ALIGN
    return tr


def _x_fits_vmem(d: DIA) -> bool:
    x_bytes = (d.n_pad + 2 * d.halo) * 4
    # must match _pick_tile's per-row model at the minimum tile, or sizes in
    # the gap get a tile the VMEM model itself says cannot fit
    min_tiles = (3 * d.ndiags + 4) * _ALIGN * 4
    return x_bytes + min_tiles <= _MAX_VMEM_BYTES


def _spmv_pallas(d: DIA, xp: jax.Array, interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    tr = _pick_tile(d)
    assert d.n_pad % tr == 0, (d.n_pad, tr)   # _pick_tile picks a divisor
    n_pad = d.n_pad
    data = d.data
    grid = n_pad // tr
    center = offsets.index(0) if 0 in offsets else None

    def kernel(d_ref, x_ref, y_ref):
        t = pl.program_id(0)
        ext = x_ref[pl.ds(t * tr, tr + 2 * halo)]     # aligned window
        if center is not None:
            acc = d_ref[center, :] * jax.lax.slice(ext, (halo,), (halo + tr,))
        else:
            acc = jnp.zeros((tr,), y_ref.dtype)
        for s, off in enumerate(offsets):
            if s == center:
                continue
            acc += d_ref[s, :] * jax.lax.slice(ext, (halo + off,), (halo + off + tr,))
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr,), lambda t: (t,), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data, xp)
    return y[: d.n_pad]


def _pick_tile_stream(d: DIA) -> int:
    """Row tile for the streamed path (x not VMEM-resident): x block joins
    the double-buffered set and an ext concat temp is live."""
    budget = _MAX_VMEM_BYTES // 4
    per_row = 3 * d.ndiags + 8
    tr = budget // per_row
    tr = max(_ALIGN, (tr // _ALIGN) * _ALIGN)
    tr = min(tr, d.n_pad)
    while d.n_pad % tr:
        tr -= _ALIGN
    return tr


def _spmv_pallas_stream(d: DIA, x: jax.Array, interpret: bool = False) -> jax.Array:
    """Streamed variant for large n: x lives in HBM and is pipelined per
    row tile by Pallas (grid-mapped block), with tile-boundary halos
    precomputed as a small side tensor (static slices, no gather).
    ``x``: UNPADDED [n_pad]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets = d.offsets
    halo = d.halo
    tr = _pick_tile_stream(d)
    n_pad = d.n_pad
    grid = n_pad // tr
    center = offsets.index(0) if 0 in offsets else None

    # halos[t] = [left h | right h] around tile t, zeros at the edges.
    zeros_h = jnp.zeros((halo,), x.dtype)
    rows = []
    for t in range(grid):
        left = zeros_h if t == 0 else jax.lax.slice(
            x, (t * tr - halo,), (t * tr,))
        right = zeros_h if t == grid - 1 else jax.lax.slice(
            x, ((t + 1) * tr,), ((t + 1) * tr + halo,))
        rows.append(jnp.concatenate([left, right]))
    halos = jnp.concatenate(rows)                             # [grid * 2h]

    def kernel(d_ref, x_ref, h_ref, y_ref):
        ext = jnp.concatenate([h_ref[:halo], x_ref[:], h_ref[halo:]])
        if center is not None:
            acc = d_ref[center, :] * jax.lax.slice(ext, (halo,), (halo + tr,))
        else:
            acc = jnp.zeros((tr,), y_ref.dtype)
        for s, off in enumerate(offsets):
            if s == center:
                continue
            acc += d_ref[s, :] * jax.lax.slice(ext, (halo + off,), (halo + off + tr,))
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * halo,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr,), lambda t: (t,), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, x, halos)


def _spmv_pallas_stream2(d: DIA, xp: jax.Array, interpret: bool = False) -> jax.Array:
    """Streamed variant v2: x stays in HBM and the kernel double-buffers its
    own overlapping window DMAs (scratch[2, tr+2h] + DMA semaphores), so no
    host-side halo tensor is needed and the next window's transfer overlaps
    the current tile's compute.  ``xp``: halo-PADDED [h + n_pad + h]
    (windows [t·tr, t·tr + tr + 2h) are then always in-bounds and aligned).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    budget = _MAX_VMEM_BYTES // 4
    per_row = 3 * d.ndiags + 8
    tr = max(_ALIGN, ((budget - 4 * halo) // per_row // _ALIGN) * _ALIGN)
    tr = min(tr, d.n_pad)
    while d.n_pad % tr:
        tr -= _ALIGN
    n_pad = d.n_pad
    grid = n_pad // tr
    win = tr + 2 * halo
    center = offsets.index(0) if 0 in offsets else None

    def kernel(d_ref, x_hbm, y_ref, s0, s1, sem0, sem1):
        # two independent 1-D scratch buffers, not a [2, win] scratch: Mosaic
        # cannot slice size-1 along a sublane-tiled dim with a dynamic index
        # ("Slice shape along dimension 0 must be aligned to tiling (2)")
        t = pl.program_id(0)
        even = jax.lax.rem(t, jnp.asarray(2, t.dtype)) == 0

        def dma(i, buf, sem):
            return pltpu.make_async_copy(x_hbm.at[pl.ds(i * tr, win)], buf, sem)

        @pl.when(t == 0)
        def _():
            dma(0, s0, sem0).start()

        # issue the next window BEFORE blocking on the current one — the
        # other slot was last read by iteration t−1's compute, which has
        # already finished when iteration t begins
        @pl.when((t + 1 < grid) & even)
        def _():
            dma(t + 1, s1, sem1).start()

        @pl.when((t + 1 < grid) & ~even)
        def _():
            dma(t + 1, s0, sem0).start()

        @pl.when(even)
        def _():
            dma(t, s0, sem0).wait()

        @pl.when(~even)
        def _():
            dma(t, s1, sem1).wait()

        ext = jnp.where(even, s0[:], s1[:])
        if center is not None:
            acc = d_ref[center, :] * jax.lax.slice(ext, (halo,), (halo + tr,))
        else:
            acc = jnp.zeros((tr,), y_ref.dtype)
        for s, off in enumerate(offsets):
            if s == center:
                continue
            acc += d_ref[s, :] * jax.lax.slice(ext, (halo + off,), (halo + off + tr,))
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr,), lambda t: (t,), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win,), d.data.dtype),
            pltpu.VMEM((win,), d.data.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xp)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _stream2_fits(d: DIA) -> bool:
    """Whether the in-kernel-DMA streamed kernel's two x windows plus the
    minimum diag/out tiles fit VMEM (very wide halos can exceed it)."""
    budget = _MAX_VMEM_BYTES // 4
    win_min = _ALIGN + 2 * d.halo
    return 2 * win_min + (3 * d.ndiags + 8) * _ALIGN <= budget


def spgemm_dia(m: DIA, a: DIA) -> DIA:
    """Banded sparse × sparse product C = M·A entirely in DIA form.

    C[i, i+d₃] = Σ_{d₁+d₂=d₃} M[i, i+d₁] · A[i+d₁, i+d₁+d₂], i.e. each
    output diagonal is a sum of elementwise products of one M diagonal with
    a *statically shifted* A diagonal — no gather, no scatter, pure VPU.
    This is the TPU-native reward path for banded problems (the pair-plan
    SpGEMM in sparse/ops.py needs gathers, which run ~0.1 Gnnz/s on TPU).

    Output offsets = all sums d₁+d₂ (dense band union); entries whose
    column falls outside the matrix are zero by construction.
    """
    if m.shape[1] != a.shape[0]:
        raise ValueError("inner dims mismatch")
    n = m.n
    n_pad = m.n_pad
    if a.n_pad != n_pad:
        raise ValueError("operands must share n_pad (repad first)")
    out_offsets = sorted({d1 + d2 for d1 in m.offsets for d2 in a.offsets})
    # pad by M's reach so every shifted read is an in-bounds static slice
    ha = max((abs(o) for o in m.offsets), default=1)
    a_pad = jnp.pad(a.data, ((0, 0), (ha, ha)))
    acc = {d3: jnp.zeros((n_pad,), jnp.promote_types(m.data.dtype, a.data.dtype))
           for d3 in out_offsets}
    for s1, d1 in enumerate(m.offsets):
        for s2, d2 in enumerate(a.offsets):
            # A diag d2 evaluated at row i+d1: slice with static shift d1
            shifted = jax.lax.slice(a_pad[s2], (ha + d1,), (ha + d1 + n_pad,))
            acc[d1 + d2] = acc[d1 + d2] + m.data[s1] * shifted
    # zero out-of-range columns of each output diagonal (can be nonzero when
    # a shifted A-diagonal wraps padding rows)
    row_idx = jnp.arange(n_pad)
    rows = []
    for d3 in out_offsets:
        valid = (row_idx + d3 >= 0) & (row_idx + d3 < n) & (row_idx < n)
        rows.append(jnp.where(valid, acc[d3], 0.0))
    nnz = sum(max(0, n - abs(d3)) for d3 in out_offsets)
    return DIA(data=jnp.stack(rows), offsets=tuple(out_offsets),
               shape=(m.shape[0], a.shape[1]), nnz=nnz)


def frobenius_sq_minus_identity_dia(c: DIA) -> jax.Array:
    """‖C − I‖_F² for DIA C (assumes out-of-range slots are zero)."""
    s2 = jnp.sum(c.data * c.data)
    if 0 in c.offsets:
        center = c.offsets.index(0)
        sd = jnp.sum(c.data[center, : c.n])
    else:
        sd = 0.0
    return s2 - 2.0 * sd + jnp.asarray(c.n, c.data.dtype)


def spmm_dia_jnp(d: DIA, x: jax.Array) -> jax.Array:
    """Reference jnp SpMM: per-diagonal shifted FMAs over the padded X.
    XLA fuses this to full HBM BW up to ~64 RHS columns on the v5e but
    falls off a cliff beyond (178 GB/s at K=256 — materialized
    intermediates); the Pallas kernel below covers the wide-K case."""
    h = d.halo
    n, k = d.n, x.shape[1]
    xp = jnp.zeros((h + d.n_pad + h, k), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (h, 0))
    acc = jnp.zeros((n, k), jnp.promote_types(d.data.dtype, x.dtype))
    for s, off in enumerate(d.offsets):
        sl = jax.lax.slice(xp, (h + off, 0), (h + off + n, k))
        acc = acc + d.data[s, :n, None] * sl
    return acc


def _spmm_dia_pallas(d: DIA, x: jax.Array, interpret: bool = False) -> jax.Array:
    """Pallas DIA SpMM (wide K): 2-D grid (row tile × K tile, K inner so
    each diag tile loads once per row sweep); the overlapping [tr+2h, kb]
    X window is double-buffered with in-kernel DMAs from the row-padded X
    (the SpMV stream2 pattern lifted to 2-D; diagonals apply as static
    sublane-shifted slices).  ``x``: UNPADDED [n, K], K a lane multiple."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    n_pad = d.n_pad
    K = x.shape[1]
    kb = 128 if K % 128 == 0 else K
    budget = _MAX_VMEM_BYTES // 4
    # two X windows [tr+2h, kb], double-buffered diag [nd, tr] + out [tr, kb]
    tr = _ALIGN
    while True:
        nxt = tr + _ALIGN
        need = (2 * (nxt + 2 * halo) * kb + 2 * d.ndiags * nxt
                + 2 * nxt * kb)
        if need > budget or nxt > n_pad or n_pad % nxt:
            break
        tr = nxt
    while n_pad % tr:
        tr -= _ALIGN
    grid_i = n_pad // tr
    grid_k = K // kb
    win = tr + 2 * halo

    # row-padded X so every window [i·tr, i·tr+win) is in-bounds
    xp = jnp.zeros((halo + n_pad + halo, K), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(d.data.dtype), (halo, 0))

    def kernel(d_ref, x_hbm, y_ref, s0, s1, sem0, sem1):
        i = pl.program_id(0)
        k = pl.program_id(1)
        t = i * grid_k + k                   # linear step for slot parity
        even = jax.lax.rem(t, jnp.asarray(2, t.dtype)) == 0

        def dma(ii, kk, buf, sem):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * tr, win), pl.ds(kk * kb, kb)], buf, sem)

        @pl.when(t == 0)
        def _():
            dma(0, 0, s0, sem0).start()

        # prefetch the next (i, k) window into the other slot
        nk = jax.lax.rem(k + 1, jnp.asarray(grid_k, k.dtype))
        ni = i + (k + 1) // grid_k

        @pl.when((t + 1 < grid_i * grid_k) & even)
        def _():
            dma(ni, nk, s1, sem1).start()

        @pl.when((t + 1 < grid_i * grid_k) & ~even)
        def _():
            dma(ni, nk, s0, sem0).start()

        @pl.when(even)
        def _():
            dma(i, k, s0, sem0).wait()

        @pl.when(~even)
        def _():
            dma(i, k, s1, sem1).wait()

        ext = jnp.where(even, s0[:], s1[:])          # [win, kb]
        acc = jnp.zeros((tr, kb), y_ref.dtype)
        for s, off in enumerate(offsets):
            sl = jax.lax.slice(ext, (halo + off, 0), (halo + off + tr, kb))
            acc += d_ref[s, :][:, None] * sl
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, K), d.data.dtype),
        grid=(grid_i, grid_k),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr, kb), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, kb), d.data.dtype),
            pltpu.VMEM((win, kb), d.data.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad * K,
            bytes_accessed=(d.ndiags * n_pad + 2 * n_pad * K) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xp)


def spmm_dia_t_jnp(d: DIA, xt: jax.Array) -> jax.Array:
    """Reference jnp transposed-RHS SpMM: ``yt[k, i] = Σ_s data[s,i]·xt[k, i+off_s]``
    for ``xt`` in [K, n] layout (each RHS a contiguous row)."""
    h = d.halo
    n, K = d.n, xt.shape[0]
    xtp = jnp.zeros((K, h + d.n_pad + h), xt.dtype)
    xtp = jax.lax.dynamic_update_slice(xtp, xt, (0, h))
    acc = jnp.zeros((K, n), jnp.promote_types(d.data.dtype, xt.dtype))
    for s, off in enumerate(d.offsets):
        sl = jax.lax.slice(xtp, (0, h + off), (K, h + off + n))
        acc = acc + d.data[s, :n][None, :] * sl
    return acc


def _spmm_t_need(d: DIA, kb: int, tr: int) -> int:
    """VMEM floats for the transposed kernel at (kb, tr): two DMA window
    scratches + the ``jnp.where(even, s0, s1)`` ext copy (3·kb·win), the
    double-buffered out block + acc + slice temps (5·kb·tr), and the diag
    tile.  Calibrated against a Mosaic scoped-vmem OOM report (18.27 MB at
    kb=32, tr=16384, h=1024 — model says 18.9)."""
    return (3 * kb * (tr + 2 * d.halo) + 5 * kb * tr + 4 * d.ndiags * tr)


def _spmm_t_tiles(d: DIA, kp: int) -> Tuple[int, int]:
    """(kb, tr) for the transposed kernel, minimizing modeled HBM traffic
    under the VMEM budget.  Traffic per full product ≈
    ``kp·n_pad·(1 + 2h/tr) [x windows, overlap re-read] + kp·n_pad [y]
    + ceil(kp/kb)·ndiags·n_pad [diag tile re-read per K pass]``.
    Bigger tr shrinks the halo-overlap term; bigger kb shrinks diag
    re-reads — they compete for VMEM, so scan aligned divisors of n_pad."""
    budget = _MAX_VMEM_BYTES // 4
    best = (min(kp, 8), _ALIGN)
    best_cost = None
    for kb in (8, 16, 32, 64, 128):
        if kb > max(kp, 8):
            break
        for tr in range(_ALIGN, d.n_pad + 1, _ALIGN):
            if d.n_pad % tr or _spmm_t_need(d, kb, tr) > budget:
                continue
            grid_k = -(-max(kp, kb) // kb)
            cost = (max(kp, kb) * (2 * d.halo + 2 * tr) // tr
                    + grid_k * d.ndiags)
            if best_cost is None or cost < best_cost:
                best, best_cost = (kb, tr), cost
    return best


def _spmm_t_fits(d: DIA, kp: int) -> bool:
    kb, tr = _spmm_t_tiles(d, kp)
    return _spmm_t_need(d, kb, tr) <= _MAX_VMEM_BYTES // 4


def _spmm_dia_t_pallas(d: DIA, xtp: jax.Array, interpret: bool = False) -> jax.Array:
    """Transposed-RHS Pallas DIA SpMM.  ``xtp``: halo-padded [K_pad,
    h + n_pad + h] with K_pad a multiple of the row tile.  Windows
    [kb, tr + 2h] are double-buffered with in-kernel DMAs (the SpMV stream2
    pattern); each DMA row is one contiguous (tr+2h)·4-byte burst — this is
    what the [n, K] layout kernel lacks (row-strided kb·4-byte reads), see
    ``spmm_dia``.  Diagonals apply as static lane-dim slices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    n_pad = d.n_pad
    kp = xtp.shape[0]
    kb, tr = _spmm_t_tiles(d, kp)
    assert kp % kb == 0 and n_pad % tr == 0, (kp, kb, n_pad, tr)
    grid_k = kp // kb
    grid_i = n_pad // tr
    total = grid_k * grid_i
    win = tr + 2 * halo
    center = offsets.index(0) if 0 in offsets else None

    def kernel(d_ref, x_hbm, y_ref, s0, s1, sem0, sem1):
        k = pl.program_id(0)
        i = pl.program_id(1)
        t = k * grid_i + i
        even = jax.lax.rem(t, jnp.asarray(2, t.dtype)) == 0

        def dma(kk, ii, buf, sem):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(kk * kb, kb), pl.ds(ii * tr, win)], buf, sem)

        @pl.when(t == 0)
        def _():
            dma(0, 0, s0, sem0).start()

        ni = jax.lax.rem(i + 1, jnp.asarray(grid_i, i.dtype))
        nk = k + (i + 1) // grid_i

        @pl.when((t + 1 < total) & even)
        def _():
            dma(nk, ni, s1, sem1).start()

        @pl.when((t + 1 < total) & ~even)
        def _():
            dma(nk, ni, s0, sem0).start()

        @pl.when(even)
        def _():
            dma(k, i, s0, sem0).wait()

        @pl.when(~even)
        def _():
            dma(k, i, s1, sem1).wait()

        ext = jnp.where(even, s0[:], s1[:])               # [kb, win]
        if center is not None:
            acc = d_ref[center, :][None, :] * jax.lax.slice(
                ext, (0, halo), (kb, halo + tr))
        else:
            acc = jnp.zeros((kb, tr), y_ref.dtype)
        for s, off in enumerate(offsets):
            if s == center:
                continue
            acc += d_ref[s, :][None, :] * jax.lax.slice(
                ext, (0, halo + off), (kb, halo + off + tr))
        y_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, n_pad), d.data.dtype),
        grid=(grid_k, grid_i),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda k, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((kb, tr), lambda k, i: (k, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kb, win), d.data.dtype),
            pltpu.VMEM((kb, win), d.data.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad * kp,
            bytes_accessed=(d.ndiags * n_pad + 2 * n_pad * kp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xtp)


def dia_pad_xt(d: DIA, xt: jax.Array) -> jax.Array:
    """[K, n] → halo/K-padded [K_pad, h + n_pad + h] buffer for the
    transposed SpMM chain (multi-RHS solvers keep this as their iterate)."""
    kb, _ = _spmm_t_tiles(d, max(8, _round_up(xt.shape[0], 8)))
    kp = _round_up(xt.shape[0], kb)
    h = d.halo
    buf = jnp.zeros((kp, h + d.n_pad + h), d.data.dtype)
    return jax.lax.dynamic_update_slice(buf, xt.astype(d.data.dtype), (0, h))


def spmm_dia_t_padded(d: DIA, xtp: jax.Array) -> jax.Array:
    """Transposed SpMM on an already-padded buffer (see ``dia_pad_xt``);
    returns [K_pad, n_pad]."""
    if _use_pallas() and _spmm_t_fits(d, xtp.shape[0]):
        return _spmm_dia_t_pallas(d, xtp)
    h = d.halo
    acc = jnp.zeros((xtp.shape[0], d.n_pad),
                    jnp.promote_types(d.data.dtype, xtp.dtype))
    for s, off in enumerate(d.offsets):
        sl = jax.lax.slice(xtp, (0, h + off), (xtp.shape[0], h + off + d.n_pad))
        acc = acc + d.data[s][None, :] * sl
    return acc


def spmm_dia_t(d: DIA, xt: jax.Array) -> jax.Array:
    """Y_t = (A·X)ᵀ for RHS in transposed [K, n] layout.  This is the wide-K
    TPU fast path (docs/ROADMAP.md #SpMM): contiguous window bursts instead
    of the [n, K] kernel's row-strided DMAs."""
    K = xt.shape[0]
    if _use_pallas() and _spmm_t_fits(d, _round_up(max(K, 8), 8)):
        xtp = dia_pad_xt(d, xt)
        return _spmm_dia_t_pallas(d, xtp)[:K, : d.n]
    return spmm_dia_t_jnp(d, xt)


def spmm_dia(d: DIA, x: jax.Array) -> jax.Array:
    """Y = A·X for dense X [n, K].  jnp shifted FMAs for narrow K (XLA
    fuses those to full HBM BW — 811 GB/s measured at K=64); the Pallas
    kernel for wide K on TPU.  Measured at K=256/n=262k both paths sit at
    177 GB/s (the kernel's [win, kb] window DMA is row-strided when
    kb < K), but the kernel streams x in windows while the jnp path
    materializes a [n+2h, K] padded copy — at large n·K only the kernel
    fits memory.  docs/ROADMAP.md tracks the [K, n] transposed-RHS layout
    that would make wide-K windows contiguous."""
    K = x.shape[1]
    if (_use_pallas() and K > 64 and K % 128 == 0
            and 2 * (_ALIGN + 2 * d.halo) * 128 * 4 <= _MAX_VMEM_BYTES):
        return _spmm_dia_pallas(d, x)[: d.n]
    return spmm_dia_jnp(d, x)


# Public padded-layout API: solvers that call SpMV in a loop should keep the
# halo-padded x buffer as their iterate to skip the per-call pad pass
# (unpadded spmv_dia measures ~95 Gnnz/s on the v5e vs ~145 for the padded
# chain on Poisson-1M).

def dia_pad_x(d: DIA, x: jax.Array) -> jax.Array:
    """[n] → halo-padded [halo + n_pad + halo] buffer."""
    return _pad_x(d, x.astype(d.data.dtype))


def spmv_dia_padded(d: DIA, xp: jax.Array) -> jax.Array:
    """SpMV on an already-padded x buffer; returns unpadded [n_pad] y."""
    if _use_pallas():
        if _x_fits_vmem(d):
            return _spmv_pallas(d, xp)
        if _stream2_fits(d):
            return _spmv_pallas_stream2(d, xp)
    h = d.halo
    n = d.n
    acc = jnp.zeros((d.n_pad,), jnp.promote_types(d.data.dtype, xp.dtype))
    for s, off in enumerate(d.offsets):
        sl = jax.lax.slice(xp, (h + off,), (h + off + d.n_pad,))
        acc = acc + d.data[s] * sl
    return acc


# --- padded-IO SpMV: output written directly in the halo-padded layout ----
#
# The padded chain above still pays a repack per iteration (y [n_pad] is
# dynamic-update-sliced back into the padded x buffer: +8 MB/iter on
# Poisson-1M, capping the chain at ~114 Gnnz/s vs the kernel's ~145).  The
# padded-IO kernels instead emit y in the SAME [P + n_pad + P] layout as x
# (P = lane tile ≥ halo), writing the two halo blocks as zeros in-kernel, so
# iterative drivers (Jacobi/CG/bench chains) feed y straight back as x.

def _spmv_io_tile(d: DIA) -> int:
    """Lane tile P for the padded-IO kernels: a multiple of ``_ALIGN``
    dividing n_pad with P ≥ halo (interior windows [j·P − halo, j·P + P +
    halo) then start in-bounds and 1024-aligned), capped near 16·ALIGN so
    the two in-kernel halo-zero blocks stay ≪ the real write traffic.
    Returns 0 when no valid tile exists."""
    lo = max(d.halo, min(16 * _ALIGN, d.n_pad))
    tr = _round_up(lo, _ALIGN)
    while tr <= d.n_pad and d.n_pad % tr:
        tr += _ALIGN
    return tr if tr <= d.n_pad else 0


def _spmv_io_fits(d: DIA) -> Tuple[bool, bool]:
    """(resident_ok, streamed_ok) VMEM feasibility for the padded-IO
    kernels (same per-row models as _pick_tile/_stream2_fits, with the
    wider 2·P x padding in place of 2·halo)."""
    tr = _spmv_io_tile(d)
    if not tr:
        return False, False
    budget = _MAX_VMEM_BYTES // 4
    resident = (d.n_pad + 2 * tr) + (3 * d.ndiags + 4) * tr <= budget
    streamed = 2 * (tr + 2 * d.halo) + (3 * d.ndiags + 8) * tr <= budget
    return resident, streamed


def _spmv_pallas_io(d: DIA, xq: jax.Array, scale: float = 1.0,
                    interpret: bool = False) -> jax.Array:
    """Resident padded-IO SpMV: x [P + n_pad + P] lives whole in VMEM;
    grid = n_pad/P + 2 with the first/last block writing zeros (the output
    halo), interior block j computing rows (j−1)·P."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    n_pad = d.n_pad
    tr = _spmv_io_tile(d)
    assert tr and xq.shape[0] == n_pad + 2 * tr, (tr, xq.shape)
    grid_i = n_pad // tr
    grid = grid_i + 2
    center = offsets.index(0) if 0 in offsets else None

    def kernel(d_ref, x_ref, y_ref):
        j = pl.program_id(0)
        interior = (j > 0) & (j < grid - 1)

        @pl.when(~interior)
        def _():
            y_ref[:] = jnp.zeros((tr,), y_ref.dtype)

        @pl.when(interior)
        def _():
            # window start j·tr − halo ≥ 0 for j ≥ 1 since tr ≥ halo; tr and
            # halo are _ALIGN multiples but Mosaic can't prove that through
            # the subtraction — annotate (else: "cannot statically prove
            # that index in dimension 0 is a multiple of 1024")
            start = pl.multiple_of(j * tr - halo, _ALIGN)
            ext = x_ref[pl.ds(start, tr + 2 * halo)]
            if center is not None:
                acc = d_ref[center, :] * jax.lax.slice(
                    ext, (halo,), (halo + tr,))
            else:
                acc = jnp.zeros((tr,), y_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                acc += d_ref[s, :] * jax.lax.slice(
                    ext, (halo + off,), (halo + off + tr,))
            y_ref[:] = acc * scale if scale != 1.0 else acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad + 2 * tr,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr),
                         lambda j: (0, jnp.clip(j - 1, 0, grid_i - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr,), lambda j: (j,), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xq)


def _spmv_pallas_io_stream(d: DIA, xq: jax.Array, scale: float = 1.0,
                           interpret: bool = False) -> jax.Array:
    """Streamed padded-IO SpMV: the stream2 double-buffered in-kernel window
    DMA pattern over the [P + n_pad + P] layout.  Halo steps (j = 0 and
    j = grid−1) still run a (clamped, duplicate) window DMA so the slot
    parity chain stays uniform; they just write zeros."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    n_pad = d.n_pad
    tr = _spmv_io_tile(d)
    assert tr and xq.shape[0] == n_pad + 2 * tr, (tr, xq.shape)
    grid_i = n_pad // tr
    grid = grid_i + 2
    win = tr + 2 * halo
    center = offsets.index(0) if 0 in offsets else None

    def start_of(j):
        # annotate alignment: Mosaic can't prove the clip/subtract keeps the
        # index a multiple of the 1-D tiling
        return pl.multiple_of(jnp.clip(j, 1, grid_i) * tr - halo, _ALIGN)

    def kernel(d_ref, x_hbm, y_ref, s0, s1, sem0, sem1):
        j = pl.program_id(0)
        even = jax.lax.rem(j, jnp.asarray(2, j.dtype)) == 0

        def dma(jj, buf, sem):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start_of(jj), win)], buf, sem)

        @pl.when(j == 0)
        def _():
            dma(0, s0, sem0).start()

        @pl.when((j + 1 < grid) & even)
        def _():
            dma(j + 1, s1, sem1).start()

        @pl.when((j + 1 < grid) & ~even)
        def _():
            dma(j + 1, s0, sem0).start()

        @pl.when(even)
        def _():
            dma(j, s0, sem0).wait()

        @pl.when(~even)
        def _():
            dma(j, s1, sem1).wait()

        interior = (j > 0) & (j < grid - 1)

        @pl.when(~interior)
        def _():
            y_ref[:] = jnp.zeros((tr,), y_ref.dtype)

        @pl.when(interior)
        def _():
            ext = jnp.where(even, s0[:], s1[:])
            if center is not None:
                acc = d_ref[center, :] * jax.lax.slice(
                    ext, (halo,), (halo + tr,))
            else:
                acc = jnp.zeros((tr,), y_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                acc += d_ref[s, :] * jax.lax.slice(
                    ext, (halo + off,), (halo + off + tr,))
            y_ref[:] = acc * scale if scale != 1.0 else acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad + 2 * tr,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr),
                         lambda j: (0, jnp.clip(j - 1, 0, grid_i - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr,), lambda j: (j,), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win,), d.data.dtype),
            pltpu.VMEM((win,), d.data.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xq)


def dia_pad_io(d: DIA, x: jax.Array) -> jax.Array:
    """[n] → [P + n_pad + P] buffer for the padded-IO SpMV chain, P =
    ``_spmv_io_tile(d)`` (falls back to the halo width when no IO tile
    exists, in which case ``spmv_dia_padded_io`` uses the jnp path)."""
    tr = _spmv_io_tile(d) or d.halo
    buf = jnp.zeros((tr + d.n_pad + tr,), d.data.dtype)
    return jax.lax.dynamic_update_slice(buf, x.astype(d.data.dtype), (tr,))


def spmv_dia_padded_io(d: DIA, xq: jax.Array, scale: float = 1.0) -> jax.Array:
    """SpMV on a ``dia_pad_io`` buffer returning the SAME layout (halo
    blocks zeroed in-kernel), so chained applies never repack.  ``scale``
    is folded into the kernel's output write (static)."""
    tr = _spmv_io_tile(d)
    if _use_pallas() and tr and xq.shape[0] == d.n_pad + 2 * tr:
        res_ok, str_ok = _spmv_io_fits(d)
        if res_ok:
            return _spmv_pallas_io(d, xq, scale=scale)
        if str_ok:
            return _spmv_pallas_io_stream(d, xq, scale=scale)
    p = (xq.shape[0] - d.n_pad) // 2
    acc = jnp.zeros((d.n_pad,), jnp.promote_types(d.data.dtype, xq.dtype))
    for s, off in enumerate(d.offsets):
        sl = jax.lax.slice(xq, (p + off,), (p + off + d.n_pad,))
        acc = acc + d.data[s] * sl
    out = jnp.zeros_like(xq)
    return jax.lax.dynamic_update_slice(out, acc * scale, (p,))


# --- ping-pong SpMV: aliased output buffer, zero chain overhead ----------
#
# The padded-IO kernels above emit y in the x layout but pay for it: the
# grid gains two halo steps and the output write grows by 2·P words
# (measured: best 101.7 Gnnz/s on Poisson-1M vs 104.8 for padded+repack —
# no win).  The ping-pong kernels instead take a SECOND buffer in the same
# [P + n_pad + P] layout whose halo blocks are already zero, alias it to
# the output (``input_output_aliases``), and write only the interior
# blocks: grid = n_pad/P, traffic identical to the plain resident kernel,
# no repack.  Iterative drivers carry (x, y) and swap each step:
#
#     y = spmv_dia_pingpong(d, x, y, scale);  x, y = y, x
#
# The swap preserves the invariant (both buffers' halo blocks stay zero —
# the kernel never writes them), so a Jacobi/CG/bench chain runs at the
# kernel's own HBM rate.

def dia_pp_tile(d: DIA) -> int:
    """Lane tile P for the ping-pong kernels.  P is both the halo pad and
    the output block, so it must be a multiple of ``_ALIGN`` ≥ halo that
    divides n_pad.  Prefers the largest VMEM-feasible tile ≤ 64·ALIGN —
    the measured optimum on the v5e (Poisson-1M resident chain: P=16384
    → 98.0, 32768 → 105.6, 65536 → 109.6, 131072 → 107.6 Gnnz/s).
    Returns 0 when none exists."""
    budget = _MAX_VMEM_BYTES // 4
    best = 0
    tr = _round_up(max(d.halo, _ALIGN), _ALIGN)
    while tr <= min(d.n_pad, 64 * _ALIGN):
        if d.n_pad % tr == 0:
            resident = (d.n_pad + 2 * tr) + (3 * d.ndiags + 4) * tr <= budget
            streamed = 2 * (tr + 2 * d.halo) + (3 * d.ndiags + 8) * tr <= budget
            if resident or streamed:
                best = tr
            else:
                break
        tr += _ALIGN
    return best


def _pp_resident_ok(d: DIA, tr: int) -> bool:
    budget = _MAX_VMEM_BYTES // 4
    return (d.n_pad + 2 * tr) + (3 * d.ndiags + 4) * tr <= budget


def _spmv_pallas_pp(d: DIA, xq: jax.Array, yq: jax.Array, scale: float = 1.0,
                    interpret: bool = False) -> jax.Array:
    """Resident ping-pong SpMV: x [P + n_pad + P] whole in VMEM, y aliased
    to the same-layout second operand, interior blocks only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    n_pad = d.n_pad
    tr = dia_pp_tile(d)
    assert tr and xq.shape == yq.shape == (n_pad + 2 * tr,), (tr, xq.shape)
    grid = n_pad // tr
    center = offsets.index(0) if 0 in offsets else None

    def kernel(d_ref, x_ref, y_in, y_ref):
        j = pl.program_id(0)
        # window for rows j·tr starts at buffer offset (j+1)·tr − halo ≥ 0
        # (tr ≥ halo); both are _ALIGN multiples — annotate for Mosaic
        start = pl.multiple_of((j + 1) * tr - halo, _ALIGN)
        ext = x_ref[pl.ds(start, tr + 2 * halo)]
        if center is not None:
            acc = d_ref[center, :] * jax.lax.slice(ext, (halo,), (halo + tr,))
        else:
            acc = jnp.zeros((tr,), y_ref.dtype)
        for s, off in enumerate(offsets):
            if s == center:
                continue
            acc += d_ref[s, :] * jax.lax.slice(
                ext, (halo + off,), (halo + off + tr,))
        y_ref[:] = acc * scale if scale != 1.0 else acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad + 2 * tr,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tr,), lambda j: (j + 1,),
                               memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xq, yq)


def _spmv_pallas_pp_stream(d: DIA, xq: jax.Array, yq: jax.Array,
                           scale: float = 1.0,
                           interpret: bool = False) -> jax.Array:
    """Streamed ping-pong SpMV: x stays in HBM, in-kernel double-buffered
    window DMAs (the stream2 pattern), y aliased as in the resident
    variant.  Compute is duplicated per parity branch instead of the
    stream2 ``jnp.where(even, s0, s1)`` that reads BOTH scratch buffers."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, halo = d.offsets, d.halo
    n_pad = d.n_pad
    tr = dia_pp_tile(d)
    assert tr and xq.shape == yq.shape == (n_pad + 2 * tr,), (tr, xq.shape)
    grid = n_pad // tr
    win = tr + 2 * halo
    center = offsets.index(0) if 0 in offsets else None

    def kernel(d_ref, x_hbm, y_in, y_ref, s0, s1, sem0, sem1):
        j = pl.program_id(0)
        even = jax.lax.rem(j, jnp.asarray(2, j.dtype)) == 0

        def dma(jj, buf, sem):
            start = pl.multiple_of((jj + 1) * tr - halo, _ALIGN)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, win)], buf, sem)

        @pl.when(j == 0)
        def _():
            dma(0, s0, sem0).start()

        @pl.when((j + 1 < grid) & even)
        def _():
            dma(j + 1, s1, sem1).start()

        @pl.when((j + 1 < grid) & ~even)
        def _():
            dma(j + 1, s0, sem0).start()

        def compute(buf):
            ext = buf[:]
            if center is not None:
                acc = d_ref[center, :] * jax.lax.slice(
                    ext, (halo,), (halo + tr,))
            else:
                acc = jnp.zeros((tr,), y_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                acc += d_ref[s, :] * jax.lax.slice(
                    ext, (halo + off,), (halo + off + tr,))
            y_ref[:] = acc * scale if scale != 1.0 else acc

        @pl.when(even)
        def _():
            dma(j, s0, sem0).wait()
            compute(s0)

        @pl.when(~even)
        def _():
            dma(j, s1, sem1).wait()
            compute(s1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad + 2 * tr,), d.data.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d.ndiags, tr), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr,), lambda j: (j + 1,),
                               memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((win,), d.data.dtype),
            pltpu.VMEM((win,), d.data.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d.data, xq, yq)


def dia_pad_pp(d: DIA, x: jax.Array, tr: int | None = None) -> jax.Array:
    """[n] → [P + n_pad + P] ping-pong buffer, P = ``dia_pp_tile(d)``
    (falls back to the halo width when no tile exists — the jnp path
    then handles any P).  Pass ``tr`` to build the buffer for a
    non-default tile (e.g. ``dia_power_tile(d, k)``)."""
    if tr is None:
        tr = dia_pp_tile(d) or d.halo
    dt = jnp.promote_types(d.data.dtype, x.dtype)
    buf = jnp.zeros((tr + d.n_pad + tr,), dt)
    return jax.lax.dynamic_update_slice(buf, x.astype(dt), (tr,))


def spmv_dia_pingpong(d: DIA, xq: jax.Array, yq: jax.Array,
                      scale: float = 1.0) -> jax.Array:
    """y = scale·(A·x) written into ``yq``'s interior (aliased), both in the
    ``dia_pad_pp`` layout with zero halo blocks.  Returns the updated y in
    the SAME layout; chained drivers then swap the two buffers:

        y = spmv_dia_pingpong(d, x, y); x, y = y, x
    """
    tr = dia_pp_tile(d)
    if _use_pallas() and tr and xq.shape[0] == d.n_pad + 2 * tr:
        if _pp_resident_ok(d, tr):
            return _spmv_pallas_pp(d, xq, yq, scale=scale)
        return _spmv_pallas_pp_stream(d, xq, yq, scale=scale)
    p = (xq.shape[0] - d.n_pad) // 2
    acc = jnp.zeros((d.n_pad,), jnp.promote_types(d.data.dtype, xq.dtype))
    for s, off in enumerate(d.offsets):
        sl = jax.lax.slice(xq, (p + off,), (p + off + d.n_pad,))
        acc = acc + d.data[s] * sl
    return jax.lax.dynamic_update_slice(yq, acc * scale, (p,))


# --- fused 2-step (temporally-blocked) SpMV ------------------------------
#
# A chained y ← s·A·x is dominated by re-reading the diagonals each step
# (5/7 of HBM traffic for a width-5 stencil).  Temporal blocking fuses TWO
# dependent applies into one kernel: each row tile loads one widened data
# window (rows j·tr − h … j·tr + tr + h) and computes
#
#     y_ext = s·A·x   on rows j·tr − h … (j+1)·tr + h   (pass 1)
#     z     = s·A·y   on rows j·tr     … (j+1)·tr       (pass 2)
#
# so z = s²·A²·x with the data read ONCE per two applies (~3.6 B/nnz vs
# 5.6).  Standard stencil temporal blocking — valid for Jacobi smoothers,
# power iterations, and the bench chain; NOT for Krylov steps that need a
# dot product between applies.  Same ping-pong buffer/alias discipline as
# spmv_dia_pingpong; needs P = dia_pp_tile(d) ≥ 2·halo.

def dia_power_data(d: DIA, k: int = 2, tr: int | None = None) -> jax.Array:
    """Per-tile widened data windows for the fused k-step kernel:
    [grid, ndiags, tr + 2(k−1)h] where window j holds diagonal rows
    [j·tr − (k−1)h, j·tr + tr + (k−1)h) (zeros beyond the edges).  Build
    ONCE outside any loop (it's a +2(k−1)h/tr-overlapped copy of the
    diagonals).  Grid-mapped blocks avoid the Mosaic restriction that
    MANUAL DMA slices along a sublane-tiled dim be 8-aligned (ndiags is
    5 for a 5-point stencil).  ``tr`` overrides the tile (must match the
    buffers the kernel is later called with — e.g. ``dia_power_tile``)."""
    h = d.halo
    if tr is None:
        tr = dia_pp_tile(d)
    if not tr:
        return jnp.zeros((0, d.ndiags, 0), d.data.dtype)
    m = (k - 1) * h
    win = tr + 2 * m
    grid = d.n_pad // tr
    padded = jnp.pad(d.data, ((0, 0), (m, m)))      # row r at index r + m
    return jnp.stack(
        [jax.lax.slice(padded, (0, j * tr), (d.ndiags, j * tr + win))
         for j in range(grid)])


def dia_power_ok(d: DIA, k: int = 2, tr: int | None = None) -> bool:
    """Whether the fused k-step kernel supports this matrix at tile ``tr``
    (default: the matrix-global ping-pong tile)."""
    if tr is None:
        tr = dia_pp_tile(d)
    if not tr or tr < k * d.halo or k < 2:
        return False
    budget = _MAX_VMEM_BYTES // 4
    # x resident + double-buffered (sublane-padded) data windows + ext /
    # intermediate / slice temps + double-buffered out
    rows8 = _round_up(d.ndiags, 8)
    win_d = tr + 2 * (k - 1) * d.halo
    need = ((d.n_pad + 2 * tr)
            + (2 * rows8 + 2 * d.ndiags + 8) * win_d
            + 2 * k * d.halo)
    return need <= budget


def _spmv_pallas_power(d: DIA, datak: jax.Array, xq: jax.Array,
                       zq: jax.Array, scale: float = 1.0, k: int = 2,
                       cq: jax.Array | None = None,
                       interpret: bool = False) -> jax.Array:
    """Resident fused k-step SpMV (temporal blocking): x whole in VMEM,
    per-tile data windows grid-mapped (Pallas double-buffers them), z
    aliased into the second ping-pong buffer.  Pass p ∈ 1..k computes
    scale·A·(previous) [+ c] on rows j·tr ± (k−p)·h, shrinking by h per
    pass.  With ``cq`` (same padded layout) each pass is the AFFINE map
    cur ← scale·A·cur + c — i.e. k weighted-Jacobi sweeps when A is the
    iteration matrix I − ωD⁻¹A₀ and c = ωD⁻¹b."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, h = d.offsets, d.halo
    n_pad = d.n_pad
    tr = (xq.shape[0] - n_pad) // 2      # tile = the buffers' pad width
    grid = n_pad // tr
    m = (k - 1) * h
    win_d = tr + 2 * m
    assert tr and tr >= k * h and xq.shape == zq.shape == (n_pad + 2 * tr,)
    assert tr % _ALIGN == 0 and n_pad % tr == 0, tr
    assert datak.shape == (grid, d.ndiags, win_d), (datak.shape, grid, win_d)
    affine = cq is not None
    if affine:
        assert cq.shape == xq.shape
    center = offsets.index(0) if 0 in offsets else None

    def body(d_ref, x_ref, c_ref, z_ref):
        j = pl.program_id(0)
        # x rows j·tr − k·h … (j+1)·tr + k·h (buffer offset +tr = P)
        xstart = pl.multiple_of((j + 1) * tr - k * h, _ALIGN)
        cur = x_ref[pl.ds(xstart, tr + 2 * k * h)]
        if affine:
            cstart = pl.multiple_of((j + 1) * tr - m, _ALIGN)
            cext = c_ref[pl.ds(cstart, win_d)]
        for p in range(1, k + 1):
            out_len = tr + 2 * (k - p) * h
            dlo = (p - 1) * h      # window row j·tr − (k−p)h ↦ dwin index

            def dia_row(s, dlo=dlo, out_len=out_len):
                return jax.lax.slice(d_ref[0, s, :], (dlo,), (dlo + out_len,))

            if center is not None:
                y = dia_row(center) * jax.lax.slice(cur, (h,), (h + out_len,))
            else:
                y = jnp.zeros((out_len,), z_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                y += dia_row(s) * jax.lax.slice(
                    cur, (h + off,), (h + off + out_len,))
            cur = y * scale if scale != 1.0 else y
            if affine:
                cur = cur + jax.lax.slice(cext, (dlo,), (dlo + out_len,))
        z_ref[:] = cur

    if affine:
        def kernel(d_ref, x_ref, c_ref, z_in, z_ref):
            body(d_ref, x_ref, c_ref, z_ref)
        extra_in = [pl.BlockSpec(memory_space=pltpu.VMEM)]
        operands = (datak, xq, cq, zq)
        aliases = {3: 0}
    else:
        def kernel(d_ref, x_ref, z_in, z_ref):
            body(d_ref, x_ref, None, z_ref)
        extra_in = []
        operands = (datak, xq, zq)
        aliases = {2: 0}

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad + 2 * tr,), xq.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, d.ndiags, win_d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *extra_in,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr,), lambda j: (j + 1,),
                               memory_space=pltpu.VMEM),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def dia_power_stream_ok(d: DIA, k: int = 2, tr: int | None = None) -> bool:
    """Whether the STREAMED fused k-step kernel supports this matrix at
    tile ``tr`` (x stays in HBM; double-buffered manual window DMAs)."""
    if tr is None:
        tr = dia_pp_tile(d)
    if not tr or tr < k * d.halo or k < 2:
        return False
    budget = _MAX_VMEM_BYTES // 4
    rows8 = _round_up(d.ndiags, 8)
    win_d = tr + 2 * (k - 1) * d.halo
    win_x = tr + 2 * k * d.halo
    # two x windows + two c windows (affine worst case) + double-buffered
    # data blocks + out + pass temps
    need = (4 * win_x + (2 * rows8 + 2 * d.ndiags + 6) * win_d + 2 * tr)
    return need <= budget


def dia_power_tile(d: DIA, k: int = 2) -> int:
    """Largest ping-pong tile P feasible for the fused k-step kernel at
    THIS k (resident or streamed) — smaller than ``dia_pp_tile`` when a
    big halo inflates the ±(k−1)·h data windows past the VMEM model (the
    k=8 / halo-4096 case: the matrix-global tile fails both _ok checks
    and the solver used to fall back to a lower k).  0 when no tile
    supports this k.  P must be a multiple of ``_ALIGN`` ≥ k·halo that
    divides n_pad (window starts (j+1)·P − k·h then stay 1024-aligned
    because halo is _ALIGN-rounded)."""
    if k < 2:
        return 0
    best = 0
    tr = _round_up(max(k * d.halo, _ALIGN), _ALIGN)
    while tr <= min(d.n_pad, 64 * _ALIGN):
        if d.n_pad % tr == 0:
            if dia_power_ok(d, k, tr) or dia_power_stream_ok(d, k, tr):
                best = tr
            else:
                break          # need is monotone increasing in tr
        tr += _ALIGN
    return best


def _spmv_pallas_power_stream(d: DIA, datak: jax.Array, xq: jax.Array,
                              zq: jax.Array, scale: float = 1.0, k: int = 2,
                              cq: jax.Array | None = None,
                              interpret: bool = False) -> jax.Array:
    """Streamed fused k-step SpMV: x (and the affine constant) stay in HBM
    and are window-DMA'd with double buffering (the stream2 pattern); data
    windows stay grid-mapped; z aliased.  Compute duplicated per parity
    branch (a jnp.where over both scratch buffers reads twice)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, h = d.offsets, d.halo
    n_pad = d.n_pad
    tr = (xq.shape[0] - n_pad) // 2      # tile = the buffers' pad width
    grid = n_pad // tr
    m = (k - 1) * h
    win_d = tr + 2 * m
    win_x = tr + 2 * k * h
    assert tr and tr >= k * h and xq.shape == zq.shape == (n_pad + 2 * tr,)
    assert tr % _ALIGN == 0 and n_pad % tr == 0, tr
    assert datak.shape == (grid, d.ndiags, win_d), (datak.shape, grid, win_d)
    affine = cq is not None
    if affine:
        assert cq.shape == xq.shape
    center = offsets.index(0) if 0 in offsets else None

    def passes(d_ref, z_ref, xbuf, cbuf):
        cur = xbuf[:]
        cext = cbuf[:] if affine else None
        for p in range(1, k + 1):
            out_len = tr + 2 * (k - p) * h
            dlo = (p - 1) * h

            def dia_row(s, dlo=dlo, out_len=out_len):
                return jax.lax.slice(d_ref[0, s, :], (dlo,), (dlo + out_len,))

            if center is not None:
                y = dia_row(center) * jax.lax.slice(cur, (h,), (h + out_len,))
            else:
                y = jnp.zeros((out_len,), z_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                y += dia_row(s) * jax.lax.slice(
                    cur, (h + off,), (h + off + out_len,))
            cur = y * scale if scale != 1.0 else y
            if affine:
                # cext covers rows j·tr ± (k−1)h; pass p's rows start (p−1)h in
                cur = cur + jax.lax.slice(cext, (dlo,), (dlo + out_len,))
        z_ref[:] = cur

    def kernel(d_ref, x_hbm, c_hbm, z_in, z_ref,
               x0, x1, c0, c1, semx0, semx1, semc0, semc1):
        j = pl.program_id(0)
        even = jax.lax.rem(j, jnp.asarray(2, j.dtype)) == 0

        def dma_x(jj, buf, sem):
            start = pl.multiple_of((jj + 1) * tr - k * h, _ALIGN)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, win_x)], buf, sem)

        def dma_c(jj, buf, sem):
            start = pl.multiple_of((jj + 1) * tr - m, _ALIGN)
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(start, win_d)], buf, sem)

        def start_all(jj, xbuf, semx, cbuf, semc):
            dma_x(jj, xbuf, semx).start()
            if affine:
                dma_c(jj, cbuf, semc).start()

        @pl.when(j == 0)
        def _():
            start_all(0, x0, semx0, c0, semc0)

        @pl.when((j + 1 < grid) & even)
        def _():
            start_all(j + 1, x1, semx1, c1, semc1)

        @pl.when((j + 1 < grid) & ~even)
        def _():
            start_all(j + 1, x0, semx0, c0, semc0)

        @pl.when(even)
        def _():
            dma_x(j, x0, semx0).wait()
            if affine:
                dma_c(j, c0, semc0).wait()
            passes(d_ref, z_ref, x0, c0)

        @pl.when(~even)
        def _():
            dma_x(j, x1, semx1).wait()
            if affine:
                dma_c(j, c1, semc1).wait()
            passes(d_ref, z_ref, x1, c1)

    c_arg = cq if affine else jnp.zeros((1024,), xq.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad + 2 * tr,), xq.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, d.ndiags, win_d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tr,), lambda j: (j + 1,),
                               memory_space=pltpu.VMEM),
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((win_x,), xq.dtype),
            pltpu.VMEM((win_x,), xq.dtype),
            pltpu.VMEM((win_d,), xq.dtype),
            pltpu.VMEM((win_d,), xq.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(datak, xq, c_arg, zq)


def dia_cheby_ok(d: DIA, k: int) -> bool:
    """VMEM feasibility of the fused Chebyshev kernel (z resident, dd/r
    double-buffered window DMAs, data windows grid-mapped)."""
    tr = dia_pp_tile(d)
    if not tr or tr < k * d.halo or k < 2:
        return False
    budget = _MAX_VMEM_BYTES // 4
    rows8 = _round_up(d.ndiags, 8)
    win_d = tr + 2 * (k - 1) * d.halo
    need = ((d.n_pad + 2 * tr)                      # z resident
            + (2 * rows8 + 2 * d.ndiags + 6) * win_d  # data dbuf + temps
            + 4 * win_d                               # dd/r window dbuf
            + 4 * tr)                                 # two dbuf outputs
    return need <= budget


def _spmv_pallas_cheby(d: DIA, datak: jax.Array, zq: jax.Array,
                       ddq: jax.Array, rq: jax.Array,
                       z_dead: jax.Array, dd_dead: jax.Array,
                       coeffs: tuple, k: int,
                       interpret: bool = False):
    """Fused k steps of the Chebyshev semi-iteration (solvers/stationary.py
    ``chebyshev_coeffs``): per pass p with STATIC (aₚ, bₚ)

        dd ← aₚ·dd + bₚ·(r − A·z);   z ← z + dd

    z is whole-VMEM (its matvec needs halos); dd and r stream as
    double-buffered ±(k−1)h windows; data windows grid-map
    (``dia_power_data(d, k)``).  Returns (z_out, dd_out) aliased into
    ``z_dead``/``dd_dead`` — the same fixed-role ping-pong discipline as
    ``spmv_dia_power``, with two buffer pairs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, h = d.offsets, d.halo
    n_pad = d.n_pad
    tr = dia_pp_tile(d)
    grid = n_pad // tr
    m = (k - 1) * h
    win_d = tr + 2 * m
    assert tr and tr >= k * h and len(coeffs) == k
    assert zq.shape == ddq.shape == rq.shape == (n_pad + 2 * tr,)
    assert datak.shape == (grid, d.ndiags, win_d), (datak.shape, grid, win_d)
    center = offsets.index(0) if 0 in offsets else None

    def passes(d_ref, z_ref, dd_ref, zcur, ddcur, rcur):
        for p in range(1, k + 1):
            out_len = tr + 2 * (k - p) * h
            dlo = (p - 1) * h
            a_p, b_p = coeffs[p - 1]

            def dia_row(s, dlo=dlo, out_len=out_len):
                return jax.lax.slice(d_ref[0, s, :], (dlo,), (dlo + out_len,))

            if center is not None:
                t = dia_row(center) * jax.lax.slice(zcur, (h,), (h + out_len,))
            else:
                t = jnp.zeros((out_len,), z_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                t += dia_row(s) * jax.lax.slice(
                    zcur, (h + off,), (h + off + out_len,))
            # p=1 consumes the full dd/r windows (offset 0 / dlo=0);
            # later passes slice the shrinking center
            ddc = ddcur if p == 1 else jax.lax.slice(
                ddcur, (h,), (h + out_len,))
            rc = jax.lax.slice(rcur, (dlo,), (dlo + out_len,))
            dd_new = a_p * ddc + b_p * (rc - t)
            zcur = jax.lax.slice(zcur, (h,), (h + out_len,)) + dd_new
            ddcur = dd_new
        z_ref[:] = zcur
        dd_ref[:] = ddcur

    def kernel(d_ref, z_in, dd_hbm, r_hbm, z_a, dd_a, z_ref, dd_ref,
               s_dd0, s_dd1, s_r0, s_r1, sem0, sem1, sem2, sem3):
        j = pl.program_id(0)
        even = jax.lax.rem(j, jnp.asarray(2, j.dtype)) == 0

        def dma(hbm, jj, buf, sem):
            start = pl.multiple_of((jj + 1) * tr - m, _ALIGN)
            return pltpu.make_async_copy(hbm.at[pl.ds(start, win_d)], buf, sem)

        @pl.when(j == 0)
        def _():
            dma(dd_hbm, 0, s_dd0, sem0).start()
            dma(r_hbm, 0, s_r0, sem2).start()

        @pl.when((j + 1 < grid) & even)
        def _():
            dma(dd_hbm, j + 1, s_dd1, sem1).start()
            dma(r_hbm, j + 1, s_r1, sem3).start()

        @pl.when((j + 1 < grid) & ~even)
        def _():
            dma(dd_hbm, j + 1, s_dd0, sem0).start()
            dma(r_hbm, j + 1, s_r0, sem2).start()

        zstart = pl.multiple_of((j + 1) * tr - k * h, _ALIGN)
        zcur = z_in[pl.ds(zstart, tr + 2 * k * h)]

        @pl.when(even)
        def _():
            dma(dd_hbm, j, s_dd0, sem0).wait()
            dma(r_hbm, j, s_r0, sem2).wait()
            passes(d_ref, z_ref, dd_ref, zcur, s_dd0[:], s_r0[:])

        @pl.when(~even)
        def _():
            dma(dd_hbm, j, s_dd1, sem1).wait()
            dma(r_hbm, j, s_r1, sem3).wait()
            passes(d_ref, z_ref, dd_ref, zcur, s_dd1[:], s_r1[:])

    shp = jax.ShapeDtypeStruct((n_pad + 2 * tr,), d.data.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(shp, shp),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, d.ndiags, win_d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tr,), lambda j: (j + 1,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr,), lambda j: (j + 1,), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM((win_d,), d.data.dtype),
            pltpu.VMEM((win_d,), d.data.dtype),
            pltpu.VMEM((win_d,), d.data.dtype),
            pltpu.VMEM((win_d,), d.data.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * (d.ndiags + 3) * n_pad,
            bytes_accessed=(d.ndiags + 4) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(datak, zq, ddq, rq, z_dead, dd_dead)


def spmv_dia_cheby(d: DIA, datak: jax.Array, zq: jax.Array, ddq: jax.Array,
                   rq: jax.Array, z_dead: jax.Array, dd_dead: jax.Array,
                   coeffs: tuple, k: int):
    """Fused k Chebyshev semi-iteration steps (see ``_spmv_pallas_cheby``)
    with a jnp fallback of identical semantics."""
    tr = dia_pp_tile(d)
    if (_use_pallas() and dia_cheby_ok(d, k)
            and zq.shape[0] == d.n_pad + 2 * tr):
        return _spmv_pallas_cheby(d, datak, zq, ddq, rq, z_dead, dd_dead,
                                  coeffs, k)
    p = (zq.shape[0] - d.n_pad) // 2
    h = d.halo
    z = jax.lax.slice(zq, (p - h,), (p + d.n_pad + h,))
    dd = jax.lax.slice(ddq, (p,), (p + d.n_pad,))
    r = jax.lax.slice(rq, (p,), (p + d.n_pad,))
    for (a, b) in coeffs:
        t = jnp.zeros((d.n_pad,), z.dtype)
        for s, off in enumerate(d.offsets):
            t = t + d.data[s] * jax.lax.slice(z, (h + off,),
                                              (h + off + d.n_pad,))
        dd = a * dd + b * (r - t)
        z = jnp.pad(jax.lax.slice(z, (h,), (h + d.n_pad,)) + dd, (h, h))
    z_out = jax.lax.dynamic_update_slice(
        z_dead, jax.lax.slice(z, (h,), (h + d.n_pad,)), (p,))
    dd_out = jax.lax.dynamic_update_slice(dd_dead, dd, (p,))
    return z_out, dd_out


def spmv_dia_power(d: DIA, datak: jax.Array, xq: jax.Array, zq: jax.Array,
                   scale: float = 1.0, k: int = 2,
                   add: jax.Array | None = None) -> jax.Array:
    """z = scaleᵏ·Aᵏ·x — k chained SpMVs fused into ONE pass over the
    diagonal data (temporal blocking; the chain's HBM traffic is dominated
    by re-reading the diagonals, so the fused chain runs ~k× the plain
    chain until compute-bound).  With ``add`` (same padded layout) each
    pass is the AFFINE map cur ← scale·A·cur + add — k weighted-Jacobi
    sweeps when A = I − ωD⁻¹A₀ and add = ωD⁻¹b (see solvers/stationary.py).
    Valid for Jacobi smoothers / power iterations / chained-apply
    benchmarks — NOT for Krylov steps that need a dot product between
    applies.  Buffers in the ``dia_pad_pp`` layout with zero halo blocks
    (the invariant is preserved); ``datak`` from ``dia_power_data(d, k)``
    built at the SAME tile as the buffers' pad width (the kernel derives
    the tile from the shapes, so per-k tiles from ``dia_power_tile`` ride
    the same entry point).  Falls back to k jnp applies when the Pallas
    path is unavailable."""
    tr = (xq.shape[0] - d.n_pad) // 2
    if (_use_pallas() and tr > 0 and xq.shape[0] == d.n_pad + 2 * tr
            and tr % _ALIGN == 0 and d.n_pad % tr == 0
            and datak.ndim == 3 and datak.shape[0] == d.n_pad // tr):
        if dia_power_ok(d, k, tr):
            return _spmv_pallas_power(d, datak, xq, zq, scale=scale, k=k,
                                      cq=add)
        if dia_power_stream_ok(d, k, tr):
            return _spmv_pallas_power_stream(d, datak, xq, zq, scale=scale,
                                             k=k, cq=add)
    p = (xq.shape[0] - d.n_pad) // 2
    h = d.halo
    dt = jnp.promote_types(d.data.dtype, xq.dtype)
    cur = jax.lax.slice(xq, (p - h,), (p + d.n_pad + h,))
    cadd = None if add is None else jax.lax.slice(add, (p,), (p + d.n_pad,))
    for _ in range(k):
        acc = jnp.zeros((d.n_pad,), dt)
        for s, off in enumerate(d.offsets):
            sl = jax.lax.slice(cur, (h + off,), (h + off + d.n_pad,))
            acc = acc + d.data[s] * sl
        acc = acc * scale
        if cadd is not None:
            acc = acc + cadd
        cur = jnp.pad(acc, (h, h))
    return jax.lax.dynamic_update_slice(
        zq, jax.lax.slice(cur, (h,), (h + d.n_pad,)), (p,))


@jax.custom_vjp
def spmv_dia(d: DIA, x: jax.Array) -> jax.Array:
    """y = A·x for DIA A.  Pallas on TPU, jnp elsewhere.  VJP: dx = Aᵀ·g,
    d(data)[s,i] = g[i]·x[i+off_s] (both one pass)."""
    if _use_pallas():
        if _x_fits_vmem(d):
            xp = _pad_x(d, x.astype(d.data.dtype))
            return _spmv_pallas(d, xp)[: d.n]
        if _stream2_fits(d):
            # v2 (in-kernel double-buffered window DMAs) measures 91 vs 83
            # Gnnz/s for v1's host-side halo tensor at 84M nnz on the v5e
            xp = _pad_x(d, x.astype(d.data.dtype))
            return _spmv_pallas_stream2(d, xp)[: d.n]
        if d.halo <= _pick_tile_stream(d):
            xu = jnp.pad(x.astype(d.data.dtype), (0, d.n_pad - x.shape[0]))
            return _spmv_pallas_stream(d, xu)[: d.n]
    return spmv_dia_jnp(d, x)


def _spmv_fwd(d, x):
    return spmv_dia(d, x), (d, x)


def _spmv_bwd(res, g):
    d, x = res
    dx = spmv_dia(dia_transpose(d), g)
    h = d.halo
    xp = _pad_x(d, x)
    n = d.n
    g_rows = []
    for s, off in enumerate(d.offsets):
        xs = jax.lax.slice(xp, (h + off,), (h + off + n,))
        g_rows.append(jnp.pad(g[:n] * xs, (0, d.n_pad - n)))
    dd = dataclasses.replace(d, data=jnp.stack(g_rows))
    return dd, dx


spmv_dia.defvjp(_spmv_fwd, _spmv_bwd)


# --- multi-RHS fused k-step (temporally-blocked) SpMV --------------------
#
# The [K, n] generalization of _spmv_pallas_power: K right-hand sides ride
# the sublane dimension, so ONE widened diagonal-data read serves k
# dependent applies × K vectors — the diagonal traffic per (apply, rhs)
# drops by k·K.  The multi-RHS weighted-Jacobi smoother
# (solvers.stationary.jacobi_multirhs) and block-Krylov users sit on top.

def dia_pad_pp_rhs(d: DIA, x: jax.Array, tr: int | None = None) -> jax.Array:
    """[K, n] → [K, P + n_pad + P] ping-pong buffers (promoted dtype, zero
    halo blocks)."""
    if tr is None:
        tr = dia_pp_tile(d) or d.halo
    k_rhs, n = x.shape
    dt = jnp.promote_types(d.data.dtype, x.dtype)
    buf = jnp.zeros((k_rhs, tr + d.n_pad + tr), dt)
    return jax.lax.dynamic_update_slice(buf, x.astype(dt), (0, tr))


def dia_power_rhs_ok(d: DIA, k: int, n_rhs: int, tr: int | None = None) -> bool:
    """VMEM model for the resident multi-RHS fused kernel: the x/z/out
    terms scale by K, the data windows don't."""
    if tr is None:
        tr = dia_pp_tile(d)
    if not tr or tr < k * d.halo or k < 2:
        return False
    budget = _MAX_VMEM_BYTES // 4
    rows8 = _round_up(d.ndiags, 8)
    win_d = tr + 2 * (k - 1) * d.halo
    need = (n_rhs * (d.n_pad + 2 * tr)            # resident X
            + (2 * rows8 + 2 * d.ndiags + 8) * win_d
            + n_rhs * (2 * tr + tr + 2 * k * d.halo))   # out dbl-buf + cur
    return need <= budget


def _spmv_pallas_power_rhs(d: DIA, datak: jax.Array, xq: jax.Array,
                           zq: jax.Array, scale: float = 1.0, k: int = 2,
                           cq: jax.Array | None = None,
                           interpret: bool = False) -> jax.Array:
    """Resident multi-RHS fused k-step: X [K, n_pad+2tr] whole in VMEM,
    data windows grid-mapped, Z aliased.  Each pass computes
    scale·A·(previous) [+ c] on all K rows simultaneously (K on sublanes,
    rows on lanes — the same [K, out_len] vector ops as the 1-RHS kernel
    broadcast over sublanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets, h = d.offsets, d.halo
    n_pad = d.n_pad
    K = xq.shape[0]
    tr = (xq.shape[1] - n_pad) // 2
    grid = n_pad // tr
    m = (k - 1) * h
    win_d = tr + 2 * m
    assert tr and tr >= k * h and xq.shape == zq.shape == (K, n_pad + 2 * tr)
    assert tr % _ALIGN == 0 and n_pad % tr == 0, tr
    assert datak.shape == (grid, d.ndiags, win_d)
    affine = cq is not None
    if affine:
        assert cq.shape == xq.shape
    center = offsets.index(0) if 0 in offsets else None

    def body(d_ref, x_ref, c_ref, z_ref):
        j = pl.program_id(0)
        xstart = pl.multiple_of((j + 1) * tr - k * h, _ALIGN)
        cur = x_ref[:, pl.ds(xstart, tr + 2 * k * h)]          # [K, win_x]
        if affine:
            cstart = pl.multiple_of((j + 1) * tr - m, _ALIGN)
            cext = c_ref[:, pl.ds(cstart, win_d)]
        for p in range(1, k + 1):
            out_len = tr + 2 * (k - p) * h
            dlo = (p - 1) * h

            def dia_row(s, dlo=dlo, out_len=out_len):
                return jax.lax.slice(d_ref[0, s, :], (dlo,),
                                     (dlo + out_len,))[None, :]

            def cur_slice(off, out_len=out_len):
                return jax.lax.slice(cur, (0, h + off),
                                     (K, h + off + out_len))

            if center is not None:
                y = dia_row(center) * cur_slice(0)
            else:
                y = jnp.zeros((K, out_len), z_ref.dtype)
            for s, off in enumerate(offsets):
                if s == center:
                    continue
                y += dia_row(s) * cur_slice(off)
            cur = y * scale if scale != 1.0 else y
            if affine:
                cur = cur + jax.lax.slice(cext, (0, dlo), (K, dlo + out_len))
        z_ref[...] = cur

    if affine:
        def kernel(d_ref, x_ref, c_ref, z_in, z_ref):
            body(d_ref, x_ref, c_ref, z_ref)
        extra_in = [pl.BlockSpec(memory_space=pltpu.VMEM)]
        operands = (datak, xq, cq, zq)
        aliases = {3: 0}
    else:
        def kernel(d_ref, x_ref, z_in, z_ref):
            body(d_ref, x_ref, None, z_ref)
        extra_in = []
        operands = (datak, xq, zq)
        aliases = {2: 0}

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, n_pad + 2 * tr), xq.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, d.ndiags, win_d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *extra_in,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((K, tr), lambda j: (0, j + 1),
                               memory_space=pltpu.VMEM),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * K * d.ndiags * n_pad,
            bytes_accessed=(d.ndiags + 2 * K) * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def spmv_dia_power_rhs(d: DIA, datak: jax.Array, xq: jax.Array,
                       zq: jax.Array, scale: float = 1.0, k: int = 2,
                       add: jax.Array | None = None) -> jax.Array:
    """Multi-RHS ``spmv_dia_power``: Z = scaleᵏ·Aᵏ·X for X = [K, n] in the
    ``dia_pad_pp_rhs`` layout (affine with ``add``, per-RHS constants).
    Falls back to K vectorized jnp applies off-TPU / out of model."""
    K = xq.shape[0]
    tr = (xq.shape[1] - d.n_pad) // 2
    if (_use_pallas() and tr > 0 and xq.shape[1] == d.n_pad + 2 * tr
            and tr % _ALIGN == 0 and d.n_pad % tr == 0
            and datak.ndim == 3 and datak.shape[0] == d.n_pad // tr
            and dia_power_rhs_ok(d, k, K, tr)):
        return _spmv_pallas_power_rhs(d, datak, xq, zq, scale=scale, k=k,
                                      cq=add)
    p = tr
    h = d.halo
    dt = jnp.promote_types(d.data.dtype, xq.dtype)
    cur = jax.lax.slice(xq, (0, p - h), (K, p + d.n_pad + h))
    cadd = None if add is None else jax.lax.slice(
        add, (0, p), (K, p + d.n_pad))
    for _ in range(k):
        acc = jnp.zeros((K, d.n_pad), dt)
        for s, off in enumerate(d.offsets):
            sl = jax.lax.slice(cur, (0, h + off), (K, h + off + d.n_pad))
            acc = acc + d.data[s][None, :] * sl
        acc = acc * scale
        if cadd is not None:
            acc = acc + cadd
        cur = jnp.pad(acc, ((0, 0), (h, h)))
    return jax.lax.dynamic_update_slice(
        zq, jax.lax.slice(cur, (0, h), (K, h + d.n_pad)), (0, p))
