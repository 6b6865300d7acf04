"""Block-ELL sparse × dense (SpMM) on the MXU via Pallas scalar prefetch.

The second TPU execution format (complementing DIA for stencils): matrices
whose nonzeros cluster into dense (bm × bn) blocks are stored block-ELL —
``data: [n_block_rows, W, bm, bn]`` with per-row padded block count W and
``bcols: [n_block_rows, W]`` block-column ids.  SpMM then runs as a grid of
MXU block matmuls where the scalar-prefetched ``bcols`` drive the BlockSpec
index map, so Pallas pipelines the X-block DMAs from HBM automatically.
Padded blocks point at block-column 0 with zero data — they contribute
nothing and need no masking.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.types import CSR, Shape, static_field


@dataclasses.dataclass(frozen=True)
class BELL:
    """Block-ELL sparse matrix."""

    data: jax.Array    # [nbr, W, bm, bn]
    bcols: jax.Array   # int32[nbr, W]
    shape: Shape = static_field()
    nnz: int = static_field()

    @property
    def blockshape(self) -> Tuple[int, int]:
        return (int(self.data.shape[2]), int(self.data.shape[3]))

    @property
    def width(self) -> int:
        return int(self.data.shape[1])

    def todense(self) -> jax.Array:
        nbr, W, bm, bn = self.data.shape
        out = jnp.zeros((nbr, self.shape[1] // bn, bm, bn), self.data.dtype)
        rows = jnp.broadcast_to(jnp.arange(nbr)[:, None], (nbr, W))
        out = out.at[rows.ravel(), self.bcols.ravel()].add(
            self.data.reshape(-1, bm, bn)
        )
        return out.transpose(0, 2, 1, 3).reshape(self.shape)


jax.tree_util.register_dataclass(
    BELL, data_fields=["data", "bcols"], meta_fields=["shape", "nnz"]
)


def csr_to_bell(csr: CSR, blockshape=(8, 128)) -> BELL:
    """Host-side conversion (pattern-static, run once)."""
    bm, bn = blockshape
    m, n = csr.shape
    if m % bm or n % bn:
        raise ValueError(f"shape {csr.shape} not divisible by block {blockshape}")
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    counts = np.diff(indptr)
    row = np.repeat(np.arange(m, dtype=np.int64), counts)
    brow, bcol = row // bm, indices // bn
    key = brow * (n // bn) + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    ub_row = (uniq // (n // bn)).astype(np.int64)
    ub_col = (uniq % (n // bn)).astype(np.int64)
    per_row = np.bincount(ub_row, minlength=m // bm)
    W = max(1, int(per_row.max()))
    nbr = m // bm
    bell_data = np.zeros((nbr, W, bm, bn), data.dtype)
    bell_cols = np.zeros((nbr, W), np.int32)
    slot_of_block = np.zeros(len(uniq), np.int64)
    next_slot = np.zeros(nbr, np.int64)
    for b in np.argsort(ub_row, kind="stable"):
        r = ub_row[b]
        slot_of_block[b] = next_slot[r]
        bell_cols[r, next_slot[r]] = ub_col[b]
        next_slot[r] += 1
    bell_data[ub_row[inv], slot_of_block[inv], row % bm, indices % bn] = data
    return BELL(
        data=jnp.asarray(bell_data),
        bcols=jnp.asarray(bell_cols),
        shape=csr.shape,
        nnz=int(len(data)),
    )


def spmm_bell_jnp(a: BELL, x: jax.Array) -> jax.Array:
    """Reference jnp path (CPU / autodiff): gather X blocks + batched matmul.
    precision="highest": it is the semantic oracle, and the TPU default is
    one bf16 pass (docs/BENCH.md precision trap)."""
    nbr, W, bm, bn = a.data.shape
    xb = x.reshape(-1, bn, x.shape[1])[a.bcols]          # [nbr, W, bn, K]
    yb = jnp.einsum("rwij,rwjk->rik", a.data, xb, precision="highest")
    return yb.reshape(nbr * bm, x.shape[1])


def _spmm_bell_pallas(a: BELL, x: jax.Array, block_k: int | None = None) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbr, W, bm, bn = a.data.shape
    K = x.shape[1]
    if block_k is not None:
        bk = block_k
        if K % bk:
            raise ValueError(f"rhs cols {K} not divisible by block_k {bk}")
    else:
        # largest divisor of K ≤ 512 (lane-multiples preferred); K is
        # always a divisor of itself, so this never fails
        bk = next((c for c in (512, 384, 256, 128) if K % c == 0),
                  K if K <= 512 else None)
        if bk is None:
            bk = max(c for c in range(1, 513) if K % c == 0)

    # f32 storage gets true-f32 matmuls (the TPU default is ONE bf16 pass,
    # ~1e-3 relative — measured); bf16 storage keeps the fast path
    prec = "highest" if a.data.dtype == jnp.float32 else "default"

    def kernel(bcols_ref, a_ref, x_ref, y_ref):
        # w is the innermost grid dim so each output block's visits are
        # consecutive (accumulation stays resident in VMEM)
        w = pl.program_id(2)

        @pl.when(w == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        y_ref[:] += jnp.dot(
            a_ref[0, 0], x_ref[:], preferred_element_type=y_ref.dtype,
            precision=prec,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, K // bk, W),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bm, bn), lambda i, k, w, bcols: (i, w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bn, bk), lambda i, k, w, bcols: (bcols[i, w], k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bk), lambda i, k, w, bcols: (i, k), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, K), a.data.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * W * bm * bn * K,
            bytes_accessed=(nbr * W * (bm * bn + bn * bk) + nbr * bm * K) * 4,
            transcendentals=0,
        ),
    )(a.bcols, a.data, x)


_BELL_VMEM_BUDGET = 10 * 1024 * 1024   # X-tile budget of the 16 MiB/core


def _resident_bk(a: BELL, K: int) -> int | None:
    """Largest 128-multiple K-tile whose [n, bk] X column tile fits VMEM
    (None → X too tall even at bk=128; use the streaming kernel)."""
    n = a.shape[1]
    for bk in (512, 384, 256, 128):
        if K % bk == 0 and n * bk * 4 <= _BELL_VMEM_BUDGET:
            return bk
    return None


def _spmm_bell_pallas_resident(a: BELL, x: jax.Array, bk: int) -> jax.Array:
    """X-resident variant: the whole [n, bk] X column tile sits in VMEM and
    the W blocks of one block-row are reduced *inside* the kernel with
    dynamic-slice gathers (block starts are bn-multiples → sublane-aligned).

    Why: the streaming kernel fetches a [bn, bk] X block from HBM per
    (row, w) grid step — ~bn·bk·4 bytes for 2·bm·bn·bk flops, i.e. ~4
    flops/byte at bm=8, hopelessly X-traffic-bound.  Resident X is fetched
    once per K-tile (grid is k-major), so HBM traffic drops to the A blocks
    (the actual nnz) plus one X/Y pass — measured 13.8× on the v5e at
    4096², 2% density, K=256: 0.27 vs 3.73 ms, 32 TFLOP/s on the padded
    blocks (docs/BENCH.md).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbr, W, bm, bn = a.data.shape
    n = a.shape[1]
    K = x.shape[1]

    # f32 storage gets true-f32 matmuls (the TPU default is ONE bf16 pass,
    # ~1e-3 relative — measured); bf16 storage keeps the fast path
    prec = "highest" if a.data.dtype == jnp.float32 else "default"

    def kernel(bcols_ref, a_ref, x_ref, y_ref):
        i = pl.program_id(1)
        # f32 accumulator regardless of storage dtype (bf16 blocks still
        # accumulate exactly; MXU emits f32 partials either way)
        acc = jnp.zeros((bm, bk), jnp.float32)
        for w in range(W):                       # static unroll over blocks
            xb = x_ref[pl.ds(bcols_ref[i, w] * bn, bn), :]
            acc += jnp.dot(a_ref[0, w], xb, preferred_element_type=jnp.float32,
                           precision=prec)
        y_ref[:] = acc.astype(y_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # k-major: the X tile's index map is constant across the inner nbr
        # sweep, so Pallas fetches it once per K-tile
        grid=(K // bk, nbr),
        in_specs=[
            pl.BlockSpec(
                (1, W, bm, bn), lambda k, i, bcols: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n, bk), lambda k, i, bcols: (0, k), memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bk), lambda k, i, bcols: (i, k), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, K), a.data.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * W * bm * bn * K,
            bytes_accessed=(nbr * W * bm * bn + n * bk + nbr * bm * K) * 4,
            transcendentals=0,
        ),
    )(a.bcols, a.data, x)


def spmm_bell(a: BELL, x: jax.Array) -> jax.Array:
    """Y = A·X.  Pallas/MXU on TPU (X-resident kernel when the column tile
    fits VMEM, streaming scalar-prefetch kernel otherwise), jnp elsewhere."""
    if jax.default_backend() == "tpu":
        bk = _resident_bk(a, x.shape[1])
        if bk is not None:
            return _spmm_bell_pallas_resident(a, x, bk)
        return _spmm_bell_pallas(a, x)
    return spmm_bell_jnp(a, x)


def spmv_bell(a: BELL, x: jax.Array) -> jax.Array:
    """y = A·x via the SpMM kernel with a single RHS column (API
    completeness; DIA is the fast SpMV format — see ops/__init__)."""
    return spmm_bell(a, x[:, None])[:, 0]
