"""TPU execution kernels (Pallas) + format bridge utilities.

Format selection guide (measured on TPU v5e, Poisson-1M, see BENCH):
  * DIA  — stencil/banded matrices (after RCM if needed): ~145 Gnnz/s SpMV
           (HBM roofline); ``ops.dia``.
  * BELL — blockable matrices, dense RHS (SpMM): MXU block matmuls;
           ``ops.bsr``.
  * ELL/COO (jnp) — everything else; correct everywhere, gather-bound on
           TPU (≈0.1 Gnnz/s) — convert before the hot path.
"""

from .dia import (
    DIA,
    coo_to_dia,
    dia_astype,
    dia_pad_pp_rhs,
    dia_pad_io,
    dia_pad_pp,
    dia_pad_x,
    dia_pad_xt,
    dia_power_data,
    dia_power_ok,
    dia_power_tile,
    dia_pp_tile,
    dia_to_coo,
    dia_transpose,
    spmm_dia,
    spmm_dia_t,
    spmm_dia_t_padded,
    spmv_dia,
    spmv_dia_jnp,
    spmv_dia_padded,
    spmv_dia_padded_io,
    spmv_dia_cheby,
    spmv_dia_pingpong,
    spmv_dia_power,
    spmv_dia_power_rhs,
)
from .segment import (
    SegTiles,
    build_seg_tiles,
    from_tiles,
    segment_broadcast_tiles,
    segment_softmax_tiles,
    segment_sum_tiles,
    to_tiles,
)
from .rcm import bandwidth, n_diagonals, permute, rcm_permutation, rcm_reorder
from .bsr import BELL, csr_to_bell, spmm_bell, spmm_bell_jnp, spmv_bell

__all__ = [
    "DIA", "coo_to_dia", "dia_astype", "dia_pad_pp_rhs",
    "spmv_dia_power_rhs",
    "SegTiles", "build_seg_tiles", "from_tiles", "to_tiles",
    "segment_broadcast_tiles", "segment_softmax_tiles", "segment_sum_tiles",
    "dia_pad_io", "dia_pad_pp", "dia_pad_x",
    "dia_pad_xt", "dia_power_data", "dia_power_ok", "dia_power_tile",
    "dia_pp_tile",
    "dia_to_coo",
    "dia_transpose", "spmm_dia", "spmm_dia_t", "spmm_dia_t_padded",
    "spmv_dia", "spmv_dia_jnp", "spmv_dia_padded", "spmv_dia_padded_io",
    "spmv_dia_cheby", "spmv_dia_pingpong", "spmv_dia_power",
    "bandwidth", "n_diagonals", "permute", "rcm_permutation", "rcm_reorder",
    "BELL", "csr_to_bell", "spmm_bell", "spmm_bell_jnp", "spmv_bell",
]
