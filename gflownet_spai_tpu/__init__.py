"""gflownet_spai_tpu — TPU-native sparse linear algebra + GFlowNet-SPAI.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``tonylizza/gflownet-spai`` reference (see SURVEY.md): sparse containers and
kernels, a GFlowNet that samples SPAI preconditioner sparsity patterns,
classic-SPAI batched least squares, GMRES/CG validation, and multi-chip
execution via `jax.sharding` meshes.
"""

__version__ = "0.1.0"

from . import sparse
