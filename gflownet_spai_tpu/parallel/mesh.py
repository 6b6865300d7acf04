"""Device-mesh helpers.

The framework's two mesh axes (SURVEY.md §2 parallelism table):
  * ``dp``   — data parallel: trajectory batch sharded, policy replicated,
               gradient ``psum``.
  * ``rows`` — the sequence-parallel analogue for sparse linear algebra:
               matrix rows / SpGEMM pair sets partitioned, halo exchange via
               ``ppermute``, reductions via ``psum``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, rows: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * rows
    if len(devices) < need:
        raise ValueError(f"need {need} devices for mesh (dp={dp}, rows={rows}), "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, rows)
    return Mesh(arr, ("dp", "rows"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
