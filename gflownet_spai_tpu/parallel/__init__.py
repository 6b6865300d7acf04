"""Multi-chip execution: meshes, halo-exchange SpMV, DP training, TP head."""

from .mesh import make_mesh, single_device_mesh
from .halo_spmv import halo_spmv, halo_spmv_power, partition_dia, spmv_allgather
from .dp import (make_dp_train_step, sharded_residual_norms,
                 sharded_rowblock_residual_norms)
from .solvers import distributed_cg, distributed_gmres, distributed_jacobi
from .tp import pad_head, shard_head, sharded_policy_logits
from .sampler import ShardedRollout, replicated_oracle_gumbels, sharded_rollout
from .multihost import global_mesh, initialize_from_env, process_summary

__all__ = [
    "make_mesh", "single_device_mesh",
    "halo_spmv", "halo_spmv_power", "partition_dia", "spmv_allgather",
    "make_dp_train_step", "sharded_residual_norms",
    "sharded_rowblock_residual_norms",
    "distributed_cg", "distributed_gmres", "distributed_jacobi",
    "pad_head", "shard_head", "sharded_policy_logits",
    "ShardedRollout", "replicated_oracle_gumbels", "sharded_rollout",
    "global_mesh", "initialize_from_env", "process_summary",
]
