"""Training configuration.

The reference has no config system — every knob is a hardcoded module
constant (SURVEY.md §5 "Config / flag system").  This dataclass collects
those exact knobs with the reference's current-driver defaults:

* ``batch_size=2, num_epochs=1000, lr=5e-4``   (GFlowNet100.py:32-34)
* ``hidden_dim=4``                              (GFlowNet100.py:180)
* Adam + ReduceLROnPlateau(factor=0.2, patience=10)  (GFlowNet100.py:266-267)
* reward scale 1000                             (preconditioner.py:64)
* GMRES maxiter=10260                           (GFlowNet100.py:81)

The ``train.py`` legacy variant (batch 32, lr 1e-3, hidden 32 —
reference train.py:18,54-56) is available as ``TrainConfig.legacy()``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # data
    matrix: str = "LF10_like"            # gallery name or path to a .mtx file
    seed_method: str = "ilu0"       # ilu0 | spilu | pattern | spai
    seed_k: int = 1                 # power-pattern order for seed_method=
                                    # spai: k=2 seeds with the (denser) A²
                                    # pattern — real thinning headroom for
                                    # the policy (docs/ROADMAP.md #7)
    reference_baseline: bool = False  # True → original_matrix = seed (GFlowNet100.py:173)
    env_format: str = "auto"        # auto | coo | dia | rowblock —
                                    # dia = gather-free banded reward path;
                                    # rowblock = bucketed dense MXU reward
                                    # for large UNSTRUCTURED seeds
    dia_max_diags: int = 64         # "auto" picks dia below this band count
    rowblock_min_nnz: int = 10000   # "auto" picks rowblock above this seed
                                    # nnz when dia doesn't apply (pair-plan
                                    # gathers scalarize on TPU)
    rowblock_bf16: bool = False     # bf16 G-block storage (halves the
                                    # reward's G-read traffic; f32 MXU
                                    # accumulation, ~1e-3 residual noise)
    rowblock_layout: str = "cm"     # G-block axis order: cm = [R,cp,mp]
                                    # (batch in lanes) | mc = [R,mp,cp]
                                    # (batch in sublanes, C cols in lanes)
    rowblock_class_step: float = 1.5  # bucket size-class ladder spacing
                                    # (1.25 = finer buckets, fewer padded
                                    # slots, ~2x the einsum count)
    rowblock_compress: str = "none" # none | gram (quadratic-form residual:
                                    # ~4-5x fewer FLOPs/bytes, ~1e-3-class
                                    # precision — sparse.rowblock docstring)
    rowblock_order: str = "window"  # window (default; gather-free batched
                                    # reward: the plan defines the edge
                                    # enumeration so windows are static
                                    # contiguous slices — the kt[idx]
                                    # gather was 47 of the 56 ms reward at
                                    # 22M pairs, 11.5x at batch 16) | sorted.
                                    # Checkpoints stamp the enumeration and
                                    # restores remap across orders
                                    # (train.enums), so window is safe to
                                    # default.
    gat_tiled_min_edges: int = 100000  # policy graph switches to the
                                    # node-tile Pallas segment substrate
                                    # above this edge count
    gat_bucket_step: float = 1.5    # slot-width class ladder step for the
                                    # bucketed fused-GAT layout (cuts the
                                    # uniform-S padding tax, measured 0.48
                                    # utilization at 1.7M edges); 0
                                    # disables bucketing (uniform S)

    # model (reference GFlowNet100.py:180, policy.py:19)
    hidden_dim: int = 4
    heads: int = 4
    loss: str = "tb"                # tb | vargrad | subtb
    subtb_lambda: float = 0.9       # λ for loss="subtb" (gfn.loss.subtb_loss)
    backward: str = "lstm"          # lstm (parity) | linear | uniform
    reward_beta: float = 1.0        # reward exponent β: sample P ∝ R^β
                                    # (log-reward scaled in the loss).
                                    # β > 1 concentrates on the reward
                                    # optimum — needed when it (e.g. a
                                    # deeply thinned pattern) occupies a
                                    # vanishing fraction of the state space
    edge_feats: bool = False        # value-aware action-head channel
                                    # (gfn.GFlowNetConfig.edge_feats)
    terminal_bias: float = 0.0      # initial terminal-logit offset (start-
                                    # short curriculum at huge A; ~8 at 1M
                                    # actions — forward_policy_init)
    temperature: float = 1.0        # rollout sampling temperature
    alpha_fixed: float = -1.0       # >=0 pins reward-mix α (else learned)
    reward_baseline: str = "auto"   # auto = matrix unless degenerate for
                                    # this seed (env.spai.resolve_baseline)
                                    # | matrix = ‖A·A−I‖_F (reference B11-
                                    # fixed; saturates on unscaled
                                    # matrices — warns) | identity = √n
                                    # (the empty-preconditioner residual —
                                    # the discriminating normalizer for
                                    # spai seeds)
    replay_size: int = 0            # top-k reward replay buffer (0 = off)
    replay_samples: int = 2         # buffer trajectories mixed per epoch
    replay_prioritized: float = 0.0 # rank-based replay priority exponent α
                                    # (P ∝ (1+rank)^−α; 0 = uniform)
    replay_seed_fracs: str = ""     # comma list of fractions f: seed the
                                    # buffer with the magnitude-ordered
                                    # thinning demonstration (delete the
                                    # f·nnz smallest entries, terminate) —
                                    # train.loop.seed_replay_with_
                                    # magnitude_thinning
    warmstart_epochs: int = 0       # >0: supervised warm-start — that many
                                    # cross-entropy steps maximizing log
                                    # P_F of the replay_seed_fracs
                                    # demonstrations BEFORE GFlowNet
                                    # training (train.loop.
                                    # warmstart_on_demonstrations)
    warmstart_lr: float = 5e-3      # Adam lr of the warm-start phase
    sampler: str = "dense"          # dense | sharded — sharded runs the
                                    # rollout's action head, Gumbel top-k
                                    # AND per-step log-probs over the rows
                                    # axis (no device materializes [B, A];
                                    # parallel.sampler)
    t_cap: int = 0                  # trajectory prefix cap — dense AND
                                    # sharded samplers (0 = num_actions:
                                    # unconditionally exact, but the step
                                    # then runs O(B·A) trajectory machinery:
                                    # ~190/265 ms of the 112k-action step
                                    # on chip).  With loss=subtb, truncated
                                    # samples train as PARTIAL trajectories
                                    # (gfn.loss.subtb_loss terminated), so
                                    # short caps lose no batch signal; with
                                    # tb/vargrad they are weight-0.
    t_cap_auto: bool = False        # adaptive cap ladder: shrink the cap
                                    # (recompile) once observed trajectory
                                    # lengths allow — cap = next_pow2(
                                    # t_cap_margin · P95(len)) when stable
                                    # over t_cap_window epochs; grow back
                                    # ×2 if the termination rate collapses
                                    # at the shrunken cap
    t_cap_min: int = 256            # adaptive-cap floor
    t_cap_margin: float = 4.0       # headroom factor over P95(len)
    t_cap_window: int = 20          # epochs of history per ladder decision

    # optimization (reference GFlowNet100.py:32-34, 266-267)
    batch_size: int = 2
    num_epochs: int = 1000
    lr: float = 5e-4
    plateau_factor: float = 0.2
    plateau_patience: int = 10

    # runtime
    prng_seed: int = 0
    dtype: str = "float32"
    platform: Optional[str] = None   # None → default backend; "cpu" forces CPU
    dp_devices: int = 1              # data-parallel mesh size (1 = single chip)
    rows_devices: int = 1            # rows-axis mesh size (shards the reward
                                     # residual: pair lists or rowblock buckets)

    # outputs (CSV schema parity with GFlowNet100.py:226-255)
    out_dir: str = "runs/default"
    log_every: int = 10
    checkpoint_every: int = 0        # 0 = only at the end
    resume: bool = False

    # validation
    gmres_maxiter: int = 10260       # reference GFlowNet100.py:81
    gmres_restart: int = 20       # scipy default (reference passes none)

    @classmethod
    def legacy(cls, **kw) -> "TrainConfig":
        """The reference train.py variant (train.py:18,54-56)."""
        return cls(batch_size=32, lr=1e-3, hidden_dim=32, **kw)
