"""Pallas TPU kernels for the hot ops (SURVEY.md §7.2 step 9).

The flagship kernel is :mod:`fused_rollout`: the entire T-step
random-policy rollout (action sampling -> env.step -> auto-reset) as ONE
Mosaic kernel with all env state resident in VMEM across every step.
"""

from .fused_rollout import (  # noqa: F401
    fused_rollout,
    fused_rollout_replay,
    pack_state,
    unpack_state,
)
