"""Compute ops: volume rendering math and Pallas TPU kernels."""

from mc_nerf_tpu.ops.volume import (  # noqa: F401
    compute_deltas,
    sigma_to_weights,
    composite,
    select_fine_bins,
)
