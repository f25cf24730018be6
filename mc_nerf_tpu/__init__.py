"""MC-NeRF-TPU: a TPU-native (JAX/XLA/Pallas) multi-camera NeRF framework.

A from-scratch rebuild of the capabilities of MC-NeRF (arXiv:2309.07846,
reference implementation SkylerGao/MC_NeRF): joint optimization of per-image
camera intrinsics/extrinsics and a coarse/fine NeRF, trained in three stages
(camera calibration from AprilTag-cube reprojection, global bundle-adjusted
NeRF optimization with a BARF coarse-to-fine frequency schedule, and a
pose-frozen fine-tune).

Design stance (not a port):
  * pure functional core — jitted functions over explicit parameter pytrees
    and PRNG keys, no stateful modules;
  * static shapes everywhere — the reference's dynamic ``torch.nonzero``
    hierarchical sampling is re-formulated as a per-ray fixed-budget top-k
    (see ``mc_nerf_tpu.models.nerf``);
  * data-parallel via ``jax.sharding.Mesh`` + ``shard_map`` over the ray axis
    (gradients reduced with ``psum`` over ICI), replacing torch DDP/NCCL;
  * on-device epoch loops — training data is resident in HBM and each epoch
    is a single ``lax.scan``-compiled program instead of a host DataLoader
    loop;
  * Pallas kernels for the fused volume-render hot path.
"""

__version__ = "0.1.0"
