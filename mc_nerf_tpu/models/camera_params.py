"""Learnable per-image camera parameters as an explicit pytree.

The reference registers five parameter groups on the model
(``model/mc_nerf.py:347-371``), all initialized to ones:
  * ``pose_se3``       [N, 6] — per-image camera extrinsics (se3 twist);
  * ``calib_pose_se3`` [N, 6] — per-calib-image cube pose (aux variable for
    the intrinsic stage; the cube orientation in calib shots is unknown);
  * ``fx, fy, ux, uy`` [N]    — multiplicative intrinsic corrections on the
    init K = [[W, 0, W/2], [0, W, H/2], [0, 0, 1]] (mc_nerf.py:171-186).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mc_nerf_tpu.cameras.lie import se3_to_SE3


class CameraParams(NamedTuple):
    pose_se3: jnp.ndarray        # [N, 6]
    calib_pose_se3: jnp.ndarray  # [N, 6]
    fx: jnp.ndarray              # [N]
    fy: jnp.ndarray              # [N]
    ux: jnp.ndarray              # [N]
    uy: jnp.ndarray              # [N]


def init_camera_params(num_images: int, dtype=jnp.float32) -> CameraParams:
    """All-ones init, matching ref ``register_parameters`` exactly.

    Each leaf gets its own buffer — sharing one array between leaves breaks
    jit argument donation ("donate the same buffer twice").
    """
    return CameraParams(
        pose_se3=jnp.ones((num_images, 6), dtype),
        calib_pose_se3=jnp.ones((num_images, 6), dtype),
        fx=jnp.ones((num_images,), dtype),
        fy=jnp.ones((num_images,), dtype),
        ux=jnp.ones((num_images,), dtype),
        uy=jnp.ones((num_images,), dtype),
    )


def init_camera_params_from_gt(
    poses_w2c: jnp.ndarray,
    K: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> CameraParams:
    """Initialize camera parameters at ground truth (for fixed-camera runs,
    debugging, and the BASELINE 'GT intrinsics fixed' config).

    Inverts the parameterization of :func:`intrinsics` / :func:`camera_poses`.
    """
    from mc_nerf_tpu.cameras.lie import SE3_to_se3

    pose_se3 = SE3_to_se3(poses_w2c)
    fx = K[:, 0, 0] / img_w
    fy = K[:, 1, 1] / img_w
    ux = K[:, 0, 2] / (img_w / 2.0)
    uy = K[:, 1, 2] / (img_h / 2.0)
    n = K.shape[0]
    return CameraParams(pose_se3, jnp.ones((n, 6), K.dtype), fx, fy, ux, uy)


def intrinsics(cam: CameraParams, img_h: int, img_w: int) -> jnp.ndarray:
    """Build per-image K from the learnable multipliers.

    K = abs(multiplier * init) with init fx=fy=W, cx=W/2, cy=H/2
    (ref ``add_weights2intr``, mc_nerf.py:171-186).

    Returns: [N, 3, 3].
    """
    n = cam.fx.shape[0]
    fx = jnp.abs(cam.fx * img_w)
    fy = jnp.abs(cam.fy * img_w)          # init is W for fy too (ref :174)
    cx = jnp.abs(cam.ux * (img_w / 2.0))
    cy = jnp.abs(cam.uy * (img_h / 2.0))
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    K = jnp.stack(
        [
            jnp.stack([fx, zeros, cx], axis=-1),
            jnp.stack([zeros, fy, cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return K.reshape(n, 3, 3)


def camera_poses(cam: CameraParams) -> jnp.ndarray:
    """[N, 3, 4] world-to-camera poses from the learnable twists."""
    return se3_to_SE3(cam.pose_se3)


def calib_cube_poses(cam: CameraParams) -> jnp.ndarray:
    """[N, 3, 4] cube-to-camera poses for the calibration images."""
    return se3_to_SE3(cam.calib_pose_se3)
