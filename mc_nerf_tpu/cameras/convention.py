"""Blender <-> OpenCV camera-convention conversions and FOV intrinsics.

The dataset JSONs store Blender camera-to-world matrices (camera looks down
-Z, +Y up).  The framework's working convention is OpenCV world-to-camera
(+Z forward, +Y down), exactly as the reference converts on load
(``data/data_read.py:246-257``) and back for visualization
(``model/mc_nerf.py:434-446``).
"""

from __future__ import annotations

import jax.numpy as jnp

from mc_nerf_tpu.utils.precision import heinsum

# diag(1, -1, -1): flips Y and Z to move between Blender and OpenCV axes
_FLIP = jnp.array([1.0, -1.0, -1.0])


def blender_pose_to_w2c(c2w_blender: jnp.ndarray) -> jnp.ndarray:
    """Blender c2w [..., 4, 4] (or [..., 3, 4]) -> OpenCV w2c [..., 3, 4].

    Mirrors ref ``data/data_read.py:246-257``: right-multiply the rotation by
    diag(1,-1,-1) (camera-axis flip), then invert the rigid transform.
    """
    R = c2w_blender[..., :3, :3]
    t = c2w_blender[..., :3, 3]
    R_cv = R * _FLIP  # R @ diag(1,-1,-1) scales columns
    # invert: w2c = (R_cv, t)^-1 = (R_cv^T, -R_cv^T t)
    R_w2c = jnp.swapaxes(R_cv, -1, -2)
    t_w2c = -heinsum("...ij,...j->...i", R_w2c, t)
    return jnp.concatenate([R_w2c, t_w2c[..., None]], axis=-1)


def w2c_to_blender_pose(w2c: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`blender_pose_to_w2c`: [..., 3, 4] -> Blender c2w [..., 3, 4].

    (ref ``model/mc_nerf.py:434-446`` does this for the pose plots)
    """
    R_w2c = w2c[..., :3]
    t_w2c = w2c[..., 3]
    R_cv = jnp.swapaxes(R_w2c, -1, -2)
    t = -heinsum("...ij,...j->...i", R_cv, t_w2c)
    R = R_cv * _FLIP
    return jnp.concatenate([R, t[..., None]], axis=-1)


def fov_to_K(fov_x: jnp.ndarray, img_h: int, img_w: int) -> jnp.ndarray:
    """Horizontal FOV (radians, Blender ``camera_angle_x``) -> intrinsics.

    Matches ref ``data/data_read.py:141-152``: fx = (W/2)/tan(fov/2),
    fy = (H/2)/tan(fov/2), principal point at the image center.  (Note the
    reference's fy uses H/2 over the *x* FOV tangent — for its square images
    fx == fy; we reproduce the same formula.)

    Args:
      fov_x: [...] horizontal field of view in radians.
      img_h, img_w: image size in pixels.

    Returns:
      [..., 3, 3] intrinsic matrices.
    """
    fov_x = jnp.asarray(fov_x)
    tan_half = jnp.tan(fov_x / 2.0)
    fx = (img_w / 2.0) / tan_half
    fy = (img_h / 2.0) / tan_half
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, jnp.full_like(fx, img_w / 2.0)], axis=-1)
    row1 = jnp.stack([zeros, fy, jnp.full_like(fx, img_h / 2.0)], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
