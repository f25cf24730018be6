"""Ray generation from (possibly learnable) camera parameters.

TPU-first design: the reference builds a full H*W ray grid every step and
then subsamples 7000 rays (``model/mc_nerf.py:124-145`` + ``:327-345``).
Here training rays are generated *only for the sampled pixel ids* — a gather
plus a tiny batched matmul — so ray generation is O(rays), not O(H*W), and
lives entirely on device inside the jitted train step.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mc_nerf_tpu.cameras.projection import invert_K
from mc_nerf_tpu.utils.precision import heinsum


def pixel_grid(img_h: int, img_w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H*W, 2] pixel-center coordinates (x, y), row-major.

    Pixel centers carry the reference's +0.5 offset (mc_nerf.py:127-130).
    """
    y = jnp.arange(img_h, dtype=dtype) + 0.5
    x = jnp.arange(img_w, dtype=dtype) + 0.5
    X, Y = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def _dirs_from_pixels(pix_xy: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Pixel centers [..., P, 2] -> camera-frame directions [..., P, 3] (z=1)."""
    # homogeneous pixel (x, y, 1) through K^-1; K^-1 is upper-triangular so
    # this is an affine map per pixel — spelled out to avoid a 3x3 matmul.
    x = pix_xy[..., 0]
    y = pix_xy[..., 1]
    fx_inv = K_inv[..., 0, 0]
    fy_inv = K_inv[..., 1, 1]
    cx_term = K_inv[..., 0, 2]
    cy_term = K_inv[..., 1, 2]
    dx = x * fx_inv[..., None] + cx_term[..., None]
    dy = y * fy_inv[..., None] + cy_term[..., None]
    dz = jnp.ones_like(dx)
    return jnp.stack([dx, dy, dz], axis=-1)


def rays_for_pixels(
    pix_xy: jnp.ndarray,
    pose_w2c: jnp.ndarray,
    K: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays through given pixel centers for a w2c pose.

    Args:
      pix_xy: [..., P, 2] pixel-center coordinates.
      pose_w2c: [..., 3, 4] world-to-camera pose.
      K: [..., 3, 3] intrinsics.

    Returns:
      (rays_d, rays_o): [..., P, 3] unit directions and origins.  The origin
      is the camera center -R^T t, broadcast over P; directions follow the
      reference's normalization (mc_nerf.py:139-140).
    """
    K_inv = invert_K(K)
    dirs_cam = _dirs_from_pixels(pix_xy, K_inv)
    R = pose_w2c[..., :3]
    t = pose_w2c[..., 3]
    # world direction = R^T d_cam ; origin = -R^T t
    dirs_world = heinsum("...ji,...pj->...pi", R, dirs_cam)
    origin = -heinsum("...ji,...j->...i", R, t)
    rays_d = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(origin[..., None, :], rays_d.shape)
    return rays_d, rays_o


def rays_full_image(
    pose_w2c: jnp.ndarray,
    K: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All H*W rays of one camera, row-major (eval path, ref mc_nerf.py:111)."""
    pix = pixel_grid(img_h, img_w, dtype=pose_w2c.dtype)
    return rays_for_pixels(pix, pose_w2c, K)
