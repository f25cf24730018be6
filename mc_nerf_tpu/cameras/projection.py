"""Projection chains between pixel, camera, and world frames.

Pose convention matches the reference throughout (world-to-camera, OpenCV
axes): a pose is ``[R | t]`` of shape [..., 3, 4] with ``x_cam = R x_world + t``
(see ref ``data/data_read.py:246-257`` and ``model/mc_nerf.py:213-267``).
All functions are batched and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from mc_nerf_tpu.utils.precision import heinsum, hmatmul


def to_hom(x: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous 1: [..., D] -> [..., D+1] (ref mc_nerf.py:213-225)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def invert_K(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of pinhole intrinsics [..., 3, 3].

    Replaces the reference's per-matrix ``torch.inverse`` loop
    (``model/mc_nerf.py:204-210``) with the analytic inverse of
    ``[[fx, 0, cx], [0, fy, cy], [0, 0, 1]]`` — exact, batched, and cheap.
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy
    row0 = jnp.stack([inv_fx, zeros, -cx * inv_fx], axis=-1)
    row1 = jnp.stack([zeros, inv_fy, -cy * inv_fy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def pix2cam(pix_hom: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous pixels [..., P, 3] -> camera-frame dirs at depth 1.

    (ref ``model/mc_nerf.py:229-232``: ``pix @ K_inv.T``)
    """
    return heinsum("...pj,...ij->...pi", pix_hom, K_inv)


def cam2pix(cam_pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [..., P, 3] -> pixel coords [..., P, 2].

    Perspective divide by z (ref ``model/mc_nerf.py:236-241``).
    """
    proj = heinsum("...pj,...ij->...pi", cam_pts, K)
    # guard the perspective divide: points crossing z ~ 0 (possible while
    # camera poses are being *regressed* from scratch) must yield large-but-
    # finite pixels, not inf/NaN gradients
    z = proj[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    return proj[..., :2] / z_safe


def cam2world(cam_pts: jnp.ndarray, pose_w2c: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [..., P, 3] -> world frame, given a w2c pose.

    x_world = R^T (x_cam - t)  (ref ``model/mc_nerf.py:245-256`` inverts the
    pose and applies it to homogeneous points; the algebra below is the same
    without materializing homogeneous coordinates).
    """
    R = pose_w2c[..., :3]
    t = pose_w2c[..., 3]
    return heinsum("...ji,...pj->...pi", R, cam_pts - t[..., None, :])


def world2cam(world_pts: jnp.ndarray, pose_w2c: jnp.ndarray) -> jnp.ndarray:
    """World points [..., P, 3] -> camera frame: x_cam = R x_world + t.

    (ref ``model/mc_nerf.py:260-267``)
    """
    R = pose_w2c[..., :3]
    t = pose_w2c[..., 3]
    return heinsum("...ij,...pj->...pi", R, world_pts) + t[..., None, :]


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a [..., 3, 4] rigid pose: (R, t) -> (R^T, -R^T t)."""
    R = pose[..., :3]
    t = pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -hmatmul(R_inv, t)
    return jnp.concatenate([R_inv, t_inv], axis=-1)


def compose_poses(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """Compose rigid poses: result applies ``pose_a`` first, then ``pose_b``.

    (R_b R_a, R_b t_a + t_b) — ref ``model/mc_nerf.py:318-325``.
    """
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    return jnp.concatenate([hmatmul(R_b, R_a), hmatmul(R_b, t_a) + t_b], axis=-1)


def reproject_points(world_pts: jnp.ndarray, K: jnp.ndarray, pose_w2c: jnp.ndarray) -> jnp.ndarray:
    """Project world points through a pose + intrinsics to pixels.

    The reprojection used by both calibration losses
    (ref ``model/mc_nerf.py:147-152``): world -> cam -> pixel.

    Args:
      world_pts: [..., P, 3] tag points in the world/cube frame.
      K: [..., 3, 3] intrinsics.
      pose_w2c: [..., 3, 4] world-to-camera pose.

    Returns:
      [..., P, 2] pixel coordinates.
    """
    cam_pts = world2cam(world_pts, pose_w2c)
    return cam2pix(cam_pts, K)
