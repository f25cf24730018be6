"""Planar PnP: tag-to-camera pose from one tag's keypoints (batched, JAX).

The calibration stage regresses camera poses by SGD from an uninformed init
(the reference's method, ``mc_nerf.py:58-105``).  That optimization is
non-convex; this module provides the classical closed-form complement: a
DLT homography from the 5 coplanar tag keypoints, decomposed against the
current intrinsics into an exact [R | t].  The training engine uses it to
generate *analytic restart candidates* for stuck cameras
(``train/restarts.py``) — with exact detections the per-tag solution is the
true pose, so one restart suffices.

All functions broadcast over leading batch dims and are jit-friendly
(SVD on tiny fixed-size systems).
"""

from __future__ import annotations

import jax.numpy as jnp

from mc_nerf_tpu.cameras.projection import invert_K
from mc_nerf_tpu.utils.precision import heinsum, hmatmul


def homography_dlt(src_uv: jnp.ndarray, dst_xy: jnp.ndarray) -> jnp.ndarray:
    """Least-squares homography from >= 4 correspondences.

    Args:
      src_uv: [..., P, 2] source plane coordinates.
      dst_xy: [..., P, 2] destination coordinates.

    Returns:
      [..., 3, 3] H with ``dst ~ H @ (u, v, 1)``.
    """
    src_uv, dst_xy = jnp.broadcast_arrays(src_uv, dst_xy)
    u, v = src_uv[..., 0], src_uv[..., 1]
    x, y = dst_xy[..., 0], dst_xy[..., 1]
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    row_x = jnp.stack(
        [u, v, ones, zeros, zeros, zeros, -x * u, -x * v, -x], axis=-1
    )
    row_y = jnp.stack(
        [zeros, zeros, zeros, u, v, ones, -y * u, -y * v, -y], axis=-1
    )
    A = jnp.concatenate([row_x, row_y], axis=-2)          # [..., 2P, 9]
    # h = right-singular vector of the smallest singular value
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]
    return h.reshape(*h.shape[:-1], 3, 3)


def solve_planar_pnp(
    plane_uv: jnp.ndarray,
    pix: jnp.ndarray,
    K: jnp.ndarray,
) -> jnp.ndarray:
    """Pose of a plane from its keypoints: plane frame (u, v, 0) -> camera.

    Homography decomposition in normalized camera coordinates:
    ``G = K^-1 H = lambda [r1 r2 t]`` with ``r3 = r1 x r2`` and the rotation
    re-orthonormalized by SVD; the sign is fixed so the plane sits in front
    of the camera (t_z > 0).

    Args:
      plane_uv: [..., P, 2] keypoints in the plane frame.
      pix: [..., P, 2] detected pixels.
      K: [..., 3, 3] intrinsics (current estimate).

    Returns:
      [..., 3, 4] pose with ``x_cam = R (u, v, 0)^T + t``.
    """
    # normalize pixels by K^-1: better DLT conditioning + direct decomposition
    K_inv = invert_K(K)
    pix_h = jnp.concatenate([pix, jnp.ones_like(pix[..., :1])], axis=-1)
    norm = heinsum("...pj,...ij->...pi", pix_h, K_inv)
    norm_xy = norm[..., :2] / norm[..., 2:3]

    G = homography_dlt(plane_uv, norm_xy)                 # [..., 3, 3]
    g1 = G[..., :, 0]
    g2 = G[..., :, 1]
    g3 = G[..., :, 2]
    scale = 0.5 * (jnp.linalg.norm(g1, axis=-1) + jnp.linalg.norm(g2, axis=-1))
    lam = 1.0 / jnp.maximum(scale, 1e-12)
    # plane must be in front of the camera: t_z > 0 fixes the overall sign
    sign = jnp.where(g3[..., 2] * lam < 0, -1.0, 1.0)
    lam = lam * sign
    r1 = g1 * lam[..., None]
    r2 = g2 * lam[..., None]
    t = g3 * lam[..., None]
    r3 = jnp.cross(r1, r2)
    R0 = jnp.stack([r1, r2, r3], axis=-1)
    # project to SO(3)
    u_svd, _, vt_svd = jnp.linalg.svd(R0)
    det = jnp.linalg.det(hmatmul(u_svd, vt_svd))
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    R = hmatmul(u_svd * fix[..., None, :], vt_svd)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def tag_pose_to_frame_pose(
    pose_plane2cam: jnp.ndarray,
    frame_origin: jnp.ndarray,
    frame_u: jnp.ndarray,
    frame_v: jnp.ndarray,
    frame_n: jnp.ndarray,
) -> jnp.ndarray:
    """Convert a tag-plane pose into the pose of the frame containing it.

    The tag plane frame has origin ``frame_origin`` and axes (u, v, n) in
    the containing frame (cube or world), i.e. a point p maps to plane
    coords ``(u . (p - o), v . (p - o), n . (p - o))``.  Then
    ``x_cam = R_p B^T p + (t_p - R_p B^T o)`` with ``B = [u v n]``.

    Returns [..., 3, 4] frame-to-camera pose.
    """
    R_p = pose_plane2cam[..., :3]
    t_p = pose_plane2cam[..., 3]
    B = jnp.stack([frame_u, frame_v, frame_n], axis=-1)   # [..., 3, 3]
    R = hmatmul(R_p, jnp.swapaxes(B, -1, -2))
    t = t_p - heinsum("...ij,...j->...i", R, frame_origin)
    return jnp.concatenate([R, t[..., None]], axis=-1)
