"""Stuck-camera detection and restart for the calibration stage.

Reprojection-based pose regression from the all-ones init (ref
``mc_nerf.py:347-371``) is non-convex: a small fraction of cameras lands in
reflection local minima and SGD never escapes (observed ~1-2 of 12 on
synthetic rigs).  Between stage-0 epochs the engine evaluates each camera's
*full* reprojection residual (all valid tags, deterministic) and
re-randomizes the twists of cameras whose residual is far above the cohort
median — a fresh basin draw.

Details that matter (learned the hard way):
  * the optimizer state is left untouched: re-initializing it would reset
    the LR-decay schedule and re-shock every converged camera, while stale
    RAdam moments on the restarted rows wash out within ~10 steps (b1=0.9);
  * restarted cameras get a cooldown (tracked by the engine) so they are not
    judged while still re-converging;
  * restart values are not blind random draws: ~64 structured candidates per
    camera (inward-looking poses on the cohort's estimated shell for
    extrinsics; cube-in-front rotations for the calib cube pose) are ranked
    by their actual reprojection residual and the best one wins — this
    resolves even the planar-tag pose-flip ambiguity that defeats repeated
    random reinits.

This is a framework addition (the reference has no recovery mechanism); it
changes no converged result, only rescues stuck cameras.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from mc_nerf_tpu.cameras.projection import reproject_points
from mc_nerf_tpu.data.calibration import CalibrationData
from mc_nerf_tpu.models.camera_params import (
    CameraParams,
    calib_cube_poses,
    camera_poses,
    intrinsics,
)
from mc_nerf_tpu.train.optim import Params


def per_camera_losses(
    params: Params,
    calib: CalibrationData,
    img_h: int,
    img_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic per-camera reprojection residuals over ALL valid tags.

    Returns (intr_loss [N], extr_loss [N]) in normalized-pixel^2 units
    (same normalization as the training loss, ref loss.py:45-58).
    """
    K = intrinsics(params.cam, img_h, img_w)

    def residual(pts_all, pose):
        cube = calib.cube_pts                                   # [6, 5, 3]
        pred = reproject_points(
            cube[None], K[:, None], pose[:, None]
        )                                                        # [N, 6, 5, 2]
        valid = jnp.any(pts_all != 0, axis=(-1, -2))             # [N, 6]
        dx = (pred[..., 0] - pts_all[..., 0]) / img_w
        dy = (pred[..., 1] - pts_all[..., 1]) / img_h
        per_tag = jnp.mean(dx * dx + dy * dy, axis=-1)           # [N, 6]
        num = jnp.sum(jnp.where(valid, per_tag, 0.0), axis=-1)
        return num / jnp.maximum(jnp.sum(valid, axis=-1), 1)

    intr = residual(calib.calib_pts, calib_cube_poses(params.cam))
    extr = residual(calib.coord_pts, camera_poses(params.cam))
    return intr, extr


def _uniform_quat_rotations(key: jax.Array, shape) -> jnp.ndarray:
    """Uniformly random rotation matrices [*shape, 3, 3] via normalized quats."""
    q = jax.random.normal(key, (*shape, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def _lookat_w2c(pos: jnp.ndarray, roll: jnp.ndarray) -> jnp.ndarray:
    """OpenCV w2c pose looking from ``pos`` at the origin, with camera roll.

    pos: [..., 3]; roll: [...] radians.  Returns [..., 3, 4].
    """
    f = -pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)      # forward (+z cam)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), f.shape)
    # fall back near the poles
    up = jnp.where(
        jnp.abs(jnp.sum(f * up, -1, keepdims=True)) > 0.99,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), f.shape),
        up,
    )
    x = jnp.cross(f, up)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.cross(f, x)
    # apply roll about the optical axis
    c, s = jnp.cos(roll)[..., None], jnp.sin(roll)[..., None]
    x_r = c * x + s * y
    y_r = -s * x + c * y
    R = jnp.stack([x_r, y_r, f], axis=-2)                        # rows = cam axes
    t = -jnp.einsum("...ij,...j->...i", R, pos)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def _candidate_restart_twists(
    key: jax.Array,
    n_cameras: int,
    distance: jnp.ndarray,
    mode: str,
    n_cand: int = 64,
):
    """[n_cand, N, 6] candidate twists for restarted cameras.

    mode='pose': inward-looking camera candidates — positions on a sphere of
    the cohort's estimated radius looking at the origin (every MC-NeRF rig
    photographs a central object), with randomized roll.
    mode='cube': cube-in-front-of-camera candidates — uniform rotation, the
    cube centered near the optical axis at the cohort's depth.
    """
    from mc_nerf_tpu.cameras.lie import SE3_to_se3

    k1, k2, k3 = jax.random.split(key, 3)
    if mode == "pose":
        dirs = jax.random.normal(k1, (n_cand, n_cameras, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        radii = distance * jnp.exp(0.2 * jax.random.normal(k2, (n_cand, n_cameras, 1)))
        roll = jax.random.uniform(k3, (n_cand, n_cameras), minval=-jnp.pi, maxval=jnp.pi)
        # half the candidates keep the conventional (zero-roll) orientation
        roll = roll * (jnp.arange(n_cand)[:, None] % 2)
        pose = _lookat_w2c(dirs * radii, roll)
    else:
        R = _uniform_quat_rotations(k1, (n_cand, n_cameras))
        xy = 0.2 * distance * jax.random.normal(k2, (n_cand, n_cameras, 2))
        z = distance * jnp.exp(0.25 * jax.random.normal(k3, (n_cand, n_cameras, 1)))
        t = jnp.concatenate([xy, z], axis=-1)
        pose = jnp.concatenate([R, t[..., None]], axis=-1)
    return SE3_to_se3(pose)


def find_stuck(
    losses: jnp.ndarray,
    cooldown_ok: jnp.ndarray,
    rel_thresh: float = 50.0,
    abs_thresh: float = 2e-4,
) -> jnp.ndarray:
    """Stuck = residual above BOTH rel_thresh x cohort median and the
    absolute floor, and not inside a restart cooldown window."""
    med = jnp.median(losses)
    return (losses > rel_thresh * med) & (losses > abs_thresh) & cooldown_ok


def restart_stuck_cameras(
    key: jax.Array,
    params: Params,
    calib: CalibrationData,
    img_h: int,
    img_w: int,
    cooldown_ok_pose: jnp.ndarray | None = None,
    cooldown_ok_cube: jnp.ndarray | None = None,
    rel_thresh: float = 50.0,
    abs_thresh: float = 2e-4,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Re-randomize the pose twists of cameras stuck in bad minima.

    Extrinsic residuals gate ``pose_se3``; intrinsic residuals gate
    ``calib_pose_se3`` (the per-image cube pose).

    Returns (new params, stuck_pose mask [N], stuck_cube mask [N]).
    """
    from mc_nerf_tpu.cameras.lie import se3_to_SE3

    n = params.cam.pose_se3.shape[0]
    ones = jnp.ones((n,), bool)
    cooldown_ok_pose = ones if cooldown_ok_pose is None else cooldown_ok_pose
    cooldown_ok_cube = ones if cooldown_ok_cube is None else cooldown_ok_cube

    intr, extr = per_camera_losses(params, calib, img_h, img_w)
    stuck_pose = find_stuck(extr, cooldown_ok_pose, rel_thresh, abs_thresh)
    stuck_cube = find_stuck(intr, cooldown_ok_cube, rel_thresh, abs_thresh)

    K = intrinsics(params.cam, img_h, img_w)
    cube = calib.cube_pts

    def residual_for_poses(pts_all, poses):
        """poses [N, 3, 4] -> per-camera residual [N] (all valid tags)."""
        pred = reproject_points(cube[None], K[:, None], poses[:, None])
        valid = jnp.any(pts_all != 0, axis=(-1, -2))
        dx = (pred[..., 0] - pts_all[..., 0]) / img_w
        dy = (pred[..., 1] - pts_all[..., 1]) / img_h
        per_tag = jnp.mean(dx * dx + dy * dy, axis=-1)
        num = jnp.sum(jnp.where(valid, per_tag, 0.0), axis=-1)
        return num / jnp.maximum(jnp.sum(valid, axis=-1), 1)

    # cohort distance estimate from the healthy cameras (median camera-center
    # radius); every MC-NeRF rig is inward-looking, so restart candidates are
    # "look at the origin from this shell"
    poses_now = camera_poses(params.cam)
    centers = -jnp.einsum("nij,ni->nj", poses_now[:, :, :3], poses_now[:, :, 3])
    radius = jnp.linalg.norm(centers, axis=-1)
    healthy = ~stuck_pose
    d_est = jnp.nan_to_num(jnp.nanmedian(jnp.where(healthy, radius, jnp.nan)), nan=3.0)
    d_est = jnp.clip(d_est, 0.5, 50.0)

    k_pose, k_cube = jax.random.split(key)

    def best_of(cand_twists, pts_all, current_twists):
        """Pick the lowest-residual candidate per camera."""
        def res(tw):
            return residual_for_poses(pts_all, se3_to_SE3(tw))

        losses = jax.vmap(res)(cand_twists)                     # [C, N]
        best = jnp.argmin(losses, axis=0)                       # [N]
        picked = jnp.take_along_axis(
            cand_twists, best[None, :, None], axis=0
        )[0]
        return picked

    pose_cands = _candidate_restart_twists(k_pose, n, d_est, "pose")
    cube_cands = _candidate_restart_twists(k_cube, n, d_est, "cube")
    best_pose = best_of(pose_cands, calib.coord_pts, params.cam.pose_se3)
    best_cube = best_of(cube_cands, calib.calib_pts, params.cam.calib_pose_se3)

    new_cam = params.cam._replace(
        pose_se3=jnp.where(stuck_pose[:, None], best_pose, params.cam.pose_se3),
        calib_pose_se3=jnp.where(stuck_cube[:, None], best_cube, params.cam.calib_pose_se3),
    )
    return Params(cam=new_cam, nerf=params.nerf), stuck_pose, stuck_cube
