"""Camera-pose recovery for the calibration stage.

Reprojection-based pose regression from the all-ones init (ref
``mc_nerf.py:347-371``) is non-convex: some cameras land in reflection /
planar-flip local minima and SGD never escapes.  Between stage-0 epochs the
engine runs :func:`improve_cameras` — a monotone candidate-adoption step:

  * candidates per camera = its CURRENT (pose, K) against a joint sweep of
    focal hypotheses x the six analytic planar-PnP solutions
    (``cameras/pnp.py``: homography decomposition per visible tag — exact
    up to detection noise) — K must be swept jointly because a stuck
    camera's wrong pose co-adapts with a wrong focal length;
  * candidates are ranked by the full deterministic reprojection residual
    over every valid tag; the argmin is adopted only if it beats the
    current residual by a clear factor (hysteresis against churn);
  * optimizer state is left untouched — stale RAdam moments on adopted rows
    wash out within ~10 steps (b1=0.9), while re-initializing the optimizer
    would reset the LR-decay schedule for the whole cohort.

This is a framework addition (the reference has no recovery mechanism); it
can only lower a camera's residual, never raise it.
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


def _pnp_candidate_twists(
    pts_all: jnp.ndarray,
    K: jnp.ndarray,
    cube_pts: jnp.ndarray,
) -> jnp.ndarray:
    """Analytic per-tag PnP poses as restart candidates.

    For every (camera, tag) pair, decompose the tag-keypoint homography into
    the containing frame's pose (cube frame == world frame for the coord
    set).  Invalid tags (zeroed detections) produce garbage poses that lose
    the residual ranking automatically.

    Args:
      pts_all: [N, 6, 5, 2] detections.
      K: [N, 3, 3] current intrinsics estimate.
      cube_pts: [6, 5, 3] tag keypoints in the cube frame.

    Returns:
      [6, N, 6] candidate twists (one per tag per camera).
    """
    from mc_nerf_tpu.cameras.lie import SE3_to_se3
    from mc_nerf_tpu.cameras.pnp import solve_planar_pnp, tag_pose_to_frame_pose

    # recover each tag's plane frame from its keypoint table:
    # lt -> rt spans 2h * u ; lb -> lt spans 2h * v ; origin = center
    lt, rt, lb = cube_pts[:, 1], cube_pts[:, 2], cube_pts[:, 4]
    two_h_u = rt - lt
    two_h = jnp.linalg.norm(two_h_u, axis=-1, keepdims=True)      # [6, 1]
    u = two_h_u / two_h
    v = (lt - lb) / two_h
    n = jnp.cross(u, v)
    origin = cube_pts[:, 0]
    h = two_h[:, 0] / 2.0                                          # [6]

    corners = jnp.array([[0.0, 0.0], [-1.0, 1.0], [1.0, 1.0], [1.0, -1.0], [-1.0, -1.0]])
    plane_uv = corners[None] * h[:, None, None]                    # [6, 5, 2]

    pose_p2c = solve_planar_pnp(
        plane_uv[None], pts_all, K[:, None]
    )                                                              # [N, 6, 3, 4]
    pose = tag_pose_to_frame_pose(pose_p2c, origin[None], u[None], v[None], n[None])
    twists = SE3_to_se3(pose)                                      # [N, 6, 6]
    return jnp.swapaxes(twists, 0, 1)


def improve_cameras(
    key: jax.Array,
    params: Params,
    calib: CalibrationData,
    img_h: int,
    img_w: int,
    adopt_factor: float = 0.5,
    n_fx_hyp: int = 10,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Monotone camera improvement step (between stage-0 epochs).

    Stuck cameras co-adapt their (wrong) intrinsics with a (wrong) pose, so
    pose-only candidates scored under the current K can never win.  This
    step therefore sweeps JOINT hypotheses per camera:

      focal grid x per-tag analytic PnP pose  ->  residual under that K

    (focal hypotheses span the rigs' FOV range 40-80 deg, ref
    ``Ball.py:17-24``; principal point at the image center, the datasets'
    ground truth at init accuracy).  A candidate is adopted — pose + fx/fy
    (+ centered principal point) together — only when its residual beats
    ``adopt_factor`` x the camera's current residual, so converged cameras
    (residual ~1e-8) are never churned.  The cube poses (intrinsic stage
    auxiliary) then get the same treatment under the updated K.

    Returns (new params, adopted_pose mask [N], adopted_cube mask [N]).
    """
    from mc_nerf_tpu.cameras.lie import se3_to_SE3

    n = params.cam.pose_se3.shape[0]
    intr_now, extr_now = per_camera_losses(params, calib, img_h, img_w)
    cube = calib.cube_pts
    del key  # adoption is fully deterministic (analytic candidates only)

    def residual(pts_all, poses, K):
        """[N,3,4] poses + [N,3,3] K -> per-camera residual [N]."""
        pred = reproject_points(cube[None], K[:, None], poses[:, None])
        valid = jnp.any(pts_all != 0, axis=(-1, -2))
        dx = (pred[..., 0] - pts_all[..., 0]) / img_w
        dy = (pred[..., 1] - pts_all[..., 1]) / img_h
        per_tag = jnp.mean(dx * dx + dy * dy, axis=-1)
        num = jnp.sum(jnp.where(valid, per_tag, 0.0), axis=-1)
        return num / jnp.maximum(jnp.sum(valid, axis=-1), 1)

    def K_from_fx_mult(fx_mult):
        """Hypothesized K: fx = fx_mult * W, fy with the same tangent
        (fy/H == fx/W), principal point centered."""
        base = jnp.array(
            [[0.0, 0.0, img_w / 2.0], [0.0, 0.0, img_h / 2.0], [0.0, 0.0, 1.0]]
        )
        fx_sel = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        fy_sel = jnp.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
        return base + fx_sel * (fx_mult * img_w) + fy_sel * (fx_mult * img_h)

    # FOV 40..80 deg -> fx/W = 1/(2 tan(fov/2)) in ~[0.59, 1.37]; pad a bit
    fx_grid = jnp.geomspace(0.5, 1.6, n_fx_hyp)
    K_grid = jax.vmap(K_from_fx_mult)(fx_grid)                 # [F, 3, 3]

    def sweep(pts_all):
        """Joint (fx, tag) hypothesis sweep.

        Returns (best_twist [N,6], best_fx_mult [N], best_loss [N]).
        """
        def per_focal(K_hyp):
            K_rep = jnp.broadcast_to(K_hyp, (n, 3, 3))
            cands = _pnp_candidate_twists(pts_all, K_rep, cube)   # [6, N, 6]
            losses = jax.vmap(
                lambda tw: residual(pts_all, se3_to_SE3(tw), K_rep)
            )(cands)                                              # [6, N]
            losses = jnp.nan_to_num(losses, nan=1e30, posinf=1e30)
            best_t = jnp.argmin(losses, axis=0)                   # [N]
            tw = jnp.take_along_axis(cands, best_t[None, :, None], axis=0)[0]
            ls = jnp.take_along_axis(losses, best_t[None, :], axis=0)[0]
            return tw, ls

        tws, lss = jax.vmap(per_focal)(K_grid)                    # [F,N,6], [F,N]
        best_f = jnp.argmin(lss, axis=0)                          # [N]
        tw = jnp.take_along_axis(tws, best_f[None, :, None], axis=0)[0]
        ls = jnp.take_along_axis(lss, best_f[None, :], axis=0)[0]
        return tw, fx_grid[best_f], ls

    best_pose, best_fx, best_pose_loss = sweep(calib.coord_pts)
    adopt_pose = best_pose_loss < adopt_factor * extr_now

    # the fy parameter stores fy / img_w (camera_params.intrinsics), and the
    # hypothesis sets fy = fx_mult * img_h
    fy_param = best_fx * (img_h / img_w)
    new_cam = params.cam._replace(
        pose_se3=jnp.where(adopt_pose[:, None], best_pose, params.cam.pose_se3),
        fx=jnp.where(adopt_pose, best_fx, params.cam.fx),
        fy=jnp.where(adopt_pose, fy_param, params.cam.fy),
        ux=jnp.where(adopt_pose, 1.0, params.cam.ux),
        uy=jnp.where(adopt_pose, 1.0, params.cam.uy),
    )
    # cube poses under the (possibly updated) intrinsics
    K_new = intrinsics(new_cam, img_h, img_w)
    cands = _pnp_candidate_twists(calib.calib_pts, K_new, cube)
    losses = jax.vmap(
        lambda tw: residual(calib.calib_pts, se3_to_SE3(tw), K_new)
    )(cands)
    losses = jnp.nan_to_num(losses, nan=1e30, posinf=1e30)
    best_t = jnp.argmin(losses, axis=0)
    best_cube = jnp.take_along_axis(cands, best_t[None, :, None], axis=0)[0]
    best_cube_loss = jnp.take_along_axis(losses, best_t[None, :], axis=0)[0]
    # if K changed, the old intr residual is stale — recompute under K_new
    intr_under_new = residual(
        calib.calib_pts, calib_cube_poses(params.cam), K_new
    )
    adopt_cube = best_cube_loss < adopt_factor * intr_under_new
    new_cam = new_cam._replace(
        calib_pose_se3=jnp.where(
            adopt_cube[:, None], best_cube, params.cam.calib_pose_se3
        ),
    )
    return Params(cam=new_cam, nerf=params.nerf), adopt_pose, adopt_cube
