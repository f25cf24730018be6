"""Planar PnP: homography DLT + decomposition recover exact poses."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.cameras.convention import fov_to_K
from mc_nerf_tpu.cameras.lie import se3_to_SE3
from mc_nerf_tpu.cameras.pnp import homography_dlt, solve_planar_pnp


def _project(pts_cam, K):
    pix = pts_cam @ np.asarray(K).T
    return pix[:, :2] / pix[:, 2:3]


def test_homography_dlt_exact(rng):
    H_true = np.array([[1.2, 0.1, 5.0], [-0.2, 0.9, 3.0], [1e-3, -2e-3, 1.0]])
    src = rng.uniform(-1, 1, size=(8, 2))
    src_h = np.concatenate([src, np.ones((8, 1))], -1)
    dst_h = src_h @ H_true.T
    dst = dst_h[:, :2] / dst_h[:, 2:3]
    H = np.asarray(homography_dlt(jnp.asarray(src), jnp.asarray(dst)))
    H = H / H[2, 2]
    np.testing.assert_allclose(H, H_true, atol=1e-4)


def test_solve_planar_pnp_recovers_pose(rng):
    K = fov_to_K(jnp.asarray(np.deg2rad(55.0)), 640, 640)
    h = 0.4
    plane = np.array([[0, 0], [-h, h], [h, h], [h, -h], [-h, -h]], np.float32)
    for trial in range(6):
        # random pose with the plane in front of the camera
        wu = rng.normal(size=(6,)).astype(np.float32) * 0.6
        wu[5] = 3.0 + rng.uniform(0, 2)  # push +z
        pose_true = np.asarray(se3_to_SE3(jnp.asarray(wu)))
        pts3 = np.concatenate([plane, np.zeros((5, 1), np.float32)], -1)
        cam = pts3 @ pose_true[:, :3].T + pose_true[:, 3]
        if (cam[:, 2] <= 0.2).any():
            continue
        pix = _project(cam, K)
        pose_est = np.asarray(
            solve_planar_pnp(jnp.asarray(plane), jnp.asarray(pix), K)
        )
        np.testing.assert_allclose(pose_est, pose_true, atol=5e-3)


def test_solve_planar_pnp_batched(rng):
    K = fov_to_K(jnp.asarray(np.deg2rad(60.0)), 320, 320)
    h = 0.4
    plane = np.array([[0, 0], [-h, h], [h, h], [h, -h], [-h, -h]], np.float32)
    poses, pixes = [], []
    while len(poses) < 4:
        wu = rng.normal(size=(6,)).astype(np.float32) * 0.5
        wu[5] = 3.5
        pose = np.asarray(se3_to_SE3(jnp.asarray(wu)))
        pts3 = np.concatenate([plane, np.zeros((5, 1), np.float32)], -1)
        cam = pts3 @ pose[:, :3].T + pose[:, 3]
        if (cam[:, 2] <= 0.5).any():
            continue
        poses.append(pose)
        pixes.append(_project(cam, K))
    est = np.asarray(
        solve_planar_pnp(
            jnp.asarray(np.stack([plane] * 4)),
            jnp.asarray(np.stack(pixes)),
            jnp.broadcast_to(K, (4, 3, 3)),
        )
    )
    np.testing.assert_allclose(est, np.stack(poses), atol=5e-3)
