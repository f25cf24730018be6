"""Round-trip and invariance tests for projection chains and conventions."""

import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.cameras import (
    blender_pose_to_w2c,
    cam2pix,
    cam2world,
    compose_poses,
    fov_to_K,
    invert_K,
    invert_pose,
    pix2cam,
    se3_to_SE3,
    to_hom,
    w2c_to_blender_pose,
    world2cam,
)
from mc_nerf_tpu.cameras.projection import reproject_points


def _random_pose(rng, n=1):
    wu = jnp.asarray(rng.normal(size=(n, 6)), dtype=jnp.float32)
    return se3_to_SE3(wu)


def _random_K(rng, n=1, h=800, w=800):
    fov = jnp.asarray(rng.uniform(np.deg2rad(40), np.deg2rad(80), size=(n,)), dtype=jnp.float32)
    return fov_to_K(fov, h, w)


def test_invert_K_analytic(rng):
    K = _random_K(rng, 5)
    K_inv = invert_K(K)
    prod = K @ K_inv
    np.testing.assert_allclose(prod, jnp.broadcast_to(jnp.eye(3), prod.shape), atol=1e-4)


def test_world_cam_round_trip(rng):
    pose = _random_pose(rng, 4)
    pts = jnp.asarray(rng.normal(size=(4, 11, 3)), dtype=jnp.float32)
    cam = world2cam(pts, pose)
    back = cam2world(cam, pose)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_pix_cam_round_trip(rng):
    K = _random_K(rng, 3)
    pix = jnp.asarray(rng.uniform(0, 800, size=(3, 17, 2)), dtype=jnp.float32)
    cam = pix2cam(to_hom(pix), invert_K(K))
    pix_back = cam2pix(cam, K)
    np.testing.assert_allclose(pix_back, pix, atol=1e-2)


def test_invert_pose_involution(rng):
    pose = _random_pose(rng, 6)
    np.testing.assert_allclose(invert_pose(invert_pose(pose)), pose, atol=1e-5)


def test_compose_with_inverse_is_identity(rng):
    pose = _random_pose(rng, 6)
    ident = compose_poses(pose, invert_pose(pose))
    np.testing.assert_allclose(ident[..., :3], jnp.broadcast_to(jnp.eye(3), (6, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(ident[..., 3], jnp.zeros((6, 3)), atol=1e-5)


def test_blender_conversion_round_trip(rng):
    pose = _random_pose(rng, 5)
    c2w = w2c_to_blender_pose(pose)
    pose_back = blender_pose_to_w2c(c2w)
    np.testing.assert_allclose(pose_back, pose, atol=1e-5)


def test_blender_conversion_matches_reference_algebra(rng):
    """Check against a literal transcription of ref data_read.py:246-257."""

    def ref_blender_pose_transform(pose44):
        pose_R = pose44[:3, :3]
        pose_T = pose44[:3, 3:]
        flip = np.diag([1.0, -1.0, -1.0])
        R_new = pose_R @ flip
        T_new = pose_T.copy()
        R_inv = R_new.T
        T_inv = -R_inv @ T_new
        return np.concatenate([R_inv, T_inv], axis=-1)

    for _ in range(4):
        wu = rng.normal(size=(6,)).astype(np.float32)
        c2w34 = np.asarray(se3_to_SE3(jnp.asarray(wu)))
        c2w44 = np.concatenate([c2w34, [[0, 0, 0, 1]]], axis=0)
        expected = ref_blender_pose_transform(c2w44)
        ours = np.asarray(blender_pose_to_w2c(jnp.asarray(c2w44)))
        np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_fov_to_K_values():
    K = fov_to_K(jnp.asarray(np.deg2rad(90.0)), 800, 800)
    # tan(45 deg) = 1 -> fx = 400
    np.testing.assert_allclose(K[0, 0], 400.0, rtol=1e-5)
    np.testing.assert_allclose(K[1, 1], 400.0, rtol=1e-5)
    np.testing.assert_allclose(K[0, 2], 400.0, rtol=1e-6)
    np.testing.assert_allclose(K[1, 2], 400.0, rtol=1e-6)


def test_reprojection_of_visible_point(rng):
    """A world point in front of the camera projects inside the image."""
    K = fov_to_K(jnp.asarray(np.deg2rad(60.0)), 800, 800)
    # camera at origin looking down +z in OpenCV convention: identity pose
    pose = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1)
    pts = jnp.array([[[0.0, 0.0, 5.0]]])  # straight ahead
    pix = reproject_points(pts, K, pose)
    np.testing.assert_allclose(pix[0, 0], jnp.array([400.0, 400.0]), atol=1e-4)
