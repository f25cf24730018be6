"""Ray-generation tests: gather-based rays must equal full-grid rays."""

import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.cameras import (
    fov_to_K,
    pixel_grid,
    rays_for_pixels,
    rays_full_image,
    se3_to_SE3,
)
from mc_nerf_tpu.cameras.projection import world2cam


def test_pixel_grid_centers():
    grid = pixel_grid(2, 3)
    assert grid.shape == (6, 2)
    np.testing.assert_allclose(grid[0], [0.5, 0.5])
    np.testing.assert_allclose(grid[1], [1.5, 0.5])  # x fastest (row-major)
    np.testing.assert_allclose(grid[3], [0.5, 1.5])


def test_rays_unit_norm(rng):
    pose = se3_to_SE3(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
    K = fov_to_K(jnp.asarray(np.deg2rad(55.0)), 64, 64)
    rays_d, rays_o = rays_full_image(pose, K, 64, 64)
    np.testing.assert_allclose(jnp.linalg.norm(rays_d, axis=-1), jnp.ones(64 * 64), atol=1e-5)
    # all origins identical (the camera center)
    assert jnp.max(jnp.std(rays_o, axis=0)) < 1e-6


def test_subsampled_rays_match_full_grid(rng):
    """TPU-native gather-based ray gen == reference full-grid-then-index."""
    pose = se3_to_SE3(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
    K = fov_to_K(jnp.asarray(np.deg2rad(70.0)), 48, 36)
    rays_d_full, rays_o_full = rays_full_image(pose, K, 48, 36)
    idx = jnp.asarray(rng.choice(48 * 36, size=100, replace=False))
    pix = pixel_grid(48, 36)[idx]
    rays_d, rays_o = rays_for_pixels(pix, pose, K)
    np.testing.assert_allclose(rays_d, rays_d_full[idx], atol=1e-6)
    np.testing.assert_allclose(rays_o, rays_o_full[idx], atol=1e-6)


def test_ray_origin_is_camera_center(rng):
    pose = se3_to_SE3(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
    K = fov_to_K(jnp.asarray(np.deg2rad(60.0)), 16, 16)
    _, rays_o = rays_full_image(pose, K, 16, 16)
    # the camera center maps to the origin of the camera frame
    cam = world2cam(rays_o[:1][None], pose)
    np.testing.assert_allclose(cam, jnp.zeros_like(cam), atol=1e-5)


def test_center_pixel_ray_points_down_optical_axis():
    """With identity pose, the center ray must be +z (OpenCV forward)."""
    pose = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=-1)
    K = fov_to_K(jnp.asarray(np.deg2rad(60.0)), 100, 100)
    pix = jnp.array([[50.0, 50.0]])  # image center == principal point
    rays_d, rays_o = rays_for_pixels(pix, pose, K)
    np.testing.assert_allclose(rays_d[0], jnp.array([0.0, 0.0, 1.0]), atol=1e-5)
    np.testing.assert_allclose(rays_o[0], jnp.zeros(3), atol=1e-6)
