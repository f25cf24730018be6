"""Property tests for the SE(3)/SO(3) maps (ref mc_nerf.py:269-316 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.cameras import lie

jax.config.update("jax_enable_x64", False)


def _random_twists(rng, n, scale=2.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_skew_antisymmetric(rng):
    w = jnp.asarray(rng.normal(size=(7, 3)), dtype=jnp.float32)
    wx = lie.skew(w)
    np.testing.assert_allclose(wx, -jnp.swapaxes(wx, -1, -2), atol=1e-7)
    v = jnp.asarray(rng.normal(size=(7, 3)), dtype=jnp.float32)
    cross = jnp.cross(w, v)
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", wx, v), cross, atol=1e-5)


def test_so3_rotation_properties(rng):
    w = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    R = lie.so3_to_SO3(w)
    eye = jnp.eye(3)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(eye, R.shape), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(16), atol=1e-5)


def test_se3_identity():
    Rt = lie.se3_to_SE3(jnp.zeros((6,)))
    np.testing.assert_allclose(Rt[:, :3], jnp.eye(3), atol=1e-7)
    np.testing.assert_allclose(Rt[:, 3], jnp.zeros(3), atol=1e-7)


def test_se3_pure_translation():
    wu = jnp.array([0.0, 0.0, 0.0, 1.0, -2.0, 3.0])
    Rt = lie.se3_to_SE3(wu)
    np.testing.assert_allclose(Rt[:, :3], jnp.eye(3), atol=1e-7)
    np.testing.assert_allclose(Rt[:, 3], jnp.array([1.0, -2.0, 3.0]), atol=1e-7)


def test_se3_round_trip(rng):
    wu = _random_twists(rng, 32, scale=1.0)
    Rt = lie.se3_to_SE3(wu)
    wu_back = lie.SE3_to_se3(Rt)
    Rt_back = lie.se3_to_SE3(wu_back)
    # the twist itself is unique only up to 2*pi wraps; compare group elements
    np.testing.assert_allclose(Rt_back, Rt, atol=2e-4)


def test_se3_matches_reference_taylor(rng):
    """Closed form must agree with the reference's 10-term Taylor algebra."""

    def taylor_se3(wu, nth=10):
        wu = np.asarray(wu, dtype=np.float64)
        w, u = wu[:3], wu[3:]
        wx = np.array(
            [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=np.float64
        )
        theta = np.linalg.norm(w)
        A = B = C = 0.0
        denom_a = denom_b = denom_c = 1.0
        for i in range(nth + 1):
            if i > 0:
                denom_a *= (2 * i) * (2 * i + 1)
            A += (-1) ** i * theta ** (2 * i) / denom_a
            denom_b *= (2 * i + 1) * (2 * i + 2)
            B += (-1) ** i * theta ** (2 * i) / denom_b
            denom_c *= (2 * i + 2) * (2 * i + 3)
            C += (-1) ** i * theta ** (2 * i) / denom_c
        R = np.eye(3) + A * wx + B * (wx @ wx)
        V = np.eye(3) + B * wx + C * (wx @ wx)
        return np.concatenate([R, (V @ u[:, None])], axis=-1)

    wu = _random_twists(rng, 8, scale=1.5)
    ours = np.asarray(lie.se3_to_SE3(wu))
    for i in range(wu.shape[0]):
        np.testing.assert_allclose(ours[i], taylor_se3(np.asarray(wu[i])), atol=1e-4)


def test_small_angle_gradients_finite():
    """theta -> 0 must not produce NaN in primal or gradient."""

    def loss(wu):
        return jnp.sum(lie.se3_to_SE3(wu) ** 2)

    for eps in [0.0, 1e-9, 1e-6, 1e-3]:
        wu = jnp.array([eps, 0.0, 0.0, 1.0, 2.0, 3.0])
        g = jax.grad(loss)(wu)
        assert jnp.all(jnp.isfinite(g)), f"NaN gradient at eps={eps}"


def test_se3_all_ones_twist():
    """The reference initializes every camera twist to ones (mc_nerf.py:347-371)."""
    Rt = lie.se3_to_SE3(jnp.ones((6,)))
    R = Rt[:, :3]
    np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-5)
    assert jnp.all(jnp.isfinite(Rt))
