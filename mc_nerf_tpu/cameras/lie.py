"""SE(3)/SO(3) Lie-group maps, closed form, batched, fp64-safe.

The reference implements the se(3) exponential with a 10-term Taylor series
(``model/mc_nerf.py:269-316``).  Closed-form coefficients with a small-angle
Taylor switch are exact for all angles, cheaper, and XLA-friendly.  All
functions broadcast over arbitrary leading batch dimensions.

Gradient safety: ``jnp.where``-guarded angles keep NaNs out of both the
primal and the VJP at theta -> 0 (the classic double-where trick).
"""

from __future__ import annotations

import jax.numpy as jnp

from mc_nerf_tpu.utils.precision import heinsum, hmatmul

# below this angle the Taylor branch is used (fp32-safe threshold)
_SMALL = 1e-4


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix (ref mc_nerf.py:283-289)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zeros, -w2, w1], axis=-1),
            jnp.stack([w2, zeros, -w0], axis=-1),
            jnp.stack([-w1, w0, zeros], axis=-1),
        ],
        axis=-2,
    )


def _abc(theta_sq: jnp.ndarray):
    """Rodrigues coefficients A=sin(t)/t, B=(1-cos t)/t^2, C=(t-sin t)/t^3.

    Exact closed forms away from zero; 4th-order Taylor near zero.  Matches
    the reference's truncated Taylor series (mc_nerf.py:291-316) to beyond
    fp32 precision on its domain.
    """
    small = theta_sq < _SMALL * _SMALL
    # guard BEFORE the sqrt: sqrt'(0) = inf would leak NaN into the VJP even
    # through the unselected where-branch (0 * inf) — the double-where trick.
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    safe_sq = safe * safe

    a_exact = jnp.sin(safe) / safe
    b_exact = (1.0 - jnp.cos(safe)) / safe_sq
    c_exact = (safe - jnp.sin(safe)) / (safe_sq * safe)

    a_taylor = 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0
    b_taylor = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    c_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0

    A = jnp.where(small, a_taylor, a_exact)
    B = jnp.where(small, b_taylor, b_exact)
    C = jnp.where(small, c_taylor, c_exact)
    return A, B, C


def so3_to_SO3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _abc(theta_sq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)
    return eye + A[..., None, None] * wx + B[..., None, None] * hmatmul(wx, wx)


def se3_to_SE3(wu: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist [..., 6] (rotation w | translation u) -> [..., 3, 4].

    Same parameterization as the reference's learnable camera poses
    (``model/mc_nerf.py:269-281``): R = exp(w), t = V(w) u.
    """
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    wx2 = hmatmul(wx, wx)
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, C = _abc(theta_sq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=wu.dtype), wx.shape)
    R = eye + A[..., None, None] * wx + B[..., None, None] * wx2
    V = eye + B[..., None, None] * wx + C[..., None, None] * wx2
    t = heinsum("...ij,...j->...i", V, u)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def _rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z), w >= 0.

    Shepperd's method, branchless: all four candidate extractions are
    computed and the best-conditioned one (largest squared component) is
    selected per element — uniformly stable, including theta ~ pi where the
    naive vee-based log map degenerates.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    t = jnp.stack(
        [
            1.0 + r00 + r11 + r22,  # 4 w^2
            1.0 + r00 - r11 - r22,  # 4 x^2
            1.0 - r00 + r11 - r22,  # 4 y^2
            1.0 - r00 - r11 + r22,  # 4 z^2
        ],
        axis=-1,
    )
    best = jnp.argmax(t, axis=-1)
    s = jnp.sqrt(jnp.clip(jnp.take_along_axis(t, best[..., None], -1)[..., 0], 1e-12)) * 2.0

    # candidates [..., 4 cases, 4 components], each scaled by 1/s of its case
    q0 = jnp.stack([s / 4.0, (r21 - r12) / s, (r02 - r20) / s, (r10 - r01) / s], -1)
    q1 = jnp.stack([(r21 - r12) / s, s / 4.0, (r01 + r10) / s, (r02 + r20) / s], -1)
    q2 = jnp.stack([(r02 - r20) / s, (r01 + r10) / s, s / 4.0, (r12 + r21) / s], -1)
    q3 = jnp.stack([(r10 - r01) / s, (r02 + r20) / s, (r12 + r21) / s, s / 4.0], -1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    # canonical sign: w >= 0 (shortest rotation)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def SO3_to_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Log map: rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    Via quaternion: theta = 2 atan2(|q_xyz|, q_w) — stable for all angles
    including the theta ~ pi region that breaks trace/vee formulations.
    """
    q = _rotation_to_quaternion(R)
    qw, qv = q[..., 0], q[..., 1:]
    norm_v = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(norm_v, qw)
    small = norm_v < 1e-7
    safe = jnp.where(small, jnp.ones_like(norm_v), norm_v)
    # theta/sin(theta/2) -> 2 as theta -> 0
    scale = jnp.where(small, 2.0 + theta * theta / 12.0, theta / safe)
    return qv * scale[..., None]


def SE3_to_se3(Rt: jnp.ndarray) -> jnp.ndarray:
    """Log map: [..., 3, 4] -> twist [..., 6]; inverse of :func:`se3_to_SE3`."""
    R, t = Rt[..., :3], Rt[..., 3]
    w = SO3_to_so3(R)
    wx = skew(w)
    wx2 = hmatmul(wx, wx)
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, C = _abc(theta_sq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Rt.dtype), wx.shape)
    V = eye + B[..., None, None] * wx + C[..., None, None] * wx2
    u = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, u], axis=-1)
