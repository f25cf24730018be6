"""Training losses (ref ``model/loss.py``).

  * reprojection: per-axis MSE of pixel coords normalized by W / H
    (``loss.py:45-58``);
  * stage 1: intrinsic-reprojection + extrinsic-reprojection loss;
  * stages 2/3: self-normalized intrinsic loss ``L / (sg(L) + 1e-8)`` —
    value ~1 but gradient direction preserved (``loss.py:23``) — plus coarse
    and fine RGB MSE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reprojection_loss(
    pred_pix: jnp.ndarray,
    gt_pix: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> jnp.ndarray:
    """Mean squared pixel error, axes normalized by image size."""
    dx = (pred_pix[..., 0] - gt_pix[..., 0]) / img_w
    dy = (pred_pix[..., 1] - gt_pix[..., 1]) / img_h
    return jnp.mean(dx * dx) + jnp.mean(dy * dy)


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def self_normalized(loss: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """L / (stop_grad(L) + eps): ~constant magnitude, live gradient.

    The gradient is grad(L) / (L + eps), which *amplifies* like 1/L as the
    reprojection residual converges — with a PnP-initialized calibration the
    residual reaches ~1e-8 and the reference's eps=1e-8 (loss.py:23) lets a
    single optimizer step kick the solved cameras away (observed at the
    stage-2 -> stage-3 boundary).  eps=1e-6 (~(0.8 px / 800)^2) preserves
    the term's scale-invariant weighting at realistic residuals and fades
    it out once calibration is below detection noise.
    """
    return loss / (jax.lax.stop_gradient(loss) + eps)
