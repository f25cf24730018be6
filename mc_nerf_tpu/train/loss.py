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


def self_normalized(loss: jnp.ndarray) -> jnp.ndarray:
    """L / (stop_grad(L) + 1e-8): constant magnitude, live gradient."""
    return loss / (jax.lax.stop_gradient(loss) + 1e-8)
