"""Image quality metrics: PSNR, SSIM, LPIPS.

  * PSNR: -10*log10(MSE) over [0,1] images (ref ``main.py:220-228``).
  * SSIM: 11x11 Gaussian window (sigma 1.5), C1=0.01^2, C2=0.03^2 — the same
    algorithm as the reference's vendored ``pytorch_ssim``
    (``model/external/pohsun_ssim/pytorch_ssim/__init__.py:17-73``),
    re-implemented with a depthwise convolution in JAX.
  * LPIPS: AlexNet-feature LPIPS re-implemented in JAX
    (:mod:`mc_nerf_tpu.eval.lpips_jax`).  Pretrained AlexNet weights cannot
    be redistributed/downloaded in this environment; ``lpips()`` accepts a
    weights file and returns ``None`` when unavailable rather than fabricate
    a number.  (The reference constructs ``lpips.LPIPS(net="alex")`` from
    the pip package *per image* — a perf bug we do not replicate.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(mean squared error); inputs in [0, 1], any matching shape."""
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _depthwise_blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] depthwise 2-D convolution, SAME padding."""
    c = img.shape[-1]
    k = window[:, :, None, None]                       # [kh, kw, 1, 1]
    k = jnp.tile(k, (1, 1, 1, c))                      # depthwise
    out = jax.lax.conv_general_dilated(
        img[None],                                     # [1, H, W, C]
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # full fp32: the TPU default (bf16 MXU passes) breaks the
        # blur(x^2) - mu^2 cancellation on near-constant images — variance
        # noise ~1e-2 vs C2 = 9e-4 produced SSIM "scores" > 1
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair in [0, 1]."""
    w = _gaussian_window(window_size, sigma)
    mu_p = _depthwise_blur(pred, w)
    mu_g = _depthwise_blur(gt, w)
    mu_pp = mu_p * mu_p
    mu_gg = mu_g * mu_g
    mu_pg = mu_p * mu_g
    sig_p = _depthwise_blur(pred * pred, w) - mu_pp
    sig_g = _depthwise_blur(gt * gt, w) - mu_gg
    sig_pg = _depthwise_blur(pred * gt, w) - mu_pg
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu_pg + c1) * (2 * sig_pg + c2)) / (
        (mu_pp + mu_gg + c1) * (sig_p + sig_g + c2)
    )
    return jnp.mean(ssim_map)


@functools.lru_cache(maxsize=2)
def _lpips_model(weights_path: Optional[str]):
    from mc_nerf_tpu.eval import lpips_jax

    return lpips_jax.load_default(weights_path)


def lpips(
    pred: np.ndarray,
    gt: np.ndarray,
    weights_path: Optional[str] = None,
) -> Optional[float]:
    """LPIPS(alex) if weights are available, else None.

    The model loads once per weights path (cached) — NOT per image like the
    reference's ``lpips.LPIPS(net="alex")`` construction at ``main.py:239``.
    See :mod:`mc_nerf_tpu.eval.lpips_jax` for the weight file format.
    """
    from mc_nerf_tpu.eval import lpips_jax

    model = _lpips_model(weights_path)
    if model is None:
        return None
    return float(lpips_jax.lpips_distance(model, pred, gt))
