"""Evaluation: image metrics, full-image rendering, demo mode."""

from mc_nerf_tpu.eval.metrics import psnr, ssim  # noqa: F401
