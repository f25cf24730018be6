"""Metric tests: PSNR analytic values, SSIM vs the reference algorithm."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mc_nerf_tpu.eval.metrics import psnr, ssim


def test_psnr_values(rng):
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(img), jnp.asarray(img))) > 80
    noisy = np.clip(img + 0.1, 0, 1)
    mse = np.mean((noisy - img) ** 2)
    expected = -10 * np.log10(mse)
    np.testing.assert_allclose(float(psnr(jnp.asarray(noisy), jnp.asarray(img))), expected, rtol=1e-4)


def _ref_ssim_torch(img1, img2, window_size=11, sigma=1.5):
    """Transcription of the reference's vendored pytorch_ssim algorithm
    (model/external/pohsun_ssim/pytorch_ssim/__init__.py:17-73)."""
    def gaussian(ws, s):
        g = torch.tensor([float(np.exp(-((x - ws // 2) ** 2) / (2 * s ** 2))) for x in range(ws)])
        return g / g.sum()

    ch = img1.size(1)
    _1d = gaussian(window_size, sigma).unsqueeze(1)
    _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
    window = _2d.expand(ch, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=ch)
    mu2 = F.conv2d(img2, window, padding=pad, groups=ch)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=ch) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=ch) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=ch) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(ssim_map.mean())


def test_ssim_matches_reference(rng):
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    at = torch.tensor(a).permute(2, 0, 1).unsqueeze(0)
    bt = torch.tensor(b).permute(2, 0, 1).unsqueeze(0)
    ref = _ref_ssim_torch(at, bt)
    # SAME-padding differs from the reference's zero-padding only at borders
    np.testing.assert_allclose(ours, ref, atol=0.01)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.99


def test_lpips_unavailable_returns_none(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # ensure no weights file in reach
    from mc_nerf_tpu.eval.metrics import lpips

    assert lpips(np.zeros((8, 8, 3)), np.ones((8, 8, 3))) is None
