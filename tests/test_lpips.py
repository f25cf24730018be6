"""LPIPS plumbing golden test vs torch (no pretrained weights needed).

The JAX LPIPS (``eval/lpips_jax.py``) cannot be validated against the pip
``lpips`` package here (zero egress, no pretrained weights), but its conv
geometry — AlexNet strides/pads/pools, channel-norm, linear weighting — can
be cross-checked exactly with *random* weights against an independent torch
implementation of the same published algorithm (torch 2.x CPU is in the
image).  This pins the convert_torch_lpips key mapping too: the torch side
consumes a pip-package-layout state dict, the JAX side consumes the
converted .npz.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mc_nerf_tpu.eval import lpips_jax  # noqa: E402

_SPECS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1))
_SLICE_IDX = {1: 0, 2: 3, 3: 6, 4: 8, 5: 10}  # conv index inside each slice


def _random_state_dict(rng):
    """Pip-``lpips``-layout state dict with random weights (torch tensors)."""
    sd = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_SPECS, start=1):
        w = rng.normal(scale=0.05, size=(cout, cin, k, k)).astype(np.float32)
        b = rng.normal(scale=0.05, size=(cout,)).astype(np.float32)
        sd[f"net.slice{i}.{_SLICE_IDX[i]}.weight"] = torch.tensor(w)
        sd[f"net.slice{i}.{_SLICE_IDX[i]}.bias"] = torch.tensor(b)
        cin = cout
    for i, (cout, _, _, _) in enumerate(_SPECS):
        lin = np.abs(rng.normal(size=(1, cout, 1, 1))).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = torch.tensor(lin)
    return sd


def _torch_lpips(sd, pred, gt):
    """Independent NCHW transcription of the published LPIPS(alex) algorithm."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.tensor(np.transpose(img, (2, 0, 1))[None]) * 2.0 - 1.0
        x = (x - shift) / scale
        taps = []
        for i, (_, _, stride, pad) in enumerate(_SPECS, start=1):
            w = sd[f"net.slice{i}.{_SLICE_IDX[i]}.weight"]
            b = sd[f"net.slice{i}.{_SLICE_IDX[i]}.bias"]
            x = F.relu(F.conv2d(x, w, b, stride=stride, padding=pad))
            taps.append(x)
            if i in (1, 2):
                x = F.max_pool2d(x, 3, 2)
        return taps

    total = 0.0
    for i, (tp, tg) in enumerate(zip(feats(pred), feats(gt))):
        tp = tp / (tp.norm(dim=1, keepdim=True) + 1e-10)
        tg = tg / (tg.norm(dim=1, keepdim=True) + 1e-10)
        lin = sd[f"lin{i}.model.1.weight"][0, :, 0, 0].view(1, -1, 1, 1)
        total = total + ((tp - tg) ** 2 * lin).sum(dim=1).mean()
    return float(total)


def test_lpips_jax_matches_torch_reference(rng, tmp_path):
    sd = _random_state_dict(rng)
    npz = str(tmp_path / "lpips_rand.npz")
    lpips_jax.convert_torch_lpips(sd, npz)
    model = lpips_jax.load(npz)

    pred = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)

    ours = float(lpips_jax.lpips_distance(model, pred, gt))
    ref = _torch_lpips(sd, pred, gt)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    assert ours > 0  # different images -> nonzero distance

    # identical images -> exactly zero
    same = float(lpips_jax.lpips_distance(model, pred, pred))
    assert abs(same) < 1e-8


def test_make_lpips_weights_cli(tmp_path, rng):
    """The one-command conversion CLI (scripts/make_lpips_weights.py):
    torch state dict on disk -> loadable .npz at the requested path."""
    import subprocess
    import sys as _sys
    import os as _os

    sd = _random_state_dict(rng)
    pt = str(tmp_path / "lpips_alex.pt")
    torch.save(sd, pt)
    out = str(tmp_path / "w" / "lpips_alex.npz")
    script = _os.path.join(
        _os.path.dirname(__file__), "..", "scripts", "make_lpips_weights.py"
    )
    r = subprocess.run(
        [_sys.executable, script, pt, "-o", out],
        # generous: the subprocess pays a fresh torch import, and CI-like
        # boxes can be single-core and contended (observed 120s expiry)
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    model = lpips_jax.load(out)
    img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    assert float(lpips_jax.lpips_distance(model, img, 1.0 - img)) > 0


def test_lpips_metric_uses_cached_model(tmp_path, rng, monkeypatch):
    """metrics.lpips loads the weights once per path (ref reloads per image)."""
    from mc_nerf_tpu.eval import metrics

    sd = _random_state_dict(rng)
    npz = str(tmp_path / "lpips_rand.npz")
    lpips_jax.convert_torch_lpips(sd, npz)

    calls = {"n": 0}
    real_load = lpips_jax.load_default

    def counting_load(path=None):
        calls["n"] += 1
        return real_load(path)

    monkeypatch.setattr(lpips_jax, "load_default", counting_load)
    metrics._lpips_model.cache_clear()
    img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    a = metrics.lpips(img, img, weights_path=npz)
    b = metrics.lpips(img, 1.0 - img, weights_path=npz)
    assert a == 0.0 and b is not None and b > 0
    assert calls["n"] == 1
    metrics._lpips_model.cache_clear()
