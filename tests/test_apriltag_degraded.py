"""Detector robustness on non-pristine images (VERDICT r3 ask #2).

Real capture — MC-NeRF's stated use case — brings uneven lighting, sensor
noise, defocus, and JPEG artifacts; the reference handles these through
libapriltag's adaptive tile thresholding (ref ``data/data_read.py:181-187``).
This matrix degrades synthetic calibration renders and asserts the C++
detector (now adaptive, ``detector.cpp`` step 1) keeps its detection rate
and keypoint accuracy vs the clean-image golden.
"""

import io

import numpy as np
import pytest
from PIL import Image, ImageFilter

from mc_nerf_tpu.data.cube import tag_world_points
from mc_nerf_tpu.data.cube_render import render_cube_image
from mc_nerf_tpu.data.synthetic import (
    _blender_to_w2c_np,
    _look_at_c2w,
    _random_rotation,
)
from mc_nerf_tpu.native.apriltag_binding import (
    detect_tags,
    detector_available,
    rgb_to_gray,
)

pytestmark = pytest.mark.skipif(
    not detector_available(), reason="C++ detector failed to build"
)

_K = np.array([[500.0, 0, 200], [0, 500.0, 200], [0, 0, 1]])
_SIZE = 400


def _scene(trial: int):
    """One rendered calibration view: (gray_u8, w2c, cube_rot)."""
    rng = np.random.default_rng(100 + trial)
    v = rng.normal(size=3)
    v /= np.linalg.norm(v)
    w2c = _blender_to_w2c_np(_look_at_c2w(v * 3.2, np.zeros(3)))
    R_cube = _random_rotation(rng)
    rgba = render_cube_image(w2c, _K, _SIZE, _SIZE, cube_rot=R_cube, supersample=3)
    img = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    return rgb_to_gray(img), w2c, R_cube


def _illumination(gray: np.ndarray, lo: float = 0.35) -> np.ndarray:
    """Diagonal brightness ramp lo..1.0 — the classic global-threshold
    killer: the dim corner's white falls below the bright corner's black."""
    h, w = gray.shape
    ramp = lo + (1.0 - lo) * (
        np.linspace(0, 1, h)[:, None] + np.linspace(0, 1, w)[None, :]
    ) / 2.0
    return np.clip(gray.astype(np.float64) * ramp, 0, 255).astype(np.uint8)


def _noise(gray: np.ndarray, sigma: float = 8.0, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.clip(
        gray.astype(np.float64) + rng.normal(0, sigma, gray.shape), 0, 255
    ).astype(np.uint8)


def _blur(gray: np.ndarray, sigma: float = 1.5) -> np.ndarray:
    return np.asarray(
        Image.fromarray(gray).filter(ImageFilter.GaussianBlur(sigma))
    )


def _jpeg(gray: np.ndarray, quality: int = 40) -> np.ndarray:
    buf = io.BytesIO()
    Image.fromarray(gray).save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("L"))


_DEGRADATIONS = {
    "illumination": _illumination,
    "noise": _noise,
    "blur": _blur,
    "jpeg": _jpeg,
    "combo": lambda g: _jpeg(_noise(_illumination(g), sigma=5.0), quality=60),
}

# (min detection rate vs clean, max mean keypoint error in px)
_BUDGETS = {
    "illumination": (0.9, 0.6),
    "noise": (0.9, 0.7),
    "blur": (0.9, 0.8),
    "jpeg": (0.9, 0.7),
    "combo": (0.75, 1.0),
}

_N_TRIALS = 4


def _run(gray, w2c, R_cube):
    pts = tag_world_points(1.0)
    out = {}
    for d in detect_tags(gray):
        cam = (pts[d.tag_id] @ R_cube.T) @ w2c[:, :3].T + w2c[:, 3]
        pix = cam @ _K.T
        gt = pix[:, :2] / pix[:, 2:3]
        out[d.tag_id] = np.abs(gt - d.keypoints).max()
    return out


@pytest.fixture(scope="module")
def clean_golden():
    """Per-trial clean detections: {trial: {tag_id: max_err_px}}."""
    scenes, golden = [], []
    for t in range(_N_TRIALS):
        gray, w2c, R = _scene(t)
        scenes.append((gray, w2c, R))
        golden.append(_run(gray, w2c, R))
    # viewpoints see 1-3 cube faces each; 4 random views yield ~7 tags
    assert sum(len(g) for g in golden) >= 6, "clean baseline too weak"
    return scenes, golden


@pytest.mark.parametrize("name", sorted(_DEGRADATIONS))
def test_degraded_detection(name, clean_golden):
    scenes, golden = clean_golden
    degrade = _DEGRADATIONS[name]
    min_rate, max_err = _BUDGETS[name]
    n_clean = n_found = 0
    errs = []
    for (gray, w2c, R), gold in zip(scenes, golden):
        found = _run(degrade(gray), w2c, R)
        n_clean += len(gold)
        for tag_id in gold:
            if tag_id in found:
                n_found += 1
                errs.append(found[tag_id])
    rate = n_found / max(1, n_clean)
    assert rate >= min_rate, f"{name}: detection rate {rate:.2f} < {min_rate}"
    assert np.mean(errs) <= max_err, (
        f"{name}: mean keypoint err {np.mean(errs):.3f} px > {max_err}"
    )


def test_illumination_gradient_regression():
    """The specific failure mode of a global min/max-midpoint threshold: a
    strong brightness ramp pushes the dim half's white below the global
    midpoint, fusing the background into one giant dark component.  The
    adaptive tile threshold must still detect tags on both ends of the ramp."""
    gray, w2c, R = _scene(0)
    hard = _illumination(gray, lo=0.25)
    found = _run(hard, w2c, R)
    assert len(found) >= 1, "no tags under a 4:1 illumination ramp"
    assert min(found.values()) < 1.0
