"""Camera rigs of the synthetic generator — parity with the reference's four
dataset styles (Array/Ball/HalfBall/Room, SURVEY.md §2.1 #18)."""

import os

import numpy as np
import pytest

from mc_nerf_tpu.data.blender import load_scene
from mc_nerf_tpu.data.synthetic import RIGS, make_dataset


@pytest.mark.parametrize("rig", sorted(RIGS))
def test_rig_geometry(rig):
    n = 24
    c2w, fov = RIGS[rig](n, rng=np.random.default_rng(1))
    assert c2w.shape == (n, 4, 4) and fov.shape == (n,)
    assert np.all((fov > np.deg2rad(35)) & (fov < np.deg2rad(85)))
    for m in c2w:
        # orthonormal rotation
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        # camera -Z axis (blender forward) points at the origin
        fwd = -r[:, 2]
        to_origin = -m[:3, 3] / np.linalg.norm(m[:3, 3])
        np.testing.assert_allclose(fwd, to_origin, atol=1e-6)


def test_rig_positions_match_style():
    c2w, _ = RIGS["array"](16, rng=np.random.default_rng(0))
    np.testing.assert_allclose(c2w[:, 2, 3], -4.0)       # planar at z=-4
    c2w, _ = RIGS["halfball"](20, rng=np.random.default_rng(0))
    assert np.all(c2w[:, 2, 3] > 0)                      # upper hemisphere
    r = np.linalg.norm(c2w[:, :3, 3], axis=1)
    np.testing.assert_allclose(r, 3.0, rtol=1e-6)
    c2w, _ = RIGS["room"](30, rng=np.random.default_rng(0))
    on_wall = (
        (np.abs(np.abs(c2w[:, 0, 3]) - 3.0) < 1e-9)
        | (np.abs(np.abs(c2w[:, 1, 3]) - 2.0) < 1e-9)
        | (np.abs(c2w[:, 2, 3] - 1.5) < 1e-9)
    )
    assert on_wall.all()


def test_make_dataset_with_rig(tmp_path):
    d = os.path.join(str(tmp_path), "Array_Tiny")
    make_dataset(d, n_train=6, n_val=1, n_test=1, img_h=16, img_w=16,
                 seed=2, rig="array")
    scene = load_scene(d)
    assert scene.train.count == 6
    assert os.path.exists(os.path.join(d, "calibration_cache.npz"))
