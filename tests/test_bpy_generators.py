"""Headless smoke tests for the Blender dataset generators.

Blender is not installed in CI, so ``tests/mock_bpy.py`` stands in for
``bpy``/``mathutils`` (real look-at math, placeholder renders).  This
exercises the generators' camera-trajectory and JSON/transforms logic —
the parts the framework's data loader actually depends on (ref output
format: ``/root/reference/synthetic_dataset_code/Ball.py:42-105``).
"""

import importlib
import json
import math
import os
import random
import sys

import numpy as np
import pytest

_GEN_DIR = os.path.join(os.path.dirname(__file__), "..", "synthetic_dataset_code")


@pytest.fixture()
def gen_modules(monkeypatch):
    """Mock bpy installed + fresh imports of common and the rig scripts."""
    from tests import mock_bpy

    monkeypatch.syspath_prepend(_GEN_DIR)
    for name in ("bpy", "mathutils", "common", "Ball", "Array", "HalfBall", "Room"):
        sys.modules.pop(name, None)
    mock_bpy.install()
    common = importlib.import_module("common")
    rigs = {
        name: importlib.import_module(name)
        for name in ("Ball", "Array", "HalfBall", "Room")
    }
    yield common, rigs
    for name in ("bpy", "mathutils", "common", "Ball", "Array", "HalfBall", "Room"):
        sys.modules.pop(name, None)


def _check_transforms(path, n_frames, img_dir):
    with open(path) as f:
        data = json.load(f)
    assert len(data["frames"]) == n_frames
    for fr in data["frames"]:
        assert set(fr) == {"file_path", "camera_angle_x", "transform_matrix"}
        fov = fr["camera_angle_x"]
        assert math.radians(40) - 1e-9 <= fov <= math.radians(80) + 1e-9
        m = np.asarray(fr["transform_matrix"])
        assert m.shape == (4, 4)
        np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-12)
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)  # rotation
        if img_dir is not None:
            assert os.path.exists(
                os.path.join(img_dir, fr["file_path"] + ".png")
            ), fr["file_path"]
    return data["frames"]


def test_generate_dataset_end_to_end(gen_modules, tmp_path):
    """Full pipeline on a tiny rig: 5 transforms JSONs in the reference
    schema, placeholder renders on disk, c2w translation == camera pos."""
    common, _ = gen_modules
    out = str(tmp_path / "ds")
    positions = [(3.0, 0.0, 1.0), (0.0, 3.0, -1.0), (-3.0, 0.0, 0.5)]

    def tiny_rig(rng):
        train = common.make_cams("train", positions, rng)
        val = common.make_cams("val", [(0.0, -3.0, 1.0)], rng)
        test = common.make_cams(
            "test", list(common.orbit_positions(4, 3.0, 20.0)), rng
        )
        return train, val, test

    common.generate_dataset(out, tiny_rig, seed=7)

    frames = _check_transforms(
        os.path.join(out, "transforms_train.json"), 3, out
    )
    # look-at geometry survives into the json: c2w translation = position,
    # and the camera's -Z axis points at the origin
    for fr, pos in zip(frames, positions):
        m = np.asarray(fr["transform_matrix"])
        np.testing.assert_allclose(m[:3, 3], pos, atol=1e-9)
        fwd = -m[:3, 2]                       # camera -Z in world coords
        to_origin = -m[:3, 3] / np.linalg.norm(m[:3, 3])
        np.testing.assert_allclose(fwd, to_origin, atol=1e-9)

    _check_transforms(os.path.join(out, "transforms_val.json"), 1, out)
    _check_transforms(os.path.join(out, "transforms_test.json"), 4, out)
    # calibration sets: rendered by the train cameras
    _check_transforms(os.path.join(out, "transforms_coord.json"), 3, out)
    _check_transforms(os.path.join(out, "transforms_calib.json"), 3, out)


@pytest.mark.parametrize(
    "name,n_train",
    [("Ball", 110), ("Array", 100), ("HalfBall", 100), ("Room", 88)],
)
def test_rig_camera_layouts(gen_modules, name, n_train):
    """Per-rig camera counts match the reference rigs
    (``/root/reference/synthetic_dataset_code/{Array,Ball,HalfBall,Room}.py:18-29``)."""
    common, rigs = gen_modules
    train, val, test = rigs[name].rig(random.Random(0))
    assert len(train) == n_train
    assert len(val) == 10
    assert len(test) == common.N_TEST
    for cam in train:
        assert math.radians(40) <= cam.data.angle <= math.radians(80)

    pos = np.asarray([tuple(c.location) for c in train])
    if name == "Ball":
        np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 3.0, atol=1e-6)
    if name == "HalfBall":
        np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 3.0, atol=1e-6)
        assert (pos[:, 2] >= -1e-9).all()     # upper hemisphere only
    if name == "Array":
        assert np.unique(pos[:, 2]).size == 1  # planar grid
    if name == "Room":
        # every camera sits on one of the 5 box surfaces (4 walls + ceiling)
        hx, hy = np.max(np.abs(pos[:, 0])), np.max(np.abs(pos[:, 1]))
        hz = np.max(pos[:, 2])
        on_wall = (
            (np.abs(np.abs(pos[:, 0]) - hx) < 1e-6)
            | (np.abs(np.abs(pos[:, 1]) - hy) < 1e-6)
            | (np.abs(pos[:, 2] - hz) < 1e-6)
        )
        assert on_wall.all()
