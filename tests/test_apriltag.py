"""C++ tag36h11 detector vs the numpy renderer: round-trip golden tests."""

import numpy as np
import pytest

from mc_nerf_tpu.data.cube import tag_world_points
from mc_nerf_tpu.data.cube_render import render_cube_image
from mc_nerf_tpu.data.synthetic import (
    _blender_to_w2c_np,
    _look_at_c2w,
    _random_rotation,
)
from mc_nerf_tpu.data.tag36h11 import TAG36H11_CODES, decode_bits, tag_bitmap
from mc_nerf_tpu.native.apriltag_binding import detect_tags, detector_available, rgb_to_gray

pytestmark = pytest.mark.skipif(
    not detector_available(), reason="C++ detector failed to build"
)


def _project(pts_w, K, w2c):
    cam = pts_w @ w2c[:, :3].T + w2c[:, 3]
    pix = cam @ K.T
    return pix[:, :2] / pix[:, 2:3]


def test_bitmap_layout():
    bm = tag_bitmap(0)
    assert bm.shape == (8, 8)
    # border ring is black
    assert bm[0].sum() == 0 and bm[-1].sum() == 0
    assert bm[:, 0].sum() == 0 and bm[:, -1].sum() == 0
    # data bits reproduce the codeword MSB-first
    code = 0
    for r in range(6):
        for c in range(6):
            code = (code << 1) | int(bm[r + 1, c + 1])
    assert code == TAG36H11_CODES[0]


def test_decode_bits_all_rotations():
    for tag_id in range(6):
        bits = tag_bitmap(tag_id)[1:-1, 1:-1].astype(int)
        for k in range(4):
            rotated = np.rot90(bits, -k)  # rotate CW k times
            got_id, got_k = decode_bits(rotated)
            assert got_id == tag_id
            assert got_k == k


def test_detect_front_view():
    c2w = _look_at_c2w(np.array([0.2, -3.0, 0.3]), np.zeros(3))
    w2c = _blender_to_w2c_np(c2w)
    K = np.array([[400.0, 0, 200], [0, 400.0, 200], [0, 0, 1]])
    rgba = render_cube_image(w2c, K, 400, 400, supersample=2)
    img = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    dets = detect_tags(rgb_to_gray(img))
    ids = {d.tag_id for d in dets}
    assert 0 in ids  # the y=-c face is front and center
    pts = tag_world_points(1.0)
    for d in dets:
        gt = _project(pts[d.tag_id], K, w2c)
        err = np.abs(gt - d.keypoints).max()
        assert err < 0.5, f"tag {d.tag_id}: keypoint err {err:.3f} px"


def test_detect_rotated_cube_subpixel():
    rng = np.random.default_rng(1)
    pts = tag_world_points(1.0)
    K = np.array([[500.0, 0, 160], [0, 500.0, 160], [0, 0, 1]])
    total, errs = 0, []
    for trial in range(4):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        w2c = _blender_to_w2c_np(_look_at_c2w(v * 3.2, np.zeros(3)))
        R_cube = _random_rotation(rng)
        rgba = render_cube_image(w2c, K, 320, 320, cube_rot=R_cube, supersample=3)
        img = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
        for d in detect_tags(rgb_to_gray(img)):
            total += 1
            gt = _project(pts[d.tag_id] @ R_cube.T, K, w2c)
            errs.append(np.abs(gt - d.keypoints).max())
    assert total >= 4
    assert np.mean(errs) < 0.3, f"mean keypoint err {np.mean(errs):.3f} px"
    assert np.max(errs) < 1.0


def test_degenerate_tile_grids_no_crash():
    """Images 8..16 px in one dimension pass the h,w >= 8 guard but give a
    one-tile-wide/tall threshold grid; ThreshMap::at used to bilinear-index
    one tile past the buffer (heap over-read, advisor r4 — verified with an
    ASAN build).  Drive quads through subpixel refinement on every
    degenerate shape; the contract is simply no crash / sane output."""
    rng = np.random.default_rng(0)
    for shape in [(12, 300), (300, 12), (9, 120), (15, 200), (12, 12)]:
        g = np.full(shape, 255, np.uint8)
        h, w = shape
        for x0 in range(1, w - 9, 20):
            g[1 : min(h - 1, 9), x0 : x0 + 8] = 0
        dets = detect_tags(g)
        assert isinstance(dets, list)
        noise = rng.integers(0, 256, shape, dtype=np.uint8)
        assert isinstance(detect_tags(noise), list)


def test_detect_very_large_tag():
    """A close-range tag whose black border band is wider than the 3x3-tile
    (48 px) contrast window: the border ring crosses contrast-free tiles,
    which must count as dark-valid (uniform black interior) or the ring
    splits into arcs and the tag is lost (advisor r4).  512 px span ->
    64 px band."""
    for scale in (48, 64):  # 384 / 512 px spans
        bm = tag_bitmap(3).astype(np.uint8)
        tag = np.kron(bm * 255, np.ones((scale, scale), np.uint8))
        m = 60
        img = np.full((tag.shape[0] + 2 * m, tag.shape[1] + 2 * m), 255,
                      np.uint8)
        img[m : m + tag.shape[0], m : m + tag.shape[1]] = tag
        dets = detect_tags(img)
        assert [d.tag_id for d in dets] == [3], f"span {8*scale}px"
        want = np.array(
            [[m, m], [m + 8 * scale, m], [m + 8 * scale, m + 8 * scale],
             [m, m + 8 * scale]], np.float64)
        assert np.abs(dets[0].corners - want).max() < 1.5


def test_no_false_positives_on_blank():
    img = np.full((200, 200), 255, np.uint8)
    assert detect_tags(img) == []
    noise = (np.random.default_rng(0).uniform(100, 255, (200, 200))).astype(np.uint8)
    assert len(detect_tags(noise)) == 0
