"""Calibration-cube geometry: AprilTag keypoints in the cube frame.

The calibration cube carries one tag36h11 marker per face (tag ids 0-5).
Keypoints per tag are [center, lt, rt, rb, lb] — the order emitted by the
AprilTag detector and consumed by the reprojection losses (ref
``data/data_read.py:300-336``).  The tag spans 0.8 x the cube edge
(``tag_half = tag_size * 0.8 / 2``), the cube edge equals ``tag_size``
(yaml key ``apriltag.tag_size`` — "including white boundary").
"""

from __future__ import annotations

import numpy as np

# per-face frame: (outward normal, in-plane u axis, in-plane v axis).
# u/v are chosen so the keypoint table reproduces the reference's exactly:
# corner order [lt, rt, rb, lb] = [(-u,+v), (+u,+v), (+u,-v), (-u,-v)].
_FACES = (
    # tag 0: y = -c face
    (np.array([0.0, -1.0, 0.0]), np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),
    # tag 1: x = +c face
    (np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0])),
    # tag 2: y = +c face
    (np.array([0.0, 1.0, 0.0]), np.array([-1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),
    # tag 3: x = -c face
    (np.array([-1.0, 0.0, 0.0]), np.array([0.0, -1.0, 0.0]), np.array([0.0, 0.0, 1.0])),
    # tag 4: z = +c face
    (np.array([0.0, 0.0, 1.0]), np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])),
    # tag 5: z = -c face
    (np.array([0.0, 0.0, -1.0]), np.array([1.0, 0.0, 0.0]), np.array([0.0, -1.0, 0.0])),
)


def face_frames():
    """The six (normal, u, v) face frames; shared with the tag renderer."""
    return _FACES


def tag_world_points(tag_size: float = 1.0) -> np.ndarray:
    """Keypoints of all six tags in the cube frame.

    Returns:
      [6, 5, 3] float32: per tag id, [center, lt, rt, rb, lb], reproducing
      the reference's hand-written table (``data/data_read.py:300-336``).
    """
    cube_half = tag_size / 2.0
    tag_half = tag_size * 0.8 / 2.0
    pts = np.zeros((6, 5, 3), dtype=np.float32)
    for tag_id, (n, u, v) in enumerate(_FACES):
        center = n * cube_half
        pts[tag_id, 0] = center
        pts[tag_id, 1] = center + (-u + v) * tag_half   # lt
        pts[tag_id, 2] = center + (u + v) * tag_half    # rt
        pts[tag_id, 3] = center + (u - v) * tag_half    # rb
        pts[tag_id, 4] = center + (-u - v) * tag_half   # lb
    return pts
