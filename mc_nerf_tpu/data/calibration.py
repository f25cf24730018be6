"""Calibration detections: cache IO and on-device per-step tag sampling.

The reference detects AprilTags once at startup (``data/data_read.py:171-214``)
and pre-materializes 50 epochs' worth of per-step random tag choices on the
host (``:217-243``).  Here detections live in a fixed-shape cache
(``calibration_cache.npz``: pts [N, 6, 5, 2], valid [N, 6]) — produced either
by the C++ tag36h11 detector (``mc_nerf_tpu.native``) or analytically for
synthetic scenes — and the per-step "one random visible tag per camera"
choice happens on device with a PRNG key, so calibration batches are
generated inside the jitted train step with zero host traffic.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.data.cube import tag_world_points

CACHE_NAME = "calibration_cache.npz"


class CalibrationData(NamedTuple):
    """Device-resident calibration tensors for one scene (a pytree, so it
    can be passed straight into jitted train steps)."""

    calib_pts: jnp.ndarray     # [N, 6, 5, 2] detected keypoints (calib set)
    coord_pts: jnp.ndarray     # [N, 6, 5, 2] detected keypoints (coord set)
    # valid tag ids per image, padded by repeating the first valid id:
    calib_tag_ids: jnp.ndarray  # [N, 6] int32
    coord_tag_ids: jnp.ndarray  # [N, 6] int32
    calib_counts: jnp.ndarray   # [N] int32 number of valid tags
    coord_counts: jnp.ndarray   # [N] int32
    cube_pts: jnp.ndarray       # [6, 5, 3] tag keypoints in the cube frame


def _pad_valid_ids(valid: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, 6] bool -> ([N, 6] padded valid tag ids, [N] counts)."""
    n = valid.shape[0]
    ids = np.zeros((n, 6), dtype=np.int32)
    counts = np.zeros((n,), dtype=np.int32)
    for i in range(n):
        v = np.flatnonzero(valid[i])
        if len(v) == 0:
            raise ValueError(
                f"image {i} has no detected tags — invalid calibration data "
                "(the reference aborts here too, data_read.py:208-212)"
            )
        counts[i] = len(v)
        ids[i] = np.concatenate([v, np.full(6 - len(v), v[0])])
    return ids, counts


def load_calibration(scene_dir: str, tag_size: float = 1.0) -> CalibrationData:
    """Load the detection cache and stage it as device arrays."""
    cache = np.load(os.path.join(scene_dir, CACHE_NAME))
    calib_ids, calib_counts = _pad_valid_ids(cache["calib_valid"])
    coord_ids, coord_counts = _pad_valid_ids(cache["coord_valid"])
    ts = float(cache["tag_size"]) if "tag_size" in cache else tag_size
    return CalibrationData(
        calib_pts=jnp.asarray(cache["calib_pts"]),
        coord_pts=jnp.asarray(cache["coord_pts"]),
        calib_tag_ids=jnp.asarray(calib_ids),
        coord_tag_ids=jnp.asarray(coord_ids),
        calib_counts=jnp.asarray(calib_counts),
        coord_counts=jnp.asarray(coord_counts),
        cube_pts=jnp.asarray(tag_world_points(ts)),
    )


def build_calibration_cache(scene_dir: str, overwrite: bool = False) -> str:
    """Run the C++ tag36h11 detector over the calib/coord images and write
    the fixed-shape detection cache.

    This is the real-data path (the reference runs libapriltag at startup,
    ``data/data_read.py:171-214``); synthetic scenes may instead ship an
    analytic cache.  Aborts if any image has zero detections, like the
    reference (``:208-212``).
    """
    out_path = os.path.join(scene_dir, CACHE_NAME)
    if os.path.exists(out_path) and not overwrite:
        return out_path

    from mc_nerf_tpu.data.blender import load_split
    from mc_nerf_tpu.native.apriltag_binding import detect_tags, rgb_to_gray

    arrays = {}
    for split in ("calib", "coord"):
        data = load_split(scene_dir, split, load_images=True, with_poses=False)
        n = data.count
        pts = np.zeros((n, 6, 5, 2), dtype=np.float32)
        valid = np.zeros((n, 6), dtype=bool)
        for i in range(n):
            dets = detect_tags(rgb_to_gray(data.images_u8[i]))
            if not dets:
                raise ValueError(
                    f"no tags detected in {split} image {i} — invalid "
                    "calibration data (reference aborts here too)"
                )
            for d in dets:
                if 0 <= d.tag_id < 6:
                    pts[i, d.tag_id] = d.keypoints
                    valid[i, d.tag_id] = True
        arrays[f"{split}_pts"] = pts
        arrays[f"{split}_valid"] = valid
    np.savez(out_path, tag_size=np.float32(1.0), **arrays)
    return out_path


def sample_tags(
    key: jax.Array,
    pts: jnp.ndarray,
    tag_ids: jnp.ndarray,
    counts: jnp.ndarray,
    cube_pts: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick one random visible tag per camera (on device).

    Equivalent in distribution to the reference's host-side
    ``random.randint(0, len(tags)-1)`` per image per step
    (``data/data_read.py:226``).

    Args:
      key: PRNG key for this step.
      pts: [N, 6, 5, 2] detections.
      tag_ids / counts: padded valid ids + counts from the cache.
      cube_pts: [6, 5, 3] tag keypoints in the cube frame.

    Returns:
      (world_pts [N, 5, 3], pixel_pts [N, 5, 2]) for the chosen tags.
    """
    n = pts.shape[0]
    u = jax.random.uniform(key, (n,))
    slot = jnp.minimum((u * counts).astype(jnp.int32), counts - 1)
    chosen = jnp.take_along_axis(tag_ids, slot[:, None], axis=1)[:, 0]   # [N]
    pix = jnp.take_along_axis(pts, chosen[:, None, None, None], axis=1)[:, 0]
    world = cube_pts[chosen]
    return world, pix
