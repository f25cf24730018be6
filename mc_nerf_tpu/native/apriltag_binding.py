"""ctypes binding + on-demand build for the C++ tag36h11 detector.

Replaces the reference's ``apriltag`` pip package (C libapriltag binding,
ref ``data/data_read.py:7,181-187``).  Detection output matches the
reference's consumption format: per tag, (tag_id, center, corners
[lt, rt, rb, lb]) — see ``apriltag/detector.cpp``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading
from typing import List, NamedTuple, Optional

import numpy as np

from mc_nerf_tpu.data.tag36h11 import TAG36H11_CODES

_SRC_DIR = os.path.join(os.path.dirname(__file__), "apriltag")
_SRC = os.path.join(_SRC_DIR, "detector.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _lib_path() -> str:
    """Build artifact keyed on source content hash + platform tag, so a stale
    or foreign-arch binary is never dlopened (the .so is not in VCS)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    tag = f"{platform.system()}-{platform.machine()}".lower()
    return os.path.join(_SRC_DIR, f"libmcn_apriltag-{tag}-{digest}.so")


class TagDetection(NamedTuple):
    tag_id: int
    center: np.ndarray    # [2] (x, y)
    corners: np.ndarray   # [4, 2] lt, rt, rb, lb

    @property
    def keypoints(self) -> np.ndarray:
        """[5, 2]: center + corners — the layout the losses consume."""
        return np.concatenate([self.center[None], self.corners], axis=0)


def _build(lib_path: str) -> None:
    tmp = lib_path + ".tmp"
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", tmp, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib_path)  # atomic: concurrent builders race safely


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib_path = _lib_path()
        if not os.path.exists(lib_path):
            _build(lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.mcn_detect_tags.restype = ctypes.c_int
        lib.mcn_detect_tags.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return lib


def detector_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def detect_tags(
    gray: np.ndarray,
    max_hamming: int = 1,
    max_detections: int = 32,
) -> List[TagDetection]:
    """Detect tag36h11 markers in a grayscale uint8 image.

    Args:
      gray: [H, W] uint8 (use ``rgb_to_gray`` for color input).

    Returns:
      list of :class:`TagDetection`, corner order [lt, rt, rb, lb] in the
      tag's canonical frame.
    """
    lib = _load()
    gray = np.ascontiguousarray(gray, dtype=np.uint8)
    assert gray.ndim == 2, "expected a grayscale [H, W] image"
    h, w = gray.shape
    codes = np.asarray(TAG36H11_CODES, dtype=np.uint64)
    out = np.zeros((max_detections, 11), dtype=np.float32)
    n = lib.mcn_detect_tags(
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(codes),
        max_hamming,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_detections,
    )
    dets = []
    for i in range(n):
        row = out[i]
        dets.append(
            TagDetection(
                tag_id=int(row[0]),
                center=row[1:3].copy(),
                corners=row[3:11].reshape(4, 2).copy(),
            )
        )
    return dets


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8/float -> [H, W] uint8 (ITU-R 601 luma, like cv2)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    g = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return np.clip(g + 0.5, 0, 255).astype(np.uint8)
