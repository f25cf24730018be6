"""Native (C++) components and their ctypes bindings.

No pybind11 in this image, so bindings go through a C ABI + ctypes.  The
shared library is built on demand with g++ (cached next to the source,
rebuilt when the source is newer).
"""

from mc_nerf_tpu.native.apriltag_binding import detect_tags, detector_available  # noqa: F401
