"""Data layer: blender-format scene IO, calibration data, synthetic scenes."""

from mc_nerf_tpu.data.cube import tag_world_points  # noqa: F401
from mc_nerf_tpu.data.blender import Scene, SplitData, load_scene, load_split  # noqa: F401
