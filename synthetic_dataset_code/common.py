"""Shared machinery for the Blender dataset generators.

Offline tooling, run inside Blender (``blender -b -P Ball.py -- --obj lego``);
functional equivalent of the per-rig bpy scripts in the reference
(``synthetic_dataset_code/{Array,Ball,HalfBall,Room}.py``), emitting the
exact same on-disk format the framework consumes:

  * per-camera random horizontal FOV in [40, 80] deg;
  * 800x800 RGBA PNGs with transparent background;
  * ``transforms_{train,val,test}.json`` (c2w matrix + camera_angle_x);
  * 200 test views on a smooth orbit;
  * ``transforms_{coord,calib}.json``: the AprilTag cube rendered by the
    same cameras — canonical orientation for the coord set, per-image
    random orientation (re-rolled until >= 2 tags detected) for calib.

Cannot run in this repository's CI (no Blender); the numpy generator
(``mc_nerf_tpu/data/synthetic.py``) produces the same format for tests.
Tag bitmaps come from ``mc_nerf_tpu.data.tag36h11`` so renderer and
detector share one codeword table.
"""

from __future__ import annotations

import json
import math
import os
import random
import sys

import numpy as np

try:
    import bpy
    from mathutils import Euler, Matrix, Vector
except ImportError:  # imported outside Blender (e.g. by linters)
    bpy = None

# make the framework importable from inside Blender for the tag table
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

RESOLUTION = 800
FOV_RANGE_DEG = (40.0, 80.0)
N_TEST = 200
TAG_SIZE = 1.0


# --------------------------------------------------------------------- scene


def setup_renderer(resolution: int = RESOLUTION) -> None:
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.render.film_transparent = True
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    scene.render.resolution_x = resolution
    scene.render.resolution_y = resolution
    scene.render.resolution_percentage = 100


def clear_cameras() -> None:
    for obj in list(bpy.data.objects):
        if obj.type == "CAMERA":
            bpy.data.objects.remove(obj, do_unlink=True)


def add_camera(name: str, fov_rad: float):
    cam_data = bpy.data.cameras.new(name)
    cam_data.type = "PERSP"
    cam_data.lens_unit = "FOV"
    cam_data.angle = fov_rad
    cam = bpy.data.objects.new(name, cam_data)
    bpy.context.scene.collection.objects.link(cam)
    return cam


def look_at(cam, target=(0.0, 0.0, 0.0)) -> None:
    direction = Vector(target) - cam.location
    cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()


def listify(matrix) -> list:
    return [list(row) for row in matrix]


# ---------------------------------------------------------------- tag cube


def build_tag_cube(tag_size: float = TAG_SIZE):
    """Create the calibration cube with one tag36h11 texture per face.

    Face/tag geometry matches ``mc_nerf_tpu.data.cube`` exactly: the black
    square spans 0.8 x the face edge; canonical tag row 0 along the
    'lt' -> 'rt' edge of each face frame.
    """
    from mc_nerf_tpu.data.cube import face_frames
    from mc_nerf_tpu.data.tag36h11 import GRID, tag_bitmap

    bpy.ops.mesh.primitive_cube_add(size=tag_size, location=(0, 0, 0))
    cube = bpy.context.active_object
    cube.name = "calib_cube"

    # bake each face's texture: white margin + tag bitmap
    px = 512
    cell = int(px * 0.8 / GRID)
    margin = (px - cell * GRID) // 2
    for tag_id in range(6):
        img = bpy.data.images.new(f"tag_{tag_id}", px, px)
        bitmap = tag_bitmap(tag_id)
        buf = np.ones((px, px, 4), dtype=np.float32)
        for r in range(GRID):
            for c in range(GRID):
                v = float(bitmap[r, c])
                y0 = px - margin - (r + 1) * cell
                x0 = margin + c * cell
                buf[y0 : y0 + cell, x0 : x0 + cell, 0:3] = v
        img.pixels = buf.ravel().tolist()

        mat = bpy.data.materials.new(f"tag_mat_{tag_id}")
        mat.use_nodes = True
        bsdf = mat.node_tree.nodes["Principled BSDF"]
        tex = mat.node_tree.nodes.new("ShaderNodeTexImage")
        tex.image = img
        tex.interpolation = "Closest"
        mat.node_tree.links.new(bsdf.inputs["Base Color"], tex.outputs["Color"])
        bsdf.inputs["Roughness"].default_value = 1.0
        cube.data.materials.append(mat)

    # assign materials to faces by outward normal (ordering from face_frames)
    normals = [tuple(np.sign(f[0]).astype(int)) for f in face_frames()]
    for poly in cube.data.polygons:
        n = tuple(int(round(v)) for v in poly.normal)
        poly.material_index = normals.index(n)
    return cube


# ------------------------------------------------------------------ renders


def render_split(
    out_dir: str,
    split: str,
    cameras,
    hide=(),
    show=(),
) -> None:
    """Render one split and write its transforms json."""
    scene = bpy.context.scene
    for obj in hide:
        obj.hide_render = True
    for obj in show:
        obj.hide_render = False
    os.makedirs(os.path.join(out_dir, split), exist_ok=True)
    frames = []
    for i, cam in enumerate(cameras):
        scene.camera = cam
        rel = f"./{split}/r_{i}"
        scene.render.filepath = os.path.join(out_dir, rel + ".png")
        bpy.ops.render.render(write_still=True)
        frames.append(
            {
                "file_path": rel,
                "camera_angle_x": cam.data.angle_x,
                "transform_matrix": listify(cam.matrix_world),
            }
        )
    with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
        json.dump({"frames": frames}, f, indent=2)


def render_calibration(out_dir: str, cameras, scene_objects, rng: random.Random):
    """Coord set (canonical cube) + calib set (random cube orientation with
    a detection re-roll, mirroring ref Ball.py:246-313)."""
    cube = build_tag_cube()
    for obj in scene_objects:
        obj.hide_render = True

    # coord: canonical orientation, shared world frame
    cube.rotation_euler = Euler((0, 0, 0))
    render_split(out_dir, "coord", cameras)

    # calib: random orientation per image; validate with the C++ detector
    # when importable, else accept the draw (the training loader re-checks)
    try:
        from mc_nerf_tpu.native.apriltag_binding import detect_tags, rgb_to_gray
        from PIL import Image

        def n_detected(path):
            arr = np.asarray(Image.open(path).convert("RGB"))
            return len(detect_tags(rgb_to_gray(arr)))

    except Exception:
        n_detected = None

    scene = bpy.context.scene
    os.makedirs(os.path.join(out_dir, "calib"), exist_ok=True)
    frames = []
    for i, cam in enumerate(cameras):
        scene.camera = cam
        rel = f"./calib/r_{i}"
        path = os.path.join(out_dir, rel + ".png")
        for _attempt in range(50):
            cube.rotation_euler = Euler(
                (rng.uniform(0, 2 * math.pi) for _ in range(3))
            )
            scene.render.filepath = path
            bpy.ops.render.render(write_still=True)
            if n_detected is None or n_detected(path) >= 2:
                break
        frames.append(
            {
                "file_path": rel,
                "camera_angle_x": cam.data.angle_x,
                "transform_matrix": listify(cam.matrix_world),
            }
        )
    with open(os.path.join(out_dir, "transforms_calib.json"), "w") as f:
        json.dump({"frames": frames}, f, indent=2)

    bpy.data.objects.remove(cube, do_unlink=True)
    for obj in scene_objects:
        obj.hide_render = False


def orbit_positions(n: int, radius: float, elevation_deg: float):
    phi = math.radians(elevation_deg)
    for theta in np.linspace(0, 2 * math.pi, n, endpoint=False):
        yield (
            radius * math.cos(phi) * math.cos(theta),
            radius * math.cos(phi) * math.sin(theta),
            radius * math.sin(phi),
        )


def generate_dataset(out_dir: str, rig_cameras_fn, seed: int = 0) -> None:
    """Full pipeline: train/val/test renders + calibration sets.

    ``rig_cameras_fn(rng) -> (train_cams, val_cams, test_cams)`` builds the
    rig-specific camera layout.
    """
    rng = random.Random(seed)
    setup_renderer()
    clear_cameras()
    scene_objects = [o for o in bpy.data.objects if o.type == "MESH"]

    train_cams, val_cams, test_cams = rig_cameras_fn(rng)
    render_split(out_dir, "train", train_cams)
    render_split(out_dir, "val", val_cams)
    render_split(out_dir, "test", test_cams)
    render_calibration(out_dir, train_cams, scene_objects, rng)


def make_cams(prefix: str, positions, rng: random.Random):
    cams = []
    for i, pos in enumerate(positions):
        fov = math.radians(rng.uniform(*FOV_RANGE_DEG))
        cam = add_camera(f"{prefix}_{i}", fov)
        cam.location = pos
        look_at(cam)
        cams.append(cam)
    return cams
