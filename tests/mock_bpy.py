"""Minimal headless stand-ins for ``bpy`` / ``mathutils``.

Lets the Blender dataset generators (``synthetic_dataset_code/``) run in CI
with no Blender: camera/scene objects are plain Python, ``look_at`` math is
real (matrix_world is a faithful c2w look-at matrix, so tests can assert
trajectory geometry), and ``bpy.ops.render.render`` writes a tiny
placeholder PNG so the file/JSON plumbing runs end to end.

Install with :func:`install` BEFORE importing ``common`` or a rig script —
``common.py`` binds ``bpy`` at import time.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np


# ----------------------------------------------------------------- mathutils


class Vector:
    def __init__(self, xyz):
        self.v = np.asarray(tuple(xyz), dtype=np.float64)

    def __sub__(self, other):
        o = other.v if isinstance(other, Vector) else np.asarray(other, np.float64)
        return Vector(self.v - o)

    def __iter__(self):
        return iter(self.v.tolist())

    def to_track_quat(self, track: str, up: str):
        """Rotation aligning the object's ``track`` axis with this vector
        (camera convention: track='-Z', up='Y' — a standard look-at)."""
        assert track == "-Z" and up == "Y", (track, up)
        d = self.v / (np.linalg.norm(self.v) + 1e-12)
        z_cam = -d                                   # object -Z points along d
        world_up = np.array([0.0, 0.0, 1.0])
        if abs(np.dot(world_up, z_cam)) > 0.999:     # degenerate: looking straight up/down
            world_up = np.array([0.0, 1.0, 0.0])
        x_cam = np.cross(world_up, z_cam)
        x_cam = x_cam / (np.linalg.norm(x_cam) + 1e-12)
        y_cam = np.cross(z_cam, x_cam)
        return _TrackQuat(np.stack([x_cam, y_cam, z_cam], axis=1))  # world<-cam


class _TrackQuat:
    def __init__(self, rot):
        self.rot = rot

    def to_euler(self):
        return Euler.from_matrix(self.rot)


class Euler:
    """Either plain XYZ angles or a wrapped rotation matrix (look_at path)."""

    def __init__(self, angles=(0.0, 0.0, 0.0)):
        self.angles = tuple(angles)
        self._rot = None

    @classmethod
    def from_matrix(cls, rot):
        e = cls()
        e._rot = rot
        return e

    @property
    def rot(self):
        if self._rot is not None:
            return self._rot
        ax, ay, az = self.angles
        cx, sx = math.cos(ax), math.sin(ax)
        cy, sy = math.cos(ay), math.sin(ay)
        cz, sz = math.cos(az), math.sin(az)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rz @ ry @ rx                          # Blender XYZ order


class Matrix:
    pass


# ----------------------------------------------------------------------- bpy


class _Namespace(types.SimpleNamespace):
    pass


class _CamData:
    def __init__(self, name):
        self.name = name
        self.type = "PERSP"
        self.lens_unit = "FOV"
        self.angle = 0.0

    @property
    def angle_x(self):
        # square sensor: horizontal FOV == angle (Blender: angle tracks the
        # larger sensor fit; resolutions here are square)
        return self.angle


class _NodeSocket:
    def __init__(self):
        self.default_value = None


class _Node:
    def __init__(self):
        self.inputs = {"Base Color": _NodeSocket(), "Roughness": _NodeSocket()}
        self.outputs = {"Color": _NodeSocket()}
        self.image = None
        self.interpolation = None


class _Nodes(dict):
    def new(self, kind):
        n = _Node()
        self[kind] = n
        return n


class _NodeTree:
    def __init__(self):
        self.nodes = _Nodes({"Principled BSDF": _Node()})
        self.links = _Namespace(new=lambda a, b: None)


class _Material:
    def __init__(self, name):
        self.name = name
        self.use_nodes = False
        self.node_tree = _NodeTree()


class _Image:
    def __init__(self, name, w, h):
        self.name = name
        self.size = (w, h)
        self.pixels = []


class _Polygon:
    def __init__(self, normal):
        self.normal = Vector(normal)
        self.material_index = 0


class _MeshData:
    def __init__(self):
        self.materials = _ListWithAppend()
        self.polygons = [
            _Polygon(n)
            for n in ((0, -1, 0), (1, 0, 0), (0, 1, 0), (-1, 0, 0),
                      (0, 0, 1), (0, 0, -1))
        ]


class _ListWithAppend(list):
    pass


class _Object:
    def __init__(self, name, data):
        self.name = name
        self.data = data
        self.type = "CAMERA" if isinstance(data, _CamData) else "MESH"
        self.location = (0.0, 0.0, 0.0)
        self.rotation_euler = Euler()
        self.hide_render = False

    @property
    def matrix_world(self):
        rot = self.rotation_euler.rot
        loc = np.asarray(self.location, np.float64)
        m = np.eye(4)
        m[:3, :3] = rot
        m[:3, 3] = loc
        return [[float(v) for v in row] for row in m]


class _Collection:
    def __init__(self, objects):
        self._objects = objects

    def new(self, *a):
        raise NotImplementedError

    @property
    def objects(self):
        return _Namespace(link=lambda obj: None)


class _ObjectStore(list):
    def new(self, name, data):
        obj = _Object(name, data)
        self.append(obj)
        return obj

    def remove(self, obj, do_unlink=False):
        if obj in self:
            super().remove(obj)


class _Factory:
    def __init__(self, cls, store):
        self._cls = cls
        self._store = store

    def new(self, *args):
        item = self._cls(*args)
        self._store.append(item)
        return item


def _make_render_png(path):
    from PIL import Image as PILImage

    PILImage.new("RGBA", (16, 16), (255, 255, 255, 0)).save(path)


def install(render_fn=_make_render_png):
    """Register mock ``bpy``/``mathutils`` in sys.modules; returns the bpy
    mock.  ``render_fn(filepath)`` is called per render."""
    bpy = types.ModuleType("bpy")

    objects = _ObjectStore()
    render = _Namespace(
        engine="", film_transparent=False, filepath="",
        image_settings=_Namespace(file_format="", color_mode=""),
        resolution_x=0, resolution_y=0, resolution_percentage=0,
    )
    scene = _Namespace(
        render=render, camera=None, collection=_Collection(objects)
    )
    bpy.context = _Namespace(scene=scene, active_object=None)
    bpy.data = _Namespace(
        objects=objects,
        cameras=_Factory(_CamData, []),
        images=_Factory(_Image, []),
        materials=_Factory(_Material, []),
    )

    def primitive_cube_add(size=1.0, location=(0, 0, 0)):
        cube = objects.new("Cube", _MeshData())
        cube.location = location
        bpy.context.active_object = cube

    def do_render(write_still=False):
        if write_still:
            render_fn(scene.render.filepath)

    bpy.ops = _Namespace(
        mesh=_Namespace(primitive_cube_add=primitive_cube_add),
        render=_Namespace(render=do_render),
    )

    mathutils = types.ModuleType("mathutils")
    mathutils.Vector = Vector
    mathutils.Euler = Euler
    mathutils.Matrix = Matrix

    sys.modules["bpy"] = bpy
    sys.modules["mathutils"] = mathutils
    return bpy
