"""Ball rig generator: 110 cameras on a sphere of radius 3.

Run inside Blender with the scene object loaded:
    blender -b scene.blend -P Ball.py -- --out ./dataset_Ball/lego --seed 42

Layout parity with the reference (``Ball.py:17-24,163-224``): 12 azimuth x 9
elevation bands + 2 polar cameras, per-camera random FOV in [40, 80] deg,
200 test views on a smooth orbit.
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

import common

RADIUS = 3.0
N_AZIMUTH = 12
N_ELEVATION = 9
N_VAL = 10


def rig(rng):
    positions = []
    for el in np.linspace(-60, 60, N_ELEVATION):
        for az in np.linspace(0, 360, N_AZIMUTH, endpoint=False):
            phi, theta = math.radians(el), math.radians(az)
            positions.append(
                (
                    RADIUS * math.cos(phi) * math.cos(theta),
                    RADIUS * math.cos(phi) * math.sin(theta),
                    RADIUS * math.sin(phi),
                )
            )
    positions.append((0.0, 0.0, RADIUS))    # poles
    positions.append((0.0, 0.0, -RADIUS))
    train = common.make_cams("train", positions, rng)
    val = common.make_cams(
        "val", list(common.orbit_positions(N_VAL, RADIUS, 35.0)), rng
    )
    test = common.make_cams(
        "test", list(common.orbit_positions(common.N_TEST, RADIUS, 20.0)), rng
    )
    return train, val, test


if __name__ == "__main__":
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    common.generate_dataset(args.out, rig, seed=args.seed)
