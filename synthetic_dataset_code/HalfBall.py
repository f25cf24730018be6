"""HalfBall rig generator: 100 cameras on the upper hemisphere, radius 3.

    blender -b scene.blend -P HalfBall.py -- --out ./dataset_HalfBall/lego

Layout parity with the reference (``HalfBall.py:18-23,162-215``).
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np

import common

RADIUS = 3.0
N_AZIMUTH = 12
N_ELEVATION = 8
N_VAL = 10


def rig(rng):
    positions = []
    for el in np.linspace(5, 70, N_ELEVATION):
        for az in np.linspace(0, 360, N_AZIMUTH, endpoint=False):
            phi, theta = math.radians(el), math.radians(az)
            positions.append(
                (
                    RADIUS * math.cos(phi) * math.cos(theta),
                    RADIUS * math.cos(phi) * math.sin(theta),
                    RADIUS * math.sin(phi),
                )
            )
    positions.append((0.0, 0.0, RADIUS))
    # top up to the reference's 100 cameras (its layout is fully random,
    # ref HalfBall.py:166-178) with random high-elevation draws
    while len(positions) < 100:
        phi = math.radians(rng.uniform(70.0, 85.0))
        theta = math.radians(rng.uniform(0.0, 360.0))
        positions.append(
            (
                RADIUS * math.cos(phi) * math.cos(theta),
                RADIUS * math.cos(phi) * math.sin(theta),
                RADIUS * math.sin(phi),
            )
        )
    positions = positions[:100]
    train = common.make_cams("train", positions, rng)
    val = common.make_cams(
        "val", list(common.orbit_positions(N_VAL, RADIUS, 40.0)), rng
    )
    test = common.make_cams(
        "test", list(common.orbit_positions(common.N_TEST, RADIUS, 25.0)), rng
    )
    return train, val, test


if __name__ == "__main__":
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    common.generate_dataset(args.out, rig, seed=args.seed)
