"""Array rig generator: 10 x 10 planar camera grid at z = -4.

    blender -b scene.blend -P Array.py -- --out ./dataset_Array/lego

Layout parity with the reference (``Array.py:21-28,169-224``): a 10x10 grid
spanning [-2, 2]^2 in front of the object, all cameras aimed at the origin.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import common

GRID_N = 10
GRID_SPAN = 2.0
PLANE_Z = -4.0
N_VAL = 10


def rig(rng):
    positions = []
    for y in np.linspace(-GRID_SPAN, GRID_SPAN, GRID_N):
        for x in np.linspace(-GRID_SPAN, GRID_SPAN, GRID_N):
            positions.append((float(x), float(y), PLANE_Z))
    train = common.make_cams("train", positions, rng)
    val = common.make_cams(
        "val", list(common.orbit_positions(N_VAL, 4.0, -30.0)), rng
    )
    test = common.make_cams(
        "test", list(common.orbit_positions(common.N_TEST, 4.0, -20.0)), rng
    )
    return train, val, test


if __name__ == "__main__":
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    common.generate_dataset(args.out, rig, seed=args.seed)
