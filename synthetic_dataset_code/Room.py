"""Room rig generator: 88 cameras on the walls of a 6 x 4 x 3 box.

    blender -b scene.blend -P Room.py -- --out ./dataset_Room/lego

Layout parity with the reference (``Room.py:18-29,171-363``): cameras
distributed over the four walls and ceiling of the room, all aimed at the
object at the room center.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import common

ROOM_X, ROOM_Y, ROOM_Z = 6.0, 4.0, 3.0
N_VAL = 10


def rig(rng):
    hx, hy, hz = ROOM_X / 2, ROOM_Y / 2, ROOM_Z / 2
    positions = []
    # 2x24 + 2x12 + 16 = the reference's 88 cameras (ref Room.py:18-29)
    # long walls (y = +-hy): 6 x 4 grids
    for x in np.linspace(-hx * 0.8, hx * 0.8, 6):
        for z in np.linspace(-hz * 0.6, hz * 0.8, 4):
            positions.append((float(x), -hy, float(z)))
            positions.append((float(x), hy, float(z)))
    # short walls (x = +-hx): 4 x 3 grids
    for y in np.linspace(-hy * 0.7, hy * 0.7, 4):
        for z in np.linspace(-hz * 0.5, hz * 0.8, 3):
            positions.append((-hx, float(y), float(z)))
            positions.append((hx, float(y), float(z)))
    # ceiling: 4 x 4
    for x in np.linspace(-hx * 0.6, hx * 0.6, 4):
        for y in np.linspace(-hy * 0.6, hy * 0.6, 4):
            positions.append((float(x), float(y), hz))
    positions = positions[:88]
    train = common.make_cams("train", positions, rng)
    val = common.make_cams(
        "val", list(common.orbit_positions(N_VAL, min(hx, hy) * 0.9, 20.0)), rng
    )
    test = common.make_cams(
        "test", list(common.orbit_positions(common.N_TEST, min(hx, hy) * 0.9, 15.0)), rng
    )
    return train, val, test


if __name__ == "__main__":
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    common.generate_dataset(args.out, rig, seed=args.seed)
