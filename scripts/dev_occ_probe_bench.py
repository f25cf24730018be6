"""Dev: microbench occupancy-probe layouts on the live chip.

The probe's row gather is the train step's largest single HBM op
([R, P, G] rows — 57 MB/step at reference scale after the bf16 map,
BASELINE.md round 3).  Three candidate layouts for the binary map:

  * bf16 rows  [G*G, G]      (current): 2 B/cell rows, lane one-hot reduce
  * int8 rows  [G*G, G]      : same shape, half the gather traffic
  * bitpack    [G*G, G//32]  : int32 z-bitmask words, 16 B/row gathers +
                               shift/mask lane resolve — 16x less traffic,
                               but tiny rows may hit the slow scalar-gather
                               path instead of the vectorized embedding path

All three are exact (values are {0,1}).  This decides which layout the real
:func:`mc_nerf_tpu.ops.occupancy.probe_occupancy` should use; the winner is
adopted only on a full-step A/B (scripts/dev_train_bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R, P, G = 7000, 64, 128
LO, HI = -4.0, 4.0
N_ITERS = 50


def probe_rows(occ2d, x):
    """Current layout: row gather + one-hot lane reduce (any row dtype)."""
    g = occ2d.shape[-1]
    u = (x - LO) / (HI - LO) * g
    idx = jnp.floor(u).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    rows = jnp.take(occ2d, idx[..., 0] * g + idx[..., 1], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
    zero = jnp.zeros((), rows.dtype)
    val = jnp.sum(jnp.where(lane == idx[..., 2:3], rows, zero), axis=-1)
    return val.astype(jnp.float32) * inb.astype(jnp.float32)


def probe_bits(bits, x, g=G):
    """Bit-packed layout: [G*G, G//32] int32 words, shift/mask resolve."""
    u = (x - LO) / (HI - LO) * g
    idx = jnp.floor(u).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    words = jnp.take(bits, idx[..., 0] * g + idx[..., 1], axis=0)  # [..., G/32]
    word_id = idx[..., 2] >> 5                                     # [...]
    lane = jax.lax.broadcasted_iota(jnp.int32, words.shape, words.ndim - 1)
    word = jnp.sum(
        jnp.where(lane == word_id[..., None], words, 0), axis=-1
    )
    bit = (word >> (idx[..., 2] & 31)) & 1
    return bit.astype(jnp.float32) * inb.astype(jnp.float32)


def pack_bits(occ3d):
    g = occ3d.shape[0]
    flat = occ3d.reshape(g * g, g // 32, 32).astype(np.uint32)
    weights = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
    return jnp.asarray(
        (flat * weights).sum(axis=-1, dtype=np.uint32).astype(np.int32)
    )


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    base = float(jnp.sum(out))  # force
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = f(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{name:16s}: {dt*1e3:7.3f} ms  (checksum {s:.0f})")
    return base


def main():
    rng = np.random.default_rng(0)
    occ3d = (rng.random((G, G, G)) < 0.15).astype(np.float32)
    occ_bf16 = jnp.asarray(occ3d.reshape(G * G, G), jnp.bfloat16)
    occ_i8 = jnp.asarray(occ3d.reshape(G * G, G), jnp.int8)
    occ_bits = pack_bits(occ3d)

    x = jnp.asarray(rng.uniform(LO - 1, HI + 1, size=(R, P, 3)), jnp.float32)

    a = bench("bf16 rows", probe_rows, occ_bf16, x)
    b = bench("int8 rows", probe_rows, occ_i8, x)
    c = bench("bitpack int32", probe_bits, occ_bits, x)
    assert a == b == c, (a, b, c)
    print("all variants agree")


if __name__ == "__main__":
    main()
