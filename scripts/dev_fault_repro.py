"""Minimal repro/bisect harness for the fused_render TRAIN-backward fault.

Symptom (v5e, via tunnel): ``jax.grad`` through ``fused_render`` with
s=64 samples/ray kills the TPU worker ("kernel fault") at ray blocks 1536
and 512 points; s=48/32 and the fwd-only eval geometry (s=64, block_r=32)
run fine.  This script runs ONE fused-render fwd or fwd+bwd at a chosen
geometry so the failing (s, block_r, width, depth) cell can be isolated.

WARNING: a faulting run crashes the *shared* TPU worker — never run this
while another process (e.g. a parity run) is training on the chip.

Usage:
  python scripts/dev_fault_repro.py --s 64 --rays 7000 --bwd
  python scripts/dev_fault_repro.py --s 64 --rays 7000 --bwd --block-r 8
  python scripts/dev_fault_repro.py --s 64 --rays 2048 --fwd-only
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=64, help="samples per ray")
    ap.add_argument("--rays", type=int, default=7000)
    ap.add_argument("--block-r", type=int, default=0,
                    help="force rays-per-block (0 = the production heuristic)")
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--skip", type=int, default=4)
    ap.add_argument("--nfreq", type=int, default=10)
    ap.add_argument("--sh-deg", type=int, default=2)
    ap.add_argument("--fwd-only", action="store_true",
                    help="forward only (default is fwd+bwd)")
    ap.add_argument("--no-noise", action="store_true")
    ap.add_argument("--no-wsel", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mc_nerf_tpu.models.mlp import init_nerf_mlp
    from mc_nerf_tpu.models.sh import sh_basis
    from mc_nerf_tpu.ops.pallas import fused_render as fr
    from mc_nerf_tpu.ops.pallas.fused_mlp import (
        BASIS_LANES, encode_kernel_order, pack_mlp_params,
    )

    if args.block_r:
        fr._block_rays = lambda rays, s: args.block_r  # bisect override

    s, rays = args.s, args.rays
    nb = (args.sh_deg + 1) ** 2
    skips = (args.skip,)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    mlp = init_nerf_mlp(
        k1, 3 * (2 * args.nfreq + 1), args.depth, args.width, skips, 3 * nb
    )
    packed = pack_mlp_params(mlp, args.nfreq, skips, dtype=jnp.float32)
    rays_d = jax.random.normal(k2, (rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.asarray([[0.0, 0.0, -4.0]]) * jnp.ones((rays, 1))
    z = jnp.sort(jax.random.uniform(k3, (rays, s), jnp.float32, 1.0, 8.0), -1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    feat = encode_kernel_order(xyz.reshape(-1, 3), args.nfreq, None)
    basis = sh_basis(args.sh_deg, rays_d)
    basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
    with_noise = not args.no_noise
    emit_wsel = not args.no_wsel
    noise = jax.random.normal(k4, (rays, s)) if with_noise else None
    noise_sel = (
        jax.random.normal(k5, (rays, s)) if (with_noise and emit_wsel) else None
    )

    block_r = args.block_r or fr._block_rays(rays, s)
    print(f"s={s} rays={rays} block_r={block_r} block={block_r * s} "
          f"depth={args.depth} width={args.width} noise={with_noise} "
          f"wsel={emit_wsel} mode={'fwd' if args.fwd_only else 'fwd+bwd'}",
          flush=True)

    def call(packed, feat, basis16):
        return fr.fused_render(
            packed, feat, basis16, z, noise, noise_sel,
            args.depth, skips, s, nb, with_noise, emit_wsel, True, False,
        )

    t0 = time.time()
    if args.fwd_only:
        out, _ = call(packed, feat, basis16)
        print("fwd ok:", float(out[:, :3].sum()), f"{time.time()-t0:.1f}s")
    else:
        def loss(packed, feat, basis16):
            out, _ = call(packed, feat, basis16)
            return jnp.sum(out[:, :3] ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(packed, feat, basis16)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        print("bwd ok: |g| =", total, f"{time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
