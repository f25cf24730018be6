"""On-chip numerical equivalence of RAW s=64 fused_render vs the XLA math.

The s=64 quarantine (`fused_render._QUARANTINED_S`) was installed in round
2 after a backward kernel fault at ray blocks of 1536/512 points (block_r
24/8).  The round-5 probe matrix (benchmarks/fused_fault_s64_probes.jsonl)
shows the fault no longer reproduces at ANY block geometry on the current
platform stack — but those probes only prove survival + finite gradients.
Before the quarantine is retired, this script proves VALUES: it runs the
raw (un-padded) s=64 fused forward+backward on-chip at every block
geometry the round-2 bisect named, against the shaded kernel + jnp
composite reference (the exact math of ops/volume.composite, same formulas
as tests/test_fused_render._ref_composite; ref ``inference``
/root/reference/model/mc_nerf.py:705-736), and records max abs errors.

WARNING: run SOLO — a faulting cell would crash the shared TPU worker.

Usage: MC_NERF_FUSED_RAW_S=1 python scripts/dev_s64_equiv.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("MC_NERF_FUSED_RAW_S", "1")

OUT = os.path.join(REPO, "benchmarks", "fused_fault_s64_equiv.jsonl")

S = 64
RAYS = 1536  # divisible by 8/16/24/32 -> every forced block_r pads nothing
DEPTH, WIDTH, SKIPS = 8, 256, (4,)
NFREQ, SH_DEG = 10, 2
NB = (SH_DEG + 1) ** 2


def main():
    import jax
    import jax.numpy as jnp

    from mc_nerf_tpu.models.mlp import init_nerf_mlp
    from mc_nerf_tpu.models.sh import sh_basis
    from mc_nerf_tpu.ops.pallas import fused_render as fr
    from mc_nerf_tpu.ops.pallas.fused_mlp import (
        BASIS_LANES, encode_kernel_order, fused_shaded_mlp, pack_mlp_params,
    )

    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    mlp = init_nerf_mlp(k1, 3 * (2 * NFREQ + 1), DEPTH, WIDTH, SKIPS, 3 * NB)
    packed = pack_mlp_params(mlp, NFREQ, SKIPS, dtype=jnp.float32)
    rays_d = jax.random.normal(k2, (RAYS, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.asarray([[0.0, 0.0, -4.0]]) * jnp.ones((RAYS, 1))
    z = jnp.sort(jax.random.uniform(k3, (RAYS, S), jnp.float32, 1.0, 8.0), -1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    feat = encode_kernel_order(xyz.reshape(-1, 3), NFREQ, None)
    basis = sh_basis(SH_DEG, rays_d)
    basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - NB)))
    noise = jax.random.normal(k4, (RAYS, S))
    noise_sel = jax.random.normal(k5, (RAYS, S))

    def ref_fwd(packed, feat, basis16):
        out8 = fused_shaded_mlp(packed, feat, basis16, DEPTH, SKIPS, S, NB)
        sigma = out8[:, 0].reshape(RAYS, S)
        rgb = out8[:, 1:4].reshape(RAYS, S, 3)
        d = jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.full((RAYS, 1), 1e10)], axis=-1
        )

        def weights(sig):
            sd = jax.nn.softplus(sig) * d
            cum = jnp.cumsum(
                jnp.concatenate([jnp.zeros((RAYS, 1)), sd[:, :-1]], -1), -1
            )
            return (1.0 - jnp.exp(-sd)) * jnp.exp(-cum)

        w = weights(sigma + noise)
        rgb_out = jnp.sum(w[..., None] * rgb, axis=-2)
        rgb_out = rgb_out + (1.0 - jnp.sum(w, -1, keepdims=True))
        return rgb_out

    def fused_fwd(packed, feat, basis16):
        out, _ = fr.fused_render(
            packed, feat, basis16, z, noise, noise_sel,
            DEPTH, SKIPS, S, NB, True, True, True, False,
        )
        return out[:, :3]

    def loss(fwd):
        return lambda p, f, b: jnp.sum(fwd(p, f, b) ** 2)

    ref_rgb = jax.jit(ref_fwd)(packed, feat, basis16)
    ref_g = jax.jit(jax.grad(loss(ref_fwd), argnums=(0, 1, 2)))(
        packed, feat, basis16
    )
    ref_g_flat = jax.tree.leaves(ref_g)
    float(jnp.sum(ref_rgb))  # force (tunnel-safe)

    rows = []
    with open(OUT, "a") as f:
        for block_r in (8, 16, 24, 32):
            fr._block_rays = lambda rays, s, _br=block_r: _br
            t0 = time.time()
            rgb = jax.jit(fused_fwd)(packed, feat, basis16)
            g = jax.jit(jax.grad(loss(fused_fwd), argnums=(0, 1, 2)))(
                packed, feat, basis16
            )
            g_flat = jax.tree.leaves(g)
            fwd_err = float(jnp.max(jnp.abs(rgb - ref_rgb)))
            gnorm = max(float(jnp.max(jnp.abs(r))) for r in ref_g_flat)
            bwd_err = max(
                float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(g_flat, ref_g_flat)
            )
            rec = dict(
                s=S, rays=RAYS, block_r=block_r, raw=True,
                fwd_max_abs_err=fwd_err, bwd_max_abs_err=bwd_err,
                bwd_ref_max_abs=gnorm, seconds=round(time.time() - t0, 1),
            )
            rows.append(rec)
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()

    worst_fwd = max(r["fwd_max_abs_err"] for r in rows)
    worst_bwd_rel = max(r["bwd_max_abs_err"] / r["bwd_ref_max_abs"]
                        for r in rows)
    print(f"worst fwd abs err {worst_fwd:.3e}; "
          f"worst bwd rel-to-max err {worst_bwd_rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
