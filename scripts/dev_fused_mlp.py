"""Dev script: fused Pallas MLP kernel on the live TPU — numerics + speed."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.models.encoding import sincos_encode
from mc_nerf_tpu.models.mlp import apply_nerf_mlp, init_nerf_mlp
from mc_nerf_tpu.ops.pallas.fused_mlp import fused_mlp_forward, pack_mlp_params


def bench(fn, *args, iters=20):
    fn(*args)  # compile
    # force host materialization (block_until_ready unreliable on this tunnel)
    float(jnp.sum(fn(*args)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.time() - t0) / iters
    return dt, s


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(11)

    for (n_freqs, depth, width, skips, label) in [
        (10, 4, 128, (2,), "coarse 4x128"),
        (10, 8, 256, (4,), "fine 8x256"),
    ]:
        in_dim = 3 * (2 * n_freqs + 1)
        params = init_nerf_mlp(key, in_dim, depth, width, skips, 27)
        packed = pack_mlp_params(params, n_freqs, skips)
        ones = jnp.ones((n_freqs,), jnp.float32)

        # numerics at small scale
        xyz_s = jnp.asarray(rng.uniform(-4, 4, size=(512, 3)).astype(np.float32))
        out = fused_mlp_forward(packed, xyz_s, ones, n_freqs, depth, skips)
        x_enc = sincos_encode(xyz_s, n_freqs, None)
        sig_ref, sh_ref = apply_nerf_mlp(params, x_enc, skips, jnp.float32)
        err_s = float(jnp.abs(out[:, 0] - sig_ref[:, 0]).max())
        err_c = float(jnp.abs(out[:, 1:28] - sh_ref).max())
        print(f"[{label}] max err sigma={err_s:.3e} sh={err_c:.3e}")

        # speed at train/eval scale
        n_pts = 7000 * 128
        xyz = jnp.asarray(rng.uniform(-4, 4, size=(n_pts, 3)).astype(np.float32))

        for block in (1024, 2048, 4096, 8192, 16384):
            dt, _ = bench(
                lambda x: fused_mlp_forward(
                    packed, x, ones, n_freqs, depth, skips, block=block,
                    vmem_limit=100 * 1024 * 1024,
                ),
                xyz,
            )
            flops = 2 * n_pts * (
                sum(w.shape[0] * w.shape[1] for w in packed.trunk_w)
                + packed.head_w0.shape[0] * packed.head_w0.shape[1]
                + packed.head_w1.shape[0] * packed.head_w1.shape[1]
            )
            print(
                f"[{label}] fused block={block}: {dt*1e3:.2f} ms "
                f"{n_pts/dt/1e6:.1f} Mpts/s  {flops/dt/1e12:.1f} TFLOP/s"
            )

        def xla_path(x):
            e = sincos_encode(x, n_freqs, None)
            s, c = apply_nerf_mlp(params, e, skips, jnp.bfloat16)
            return s + jnp.sum(c, -1, keepdims=True)

        dt, _ = bench(jax.jit(xla_path), xyz)
        print(f"[{label}] XLA path: {dt*1e3:.2f} ms  {n_pts/dt/1e6:.1f} Mpts/s")


if __name__ == "__main__":
    main()
