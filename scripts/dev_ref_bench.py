"""Measure the PyTorch reference's hot path vs ours on identical hardware.

The throughput anchor in bench.py (7e4 rays/s/chip for a 3090-class GPU) is
an estimate — the reference publishes no numbers and no GPU exists here.
What CAN be measured on this machine: the reference's actual
``NeRF_Model.render_rays_train`` fwd+bwd (imported from /root/reference,
torch CPU) vs our ``render_rays_train`` in the reference-faithful grid mode
(JAX CPU) at an identical small workload.  A same-hardware, same-workload
ratio grounds the anchor: if our implementation is R× the reference's on
CPU, the per-chip `vs_baseline` figures inherit only the GPU-vs-CPU scaling
estimate, not the implementation comparison.

Usage: python scripts/dev_ref_bench.py [n_rays] [n_steps]
"""

import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def bench_reference():
    # stub the reference's unused-at-bench-time imports missing in this image
    for mod in ("cv2", "lpips", "prettytable"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.path.insert(0, "/root/reference")

    import torch

    from model.mc_nerf import NeRF_Model  # the reference's own class

    sys_param = {
        "mode": 0, "device_type": "cpu", "near": 1.0, "far": 8.0,
        "samples": 128, "scale": 5, "MLP_deg": 2, "white_back": True,
        "root_weight": "/tmp/ref_bench_w", "demo_render_pth": "/tmp/ref_bench_r",
        "batch": N_RAYS, "boader_min": -3.5, "boader_max": 3.5,
        "grid_nerf": 384, "sigma_init": 30.0, "sigma_default": -20.0,
        "warmup_epoch": 100, "sample_weight_thresh": 0.001,
        "res_h": 800, "res_w": 800, "data_name": "bench",
        # SinCosEmbedding / CorseFine_NeRF keys
        "emb_freqs_xyz": 10, "barf_mask": False, "barf_start": 0.0,
        "barf_end": 1.0, "coarse_MLP_depth": 4, "coarse_MLP_width": 128,
        "coarse_MLP_skip": [2], "fine_MLP_depth": 8, "fine_MLP_width": 256,
        "fine_MLP_skip": [4],
    }
    torch.manual_seed(0)
    model = NeRF_Model(sys_param)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    d = torch.randn(N_RAYS, 3)
    d = d / d.norm(dim=-1, keepdim=True)
    o = torch.randn(N_RAYS, 3) * 0.1 + torch.tensor([0.0, 0.0, -4.0])
    gt = torch.rand(N_RAYS, 3)

    def step():
        opt.zero_grad()
        rgb_c, rgb_f = model(d, o, 1, 0.5)
        loss = torch.nn.functional.mse_loss(rgb_c, gt) + \
            torch.nn.functional.mse_loss(rgb_f, gt)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm
    t0 = time.time()
    for _ in range(N_STEPS):
        loss = step()
    dt = (time.time() - t0) / N_STEPS
    print(f"reference torch-CPU : {dt*1e3:8.1f} ms/step  "
          f"{N_RAYS/dt:8.0f} rays/s  loss={loss:.4f}")
    return N_RAYS / dt


def bench_ours():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from mc_nerf_tpu.config import NerfConfig
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_train

    cfg = NerfConfig()  # reference scale; grid fine mode = ref-faithful
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    kd, ko = jax.random.split(jax.random.PRNGKey(1))
    d = jax.random.normal(kd, (N_RAYS, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(ko, (N_RAYS, 3), jnp.float32) * 0.1 + jnp.asarray([0.0, 0.0, -4.0])
    gt = jax.random.uniform(jax.random.PRNGKey(2), (N_RAYS, 3))

    def loss_fn(p, key):
        rgb_c, rgb_f = render_rays_train(
            p, d, o, key, jnp.float32(0.5), cfg, (0.0, 1.0), barf_on=False,
            compute_dtype=jnp.float32, fine_mode="grid",
        )
        return jnp.mean((rgb_c - gt) ** 2) + jnp.mean((rgb_f - gt) ** 2)

    @jax.jit
    def step(p, s, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    key = jax.random.PRNGKey(3)
    params, opt_state, loss = step(params, opt_state, key)  # compile
    float(loss)
    t0 = time.time()
    for i in range(N_STEPS):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        loss = float(loss)
    dt = (time.time() - t0) / N_STEPS
    print(f"ours jax-CPU (grid) : {dt*1e3:8.1f} ms/step  "
          f"{N_RAYS/dt:8.0f} rays/s  loss={loss:.4f}")
    return N_RAYS / dt


if __name__ == "__main__":
    print(f"workload: {N_RAYS} rays/step, 128 coarse + grid-fine, fp32, 1-core CPU")
    ref = bench_reference()
    ours = bench_ours()
    print(f"same-hardware ratio (ours/ref): {ours/ref:.2f}x")
