"""Benchmark: training rays/sec/chip on the reference hot path.

Measures the canonical GLOBAL_OPTIM step (SURVEY.md §3.4) at the reference's
workload scale — 7000 rays/step, coarse 4x128 / fine 8x256 MLPs, 800x800
images, intrinsic reprojection loss — on one chip, end to end (batch
sampling, ray gen, render, loss, backward, RAdam update).

Two sampling configs are measured, both reported in the single JSON line:

* **occ32/imp16** (headline ``value``): occupancy-culled 32 coarse + 16
  importance fine samples/ray — the documented fast setting, quality-
  validated at the full reference protocol (26.45 PSNR vs the default's
  27.01, BASELINE.md) and the config every prior round's bench measured,
  so ``value`` stays comparable across BENCH_r*.json.
* **occ48/imp32** (``default_config`` key): the library default since
  round 3, when the multi-rig quality A/B (Ball +0.56 dB, Array +1.15 dB,
  Room +1.99 dB) flipped the default toward quality.  ~1.7x slower.

Baseline anchor: the reference publishes no numbers (BASELINE.md); the
recommended setup is 2 GPUs x 7000 rays/step (ref README.md:55,
config.yaml:30).  ``vs_baseline`` is measured rays/sec/chip divided by
BASELINE_RAYS_PER_SEC_PER_CHIP, the per-chip anchor recorded in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Anchor: PyTorch reference on one modern GPU (its recommended 2-GPU run
# scales the epoch, not the per-step ray count). ~1.8M MLP point-evals per
# 7000-ray step puts a 3090-class GPU at O(10) steps/s => ~7e4 rays/s/chip.
# No GPU exists here to measure it, so the GPU anchor stays an ESTIMATE —
# but it is grounded by a same-hardware measurement: the reference's own
# NeRF_Model.render_rays_train fwd+bwd, imported and run on this host's CPU,
# does 110 rays/s vs our reference-faithful grid mode's 71 rays/s at the
# identical 256-ray workload (scripts/dev_ref_bench.py, BASELINE.md) — i.e.
# vs_baseline figures compare against a healthy, not-slower-than-reference
# implementation scaled by the GPU estimate, and carry that estimate's
# uncertainty only.
BASELINE_RAYS_PER_SEC_PER_CHIP = 7.0e4
ANCHOR_KIND = "estimated"  # see above + BASELINE.md "anchor grounding"

# Steps per compiled epoch program.  Real training runs 500-step programs
# (TrainConfig.max_steps_per_program chunking under the platform watchdog);
# benching 30-step programs overstated the per-epoch dispatch+sync overhead
# ~16x vs production (one ~36 ms tunnel round trip amortized over 30 vs 500
# steps).  200 keeps the program far under the ~60 s execution watchdog
# (200 x ~15 ms = 3 s) while measuring what training actually sustains.
N_STEPS = 200


def _measure(cfg, n_epochs: int = 3) -> float:
    """Sustained rays/s for one sampling config (end-to-end train step)."""
    import jax
    import jax.numpy as jnp

    from mc_nerf_tpu.data.calibration import CalibrationData
    from mc_nerf_tpu.data.cube import tag_world_points
    from mc_nerf_tpu.models.camera_params import init_camera_params
    from mc_nerf_tpu.models.nerf import init_nerf_params
    from mc_nerf_tpu.train.optim import Params, build_optimizers
    from mc_nerf_tpu.train.steps import TrainData, TrainState, make_stage_epoch

    img_h = img_w = 800
    n_images = 110  # Ball rig camera count
    rays = cfg.train.rays_per_batch
    assert rays == 7000

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = Params(
        cam=init_camera_params(n_images),
        nerf=init_nerf_params(key, cfg.nerf),
    )
    txs, opt_states = build_optimizers(cfg, params, steps_per_epoch=5500)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    images = jnp.asarray(
        rng.integers(0, 256, size=(n_images, img_h * img_w, 3), dtype=np.uint8)
    )
    pts = jnp.asarray(
        rng.uniform(10, 790, size=(n_images, 6, 5, 2)).astype(np.float32)
    )
    ids = jnp.asarray(np.tile(np.arange(6, dtype=np.int32), (n_images, 1)))
    counts = jnp.asarray(np.full((n_images,), 6, dtype=np.int32))
    calib = CalibrationData(
        calib_pts=pts, coord_pts=pts, calib_tag_ids=ids, coord_tag_ids=ids,
        calib_counts=counts, coord_counts=counts,
        cube_pts=jnp.asarray(tag_world_points(1.0)),
    )
    # occupancy culling (the default train path): throughput is shape-static
    # — culling changes where samples land, never how many — so the grid's
    # content cannot flatter the number; benchmark with the all-occupied
    # (uniform-sampling) map, the most honest/conservative choice.
    occ = None
    if cfg.nerf.occ_grid_size > 0 and cfg.train.fine_mode == "importance":
        from mc_nerf_tpu.ops.occupancy import uniform_prior_map

        occ = uniform_prior_map(cfg.nerf)
    data = TrainData(images_u8=images, calib=calib, occ=occ)

    # epoch-granular like the real engine: one lax.scan per epoch, one host
    # sync per epoch.  Per-step host syncs pay ~40 ms of tunnel round-trip
    # latency each on this platform, which the real training loop never pays.
    epoch = make_stage_epoch(
        cfg, stage=1, tx=txs[1], img_h=img_h, img_w=img_w,
        total_steps=286000, steps_per_epoch=N_STEPS, images_per_batch=1,
        mesh=None,
    )

    k = jax.random.PRNGKey(1)
    k, sub = jax.random.split(k)
    state, metrics = epoch(state, data, sub)  # compile + warm
    float(metrics["loss"])  # full materialization; this platform's
    # block_until_ready returns before execution completes (async futures)

    t0 = time.perf_counter()
    for _i in range(n_epochs):
        k, sub = jax.random.split(k)
        state, metrics = epoch(state, data, sub)
    loss_val = float(metrics["loss"])
    assert np.isfinite(loss_val)
    dt = time.perf_counter() - t0
    return rays * N_STEPS * n_epochs / dt


def main() -> None:
    import dataclasses

    from mc_nerf_tpu.config import Config
    from mc_nerf_tpu.utils.prng import configure_fast_prng

    cfg_default = Config()  # occ48/imp32 (quality default since round 3)
    configure_fast_prng(cfg_default.train.prng_impl)
    cfg_fast = dataclasses.replace(
        cfg_default,
        nerf=dataclasses.replace(cfg_default.nerf, occ_coarse_samples=32),
        train=dataclasses.replace(cfg_default.train, importance_samples=16),
    )

    fast = _measure(cfg_fast)
    default = _measure(cfg_default)
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(fast, 1),
                "unit": "rays/s",
                "vs_baseline": round(fast / BASELINE_RAYS_PER_SEC_PER_CHIP, 3),
                "anchor": ANCHOR_KIND,
                "config": (
                    "occ32/imp16 — the documented fast setting, measured by "
                    "every round's bench (cross-round comparable); 26.45 PSNR "
                    "at the full reference protocol (BASELINE.md)"
                ),
                "default_config": (
                    f"occ{cfg_default.nerf.occ_coarse_samples}/"
                    f"imp{cfg_default.train.importance_samples} (library "
                    "default since round 3 on multi-rig quality evidence, "
                    "27.01 protocol PSNR): "
                    f"{round(default, 1)} rays/s = "
                    f"{round(default / BASELINE_RAYS_PER_SEC_PER_CHIP, 3)}x"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
