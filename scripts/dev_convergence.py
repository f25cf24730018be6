"""Dev script: calibration + NeRF convergence sanity on the live chip.

Not part of the test suite — used to calibrate test thresholds and debug
training dynamics at interactive speed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NOTE: do not use PYTHONPATH for this — any PYTHONPATH value breaks the
# axon TPU plugin registration in this image.

import time

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.config import Config, NerfConfig, StageConfig, TrainConfig
from mc_nerf_tpu.data.blender import load_scene
from mc_nerf_tpu.data.calibration import load_calibration
from mc_nerf_tpu.data.synthetic import make_dataset
from mc_nerf_tpu.models.camera_params import (
    camera_poses,
    init_camera_params,
    init_camera_params_from_gt,
    intrinsics,
)
from mc_nerf_tpu.models.nerf import init_nerf_params
from mc_nerf_tpu.train.optim import Params, build_optimizers
from mc_nerf_tpu.train.steps import (
    TrainData,
    TrainState,
    make_render_fn,
    make_stage_epoch,
)
from mc_nerf_tpu.eval.metrics import psnr


def main(scene_dir="/tmp/dev_scene", n_train=12, hw=64, stage0_steps=4000,
         stage12_epochs=8, steps_per_epoch=500):
    import os

    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        print("generating scene...")
        make_dataset(scene_dir, n_train=n_train, n_val=2, n_test=2,
                     img_h=hw, img_w=hw, seed=5)
    scene = load_scene(scene_dir)
    calib = load_calibration(scene_dir)
    n = scene.train.count
    fine_mode = os.environ.get("MC_NERF_TRAIN_FINE_MODE", "grid")
    imp_samples = int(os.environ.get("MC_NERF_IMP_SAMPLES", "64"))
    cfg = Config(
        stages=StageConfig(4, 4, 2),
        train=TrainConfig(rays_per_batch=2048, steps_per_image_epoch=50,
                          fine_mode=fine_mode, importance_samples=imp_samples),
        nerf=NerfConfig(
            samples_coarse=64, sample_scale=5, fine_bins_topk=13,
            emb_freqs_xyz=10,
            coarse_depth=4, coarse_width=128, coarse_skips=(2,),
            fine_depth=8, fine_width=256, fine_skips=(4,),
        ),
        compute_dtype="bfloat16",
    )
    params = Params(
        cam=init_camera_params(n),
        nerf=init_nerf_params(jax.random.PRNGKey(0), cfg.nerf),
    )
    txs, opt_states = build_optimizers(cfg, params, steps_per_epoch=stage0_steps // 4)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    data = TrainData(
        images_u8=jnp.asarray(scene.train.images_u8.reshape(n, -1, 3)), calib=calib
    )

    def cam_errors(state):
        K_est = np.asarray(intrinsics(state.params.cam, hw, hw))
        P_est = np.asarray(camera_poses(state.params.cam))
        dK = np.abs(K_est - scene.train.K)
        dP = np.abs(P_est - scene.train.poses_w2c)
        return dK[:, 0, 0].mean(), dP[:, :, :3].mean(), dP[:, :, 3].mean()

    total = stage0_steps + stage12_epochs * steps_per_epoch
    ep0 = make_stage_epoch(cfg, 0, txs[0], hw, hw, total, stage0_steps // 4)
    print("fx_err %.3f R_err %.4f T_err %.4f (init)" % cam_errors(state))
    t0 = time.time()
    for e in range(4):
        state, m = ep0(state, data, jax.random.fold_in(jax.random.PRNGKey(7), e))
        print("stage0 ep%d loss=%.6f fx=%.3f R=%.4f T=%.4f (%.1fs)"
              % ((e, float(m['loss'])) + cam_errors(state) + (time.time()-t0,)))

    ep1 = make_stage_epoch(cfg, 1, txs[1], hw, hw, total, steps_per_epoch)
    ep2 = make_stage_epoch(cfg, 2, txs[2], hw, hw, total, steps_per_epoch)
    render = make_render_fn(cfg, hw, hw, rays_per_chunk=4096)

    def val_psnr(state):
        rgb, _, _ = render(state.params.nerf, jnp.asarray(scene.val.poses_w2c[0]),
                           jnp.asarray(scene.val.K[0]))
        gt = scene.val.images_u8[0].astype(np.float32) / 255.0
        return float(psnr(rgb, jnp.asarray(gt)))

    for e in range(stage12_epochs):
        fn = ep1 if e < stage12_epochs // 2 else ep2
        state, m = fn(state, data, jax.random.fold_in(jax.random.PRNGKey(11), e))
        print("stage%d ep%d loss=%.5f rgb_f=%.5f psnr=%.2f fx=%.3f R=%.4f T=%.4f (%.1fs)"
              % ((1 if e < stage12_epochs // 2 else 2, e, float(m['loss']),
                  float(m['loss_rgb_f']), val_psnr(state)) + cam_errors(state)
                 + (time.time()-t0,)))


if __name__ == "__main__":
    main(*[int(a) if a.isdigit() else a for a in sys.argv[1:]])
