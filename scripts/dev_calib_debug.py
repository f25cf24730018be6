"""Debug: is GT a zero of the calibration losses? Which cameras get stuck?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.cameras.lie import SE3_to_se3, se3_to_SE3
from mc_nerf_tpu.cameras.projection import reproject_points
from mc_nerf_tpu.data.blender import load_scene
from mc_nerf_tpu.data.calibration import load_calibration
from mc_nerf_tpu.data.synthetic import make_dataset
from mc_nerf_tpu.models.camera_params import (
    camera_poses, calib_cube_poses, init_camera_params_from_gt, intrinsics,
)

scene_dir = "/tmp/dev_scene"
scene = load_scene(scene_dir)
calib = load_calibration(scene_dir)
n = scene.train.count
hw = scene.img_h

# GT camera params
cam_gt = init_camera_params_from_gt(
    jnp.asarray(scene.train.poses_w2c), jnp.asarray(scene.train.K), hw, hw
)

# coord (extrinsic) loss at GT: project each valid tag, compare
K = intrinsics(cam_gt, hw, hw)
poses = camera_poses(cam_gt)
coord_pts = np.asarray(calib.coord_pts)     # [N, 6, 5, 2]
cube = np.asarray(calib.cube_pts)           # [6, 5, 3]

errs = []
for i in range(n):
    for t in range(6):
        if np.any(coord_pts[i, t] != 0):
            pred = np.asarray(
                reproject_points(jnp.asarray(cube[t][None]), K[i], poses[i])
            )[0]
            errs.append(np.abs(pred - coord_pts[i, t]).max())
print(f"coord reproj err at GT: max {np.max(errs):.4f} px over {len(errs)} tags")

# calib (intrinsic) loss at GT cube pose
z = np.load(os.path.join(scene_dir, "calibration_cache.npz"))
calib_pts, calib_valid, rots = z["calib_pts"], z["calib_valid"], z["calib_cube_rots"]
errs = []
for i in range(n):
    R_cw = scene.train.poses_w2c[i, :, :3] @ rots[i]
    t_cw = scene.train.poses_w2c[i, :, 3]
    pose_cube_cam = np.concatenate([R_cw, t_cw[:, None]], -1)
    for t in range(6):
        if calib_valid[i, t]:
            pred = np.asarray(
                reproject_points(jnp.asarray(cube[t][None]), K[i], jnp.asarray(pose_cube_cam))
            )[0]
            errs.append(np.abs(pred - calib_pts[i, t]).max())
print(f"calib reproj err at GT: max {np.max(errs):.4f} px over {len(errs)} tags")

# per-camera pose error after a long stage-0-only run
from mc_nerf_tpu.config import Config, StageConfig, TrainConfig
from mc_nerf_tpu.models.camera_params import init_camera_params
from mc_nerf_tpu.train.optim import Params, build_optimizers
from mc_nerf_tpu.models.nerf import init_nerf_params
from mc_nerf_tpu.train.steps import TrainData, TrainState, make_stage_epoch
from mc_nerf_tpu.config import NerfConfig

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
lr1 = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
cfg = Config(
    stages=StageConfig(10, 1, 1),
    train=TrainConfig(rays_per_batch=64, stage1_lr=lr1),
    nerf=NerfConfig(samples_coarse=16, sample_scale=4, fine_bins_topk=4,
                    emb_freqs_xyz=4, coarse_depth=2, coarse_width=16,
                    coarse_skips=(1,), fine_depth=2, fine_width=16, fine_skips=(1,)),
    compute_dtype="float32",
)
params = Params(cam=init_camera_params(n), nerf=init_nerf_params(jax.random.PRNGKey(0), cfg.nerf))
txs, opt_states = build_optimizers(cfg, params, steps_per_epoch=steps // 10)
state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
data = TrainData(images_u8=jnp.asarray(scene.train.images_u8.reshape(n, -1, 3)), calib=calib)
from mc_nerf_tpu.train.restarts import restart_stuck_cameras

cool_p = np.zeros(n, np.int32)
cool_c = np.zeros(n, np.int32)
ep = make_stage_epoch(cfg, 0, txs[0], hw, hw, steps, steps // 10)
for e in range(10):
    state, m = ep(state, data, jax.random.fold_in(jax.random.PRNGKey(3), e))
    msg = f"ep{e} loss={float(m['loss']):.6f} intr={float(m['loss_intr']):.6f} extr={float(m['loss_extr']):.6f}"
    if e < 9:
        new_params, sp, sc = restart_stuck_cameras(
            jax.random.fold_in(jax.random.PRNGKey(99), e), state.params, calib, hw, hw,
            cooldown_ok_pose=jnp.asarray(cool_p <= 0),
            cooldown_ok_cube=jnp.asarray(cool_c <= 0),
        )
        sp, sc = np.asarray(sp), np.asarray(sc)
        cool_p = np.maximum(cool_p - 1, 0)
        cool_c = np.maximum(cool_c - 1, 0)
        if sp.sum() + sc.sum():
            msg += f"  [restart pose={np.flatnonzero(sp).tolist()} cube={np.flatnonzero(sc).tolist()}]"
            cool_p[sp] = 2
            cool_c[sc] = 2
            state = TrainState(new_params, state.opt_states, state.step)
    print(msg)

P_est = np.asarray(camera_poses(state.params.cam))
dR = np.abs(P_est[:, :, :3] - scene.train.poses_w2c[:, :, :3]).mean(axis=(1, 2))
dT = np.abs(P_est[:, :, 3] - scene.train.poses_w2c[:, :, 3]).mean(axis=1)
K_est = np.asarray(intrinsics(state.params.cam, hw, hw))
dfx = np.abs(K_est[:, 0, 0] - scene.train.K[:, 0, 0])
for i in range(n):
    print(f"cam {i}: dR={dR[i]:.4f} dT={dT[i]:.4f} dfx={dfx[i]:.2f}")
