"""Calibration pipeline: cache building, tag sampling, stage-0 convergence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.config import Config, NerfConfig, StageConfig, TrainConfig
from mc_nerf_tpu.data.blender import load_scene
from mc_nerf_tpu.data.calibration import (
    build_calibration_cache,
    load_calibration,
    sample_tags,
)
from mc_nerf_tpu.data.synthetic import make_dataset
from mc_nerf_tpu.models.camera_params import camera_poses, init_camera_params, intrinsics
from mc_nerf_tpu.models.nerf import init_nerf_params
from mc_nerf_tpu.native.apriltag_binding import detector_available
from mc_nerf_tpu.train.optim import Params, build_optimizers
from mc_nerf_tpu.train.restarts import improve_cameras, per_camera_losses
from mc_nerf_tpu.train.steps import TrainData, TrainState, make_stage_epoch


@pytest.fixture(scope="module")
def scene8(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cal") / "Cal_Spheres")
    make_dataset(d, n_train=8, n_val=1, n_test=1, img_h=48, img_w=48, seed=11)
    return d


def test_sample_tags_uniform_over_valid(scene8):
    calib = load_calibration(scene8)
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    seen = set()
    for k in keys[:50]:
        w, p = sample_tags(
            k, calib.calib_pts, calib.calib_tag_ids, calib.calib_counts, calib.cube_pts
        )
        assert w.shape == (8, 5, 3) and p.shape == (8, 5, 2)
        # every sampled keypoint set is one of the valid detections
        seen.add(int(jnp.sum(p[0]) * 1000) // 1)
    assert len(seen) >= 2  # camera 0 has >= 2 valid tags; sampling must vary


def test_gt_is_zero_of_per_camera_losses(scene8):
    from mc_nerf_tpu.models.camera_params import init_camera_params_from_gt

    scene = load_scene(scene8)
    calib = load_calibration(scene8)
    cam_gt = init_camera_params_from_gt(
        jnp.asarray(scene.train.poses_w2c), jnp.asarray(scene.train.K), 48, 48
    )
    nerf = init_nerf_params(jax.random.PRNGKey(0), Config().nerf)
    _, extr = per_camera_losses(Params(cam_gt, nerf), calib, 48, 48)
    assert float(jnp.max(extr)) < 1e-8


def test_stage0_convergence_with_restarts(scene8):
    """Stage-0 + candidate restarts must recover all 8 cameras near GT."""
    scene = load_scene(scene8)
    calib = load_calibration(scene8)
    n, hw = 8, 48
    cfg = Config(
        stages=StageConfig(6, 1, 1),
        train=TrainConfig(rays_per_batch=32),
        nerf=NerfConfig(
            samples_coarse=8, sample_scale=2, fine_bins_topk=2, emb_freqs_xyz=2,
            coarse_depth=1, coarse_width=8, coarse_skips=(), fine_depth=1,
            fine_width=8, fine_skips=(),
        ),
        compute_dtype="float32",
    )
    params = Params(
        cam=init_camera_params(n), nerf=init_nerf_params(jax.random.PRNGKey(0), cfg.nerf)
    )
    steps_per_epoch = 800
    txs, opt_states = build_optimizers(cfg, params, steps_per_epoch)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    data = TrainData(
        images_u8=jnp.asarray(scene.train.images_u8.reshape(n, -1, 3)), calib=calib
    )
    ep = make_stage_epoch(cfg, 0, txs[0], hw, hw, 6 * steps_per_epoch, steps_per_epoch)
    for e in range(6):
        state, m = ep(state, data, jax.random.fold_in(jax.random.PRNGKey(3), e))
        if e < 5:
            new_params, _, _ = improve_cameras(
                jax.random.fold_in(jax.random.PRNGKey(9), e), state.params, calib, hw, hw
            )
            state = TrainState(new_params, state.opt_states, state.step)
    P_est = np.asarray(camera_poses(state.params.cam))
    dR = np.abs(P_est[:, :, :3] - scene.train.poses_w2c[:, :, :3]).mean()
    dT = np.abs(P_est[:, :, 3] - scene.train.poses_w2c[:, :, 3]).mean()
    K_est = np.asarray(intrinsics(state.params.cam, hw, hw))
    dfx = np.abs(K_est[:, 0, 0] - scene.train.K[:, 0, 0]).mean()
    assert dR < 0.03, f"rotation error too high: {dR}"
    assert dT < 0.15, f"translation error too high: {dT}"
    assert dfx < 5.0, f"fx error too high: {dfx} px"


@pytest.mark.skipif(not detector_available(), reason="C++ detector unavailable")
def test_rendered_calibration_path(tmp_path):
    """Full production path: cube renders -> C++ detector -> cache."""
    d = str(tmp_path / "Rendered")
    make_dataset(
        d, n_train=3, n_val=1, n_test=1, img_h=96, img_w=96, seed=2,
        calibration_mode="rendered",
    )
    assert os.path.exists(os.path.join(d, "calib", "r_0.png"))
    assert os.path.exists(os.path.join(d, "coord", "r_0.png"))
    calib = load_calibration(d)
    assert np.asarray(calib.calib_counts).min() >= 2
    assert np.asarray(calib.coord_counts).min() >= 1

    # detected keypoints agree with analytic projections of the coord cube
    from mc_nerf_tpu.cameras.projection import reproject_points

    scene = load_scene(d)
    pts = np.asarray(calib.coord_pts)
    cube = np.asarray(calib.cube_pts)
    for i in range(3):
        for t in range(6):
            if np.any(pts[i, t] != 0):
                pred = np.asarray(
                    reproject_points(
                        jnp.asarray(cube[t][None]),
                        jnp.asarray(scene.train.K[i]),
                        jnp.asarray(scene.train.poses_w2c[i]),
                    )
                )[0]
                assert np.abs(pred - pts[i, t]).max() < 1.0
