"""End-to-end smoke + convergence tests for the jitted stage steps."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    make_stage_epoch,
    make_stage_step,
)


def tiny_config() -> Config:
    return Config(
        stages=StageConfig(cam_param_epochs=2, global_opt_epochs=2, fine_tune_epochs=1),
        train=TrainConfig(rays_per_batch=256, steps_per_image_epoch=4),
        nerf=NerfConfig(
            samples_coarse=32,
            sample_scale=4,
            fine_bins_topk=8,
            emb_freqs_xyz=6,
            coarse_depth=2,
            coarse_width=32,
            coarse_skips=(1,),
            fine_depth=2,
            fine_width=32,
            fine_skips=(1,),
        ),
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene") / "Tiny_Spheres")
    make_dataset(d, n_train=6, n_val=1, n_test=2, img_h=32, img_w=32, seed=3)
    return d


@pytest.fixture(scope="module")
def loaded(tiny_scene):
    scene = load_scene(tiny_scene)
    calib = load_calibration(tiny_scene)
    return scene, calib


def _make_state(cfg, scene, steps_per_epoch=4):
    key = jax.random.PRNGKey(0)
    params = Params(
        cam=init_camera_params(scene.train.count),
        nerf=init_nerf_params(key, cfg.nerf),
    )
    txs, opt_states = build_optimizers(cfg, params, steps_per_epoch)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))
    return state, txs


def test_dataset_generation(loaded):
    scene, calib = loaded
    assert scene.train.count == 6
    assert scene.train.images_u8.shape == (6, 32, 32, 3)
    assert scene.train.poses_w2c.shape == (6, 3, 4)
    # background is white after compositing
    assert scene.train.images_u8.max() == 255
    assert np.asarray(calib.calib_counts).min() >= 2
    assert np.asarray(calib.coord_counts).min() >= 1


def test_stage0_step_reduces_reprojection_loss(loaded):
    scene, calib = loaded
    cfg = tiny_config()
    state, txs = _make_state(cfg, scene)
    data = TrainData(
        images_u8=jnp.asarray(scene.train.images_u8.reshape(6, -1, 3)),
        calib=calib,
    )
    step = make_stage_step(cfg, 0, txs[0], 32, 32, total_steps=100)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(40):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, f"stage-0 loss did not drop: {first} -> {last}"


def test_stage1_epoch_scan_runs(loaded):
    scene, calib = loaded
    cfg = tiny_config()
    state, txs = _make_state(cfg, scene)
    data = TrainData(
        images_u8=jnp.asarray(scene.train.images_u8.reshape(6, -1, 3)),
        calib=calib,
    )
    epoch_fn = make_stage_epoch(
        cfg, 1, txs[1], 32, 32, total_steps=100, steps_per_epoch=3
    )
    state, metrics = epoch_fn(state, data, jax.random.PRNGKey(2))
    assert int(state.step) == 3
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"


def test_stage2_freezes_pose(loaded):
    scene, calib = loaded
    cfg = tiny_config()
    state, txs = _make_state(cfg, scene)
    data = TrainData(
        images_u8=jnp.asarray(scene.train.images_u8.reshape(6, -1, 3)),
        calib=calib,
    )
    step = make_stage_step(cfg, 2, txs[2], 32, 32, total_steps=100)
    pose_before = np.asarray(state.params.cam.pose_se3)
    fx_before = np.asarray(state.params.cam.fx)
    state, _ = step(state, data, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(state.params.cam.pose_se3), pose_before)
    assert not np.allclose(np.asarray(state.params.cam.fx), fx_before)


def test_stage0_nerf_frozen(loaded):
    scene, calib = loaded
    cfg = tiny_config()
    state, txs = _make_state(cfg, scene)
    data = TrainData(
        images_u8=jnp.asarray(scene.train.images_u8.reshape(6, -1, 3)),
        calib=calib,
    )
    step = make_stage_step(cfg, 0, txs[0], 32, 32, total_steps=100)
    w_before = np.asarray(state.params.nerf.coarse.trunk_w[0])
    state, _ = step(state, data, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(state.params.nerf.coarse.trunk_w[0]), w_before)
    assert not np.allclose(np.asarray(state.params.cam.fx), 1.0)


def test_gt_camera_init_round_trip(loaded):
    scene, _ = loaded
    cam = init_camera_params_from_gt(
        jnp.asarray(scene.train.poses_w2c), jnp.asarray(scene.train.K), 32, 32
    )
    K = intrinsics(cam, 32, 32)
    np.testing.assert_allclose(np.asarray(K), scene.train.K, rtol=1e-4)
    poses = camera_poses(cam)
    np.testing.assert_allclose(np.asarray(poses), scene.train.poses_w2c, atol=2e-4)


def test_flat_radam_matches_optax_chain():
    """FlatRAdam == the optax chain it replaced (clip -> scale_by_radam ->
    add_decayed_weights -> lr), elementwise on a random flat problem."""
    import optax
    from mc_nerf_tpu.train.optim import FlatRAdam

    rng = np.random.default_rng(0)
    n = 137
    p0 = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    mask_np = (rng.uniform(size=n) < 0.7).astype(np.float32)
    mask = jnp.asarray(mask_np)
    wd, lr, clip = 4e-4, 3e-3, 10.0

    flat = FlatRAdam(mask=mask, lr=lr, weight_decay=wd, clip=clip)
    st_f = flat.init(p0)

    # optax reference: masked partition exactly like round 2's multi_transform
    labels = jnp.where(mask > 0, 0, 1)  # 0=train, 1=freeze (per-element via trees)
    tx = optax.multi_transform(
        {
            "train": optax.chain(
                optax.clip_by_global_norm(clip),
                optax.scale_by_radam(b1=0.9, b2=0.999, eps=1e-8, threshold=5.0),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(lr),
            ),
            "freeze": optax.set_to_zero(),
        },
        {"t": "train", "f": "freeze"},
    )
    # split the flat problem into trainable/frozen sub-vectors for optax
    t_idx = np.nonzero(mask_np)[0]
    f_idx = np.nonzero(1 - mask_np)[0]
    p_opt = {"t": p0[t_idx], "f": p0[f_idx]}
    st_o = tx.init(p_opt)

    p_f = p0
    key = jax.random.PRNGKey(5)
    for i in range(7):
        key, k = jax.random.split(key)
        g = jax.random.normal(k, (n,)) * (10.0 if i == 2 else 1.0)  # spike -> clip path
        p_f, st_f = flat.update(g, st_f, p_f)
        g_opt = {"t": g[t_idx], "f": g[f_idx]}
        upd, st_o = tx.update(g_opt, st_o, p_opt)
        p_opt = optax.apply_updates(p_opt, upd)

    np.testing.assert_allclose(np.asarray(p_f)[t_idx], np.asarray(p_opt["t"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(p_f)[f_idx], np.asarray(p0)[f_idx])


def test_flat_radam_schedule_matches_optax():
    """Callable-lr FlatRAdam == optax exponential_decay schedule."""
    import optax
    from mc_nerf_tpu.train.optim import FlatRAdam

    n, gamma, init = 31, 0.9, 0.1
    p0 = jnp.asarray(np.linspace(-1, 1, n).astype(np.float32))
    flat = FlatRAdam(mask=jnp.ones(n), lr=lambda c: init * gamma**c,
                     weight_decay=0.0, clip=0.0)
    st_f = flat.init(p0)
    tx = optax.chain(
        optax.scale_by_radam(threshold=5.0),
        optax.scale_by_learning_rate(
            optax.exponential_decay(init, transition_steps=1, decay_rate=gamma)
        ),
    )
    st_o = tx.init(p0)
    p_f = p_o = p0
    key = jax.random.PRNGKey(6)
    for _ in range(6):
        key, k = jax.random.split(key)
        g = jax.random.normal(k, (n,))
        p_f, st_f = flat.update(g, st_f, p_f)
        upd, st_o = tx.update(g, st_o, p_o)
        p_o = optax.apply_updates(p_o, upd)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_o), rtol=1e-4, atol=1e-5)
