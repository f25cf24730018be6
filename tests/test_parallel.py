"""Data-parallel correctness on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.config import Config, NerfConfig, StageConfig, TrainConfig
from mc_nerf_tpu.data.calibration import CalibrationData
from mc_nerf_tpu.data.cube import tag_world_points
from mc_nerf_tpu.models.camera_params import init_camera_params
from mc_nerf_tpu.models.nerf import init_nerf_params
from mc_nerf_tpu.parallel.mesh import make_mesh
from mc_nerf_tpu.train.optim import Params, build_optimizers
from mc_nerf_tpu.train.steps import TrainData, TrainState, make_stage_step


def _tiny_setup(n_images=8, img_hw=16):
    cfg = Config(
        stages=StageConfig(1, 1, 1),
        train=TrainConfig(rays_per_batch=32, steps_per_image_epoch=1),
        nerf=NerfConfig(
            samples_coarse=16, sample_scale=4, fine_bins_topk=4, emb_freqs_xyz=4,
            coarse_depth=2, coarse_width=16, coarse_skips=(1,),
            fine_depth=2, fine_width=16, fine_skips=(1,),
        ),
        compute_dtype="float32",
    )
    rng = np.random.default_rng(0)
    params = Params(
        cam=init_camera_params(n_images),
        nerf=init_nerf_params(jax.random.PRNGKey(0), cfg.nerf),
    )
    txs, opt_states = build_optimizers(cfg, params, steps_per_epoch=4)
    state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

    images = jnp.asarray(
        rng.integers(0, 256, size=(n_images, img_hw * img_hw, 3), dtype=np.uint8)
    )
    pts = jnp.asarray(rng.uniform(2, 14, size=(n_images, 6, 5, 2)).astype(np.float32))
    ids = jnp.asarray(np.tile(np.arange(6, dtype=np.int32), (n_images, 1)))
    counts = jnp.asarray(np.full((n_images,), 6, dtype=np.int32))
    calib = CalibrationData(
        calib_pts=pts, coord_pts=pts, calib_tag_ids=ids, coord_tag_ids=ids,
        calib_counts=counts, coord_counts=counts,
        cube_pts=jnp.asarray(tag_world_points(1.0)),
    )
    return cfg, state, txs, TrainData(images_u8=images, calib=calib)


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, "conftest must simulate 8 CPU devices"


def test_sharded_step_runs_and_matches_unsharded():
    """The mesh-sharded step must produce the same loss as unsharded
    (sharding changes layout, not math)."""
    cfg, state, txs, data = _tiny_setup()
    mesh = make_mesh(8)

    step_sharded = make_stage_step(
        cfg, 1, txs[1], 16, 16, total_steps=12, images_per_batch=8, mesh=mesh
    )
    step_plain = make_stage_step(
        cfg, 1, txs[1], 16, 16, total_steps=12, images_per_batch=8, mesh=None
    )
    key = jax.random.PRNGKey(3)
    # separate states (donation consumes buffers)
    cfg2, state2, txs2, data2 = _tiny_setup()
    s1, m1 = step_sharded(state, data, key)
    s2, m2 = step_plain(state2, data2, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    # params identical after the update
    p1 = np.asarray(s1.params.cam.fx)
    p2 = np.asarray(s2.params.cam.fx)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_stage0_step_on_mesh():
    cfg, state, txs, data = _tiny_setup()
    mesh = make_mesh(8)
    step = make_stage_step(
        cfg, 0, txs[0], 16, 16, total_steps=12, images_per_batch=8, mesh=mesh
    )
    state, metrics = step(state, data, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_render_matches_unsharded():
    """Eval render sharded over the 8-device mesh == single-device render."""
    import dataclasses

    from mc_nerf_tpu.config import Config, EvalConfig, NerfConfig
    from mc_nerf_tpu.models.nerf import init_nerf_params
    from mc_nerf_tpu.parallel.mesh import make_mesh
    from mc_nerf_tpu.train.steps import make_render_fn

    cfg = Config(
        nerf=NerfConfig(
            samples_coarse=16, sample_scale=4, fine_bins_topk=4, emb_freqs_xyz=4,
            coarse_depth=2, coarse_width=16, coarse_skips=(1,),
            fine_depth=2, fine_width=16, fine_skips=(1,),
        ),
        eval=EvalConfig(res_h=16, res_w=16, rays_per_chunk=64,
                        importance_samples=8),
        compute_dtype="float32",
    )
    params = init_nerf_params(jax.random.PRNGKey(3), cfg.nerf)
    pose = jnp.asarray(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32)
    )
    K = jnp.asarray(np.array([[16, 0, 8], [0, 16, 8], [0, 0, 1]], np.float32))

    single = make_render_fn(cfg, 16, 16)
    sharded = make_render_fn(cfg, 16, 16, mesh=make_mesh(8))
    a = single(params, pose, K)
    b = sharded(params, pose, K)
    for x, y, name in zip(a, b, ("rgb", "depth", "opacity")):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), atol=1e-5, err_msg=name
        )
