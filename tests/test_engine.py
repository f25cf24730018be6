"""End-to-end engine test: 3-stage training + checkpoint + demo on a tiny scene."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.config import (
    Config,
    EvalConfig,
    NerfConfig,
    ParallelConfig,
    PathsConfig,
    StageConfig,
    TrainConfig,
)
from mc_nerf_tpu.data.synthetic import make_dataset
from mc_nerf_tpu.train.engine import Engine


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene") / "Tiny_Spheres")
    make_dataset(d, n_train=5, n_val=2, n_test=2, img_h=24, img_w=24, seed=7)
    return d


def small_cfg(scene_dir, out_root) -> Config:
    root, name = os.path.split(scene_dir)
    return Config(
        data_root=root,
        data_name=name,
        stages=StageConfig(cam_param_epochs=1, global_opt_epochs=1, fine_tune_epochs=1),
        train=TrainConfig(rays_per_batch=128, steps_per_image_epoch=2),
        nerf=NerfConfig(
            samples_coarse=24, sample_scale=4, fine_bins_topk=6, emb_freqs_xyz=4,
            coarse_depth=2, coarse_width=16, coarse_skips=(1,),
            fine_depth=2, fine_width=16, fine_skips=(1,),
        ),
        eval=EvalConfig(res_h=24, res_w=24, rays_per_chunk=128),
        paths=PathsConfig(
            root_weights=os.path.join(out_root, "weights"),
            root_out=os.path.join(out_root, "results"),
            log_path=os.path.join(out_root, "log"),
            tb_path=os.path.join(out_root, "tb"),
        ),
        parallel=ParallelConfig(data_parallel=1),
        compute_dtype="float32",
    )


def test_engine_full_cycle(scene_dir, tmp_path):
    cfg = small_cfg(scene_dir, str(tmp_path))
    engine = Engine(cfg)
    state = engine.train()
    assert int(state.step) == engine.steps_per_epoch * 3

    # checkpoints exist for every epoch
    from mc_nerf_tpu.train import checkpoint as ckpt_lib

    assert ckpt_lib.latest_epoch(engine.ckpt_dir) == 2

    # validation artifacts were written
    out_dir = os.path.join(cfg.paths.render_dir, cfg.data_name)
    assert os.path.exists(os.path.join(out_dir, "epoch_1.png"))
    assert os.path.exists(os.path.join(out_dir, "cam_pose", "epoch_0.png"))

    # demo mode: renders all test views with per-image scoring
    demo_cfg = cfg.replace(mode=1)
    engine2 = Engine(demo_cfg)
    result = engine2.demo()
    assert result["count"] == 2
    assert np.isfinite(result["psnr"])
    assert len(os.listdir(os.path.join(result["out_dir"], "pred"))) == 2
    assert len(os.listdir(os.path.join(result["out_dir"], "depth"))) == 2


def test_checkpoint_retention_pruning(tmp_path):
    """ckpt_max_keep bounds retention to the newest N epochs while epochs in
    ``keep_epochs`` (the engine passes stage boundaries) survive pruning;
    restore from a kept epoch still round-trips (VERDICT r4 ask #7)."""
    from mc_nerf_tpu.train.checkpoint import Checkpointer
    from mc_nerf_tpu.train.steps import TrainState

    def st(e):
        return TrainState(
            params=jnp.full((4,), float(e)),
            opt_states=(jnp.zeros((2,)),),
            step=jnp.asarray(e, jnp.int32),
        )

    ck = Checkpointer(str(tmp_path / "ck"), max_keep=2, keep_epochs=(1, 3))
    for e in range(7):
        ck.save(e, st(e))
    ck.wait()
    kept = sorted(int(n) for n in os.listdir(str(tmp_path / "ck")) if n.isdigit())
    assert kept == [1, 3, 5, 6]
    restored, ep = ck.restore(st(0), 3)
    assert ep == 3
    np.testing.assert_allclose(np.asarray(restored.params), 3.0)
    ck.close()


def test_engine_ckpt_max_keep_demo_by_epoch(scene_dir, tmp_path):
    """Engine-level pruning: a 5-epoch run at ckpt_max_keep=1 keeps only
    the stage boundaries + the newest epoch, and demo-by-epoch restores
    from a kept boundary after pruning."""
    import dataclasses

    cfg = small_cfg(scene_dir, str(tmp_path))
    cfg = cfg.replace(
        stages=StageConfig(
            cam_param_epochs=1, global_opt_epochs=1, fine_tune_epochs=3
        ),
        train=dataclasses.replace(cfg.train, ckpt_max_keep=1),
    )
    engine = Engine(cfg)
    engine.train()
    engine.ckpt.wait()
    kept = sorted(int(n) for n in os.listdir(engine.ckpt_dir) if n.isdigit())
    assert kept == [0, 1, 4]  # stage boundaries 0/1/4; 2 and 3 pruned

    result = Engine(cfg.replace(mode=1)).demo(ckpt_epoch=1)
    assert np.isfinite(result["psnr"])


def test_engine_builds_calibration_cache_from_rendered_scene(tmp_path):
    """Real-data ingestion: a Blender-format scene with calib/coord images
    but NO detection cache trains end-to-end — the engine runs the C++
    tag36h11 detector at startup (ref data_read.py:171-214)."""
    from mc_nerf_tpu.native.apriltag_binding import detector_available

    if not detector_available():
        pytest.skip("C++ detector unavailable")
    d = str(tmp_path / "Rendered")
    make_dataset(
        d, n_train=3, n_val=1, n_test=1, img_h=96, img_w=96, seed=2,
        calibration_mode="rendered",
    )
    cache = os.path.join(d, "calibration_cache.npz")
    os.remove(cache)

    cfg = small_cfg(d, str(tmp_path / "out")).replace(
        stages=StageConfig(cam_param_epochs=1, global_opt_epochs=0, fine_tune_epochs=0),
    )
    engine = Engine(cfg)
    state = engine.train()
    assert os.path.exists(cache), "engine should have rebuilt the detection cache"
    assert int(state.step) == engine.steps_per_epoch


def test_epoch_chunks_math():
    """Epoch splitting honors max_steps_per_program (the tunneled worker's
    ~60 s execution watchdog makes unbounded epoch programs fatal)."""
    chunk = Engine._epoch_chunks

    class Fake:
        pass

    def mk(s, cap):
        f = Fake()
        f.steps_per_epoch = s
        f.cfg = Config(train=TrainConfig(max_steps_per_program=cap))
        return chunk(f)

    assert mk(30, 500) == [30]                 # short epoch: one program
    assert mk(5500, 500) == [500] * 11         # reference Ball scale
    assert mk(800, 500) == [400, 400]          # largest divisor wins
    assert mk(5500, 0) == [5500]               # 0 disables the bound
    sizes = mk(5501, 500)                      # prime: two-size fallback
    assert sum(sizes) == 5501 and max(sizes) <= 500 and len(set(sizes)) <= 2


def test_engine_chunked_epochs(scene_dir, tmp_path):
    """Training with a small max_steps_per_program (multiple scan calls per
    epoch) steps the same total count as a single-program epoch."""
    cfg = small_cfg(scene_dir, str(tmp_path))
    import dataclasses

    cfg = cfg.replace(train=dataclasses.replace(cfg.train, max_steps_per_program=3))
    engine = Engine(cfg)
    assert engine._epoch_chunks() == [2] * 5   # steps_per_epoch = 10
    state = engine.train()
    assert int(state.step) == engine.steps_per_epoch * 3


def test_engine_trains_with_rbg_prng(scene_dir, tmp_path):
    """The fast-PRNG path (XLA RngBitGenerator; the TPU auto default) trains
    end-to-end — same code, different random streams (utils/prng.py)."""
    import dataclasses

    import jax

    cfg = small_cfg(scene_dir, str(tmp_path))
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, prng_impl="rbg"),
        stages=StageConfig(cam_param_epochs=1, global_opt_epochs=1, fine_tune_epochs=0),
    )
    try:
        engine = Engine(cfg)
        state = engine.train()
        assert int(state.step) == engine.steps_per_epoch * 2
        assert np.isfinite(float(jnp.sum(state.params.nerf.fine.trunk_w[0])))
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_engine_resume(scene_dir, tmp_path):
    cfg = small_cfg(scene_dir, str(tmp_path))
    engine = Engine(cfg)
    engine.train()
    step_after = int(engine.state.step)

    # resuming a finished run is a no-op that restores the final state
    engine3 = Engine(cfg)
    state = engine3.train(resume=True)
    assert int(state.step) == step_after


def test_engine_train_mode_demo_lazy_loads_test_images(scene_dir, tmp_path):
    """train(); demo() in one process: the train-mode engine skips test
    images at load (engine.py:96) and demo() must lazy-load them."""
    cfg = small_cfg(scene_dir, str(tmp_path))
    engine = Engine(cfg)  # mode=0
    engine.train()
    assert engine.scene.test.images_u8 is None
    result = engine.demo()
    assert engine.scene.test.images_u8 is not None
    assert result["count"] == 2
    assert np.isfinite(result["psnr"])


def test_demo_early_checkpoint_skips_occupancy(scene_dir, tmp_path):
    """Demo of a checkpoint with fewer than occ_warmup_steps of NeRF
    training must render UNCULLED: deriving the grid from a near-untrained
    coarse MLP is exactly the mislocalized-culling state the train-side
    warmup gate exists for (a stage-0 ckpt would render white)."""
    import dataclasses

    cfg = small_cfg(scene_dir, str(tmp_path))
    cfg = cfg.replace(
        nerf=dataclasses.replace(cfg.nerf, occ_grid_size=8, occ_warmup_steps=10**6),
    )
    Engine(cfg).train()

    # stage-0 (CAM_PARAM) checkpoint: zero NeRF steps trained
    engine2 = Engine(cfg.replace(mode=1))
    result = engine2.demo(ckpt_epoch=0)
    assert engine2.occ_grid is None  # guard: no grid derived from the MLP
    assert np.isfinite(result["psnr"])

    # warmup satisfied -> demo derives the grid as before
    cfg3 = cfg.replace(
        mode=1,
        nerf=dataclasses.replace(cfg.nerf, occ_grid_size=8, occ_warmup_steps=0),
    )
    engine3 = Engine(cfg3)
    result3 = engine3.demo()  # latest checkpoint: 2 NeRF epochs trained
    assert engine3.occ_grid is not None
    assert np.isfinite(result3["psnr"])


def test_occ_warmup_defers_first_grid_refresh(scene_dir, tmp_path):
    """The occupancy grid must stay at the all-occupied prior (uniform
    sampling) until occ_warmup_steps of NeRF training have run: a grid
    derived from a barely-trained coarse MLP mislocalizes culling and can
    collapse the fine MLP to empty space it cannot recover from (the
    softplus gradient vanishes) — reproduced at 96x96/12-cam scale."""
    import dataclasses

    cfg = small_cfg(scene_dir, str(tmp_path / "warm"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(cfg.nerf, occ_grid_size=8, occ_warmup_steps=10**6),
        stages=StageConfig(cam_param_epochs=1, global_opt_epochs=2, fine_tune_epochs=0),
    )
    engine = Engine(cfg)
    engine.train()
    # warmup never satisfied -> grid never derived from the MLP
    assert engine.occ_grid is None
    assert float(np.asarray(engine._occ2d).min()) == 1.0  # all-occupied prior

    cfg2 = cfg.replace(
        nerf=dataclasses.replace(cfg.nerf, occ_grid_size=8, occ_warmup_steps=0),
        paths=PathsConfig(
            root_weights=os.path.join(str(tmp_path / "hot"), "weights"),
            root_out=os.path.join(str(tmp_path / "hot"), "results"),
            log_path=os.path.join(str(tmp_path / "hot"), "log"),
            tb_path=os.path.join(str(tmp_path / "hot"), "tb"),
        ),
    )
    engine2 = Engine(cfg2)
    engine2.train()
    assert engine2.occ_grid is not None  # refresh ran each NeRF epoch
