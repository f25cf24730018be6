"""Coarse-free rendering mode (VERDICT r3 ask #1b): the occupancy PMF is
the sole sampling proposal; the 4x128 coarse MLP is skipped entirely.

Covers: renderer semantics (train + eval), gradient routing (no gradient
reaches the coarse MLP), and the end-to-end engine cycle with the grid
refreshing from the fine MLP.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.config import NerfConfig
from mc_nerf_tpu.models.nerf import (
    init_nerf_params,
    render_rays_eval,
    render_rays_train,
)
from mc_nerf_tpu.ops.occupancy import binary_grid, init_grid


def _setup(n_rays=64, occ_grid_size=8):
    cfg = NerfConfig(
        samples_coarse=32, sample_scale=4, fine_bins_topk=8, emb_freqs_xyz=6,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=3, fine_width=64, fine_skips=(1,),
        occ_grid_size=occ_grid_size, occ_probes=32, occ_coarse_samples=16,
        coarse_free=True,
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kd = jax.random.PRNGKey(1)
    rd = jax.random.normal(kd, (n_rays, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.tile(jnp.array([[0.0, 0.0, -4.0]]), (n_rays, 1))
    occ = binary_grid(init_grid(occ_grid_size), cfg)  # all-occupied prior
    return cfg, params, rd, ro, occ


def test_train_render_returns_no_coarse():
    cfg, params, rd, ro, occ = _setup()
    rgb_c, rgb_f = render_rays_train(
        params, rd, ro, jax.random.PRNGKey(2), jnp.float32(1.0), cfg,
        barf_window=(0.0, 1.0), barf_on=False, compute_dtype=jnp.float32,
        fine_mode="importance", importance_samples=24, occ=occ,
        coarse_free=True,
    )
    assert rgb_c is None
    assert np.asarray(rgb_f).shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(rgb_f)))


def test_no_gradient_reaches_coarse_mlp():
    """The coarse MLP is out of the graph: its gradient must be exactly
    zero while the fine MLP's is not."""
    cfg, params, rd, ro, occ = _setup(n_rays=32)

    def loss(p):
        _, rgb_f = render_rays_train(
            p, rd, ro, jax.random.PRNGKey(2), jnp.float32(1.0), cfg,
            barf_window=(0.0, 1.0), barf_on=False, compute_dtype=jnp.float32,
            fine_mode="importance", importance_samples=16, occ=occ,
            coarse_free=True,
        )
        return jnp.sum(rgb_f**2)

    g = jax.grad(loss)(params)
    coarse_norm = sum(
        float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g.coarse)
    )
    fine_norm = sum(
        float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g.fine)
    )
    assert coarse_norm == 0.0
    assert fine_norm > 0.0


def test_eval_render_matches_importance_statistically():
    """With an all-occupied grid, coarse-free eval draws uniform strata —
    the same integral the standard importance path estimates; renders must
    agree to rendering tolerance."""
    cfg, params, rd, ro, occ = _setup(n_rays=128)
    rgb_cf, dep_cf, op_cf = render_rays_eval(
        params, rd, ro, cfg, jnp.float32,
        fine_mode="importance", importance_samples=64, occ=occ,
        coarse_free=True,
    )
    std = dataclasses.replace(cfg, coarse_free=False)
    rgb_i, dep_i, op_i = render_rays_eval(
        params, rd, ro, std, jnp.float32,
        fine_mode="importance", importance_samples=64, occ=occ,
    )
    assert np.all(np.isfinite(np.asarray(rgb_cf)))
    assert float(jnp.abs(rgb_cf - rgb_i).mean()) < 3e-2
    assert float(jnp.abs(op_cf - op_i).mean()) < 5e-2


def test_eval_render_deterministic():
    cfg, params, rd, ro, occ = _setup(n_rays=32)
    a = render_rays_eval(
        params, rd, ro, cfg, jnp.float32,
        fine_mode="importance", importance_samples=16, occ=occ,
        coarse_free=True,
    )[0]
    b = render_rays_eval(
        params, rd, ro, cfg, jnp.float32,
        fine_mode="importance", importance_samples=16, occ=occ,
        coarse_free=True,
    )[0]
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_coarse_free_requires_occ():
    cfg, params, rd, ro, _ = _setup(n_rays=8)
    with pytest.raises(ValueError, match="coarse_free"):
        render_rays_train(
            params, rd, ro, jax.random.PRNGKey(2), jnp.float32(1.0), cfg,
            barf_window=(0.0, 1.0), barf_on=False,
            fine_mode="importance", importance_samples=8, occ=None,
            coarse_free=True,
        )
    with pytest.raises(ValueError, match="coarse_free"):
        render_rays_eval(
            params, rd, ro, cfg, jnp.float32,
            fine_mode="grid", occ=None, coarse_free=True,
        )


def test_engine_coarse_free_cycle(tmp_path):
    """Full train + demo in coarse-free mode; the occupancy grid refreshes
    from the FINE MLP (the coarse MLP never enters the graph)."""
    from mc_nerf_tpu.data.synthetic import make_dataset
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    d = str(tmp_path / "scene" / "Tiny_CF")
    make_dataset(d, n_train=5, n_val=2, n_test=2, img_h=24, img_w=24, seed=7)
    cfg = small_cfg(d, str(tmp_path / "out"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(
            cfg.nerf, occ_grid_size=8, occ_warmup_steps=0, coarse_free=True,
            occ_probes=16,
            # from_stage=1 training is guard-railed (measured collapse,
            # BASELINE.md round 4); this test covers the MECHANICS only
            allow_measured_harmful=True,
        ),
    )
    engine = Engine(cfg)
    state = engine.train()
    assert int(state.step) == engine.steps_per_epoch * 3
    assert engine.occ_grid is not None  # refreshed (from the fine MLP)

    result = engine.demo()
    assert result["count"] == 2
    assert np.isfinite(result["psnr"])


def test_engine_rejects_coarse_free_without_occ(tmp_path):
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    cfg = small_cfg(str(tmp_path / "nonexistent"), str(tmp_path / "out"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(cfg.nerf, occ_grid_size=0, coarse_free=True)
    )
    with pytest.raises(ValueError, match="coarse_free"):
        Engine(cfg)


def test_engine_coarse_free_density_pmf_cycle(tmp_path):
    """Coarse-free with occ_pmf='density' (the grid-based coarse pass,
    BASELINE.md round 4): full train + demo; warmup runs on the all-zero
    density prior (uniform), then the grid refresh feeds T*alpha weights."""
    from mc_nerf_tpu.data.synthetic import make_dataset
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    d = str(tmp_path / "scene" / "Tiny_CFD")
    make_dataset(d, n_train=5, n_val=2, n_test=2, img_h=24, img_w=24, seed=7)
    cfg = small_cfg(d, str(tmp_path / "out"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(
            cfg.nerf, occ_grid_size=8, occ_warmup_steps=0, coarse_free=True,
            occ_probes=16, occ_pmf="density",
            # density-PMF training is guard-railed (measured collapse,
            # BASELINE.md round 4); this test covers the MECHANICS only
            allow_measured_harmful=True,
        ),
    )
    engine = Engine(cfg)
    state = engine.train()
    assert int(state.step) == engine.steps_per_epoch * 3
    assert engine.occ_grid is not None
    assert engine._occ2d.dtype == jnp.bfloat16

    result = engine.demo()
    assert result["count"] == 2
    assert np.isfinite(result["psnr"])


def test_coarse_free_at_stage_logic():
    cfg = NerfConfig(coarse_free=True, coarse_free_from_stage=2)
    assert not cfg.coarse_free_at(0)
    assert not cfg.coarse_free_at(1)
    assert cfg.coarse_free_at(2)
    full = NerfConfig(coarse_free=True)  # from_stage default 1
    assert full.coarse_free_at(1) and full.coarse_free_at(2)
    off = NerfConfig(coarse_free=False, coarse_free_from_stage=2)
    assert not off.coarse_free_at(2)


def test_stage_mask_freezes_coarse_in_coarse_free_stages():
    """Coarse-free stages must freeze the coarse MLP OUTRIGHT: its grads
    are identically zero, but a 'train' label still applies decoupled
    weight decay ``(upd + wd*p)*m`` every step (~0.8%/16 epochs), and
    occ_refresh_source='coarse' probes that decaying field (advisor r4)."""
    from mc_nerf_tpu.config import Config, StageConfig, TrainConfig
    from mc_nerf_tpu.models.camera_params import init_camera_params
    from mc_nerf_tpu.train.optim import (
        Params,
        _stage_labels,
        build_optimizers,
        stage_mask,
    )

    nerf_cfg = NerfConfig(
        samples_coarse=32, sample_scale=4, fine_bins_topk=8, emb_freqs_xyz=6,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=2, fine_width=32, fine_skips=(1,),
        coarse_free=True, coarse_free_from_stage=2,
    )
    params = Params(
        cam=init_camera_params(4),
        nerf=init_nerf_params(jax.random.PRNGKey(0), nerf_cfg),
    )

    frozen = _stage_labels(params, 2, freeze_coarse=True)
    assert all(l == "freeze" for l in jax.tree.leaves(frozen.nerf.coarse))
    assert all(l == "train" for l in jax.tree.leaves(frozen.nerf.fine))
    default = _stage_labels(params, 2)
    assert all(l == "train" for l in jax.tree.leaves(default.nerf.coarse))

    # build_optimizers wires freeze_coarse from cfg.nerf.coarse_free_at
    cfg = Config(
        stages=StageConfig(
            cam_param_epochs=1, global_opt_epochs=1, fine_tune_epochs=1
        ),
        train=TrainConfig(rays_per_batch=64, steps_per_image_epoch=2,
                          weight_decay=0.1),
        nerf=nerf_cfg,
        compute_dtype="float32",
    )
    txs, opt_states = build_optimizers(cfg, params, steps_per_epoch=2)
    m1 = stage_mask(params, 1)                       # stage 1: not cf yet
    m2 = stage_mask(params, 2, freeze_coarse=True)   # stage 2: cf
    np.testing.assert_array_equal(np.asarray(txs[1].mask), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(txs[2].mask), np.asarray(m2))

    # the coarse slice (trainable at stage 1, frozen at stage 2) is
    # bit-stable under an update even with nonzero weight decay
    coarse_idx = np.where(
        (np.asarray(m1) == 1.0) & (np.asarray(m2) == 0.0)
    )[0]
    assert coarse_idx.size > 0
    from jax.flatten_util import ravel_pytree

    p_flat, _ = ravel_pytree(params)
    g = jax.random.normal(jax.random.PRNGKey(3), p_flat.shape)
    st = txs[2].init(p_flat)
    p_new, _ = txs[2].update(g, st, p_flat)
    np.testing.assert_array_equal(
        np.asarray(p_new)[coarse_idx], np.asarray(p_flat)[coarse_idx]
    )
    assert not np.array_equal(
        np.asarray(p_new)[np.asarray(m2) == 1.0],
        np.asarray(p_flat)[np.asarray(m2) == 1.0],
    )


@pytest.mark.parametrize(
    "refresh,expect_sources",
    [
        # auto freezes the proposal at the trained coarse MLP under the
        # hybrid schedule (refresh-from-fine closes a measured feedback
        # loop: Array hyb32_16 7.84 vs 18.08 PSNR, BASELINE.md round 4)
        ("auto", {"coarse"}),
        ("fine", {"coarse", "fine"}),
    ],
)
def test_engine_hybrid_coarse_free_cycle(tmp_path, refresh, expect_sources):
    """HYBRID schedule (coarse_free_from_stage=2): GLOBAL_OPTIM trains the
    full two-pass pipeline (grid refreshes from the COARSE MLP), FINE_TUNE
    switches to the grid proposal, demo renders coarse-free.  Coarse-free
    from scratch cannot bootstrap (BASELINE.md round 4); this is the
    quality-preserving deployment."""
    from mc_nerf_tpu.data.synthetic import make_dataset
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    d = str(tmp_path / "scene" / "Tiny_HYB")
    make_dataset(d, n_train=5, n_val=2, n_test=2, img_h=24, img_w=24, seed=7)
    cfg = small_cfg(d, str(tmp_path / "out"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(
            cfg.nerf, occ_grid_size=8, occ_warmup_steps=0, coarse_free=True,
            coarse_free_from_stage=2, occ_probes=16,
            occ_refresh_source=refresh,
        ),
    )
    engine = Engine(cfg)
    state = engine.train()
    assert int(state.step) == engine.steps_per_epoch * 3
    assert set(engine._grid_refresh) == expect_sources

    result = engine.demo()
    assert result["count"] == 2
    assert np.isfinite(result["psnr"])


def test_mixture_proposal_renders_and_matches_budget():
    """cf_uniform_samples replaces (never adds to) PMF samples: the render
    is finite, and ku=0 is byte-identical to the pre-knob behavior."""
    cfg, params, rd, ro, occ = _setup(n_rays=32)
    key = jax.random.PRNGKey(3)
    kwargs = dict(
        barf_window=(0.0, 1.0), barf_on=False, compute_dtype=jnp.float32,
        fine_mode="importance", importance_samples=16, occ=occ,
        coarse_free=True,
    )
    _, rgb_base = render_rays_train(
        params, rd, ro, key, jnp.float32(1.0), cfg, **kwargs
    )
    cfg0 = dataclasses.replace(cfg, cf_uniform_samples=0)
    _, rgb0 = render_rays_train(
        params, rd, ro, key, jnp.float32(1.0), cfg0, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(rgb_base), np.asarray(rgb0))

    cfg4 = dataclasses.replace(cfg, cf_uniform_samples=4)
    _, rgb4 = render_rays_train(
        params, rd, ro, key, jnp.float32(1.0), cfg4, **kwargs
    )
    r4 = np.asarray(rgb4)
    assert r4.shape == (32, 3) and np.all(np.isfinite(r4))
    assert not np.array_equal(r4, np.asarray(rgb_base))

    # the knob clamps: ku >= K falls back to K-1 uniform + 1 PMF sample,
    # and a negative value never INCREASES the PMF draw
    for bad in (99, -3):
        cfgb = dataclasses.replace(cfg, cf_uniform_samples=bad)
        _, rgbb = render_rays_train(
            params, rd, ro, key, jnp.float32(1.0), cfgb, **kwargs
        )
        assert np.all(np.isfinite(np.asarray(rgbb)))


def test_mixture_samples_cover_off_support_space():
    """``mixture_samples`` guarantees coverage of space the PMF never
    proposes.  A PMF concentrated in one far bin sends (almost) all pure
    draws there; the mixture must still place samples in every stratum of
    [near, far], sorted per ray."""
    from mc_nerf_tpu.ops.occupancy import mixture_samples

    n_rays, n_probe, K, ku = 8, 32, 16, 8
    near, far = 2.0, 6.0
    z_probe = jnp.tile(
        jnp.linspace(near, far, n_probe)[None, :], (n_rays, 1)
    )
    pmf = jnp.zeros((n_rays, n_probe)).at[:, -2].set(1.0)  # one far spike
    kp, kn = jax.random.split(jax.random.PRNGKey(5))
    z_pure = np.asarray(
        mixture_samples(z_probe, pmf, K, 0, kp, kn, near, far)
    )
    z_mix = np.asarray(
        mixture_samples(z_probe, pmf, K, ku, kp, kn, near, far)
    )
    assert z_pure.shape == z_mix.shape == (n_rays, K)
    assert np.all(np.diff(z_mix, axis=-1) >= 0)  # sorted (compositing)
    mid = near + 0.5 * (far - near)
    # pure draws cluster at the spike (the sample_pdf eps floor leaks a
    # trickle); the mixture guarantees ku/2 samples in the near half
    assert (z_mix < mid).sum(axis=-1).min() >= ku // 2
    assert (z_pure < mid).mean() < (z_mix < mid).mean()
    # clamp semantics: ku >= K and ku < 0 still return [R, K] finite
    for bad in (K + 5, -2):
        zb = np.asarray(
            mixture_samples(z_probe, pmf, K, bad, kp, kn, near, far)
        )
        assert zb.shape == (n_rays, K) and np.all(np.isfinite(zb))


def test_refresh_source_policy():
    hyb = NerfConfig(coarse_free=True, coarse_free_from_stage=2)
    assert hyb.refresh_source(1) == "coarse"   # two-pass stage
    assert hyb.refresh_source(2) == "coarse"   # auto: freeze at coarse
    pure = NerfConfig(coarse_free=True)        # from_stage=1, no coarse ever
    assert pure.refresh_source(1) == "fine"
    assert pure.refresh_source(2) == "fine"
    pinned = NerfConfig(
        coarse_free=True, coarse_free_from_stage=2, occ_refresh_source="fine"
    )
    assert pinned.refresh_source(1) == "coarse"  # two-pass stages unaffected
    assert pinned.refresh_source(2) == "fine"
    off = NerfConfig(coarse_free=False, occ_refresh_source="fine")
    assert off.refresh_source(2) == "coarse"     # knob only binds coarse-free


def test_engine_rejects_bad_refresh_source(tmp_path):
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    cfg = small_cfg(str(tmp_path / "nonexistent"), str(tmp_path / "out"))
    with pytest.raises(ValueError, match="occ_refresh_source"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, occ_refresh_source="ema")))
    # source="coarse" without a trained coarse MLP (pure coarse-free)
    with pytest.raises(ValueError, match="trained coarse"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, occ_grid_size=8, coarse_free=True,
            coarse_free_from_stage=1, occ_refresh_source="coarse")))


def test_engine_rejects_eval_coarse_free_without_grid(tmp_path):
    from mc_nerf_tpu.config import EvalConfig
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    cfg = small_cfg(str(tmp_path / "nonexistent"), str(tmp_path / "out"))
    with pytest.raises(ValueError, match="eval.coarse_free"):
        Engine(cfg.replace(
            eval=dataclasses.replace(cfg.eval, coarse_free=True),
            nerf=dataclasses.replace(cfg.nerf, occ_grid_size=0),
        ))


def test_hybrid_demo_two_pass_eval_override(tmp_path):
    """eval.coarse_free=False on a hybrid-TRAINED model: the demo renders
    through the classic two-pass pipeline (coarse MLP from GLOBAL_OPTIM
    proposes) — the deployment that keeps two-pass eval quality while the
    FINE_TUNE steps ran at the coarse-free rate."""
    from mc_nerf_tpu.data.synthetic import make_dataset
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    d = str(tmp_path / "scene" / "Tiny_HYB2P")
    make_dataset(d, n_train=5, n_val=2, n_test=2, img_h=24, img_w=24, seed=7)
    cfg = small_cfg(d, str(tmp_path / "out"))
    cfg = cfg.replace(
        nerf=dataclasses.replace(
            cfg.nerf, occ_grid_size=8, occ_warmup_steps=0, coarse_free=True,
            coarse_free_from_stage=2, occ_probes=16,
        ),
    )
    Engine(cfg).train()
    demo_cfg = cfg.replace(
        mode=1, eval=dataclasses.replace(cfg.eval, coarse_free=False)
    )
    assert demo_cfg.eval_coarse_free is False and demo_cfg.nerf.coarse_free
    result = Engine(demo_cfg).demo()
    assert result["count"] == 2
    assert np.isfinite(result["psnr"])


def test_engine_guardrails_measured_harmful(tmp_path):
    """Configs the round-4 attribution matrix measured as ALWAYS collapsing
    are refused for training (VERDICT r4 ask #5) unless
    nerf.allow_measured_harmful is set; demo mode is unaffected."""
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    cfg = small_cfg(str(tmp_path / "nonexistent"), str(tmp_path / "out"))
    # coarse-free training from stage 1: ~6 PSNR in all five takes
    with pytest.raises(ValueError, match="allow_measured_harmful"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, occ_grid_size=8, coarse_free=True)))
    # density-PMF training: 12.0 -> 8.1 PSNR collapse
    with pytest.raises(ValueError, match="allow_measured_harmful"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, occ_pmf="density")))
    # two-pass eval override on a model that never trains a coarse MLP
    # renders garbage (advisor r4) — refused in any mode
    with pytest.raises(ValueError, match="two-pass eval"):
        Engine(cfg.replace(
            mode=1,
            nerf=dataclasses.replace(
                cfg.nerf, occ_grid_size=8, coarse_free=True),
            eval=dataclasses.replace(cfg.eval, coarse_free=False),
        ))
    # demo mode renders existing (however-trained) checkpoints: the
    # training guards must NOT fire — construction proceeds to scene
    # loading (and only fails on the nonexistent dir)
    with pytest.raises(Exception, match="nonexistent|No such"):
        Engine(cfg.replace(mode=1, nerf=dataclasses.replace(
            cfg.nerf, occ_pmf="density")))
    # the escape hatch reaches scene loading in train mode too
    with pytest.raises(Exception, match="nonexistent|No such"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, occ_pmf="density", allow_measured_harmful=True)))


def test_engine_rejects_bad_from_stage(tmp_path):
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    cfg = small_cfg(str(tmp_path / "nonexistent"), str(tmp_path / "out"))
    with pytest.raises(ValueError, match="coarse_free_from_stage"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, coarse_free_from_stage=3)))
