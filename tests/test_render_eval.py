"""Eval renderer: compacted fine pass must match the uncompacted reference."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.config import NerfConfig
from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_eval


def _setup(n_rays=128):
    cfg = NerfConfig(
        samples_coarse=32, sample_scale=4, fine_bins_topk=8, emb_freqs_xyz=6,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=3, fine_width=64, fine_skips=(1,),
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kd = jax.random.PRNGKey(1)
    rd = jax.random.normal(kd, (n_rays, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.tile(jnp.array([[0.0, 0.0, -4.0]]), (n_rays, 1))
    return cfg, params, rd, ro


def test_compacted_eval_matches_uncompacted():
    cfg, params, rd, ro = _setup()
    rgb_ref, dep_ref, op_ref = render_rays_eval(
        params, rd, ro, cfg, jnp.float32, fine_budget_per_ray=None
    )
    # budget = full lattice -> nothing can overflow
    rgb_c, dep_c, op_c = render_rays_eval(
        params, rd, ro, cfg, jnp.float32,
        fine_budget_per_ray=cfg.fine_bins_topk * cfg.sample_scale,
    )
    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(rgb_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep_c), np.asarray(dep_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(op_c), np.asarray(op_ref), atol=1e-5)


def test_compacted_eval_small_budget_finite():
    """Overflowing the budget must degrade to defaults, never corrupt."""
    cfg, params, rd, ro = _setup(n_rays=64)
    rgb, dep, op = render_rays_eval(
        params, rd, ro, cfg, jnp.float32, fine_budget_per_ray=2
    )
    assert np.all(np.isfinite(np.asarray(rgb)))
    assert np.asarray(rgb).shape == (64, 3)
