"""Occupancy-grid culling (ops/occupancy.py).

The working realization of the reference's dead voxel-cache idea
(``/root/reference/model/mc_nerf.py:859-867``): a dense coarse-MLP density
lattice culls empty space from the coarse sampling PMF.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.config import NerfConfig
from mc_nerf_tpu.ops.occupancy import (
    OccupancyGrid,
    binary_grid,
    init_grid,
    occupancy_pmf,
    probe_occupancy,
    update_grid,
)
from mc_nerf_tpu.ops.volume import sample_pdf

CFG = NerfConfig(occ_grid_size=16, occ_probes=32, occ_coarse_samples=16)
G = CFG.occ_grid_size
LO, HI = CFG.bound_min, CFG.bound_max


def _sphere_act(pts, radius=1.5, inside=100.0):
    """Analytic density field: dense inside a centered sphere, empty outside."""
    r = jnp.linalg.norm(pts, axis=-1)
    return jnp.where(r < radius, inside, 0.0)


def test_init_grid_all_occupied():
    occ2d = binary_grid(init_grid(G), CFG)
    assert occ2d.shape == (G * G, G)
    np.testing.assert_array_equal(np.asarray(occ2d), 1.0)


def test_update_grid_fresh_marks_sphere():
    grid = update_grid(None, _sphere_act, G, LO, HI, chunk=1024)
    occ = np.asarray(binary_grid(grid, CFG)).reshape(G, G, G)
    c = G // 2
    assert occ[c, c, c] == 1.0          # center occupied
    assert occ[0, 0, 0] == 0.0          # corner empty (|x| ~ 5.7 > 1.5)
    # dilation: occupancy extends at least one voxel beyond the sphere
    vox = (HI - LO) / G
    n_occ = occ.sum()
    sphere_voxels = 4 / 3 * np.pi * 1.5**3 / vox**3
    assert n_occ > sphere_voxels        # >= sphere + dilation shell
    assert n_occ < 0.5 * G**3           # but far from everywhere


def test_update_grid_ema_max_decay():
    g0 = OccupancyGrid(density=jnp.full((G, G, G), 10.0))
    zero_act = lambda pts: jnp.zeros(pts.shape[:-1])
    g1 = update_grid(g0, zero_act, G, LO, HI, decay=0.5, chunk=1024)
    np.testing.assert_allclose(np.asarray(g1.density), 5.0, rtol=1e-6)
    # new density wins where it exceeds the decayed previous value
    g2 = update_grid(g1, lambda p: jnp.full(p.shape[:-1], 50.0), G, LO, HI,
                     decay=0.5, chunk=1024)
    np.testing.assert_allclose(np.asarray(g2.density), 50.0, rtol=1e-6)


def test_probe_occupancy_lookup_and_oob():
    occ = np.zeros((G, G, G), np.float32)
    occ[3, 5, 7] = 1.0
    occ2d = jnp.asarray(occ.reshape(G * G, G))
    vox = (HI - LO) / G
    center = lambda i: LO + (i + 0.5) * vox
    pts = jnp.asarray([
        [center(3), center(5), center(7)],     # the occupied voxel
        [center(3), center(5), center(8)],     # neighbor: empty
        [HI + 1.0, 0.0, 0.0],                  # out of AABB -> 0
        [LO - 0.1, center(5), center(7)],      # just outside -> 0
    ])
    vals = np.asarray(probe_occupancy(occ2d, LO, HI, pts))
    np.testing.assert_array_equal(vals, [1.0, 0.0, 0.0, 0.0])


def test_map_layouts_agree():
    """bf16 / int8 / bitpacked maps are exact and probe identically."""
    g = 32  # bitpack needs occ_grid_size % 32 == 0
    grid = update_grid(None, _sphere_act, g, LO, HI, chunk=1024)
    maps = {
        dt: binary_grid(grid, NerfConfig(
            occ_grid_size=g, occ_coarse_samples=16, occ_map_dtype=dt
        ))
        for dt in ("bfloat16", "int8", "bitpack")
    }
    assert maps["bfloat16"].shape == (g * g, g)
    assert maps["int8"].shape == (g * g, g)
    assert maps["bitpack"].shape == (g * g, g // 32)
    assert maps["bitpack"].dtype == jnp.uint32
    key = jax.random.PRNGKey(4)
    pts = jax.random.uniform(key, (500, 3), jnp.float32, LO - 1.0, HI + 1.0)
    ref = np.asarray(probe_occupancy(maps["bfloat16"], LO, HI, pts))
    assert ref.sum() > 0 and ref.sum() < ref.size  # non-degenerate probe set
    for dt in ("int8", "bitpack"):
        np.testing.assert_array_equal(
            np.asarray(probe_occupancy(maps[dt], LO, HI, pts)), ref,
            err_msg=dt,
        )


def test_pmf_floor_and_shape():
    occ2d = jnp.zeros((G * G, G))  # all empty
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z, pmf = occupancy_pmf(occ2d, rays_o, rays_d, CFG)
    # +2: phantom end probes so sample_pdf's dropped first/last weights are
    # the phantoms, never real occupancy (ops/occupancy.py doc)
    p = CFG.occ_probes + 2
    assert z.shape == (1, p) and pmf.shape == (1, p)
    assert z[0, 0] < CFG.near and z[0, -1] > CFG.far
    np.testing.assert_array_equal(np.asarray(pmf[:, (0, -1)]), 0.0)
    # empty scene: pure floor -> uniform PMF -> sampling degrades to uniform
    np.testing.assert_allclose(np.asarray(pmf[:, 1:-1]), CFG.occ_floor, rtol=1e-6)


def test_all_occupied_pmf_sampling_is_uniform():
    """The warmup invariant: an all-occupied grid must reproduce uniform
    stratified sampling (same behavior as the unculled path)."""
    occ2d = binary_grid(init_grid(G), CFG)
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z, pmf = occupancy_pmf(occ2d, rays_o, rays_d, CFG)
    zs = np.asarray(sample_pdf(z, pmf, CFG.occ_coarse_samples))[0]
    # deterministic midpoint strata of a uniform pdf = uniform mids
    spacing = np.diff(zs)
    np.testing.assert_allclose(spacing, spacing[0], rtol=0.05)
    assert zs[0] > CFG.near and zs[-1] < CFG.far


def test_culled_sampling_concentrates_in_occupied_region():
    grid = update_grid(None, _sphere_act, G, LO, HI, chunk=1024)
    occ2d = binary_grid(grid, CFG)
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])   # crosses sphere at z in [1.5, 4.5]
    z, pmf = occupancy_pmf(occ2d, rays_o, rays_d, CFG)
    zs = np.asarray(sample_pdf(z, pmf, 32))[0]
    frac_inside = np.mean((zs > 1.2) & (zs < 4.8))
    assert frac_inside > 0.8, zs


def test_render_rays_train_occ_matches_uniform_stats():
    """Culled render with an all-occupied grid trains the same scene: the
    rendered rgb must be statistically indistinguishable from the unculled
    path (same MLP, same rays, different stratification jitter)."""
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_train

    cfg = NerfConfig(
        samples_coarse=32, occ_grid_size=16, occ_probes=32,
        occ_coarse_samples=32, emb_freqs_xyz=4,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=2, fine_width=32, fine_skips=(1,),
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kd, ko = jax.random.split(jax.random.PRNGKey(1))
    rays_d = jax.random.normal(kd, (64, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (64, 1))
    occ2d = binary_grid(init_grid(cfg.occ_grid_size), cfg)

    common = dict(
        key=jax.random.PRNGKey(2), step_r=jnp.float32(0.5), cfg=cfg,
        barf_window=(0.0, 1.0), barf_on=False, compute_dtype=jnp.float32,
        fine_mode="importance", importance_samples=16,
    )
    c0, f0 = render_rays_train(params, rays_d, rays_o, **common)
    c1, f1 = render_rays_train(params, rays_d, rays_o, occ=occ2d, **common)
    assert jnp.all(jnp.isfinite(c1)) and jnp.all(jnp.isfinite(f1))
    # same distribution, different strata: mean rgb agrees tightly
    np.testing.assert_allclose(
        np.asarray(c0).mean(0), np.asarray(c1).mean(0), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(f0).mean(0), np.asarray(f1).mean(0), atol=0.02
    )


def test_render_rays_train_occ_rejects_grid_mode():
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_train

    cfg = NerfConfig(
        samples_coarse=8, emb_freqs_xyz=2, coarse_depth=1, coarse_width=8,
        coarse_skips=(), fine_depth=1, fine_width=8, fine_skips=(),
        occ_grid_size=8,
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    rays = jnp.ones((4, 3)) / np.sqrt(3.0)
    occ2d = binary_grid(init_grid(8), cfg)
    with pytest.raises(ValueError, match="importance"):
        render_rays_train(
            params, rays, rays * 0, jax.random.PRNGKey(1), jnp.float32(0.5),
            cfg, (0.0, 1.0), False, fine_mode="grid", occ=occ2d,
        )


def test_render_rays_eval_occ_finite_and_close():
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_eval

    cfg = NerfConfig(
        samples_coarse=32, occ_grid_size=16, occ_probes=32,
        occ_coarse_samples=32, emb_freqs_xyz=4,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=2, fine_width=32, fine_skips=(1,),
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kd, _ = jax.random.split(jax.random.PRNGKey(1))
    rays_d = jax.random.normal(kd, (32, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (32, 1))
    occ2d = binary_grid(init_grid(cfg.occ_grid_size), cfg)

    rgb0, d0, o0 = render_rays_eval(
        params, rays_d, rays_o, cfg, jnp.float32, importance_samples=16
    )
    rgb1, d1, o1 = render_rays_eval(
        params, rays_d, rays_o, cfg, jnp.float32, importance_samples=16,
        occ=occ2d,
    )
    assert jnp.all(jnp.isfinite(rgb1))
    # all-occupied grid: deterministic strata vs uniform grid — close output
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1), atol=0.06)


# --- occ_pmf="density": the grid-based coarse pass (round 4) -------------
#
# The binary PMF is piecewise-uniform over occupied cells and cannot
# concentrate samples at surfaces — at sparse coarse-free budgets the fine
# MLP plateaus (BASELINE.md round 4, Array rig).  density_pmf builds real
# compositing weights (transmittance x alpha) from the probed EMA density.

import dataclasses

from mc_nerf_tpu.ops.occupancy import (
    density_pmf,
    density_rows,
    proposal_pmf,
    sampler_map,
    uniform_prior_map,
)

DCFG = dataclasses.replace(CFG, occ_pmf="density")


def test_uniform_prior_map_density_is_uniform():
    """Warmup invariant for density mode: the all-ZERO density prior must
    reproduce uniform stratified sampling (pure occ_floor PMF)."""
    dens2d = uniform_prior_map(DCFG)
    assert dens2d.dtype == jnp.bfloat16
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z, pmf = density_pmf(dens2d, rays_o, rays_d, DCFG)
    np.testing.assert_array_equal(np.asarray(pmf[:, (0, -1)]), 0.0)
    np.testing.assert_allclose(
        np.asarray(pmf[:, 1:-1]), DCFG.occ_floor / DCFG.occ_probes, rtol=1e-5
    )
    zs = np.asarray(sample_pdf(z, pmf, 16))[0]
    spacing = np.diff(zs)
    np.testing.assert_allclose(spacing, spacing[0], rtol=0.05)
    assert zs[0] > DCFG.near and zs[-1] < DCFG.far


def test_uniform_prior_map_binary_unchanged():
    """Binary mode's prior stays the all-occupied map."""
    np.testing.assert_array_equal(
        np.asarray(uniform_prior_map(CFG)),
        np.asarray(binary_grid(init_grid(G), CFG)),
    )


def test_density_pmf_matches_composite_weight_formula():
    """pmf == T * alpha + floor/P for the probed densities (independent
    numpy recomputation of the compositing-weight math)."""
    cfg = dataclasses.replace(DCFG, occ_dilate=False)
    # constant density slab: world z in [0, 1]
    vox = (HI - LO) / G
    zc = LO + (np.arange(G) + 0.5) * vox
    dens = np.zeros((G, G, G), np.float32)
    dens[:, :, (zc >= 0.0) & (zc <= 1.0)] = 7.5
    dens2d = jnp.asarray(dens.reshape(G * G, G), jnp.bfloat16)

    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z, pmf = density_pmf(dens2d, rays_o, rays_d, cfg)

    p = cfg.occ_probes
    h = (cfg.far - cfg.near) / (p - 1)
    d = np.asarray(
        probe_occupancy(
            dens2d, LO, HI,
            rays_o[:, None, :] + rays_d[:, None, :] * z[..., 1:-1, None],
        )
    )
    dh = d * h
    alpha = 1.0 - np.exp(-dh)
    trans = np.exp(-(np.cumsum(dh, axis=-1) - dh))
    expect = trans * alpha + cfg.occ_floor / p
    np.testing.assert_allclose(np.asarray(pmf[:, 1:-1]), expect, rtol=1e-4,
                               atol=1e-6)
    assert expect.max() > 0.1  # the slab actually carries weight


def test_density_sampling_concentrates_at_first_surface():
    """An opaque wall from world z=0 onward: the binary PMF spreads samples
    over the WHOLE occupied half-space; the density PMF's transmittance
    kills everything behind the entry surface."""
    vox = (HI - LO) / G
    zc = LO + (np.arange(G) + 0.5) * vox
    dens = np.zeros((G, G, G), np.float32)
    dens[:, :, zc >= 0.0] = 50.0
    grid = OccupancyGrid(jnp.asarray(dens))
    cfg_b = dataclasses.replace(CFG, occ_dilate=False)
    cfg_d = dataclasses.replace(DCFG, occ_dilate=False)

    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])  # hits the wall at depth z=3
    zb, pb = occupancy_pmf(binary_grid(grid, cfg_b), rays_o, rays_d, cfg_b)
    zd, pd = density_pmf(density_rows(grid, cfg_d), rays_o, rays_d, cfg_d)
    zs_b = np.asarray(sample_pdf(zb, pb, 32))[0]
    zs_d = np.asarray(sample_pdf(zd, pd, 32))[0]

    # binary: uniform over [3, far] -> ~40% of samples land beyond 5
    assert np.mean(zs_b > 5.0) > 0.3
    # density: transmittance extinguishes within ~3/50 of the entry
    assert np.mean(zs_d > 5.0) < 0.1
    assert np.mean((zs_d > 2.7) & (zs_d < 3.6)) > 0.7


def test_sampler_map_and_dispatch():
    grid = update_grid(None, _sphere_act, G, LO, HI, chunk=1024)
    m_b = sampler_map(grid, CFG)
    m_d = sampler_map(grid, DCFG)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(binary_grid(grid, CFG)))
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(density_rows(grid, DCFG)))
    assert m_d.dtype == jnp.bfloat16 and m_d.shape == (G * G, G)
    # dilation: density rows take the 3^3 neighborhood max, like the binary map
    assert float(jnp.sum(m_d > 0)) > float(jnp.sum(grid.density > 0))

    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    zb, pb = proposal_pmf(m_b, rays_o, rays_d, CFG)
    zb2, pb2 = occupancy_pmf(m_b, rays_o, rays_d, CFG)
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(pb2))
    zd, pd = proposal_pmf(m_d, rays_o, rays_d, DCFG)
    zd2, pd2 = density_pmf(m_d, rays_o, rays_d, DCFG)
    np.testing.assert_array_equal(np.asarray(pd), np.asarray(pd2))


def test_engine_rejects_bad_occ_pmf(tmp_path):
    from mc_nerf_tpu.train.engine import Engine

    from tests.test_engine import small_cfg

    cfg = small_cfg(str(tmp_path / "nonexistent"), str(tmp_path / "out"))
    with pytest.raises(ValueError, match="occ_pmf"):
        Engine(cfg.replace(nerf=dataclasses.replace(cfg.nerf, occ_pmf="nope")))
    with pytest.raises(ValueError, match="bfloat16"):
        Engine(cfg.replace(nerf=dataclasses.replace(
            cfg.nerf, occ_pmf="density", occ_map_dtype="int8")))
