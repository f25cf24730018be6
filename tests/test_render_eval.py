"""Eval renderer: grid (reference-faithful) and importance (TPU-fast) modes."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.config import NerfConfig
from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_eval
from mc_nerf_tpu.ops.volume import sample_pdf


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


def test_importance_close_to_dense_grid():
    """The fast importance path must agree with a *dense* fine render
    (grid mode, zero threshold -> every bin evaluated) to rendering
    tolerance: both estimate the same volume-rendering integral."""
    cfg, params, rd, ro = _setup()
    import dataclasses

    dense = dataclasses.replace(
        cfg, weight_thresh=0.0, fine_bins_topk=cfg.samples_coarse
    )
    rgb_g, dep_g, op_g = render_rays_eval(
        params, rd, ro, dense, jnp.float32, fine_mode="grid"
    )
    rgb_i, dep_i, op_i = render_rays_eval(
        params, rd, ro, cfg, jnp.float32,
        fine_mode="importance", importance_samples=64,
    )
    assert np.all(np.isfinite(np.asarray(rgb_i)))
    # different sample placements -> statistical agreement, not bitwise
    assert float(jnp.abs(rgb_i - rgb_g).mean()) < 2e-2
    assert float(jnp.abs(op_i - op_g).mean()) < 3e-2


def test_importance_few_samples_finite():
    cfg, params, rd, ro = _setup(n_rays=64)
    rgb, dep, op = render_rays_eval(
        params, rd, ro, cfg, jnp.float32,
        fine_mode="importance", importance_samples=8,
    )
    assert np.asarray(rgb).shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(rgb)))


def test_sample_pdf_concentrates_on_peak():
    """Inverse-CDF samples land inside the high-weight region."""
    n_rays, s = 16, 64
    z = jnp.broadcast_to(jnp.linspace(1.0, 8.0, s), (n_rays, s))
    w = jnp.zeros((n_rays, s)).at[:, 30:34].set(1.0)  # peak near z ~ 4.3-4.7
    zf = sample_pdf(z, w, 32)
    assert zf.shape == (n_rays, 32)
    # sorted per ray
    assert np.all(np.diff(np.asarray(zf), axis=-1) >= -1e-6)
    frac_in_peak = float(jnp.mean((zf > 4.0) & (zf < 5.1)))
    assert frac_in_peak > 0.9


def test_sample_pdf_uniform_fallback_on_empty_rays():
    """Zero-weight (background) rays fall back to near-uniform coverage."""
    n_rays, s = 8, 64
    z = jnp.broadcast_to(jnp.linspace(1.0, 8.0, s), (n_rays, s))
    w = jnp.zeros((n_rays, s))
    zf = np.asarray(sample_pdf(z, w, 64))
    assert zf.min() > 0.9 and zf.max() < 8.1
    # spread across the whole range, not clumped
    assert zf.max() - zf.min() > 5.0


def test_sample_pdf_stratified_key():
    n_rays, s = 4, 32
    z = jnp.broadcast_to(jnp.linspace(1.0, 8.0, s), (n_rays, s))
    w = jnp.ones((n_rays, s))
    zf1 = sample_pdf(z, w, 16, key=jax.random.PRNGKey(0))
    zf2 = sample_pdf(z, w, 16, key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(zf1), np.asarray(zf2))
    assert np.all(np.diff(np.asarray(zf1), axis=-1) >= -1e-6)


def test_train_importance_mode_grads_flow():
    """Importance-mode training render: finite outputs, grads reach both MLPs."""
    from mc_nerf_tpu.models.nerf import render_rays_train

    cfg, params, rd, ro = _setup(n_rays=32)

    def loss(p):
        rgb_c, rgb_f = render_rays_train(
            p, rd, ro, jax.random.PRNGKey(2), jnp.asarray(0.5), cfg,
            (0.1, 0.5), barf_on=True, compute_dtype=jnp.float32,
            fine_mode="importance", importance_samples=16,
        )
        return jnp.mean(rgb_c ** 2) + jnp.mean(rgb_f ** 2)

    g = jax.grad(loss)(params)
    gc = float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g.coarse)))
    gf = float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(g.fine)))
    assert np.isfinite(gc) and gc > 0
    assert np.isfinite(gf) and gf > 0


def test_pallas_eval_matches_xla_path():
    """The fused-kernel eval path must match the XLA path (both modes)."""
    from mc_nerf_tpu.models.nerf import pack_eval_params

    cfg, params, rd, ro = _setup(n_rays=64)
    packed = pack_eval_params(params, cfg)
    for mode in ("importance", "grid"):
        ref = render_rays_eval(
            params, rd, ro, cfg, jnp.bfloat16, fine_mode=mode,
            importance_samples=16,
        )
        ker = render_rays_eval(
            params, rd, ro, cfg, jnp.bfloat16, fine_mode=mode,
            importance_samples=16, packed=packed, interpret=True,
        )
        for a, b, name in zip(ref, ker, ("rgb", "depth", "opacity")):
            err = float(jnp.abs(a - b).max())
            assert err < 0.05, f"{mode}/{name}: {err}"


def test_train_pallas_path_matches_xla():
    """Train render through the fused kernels: values and grads match XLA."""
    from mc_nerf_tpu.models.nerf import render_rays_train

    cfg, params, rd, ro = _setup(n_rays=32)
    kwargs = dict(
        key=jax.random.PRNGKey(2), step_r=jnp.asarray(0.5), cfg=cfg,
        barf_window=(0.1, 0.5), barf_on=True, compute_dtype=jnp.bfloat16,
        fine_mode="importance", importance_samples=16,
    )

    def loss(p, use_pallas):
        rgb_c, rgb_f = render_rays_train(
            p, rd, ro, use_pallas=use_pallas, interpret=use_pallas, **kwargs
        )
        return jnp.mean(rgb_c ** 2) + 2 * jnp.mean(rgb_f ** 2), (rgb_c, rgb_f)

    (lx, (cx, fx)), gx = jax.value_and_grad(lambda p: loss(p, False), has_aux=True)(params)
    (lk, (ck, fk)), gk = jax.value_and_grad(lambda p: loss(p, True), has_aux=True)(params)

    # same PRNG stream -> same samples; bf16-level agreement expected
    assert float(jnp.abs(ck - cx).max()) < 0.05
    assert float(jnp.abs(fk - fx).max()) < 0.05
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gk)):
        scale = max(float(jnp.abs(a).max()), 1e-4)
        assert float(jnp.abs(jnp.asarray(b) - jnp.asarray(a)).max()) < 0.1 * scale + 1e-6
