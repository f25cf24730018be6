"""Composite-fused render kernel vs the XLA building blocks (interpret mode).

The kernel must reproduce ops/volume.composite's math (ref ``inference``,
mc_nerf.py:705-736) applied to the shaded-MLP outputs, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.models.mlp import init_nerf_mlp
from mc_nerf_tpu.models.sh import sh_basis
from mc_nerf_tpu.ops.pallas.fused_mlp import (
    BASIS_LANES,
    encode_kernel_order,
    fused_shaded_mlp,
    pack_mlp_params,
)
from mc_nerf_tpu.ops.pallas.fused_render import fused_render

DEPTH, WIDTH, SKIPS = 2, 32, (1,)
NFREQ, SH_DEG = 4, 2
NB = (SH_DEG + 1) ** 2
S = 16
RAYS = 40  # not a multiple of the ray block: exercises padding


def _setup(seed=0, s=S):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    mlp = init_nerf_mlp(k1, 3 * (2 * NFREQ + 1), DEPTH, WIDTH, SKIPS, 3 * NB)
    packed = pack_mlp_params(mlp, NFREQ, SKIPS, dtype=jnp.float32)
    rays_d = jax.random.normal(k2, (RAYS, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]]) * jnp.ones((RAYS, 1))
    z = jnp.sort(jax.random.uniform(k3, (RAYS, s), jnp.float32, 1.0, 8.0), axis=-1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    feat = encode_kernel_order(xyz.reshape(-1, 3), NFREQ, None)
    basis = sh_basis(SH_DEG, rays_d)
    basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - NB)))
    noise = jax.random.normal(k4, (RAYS, s))
    noise_sel = jax.random.normal(k5, (RAYS, s))
    return packed, feat, basis16, z, noise, noise_sel


def _ref_composite(packed, feat, basis16, z, noise, noise_sel, with_noise,
                   white_back=True):
    """Reference: shaded kernel (interpret) + the composite formulas in jnp
    — the exact math of ops/volume.composite with explicit noise arrays."""
    s = z.shape[1]
    out8 = fused_shaded_mlp(packed, feat, basis16, DEPTH, SKIPS, s, NB, True)
    sigma = out8[:, 0].reshape(RAYS, s)
    rgb = out8[:, 1:4].reshape(RAYS, s, 3)
    d = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((RAYS, 1), 1e10)], axis=-1
    )

    def weights(sig):
        sd = jax.nn.softplus(sig) * d
        cum = jnp.cumsum(jnp.concatenate([jnp.zeros((RAYS, 1)), sd[:, :-1]], -1), -1)
        return (1.0 - jnp.exp(-sd)) * jnp.exp(-cum)

    prob = weights(sigma)
    w = weights(sigma + noise) if with_noise else prob
    rgb_out = jnp.sum(w[..., None] * rgb, axis=-2)
    if white_back:
        rgb_out = rgb_out + (1.0 - jnp.sum(w, -1, keepdims=True))
    depth = jnp.sum(z * prob, -1, keepdims=True)
    opac = jnp.sum(prob, -1, keepdims=True)
    wsel = weights(sigma + noise_sel) if with_noise else prob
    return rgb_out, depth, opac, wsel


@pytest.mark.parametrize("with_noise", [True, False])
def test_fused_render_forward(with_noise):
    packed, feat, basis16, z, noise, noise_sel = _setup()
    ray_out, wsel = fused_render(
        packed, feat, basis16, z,
        noise if with_noise else None,
        noise_sel if with_noise else None,
        DEPTH, SKIPS, S, NB, with_noise, True, True, True,
    )
    rgb_r, depth_r, opac_r, wsel_r = _ref_composite(
        packed, feat, basis16, z, noise, noise_sel, with_noise
    )
    np.testing.assert_allclose(np.asarray(ray_out[:, :3]), np.asarray(rgb_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ray_out[:, 3:4]), np.asarray(depth_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ray_out[:, 4:5]), np.asarray(opac_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(wsel), np.asarray(wsel_r),
                               rtol=0, atol=2e-4)


def test_fused_render_no_wsel_output():
    packed, feat, basis16, z, noise, _ = _setup()
    ray_out, wsel = fused_render(
        packed, feat, basis16, z, noise, None,
        DEPTH, SKIPS, S, NB, True, False, True, True,
    )
    assert wsel is None and ray_out.shape == (RAYS, 8)


def test_fused_render_backward_matches_autodiff():
    packed, feat, basis16, z, noise, noise_sel = _setup()
    coeff = jnp.asarray(np.random.default_rng(3).normal(size=(RAYS, 3)), jnp.float32)

    def loss_fused(packed, feat, basis16):
        ray_out, _ = fused_render(
            packed, feat, basis16, z, noise, noise_sel,
            DEPTH, SKIPS, S, NB, True, True, True, True,
        )
        return jnp.sum(ray_out[:, :3] * coeff)

    def loss_ref(packed, feat, basis16):
        rgb, _, _, _ = _ref_composite(packed, feat, basis16, z, noise,
                                      noise_sel, True)
        return jnp.sum(rgb * coeff)

    v0 = float(loss_fused(packed, feat, basis16))
    v1 = float(loss_ref(packed, feat, basis16))
    assert abs(v0 - v1) < 2e-3 * max(1.0, abs(v1))

    g0 = jax.grad(loss_fused, argnums=(0, 1, 2))(packed, feat, basis16)
    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(packed, feat, basis16)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3 * scale)


def test_fused_render_depth_opacity_grads():
    """The depth/opacity cotangent path (noise-free transmittance)."""
    packed, feat, basis16, z, noise, noise_sel = _setup(seed=1)

    def loss_fused(packed):
        ray_out, _ = fused_render(
            packed, feat, basis16, z, noise, noise_sel,
            DEPTH, SKIPS, S, NB, True, True, True, True,
        )
        return jnp.sum(ray_out[:, 3] * 0.1 + ray_out[:, 4])

    def loss_ref(packed):
        _, depth, opac, _ = _ref_composite(packed, feat, basis16, z, noise,
                                           noise_sel, True)
        return jnp.sum(depth[:, 0] * 0.1 + opac[:, 0])

    g0 = jax.grad(loss_fused)(packed)
    g1 = jax.grad(loss_ref)(packed)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3 * scale)


def _quarantined_sizes():
    from mc_nerf_tpu.ops.pallas import fused_render as fr

    # the production table is empty as of round 5 (the round-2 s=64 fault
    # retired on probe + equivalence evidence — see _QUARANTINED_S); the pad
    # MECHANISM stays tested via a synthetic entry so any future sweep hit
    # can be quarantined with one line and full coverage
    return sorted(fr._QUARANTINED_S) or [16]


@pytest.mark.parametrize("s", _quarantined_sizes())
def test_fused_render_quarantined_s_pads_exactly(s, monkeypatch):
    """Every quarantined sample count (table from the
    scripts/dev_fault_sweep.py on-chip sweep; synthetic 16->24 entry when
    the production table is empty) runs padded with zero-delta phantom
    samples (_QUARANTINED_S).  The pad must be EXACT — forward outputs,
    wsel, and every gradient match the unpadded composite math.
    Parametrized over the whole table so any sweep-driven extension is
    covered automatically (VERDICT r3 #3)."""
    from mc_nerf_tpu.ops.pallas import fused_render as fr

    if s not in fr._QUARANTINED_S:
        monkeypatch.setitem(fr._QUARANTINED_S, s, s + 8)
    assert fr._safe_s(s) != s  # the quarantine is active
    packed, feat, basis16, z, noise, noise_sel = _setup(seed=2, s=s)
    coeff = jnp.asarray(
        np.random.default_rng(7).normal(size=(RAYS, 3)), jnp.float32
    )

    ray_out, wsel = fused_render(
        packed, feat, basis16, z, noise, noise_sel,
        DEPTH, SKIPS, s, NB, True, True, True, True,
    )
    rgb_r, depth_r, opac_r, wsel_r = _ref_composite(
        packed, feat, basis16, z, noise, noise_sel, True
    )
    assert wsel.shape == (RAYS, s)
    np.testing.assert_allclose(np.asarray(ray_out[:, :3]), np.asarray(rgb_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ray_out[:, 3:4]), np.asarray(depth_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ray_out[:, 4:5]), np.asarray(opac_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(wsel), np.asarray(wsel_r),
                               rtol=0, atol=2e-4)

    def loss_fused(packed, feat, basis16):
        out, _ = fused_render(
            packed, feat, basis16, z, noise, noise_sel,
            DEPTH, SKIPS, s, NB, True, True, True, True,
        )
        return jnp.sum(out[:, :3] * coeff)

    def loss_ref(packed, feat, basis16):
        rgb, _, _, _ = _ref_composite(packed, feat, basis16, z, noise,
                                      noise_sel, True)
        return jnp.sum(rgb * coeff)

    g0 = jax.grad(loss_fused, argnums=(0, 1, 2))(packed, feat, basis16)
    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(packed, feat, basis16)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert a.shape == b.shape  # dfeat un-padded back to the caller's s
        scale = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3 * scale)


def test_render_rays_train_pallas_matches_xla():
    """The fully-fused train path consumes identical PRNG streams to the XLA
    path, so outputs agree to bf16-accumulation tolerance."""
    from mc_nerf_tpu.config import NerfConfig
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_train

    cfg = NerfConfig(
        samples_coarse=16, emb_freqs_xyz=4, sh_deg=SH_DEG,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=2, fine_width=32, fine_skips=(1,),
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kd, _ = jax.random.split(jax.random.PRNGKey(1))
    rays_d = jax.random.normal(kd, (24, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (24, 1))

    common = dict(
        key=jax.random.PRNGKey(2), step_r=jnp.float32(0.6), cfg=cfg,
        barf_window=(0.2, 0.8), barf_on=True, compute_dtype=jnp.bfloat16,
        fine_mode="importance", importance_samples=16,
    )
    c0, f0 = render_rays_train(params, rays_d, rays_o, use_pallas=False, **common)
    c1, f1 = render_rays_train(params, rays_d, rays_o, use_pallas=True,
                               interpret=True, **common)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=0.04)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=0.04)


def test_render_rays_train_pallas_grads_flow_to_cameras():
    """Camera gradients flow through feat (xyz) and basis (directions) in
    the fused path — the composite's z input is nondiff by design."""
    from mc_nerf_tpu.config import NerfConfig
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_train

    cfg = NerfConfig(
        samples_coarse=16, emb_freqs_xyz=4, sh_deg=SH_DEG,
        coarse_depth=2, coarse_width=32, coarse_skips=(1,),
        fine_depth=2, fine_width=32, fine_skips=(1,),
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kd, _ = jax.random.split(jax.random.PRNGKey(1))
    rays_d0 = jax.random.normal(kd, (24, 3))
    rays_d0 = rays_d0 / jnp.linalg.norm(rays_d0, axis=-1, keepdims=True)
    rays_o0 = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (24, 1))

    def loss(params, rays_d, rays_o, use_pallas):
        c, f = render_rays_train(
            params, rays_d, rays_o,
            key=jax.random.PRNGKey(2), step_r=jnp.float32(0.6), cfg=cfg,
            barf_window=(0.2, 0.8), barf_on=True, compute_dtype=jnp.bfloat16,
            fine_mode="importance", importance_samples=16,
            use_pallas=use_pallas, interpret=use_pallas,
        )
        return jnp.mean(c**2) + jnp.mean(f**2)

    g0 = jax.grad(loss, argnums=(0, 1, 2))(params, rays_d0, rays_o0, False)
    g1 = jax.grad(loss, argnums=(0, 1, 2))(params, rays_d0, rays_o0, True)
    # ray-direction/origin grads: the camera path must be alive and aligned
    for a, b in zip(jax.tree.leaves(g0[1:]), jax.tree.leaves(g1[1:])):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.abs(b).max() > 0
        scale = max(1e-4, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=0.08 * scale)
    # parameter grads aligned too
    for a, b in zip(jax.tree.leaves(g0[0]), jax.tree.leaves(g1[0])):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-4, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=0.08 * scale)


def test_fused_render_support_ceiling(monkeypatch):
    """s above the measured support ceiling (_MAX_FUSED_S, round-5 sweep:
    the composite backward's VMEM stack allocation fails to compile there)
    is refused with an actionable error instead of surfacing an opaque
    compile-time OOM; the sweep's raw escape hatch still probes it."""
    from mc_nerf_tpu.ops.pallas import fused_render as fr

    monkeypatch.delenv("MC_NERF_FUSED_RAW_S", raising=False)
    assert fr._safe_s(fr._MAX_FUSED_S) == fr._MAX_FUSED_S
    with pytest.raises(ValueError, match="support\nceiling|support ceiling"):
        fr._safe_s(fr._MAX_FUSED_S + 8)
    monkeypatch.setenv("MC_NERF_FUSED_RAW_S", "1")
    assert fr._safe_s(fr._MAX_FUSED_S + 8) == fr._MAX_FUSED_S + 8
