"""Tests for SH evaluation, positional encoding (BARF), and the NeRF MLP."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.models import (
    apply_nerf_mlp,
    barf_weights,
    eval_sh,
    init_nerf_mlp,
    sincos_encode,
)
from mc_nerf_tpu.models.sh import sh_basis


# --- SH -------------------------------------------------------------------

def _ref_eval_sh(deg, sh, dirs):
    """Literal numpy transcription of ref model/net_utils.py:103-191."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2]
                  - C1 * x * sh[..., 3])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
    return result


def test_eval_sh_matches_reference(rng):
    for deg in [0, 1, 2]:
        n_coef = (deg + 1) ** 2
        sh = rng.normal(size=(50, 3, n_coef)).astype(np.float32)
        dirs = rng.normal(size=(50, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ours = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        ref = _ref_eval_sh(deg, sh, dirs)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sh_basis_constant_term():
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    b = sh_basis(0, dirs)
    np.testing.assert_allclose(b, [[0.28209479177387814]], rtol=1e-7)


def test_eval_sh_deg4_shapes(rng):
    sh = jnp.asarray(rng.normal(size=(7, 3, 25)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
    out = eval_sh(4, sh, dirs)
    assert out.shape == (7, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


# --- encoding ---------------------------------------------------------------

def _ref_encode(x, n_freqs, barf=None):
    """Numpy transcription of ref model/net_block.py:20-33 (barf optional)."""
    freqs = 2.0 ** np.arange(n_freqs)
    spectrum = x[..., None] * freqs          # [N, 3, L]
    sin, cos = np.sin(spectrum), np.cos(spectrum)
    enc = np.stack([sin, cos], axis=-2)      # [N, 3, 2, L]
    enc = enc.reshape(x.shape[0], -1)
    if barf is not None:
        shape = enc.shape
        enc = enc.reshape(-1, n_freqs) * barf
        enc = enc.reshape(shape[0], -1)
    return np.concatenate([x, enc], axis=-1)


def test_encode_matches_reference_layout(rng):
    x = rng.normal(size=(20, 3)).astype(np.float32)
    ours = np.asarray(sincos_encode(jnp.asarray(x), 10))
    ref = _ref_encode(x, 10)
    assert ours.shape == (20, 63)
    # the double-angle recurrence accumulates ~2x fp32 error per octave:
    # ~5e-5 absolute at octave 10, far below the bf16 the MLP consumes
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_encode_with_barf_matches_reference(rng):
    x = rng.normal(size=(20, 3)).astype(np.float32)
    step_r, start, end = 0.5, 20 / 52, 36 / 52
    w = np.asarray(barf_weights(10, jnp.asarray(step_r), start, end))
    # reference formula (net_block.py:27-29)
    alpha = (step_r - start) / (end - start) * 10
    k = np.arange(10, dtype=np.float32)
    w_ref = (1 - np.cos(np.clip(alpha - k, 0, 1) * np.pi)) / 2
    np.testing.assert_allclose(w, w_ref, atol=1e-6)

    ours = np.asarray(sincos_encode(jnp.asarray(x), 10, jnp.asarray(w)))
    ref = _ref_encode(x, 10, barf=w_ref)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_barf_weights_endpoints():
    # before the window: all octaves off; after: all on
    np.testing.assert_allclose(barf_weights(10, jnp.asarray(0.0), 0.4, 0.7), np.zeros(10), atol=1e-7)
    np.testing.assert_allclose(barf_weights(10, jnp.asarray(1.0), 0.4, 0.7), np.ones(10), atol=1e-7)


# --- MLP --------------------------------------------------------------------

def test_mlp_shapes_and_finiteness(rng):
    key = jax.random.PRNGKey(0)
    params = init_nerf_mlp(key, in_dim=63, depth=4, width=128, skips=(2,), sh_dim=27)
    x = jnp.asarray(rng.normal(size=(17, 5, 63)).astype(np.float32))
    sigma, sh = apply_nerf_mlp(params, x, skips=(2,), compute_dtype=jnp.float32)
    assert sigma.shape == (17, 5, 1)
    assert sh.shape == (17, 5, 27)
    assert bool(jnp.all(jnp.isfinite(sigma))) and bool(jnp.all(jnp.isfinite(sh)))


def test_mlp_skip_concat_changes_with_input(rng):
    """Skip layers must re-inject the encoded input (ref net_block.py:69-72)."""
    key = jax.random.PRNGKey(1)
    params = init_nerf_mlp(key, in_dim=63, depth=4, width=32, skips=(2,), sh_dim=27)
    x1 = jnp.asarray(rng.normal(size=(4, 63)).astype(np.float32))
    s1, _ = apply_nerf_mlp(params, x1, skips=(2,), compute_dtype=jnp.float32)
    s2, _ = apply_nerf_mlp(params, x1 * 1.01, skips=(2,), compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_mlp_matches_torch_linear_stack(rng):
    """Golden check: our apply == torch's Linear/ReLU with the same weights."""
    import torch

    key = jax.random.PRNGKey(2)
    depth, width, in_dim, sh_dim, skips = 3, 16, 9, 12, (1,)
    params = init_nerf_mlp(key, in_dim, depth, width, skips, sh_dim)
    x = rng.normal(size=(8, in_dim)).astype(np.float32)

    h = torch.tensor(x)
    x0 = torch.tensor(x)
    for i in range(depth):
        if i in skips:
            h = torch.cat([x0, h], dim=-1)
        w = torch.tensor(np.asarray(params.trunk_w[i]))
        b = torch.tensor(np.asarray(params.trunk_b[i]))
        h = torch.relu(h @ w + b)
    s = torch.relu(h @ torch.tensor(np.asarray(params.sigma_w0)) + torch.tensor(np.asarray(params.sigma_b0)))
    sigma_t = s @ torch.tensor(np.asarray(params.sigma_w1)) + torch.tensor(np.asarray(params.sigma_b1))
    c = torch.relu(h @ torch.tensor(np.asarray(params.sh_w0)) + torch.tensor(np.asarray(params.sh_b0)))
    sh_t = c @ torch.tensor(np.asarray(params.sh_w1)) + torch.tensor(np.asarray(params.sh_b1))

    sigma_j, sh_j = apply_nerf_mlp(params, jnp.asarray(x), skips, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sigma_j), sigma_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sh_j), sh_t.numpy(), atol=1e-4)


def test_encode_custom_vjp_matches_autodiff(rng):
    from mc_nerf_tpu.models.encoding import _encode_impl

    x = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(40, 63)).astype(np.float32))
    w = np.linspace(0.2, 1.0, 10).astype(np.float32)

    for fw in (None, jnp.asarray(w)):
        g_custom = jax.grad(lambda xx: jnp.sum(sincos_encode(xx, 10, fw) * r))(x)
        g_auto = jax.grad(lambda xx: jnp.sum(_encode_impl(xx, 10, fw) * r))(x)
        # gradients scale with 2^f, so compare relatively (recurrence error
        # ~1e-3 relative at octave 10)
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_auto), rtol=3e-3, atol=1e-3
        )


# --- transposed ([C, P]) encode/MLP path ----------------------------------

def test_encode_t_matches_untransposed(rng):
    """Row c of sincos_encode_t == column c of sincos_encode (same layout)."""
    from mc_nerf_tpu.models.encoding import sincos_encode_t

    x = jnp.asarray(rng.normal(size=(37, 3)).astype(np.float32))
    w = jnp.asarray(np.linspace(0.2, 1.0, 10).astype(np.float32))
    for fw in (None, w):
        a = sincos_encode(x, 10, fw)                  # [P, C]
        b = sincos_encode_t(x.T, 10, fw)              # [C, P]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b.T), rtol=1e-5, atol=1e-5)


def test_encode_t_grad_matches_untransposed(rng):
    from mc_nerf_tpu.models.encoding import sincos_encode_t

    x = jnp.asarray(rng.normal(size=(23, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(23, 63)).astype(np.float32))
    w = jnp.asarray(np.linspace(0.2, 1.0, 10).astype(np.float32))
    for fw in (None, w):
        g_ref = jax.grad(lambda xx: jnp.sum(sincos_encode(xx, 10, fw) * r))(x)
        g_t = jax.grad(lambda xx: jnp.sum(sincos_encode_t(xx.T, 10, fw) * r.T))(x)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_ref), rtol=3e-3, atol=1e-3)


def test_mlp_t_matches_untransposed(rng):
    from mc_nerf_tpu.models.mlp import apply_nerf_mlp_t

    key = jax.random.PRNGKey(3)
    depth, width, in_dim, sh_dim, skips = 4, 32, 63, 27, (2,)
    params = init_nerf_mlp(key, in_dim, depth, width, skips, sh_dim)
    x = jnp.asarray(rng.normal(size=(19, in_dim)).astype(np.float32))
    s_ref, sh_ref = apply_nerf_mlp(params, x, skips, compute_dtype=jnp.float32)
    s_t, sh_t = apply_nerf_mlp_t(params, x.T, skips, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_t), np.asarray(sh_ref), rtol=1e-5, atol=1e-5)
    s_only, none_sh = apply_nerf_mlp_t(
        params, x.T, skips, compute_dtype=jnp.float32, sigma_only=True
    )
    assert none_sh is None
    np.testing.assert_allclose(np.asarray(s_only), np.asarray(s_ref), rtol=1e-5, atol=1e-5)


def test_mlp_t_grads_match_untransposed(rng):
    """Param + input grads agree between the [P, C] and [C, P] formulations."""
    from mc_nerf_tpu.models.mlp import apply_nerf_mlp_t

    key = jax.random.PRNGKey(4)
    depth, width, in_dim, sh_dim, skips = 3, 16, 9, 12, (1,)
    params = init_nerf_mlp(key, in_dim, depth, width, skips, sh_dim)
    x = jnp.asarray(rng.normal(size=(11, in_dim)).astype(np.float32))

    def loss_ref(p, xx):
        s, sh = apply_nerf_mlp(p, xx, skips, compute_dtype=jnp.float32)
        return jnp.sum(s**2) + jnp.sum(jnp.sin(sh))

    def loss_t(p, xx):
        s, sh = apply_nerf_mlp_t(p, xx.T, skips, compute_dtype=jnp.float32)
        return jnp.sum(s**2) + jnp.sum(jnp.sin(sh))

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_t, gx_t = jax.grad(loss_t, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gp_t), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_remat_shade_grads_identical(rng):
    """TrainConfig.remat_shade must be a pure perf knob: jax.checkpoint over
    the shade closures recomputes the same ops, so gradients are bitwise
    identical to the activation-saving path."""
    from mc_nerf_tpu.config import NerfConfig
    from mc_nerf_tpu.models.nerf import init_nerf_params, render_rays_train

    cfg = NerfConfig(
        emb_freqs_xyz=4, samples_coarse=16, occ_grid_size=0,
        coarse_depth=2, coarse_width=16, coarse_skips=(1,),
        fine_depth=2, fine_width=16, fine_skips=(1,),
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    rd = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.zeros((8, 3))

    def loss(p, remat):
        c, f = render_rays_train(
            p, rd, ro, jax.random.PRNGKey(2), jnp.float32(0.5), cfg,
            (0.1, 0.5), True, compute_dtype=jnp.float32,
            fine_mode="importance", importance_samples=8, remat_shade=remat,
        )
        return jnp.sum(c**2) + jnp.sum(f**2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
