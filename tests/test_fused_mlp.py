"""Fused Pallas encode->MLP->heads kernel vs the plain XLA path.

Runs in pallas interpret mode on the CPU test platform; the same kernel
compiles natively on TPU (exercised by bench/dev scripts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_nerf_tpu.models.encoding import barf_weights, sincos_encode
from mc_nerf_tpu.models.mlp import apply_nerf_mlp, init_nerf_mlp
from mc_nerf_tpu.ops.pallas.fused_mlp import (
    fused_mlp_forward,
    pack_mlp_params,
)


def _reference(params, xyz, n_freqs, skips, freq_w, compute_dtype):
    x_enc = sincos_encode(xyz, n_freqs, freq_w)
    sigma, sh = apply_nerf_mlp(params, x_enc, skips, compute_dtype)
    return sigma[:, 0], sh


CONFIGS = [
    # (n_freqs, depth, width, skips, label)
    (4, 2, 16, (1,), "tiny"),
    (10, 4, 128, (2,), "coarse"),
    (10, 8, 256, (4,), "fine"),
]


@pytest.mark.parametrize("n_freqs,depth,width,skips,label", CONFIGS)
def test_fused_matches_xla(rng, n_freqs, depth, width, skips, label):
    key = jax.random.PRNGKey(11)
    in_dim = 3 * (2 * n_freqs + 1)
    sh_dim = 27
    params = init_nerf_mlp(key, in_dim, depth, width, skips, sh_dim)
    xyz = jnp.asarray(rng.uniform(-4, 4, size=(300, 3)).astype(np.float32))
    ones = jnp.ones((n_freqs,), jnp.float32)

    sigma_ref, sh_ref = _reference(params, xyz, n_freqs, skips, None, jnp.float32)
    packed = pack_mlp_params(params, n_freqs, skips)
    out = fused_mlp_forward(
        packed, xyz, ones, n_freqs, depth, skips, block=128, interpret=True
    )
    sigma_k, sh_k = out[:, 0], out[:, 1:28]

    # both paths use bf16 weights/activations with fp32 accumulation; compare
    # against the fp32 reference with a bf16-scale tolerance, and require the
    # kernel to be at least as close as the bf16 XLA path (x4 slack)
    sigma_bf, sh_bf = _reference(params, xyz, n_freqs, skips, None, jnp.bfloat16)
    tol_sigma = max(4 * float(jnp.abs(sigma_bf - sigma_ref).max()), 1e-3)
    tol_sh = max(4 * float(jnp.abs(sh_bf - sh_ref).max()), 1e-3)
    assert float(jnp.abs(sigma_k - sigma_ref).max()) < tol_sigma
    assert float(jnp.abs(sh_k - sh_ref).max()) < tol_sh
    # unused packed lanes stay identically zero-biased
    np.testing.assert_allclose(np.asarray(out[:, 28:]), 0.0, atol=1e-6)


def test_fused_barf_gating(rng):
    """BARF frequency weights gate the kernel exactly like the XLA encoder."""
    n_freqs, depth, width, skips = 6, 3, 32, (1,)
    key = jax.random.PRNGKey(3)
    params = init_nerf_mlp(key, 3 * (2 * n_freqs + 1), depth, width, skips, 27)
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(100, 3)).astype(np.float32))
    fw = barf_weights(n_freqs, jnp.asarray(0.4), 0.1, 0.5)

    sigma_ref, sh_ref = _reference(params, xyz, n_freqs, skips, fw, jnp.float32)
    packed = pack_mlp_params(params, n_freqs, skips)
    out = fused_mlp_forward(
        packed, xyz, fw, n_freqs, depth, skips, block=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out[:, 0]), sigma_ref, atol=5e-2)
    np.testing.assert_allclose(np.asarray(out[:, 1:28]), sh_ref, atol=5e-2)


def test_fused_sigma_only_pack(rng):
    """sigma_only pack: col 0 matches the full pack, SH cols are zero."""
    n_freqs, depth, width, skips = 4, 2, 16, (1,)
    key = jax.random.PRNGKey(9)
    params = init_nerf_mlp(key, 3 * (2 * n_freqs + 1), depth, width, skips, 27)
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(64, 3)).astype(np.float32))
    ones = jnp.ones((n_freqs,), jnp.float32)
    full = fused_mlp_forward(
        pack_mlp_params(params, n_freqs, skips),
        xyz, ones, n_freqs, depth, skips, block=64, interpret=True,
    )
    sig = fused_mlp_forward(
        pack_mlp_params(params, n_freqs, skips, sigma_only=True),
        xyz, ones, n_freqs, depth, skips, block=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(sig[:, 0]), np.asarray(full[:, 0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sig[:, 1:]), 0.0, atol=1e-6)


def test_fused_ragged_tail(rng):
    """Point counts that don't divide the block are zero-padded then sliced."""
    n_freqs, depth, width, skips = 4, 2, 16, (1,)
    key = jax.random.PRNGKey(5)
    params = init_nerf_mlp(key, 3 * (2 * n_freqs + 1), depth, width, skips, 27)
    packed = pack_mlp_params(params, n_freqs, skips)
    ones = jnp.ones((n_freqs,), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(130, 3)).astype(np.float32))
    full = fused_mlp_forward(
        packed, xyz, ones, n_freqs, depth, skips, block=128, interpret=True
    )
    assert full.shape == (130, 32)
    # the same leading points give the same result regardless of padding
    part = fused_mlp_forward(
        packed, xyz[:64], ones, n_freqs, depth, skips, block=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(part), np.asarray(full[:64]), atol=2e-2)


def test_fused_mlp_custom_vjp_matches_xla_grads(rng):
    """Gradients through the bwd kernel match jax.grad of the XLA path."""
    import jax.numpy as jnp2
    from mc_nerf_tpu.ops.pallas.fused_mlp import encode_kernel_order, fused_mlp

    n_freqs, depth, width, skips = 4, 3, 16, (1,)
    key = jax.random.PRNGKey(21)
    params = init_nerf_mlp(key, 3 * (2 * n_freqs + 1), depth, width, skips, 27)
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(96, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, size=(96, 28)).astype(np.float32))

    def loss_xla(p, x):
        enc = sincos_encode(x, n_freqs, None)
        sig, sh = apply_nerf_mlp(p, enc, skips, jnp.float32)
        out = jnp.concatenate([sig, sh], axis=-1)
        return jnp.mean((out - tgt) ** 2)

    def loss_ker(p, x):
        packed = pack_mlp_params(p, n_freqs, skips, dtype=jnp2.float32)
        feat = encode_kernel_order(x, n_freqs, None, dtype=jnp2.float32)
        out = fused_mlp(packed, feat, depth, skips, 32, True)
        return jnp.mean((out[:, :28] - tgt) ** 2)

    gx_p, gx_x = jax.grad(loss_xla, argnums=(0, 1))(params, xyz)
    gk_p, gk_x = jax.grad(loss_ker, argnums=(0, 1))(params, xyz)

    # floor covers the analytic-encode-bwd vs autodiff-of-recurrence gap
    for a, b in zip(jax.tree.leaves(gx_p), jax.tree.leaves(gk_p)):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=0.05 * scale + 5e-5
        )
    scale = max(float(jnp.abs(gx_x).max()), 1e-6)
    np.testing.assert_allclose(
        np.asarray(gk_x), np.asarray(gx_x), atol=0.05 * scale + 5e-5
    )
