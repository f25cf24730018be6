"""Volume rendering math: golden checks vs the reference formulas + analytics."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.ops.volume import (
    composite,
    compute_deltas,
    expand_bins_to_samples,
    select_fine_bins,
    sigma_to_weights,
)


def _softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def _ref_sigma2weights(deltas, sigmas):
    """Numpy transcription of ref mc_nerf.py:729-736 (noise-free)."""
    alphas = 1 - np.exp(-deltas * _softplus(sigmas))
    shifted = np.concatenate([np.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1)
    return alphas * np.cumprod(shifted, -1)[:, :-1]


def _ref_inference_composite(z_vals, sigmas, rgbs, white_back=True):
    """Numpy transcription of ref mc_nerf.py:705-727 (noise-free weights)."""
    deltas = np.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], 1e10 * np.ones_like(z_vals[:, :1])], -1
    )
    sigma_delta = _softplus(sigmas) * deltas
    alpha = 1 - np.exp(-sigma_delta)
    T = np.exp(-np.cumsum(np.concatenate(
        [np.zeros_like(sigma_delta[:, :1]), sigma_delta[:, :-1]], 1), 1))
    prob = (T * alpha)[..., None]
    opacity = prob.sum(1)
    depth = (z_vals[..., None] * prob).sum(1)
    weights = _ref_sigma2weights(deltas, sigmas)
    rgb = (weights[..., None] * rgbs).sum(1)
    if white_back:
        rgb = rgb + 1 - weights.sum(1, keepdims=True)
    return rgb, depth, opacity, weights


def test_composite_matches_reference(rng):
    z = np.sort(rng.uniform(1, 8, size=(6, 32)), axis=-1).astype(np.float32)
    sigma = rng.normal(size=(6, 32)).astype(np.float32) * 2
    rgb = rng.uniform(0, 1, size=(6, 32, 3)).astype(np.float32)
    ref_rgb, ref_depth, ref_opacity, ref_w = _ref_inference_composite(z, sigma, rgb)
    out = composite(jnp.asarray(z), jnp.asarray(sigma), jnp.asarray(rgb),
                    noise_key=None, white_back=True, last_inf=True)
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.opacity), ref_opacity, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.weights), ref_w, atol=1e-4)


def test_weights_sum_to_at_most_one(rng):
    z = np.sort(rng.uniform(1, 8, size=(10, 64)), axis=-1).astype(np.float32)
    sigma = rng.normal(size=(10, 64)).astype(np.float32) * 5
    w = sigma_to_weights(jnp.asarray(compute_deltas(jnp.asarray(z))), jnp.asarray(sigma))
    sums = np.asarray(jnp.sum(w, -1))
    assert np.all(sums <= 1.0 + 1e-5)
    assert np.all(sums >= 0.0)


def test_opaque_wall_depth():
    """A dense slab at z=4 -> depth ~= 4, opacity ~= 1, rgb = slab color."""
    n_s = 128
    z = np.broadcast_to(np.linspace(1, 8, n_s, dtype=np.float32), (2, n_s)).copy()
    sigma = np.full((2, n_s), -30.0, dtype=np.float32)
    slab = (z[0] >= 4.0) & (z[0] <= 4.5)
    sigma[:, slab] = 50.0
    rgb = np.zeros((2, n_s, 3), dtype=np.float32)
    rgb[..., 0] = 1.0  # red
    out = composite(jnp.asarray(z), jnp.asarray(sigma), jnp.asarray(rgb),
                    white_back=True)
    np.testing.assert_allclose(np.asarray(out.opacity)[:, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.depth)[:, 0], 4.0, atol=0.1)
    np.testing.assert_allclose(np.asarray(out.rgb)[:, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.rgb)[:, 1:], 0.0, atol=1e-2)


def test_empty_space_is_white_background():
    n_s = 64
    z = np.broadcast_to(np.linspace(1, 8, n_s, dtype=np.float32), (3, n_s)).copy()
    sigma = np.full((3, n_s), -20.0, dtype=np.float32)
    rgb = np.zeros((3, n_s, 3), dtype=np.float32)
    out = composite(jnp.asarray(z), jnp.asarray(sigma), jnp.asarray(rgb),
                    white_back=True, last_inf=False)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-4)


def test_select_fine_bins_basic():
    # ray 0: mass at bins 10, 11; ray 1: mass at bin 50
    w = np.full((2, 128), 1e-6, dtype=np.float32)
    w[0, 10] = 0.5
    w[0, 11] = 0.3
    w[1, 50] = 0.9
    bin_idx, valid = select_fine_bins(jnp.asarray(w), k=4, weight_thresh=1e-3)
    bi = np.asarray(bin_idx)
    va = np.asarray(valid)
    assert set(bi[0][va[0]]) == {10, 11}
    assert set(bi[1][va[1]]) == {50}
    # ascending order among valid
    assert list(bi[0][va[0]]) == sorted(bi[0][va[0]])


def test_select_fine_bins_threshold_uses_global_max():
    """If every weight < thresh, cutoff falls back to the global max
    (ref: min(thresh, weights.max()), mc_nerf.py:623)."""
    w = np.full((2, 16), 1e-8, dtype=np.float32)
    w[1, 3] = 1e-5  # global max, still below thresh
    bin_idx, valid = select_fine_bins(jnp.asarray(w), k=2, weight_thresh=1e-3)
    va = np.asarray(valid)
    assert va.sum() >= 1
    assert np.asarray(bin_idx)[1][va[1]][0] == 3


def test_expand_bins_to_samples():
    bin_idx = jnp.asarray(np.array([[2, 5]], dtype=np.int32))
    valid = jnp.asarray(np.array([[True, False]]))
    s_idx, s_valid = expand_bins_to_samples(bin_idx, valid, sample_scale=5)
    np.testing.assert_array_equal(
        np.asarray(s_idx)[0], [10, 11, 12, 13, 14, 25, 26, 27, 28, 29]
    )
    np.testing.assert_array_equal(np.asarray(s_valid)[0, :5], True)
    np.testing.assert_array_equal(np.asarray(s_valid)[0, 5:], False)


def test_gathered_composite_matches_full_grid_across_gaps():
    """Compositing a gathered grid subset with max_delta=grid step must match
    the reference's full-grid composite even when the selection has gaps:
    without the clamp, the sample before a gap absorbs the gap's length into
    its delta and its alpha inflates (ADVICE r1, medium)."""
    sf, near, far = 64, 1.0, 8.0
    step = (far - near) / (sf - 1)
    z_full = np.broadcast_to(
        np.linspace(near, far, sf, dtype=np.float32), (1, sf)
    ).copy()
    sigma_full = np.full((1, sf), -20.0, np.float32)   # ref sigma_default
    rgb_full = np.ones((1, sf, 3), np.float32)         # ref default white
    sel = np.array([5, 6, 7, 8, 9, 30, 31, 32, 33, 34])  # two runs, big gap
    sigma_full[0, sel] = 0.7                           # semi-transparent
    rgb_full[0, sel] = [0.2, 0.5, 0.8]
    ref_rgb, _, _, _ = _ref_inference_composite(z_full, sigma_full, rgb_full)

    z_g = jnp.asarray(z_full[:, sel])
    sigma_g = jnp.asarray(sigma_full[:, sel])
    rgb_g = jnp.asarray(rgb_full[:, sel])
    out = composite(z_g, sigma_g, rgb_g, noise_key=None, white_back=True,
                    last_inf=False, max_delta=step)
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-3)

    # without the clamp the gap-boundary sample's alpha inflates and the
    # composite diverges — the regression this test pins down.
    out_bad = composite(z_g, sigma_g, rgb_g, noise_key=None, white_back=True,
                        last_inf=False)
    assert np.abs(np.asarray(out_bad.rgb) - ref_rgb).max() > 0.05


def test_sigma_noise_is_applied(rng):
    z = np.sort(rng.uniform(1, 8, size=(4, 32)), axis=-1).astype(np.float32)
    sigma = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    deltas = compute_deltas(jnp.asarray(z))
    w0 = sigma_to_weights(deltas, sigma, noise_key=None)
    w1 = sigma_to_weights(deltas, sigma, noise_key=jax.random.PRNGKey(0))
    w2 = sigma_to_weights(deltas, sigma, noise_key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
    assert not np.allclose(np.asarray(w1), np.asarray(w2))
