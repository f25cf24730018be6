"""Volume-rendering math: alpha compositing and static-shape fine selection.

Reimplements the reference's stochastic compositing (``model/mc_nerf.py:682-736``)
and replaces its dynamic-shape hierarchical sampling (``torch.nonzero`` +
random cap, ``mc_nerf.py:613-632``) with a fixed-budget per-ray top-k —
static shapes are a hard requirement for XLA/TPU.

Semantics preserved from the reference:
  * ``sigma_to_weights``: alpha = 1 - exp(-softplus(sigma + noise) * delta);
    weights = alpha * cumprod([1, 1-alpha+1e-10])[:-1]  (mc_nerf.py:729-736).
  * the rgb composite uses those (optionally noisy) weights; depth/opacity
    use the noise-free transmittance path (mc_nerf.py:705-727).
  * unselected fine samples behave as sigma_default=-20, rgb=1
    (mc_nerf.py:692-694): alpha ~ 2e-9 per grid step, i.e. transparent.

Deliberate deviations (documented behavioral-parity exceptions):
  * fine budget is per-ray top-k bins instead of a global random cap — the
    reference caps *average* fine samples at 128/ray (mc_nerf.py:630-632);
    we keep >= that budget deterministically per ray.
  * eval adds no sigma noise (the reference injects N(0,1) noise even in its
    test path — a quality bug we do not replicate).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def compute_deltas(
    z_vals: jnp.ndarray,
    last_inf: bool = True,
    max_delta: Optional[float] = None,
) -> jnp.ndarray:
    """Inter-sample distances along the ray.

    Args:
      z_vals: [..., S] sorted sample depths.
      last_inf: append 1e10 as the final delta (ref mc_nerf.py:708-710);
        otherwise repeat the final spacing (used for gathered fine subsets,
        where the white background is added explicitly instead).
      max_delta: clamp every delta to this value.  Used when ``z_vals`` is a
        gathered subset of a uniform grid: the reference composites the FULL
        fine grid where every sample's delta is the grid step and skipped
        samples are effectively transparent (mc_nerf.py:692-710), so a
        selection gap must not inflate the delta of the sample before it.

    Returns:
      [..., S] deltas.
    """
    d = z_vals[..., 1:] - z_vals[..., :-1]
    if max_delta is not None:
        d = jnp.minimum(d, max_delta)
    if last_inf:
        last = jnp.full_like(d[..., :1], 1e10)
    else:
        last = d[..., -1:]
    return jnp.concatenate([d, last], axis=-1)


def sigma_to_weights(
    deltas: jnp.ndarray,
    sigma: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Compositing weights from raw densities (ref ``sigma2weights``).

    Args:
      deltas: [..., S] distances.
      sigma: [..., S] raw density outputs.
      noise_key: if given, adds N(0, 1) noise to sigma before the softplus —
        the reference's training-time regularizer (mc_nerf.py:730-731).

    Returns:
      [..., S] weights (alpha-composited contribution of each sample).
    """
    if noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape, sigma.dtype)
    sd = deltas * jax.nn.softplus(sigma)
    alpha = 1.0 - jnp.exp(-sd)
    # T_i = prod_{j<i} (1 - alpha_j) computed as exp(-cumsum sd): identical
    # because 1 - alpha = exp(-sd) exactly (the reference's +1e-10 cumprod
    # floor only differs beyond full opacity, where weights are ~0 anyway);
    # the lane-axis cumprod measured ~10x slower than cumsum on a v5e
    t_excl = jnp.exp(
        -jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(sd[..., :1]), sd[..., :-1]], axis=-1),
            axis=-1,
        )
    )
    return alpha * t_excl


class CompositeResult(NamedTuple):
    rgb: jnp.ndarray       # [..., 3]
    depth: jnp.ndarray     # [..., 1]
    opacity: jnp.ndarray   # [..., 1]
    weights: jnp.ndarray   # [..., S] (the rgb-path weights, possibly noisy)


def composite(
    z_vals: jnp.ndarray,
    sigma: jnp.ndarray,
    rgb: jnp.ndarray,
    noise_key: Optional[jax.Array] = None,
    white_back: bool = True,
    last_inf: bool = True,
    max_delta: Optional[float] = None,
) -> CompositeResult:
    """Alpha-composite per-sample density/color into per-ray outputs.

    Mirrors ref ``inference`` (mc_nerf.py:705-727): the rgb uses
    ``sigma_to_weights`` (optionally noisy); depth/opacity use the noise-free
    exp-cumsum transmittance.  Ray directions are unit-norm upstream, so
    ``dist = delta`` (ref multiplies by ||rays_d|| == 1).

    Args:
      z_vals: [..., S] sample depths (sorted).
      sigma: [..., S] raw densities.
      rgb: [..., S, 3] per-sample colors.
      noise_key: PRNG key for training-time sigma noise (None = eval).
      white_back: add (1 - sum w) white background (ref mc_nerf.py:724-725).
      last_inf: see :func:`compute_deltas`.
      max_delta: see :func:`compute_deltas` (grid-subset composites).
    """
    deltas = compute_deltas(z_vals, last_inf=last_inf, max_delta=max_delta)
    sigma_delta = jax.nn.softplus(sigma) * deltas
    alpha = 1.0 - jnp.exp(-sigma_delta)
    t_exclusive = jnp.exp(
        -jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(sigma_delta[..., :1]), sigma_delta[..., :-1]], axis=-1),
            axis=-1,
        )
    )
    prob = t_exclusive * alpha
    opacity = jnp.sum(prob, axis=-1, keepdims=True)
    depth = jnp.sum(z_vals * prob, axis=-1, keepdims=True)

    # noise-free rgb weights == the depth-path prob; only the training-time
    # noisy draw needs its own transmittance scan
    weights = prob if noise_key is None else sigma_to_weights(deltas, sigma, noise_key)
    rgb_out = jnp.sum(weights[..., None] * rgb, axis=-2)
    if white_back:
        rgb_out = rgb_out + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return CompositeResult(rgb_out, depth, opacity, weights)


def select_fine_bins(
    weights_coarse: jnp.ndarray,
    k: int,
    weight_thresh: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape replacement for the reference's fine-bin selection.

    Reference semantics (mc_nerf.py:623-632): keep every coarse bin with
    weight >= min(thresh, global_max), expand each into ``sample_scale``
    fine samples, randomly cap the *total* at rays*128.  Here: the FIRST k
    above-cutoff bins per ray in z order (front-to-back priority; the cap
    rarely binds at the reference threshold).  Bins below the cutoff keep
    their slot but are flagged invalid; the renderer substitutes
    sigma_default / white for them, matching the reference's treatment of
    unevaluated samples.

    Implementation is sort-free (top_k + argsort cost ~10 ms/step on a
    v5e): a cumsum assigns each selected bin its output slot and a one-hot
    contraction compacts the indices — pure VPU/MXU work, fully static.

    Args:
      weights_coarse: [R, S] coarse compositing weights (stop-gradient'd by
        the caller, as in the reference's ``with torch.no_grad()``).
      k: static per-ray bin budget.
      weight_thresh: the yaml ``weight_thresh`` (1e-3).

    Returns:
      (bin_idx [R, k] int32 ascending per ray, valid [R, k] bool).
    """
    num_bins = weights_coarse.shape[-1]
    cutoff = jnp.minimum(weight_thresh, jnp.max(weights_coarse))
    mask = weights_coarse >= cutoff                              # [R, S]
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1        # slot per bin
    slots = jnp.arange(k, dtype=jnp.int32)
    onehot = (pos[..., None] == slots) & mask[..., None]         # [R, S, k]
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    bin_idx = jnp.einsum(
        "rsk,s->rk", onehot.astype(jnp.float32), bins
    ).astype(jnp.int32)
    count = jnp.sum(mask, axis=-1, keepdims=True)                # [R, 1]
    valid = slots[None, :] < count
    bin_idx = jnp.where(valid, bin_idx, num_bins - 1)            # clamp for safe gathers
    return bin_idx, valid


def sample_pdf(
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling of fine depths from coarse weights.

    The TPU-native fast path for hierarchical sampling: a *fixed* number of
    samples per ray drawn from the coarse weight PMF — static shapes, no
    masks, no compaction, and crucially no HBM scatter (a batch-global
    scatter compaction measured 3.4 s/frame on a v5e; this is pure
    VPU work).  Replaces the reference's threshold-select-then-expand
    (``mc_nerf.py:623-632``) for evaluation; the grid-faithful path remains
    available via ``select_fine_bins`` (eval ``fine_mode="grid"``).

    Args:
      z_vals: [R, S] sorted coarse sample depths.
      weights: [R, S] coarse compositing weights (noise-free).
      n_samples: static fine-sample count per ray.
      key: optional PRNG key for stratified jitter (None = deterministic
        midpoint strata, the eval default).
      eps: PMF floor so background rays fall back to uniform sampling.

    Returns:
      [R, n_samples] sorted fine depths.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])            # [R, S-1]
    w = weights[..., 1:-1] + eps                                 # [R, S-2]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, S-1]

    shape = (*cdf.shape[:-1], n_samples)
    strata = jnp.arange(n_samples, dtype=jnp.float32)
    if key is None:
        u = jnp.broadcast_to((strata + 0.5) / n_samples, shape)
    else:
        u = (strata + jax.random.uniform(key, shape, jnp.float32)) / n_samples
    u = jnp.minimum(u, 1.0 - 1e-6)

    # gather-free inverse CDF: cdf and mids are monotone along the bin axis,
    # so the bracketing values are masked max/min *reductions* — pure VPU
    # work.  (take_along_axis here measured 40 ms/chunk on a v5e; this form
    # is 2.3 ms and bitwise identical.)
    mask = cdf[..., None, :] <= u[..., None]                     # [R, K, S-1]
    big = jnp.float32(1e10)
    cdf_lo = jnp.max(jnp.where(mask, cdf[..., None, :], -big), axis=-1)
    z_lo = jnp.max(jnp.where(mask, mids[..., None, :], -big), axis=-1)
    cdf_hi = jnp.min(jnp.where(mask, big, cdf[..., None, :]), axis=-1)
    z_hi = jnp.min(jnp.where(mask, big, mids[..., None, :]), axis=-1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-8, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return z_lo + t * (z_hi - z_lo)


def expand_bins_to_samples(
    bin_idx: jnp.ndarray,
    valid: jnp.ndarray,
    sample_scale: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand selected coarse bins into fine-grid sample indices.

    Each coarse bin b owns fine-grid slots [b*scale, (b+1)*scale) — the
    reference's index arithmetic at mc_nerf.py:628.

    Args:
      bin_idx: [R, k] selected coarse-bin indices (ascending).
      valid: [R, k] validity mask.
      sample_scale: fine samples per coarse bin (static).

    Returns:
      (sample_idx [R, k*scale] int32, sample_valid [R, k*scale] bool).
    """
    offsets = jnp.arange(sample_scale, dtype=bin_idx.dtype)
    sample_idx = bin_idx[..., None] * sample_scale + offsets   # [R, k, scale]
    sample_valid = jnp.broadcast_to(valid[..., None], sample_idx.shape)
    flat = sample_idx.shape[:-2] + (sample_idx.shape[-2] * sample_scale,)
    return sample_idx.reshape(flat), sample_valid.reshape(flat)
