"""Sinusoidal positional encoding with the BARF coarse-to-fine mask.

Channel layout matches the reference (``model/net_block.py:6-35``):
``[x (3) | per-dim: sin(f0..fL-1), cos(f0..fL-1)]`` so the BARF mask applies
per-frequency to contiguous groups of L channels.  The mask gates octave k by
training progress remapped into [barf_start, barf_end] with a cosine ramp
(``net_block.py:26-32``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def barf_weights(
    n_freqs: int,
    step_r: jnp.ndarray,
    barf_start: float,
    barf_end: float,
) -> jnp.ndarray:
    """Per-frequency BARF gate in [0, 1].

    alpha = (step_r - start)/(end - start) * L; octave k ramps up with a
    half-cosine as alpha crosses [k, k+1] (ref ``net_block.py:27-29``).

    Args:
      n_freqs: number of octaves L (static).
      step_r: scalar global training progress in [0, 1] (traced).
      barf_start/barf_end: global progress window of the ramp.

    Returns:
      [L] weights.
    """
    alpha = (step_r - barf_start) / (barf_end - barf_start) * n_freqs
    k = jnp.arange(n_freqs, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2.0


def sincos_spectrum(x: jnp.ndarray, n_freqs: int):
    """(sin, cos) of ``x * 2^f`` for f in [0, L), each [..., 3, L].

    Uses the double-angle recurrence: one sin+cos at the base octave, then
    ``s' = 2sc, c' = 1 - 2s^2`` per octave — 6 transcendentals per point
    instead of 6L.  TPU VPU transcendentals measured ~36 G/s on a v5e
    (3.2 ms per 897k points at L=10); the recurrence replaces them with
    ~6 fused multiply-adds per octave.  fp32 error after 9 doublings is
    ~5e-5 — far below the bf16 resolution the MLP consumes.
    """
    s0 = jnp.sin(x)
    c0 = jnp.cos(x)
    sins, coss = [s0], [c0]
    for _ in range(n_freqs - 1):
        s, c = sins[-1], coss[-1]
        sins.append(2.0 * s * c)
        coss.append(1.0 - 2.0 * s * s)
    return jnp.stack(sins, axis=-1), jnp.stack(coss, axis=-1)


def _encode_impl(x, n_freqs, freq_weights):
    sin, cos = sincos_spectrum(x, n_freqs)          # [..., 3, L] each
    if freq_weights is not None:
        w = freq_weights.astype(x.dtype)
        sin = sin * w
        cos = cos * w
    enc = jnp.stack([sin, cos], axis=-2)             # [..., 3, 2, L]
    enc = enc.reshape(*x.shape[:-1], 3 * 2 * n_freqs)
    return jnp.concatenate([x, enc], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _encode(x, n_freqs, freq_weights):
    return _encode_impl(x, n_freqs, freq_weights)


def _encode_fwd(x, n_freqs, freq_weights):
    return _encode_impl(x, n_freqs, freq_weights), (x, freq_weights)


def _encode_bwd(n_freqs, res, dfeat):
    """Analytic gradient, layout-clean: the autodiff of the stack/transpose
    chain materializes [..., 3, 2, L] cotangents in TPU-hostile layouts,
    and even flattening a self-built derivative spectrum to [..., 6L] costs
    a transposed-layout copy (~0.9 ms/step at train scale).  Instead split
    the COTANGENT's minor dim in place — [..., 6L] -> [..., 3, 2, L] is a
    free minor-split because the encode layout is dim-major — and contract
    against the 4-D derivative spectrum directly; XLA fuses the whole
    thing into one elementwise+reduce kernel."""
    x, freq_weights = res
    sin, cos = sincos_spectrum(x.astype(jnp.float32), n_freqs)
    f = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    if freq_weights is not None:
        f = f * freq_weights.astype(jnp.float32)
    spec4 = jnp.stack([cos * f, -sin * f], axis=-2)  # [..., 3, 2, L]
    df4 = dfeat[..., 3:].astype(jnp.float32).reshape(
        *x.shape[:-1], 3, 2, n_freqs
    )
    dx = dfeat[..., :3].astype(jnp.float32) + jnp.sum(df4 * spec4, axis=(-2, -1))
    dfw = None if freq_weights is None else jnp.zeros_like(freq_weights)
    return dx.astype(x.dtype), dfw


_encode.defvjp(_encode_fwd, _encode_bwd)


def _spectrum_rows(x_t: jnp.ndarray, n_freqs: int):
    """Per-octave (sin, cos) lists for [3, P] input — all lane-full."""
    s0 = jnp.sin(x_t)
    c0 = jnp.cos(x_t)
    sins, coss = [s0], [c0]
    for _ in range(n_freqs - 1):
        s, c = sins[-1], coss[-1]
        sins.append(2.0 * s * c)
        coss.append(1.0 - 2.0 * s * s)
    return sins, coss


def _encode_t_impl(x_t, n_freqs, freq_weights):
    sins, coss = _spectrum_rows(x_t, n_freqs)
    if freq_weights is not None:
        w = freq_weights.astype(x_t.dtype)
        sins = [sk * w[k] for k, sk in enumerate(sins)]
        coss = [ck * w[k] for k, ck in enumerate(coss)]
    rows = [x_t]
    for d in range(3):
        rows += [sk[d : d + 1] for sk in sins]
        rows += [ck[d : d + 1] for ck in coss]
    return jnp.concatenate(rows, axis=0)        # [3 + 6L, P]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _encode_t(x_t, n_freqs, freq_weights):
    return _encode_t_impl(x_t, n_freqs, freq_weights)


def _encode_t_fwd(x_t, n_freqs, freq_weights):
    return _encode_t_impl(x_t, n_freqs, freq_weights), (x_t, freq_weights)


def _encode_t_bwd(n_freqs, res, dfeat):
    """Analytic gradient in transposed space: every tensor is [*, P] with
    points on lanes, so the contraction fuses with zero relayouts."""
    x_t, freq_weights = res
    p = x_t.shape[-1]
    sins, coss = _spectrum_rows(x_t.astype(jnp.float32), n_freqs)
    f = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    if freq_weights is not None:
        f = f * freq_weights.astype(jnp.float32)
    s_all = jnp.stack(sins, axis=1)              # [3, L, P]
    c_all = jnp.stack(coss, axis=1)              # [3, L, P]
    df = dfeat[3:].astype(jnp.float32).reshape(3, 2, n_freqs, p)
    fcol = f[None, :, None]
    dx = dfeat[:3].astype(jnp.float32) + jnp.sum(
        df[:, 0] * (c_all * fcol) - df[:, 1] * (s_all * fcol), axis=1
    )
    dfw = None if freq_weights is None else jnp.zeros_like(freq_weights)
    return dx.astype(x_t.dtype), dfw


_encode_t.defvjp(_encode_t_fwd, _encode_t_bwd)


def sincos_encode_t(
    x_t: jnp.ndarray,
    n_freqs: int,
    freq_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Positional-encode points given TRANSPOSED: [3, P] -> [3(2L+1), P].

    Row c equals column c of :func:`sincos_encode` — same channel layout,
    built without ever materializing a [P, small] tensor.  On TPU the
    [P, 3] / [P, 3, 2, L] intermediates of the untransposed encode lane-pad
    up to 43x and cost ~3 ms/step of copies/dynamic-update-slices at train
    scale (HLO audit, scripts/dev_hlo_analysis.py); here every intermediate
    keeps points on the lane axis.  Consumers contract the leading channel
    axis directly (:func:`mc_nerf_tpu.models.mlp.apply_nerf_mlp_t`), so the
    [P, C] orientation never exists.
    """
    return _encode_t(x_t, n_freqs, freq_weights)


def sincos_encode(
    x: jnp.ndarray,
    n_freqs: int,
    freq_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Positional-encode points.

    Args:
      x: [..., 3] coordinates.
      n_freqs: octave count L (static); frequencies are 2^0 .. 2^(L-1).
      freq_weights: optional [L] BARF gate; None means no masking (the
        reference's barf_mode=False path).

    Returns:
      [..., 3*(2L+1)] encoded features ``[x, sin/cos spectrum]``.
    """
    return _encode(x, n_freqs, freq_weights)
