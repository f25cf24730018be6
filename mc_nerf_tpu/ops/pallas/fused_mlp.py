"""Fused positional-encode -> NeRF MLP -> heads Pallas kernel.

Why: the XLA path materializes every trunk activation in HBM
([points, width] bf16 per layer, ~0.5 GB per layer at eval scale), making
the forward pass bandwidth-bound (~10-40 TFLOP/s observed of ~197 peak).
This kernel keeps the whole per-point pipeline in VMEM: a block of points is
encoded, pushed through all trunk layers + both heads, and only the packed
(sigma | SH) output [points, 32] ever returns to HBM.  Weights (~1.3 MB
bf16 for the fine MLP) stay resident across grid steps.

Layout notes:
  * encode features live in a kernel-friendly order
    ``[x, y, z, pad, sin(f0)*3, cos(f0)*3, sin(f1)*3, ...]`` — 64 lanes for
    the reference's 10 octaves; ``pack_mlp_params`` permutes the first
    weight matrix's rows (and each skip layer's input block) to match, so
    results are bit-identical in layout to the XLA path's semantics;
  * both heads are packed into two GEMMs: their first layers concatenate to
    [width, 2*width]; their second layers form a block-diagonal
    [2*width, 32] with column 0 = sigma and columns 1..27 = SH coefficients;
  * weights are stored bf16, matmuls accumulate in fp32 (MXU native).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mc_nerf_tpu.models.mlp import NerfMLPParams

ENC_PAD = 4  # [x, y, z, pad] header lanes in the encode layout


class PackedMLP(NamedTuple):
    """Kernel-ready weights (bf16, padded/permuted). All leaves are arrays,
    so this passes straight through jit boundaries."""

    trunk_w: Tuple[jnp.ndarray, ...]   # first/skip layers row-permuted
    trunk_b: Tuple[jnp.ndarray, ...]
    head_w0: jnp.ndarray               # [width, 2*width]
    head_b0: jnp.ndarray               # [1, 2*width]
    head_w1: jnp.ndarray               # [2*width, 32] block diagonal
    head_b1: jnp.ndarray               # [1, 32]


def _enc_permutation(n_freqs: int) -> np.ndarray:
    """Map original encode row order -> kernel encode lane order.

    Original (models/encoding.py): [x(3), then per-dim d: sin f0..fL-1,
    cos f0..fL-1].  Kernel: [x(3), pad, then per-freq f: sin over dims,
    cos over dims].  Returns ``perm`` with perm[new_row] = old_row (or -1
    for the pad lane).
    """
    width = ENC_PAD + 6 * n_freqs
    perm = np.full(width, -1, dtype=np.int64)
    perm[0:3] = [0, 1, 2]
    for f in range(n_freqs):
        for d in range(3):
            perm[ENC_PAD + 6 * f + d] = 3 + d * 2 * n_freqs + f               # sin
            perm[ENC_PAD + 6 * f + 3 + d] = 3 + d * 2 * n_freqs + n_freqs + f  # cos
    return perm


def _permute_rows(w: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """[in_dim, out] -> [len(perm), out] with zero rows where perm == -1."""
    out = jnp.zeros((len(perm), w.shape[1]), w.dtype)
    src = np.where(perm >= 0, perm, 0)
    gathered = w[src]
    mask = (perm >= 0)[:, None]
    return out + jnp.where(mask, gathered, 0.0)


def pack_mlp_params(
    params: NerfMLPParams,
    n_freqs: int,
    skips: Sequence[int],
    dtype=jnp.bfloat16,
) -> PackedMLP:
    """Convert fp32 training params into the kernel layout (call per step —
    it is a handful of pads/permutes, fused into the surrounding jit)."""
    perm = _enc_permutation(n_freqs)
    enc_w = ENC_PAD + 6 * n_freqs
    trunk_w, trunk_b = [], []
    for i, (w, b) in enumerate(zip(params.trunk_w, params.trunk_b)):
        if i == 0:
            w2 = _permute_rows(w, perm)
        elif i in skips:
            # original skip input rows are [enc(3+6L) | h(width)] (the
            # reference concatenates the encoded input first,
            # net_block.py:71); the kernel concatenates [F(4+6L) | h], so
            # permute/pad the encode block and keep the hidden block
            n_enc = 3 + 6 * n_freqs
            enc_block = _permute_rows(w[:n_enc], perm)
            h_block = w[n_enc:]
            w2 = jnp.concatenate([enc_block, h_block], axis=0)
        else:
            w2 = w
        trunk_w.append(w2.astype(dtype))
        trunk_b.append(b.reshape(1, -1).astype(dtype))

    width = params.sigma_w0.shape[0]
    head_w0 = jnp.concatenate([params.sigma_w0, params.sh_w0], axis=1)
    head_b0 = jnp.concatenate([params.sigma_b0, params.sh_b0])[None]
    sh_dim = params.sh_w1.shape[1]
    head_w1 = jnp.zeros((2 * width, 32), jnp.float32)
    head_w1 = head_w1.at[:width, 0:1].set(params.sigma_w1)
    head_w1 = head_w1.at[width:, 1 : 1 + sh_dim].set(params.sh_w1)
    head_b1 = jnp.zeros((32,), jnp.float32)
    head_b1 = head_b1.at[0:1].set(params.sigma_b1)
    head_b1 = head_b1.at[1 : 1 + sh_dim].set(params.sh_b1)
    return PackedMLP(
        tuple(trunk_w),
        tuple(trunk_b),
        head_w0.astype(dtype),
        head_b0.astype(dtype),
        head_w1.astype(dtype),
        head_b1[None].astype(dtype),
    )


def _encode_tables(n_freqs: int):
    """Constant tables for the in-kernel encode.

    spread: [4, 4+6L] selection/scale matrix so that ``xyz4 @ spread`` puts
    ``x_d * 2^f`` in every sin/cos lane (and x, y, z, 0 in the header) —
    one tiny MXU op instead of 2L+1 narrow lane-concats (which force a
    128-lane relayout per piece and are catastrophically slow).
    sin_mask / cos_mask: [1, 4+6L] lane selectors.
    freq_lane: [L -> lane weight broadcast map] handled via a [1, 4+6L]
    per-lane BARF weight vector built by the caller.
    """
    width = ENC_PAD + 6 * n_freqs
    spread = np.zeros((4, width), np.float32)
    spread[0, 0] = spread[1, 1] = spread[2, 2] = 1.0
    sin_mask = np.zeros((1, width), np.float32)
    cos_mask = np.zeros((1, width), np.float32)
    for f in range(n_freqs):
        for d in range(3):
            j_sin = ENC_PAD + 6 * f + d
            j_cos = ENC_PAD + 6 * f + 3 + d
            spread[d, j_sin] = 2.0 ** f
            spread[d, j_cos] = 2.0 ** f
            sin_mask[0, j_sin] = 1.0
            cos_mask[0, j_cos] = 1.0
    return spread, sin_mask, cos_mask


def lane_freq_weights(freq_weights: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """[L] BARF gate -> [1, 4+6L] per-lane multiplier (header lanes = 1)."""
    width = ENC_PAD + 6 * n_freqs
    lanes = jnp.ones((width,), jnp.float32)
    for f in range(n_freqs):
        lanes = lanes.at[ENC_PAD + 6 * f : ENC_PAD + 6 * f + 6].set(freq_weights[f])
    return lanes[None]


def _kernel(n_freqs: int, depth: int, skips: Tuple[int, ...]):
    """Build the kernel body for a static MLP config."""

    def body(xyz_ref, lane_w_ref, spread_ref, sin_ref, cos_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        xyz = xyz_ref[...].astype(jnp.float32)          # [B, 4]
        spread = spread_ref[...]
        sin_m = sin_ref[...]
        cos_m = cos_ref[...]
        raw = jnp.dot(xyz, spread, preferred_element_type=jnp.float32)
        enc = raw + sin_m * (jnp.sin(raw) - raw) + cos_m * (jnp.cos(raw) - raw)
        feat = (enc * lane_w_ref[...]).astype(jnp.bfloat16)   # [B, 4+6L]

        idx = 0
        h = feat
        for i in range(depth):
            if i in skips:
                h = jnp.concatenate([feat, h], axis=1)
            w = wrefs[idx][...]
            b = wrefs[idx + 1][...]
            idx += 2
            acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.maximum(acc + b.astype(jnp.float32), 0.0).astype(jnp.bfloat16)

        hw0 = wrefs[idx][...]
        hb0 = wrefs[idx + 1][...]
        hw1 = wrefs[idx + 2][...]
        hb1 = wrefs[idx + 3][...]
        h1 = jnp.dot(h, hw0, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + hb0.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        out = jnp.dot(h1, hw1, preferred_element_type=jnp.float32)
        out_ref[...] = out + hb1.astype(jnp.float32)

    return body


@functools.partial(
    jax.jit, static_argnames=("n_freqs", "depth", "skips", "block", "interpret")
)
def fused_mlp_forward(
    packed: PackedMLP,
    xyz: jnp.ndarray,
    freq_weights: jnp.ndarray,
    n_freqs: int,
    depth: int,
    skips: Tuple[int, ...],
    block: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused kernel over points.

    Args:
      packed: kernel-layout weights (see :func:`pack_mlp_params`).
      xyz: [P, 3] sample positions (any float dtype).
      freq_weights: [n_freqs] BARF gate (ones when off).
      block: points per grid step.

    Returns:
      [P, 32] fp32 packed outputs: col 0 = raw sigma, cols 1..27 = SH.
    """
    p = xyz.shape[0]
    padded = -(-p // block) * block
    xyz4 = jnp.zeros((padded, 4), jnp.float32).at[:p, :3].set(xyz.astype(jnp.float32))
    lane_w = lane_freq_weights(freq_weights, n_freqs)
    spread_np, sin_np, cos_np = _encode_tables(n_freqs)
    spread = jnp.asarray(spread_np)
    sin_m = jnp.asarray(sin_np)
    cos_m = jnp.asarray(cos_np)

    weights_flat = []
    for w, b in zip(packed.trunk_w, packed.trunk_b):
        weights_flat += [w, b]
    weights_flat += [packed.head_w0, packed.head_b0, packed.head_w1, packed.head_b1]

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    grid = (padded // block,)
    out = pl.pallas_call(
        _kernel(n_freqs, depth, skips),
        out_shape=jax.ShapeDtypeStruct((padded, 32), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec(lane_w),
            const_spec(spread),
            const_spec(sin_m),
            const_spec(cos_m),
            *[const_spec(w) for w in weights_flat],
        ],
        out_specs=pl.BlockSpec((block, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xyz4, lane_w, spread, sin_m, cos_m, *weights_flat)
    return out[:p]
