"""Fused NeRF-MLP Pallas kernel (trunk + heads in VMEM) + kernel-order encode.

Why: the XLA path materializes every trunk activation in HBM
([points, width] bf16 per layer, ~0.5 GB per layer at eval scale), making
the forward pass bandwidth-bound.  This kernel keeps the whole per-point
MLP in VMEM: a block of pre-encoded points runs through all trunk layers +
both heads, and only the packed (sigma | SH) output [points, 32] returns to
HBM.  Weights (~1.3 MB bf16 for the fine MLP) stay VMEM-resident.

The positional encode runs OUTSIDE the kernel in XLA: measured on a v5e,
in-kernel sin/cos cost 3.2 ms per 897k points (VPU transcendentals at
~36 G/s) while the double-angle recurrence (``models/encoding.py``)
computes the same spectrum with 6 transcendentals per point and fuses into
the surrounding XLA graph.  A pure-MLP kernel runs at ~247 Mpts/s (coarse
4x128 sigma-only) / ~94 Mpts/s (fine 8x256), vs ~92/62 with in-kernel
encode.

Layout notes:
  * encode features are ``[x, y, z, pad, sin(f0)*3, cos(f0)*3, sin(f1)*3,
    ...]`` — 64 lanes for the reference's 10 octaves; ``pack_mlp_params``
    permutes the first weight matrix's rows (and each skip layer's input
    block) to match;
  * both heads pack into two GEMMs: first layers concatenate to
    [width, 2*width]; second layers form a block-diagonal [2*width, 32]
    with column 0 = sigma and columns 1..27 = SH coefficients.  With
    ``sigma_only=True`` (the eval coarse pass: its rgb is never used) the
    heads are just the sigma pair — ~40% of the coarse FLOPs saved;
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

from mc_nerf_tpu.models.encoding import sincos_spectrum
from mc_nerf_tpu.models.mlp import NerfMLPParams

ENC_PAD = 4  # [x, y, z, pad] header lanes in the encode layout


class PackedMLP(NamedTuple):
    """Kernel-ready weights (bf16, padded/permuted). All leaves are arrays,
    so this passes straight through jit boundaries."""

    trunk_w: Tuple[jnp.ndarray, ...]   # first/skip layers row-permuted
    trunk_b: Tuple[jnp.ndarray, ...]
    head_w0: jnp.ndarray               # [width, 2*width] (or [w, w] sigma-only)
    head_b0: jnp.ndarray               # [1, 2*width]
    head_w1: jnp.ndarray               # [2*width, 32] block diagonal
    head_b1: jnp.ndarray               # [1, 32]


def encode_width(n_freqs: int) -> int:
    return ENC_PAD + 6 * n_freqs


def _encode_fwd_impl(xyz, n_freqs, freq_weights):
    # NOTE: a per-octave list + single 22-piece lane concat measured 2.5x
    # WORSE end-to-end (4.5 s/frame vs 1.8 s) — XLA lane-concats of skinny
    # tensors relayout per piece.  The stack/transpose chain below is the
    # faster known formulation.
    sin, cos = sincos_spectrum(xyz, n_freqs)        # [P, 3, L]
    if freq_weights is not None:
        w = freq_weights.astype(sin.dtype)
        sin = sin * w
        cos = cos * w
    # [P, L, 2, 3] -> [P, 6L] gives per-freq [sin x3, cos x3] blocks
    spec = jnp.stack([sin, cos], axis=-2)           # [P, 3, 2, L]
    spec = jnp.transpose(spec, (0, 3, 2, 1))        # [P, L, 2, 3]
    spec = spec.reshape(xyz.shape[0], 6 * n_freqs)
    pad = jnp.zeros((xyz.shape[0], 1), xyz.dtype)
    return jnp.concatenate([xyz, pad, spec], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _encode_core(xyz, n_freqs, freq_weights):
    return _encode_fwd_impl(xyz, n_freqs, freq_weights)


def _encode_core_fwd(xyz, n_freqs, freq_weights):
    return _encode_fwd_impl(xyz, n_freqs, freq_weights), (xyz, freq_weights)


def _encode_core_bwd(n_freqs, res, dfeat):
    """Analytic encode gradient, lane-efficient.

    The obvious per-octave loop accumulates on [P, 3] tensors — 3 of 128
    VPU lanes busy — and profiled at 6.8 ms/step at train scale.  Instead:
    rebuild the *derivative* spectrum in the kernel lane order with the
    same forward-shaped chain (d sin = 2^f cos, d cos = -2^f sin), multiply
    the full [P, 4+6L] cotangent lane-wise, and reduce each dim's lanes
    with one [4+6L, 3] selection matmul — every op runs at full lane
    width.  freq_weights is a schedule, not a parameter — its cotangent is
    zero by construction.
    """
    xyz, freq_weights = res
    dfeat = dfeat.astype(jnp.float32)
    x32 = xyz.astype(jnp.float32)
    p = x32.shape[0]
    sin, cos = sincos_spectrum(x32, n_freqs)         # [P, 3, L]
    f = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    if freq_weights is not None:
        f = f * freq_weights.astype(jnp.float32)
    spec = jnp.stack([cos * f, -sin * f], axis=-2)   # [P, 3, 2, L]
    spec = jnp.transpose(spec, (0, 3, 2, 1)).reshape(p, 6 * n_freqs)
    header = jnp.concatenate(
        [jnp.ones((p, 3), jnp.float32), jnp.zeros((p, 1), jnp.float32)], axis=1
    )
    deriv = jnp.concatenate([header, spec], axis=1)  # [P, 4+6L] kernel order
    sel = np.zeros((encode_width(n_freqs), 3), np.float32)
    for d in range(3):
        sel[d, d] = 1.0
        for fr in range(n_freqs):
            sel[ENC_PAD + 6 * fr + d, d] = 1.0
            sel[ENC_PAD + 6 * fr + 3 + d, d] = 1.0
    dx = (dfeat * deriv) @ jnp.asarray(sel)
    dfw = None if freq_weights is None else jnp.zeros_like(freq_weights)
    return dx.astype(xyz.dtype), dfw


_encode_core.defvjp(_encode_core_fwd, _encode_core_bwd)


def encode_kernel_order(
    xyz: jnp.ndarray,
    n_freqs: int,
    freq_weights: Optional[jnp.ndarray] = None,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Positional-encode points into the kernel's lane order.

    [x, y, z, 0, sin(f0) x3, cos(f0) x3, sin(f1) x3, ...] — per-frequency
    blocks so the BARF gate multiplies contiguous lanes.  Runs in XLA
    (double-angle spectrum, no per-octave transcendentals) and feeds
    :func:`fused_mlp_apply`.  Differentiable with an analytic custom VJP
    (see :func:`_encode_core_bwd`).

    Args:
      xyz: [P, 3] positions.
      n_freqs: octave count L.
      freq_weights: optional [L] BARF gate.

    Returns:
      [P, 4 + 6L] features in ``dtype``.
    """
    return _encode_core(xyz, n_freqs, freq_weights).astype(dtype)


def _enc_permutation(n_freqs: int) -> np.ndarray:
    """Map original encode row order -> kernel encode lane order.

    Original (models/encoding.py): [x(3), then per-dim d: sin f0..fL-1,
    cos f0..fL-1].  Kernel: [x(3), pad, then per-freq f: sin over dims,
    cos over dims].  Returns ``perm`` with perm[new_row] = old_row (or -1
    for the pad lane).
    """
    width = encode_width(n_freqs)
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
    sigma_only: bool = False,
    dtype=jnp.bfloat16,
) -> PackedMLP:
    """Convert fp32 training params into the kernel layout (a handful of
    pads/permutes — call once per render/step, fused into the outer jit)."""
    perm = _enc_permutation(n_freqs)
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
    if sigma_only:
        head_w0 = params.sigma_w0
        head_b0 = params.sigma_b0[None]
        head_w1 = jnp.zeros((width, 32), jnp.float32).at[:, 0:1].set(params.sigma_w1)
        head_b1 = jnp.zeros((32,), jnp.float32).at[0:1].set(params.sigma_b1)[None]
    else:
        head_w0 = jnp.concatenate([params.sigma_w0, params.sh_w0], axis=1)
        head_b0 = jnp.concatenate([params.sigma_b0, params.sh_b0])[None]
        sh_dim = params.sh_w1.shape[1]
        assert sh_dim <= 31, (
            f"packed head holds sigma + <=31 SH cols; got sh_dim={sh_dim} "
            "(SH degree > 2) — use the XLA path"
        )
        head_w1 = jnp.zeros((2 * width, 32), jnp.float32)
        head_w1 = head_w1.at[:width, 0:1].set(params.sigma_w1)
        head_w1 = head_w1.at[width:, 1 : 1 + sh_dim].set(params.sh_w1)
        head_b1 = jnp.zeros((32,), jnp.float32)
        head_b1 = head_b1.at[0:1].set(params.sigma_b1)
        head_b1 = head_b1.at[1 : 1 + sh_dim].set(params.sh_b1)[None]
    return PackedMLP(
        tuple(trunk_w),
        tuple(trunk_b),
        head_w0.astype(dtype),
        head_b0.astype(dtype),
        head_w1.astype(dtype),
        head_b1.astype(dtype),
    )


def _kernel(depth: int, skips: Tuple[int, ...]):
    """Kernel body for a static MLP config: trunk + packed heads."""

    def body(feat_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        feat = feat_ref[...]                                  # [B, 4+6L] bf16

        idx = 0
        h = feat
        for i in range(depth):
            if i in skips:
                h = jnp.concatenate([feat, h], axis=1)
            w = wrefs[idx][...].astype(jnp.bfloat16)
            b = wrefs[idx + 1][...]
            idx += 2
            acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.maximum(acc + b.astype(jnp.float32), 0.0).astype(jnp.bfloat16)

        hw0 = wrefs[idx][...].astype(jnp.bfloat16)
        hb0 = wrefs[idx + 1][...]
        hw1 = wrefs[idx + 2][...].astype(jnp.bfloat16)
        hb1 = wrefs[idx + 3][...]
        h1 = jnp.dot(h, hw0, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + hb0.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        out = jnp.dot(h1, hw1, preferred_element_type=jnp.float32)
        out_ref[...] = out + hb1.astype(jnp.float32)

    return body


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skips", "block", "interpret", "vmem_limit"),
)
def fused_mlp_apply(
    packed: PackedMLP,
    feat: jnp.ndarray,
    depth: int,
    skips: Tuple[int, ...],
    block: int = 2048,
    interpret: bool = False,
    vmem_limit: Optional[int] = 100 * 1024 * 1024,
) -> jnp.ndarray:
    """Run the fused MLP kernel over pre-encoded points.

    Args:
      packed: kernel-layout weights (see :func:`pack_mlp_params`).
      feat: [P, 4+6L] encoded features (:func:`encode_kernel_order`).
      depth/skips: static trunk config.
      block: points per grid step.

    Returns:
      [P, 32] fp32 packed outputs: col 0 = raw sigma, cols 1..27 = SH
      (zeros beyond col 0 for sigma-only packs).
    """
    p, enc_w = feat.shape
    padded = -(-p // block) * block
    if padded != p:
        feat = jnp.pad(feat, ((0, padded - p), (0, 0)))

    weights_flat = []
    for w, b in zip(packed.trunk_w, packed.trunk_b):
        weights_flat += [w, b]
    weights_flat += [packed.head_w0, packed.head_b0, packed.head_w1, packed.head_b1]
    # cast ONCE here, not per grid step — an fp32-packed tree (the training
    # primal) re-cast inside the body costs ~6x the whole backward
    weights_flat = [w.astype(jnp.bfloat16) for w in weights_flat]

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel(depth, skips),
        out_shape=jax.ShapeDtypeStruct((padded, 32), jnp.float32),
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((block, enc_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[const_spec(w) for w in weights_flat],
        ],
        out_specs=pl.BlockSpec((block, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(feat, *weights_flat)
    return out[:p]


def fused_mlp_forward(
    packed: PackedMLP,
    xyz: jnp.ndarray,
    freq_weights: Optional[jnp.ndarray],
    n_freqs: int,
    depth: int,
    skips: Tuple[int, ...],
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """encode (XLA) -> fused MLP kernel.  Convenience wrapper."""
    feat = encode_kernel_order(xyz, n_freqs, freq_weights)
    return fused_mlp_apply(packed, feat, depth, tuple(skips), block, interpret)


# ---------------------------------------------------------------------------
# fully-shaded kernel: trunk + heads + SH->rgb shading in one pallas call.
# The per-ray SH basis rides in as a [rays, 16] input whose block is
# broadcast across the samples-per-ray axis INSIDE the kernel (sublane
# broadcast + layout-free reshape), so the [points, 27] SH tensor never
# exists in HBM — slicing/einsum on it cost ~17 ms/step of padded-layout
# XLA glue at train scale.
# ---------------------------------------------------------------------------

BASIS_LANES = 16  # SH deg<=2 basis (9) padded to a power-of-two lane count


def _shade_tables(nb: int):
    """Constants for in-kernel shading (nb = (deg+1)^2 <= 9).

    tile:   [16, 32] — basis lane b -> sh lanes 1+nb*c+b (c = 0..2), so
            ``basis_rep @ tile`` aligns basis values with the SH columns.
    group:  [32, 8]  — col 0 -> col 0 (sigma), sh lanes of channel c ->
            col 1+c: ``(out32 * tiled) @ group`` is the SH contraction.
    rgbmask:[1, 8]   — 1 at the rgb columns (sigmoid is applied there).
    """
    tile = np.zeros((BASIS_LANES, 32), np.float32)
    for c in range(3):
        for b in range(nb):
            tile[b, 1 + nb * c + b] = 1.0
    group = np.zeros((32, 8), np.float32)
    group[0, 0] = 1.0
    for c in range(3):
        for b in range(nb):
            group[1 + nb * c + b, 1 + c] = 1.0
    rgbmask = np.zeros((1, 8), np.float32)
    rgbmask[0, 1:4] = 1.0
    return tile, group, rgbmask


def _shaded_fwd_kernel(depth: int, skips: Tuple[int, ...], s_per_ray: int):
    def body(feat_ref, basis_ref, tile_ref, group_ref, mask_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        feat = feat_ref[...]
        block = feat.shape[0]
        block_r = block // s_per_ray

        idx = 0
        h = feat
        for i in range(depth):
            if i in skips:
                h = jnp.concatenate([feat, h], axis=1)
            w = wrefs[idx][...].astype(jnp.bfloat16)
            b = wrefs[idx + 1][...]
            idx += 2
            acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.maximum(acc + b.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        hw0 = wrefs[idx][...].astype(jnp.bfloat16)
        hb0 = wrefs[idx + 1][...]
        hw1 = wrefs[idx + 2][...].astype(jnp.bfloat16)
        hb1 = wrefs[idx + 3][...]
        h1 = jnp.dot(h, hw0, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + hb0.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        out32 = jnp.dot(h1, hw1, preferred_element_type=jnp.float32)
        out32 = out32 + hb1.astype(jnp.float32)

        basis = basis_ref[...]                                  # [block_r, 16]
        basis_rep = jnp.broadcast_to(
            basis[:, None, :], (block_r, s_per_ray, BASIS_LANES)
        ).reshape(block, BASIS_LANES)
        tiled = jnp.dot(basis_rep, tile_ref[...],
                        preferred_element_type=jnp.float32)     # [B, 32]
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) == 0).astype(jnp.float32)
        raw8 = jnp.dot(out32 * (tiled + lane0), group_ref[...],
                       preferred_element_type=jnp.float32)      # [B, 8]
        m = mask_ref[...]
        out_ref[...] = raw8 + m * (jax.nn.sigmoid(raw8) - raw8)

    return body


def _shaded_bwd_kernel(depth: int, skips: Tuple[int, ...], n_w: int,
                       s_per_ray: int):
    def body(*refs):
        feat_ref, basis_ref, dout_ref = refs[0], refs[1], refs[2]
        tile_ref, group_ref, mask_ref = refs[3], refs[4], refs[5]
        wrefs = refs[6 : 6 + n_w]
        dfeat_ref = refs[6 + n_w]
        dbasis_ref = refs[7 + n_w]
        dwrefs = refs[8 + n_w :]

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in dwrefs:
                r[...] = jnp.zeros_like(r)

        feat = feat_ref[...]
        block = feat.shape[0]
        block_r = block // s_per_ray
        dout8 = dout_ref[...].astype(jnp.float32)               # [B, 8]

        # ---- recompute forward (activations stay in VMEM)
        xins = []
        h = feat
        idx = 0
        for i in range(depth):
            if i in skips:
                h = jnp.concatenate([feat, h], axis=1)
            xins.append(h)
            w = wrefs[idx][...].astype(jnp.bfloat16)
            b = wrefs[idx + 1][...]
            idx += 2
            acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.maximum(acc + b.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        h_last = h
        hw0 = wrefs[idx][...].astype(jnp.bfloat16)
        hb0 = wrefs[idx + 1][...]
        hw1 = wrefs[idx + 2][...].astype(jnp.bfloat16)
        hb1 = wrefs[idx + 3][...]
        h1 = jnp.dot(h_last, hw0, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + hb0.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        out32 = jnp.dot(h1, hw1, preferred_element_type=jnp.float32)
        out32 = out32 + hb1.astype(jnp.float32)

        basis = basis_ref[...]
        basis_rep = jnp.broadcast_to(
            basis[:, None, :], (block_r, s_per_ray, BASIS_LANES)
        ).reshape(block, BASIS_LANES)
        tile = tile_ref[...]
        tiled = jnp.dot(basis_rep, tile, preferred_element_type=jnp.float32)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) == 0).astype(jnp.float32)
        btp = tiled + lane0
        prod = out32 * btp
        raw8 = jnp.dot(prod, group_ref[...], preferred_element_type=jnp.float32)

        # ---- shading backward
        m = mask_ref[...]
        sig = jax.nn.sigmoid(raw8)
        draw8 = dout8 * (1.0 - m + m * sig * (1.0 - sig))       # [B, 8]
        t_dims = (((1,), (1,)), ((), ()))
        g_dims = (((0,), (0,)), ((), ()))
        dprod = jax.lax.dot_general(draw8, group_ref[...], t_dims,
                                    preferred_element_type=jnp.float32)
        dout32 = dprod * btp                                    # [B, 32]
        # dbasis: sum over samples within each ray of (dprod*out32) @ tile^T
        db_rep = jax.lax.dot_general(dprod * out32, tile, t_dims,
                                     preferred_element_type=jnp.float32)
        dbasis_ref[...] = jnp.sum(
            db_rep.reshape(block_r, s_per_ray, BASIS_LANES), axis=1
        )

        # ---- heads backward
        dout_b = dout32.astype(jnp.bfloat16)
        d_hw1 = jax.lax.dot_general(h1, dout_b, g_dims,
                                    preferred_element_type=jnp.float32)
        d_hb1 = jnp.sum(dout32, axis=0, keepdims=True)
        d_h1 = jax.lax.dot_general(dout_b, hw1, t_dims,
                                   preferred_element_type=jnp.float32)
        d_h1 = jnp.where(h1.astype(jnp.float32) > 0, d_h1, 0.0).astype(jnp.bfloat16)
        d_hw0 = jax.lax.dot_general(h_last, d_h1, g_dims,
                                    preferred_element_type=jnp.float32)
        d_hb0 = jnp.sum(d_h1.astype(jnp.float32), axis=0, keepdims=True)
        d_h = jax.lax.dot_general(d_h1, hw0, t_dims,
                                  preferred_element_type=jnp.float32)
        head_grads = [d_hw0, d_hb0, d_hw1, d_hb1]

        # ---- trunk backward
        d_feat = jnp.zeros_like(feat, dtype=jnp.float32)
        trunk_grads = [None] * (2 * depth)
        for i in reversed(range(depth)):
            w = wrefs[2 * i][...].astype(jnp.bfloat16)
            h_out = xins[i + 1][:, -w.shape[1]:] if i + 1 < depth else h_last
            d_a = jnp.where(h_out.astype(jnp.float32) > 0, d_h, 0.0).astype(jnp.bfloat16)
            trunk_grads[2 * i] = jax.lax.dot_general(
                xins[i], d_a, g_dims, preferred_element_type=jnp.float32
            )
            trunk_grads[2 * i + 1] = jnp.sum(
                d_a.astype(jnp.float32), axis=0, keepdims=True
            )
            d_xin = jax.lax.dot_general(d_a, w, t_dims,
                                        preferred_element_type=jnp.float32)
            if i in skips:
                e = feat.shape[1]
                d_feat = d_feat + d_xin[:, :e]
                d_h = d_xin[:, e:]
            else:
                d_h = d_xin
        d_feat = d_feat + d_h
        dfeat_ref[...] = d_feat

        for r, g in zip(dwrefs, trunk_grads + head_grads):
            r[...] += g

    return body


def _shaded_block(s_per_ray: int, target: int = 1536) -> int:
    """Points per grid step: a multiple of s_per_ray (each block covers
    whole rays).  block_r itself must be a multiple of 8 — the basis input
    block [block_r, 16] is sublane-tiled."""
    block_r = 8 * max(1, target // (8 * s_per_ray))
    return block_r * s_per_ray


def _pad_rays(arr, rays_pad, rays, per_ray_rows):
    if rays_pad == rays:
        return arr
    return jnp.pad(arr, ((0, (rays_pad - rays) * per_ray_rows), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("depth", "skips", "s_per_ray", "nb", "interpret")
)
def _shaded_fwd_call(packed, feat, basis16, depth, skips, s_per_ray, nb,
                     interpret):
    rays = basis16.shape[0]
    p = rays * s_per_ray
    assert feat.shape[0] == p, (feat.shape, rays, s_per_ray)
    block = _shaded_block(s_per_ray)
    block_r = block // s_per_ray
    rays_pad = -(-rays // block_r) * block_r
    feat = _pad_rays(feat, rays_pad, rays, s_per_ray)
    basis16 = _pad_rays(basis16, rays_pad, rays, 1)
    padded = rays_pad * s_per_ray

    tile_np, group_np, mask_np = _shade_tables(nb)
    tile = jnp.asarray(tile_np)
    group = jnp.asarray(group_np)
    mask = jnp.asarray(mask_np)

    weights_flat = []
    for w, b in zip(packed.trunk_w, packed.trunk_b):
        weights_flat += [w, b]
    weights_flat += [packed.head_w0, packed.head_b0, packed.head_w1, packed.head_b1]
    weights_flat = [w.astype(jnp.bfloat16) for w in weights_flat]

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _shaded_fwd_kernel(depth, skips, s_per_ray),
        out_shape=jax.ShapeDtypeStruct((padded, 8), jnp.float32),
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((block, feat.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, BASIS_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec(tile), const_spec(group), const_spec(mask),
            *[const_spec(w) for w in weights_flat],
        ],
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(feat, basis16, tile, group, mask, *weights_flat)
    return out[:p]


@functools.partial(
    jax.jit, static_argnames=("depth", "skips", "s_per_ray", "nb", "interpret")
)
def _shaded_bwd_call(packed, feat, basis16, dout8, depth, skips, s_per_ray,
                     nb, interpret):
    rays = basis16.shape[0]
    p = rays * s_per_ray
    block = _shaded_block(s_per_ray)
    block_r = block // s_per_ray
    rays_pad = -(-rays // block_r) * block_r
    feat = _pad_rays(feat, rays_pad, rays, s_per_ray)
    basis16 = _pad_rays(basis16, rays_pad, rays, 1)
    dout8 = _pad_rays(dout8, rays_pad, rays, s_per_ray)
    padded = rays_pad * s_per_ray

    tile_np, group_np, mask_np = _shade_tables(nb)
    tile = jnp.asarray(tile_np)
    group = jnp.asarray(group_np)
    mask = jnp.asarray(mask_np)

    weights_flat = []
    for w, b in zip(packed.trunk_w, packed.trunk_b):
        weights_flat += [w, b]
    weights_flat += [packed.head_w0, packed.head_b0, packed.head_w1, packed.head_b1]
    weights_bf = [w.astype(jnp.bfloat16) for w in weights_flat]
    n_w = len(weights_bf)

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((padded, feat.shape[1]), jnp.float32)]
        + [jax.ShapeDtypeStruct((rays_pad, BASIS_LANES), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights_bf]
    )
    out_specs = (
        [pl.BlockSpec((block, feat.shape[1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((block_r, BASIS_LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [const_spec(w) for w in weights_bf]
    )
    outs = pl.pallas_call(
        _shaded_bwd_kernel(depth, skips, n_w, s_per_ray),
        out_shape=out_shapes,
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((block, feat.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, BASIS_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec(tile), const_spec(group), const_spec(mask),
            *[const_spec(w) for w in weights_bf],
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(feat, basis16, dout8, tile, group, mask, *weights_bf)

    dfeat = outs[0][:p]
    dbasis = outs[1][:rays]
    dws = outs[2:]
    n_trunk = len(packed.trunk_w)
    dpacked = PackedMLP(
        trunk_w=tuple(dws[2 * i] for i in range(n_trunk)),
        trunk_b=tuple(dws[2 * i + 1] for i in range(n_trunk)),
        head_w0=dws[2 * n_trunk],
        head_b0=dws[2 * n_trunk + 1],
        head_w1=dws[2 * n_trunk + 2],
        head_b1=dws[2 * n_trunk + 3],
    )
    return dpacked, dfeat, dbasis


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_shaded_mlp(
    packed: PackedMLP,
    feat: jnp.ndarray,
    basis16: jnp.ndarray,
    depth: int,
    skips: Tuple[int, ...],
    s_per_ray: int,
    nb: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused MLP + SH shading.

    Args:
      packed: full (sigma+SH) kernel weights; fp32 leaves for training.
      feat: [rays * s_per_ray, 4+6L] encoded points, ray-major.
      basis16: [rays, 16] SH basis padded to 16 lanes.
      s_per_ray: static samples per ray (block-aligns the basis broadcast).
      nb: (sh_deg+1)**2 <= 9.

    Returns:
      [rays * s_per_ray, 8] fp32: col 0 = raw sigma, cols 1..3 = rgb
      (sigmoid applied), cols 4..7 zero.
    """
    return _shaded_fwd_call(packed, feat, basis16, depth, skips, s_per_ray,
                            nb, interpret)


def _fused_shaded_fwd(packed, feat, basis16, depth, skips, s_per_ray, nb,
                      interpret):
    out = _shaded_fwd_call(packed, feat, basis16, depth, skips, s_per_ray,
                           nb, interpret)
    return out, (packed, feat, basis16)


def _fused_shaded_bwd(depth, skips, s_per_ray, nb, interpret, res, dout8):
    packed, feat, basis16 = res
    dpacked, dfeat, dbasis = _shaded_bwd_call(
        packed, feat, basis16, dout8, depth, skips, s_per_ray, nb, interpret
    )
    dpacked = jax.tree.map(lambda g, w: g.astype(w.dtype), dpacked, packed)
    return (dpacked, dfeat.astype(feat.dtype), dbasis.astype(basis16.dtype))


fused_shaded_mlp.defvjp(_fused_shaded_fwd, _fused_shaded_bwd)


# ---------------------------------------------------------------------------
# differentiable kernel (training path): fwd reuses fused_mlp_apply; bwd is a
# second kernel that rematerializes activations block-wise in VMEM and
# accumulates weight grads across grid steps (sequential 'arbitrary' grid).
# ---------------------------------------------------------------------------


def _bwd_kernel(depth: int, skips: Tuple[int, ...], n_w: int):
    """Backward body.  refs layout:
    [feat, dout, *weights(w,b pairs + 4 head tensors), dfeat_out,
     *dweight_outs (same order as weights)].
    Weight-grad outputs use a constant index map; they are zero-initialized
    at grid step 0 and accumulated (+=) on every step.
    """

    def body(*refs):
        feat_ref, dout_ref = refs[0], refs[1]
        wrefs = refs[2 : 2 + n_w]
        dfeat_ref = refs[2 + n_w]
        dwrefs = refs[3 + n_w :]

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in dwrefs:
                r[...] = jnp.zeros_like(r)

        feat = feat_ref[...]                                   # [B, E] bf16
        dout = dout_ref[...].astype(jnp.bfloat16)              # [B, 32]

        # ---- recompute forward, keeping each GEMM's input + relu mask
        xins = []
        h = feat
        idx = 0
        for i in range(depth):
            if i in skips:
                h = jnp.concatenate([feat, h], axis=1)
            xins.append(h)
            w = wrefs[idx][...].astype(jnp.bfloat16)
            b = wrefs[idx + 1][...]
            idx += 2
            acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.maximum(acc + b.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
        h_last = h
        hw0 = wrefs[idx][...].astype(jnp.bfloat16)
        hb0 = wrefs[idx + 1][...]
        hw1 = wrefs[idx + 2][...].astype(jnp.bfloat16)
        h1 = jnp.dot(h_last, hw0, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + hb0.astype(jnp.float32), 0.0).astype(jnp.bfloat16)

        # ---- heads backward
        t_dims = (((1,), (1,)), ((), ()))   # x @ w^T
        g_dims = (((0,), (0,)), ((), ()))   # x^T @ g
        d_hw1 = jax.lax.dot_general(h1, dout, g_dims,
                                    preferred_element_type=jnp.float32)
        d_hb1 = jnp.sum(dout.astype(jnp.float32), axis=0, keepdims=True)
        d_h1 = jax.lax.dot_general(dout, hw1, t_dims,
                                   preferred_element_type=jnp.float32)
        # NOTE: compare in f32 — Mosaic has no bf16 vector cmpf on v5e
        d_h1 = jnp.where(h1.astype(jnp.float32) > 0, d_h1, 0.0).astype(jnp.bfloat16)
        d_hw0 = jax.lax.dot_general(h_last, d_h1, g_dims,
                                    preferred_element_type=jnp.float32)
        d_hb0 = jnp.sum(d_h1.astype(jnp.float32), axis=0, keepdims=True)
        d_h = jax.lax.dot_general(d_h1, hw0, t_dims,
                                  preferred_element_type=jnp.float32)

        head_grads = [d_hw0, d_hb0, d_hw1, d_hb1]

        # ---- trunk backward
        d_feat = jnp.zeros_like(feat, dtype=jnp.float32)
        trunk_grads = [None] * (2 * depth)
        for i in reversed(range(depth)):
            w = wrefs[2 * i][...].astype(jnp.bfloat16)
            # h after layer i is xins[i+1] (or h_last), minus any skip concat
            h_out = xins[i + 1][:, -w.shape[1]:] if i + 1 < depth else h_last
            d_a = jnp.where(h_out.astype(jnp.float32) > 0, d_h, 0.0).astype(jnp.bfloat16)
            trunk_grads[2 * i] = jax.lax.dot_general(
                xins[i], d_a, g_dims, preferred_element_type=jnp.float32
            )
            trunk_grads[2 * i + 1] = jnp.sum(
                d_a.astype(jnp.float32), axis=0, keepdims=True
            )
            d_xin = jax.lax.dot_general(d_a, w, t_dims,
                                        preferred_element_type=jnp.float32)
            if i in skips:
                e = feat.shape[1]
                d_feat = d_feat + d_xin[:, :e]
                d_h = d_xin[:, e:]
            else:
                d_h = d_xin
        d_feat = d_feat + d_h
        dfeat_ref[...] = d_feat.astype(jnp.float32)

        for r, g in zip(dwrefs, trunk_grads + head_grads):
            r[...] += g

    return body


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skips", "block", "interpret", "vmem_limit"),
)
def _fused_mlp_bwd_call(
    packed: PackedMLP,
    feat: jnp.ndarray,
    dout: jnp.ndarray,
    depth: int,
    skips: Tuple[int, ...],
    block: int,
    interpret: bool,
    vmem_limit: Optional[int],
):
    p, enc_w = feat.shape
    padded = -(-p // block) * block
    if padded != p:
        feat = jnp.pad(feat, ((0, padded - p), (0, 0)))
        dout = jnp.pad(dout, ((0, padded - p), (0, 0)))

    weights_flat = []
    for w, b in zip(packed.trunk_w, packed.trunk_b):
        weights_flat += [w, b]
    weights_flat += [packed.head_w0, packed.head_b0, packed.head_w1, packed.head_b1]
    weights_flat = [w.astype(jnp.bfloat16) for w in weights_flat]
    n_w = len(weights_flat)

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out_shapes = [jax.ShapeDtypeStruct((padded, enc_w), jnp.float32)] + [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights_flat
    ]
    out_specs = [
        pl.BlockSpec((block, enc_w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [const_spec(w) for w in weights_flat]

    outs = pl.pallas_call(
        _bwd_kernel(depth, skips, n_w),
        out_shape=out_shapes,
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((block, enc_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[const_spec(w) for w in weights_flat],
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(feat, dout, *weights_flat)

    dfeat = outs[0][:p]
    dws = outs[1:]
    n_trunk = len(packed.trunk_w)
    dpacked = PackedMLP(
        trunk_w=tuple(dws[2 * i] for i in range(n_trunk)),
        trunk_b=tuple(dws[2 * i + 1] for i in range(n_trunk)),
        head_w0=dws[2 * n_trunk],
        head_b0=dws[2 * n_trunk + 1],
        head_w1=dws[2 * n_trunk + 2],
        head_b1=dws[2 * n_trunk + 3],
    )
    return dpacked, dfeat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_mlp(
    packed: PackedMLP,
    feat: jnp.ndarray,
    depth: int,
    skips: Tuple[int, ...],
    block: int = 1024,
    interpret: bool = False,
    vmem_limit: Optional[int] = 100 * 1024 * 1024,
) -> jnp.ndarray:
    """Differentiable fused MLP (training path).

    Forward is :func:`fused_mlp_apply`; backward is a second kernel that
    rematerializes the block's activations in VMEM (no HBM activation
    traffic at all — the XLA backward streams every [points, width] layer
    twice) and accumulates fp32 weight grads across the sequential grid.
    """
    return fused_mlp_apply(packed, feat, depth, skips, block, interpret, vmem_limit)


def _fused_mlp_fwd(packed, feat, depth, skips, block, interpret, vmem_limit):
    out = fused_mlp_apply(packed, feat, depth, skips, block, interpret, vmem_limit)
    return out, (packed, feat)


def _fused_mlp_bwd(depth, skips, block, interpret, vmem_limit, res, dout):
    packed, feat = res
    dpacked, dfeat = _fused_mlp_bwd_call(
        packed, feat, dout, depth, skips, block, interpret, vmem_limit
    )
    # cast weight grads back to the packed dtypes (bf16 storage)
    dpacked = jax.tree.map(
        lambda g, w: g.astype(w.dtype), dpacked, packed
    )
    return dpacked, dfeat.astype(feat.dtype)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
