"""Fully-fused render kernel: MLP trunk + heads + SH shading + composite.

Extends the shaded kernel (``fused_mlp.py``) so the alpha composite runs
INSIDE the pallas call: per block of whole rays, encoded points go in and
*per-ray* results come out — rgb/depth/opacity ``[rays, 8]`` plus
(optionally) the selection weights that drive hierarchical fine sampling.
The per-sample ``[points, 8]`` tensor never exists in HBM, and XLA's
composite chain (softplus/exp/cumsum/reductions — a dozen small fusions
per pass at train scale) disappears.

Layout strategy (the part that makes Mosaic happy): everything stays in
the MLP's native per-sample ``[block, lanes]`` layout — there is no
sublane<->lane relayout anywhere (Mosaic's ``infer-vector-layout`` rejects
``[block, 1] <-> [block_r, s]`` shape casts).  The composite's ray-local
scans and reductions become MATMULS against tiny per-block constants:

  * ``seg_lt [block, block]``: block-diagonal strictly-lower matrix;
    ``seg_lt @ sd`` is the per-ray *exclusive prefix sum* (transmittance),
    and its transpose gives the backward suffix sums — MXU work in fp32,
    ~2% of the MLP's FLOPs at fine-pass shapes;
  * ``r_mat [block_r, block]``: ray-segment indicator; ``r_mat @ x`` is the
    per-ray reduction (rgb/depth/opacity sums) and ``r_mat^T @ y``
    broadcasts per-ray cotangents back to samples.

Sample depths/deltas ride in as flat ``[points, 1]`` columns (deltas are
computed by XLA — one elementwise op), so the kernel never shifts along
the ray axis either.

Composite semantics are ``ops/volume.py`` exactly (ref ``inference``,
``model/mc_nerf.py:705-736``): rgb weights from softplus(sigma + noise),
depth/opacity from the noise-free transmittance, white background adds
(1 - sum w), last delta = 1e10.

Gradient notes: cotangents flow to weights / feat / basis as in the shaded
kernel, now through the in-kernel composite backward.  ``z``/deltas carry
NO gradient by construction of the surrounding model (sample depths come
from constants or stop-gradient'd PMFs; verified in ``models/nerf.py``)
and the noise inputs are nondifferentiable, so their cotangents are zero.
The selection-weights output is defined stop-gradient (the reference
selects fine bins under ``torch.no_grad()``, mc_nerf.py:613).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mc_nerf_tpu.ops.pallas.fused_mlp import (
    BASIS_LANES,
    PackedMLP,
    _pad_rays,
    _shade_tables,
)


def _softplus(x):
    # max(x,0) + log(1 + exp(-|x|)) — Mosaic-safe (exp + log only)
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _block_rays(rays: int, s: int) -> int:
    """Rays per grid block: prefer a multiple of 8 that divides ``rays`` —
    then the host-side jnp.pad copies (0.5 ms each on full-size feat at
    train scale) vanish entirely — keeping block <= 2048 points so the
    [block, block] segment matrix stays <= 16 MB VMEM.  When rays has no
    such divisor, fall back to block_r=16 and pad the ray axis (the call
    sites already pad to a block_r multiple).  block_r=8 is never selected:
    the round-2 miscompile that motivated this is retired (it probed clean
    in round 5 — benchmarks/fused_fault_s64_probes.jsonl), but 8 would only
    be preferred at sample counts the support ceiling (``_MAX_FUSED_S``)
    already refuses, so it stays deselected as an unprobed geometry rather
    than a known-bad one.  The s > 512 refusal below is a backstop for the
    raw-probe escape hatch; production calls hit the ceiling first."""
    cap = max(8, 2048 // s)
    best = 0
    r = 16  # 8 stays deselected: unprobed at the sizes where it would win
    while r <= cap:
        if rays % r == 0:
            best = r
        r += 8
    if best:
        return best
    if s > 512:
        raise ValueError(
            f"fused_render: no safe ray-block for s={s} (block_r=16 exceeds "
            f"the VMEM budget and block_r=8 is unprobed at this size); use "
            f"the shaded kernel + XLA composite path instead"
        )
    return 16


# Sample counts whose composite-backward codegen faults on the current
# platform, mapped to a padded count that compiles cleanly.  The pad is
# EXACT: phantom samples ride with delta=0 (alpha=0, weight=0, zero
# cotangents — verified against the XLA composite in
# tests/test_fused_render.py).  The table is EMPTY as of round 5: the
# round-2 s=64 backward fault (ray blocks of 1536/512 points, block_r
# 24/8) no longer reproduces anywhere on the current worker stack — the
# kernel is byte-identical since the quarantine commit, so the fix was
# platform-side.  Evidence (all on-chip, v5e):
#   benchmarks/fused_fault_sweep.jsonl      raw s=16..160 fwd+bwd all ok at
#                                           the production block selector
#   benchmarks/fused_fault_s64_probes.jsonl raw s=64 ok at block_r
#                                           16 (x3), 24 (x2), 8, 32
#   benchmarks/fused_fault_s64_equiv.jsonl  raw s=64 fwd/bwd VALUES equal
#                                           the XLA composite math at every
#                                           block_r (max rel err 2.6e-4,
#                                           identical across geometries)
# The mechanism stays (and stays tested via monkeypatching) so any future
# sweep hit can be quarantined by adding one entry here.
# Repro/bisect harness: scripts/dev_fault_repro.py.
_QUARANTINED_S: dict = {}

# Measured support ceiling for the fused composite path, round-5 sweep
# (benchmarks/fused_fault_sweep.jsonl): raw s=16..160 compile + run clean;
# s=168 and s>=184 fail at COMPILE time with a scoped-VMEM OOM in the
# backward's stack allocation ("Ran out of memory in memory space vmem
# ... %_render_bwd_call") — a clean AOT error, not a miscompile, but one
# that wedges this image's tunneled TPU worker for 10+ minutes.  s=176
# happens to fit, so the envelope is not monotonic; the path refuses
# everything above the last contiguous clean size instead of letting a
# user config discover the cliff.  (This subsumes the old s>512 refusal.)
_MAX_FUSED_S = 160


def _safe_s(s: int) -> int:
    # Escape hatch for the fault-surface sweep (scripts/dev_fault_sweep.py):
    # probe the RAW geometry, bypassing quarantine pads and the support
    # ceiling.  A faulting cell crashes the TPU worker — never set this
    # outside the sweep harness.
    if os.environ.get("MC_NERF_FUSED_RAW_S"):
        return s
    s = _QUARANTINED_S.get(s, s)
    if s > _MAX_FUSED_S:
        raise ValueError(
            f"fused_render: s={s} samples/ray exceeds the measured support "
            f"ceiling ({_MAX_FUSED_S}) — the composite backward's VMEM "
            f"stack allocation fails to compile above it (see "
            f"benchmarks/fused_fault_sweep.jsonl); use the shaded kernel + "
            f"XLA composite path (use_pallas=False) for larger budgets"
        )
    return s


def _pad_sample_axis(x_flat: jnp.ndarray, rays: int, s: int, s_k: int,
                     edge: bool = False) -> jnp.ndarray:
    """[rays*s, C] -> [rays*s_k, C], padding each ray's tail with zeros
    (or its last row when ``edge``, for depth columns that must stay
    finite/sorted)."""
    if s_k == s:
        return x_flat
    x = x_flat.reshape(rays, s, x_flat.shape[-1])
    if edge:
        x = jnp.concatenate(
            [x, jnp.repeat(x[:, -1:], s_k - s, axis=1)], axis=1
        )
    else:
        x = jnp.pad(x, ((0, 0), (0, s_k - s), (0, 0)))
    return x.reshape(rays * s_k, x.shape[-1])


def _seg_tables(block_r: int, s: int):
    """(seg_lt [block, block], r_mat [block_r, block]) — see module doc."""
    block = block_r * s
    tri = np.tril(np.ones((s, s), np.float32), k=-1)     # strictly lower
    seg_lt = np.kron(np.eye(block_r, dtype=np.float32), tri)
    r_mat = np.kron(np.eye(block_r, dtype=np.float32),
                    np.ones((1, s), np.float32))
    return seg_lt, r_mat


def _mlp_shade_fwd(feat, basis_rep, tile, group, lane0, wrefs, depth, skips,
                   keep_acts=False):
    """Shared trunk+heads+shading forward; returns (raw8 pre-sigmoid,
    acts = (xins, h_last, h1, hw0, hw1, out32, btp) when keep_acts)."""
    idx = 0
    h = feat
    xins = []
    for i in range(depth):
        if i in skips:
            h = jnp.concatenate([feat, h], axis=1)
        if keep_acts:
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
    btp = jnp.dot(basis_rep, tile, preferred_element_type=jnp.float32) + lane0
    raw8 = jnp.dot(out32 * btp, group, preferred_element_type=jnp.float32)
    acts = (xins, h_last, h1, hw0, hw1, out32, btp) if keep_acts else None
    return raw8, acts


def _render_fwd_kernel(depth: int, skips: Tuple[int, ...], s: int,
                       with_noise: bool, emit_wsel: bool, white_back: bool):
    def body(*refs):
        i = 0
        feat_ref = refs[i]; i += 1
        basis_ref = refs[i]; i += 1
        z_ref = refs[i]; i += 1
        d_ref = refs[i]; i += 1
        noise_ref = noise_sel_ref = None
        if with_noise:
            noise_ref = refs[i]; i += 1
            if emit_wsel:
                noise_sel_ref = refs[i]; i += 1
        tile_ref = refs[i]; i += 1
        group_ref = refs[i]; i += 1
        mask_ref = refs[i]; i += 1
        seg_ref = refs[i]; i += 1
        rmat_ref = refs[i]; i += 1
        if emit_wsel:
            out_ray_ref, wsel_ref = refs[-2], refs[-1]
            wrefs = refs[i:-2]
        else:
            out_ray_ref = refs[-1]
            wrefs = refs[i:-1]

        feat = feat_ref[...]
        block = feat.shape[0]
        block_r = block // s

        basis = basis_ref[...]
        basis_rep = jnp.broadcast_to(
            basis[:, None, :], (block_r, s, BASIS_LANES)
        ).reshape(block, BASIS_LANES)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) == 0).astype(jnp.float32)
        raw8, _ = _mlp_shade_fwd(feat, basis_rep, tile_ref[...], group_ref[...],
                                 lane0, wrefs, depth, skips)
        m = mask_ref[...]
        out8 = raw8 + m * (jax.nn.sigmoid(raw8) - raw8)

        sigma = out8[:, 0:1]                               # [block, 1]
        rgb = out8[:, 1:4]                                 # [block, 3]
        z = z_ref[...]                                     # [block, 1]
        d = d_ref[...]                                     # [block, 1]
        seg = seg_ref[...]
        rmat = rmat_ref[...]

        # pack the sigma variants into lanes: one segment matmul serves all
        sigs = [sigma]                                     # noise-free
        if with_noise:
            sigs.append(sigma + noise_ref[...])
            if emit_wsel:
                sigs.append(sigma + noise_sel_ref[...])
        sig_cols = jnp.concatenate(sigs, axis=1)           # [block, <=3]
        sd = _softplus(sig_cols) * d
        cum = jnp.dot(seg, sd, preferred_element_type=jnp.float32)
        wcols = (1.0 - jnp.exp(-sd)) * jnp.exp(-cum)       # [block, <=3]

        prob = wcols[:, 0:1]
        w = wcols[:, 1:2] if with_noise else prob

        parts = jnp.concatenate(
            [w * rgb, w, z * prob, prob], axis=1
        )                                                  # [block, 6]
        sums = jnp.dot(rmat, parts, preferred_element_type=jnp.float32)
        rgb_out = sums[:, 0:3]
        if white_back:
            rgb_out = rgb_out + (1.0 - sums[:, 3:4])
        out_ray_ref[...] = jnp.concatenate(
            [rgb_out, sums[:, 4:5], sums[:, 5:6],
             jnp.zeros((block_r, 3), jnp.float32)],
            axis=1,
        )

        if emit_wsel:
            wsel_ref[...] = wcols[:, 2:3] if with_noise else prob

    return body


def _render_bwd_kernel(depth: int, skips: Tuple[int, ...], s: int,
                       with_noise: bool, white_back: bool, n_w: int):
    def body(*refs):
        i = 0
        feat_ref = refs[i]; i += 1
        basis_ref = refs[i]; i += 1
        z_ref = refs[i]; i += 1
        d_ref = refs[i]; i += 1
        noise_ref = None
        if with_noise:
            noise_ref = refs[i]; i += 1
        dray_ref = refs[i]; i += 1
        tile_ref = refs[i]; i += 1
        group_ref = refs[i]; i += 1
        mask_ref = refs[i]; i += 1
        seg_ref = refs[i]; i += 1
        rmat_ref = refs[i]; i += 1
        wrefs = refs[i:i + n_w]
        dfeat_ref = refs[i + n_w]
        dbasis_ref = refs[i + n_w + 1]
        dwrefs = refs[i + n_w + 2:]

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in dwrefs:
                r[...] = jnp.zeros_like(r)

        feat = feat_ref[...]
        block = feat.shape[0]
        block_r = block // s

        basis = basis_ref[...]
        basis_rep = jnp.broadcast_to(
            basis[:, None, :], (block_r, s, BASIS_LANES)
        ).reshape(block, BASIS_LANES)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) == 0).astype(jnp.float32)
        tile = tile_ref[...]
        raw8, acts = _mlp_shade_fwd(feat, basis_rep, tile, group_ref[...],
                                    lane0, wrefs, depth, skips, keep_acts=True)
        xins, h_last, h1, hw0, hw1, out32, btp = acts
        m = mask_ref[...]
        sig8 = jax.nn.sigmoid(raw8)
        out8 = raw8 + m * (sig8 - raw8)

        sigma = out8[:, 0:1]
        rgb = out8[:, 1:4]
        z = z_ref[...]
        d = d_ref[...]
        seg = seg_ref[...]
        rmat = rmat_ref[...]

        # ---- composite forward recompute (packed lanes: [nf, noisy?])
        sigs = [sigma]
        if with_noise:
            sigs.append(sigma + noise_ref[...])
        sig_cols = jnp.concatenate(sigs, axis=1)
        sd = _softplus(sig_cols) * d
        cum = jnp.dot(seg, sd, preferred_element_type=jnp.float32)
        t_ex = jnp.exp(-cum)
        alpha = 1.0 - jnp.exp(-sd)
        wcols = alpha * t_ex
        prob = wcols[:, 0:1]
        w = wcols[:, 1:2] if with_noise else prob

        # ---- per-ray cotangents -> per-sample
        dray = dray_ref[...]                               # [block_r, 8]
        g_dims = (((0,), (0,)), ((), ()))
        t_dims = (((1,), (1,)), ((), ()))
        dps = jax.lax.dot_general(rmat, dray, g_dims,
                                  preferred_element_type=jnp.float32)
        drgb_ps = dps[:, 0:3]                              # [block, 3]
        ddepth_ps = dps[:, 3:4]
        dopac_ps = dps[:, 4:5]

        dw = jnp.sum(drgb_ps * rgb, axis=1, keepdims=True)
        if white_back:
            dw = dw - jnp.sum(drgb_ps, axis=1, keepdims=True)
        dprob = ddepth_ps * z + dopac_ps

        # ---- composite backward (packed lanes again: one seg^T matmul)
        if with_noise:
            dwcols = jnp.concatenate([dprob, dw], axis=1)
        else:
            dwcols = dprob + dw
        dalpha = dwcols * t_ex
        dcum = -(dwcols * alpha) * t_ex
        dsd = jax.lax.dot_general(seg, dcum, g_dims,       # seg^T @ dcum
                                  preferred_element_type=jnp.float32)
        dsd = dsd + dalpha * jnp.exp(-sd)
        dsig_cols = dsd * d * jax.nn.sigmoid(sig_cols)
        dsigma = jnp.sum(dsig_cols, axis=1, keepdims=True)

        drgb_s = w * drgb_ps                               # [block, 3]
        dout8 = jnp.concatenate(
            [dsigma, drgb_s, jnp.zeros((block, 4), jnp.float32)], axis=1
        )

        # ---- shading backward (as in fused_mlp._shaded_bwd_kernel)
        draw8 = dout8 * (1.0 - m + m * sig8 * (1.0 - sig8))
        dprod = jax.lax.dot_general(draw8, group_ref[...], t_dims,
                                    preferred_element_type=jnp.float32)
        dout32 = dprod * btp
        db_rep = jax.lax.dot_general(dprod * out32, tile, t_dims,
                                     preferred_element_type=jnp.float32)
        dbasis_ref[...] = jnp.sum(
            db_rep.reshape(block_r, s, BASIS_LANES), axis=1
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
        for li in reversed(range(depth)):
            wmat = wrefs[2 * li][...].astype(jnp.bfloat16)
            h_out = xins[li + 1][:, -wmat.shape[1]:] if li + 1 < depth else h_last
            d_a = jnp.where(h_out.astype(jnp.float32) > 0, d_h, 0.0).astype(jnp.bfloat16)
            trunk_grads[2 * li] = jax.lax.dot_general(
                xins[li], d_a, g_dims, preferred_element_type=jnp.float32
            )
            trunk_grads[2 * li + 1] = jnp.sum(
                d_a.astype(jnp.float32), axis=0, keepdims=True
            )
            d_xin = jax.lax.dot_general(d_a, wmat, t_dims,
                                        preferred_element_type=jnp.float32)
            if li in skips:
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


def _flat_weights(packed: PackedMLP):
    ws = []
    for w, b in zip(packed.trunk_w, packed.trunk_b):
        ws += [w, b]
    ws += [packed.head_w0, packed.head_b0, packed.head_w1, packed.head_b1]
    return [w.astype(jnp.bfloat16) for w in ws]


def _tables(nb: int, block_r: int, s: int):
    tile_np, group_np, mask_np = _shade_tables(nb)
    seg_np, rmat_np = _seg_tables(block_r, s)
    return (
        jnp.asarray(tile_np), jnp.asarray(group_np), jnp.asarray(mask_np),
        jnp.asarray(seg_np), jnp.asarray(rmat_np),
    )


def _deltas_flat(z: jnp.ndarray) -> jnp.ndarray:
    """[rays, s] depths -> [rays*s, 1] deltas, last = 1e10 (XLA side)."""
    d = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((z.shape[0], 1), 1e10, z.dtype)],
        axis=1,
    )
    return d.reshape(-1, 1)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skips", "s", "nb", "with_noise", "emit_wsel",
                     "white_back", "interpret"),
)
def _render_fwd_call(packed, feat, basis16, z, noise, noise_sel, depth, skips,
                     s, nb, with_noise, emit_wsel, white_back, interpret):
    rays = basis16.shape[0]
    p = rays * s
    assert feat.shape[0] == p, (feat.shape, rays, s)
    # quarantined sample counts run padded (exact: phantom delta=0 samples)
    s_in = s
    s = _safe_s(s)
    # deltas come from the UNPADDED depths (last delta stays 1e10); phantom
    # samples get delta=0 -> zero alpha/weight/cotangents
    deltas = _pad_sample_axis(_deltas_flat(z), rays, s_in, s)
    feat = _pad_sample_axis(feat, rays, s_in, s)
    zf = _pad_sample_axis(z.reshape(p, 1), rays, s_in, s, edge=True)
    if noise is not None:
        noise = _pad_sample_axis(noise.reshape(p, 1), rays, s_in, s)
    if noise_sel is not None:
        noise_sel = _pad_sample_axis(noise_sel.reshape(p, 1), rays, s_in, s)
    p = rays * s
    block_r = _block_rays(rays, s)
    block = block_r * s
    rays_pad = -(-rays // block_r) * block_r
    feat = _pad_rays(feat, rays_pad, rays, s)
    basis16 = _pad_rays(basis16, rays_pad, rays, 1)
    zf = _pad_rays(zf, rays_pad, rays, s)
    df = _pad_rays(deltas, rays_pad, rays, s)
    padded = rays_pad * s

    tile, group, mask, seg, rmat = _tables(nb, block_r, s)
    weights_flat = _flat_weights(packed)

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    ray_spec = lambda lanes: pl.BlockSpec(
        (block_r, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    pt_spec = lambda lanes: pl.BlockSpec(
        (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [pt_spec(feat.shape[1]), ray_spec(BASIS_LANES), pt_spec(1),
                pt_spec(1)]
    inputs = [feat, basis16, zf, df]
    if with_noise:
        in_specs.append(pt_spec(1))
        inputs.append(_pad_rays(noise, rays_pad, rays, s))
        if emit_wsel:
            in_specs.append(pt_spec(1))
            inputs.append(_pad_rays(noise_sel, rays_pad, rays, s))
    in_specs += [const_spec(t) for t in (tile, group, mask, seg, rmat)]
    inputs += [tile, group, mask, seg, rmat]
    in_specs += [const_spec(w) for w in weights_flat]
    inputs += weights_flat

    out_shape = [jax.ShapeDtypeStruct((rays_pad, 8), jnp.float32)]
    out_specs = [ray_spec(8)]
    if emit_wsel:
        out_shape.append(jax.ShapeDtypeStruct((padded, 1), jnp.float32))
        out_specs.append(pt_spec(1))

    outs = pl.pallas_call(
        _render_fwd_kernel(depth, skips, s, with_noise, emit_wsel, white_back),
        out_shape=out_shape,
        grid=(padded // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    ray_out = outs[0][:rays]
    if emit_wsel:
        wsel = outs[1][:p].reshape(rays, s)[:, :s_in]
        return ray_out, wsel
    return ray_out, None


@functools.partial(
    jax.jit,
    static_argnames=("depth", "skips", "s", "nb", "with_noise", "white_back",
                     "interpret"),
)
def _render_bwd_call(packed, feat, basis16, z, noise, dray, depth, skips, s,
                     nb, with_noise, white_back, interpret):
    rays = basis16.shape[0]
    p = rays * s
    # mirror the forward's quarantine padding (see _render_fwd_call)
    s_in = s
    s = _safe_s(s)
    deltas = _pad_sample_axis(_deltas_flat(z), rays, s_in, s)
    feat = _pad_sample_axis(feat, rays, s_in, s)
    zf = _pad_sample_axis(z.reshape(p, 1), rays, s_in, s, edge=True)
    if noise is not None:
        noise = _pad_sample_axis(noise.reshape(p, 1), rays, s_in, s)
    p = rays * s
    block_r = _block_rays(rays, s)
    block = block_r * s
    rays_pad = -(-rays // block_r) * block_r
    feat = _pad_rays(feat, rays_pad, rays, s)
    basis16 = _pad_rays(basis16, rays_pad, rays, 1)
    zf = _pad_rays(zf, rays_pad, rays, s)
    df = _pad_rays(deltas, rays_pad, rays, s)
    dray = _pad_rays(dray, rays_pad, rays, 1)
    padded = rays_pad * s

    tile, group, mask, seg, rmat = _tables(nb, block_r, s)
    weights_flat = _flat_weights(packed)
    n_w = len(weights_flat)

    const_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    ray_spec = lambda lanes: pl.BlockSpec(
        (block_r, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    pt_spec = lambda lanes: pl.BlockSpec(
        (block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [pt_spec(feat.shape[1]), ray_spec(BASIS_LANES), pt_spec(1),
                pt_spec(1)]
    inputs = [feat, basis16, zf, df]
    if with_noise:
        in_specs.append(pt_spec(1))
        inputs.append(_pad_rays(noise, rays_pad, rays, s))
    in_specs += [ray_spec(8)]
    inputs += [dray]
    in_specs += [const_spec(t) for t in (tile, group, mask, seg, rmat)]
    inputs += [tile, group, mask, seg, rmat]
    in_specs += [const_spec(w) for w in weights_flat]
    inputs += weights_flat

    out_shapes = (
        [jax.ShapeDtypeStruct((padded, feat.shape[1]), jnp.float32)]
        + [jax.ShapeDtypeStruct((rays_pad, BASIS_LANES), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights_flat]
    )
    out_specs = (
        [pt_spec(feat.shape[1])]
        + [ray_spec(BASIS_LANES)]
        + [const_spec(w) for w in weights_flat]
    )
    outs = pl.pallas_call(
        _render_bwd_kernel(depth, skips, s, with_noise, white_back, n_w),
        out_shape=out_shapes,
        grid=(padded // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    dfeat = outs[0][:p]
    if s != s_in:
        # drop the phantom samples' (zero) feature cotangents
        dfeat = dfeat.reshape(rays, s, -1)[:, :s_in].reshape(rays * s_in, -1)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def fused_render(
    packed: PackedMLP,
    feat: jnp.ndarray,
    basis16: jnp.ndarray,
    z: jnp.ndarray,
    noise: Optional[jnp.ndarray],
    noise_sel: Optional[jnp.ndarray],
    depth: int,
    skips: Tuple[int, ...],
    s: int,
    nb: int,
    with_noise: bool,
    emit_wsel: bool,
    white_back: bool = True,
    interpret: bool = False,
):
    """Differentiable fused render: encode-order feat -> per-ray outputs.

    Args:
      packed: full (sigma+SH) kernel weights, fp32 leaves for training.
      feat: [rays * s, 4+6L] encoded points, ray-major.
      basis16: [rays, 16] SH basis padded to 16 lanes.
      z: [rays, s] sorted sample depths (NO gradient — see module doc).
      noise / noise_sel: [rays, s] N(0,1) draws (training) or None.
      s: static samples per ray; nb: (sh_deg+1)^2 <= 9.
      with_noise: training mode (noisy rgb weights, separate noise-free
        depth/opacity path).  emit_wsel: also return the selection weights
        (computed with noise_sel; stop-gradient by definition).

    Returns:
      (ray_out [rays, 8] fp32 — rgb(3), depth, opacity, 3 zeros;
       wsel [rays, s] or None).
    """
    return _render_fwd_call(packed, feat, basis16, z, noise, noise_sel,
                            depth, skips, s, nb, with_noise, emit_wsel,
                            white_back, interpret)


def _fused_render_fwd(packed, feat, basis16, z, noise, noise_sel, depth,
                      skips, s, nb, with_noise, emit_wsel, white_back,
                      interpret):
    out = _render_fwd_call(packed, feat, basis16, z, noise, noise_sel, depth,
                           skips, s, nb, with_noise, emit_wsel, white_back,
                           interpret)
    return out, (packed, feat, basis16, z, noise, noise_sel)


def _fused_render_bwd(depth, skips, s, nb, with_noise, emit_wsel, white_back,
                      interpret, res, cot):
    packed, feat, basis16, z, noise, noise_sel = res
    dray, _ = cot  # wsel is stop-gradient by definition (ref no_grad select)
    dpacked, dfeat, dbasis = _render_bwd_call(
        packed, feat, basis16, z, noise, dray, depth, skips, s, nb,
        with_noise, white_back, interpret,
    )
    dpacked = jax.tree.map(lambda g, w: g.astype(w.dtype), dpacked, packed)
    return (
        dpacked,
        dfeat.astype(feat.dtype),
        dbasis.astype(basis16.dtype),
        jnp.zeros_like(z),
        None if noise is None else jnp.zeros_like(noise),
        None if noise_sel is None else jnp.zeros_like(noise_sel),
    )


fused_render.defvjp(_fused_render_fwd, _fused_render_bwd)
