"""The coarse/fine NeRF renderer: encode -> MLP -> SH shade -> composite.

Functional replacement for the reference's ``NeRF_Model``
(``model/mc_nerf.py:543-736``), with the dynamic fine-sample selection
re-formulated as static per-ray top-k (see ``mc_nerf_tpu.ops.volume``).

Everything here is shape-static and jit/vmap/shard_map friendly; the ray
axis is embarrassingly parallel, so data parallelism shards it untouched.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mc_nerf_tpu.config import NerfConfig
from mc_nerf_tpu.models.encoding import barf_weights, sincos_encode_t
from mc_nerf_tpu.models.mlp import (
    NerfMLPParams,
    apply_nerf_mlp_t,
    init_nerf_mlp,
)
from mc_nerf_tpu.models.sh import sh_basis
from mc_nerf_tpu.ops.pallas.fused_mlp import (
    BASIS_LANES,
    PackedMLP,
    encode_kernel_order,
    fused_mlp_apply,
    fused_shaded_mlp,
    pack_mlp_params,
)
from mc_nerf_tpu.ops.occupancy import mixture_samples, proposal_pmf
from mc_nerf_tpu.ops.pallas.fused_render import fused_render
from mc_nerf_tpu.ops.volume import (
    composite,
    compute_deltas,
    expand_bins_to_samples,
    sample_pdf,
    select_fine_bins,
    sigma_to_weights,
)


class NerfParams(NamedTuple):
    coarse: NerfMLPParams
    fine: NerfMLPParams


def init_nerf_params(key: jax.Array, cfg: NerfConfig) -> NerfParams:
    kc, kf = jax.random.split(key)
    coarse = init_nerf_mlp(
        kc, cfg.embed_dim, cfg.coarse_depth, cfg.coarse_width, cfg.coarse_skips, cfg.sh_dim
    )
    fine = init_nerf_mlp(
        kf, cfg.embed_dim, cfg.fine_depth, cfg.fine_width, cfg.fine_skips, cfg.sh_dim
    )
    return NerfParams(coarse, fine)


def _shade(
    mlp: NerfMLPParams,
    skips,
    xyz_t: jnp.ndarray,
    basis: jnp.ndarray,
    cfg: NerfConfig,
    freq_w: Optional[jnp.ndarray],
    compute_dtype,
    sigma_only: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Encode points, run the MLP, shade SH -> (sigma [R,S], rgb [R,S,3]).

    Takes TRANSPOSED points ``xyz_t`` [3, R, S]: the encode and the first /
    skip MLP layers run in [C, P] space with points on the lane axis
    (``sincos_encode_t`` / ``apply_nerf_mlp_t``) — the [P, 3]-shaped
    intermediates of the natural orientation lane-pad up to 43x on TPU and
    cost ~3 ms/step in copies/update-slices at train scale (HLO audit).
    The sample axis is flattened into the GEMM M dimension, and the SH
    basis is per-ray ([R, B]) and reused across the sample axis — cheaper
    than the reference's per-sample direction expansion (mc_nerf.py:688).
    """
    r, s = xyz_t.shape[1], xyz_t.shape[2]
    x_enc_t = sincos_encode_t(
        xyz_t.reshape(3, r * s), cfg.emb_freqs_xyz, freq_w
    )
    sigma, sh = apply_nerf_mlp_t(
        mlp, x_enc_t, skips, compute_dtype, sigma_only=sigma_only
    )
    sigma = sigma.reshape(r, s)
    if sigma_only:
        return sigma, None
    # SH contraction without transposed layouts: the obvious
    # reshape-to-[r,s,3,nb] + einsum forced XLA into {1,0,3,2}-layout
    # reshapes costing ~1.2 ms/step at train scale; minor-dim splits +
    # a broadcasted multiply-reduce fuse into one kernel instead.
    # The contraction runs in the compute dtype (sh arrives bf16 from the
    # MLP) with fp32 accumulation — upcasting the [P, 27] sh tensor first
    # only doubled the reduce's HBM read (BASELINE.md round-3 A/B).
    nb = (cfg.sh_deg + 1) ** 2
    basis_ps = jnp.broadcast_to(
        basis.astype(sh.dtype)[:, None, :], (r, s, nb)
    ).reshape(r * s, nb)
    sh3 = sh.reshape(r * s, 3, nb)
    rgb_raw = jnp.sum(
        sh3 * basis_ps[:, None, :], axis=-1, dtype=jnp.float32
    ).reshape(r, s, 3)
    return sigma, jax.nn.sigmoid(rgb_raw)


def _shade_train_kernel(
    mlp: NerfMLPParams,
    depth: int,
    skips,
    xyz: jnp.ndarray,
    basis: jnp.ndarray,
    cfg: NerfConfig,
    freq_w: Optional[jnp.ndarray],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training shade through the differentiable fused kernel (SH shading
    included — the [points, 27] SH tensor never exists in HBM; its XLA-side
    slicing/einsum cost ~17 ms/step of padded-layout glue).

    Params are packed fp32 (cotangents keep full precision; the kernel
    casts to bf16 at the MXU).  Gradients flow to the weights through the
    pack's VJP, to camera parameters through dfeat -> encode -> xyz, and
    through dbasis -> sh_basis -> ray directions.
    """
    r, s = xyz.shape[0], xyz.shape[1]
    packed = pack_mlp_params(mlp, cfg.emb_freqs_xyz, skips, dtype=jnp.float32)
    feat = encode_kernel_order(xyz.reshape(r * s, 3), cfg.emb_freqs_xyz, freq_w)
    nb = (cfg.sh_deg + 1) ** 2
    basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
    out = fused_shaded_mlp(
        packed, feat, basis16, depth, tuple(skips), s, nb, interpret
    )
    sigma = out[:, 0].reshape(r, s)
    rgb = out[:, 1:4].reshape(r, s, 3)
    return sigma, rgb


def render_rays_train(
    params: NerfParams,
    rays_d: jnp.ndarray,
    rays_o: jnp.ndarray,
    key: jax.Array,
    step_r: jnp.ndarray,
    cfg: NerfConfig,
    barf_window: Tuple[float, float],
    barf_on: bool,
    compute_dtype=jnp.bfloat16,
    fine_mode: str = "grid",
    importance_samples: int = 64,
    use_pallas: bool = False,
    interpret: bool = False,
    occ: Optional[jnp.ndarray] = None,
    remat_shade: bool = False,
    coarse_free: bool = False,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Training render: coarse + hierarchical fine pass with sigma noise.

    Mirrors ref ``render_rays_train`` (mc_nerf.py:598-646):
      * coarse z = linspace(near, far, Sc) + per-ray shared uniform jitter;
      * coarse weights (fresh noise draw) drive fine-bin selection;
      * fine z grid = linspace(near, far, Sc*scale) + the same jitter;
      * unselected fine samples behave as sigma_default / white.

    ``fine_mode="importance"`` swaps the threshold/top-k grid selection for
    stratified inverse-CDF sampling of the coarse weights (fixed
    ``importance_samples`` per ray, every fine evaluation useful) — the
    TPU-fast formulation; quality parity is checked by scripts/dev_convergence.

    ``occ`` (importance mode only) is a ``[G*G, G]`` binary occupancy map
    (:mod:`mc_nerf_tpu.ops.occupancy`): the coarse pass then draws
    ``cfg.occ_coarse_samples`` stratified samples from the per-ray
    occupancy PMF instead of walking the uniform grid — empty space is
    never shaded.  An all-occupied map reproduces the uniform behavior.

    ``coarse_free=True`` (requires ``occ``; ``cfg.coarse_free``) drops the
    coarse MLP entirely: the fine depths are drawn straight from the
    occupancy PMF (the grid IS the proposal, NGP-style) and only the fine
    pass is shaded.  Returns ``(None, rgb_fine)`` — the caller drops the
    coarse loss term.

    Returns (rgb_coarse [R,3] or None, rgb_fine [R,3]).
    """
    kj, kn_c, kn_sel, kn_pdf, kn_f = jax.random.split(key, 5)
    n_rays = rays_d.shape[0]
    sc = cfg.samples_coarse

    if coarse_free:
        if occ is None or fine_mode != "importance":
            raise ValueError(
                "coarse_free requires an occupancy map and fine_mode='importance'"
            )
        freq_w = (
            barf_weights(cfg.emb_freqs_xyz, step_r, barf_window[0], barf_window[1])
            if barf_on
            else None
        )
        basis = sh_basis(cfg.sh_deg, rays_d)
        z_probe, pmf = proposal_pmf(occ, rays_o, rays_d, cfg)
        # mixture proposal (train only): cf_uniform_samples of the K are
        # stratified-uniform so empty space stays supervised — without
        # them the fine field is trained only ON the PMF support and
        # drifts freely off it (ops/occupancy.mixture_samples)
        z_f = mixture_samples(
            z_probe, pmf, importance_samples, cfg.cf_uniform_samples,
            kn_pdf, kn_sel, cfg.near, cfg.far,
        )                                                       # [R, K]
        if use_pallas:
            nb = (cfg.sh_deg + 1) ** 2
            basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
            packed_f = pack_mlp_params(
                params.fine, cfg.emb_freqs_xyz, cfg.fine_skips, dtype=jnp.float32
            )
            feat_f = encode_kernel_order(
                (rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]).reshape(-1, 3),
                cfg.emb_freqs_xyz, freq_w,
            )
            noise_f = jax.random.normal(kn_f, z_f.shape)
            ray_f, _ = fused_render(
                packed_f, feat_f, basis16, z_f, noise_f, None,
                cfg.fine_depth, tuple(cfg.fine_skips), importance_samples, nb,
                True, False, cfg.white_back, interpret,
            )
            return None, ray_f[:, :3]
        xyz_t = rays_o.T[:, :, None] + rays_d.T[:, :, None] * z_f[None, :, :]

        def shade_cf(xt):
            return _shade(
                params.fine, cfg.fine_skips, xt, basis, cfg, freq_w,
                compute_dtype,
            )

        if remat_shade:
            shade_cf = jax.checkpoint(shade_cf)
        sigma_f, rgb_f = shade_cf(xyz_t)
        out_f = composite(
            z_f, sigma_f, rgb_f, noise_key=kn_f, white_back=cfg.white_back,
            last_inf=True,
        )
        return None, out_f.rgb

    if occ is not None:
        if fine_mode != "importance":
            raise ValueError("occupancy culling requires fine_mode='importance'")
        sc = cfg.occ_coarse_samples
        z_probe, pmf = proposal_pmf(occ, rays_o, rays_d, cfg)
        # probe ladder carries phantom end bins (occupancy_pmf doc); clip
        # the drawn depths back into the render range
        z_c = jnp.clip(
            sample_pdf(z_probe, pmf, sc, key=kj), cfg.near, cfg.far
        )                                                           # [R, Sc]
        jitter = None  # grid fine mode is unreachable below
    else:
        z_c = jnp.linspace(cfg.near, cfg.far, sc, dtype=jnp.float32)
        jitter = jax.random.uniform(
            kj, (n_rays, 1), jnp.float32, 0.0, (cfg.far - cfg.near) / sc
        )
        z_c = z_c[None, :] + jitter                                 # [R, Sc]

    freq_w = (
        barf_weights(cfg.emb_freqs_xyz, step_r, barf_window[0], barf_window[1])
        if barf_on
        else None
    )
    basis = sh_basis(cfg.sh_deg, rays_d)                            # [R, B]

    # (pathological sample counts are handled inside fused_render — the
    # quarantine pad table ops/pallas/fused_render._QUARANTINED_S, empty
    # since the round-5 sweep retired the s=64 fault, and the measured
    # support ceiling _MAX_FUSED_S=160 — so no routing guard here)
    if use_pallas and fine_mode == "importance":
        # fully-fused path: MLP + SH shading + composite in one pallas call
        # per pass (ops/pallas/fused_render.py) — the per-sample [P, 8]
        # tensor never exists in HBM and XLA's composite chain disappears.
        # PRNG consumption matches the XLA path exactly (same keys/shapes).
        nb = (cfg.sh_deg + 1) ** 2
        basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
        packed_c = pack_mlp_params(
            params.coarse, cfg.emb_freqs_xyz, cfg.coarse_skips, dtype=jnp.float32
        )
        packed_f = pack_mlp_params(
            params.fine, cfg.emb_freqs_xyz, cfg.fine_skips, dtype=jnp.float32
        )
        feat_c = encode_kernel_order(
            (rays_o[:, None, :] + rays_d[:, None, :] * z_c[..., None]).reshape(-1, 3),
            cfg.emb_freqs_xyz, freq_w,
        )
        noise_c = jax.random.normal(kn_c, z_c.shape)
        noise_sel = jax.random.normal(kn_sel, z_c.shape)
        ray_c, wsel = fused_render(
            packed_c, feat_c, basis16, z_c, noise_c, noise_sel,
            cfg.coarse_depth, tuple(cfg.coarse_skips), z_c.shape[1], nb,
            True, True, cfg.white_back, interpret,
        )
        w_sel = jax.lax.stop_gradient(wsel)
        z_f = sample_pdf(z_c, w_sel, importance_samples, key=kn_pdf)
        feat_f = encode_kernel_order(
            (rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]).reshape(-1, 3),
            cfg.emb_freqs_xyz, freq_w,
        )
        noise_f = jax.random.normal(kn_f, z_f.shape)
        ray_f, _ = fused_render(
            packed_f, feat_f, basis16, z_f, noise_f, None,
            cfg.fine_depth, tuple(cfg.fine_skips), importance_samples, nb,
            True, False, cfg.white_back, interpret,
        )
        return ray_c[:, :3], ray_f[:, :3]

    # transposed ray tensors for the lane-friendly shade path ([3, R]);
    # tiny relayout (84 KB at 7000 rays) vs the [P, 3] ones it prevents
    o_t, d_t = rays_o.T, rays_d.T

    def shade_c(z):
        if use_pallas:
            xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
            return _shade_train_kernel(
                params.coarse, cfg.coarse_depth, cfg.coarse_skips, xyz, basis,
                cfg, freq_w, interpret,
            )
        xyz_t = o_t[:, :, None] + d_t[:, :, None] * z[None, :, :]
        return _shade(
            params.coarse, cfg.coarse_skips, xyz_t, basis, cfg, freq_w,
            compute_dtype,
        )

    def shade_f(z):
        if use_pallas:
            xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
            return _shade_train_kernel(
                params.fine, cfg.fine_depth, cfg.fine_skips, xyz, basis,
                cfg, freq_w, interpret,
            )
        xyz_t = o_t[:, :, None] + d_t[:, :, None] * z[None, :, :]
        return _shade(
            params.fine, cfg.fine_skips, xyz_t, basis, cfg, freq_w,
            compute_dtype,
        )

    if remat_shade:
        # recompute encode->MLP->shade in the backward instead of saving the
        # wide per-layer activations (TrainConfig.remat_shade); closed-over
        # params/rays are lifted by jax.checkpoint and still get gradients
        shade_c = jax.checkpoint(shade_c)
        shade_f = jax.checkpoint(shade_f)

    sigma_c, rgb_c = shade_c(z_c)
    out_c = composite(z_c, sigma_c, rgb_c, noise_key=kn_c, white_back=cfg.white_back)

    # --- fine-bin selection (no gradients, fresh noise: ref mc_nerf.py:613-621)
    deltas_c = compute_deltas(z_c, last_inf=True)
    w_sel = sigma_to_weights(deltas_c, jax.lax.stop_gradient(sigma_c), kn_sel)

    if fine_mode == "importance":
        z_f = sample_pdf(z_c, w_sel, importance_samples, key=kn_pdf)
        sigma_f, rgb_f = shade_f(z_f)
        out_f = composite(
            z_f, sigma_f, rgb_f, noise_key=kn_f, white_back=cfg.white_back,
            last_inf=True,
        )
        return out_c.rgb, out_f.rgb

    bin_idx, valid = select_fine_bins(w_sel, cfg.fine_bins_topk, cfg.weight_thresh)
    sample_idx, sample_valid = expand_bins_to_samples(bin_idx, valid, cfg.sample_scale)

    # fine z grid shares the coarse jitter (ref mc_nerf.py:633-634).
    # linspace is affine in the index, so compute z directly from the
    # sample index — a [R*Kf] scalar gather costs ~4 ms/step on a v5e.
    sf = cfg.samples_fine_grid
    step_f = (cfg.far - cfg.near) / (sf - 1)
    z_f = cfg.near + sample_idx.astype(jnp.float32) * step_f + jitter  # [R, Kf]

    sigma_f, rgb_f = shade_f(z_f)
    sigma_f = jnp.where(sample_valid, sigma_f, cfg.sigma_default)
    rgb_f = jnp.where(sample_valid[..., None], rgb_f, 1.0)
    # max_delta: z_f is a gathered subset of the uniform fine grid; the
    # reference composites the FULL grid (delta == step everywhere), so a
    # selection gap must not inflate the preceding sample's alpha.
    out_f = composite(
        z_f, sigma_f, rgb_f, noise_key=kn_f, white_back=cfg.white_back,
        last_inf=False, max_delta=step_f,
    )
    return out_c.rgb, out_f.rgb


def pack_eval_params(params: NerfParams, cfg: NerfConfig):
    """Kernel-layout weights for :func:`render_rays_eval`'s Pallas path:
    (coarse sigma-only, fine full).  Pack once per render program — outside
    the per-chunk loop — so the pads/permutes don't re-run per chunk."""
    return (
        pack_mlp_params(params.coarse, cfg.emb_freqs_xyz, cfg.coarse_skips,
                        sigma_only=True),
        pack_mlp_params(params.fine, cfg.emb_freqs_xyz, cfg.fine_skips),
    )


def _shade_pallas(
    packed: PackedMLP,
    depth: int,
    skips,
    xyz: jnp.ndarray,
    basis: Optional[jnp.ndarray],
    cfg: NerfConfig,
    interpret: bool = False,
):
    """Fused-kernel shading: encode (XLA) -> Pallas MLP (+ in-kernel SH
    shading when a basis is given).

    ``basis=None`` is the density-only coarse path (returns (sigma, None)).
    """
    r, s = xyz.shape[0], xyz.shape[1]
    feat = encode_kernel_order(xyz.reshape(r * s, 3), cfg.emb_freqs_xyz, None)
    if basis is None:
        out = fused_mlp_apply(packed, feat, depth, tuple(skips), interpret=interpret)
        return out[:, 0].reshape(r, s), None
    nb = (cfg.sh_deg + 1) ** 2
    basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
    out = fused_shaded_mlp(
        packed, feat, basis16, depth, tuple(skips), s, nb, interpret
    )
    sigma = out[:, 0].reshape(r, s)
    rgb = out[:, 1:4].reshape(r, s, 3)
    return sigma, rgb


def render_rays_eval(
    params: NerfParams,
    rays_d: jnp.ndarray,
    rays_o: jnp.ndarray,
    cfg: NerfConfig,
    compute_dtype=jnp.bfloat16,
    fine_mode: str = "importance",
    importance_samples: int = 64,
    packed: Optional[Tuple[PackedMLP, PackedMLP]] = None,
    interpret: bool = False,
    occ: Optional[jnp.ndarray] = None,
    coarse_free: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Eval render: no jitter, no sigma noise (ref ``render_rays_test``).

    The coarse pass is density-only (its rgb is never composited at eval,
    so the SH head is skipped — ~40% of the coarse FLOPs).  Two fine modes:

    * ``"importance"`` (default, TPU-fast): a fixed ``importance_samples``
      depths per ray drawn by deterministic inverse-CDF sampling of the
      coarse weights (:func:`sample_pdf`).  Static shapes, no masked waste:
      every fine-MLP evaluation contributes.  This replaces — not
      translates — the reference's dynamic threshold selection
      (mc_nerf.py:623-632); quality is checked against the grid mode.
    * ``"grid"`` (reference-faithful): threshold + top-k bins on the
      sample_scale-times-finer grid, unselected slots defaulting to
      sigma_default/white exactly like mc_nerf.py:692-694.

    Returns (rgb [R,3], depth [R,1], opacity [R,1]) from the fine pass.
    """
    n_rays = rays_d.shape[0]
    sc = cfg.samples_coarse
    if coarse_free:
        # fine samples straight from the occupancy PMF; no coarse pass at
        # all (mirrors the train-side coarse_free branch)
        if occ is None or fine_mode != "importance":
            raise ValueError(
                "coarse_free requires an occupancy map and fine_mode='importance'"
            )
        basis = sh_basis(cfg.sh_deg, rays_d)
        z_probe, pmf = proposal_pmf(occ, rays_o, rays_d, cfg)
        z_f = jnp.clip(
            sample_pdf(z_probe, pmf, importance_samples), cfg.near, cfg.far
        )
        if packed is not None:
            nb = (cfg.sh_deg + 1) ** 2
            basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
            xyz_f = rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]
            feat_f = encode_kernel_order(
                xyz_f.reshape(-1, 3), cfg.emb_freqs_xyz, None
            )
            ray_f, _ = fused_render(
                packed[1], feat_f, basis16, z_f, None, None,
                cfg.fine_depth, tuple(cfg.fine_skips), importance_samples, nb,
                False, False, cfg.white_back, interpret,
            )
            return ray_f[:, :3], ray_f[:, 3:4], ray_f[:, 4:5]
        xyz_t = rays_o.T[:, :, None] + rays_d.T[:, :, None] * z_f[None, :, :]
        sigma_f, rgb_f = _shade(
            params.fine, cfg.fine_skips, xyz_t, basis, cfg, None, compute_dtype
        )
        out = composite(
            z_f, sigma_f, rgb_f, noise_key=None, white_back=cfg.white_back,
            last_inf=True,
        )
        return out.rgb, out.depth, out.opacity

    if occ is not None:
        if fine_mode != "importance":
            raise ValueError("occupancy culling requires fine_mode='importance'")
        sc = cfg.occ_coarse_samples
        z_probe, pmf = proposal_pmf(occ, rays_o, rays_d, cfg)
        # deterministic midpoint strata; clip the phantom-end-bin overhang
        z_c = jnp.clip(sample_pdf(z_probe, pmf, sc), cfg.near, cfg.far)
    else:
        z_c = jnp.broadcast_to(
            jnp.linspace(cfg.near, cfg.far, sc, dtype=jnp.float32)[None, :],
            (n_rays, sc),
        )
    basis = sh_basis(cfg.sh_deg, rays_d)

    o_t, d_t = rays_o.T, rays_d.T
    if packed is not None:
        xyz_c = rays_o[:, None, :] + rays_d[:, None, :] * z_c[..., None]
        sigma_c, _ = _shade_pallas(
            packed[0], cfg.coarse_depth, cfg.coarse_skips, xyz_c, None, cfg,
            interpret,
        )
    else:
        xyz_t = o_t[:, :, None] + d_t[:, :, None] * z_c[None, :, :]
        sigma_c, _ = _shade(
            params.coarse, cfg.coarse_skips, xyz_t, basis, cfg, None,
            compute_dtype, sigma_only=True,
        )
    deltas_c = compute_deltas(z_c, last_inf=True)
    w_sel = sigma_to_weights(deltas_c, sigma_c, noise_key=None)

    def shade_fine(z_f):
        if packed is not None:
            xyz_f = rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]
            return _shade_pallas(
                packed[1], cfg.fine_depth, cfg.fine_skips, xyz_f, basis, cfg,
                interpret,
            )
        xyz_t = o_t[:, :, None] + d_t[:, :, None] * z_f[None, :, :]
        return _shade(
            params.fine, cfg.fine_skips, xyz_t, basis, cfg, None, compute_dtype
        )

    if fine_mode == "importance":
        z_f = sample_pdf(z_c, w_sel, importance_samples)            # [R, K]
        if packed is not None:
            xyz_f = rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]
            # fused MLP + shading + composite in one kernel call
            nb = (cfg.sh_deg + 1) ** 2
            basis16 = jnp.pad(basis, ((0, 0), (0, BASIS_LANES - nb)))
            feat_f = encode_kernel_order(
                xyz_f.reshape(-1, 3), cfg.emb_freqs_xyz, None
            )
            ray_f, _ = fused_render(
                packed[1], feat_f, basis16, z_f, None, None,
                cfg.fine_depth, tuple(cfg.fine_skips), importance_samples, nb,
                False, False, cfg.white_back, interpret,
            )
            return ray_f[:, :3], ray_f[:, 3:4], ray_f[:, 4:5]
        sigma_f, rgb_f = shade_fine(z_f)
        out = composite(
            z_f, sigma_f, rgb_f, noise_key=None, white_back=cfg.white_back,
            last_inf=True,
        )
        return out.rgb, out.depth, out.opacity

    if fine_mode != "grid":
        raise ValueError(f"unknown eval fine_mode: {fine_mode!r}")

    bin_idx, valid = select_fine_bins(w_sel, cfg.fine_bins_topk, cfg.weight_thresh)
    sample_idx, sample_valid = expand_bins_to_samples(bin_idx, valid, cfg.sample_scale)

    sf = cfg.samples_fine_grid
    step_f = (cfg.far - cfg.near) / (sf - 1)
    z_f = cfg.near + sample_idx.astype(jnp.float32) * step_f
    sigma_f, rgb_f = shade_fine(z_f)
    sigma_f = jnp.where(sample_valid, sigma_f, cfg.sigma_default)
    rgb_f = jnp.where(sample_valid[..., None], rgb_f, 1.0)
    out = composite(
        z_f, sigma_f, rgb_f, noise_key=None, white_back=cfg.white_back,
        last_inf=False, max_delta=step_f,
    )
    return out.rgb, out.depth, out.opacity
