"""Occupancy-grid sample culling: the algorithmic lever on samples/ray.

The 10x-per-chip throughput target is above bf16 speed-of-light at the
reference's sample counts (BASELINE.md "speed-of-light check"), so raw
kernel quality cannot reach it; NGP-era NeRFs get there by not evaluating
the MLP in empty space.  The reference itself gestures at this with its
dead ``grid_nerf``/``sigma_init`` config keys and the unused
``query_sigma``/``update_sigma`` voxel-cache stubs
(``/root/reference/model/mc_nerf.py:859-867``, ``config/config.yaml:65-66``)
— here the idea is implemented TPU-first:

  * a dense ``[G, G, G]`` grid of activated (softplus) coarse-MLP density
    over the scene AABB (the reference's ``global_boader_min/max`` keys),
    refreshed every N epochs by ONE batched lattice evaluation — no
    scatters, no incremental point updates (HBM scatters measured
    catastrophic on a v5e, BASELINE.md);
  * per epoch the grid thresholds/dilates into a binary occupancy map laid
    out ``[G*G, G]`` (z in lanes) so ray probes are *row* gathers plus a
    lane one-hot reduction — the embedding-lookup form XLA/TPU handles
    well, never a per-scalar gather;
  * the train/eval renderers draw their coarse samples from a per-ray PMF
    ``max(occupancy, floor)`` via the existing inverse-CDF sampler
    (:func:`mc_nerf_tpu.ops.volume.sample_pdf`) — static shapes always:
    culling changes *where* samples land, never how many there are.

Correctness notes:
  * an all-occupied grid (the initial state) gives a uniform PMF, i.e.
    stratified-uniform coarse sampling — the pre-culling behavior — so
    warmup needs no second code path and no shape change;
  * skipping empty space is conservative by construction: empty cells have
    softplus(sigma) ~ 0, so alpha there is ~0 regardless of sample spacing
    and transmittance is unaffected;
  * the refresh re-evaluates the whole lattice from the MLP (not from
    training samples), so density appearing anywhere is always re-captured
    — the ``floor`` keeps a little sampling pressure everywhere so the MLP
    itself keeps receiving supervision in culled regions;
  * culling presumes the scene fits the AABB — exactly what the
    reference's ``global_boader_min/max`` declare; probes outside it read
    as empty.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mc_nerf_tpu.config import NerfConfig


class OccupancyGrid(NamedTuple):
    """EMA-max activated density on the scene lattice.

    ``density[i, j, k]`` = running max of softplus(sigma) at cell (i, j, k)
    (x-major).  This is *derived* state: it is rebuilt from the coarse MLP
    in one call, so it is never checkpointed — resume and demo re-derive it.
    """

    density: jnp.ndarray  # [G, G, G] float32


def init_grid(g: int) -> OccupancyGrid:
    """All-occupied grid: the sampling PMF starts uniform (= no culling)."""
    return OccupancyGrid(density=jnp.full((g, g, g), 1e4, jnp.float32))


def _lattice(g: int, lo: float, hi: float, key: Optional[jax.Array]) -> jnp.ndarray:
    """[G^3, 3] sample points, one per cell: centers, or uniform within the
    cell when a key is given (jitter decorrelates successive refreshes so
    the EMA-max sweeps each cell's volume, as in NGP's grid update)."""
    cell = (hi - lo) / g
    axis = lo + (jnp.arange(g, dtype=jnp.float32) + 0.5) * cell
    x, y, z = jnp.meshgrid(axis, axis, axis, indexing="ij")
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if key is not None:
        pts = pts + jax.random.uniform(
            key, pts.shape, jnp.float32, -0.5 * cell, 0.5 * cell
        )
    return pts


def update_grid(
    grid: Optional[OccupancyGrid],
    sigma_act_fn: Callable[[jnp.ndarray], jnp.ndarray],
    g: int,
    lo: float,
    hi: float,
    key: Optional[jax.Array] = None,
    decay: float = 0.95,
    chunk: int = 262144,
) -> OccupancyGrid:
    """Refresh the grid from the coarse MLP: one dense lattice evaluation.

    Args:
      grid: previous grid for the EMA-max ``max(decay * old, new)``; None
        rebuilds from scratch (resume / demo).
      sigma_act_fn: ``[P, 3] -> [P]`` activated density (softplus of the
        coarse MLP's sigma head) — a closure over the current parameters.
      g, lo, hi: lattice size and AABB.
      key: optional jitter key (see :func:`_lattice`).
      decay: EMA-max decay per refresh.
      chunk: lattice points per ``lax.map`` step (bounds activation memory;
        G=128 is 2M points, ~1 GB of width-128 bf16 activations unchunked).

    Returns:
      the refreshed :class:`OccupancyGrid`.
    """
    pts = _lattice(g, lo, hi, key)
    n = pts.shape[0]
    if n % chunk:
        pad = -(-n // chunk) * chunk - n
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), jnp.float32)])
    act = jax.lax.map(sigma_act_fn, pts.reshape(-1, chunk, 3)).reshape(-1)[:n]
    act = act.reshape(g, g, g)
    if grid is not None:
        act = jnp.maximum(decay * grid.density, act)
    return OccupancyGrid(density=act)


def binary_grid(grid: OccupancyGrid, cfg: NerfConfig) -> jnp.ndarray:
    """Threshold + dilate the density grid into the sampler's occupancy map.

    A cell is occupied iff one coarse-step's worth of its density would
    contribute alpha above ``occ_thresh``:
    ``softplus(sigma) * coarse_step > occ_thresh`` (alpha = 1 - exp(-x) ~ x
    at these magnitudes).  A 3^3 max-pool dilation then pads every occupied
    cell by one voxel so boundary geometry is never starved.

    Returns:
      per ``cfg.occ_map_dtype`` (row = ix * G + iy throughout; all layouts
      are exact — values are {0, 1}):
        * "bfloat16" / "int8": [G*G, G] with lane = iz;
        * "bitpack": [G*G, G//32] uint32, z cell iz lives in word iz >> 5,
          bit iz & 31 — 16x less probe-gather traffic than bf16.
    """
    g = grid.density.shape[0]
    # step = the spacing the culled coarse pass actually takes
    # (occ_coarse_samples per ray, not the uncull samples_coarse): the
    # threshold then means "one real coarse-step's worth of alpha", and is
    # ~4x more conservative than thresholding at the uncull spacing
    step_c = (cfg.far - cfg.near) / cfg.occ_coarse_samples
    occ = (grid.density * step_c > cfg.occ_thresh).astype(jnp.float32)
    if cfg.occ_dilate:
        occ = jax.lax.reduce_window(
            occ, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
        )
    # storage layout: the probe's row gather is the single largest HBM op
    # in the train step ([R, P, G] rows — 114 MB at reference scale in f32)
    dt = cfg.occ_map_dtype
    if dt in ("bfloat16", "int8"):
        return occ.reshape(g * g, g).astype(jnp.dtype(dt))
    if dt == "bitpack":
        if g % 32:
            raise ValueError(f"bitpack needs occ_grid_size % 32 == 0, got {g}")
        bits = occ.reshape(g * g, g // 32, 32).astype(jnp.uint32)
        weights = jnp.left_shift(
            jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32)
        )
        return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    raise ValueError(f"unknown occ_map_dtype: {dt!r}")


def density_rows(grid: OccupancyGrid, cfg: NerfConfig) -> jnp.ndarray:
    """Density-valued sampler map for ``occ_pmf="density"`` (coarse-free).

    The binary map throws away the grid's magnitudes, so the coarse-free
    PMF is piecewise-UNIFORM over occupied cells — it cannot concentrate
    samples at surfaces the way the two-pass coarse weights do, and at
    sparse budgets (cf16/cf32) the fine MLP plateaus (measured: Array rig
    6.1 PSNR vs 18.1 two-pass, BASELINE.md round 4).  This keeps the EMA
    density itself in the ``[G*G, G]`` probe layout so
    :func:`density_pmf` can build real compositing weights
    (transmittance x alpha) from the grid — a grid-based coarse pass at
    zero MLP cost.

    Same 3^3 max-pool dilation as :func:`binary_grid` (boundary cells must
    not be starved); bf16 rows (the probe gather is lane-bound, not
    byte-bound — BASELINE.md round-3 layout A/B).
    """
    g = grid.density.shape[0]
    d = grid.density
    if cfg.occ_dilate:
        d = jax.lax.reduce_window(
            d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
        )
    return d.reshape(g * g, g).astype(jnp.bfloat16)


def uniform_prior_map(cfg: NerfConfig) -> jnp.ndarray:
    """The warmup / pre-refresh sampler map that yields UNIFORM sampling.

    * ``occ_pmf="binary"``: the all-occupied binary map (occupancy 1
      everywhere -> flat PMF);
    * ``occ_pmf="density"``: the all-ZERO density map (alpha 0 everywhere
      -> the PMF is pure ``occ_floor`` -> flat).  An all-occupied 1e4
      density would instead front-load every ray's samples at the near
      plane through the transmittance term.
    """
    if cfg.occ_pmf == "density":
        g = cfg.occ_grid_size
        return jnp.zeros((g * g, g), jnp.bfloat16)
    return binary_grid(init_grid(cfg.occ_grid_size), cfg)


def sampler_map(grid: OccupancyGrid, cfg: NerfConfig) -> jnp.ndarray:
    """The per-``cfg.occ_pmf`` map :func:`proposal_pmf` consumes."""
    if cfg.occ_pmf == "density":
        return density_rows(grid, cfg)
    return binary_grid(grid, cfg)


def probe_occupancy(
    occ2d: jnp.ndarray,
    lo: float,
    hi: float,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Occupancy at world points, gather-light.

    The lookup gathers whole z-rows (``jnp.take`` over the leading axis —
    the embedding-lookup form the TPU gather path vectorizes) and resolves
    the z lane with a one-hot masked reduction (bf16/int8 layouts) or a
    word-select + shift/mask (bitpacked uint32 layout); out-of-AABB points
    read 0.

    Args:
      occ2d: binary map from :func:`binary_grid` (any of its layouts; the
        bitpacked one is recognized by its uint32 dtype).
      lo, hi: AABB bounds.
      x: [..., 3] world points.

    Returns:
      [...] float32 occupancy in {0, 1}.
    """
    bitpacked = occ2d.dtype == jnp.uint32
    g = occ2d.shape[-1] * 32 if bitpacked else occ2d.shape[-1]
    u = (x - lo) / (hi - lo) * g                         # [..., 3] in voxel units
    idx = jnp.floor(u).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    rows = jnp.take(occ2d, idx[..., 0] * g + idx[..., 1], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
    if bitpacked:
        # rows: [..., G/32] uint32 words; select word iz >> 5, test bit iz & 31
        word = jnp.sum(
            jnp.where(lane == (idx[..., 2:3] >> 5), rows, jnp.uint32(0)),
            axis=-1,
        )
        bit = jnp.right_shift(word, (idx[..., 2] & 31).astype(jnp.uint32))
        val = bit & jnp.uint32(1)
    else:
        zero = jnp.zeros((), rows.dtype)
        val = jnp.sum(jnp.where(lane == idx[..., 2:3], rows, zero), axis=-1)
    return val.astype(jnp.float32) * inb.astype(jnp.float32)


def occupancy_pmf(
    occ2d: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: NerfConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray coarse-sampling PMF from the occupancy map.

    Probes ``occ_probes`` uniform depths across [near, far] per ray and
    floors the result so culled space keeps ``occ_floor`` of each probe's
    mass (exploration + robustness to grid staleness).

    The returned ladder carries one phantom probe beyond each end
    (``occ_probes + 2`` entries): :func:`mc_nerf_tpu.ops.volume.sample_pdf`
    drops the first and last weight by construction, so without the padding
    occupancy in the first/last real probe bin could never influence the
    PMF — geometry hugging the near or far plane would be sampled only via
    the ``occ_floor`` fallback.  Phantom depths extend one spacing outside
    [near, far]; callers clip the sampled depths back to [near, far].

    Args:
      occ2d: [G*G, G] binary map.
      rays_o, rays_d: [R, 3] ray origins/directions.
      cfg: NeRF config (near/far/AABB/probe count).

    Returns:
      (z_probe [R, P+2] probe depths, pmf [R, P+2] unnormalized weights —
       the two phantom end weights are zero and are dropped by sample_pdf).
    """
    p = cfg.occ_probes
    h = (cfg.far - cfg.near) / (p - 1)
    z = jnp.linspace(cfg.near - h, cfg.far + h, p + 2, dtype=jnp.float32)
    z = jnp.broadcast_to(z[None, :], (rays_o.shape[0], p + 2))
    x = rays_o[:, None, :] + rays_d[:, None, :] * z[..., 1:-1, None]
    occ = probe_occupancy(occ2d, cfg.bound_min, cfg.bound_max, x)
    pmf = jnp.pad(occ + cfg.occ_floor, ((0, 0), (1, 1)))
    return z, pmf


def density_pmf(
    dens2d: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: NerfConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compositing-weight PMF from the EMA density grid (``occ_pmf="density"``).

    A grid-based coarse pass: probe ``occ_probes`` uniform depths, read the
    activated density from :func:`density_rows`' map, and build the same
    weights the two-pass renderer computes from the coarse MLP —
    ``w_i = T_i * (1 - exp(-d_i * h))`` with ``T_i = exp(-h * sum_{j<i} d_j)``
    — so the fine inverse-CDF draw concentrates at surfaces instead of
    spreading uniformly over occupied cells (the binary PMF's failure mode
    at sparse budgets, BASELINE.md round 4).  Costs the same row gather as
    :func:`occupancy_pmf` plus one cumsum; zero MLP evaluations.

    The floor is scaled ``occ_floor / occ_probes`` (total exploration mass
    ~= occ_floor vs a total weight mass <= 1; the binary PMF's per-probe
    floor against {0,1} masses has the same ratio).  An all-zero density
    map (the warmup prior, :func:`uniform_prior_map`) yields the pure-floor
    uniform PMF.  Same phantom-end-bin ladder as :func:`occupancy_pmf`.
    """
    p = cfg.occ_probes
    h = (cfg.far - cfg.near) / (p - 1)
    z = jnp.linspace(cfg.near - h, cfg.far + h, p + 2, dtype=jnp.float32)
    z = jnp.broadcast_to(z[None, :], (rays_o.shape[0], p + 2))
    x = rays_o[:, None, :] + rays_d[:, None, :] * z[..., 1:-1, None]
    d = probe_occupancy(dens2d, cfg.bound_min, cfg.bound_max, x)  # [R, P]
    dh = d * h
    alpha = 1.0 - jnp.exp(-dh)
    trans = jnp.exp(-jnp.cumsum(dh, axis=-1) + dh)  # exclusive prefix sum
    w = trans * alpha
    pmf = jnp.pad(w + cfg.occ_floor / p, ((0, 0), (1, 1)))
    return z, pmf


def mixture_samples(
    z_probe: jnp.ndarray,
    pmf: jnp.ndarray,
    n_samples: int,
    n_uniform: int,
    key_pdf: jax.Array,
    key_u: jax.Array,
    near: float,
    far: float,
) -> jnp.ndarray:
    """Coarse-free fine depths: (K - ku) inverse-CDF draws from the grid
    PMF plus ku STRATIFIED-UNIFORM draws over [near, far], sorted per ray
    (compositing needs monotone z).  Constant total budget K.

    The uniform fraction is a training need, not an eval one: pure-PMF
    coarse-free training supervises the fine field only ON the PMF
    support, so its density drifts freely off it and the field itself
    degrades (Array hybrid ev2p 7.86 vs 18.08 PSNR, BASELINE.md round 4).
    A stratified sample through empty space composites every step and
    pins it down — the same signal the two-pass coarse pass provides.
    ``n_uniform`` clamps to [0, K-1]; 0 reduces to the pure PMF draw.
    """
    from mc_nerf_tpu.ops.volume import sample_pdf

    ku = min(max(n_uniform, 0), n_samples - 1)
    z = jnp.clip(sample_pdf(z_probe, pmf, n_samples - ku, key=key_pdf),
                 near, far)                                    # [R, K-ku]
    if ku == 0:
        return z
    n_rays = z.shape[0]
    u = (
        jnp.arange(ku, dtype=jnp.float32)[None, :]
        + jax.random.uniform(key_u, (n_rays, ku), jnp.float32)
    ) / ku
    z_u = near + (far - near) * u
    return jnp.sort(jnp.concatenate([z, z_u], axis=-1), axis=-1)


def proposal_pmf(
    occ2d: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: NerfConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on ``cfg.occ_pmf``: the map's VALUES carry the semantics
    (binary {0,1} vs bf16 density), so one map array threads through the
    jitted epoch program either way."""
    if cfg.occ_pmf == "density":
        return density_pmf(occ2d, rays_o, rays_d, cfg)
    return occupancy_pmf(occ2d, rays_o, rays_d, cfg)
