"""Jitted train/eval step functions for the three training stages.

TPU-first data flow: every tensor a step needs is device-resident —
training images (uint8), calibration detections, camera/NeRF parameters —
so a step consumes only a PRNG key and scalar progress.  Whole epochs run as
one ``lax.scan`` over steps (``make_stage_epoch``), eliminating the
reference's per-step host -> device round trip (torch DataLoader with 12
workers, ``data/data_read.py:354-380``).

Stage semantics follow ref ``MC_Model.forward`` (``model/mc_nerf.py:58-105``):
  stage 0 (CAM_PARAM):    intr + extr reprojection losses, cameras only;
  stage 1 (GLOBAL_OPTIM): self-normalized intr loss + coarse/fine RGB losses,
                          BARF mask on, everything trains;
  stage 2 (FINE_TUNE):    same as stage 1 with BARF off and poses frozen.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.sharding import PartitionSpec as P

from mc_nerf_tpu.config import Config
from mc_nerf_tpu.cameras.projection import reproject_points
from mc_nerf_tpu.cameras.rays import pixel_grid, rays_for_pixels
from mc_nerf_tpu.data.calibration import CalibrationData, sample_tags
from mc_nerf_tpu.models.camera_params import (
    calib_cube_poses,
    camera_poses,
    intrinsics,
)
from mc_nerf_tpu.models.nerf import (
    pack_eval_params,
    render_rays_eval,
    render_rays_train,
)
from mc_nerf_tpu.parallel.mesh import shard_batch
from mc_nerf_tpu.train.loss import reprojection_loss, rgb_loss, self_normalized
from mc_nerf_tpu.train.optim import FlatOptState, Params


class TrainData(NamedTuple):
    """Device-resident per-scene training tensors (replicated).

    ``occ`` is the binary occupancy map (``ops/occupancy.binary_grid``),
    refreshed by the engine between epochs — constant within an epoch's
    scan, so it rides here rather than in the carried :class:`TrainState`.
    None disables culling (and is the pre-refresh / grid-fine-mode state).
    """

    images_u8: jnp.ndarray   # [N, H*W, 3] uint8 white-composited train images
    calib: CalibrationData
    occ: Optional[jnp.ndarray] = None   # binary occupancy map (any
    # ops/occupancy.binary_grid layout: [G*G, G] bf16/int8 or bitpacked u32)


class TrainState(NamedTuple):
    params: Params
    opt_states: Tuple            # one FlatOptState per stage
    step: jnp.ndarray            # global step counter (drives BARF progress)


def _calib_losses(params: Params, data: TrainData, key: jax.Array, img_h, img_w):
    """Intrinsic + extrinsic reprojection losses for the current step."""
    k_int, k_ext = jax.random.split(key)
    K = intrinsics(params.cam, img_h, img_w)
    w_int, p_int = sample_tags(
        k_int, data.calib.calib_pts, data.calib.calib_tag_ids,
        data.calib.calib_counts, data.calib.cube_pts,
    )
    w_ext, p_ext = sample_tags(
        k_ext, data.calib.coord_pts, data.calib.coord_tag_ids,
        data.calib.coord_counts, data.calib.cube_pts,
    )
    pred_int = reproject_points(w_int, K, calib_cube_poses(params.cam))
    pred_ext = reproject_points(w_ext, K, camera_poses(params.cam))
    loss_int = reprojection_loss(pred_int, p_int, img_h, img_w)
    loss_ext = reprojection_loss(pred_ext, p_ext, img_h, img_w)
    return loss_int, loss_ext


def _sample_ray_batch(
    params: Params,
    data: TrainData,
    key: jax.Array,
    cfg: Config,
    img_h: int,
    img_w: int,
    images_per_batch: int,
    mesh,
):
    """Sample (rays, gt) for one step, fully on device.

    One random train image per batch slot with ``rays_per_batch`` distinct
    pixels each — the reference's randperm-without-replacement semantics
    (``mc_nerf.py:327-345``) vectorized over the batch.  Rays are generated
    only for the sampled pixels (O(rays), not O(H*W)).
    """
    n_images = data.images_u8.shape[0]
    hw = img_h * img_w
    rays = cfg.train.rays_per_batch
    k_img, k_pix = jax.random.split(key)

    img_ids = jax.random.randint(k_img, (images_per_batch,), 0, n_images)
    img_ids = shard_batch(img_ids, mesh)
    pix_keys = jax.random.split(k_pix, images_per_batch)
    if hw > 8 * rays:
        # with-replacement sampling: at 800x800 a full permutation costs
        # ~16 ms/step on a v5e while expected collisions are ~R^2/2HW
        # (~38 of 7000 pixels) — statistically indistinguishable from the
        # reference's randperm (mc_nerf.py:329)
        pix_idx = jax.vmap(lambda k: jax.random.randint(k, (rays,), 0, hw))(pix_keys)
    else:
        # small images: without-replacement matters (rays ~ HW)
        pix_idx = jax.vmap(lambda k: jax.random.permutation(k, hw)[:rays])(pix_keys)
    pix_idx = shard_batch(pix_idx, mesh)                        # [B, R]

    grid = pixel_grid(img_h, img_w)                             # [HW, 2]
    pix_xy = jnp.take(grid, pix_idx, axis=0)                    # [B, R, 2]

    K = intrinsics(params.cam, img_h, img_w)[img_ids]           # [B, 3, 3]
    pose = camera_poses(params.cam)[img_ids]                    # [B, 3, 4]
    rays_d, rays_o = rays_for_pixels(pix_xy, pose, K)           # [B, R, 3]

    gt = jax.vmap(lambda i, p: jnp.take(data.images_u8[i], p, axis=0))(
        img_ids, pix_idx
    )
    gt = gt.astype(jnp.float32) / 255.0                         # [B, R, 3]
    return (
        rays_d.reshape(-1, 3),
        rays_o.reshape(-1, 3),
        gt.reshape(-1, 3),
    )


def make_loss_fn(
    cfg: Config,
    stage: int,
    img_h: int,
    img_w: int,
    total_steps: int,
    images_per_batch: int = 1,
    mesh=None,
) -> Callable:
    """Per-stage loss: ``(params, data, key, step) -> (loss, metrics)``."""
    barf_window = cfg.barf.global_window(cfg.stages)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    zero = jnp.zeros(())
    # default OFF for training: re-measured after the round-3 layout work —
    # fused path 17.0 vs XLA 14.1 ms/step at occ32/imp16 (v5e); the fused
    # backward kernel's blockwise remat runs ~2x XLA's backward GEMMs at
    # this geometry, so the loss is structural (BASELINE.md round-3
    # attribution).  Eval keeps the kernels (clear win there).
    use_pallas = cfg.train.use_pallas
    if use_pallas is None:
        use_pallas = False

    def loss_fn(params: Params, data: TrainData, key: jax.Array, step):
        k_calib, k_rays, k_render = jax.random.split(key, 3)
        loss_int, loss_ext = _calib_losses(params, data, k_calib, img_h, img_w)
        if stage == 0:
            total = loss_int + loss_ext
            return total, {
                "loss": total, "loss_intr": loss_int, "loss_extr": loss_ext,
                "loss_rgb_c": zero, "loss_rgb_f": zero,
            }
        rays_d, rays_o, gt = _sample_ray_batch(
            params, data, k_rays, cfg, img_h, img_w, images_per_batch, mesh
        )
        step_r = step.astype(jnp.float32) / total_steps
        rgb_c, rgb_f = render_rays_train(
            params.nerf, rays_d, rays_o, k_render, step_r, cfg.nerf,
            barf_window, barf_on=(stage == 1), compute_dtype=compute_dtype,
            fine_mode=cfg.train.fine_mode,
            importance_samples=cfg.train.importance_samples,
            use_pallas=use_pallas,
            occ=data.occ,
            remat_shade=cfg.train.remat_shade,
            coarse_free=cfg.nerf.coarse_free_at(stage),
        )
        # coarse-free mode has no coarse render (nerf.py returns None);
        # the rgb_c loss term drops with it
        loss_c = zero if rgb_c is None else rgb_loss(rgb_c, gt)
        loss_f = rgb_loss(rgb_f, gt)
        total = self_normalized(loss_int) + loss_c + loss_f
        return total, {
            "loss": total, "loss_intr": loss_int, "loss_extr": loss_ext,
            "loss_rgb_c": loss_c, "loss_rgb_f": loss_f,
        }

    return loss_fn


def make_stage_step(
    cfg: Config,
    stage: int,
    tx,
    img_h: int,
    img_w: int,
    total_steps: int,
    images_per_batch: int = 1,
    mesh=None,
) -> Callable:
    """Single jitted step: ``(state, data, key) -> (state, metrics)``.

    ``tx`` is the stage's :class:`mc_nerf_tpu.train.optim.FlatRAdam`; the
    parameter pytree flattens at the jit boundary (``ravel_pytree``) so the
    optimizer touches three ``[N]`` buffers, and unflattens on exit — the
    unravel is slices+reshapes XLA fuses into the consumers.
    """
    loss_fn = make_loss_fn(
        cfg, stage, img_h, img_w, total_steps, images_per_batch, mesh
    )

    def step_fn(state: TrainState, data: TrainData, key: jax.Array):
        p_flat, unravel = ravel_pytree(state.params)

        def flat_loss(pf):
            return loss_fn(unravel(pf), data, key, state.step)

        (_, metrics), g_flat = jax.value_and_grad(flat_loss, has_aux=True)(p_flat)
        new_flat, new_opt = tx.update(g_flat, state.opt_states[stage], p_flat)
        new_opts = tuple(
            new_opt if i == stage else s for i, s in enumerate(state.opt_states)
        )
        return TrainState(unravel(new_flat), new_opts, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_stage_epoch(
    cfg: Config,
    stage: int,
    tx,
    img_h: int,
    img_w: int,
    total_steps: int,
    steps_per_epoch: int,
    images_per_batch: int = 1,
    mesh=None,
) -> Callable:
    """One whole epoch as a single compiled ``lax.scan`` program.

    ``(state, data, epoch_key) -> (state, mean_metrics)`` — the TPU-native
    replacement for the reference's per-step Python loop (``main.py:78-91``).

    The scan carries exactly five flat arrays — params [N], RAdam mu/nu
    [N], the optimizer count, and the global step — instead of round 2's
    ~50-leaf (params, optax-state) pytree, whose small per-leaf carry
    copies/slices XLA could not alias (~1 ms/step profiled at reference
    scale; an earlier cut of the same problem — carrying all three stages'
    states — cost 5.4 ms/step).
    """
    loss_fn = make_loss_fn(
        cfg, stage, img_h, img_w, total_steps, images_per_batch, mesh
    )

    def epoch_fn(state: TrainState, data: TrainData, epoch_key: jax.Array):
        keys = jax.random.split(epoch_key, steps_per_epoch)
        p_flat, unravel = ravel_pytree(state.params)
        opt = state.opt_states[stage]

        def body(carry, key):
            pf, mu, nu, count, step = carry

            def flat_loss(f):
                return loss_fn(unravel(f), data, key, step)

            (_, metrics), gf = jax.value_and_grad(flat_loss, has_aux=True)(pf)
            new_pf, new_opt = tx.update(gf, FlatOptState(mu, nu, count), pf)
            return (
                (new_pf, new_opt.mu, new_opt.nu, new_opt.count, step + 1),
                metrics,
            )

        carry = (p_flat, opt.mu, opt.nu, opt.count, state.step)
        (pf, mu, nu, count, step), metrics = jax.lax.scan(body, carry, keys)
        new_opts = tuple(
            FlatOptState(mu, nu, count) if i == stage else s
            for i, s in enumerate(state.opt_states)
        )
        return TrainState(unravel(pf), new_opts, step), jax.tree.map(jnp.mean, metrics)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_render_fn(
    cfg: Config,
    img_h: int,
    img_w: int,
    rays_per_chunk: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Full-image renderer: fixed-size chunked ``lax.map`` over the ray axis.

    Replaces the reference's Python chunk loop (``mc_nerf.py:112-118``,
    ``:775-780``) with one compiled program per image size.  With a mesh,
    each chunk's ray axis is split over the devices via ``shard_map`` —
    rays are embarrassingly parallel, so the frame latency divides by the
    device count with zero collectives (this is how the <1 s/frame v4-8
    target follows from the measured 1.77 s single-chip v5e figure).

    ``(nerf_params, pose_w2c [3,4], K [3,3], occ=None) ->
      (rgb [H,W,3], depth [H,W], opacity [H,W])``

    ``occ`` is an optional replicated binary occupancy map — eval then
    draws its coarse samples from the occupancy PMF (importance mode only),
    cutting the density-only coarse pass roughly in half.
    """
    chunk = rays_per_chunk or cfg.eval.rays_per_chunk
    if mesh is not None and chunk % mesh.size != 0:
        chunk = -(-chunk // mesh.size) * mesh.size
    hw = img_h * img_w
    n_chunks = -(-hw // chunk)
    padded = n_chunks * chunk
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    use_pallas = cfg.eval.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and cfg.nerf.sh_deg <= 2

    def render_chunk(nerf_params, packed, occ, rd, ro):
        return render_rays_eval(
            nerf_params, rd, ro, cfg.nerf, compute_dtype,
            fine_mode=cfg.eval.fine_mode,
            importance_samples=cfg.eval.importance_samples,
            packed=packed,
            occ=occ,
            coarse_free=cfg.eval_coarse_free,
        )

    if mesh is not None:
        from mc_nerf_tpu.parallel.mesh import DATA_AXIS

        render_chunk = jax.shard_map(
            render_chunk,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )

    def render(nerf_params, pose_w2c, K, occ=None):
        pix = pixel_grid(img_h, img_w)
        pix = jnp.pad(pix, ((0, padded - hw), (0, 0)))
        rays_d, rays_o = rays_for_pixels(pix, pose_w2c, K)
        rays_d = rays_d.reshape(n_chunks, chunk, 3)
        rays_o = rays_o.reshape(n_chunks, chunk, 3)
        packed = pack_eval_params(nerf_params, cfg.nerf) if use_pallas else None

        rgb, depth, opacity = jax.lax.map(
            lambda args: render_chunk(nerf_params, packed, occ, *args),
            (rays_d, rays_o),
        )
        rgb = rgb.reshape(-1, 3)[:hw].reshape(img_h, img_w, 3)
        depth = depth.reshape(-1)[:hw].reshape(img_h, img_w)
        opacity = opacity.reshape(-1)[:hw].reshape(img_h, img_w)
        return rgb, depth, opacity

    return jax.jit(render)
