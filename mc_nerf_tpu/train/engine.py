"""The training/eval engine — host-level orchestration.

Functional twin of the reference's ``Model_Engine`` (``main.py:27-241``):
3-stage epoch schedule, per-epoch checkpointing, camera-error reporting,
pose plots, validation renders, and the demo (test) mode.  The hot path is
entirely on device (``make_stage_epoch``: one compiled scan per epoch); the
host only sequences epochs and handles IO.

Differences from the reference (deliberate, documented):
  * per-image metric scoring in demo mode — the reference scores every
    prediction against the *last* loader batch's GT (``main.py:144``, bug);
  * metric averages divide by the actual view count, not a hardcoded 200
    (``main.py:169-171``, bug);
  * training is resumable from any checkpoint (SURVEY.md §5);
  * TensorBoard scalars are actually written.
"""

from __future__ import annotations

import logging
import os
import re
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mc_nerf_tpu.config import Config
from mc_nerf_tpu.cameras.convention import w2c_to_blender_pose
from mc_nerf_tpu.data.blender import Scene, load_scene, load_split
from mc_nerf_tpu.data.calibration import load_calibration
from mc_nerf_tpu.eval.metrics import lpips, psnr, ssim
from mc_nerf_tpu.models.camera_params import (
    camera_poses,
    init_camera_params,
    intrinsics,
)
from mc_nerf_tpu.models.encoding import sincos_encode
from mc_nerf_tpu.models.mlp import apply_nerf_mlp
from mc_nerf_tpu.models.nerf import init_nerf_params
from mc_nerf_tpu.ops.occupancy import (
    OccupancyGrid,
    sampler_map,
    uniform_prior_map,
    update_grid,
)
from mc_nerf_tpu.parallel.mesh import make_mesh
from mc_nerf_tpu.train import checkpoint as ckpt_lib
from mc_nerf_tpu.train.optim import Params, build_optimizers
from mc_nerf_tpu.train.steps import (
    TrainData,
    TrainState,
    make_render_fn,
    make_stage_epoch,
)
from mc_nerf_tpu.utils.logging import is_main_process, setup_logging
from mc_nerf_tpu.utils.tensorboard import ScalarWriter
from mc_nerf_tpu.utils.visualization import (
    CAMERA_TABLE_HEADERS,
    apply_depth_colormap,
    camera_error_row,
    camera_error_table,
    save_pose_plot,
)


def _parse_demo_ckpt(name: str) -> Optional[int]:
    """Epoch selector from the yaml ``nerf_model_name`` key.

    The reference loads a *named* checkpoint for demo
    (``config/config.yaml:33``: e.g. ``Ball_Computer-EPOCH-51-<ts>.ckpt``,
    consumed at ``model/mc_nerf.py:577-584``).  Our checkpoints are keyed by
    epoch, so accept either a bare epoch number or a reference-style name
    with an ``EPOCH-<n>`` segment; empty/unparseable means "latest".
    """
    name = (name or "").strip()
    if not name:
        return None
    if name.isdigit():
        return int(name)
    m = re.search(r"EPOCH-(\d+)", name)
    if m:
        return int(m.group(1))
    logging.warning("demo_ckpt %r has no epoch; using the latest checkpoint", name)
    return None


class Engine:
    def __init__(self, cfg: Config, scene: Optional[Scene] = None):
        self.cfg = cfg
        if cfg.nerf.coarse_free and (
            cfg.nerf.occ_grid_size <= 0
            or cfg.train.fine_mode != "importance"
            or cfg.eval.fine_mode != "importance"
        ):
            raise ValueError(
                "nerf.coarse_free requires occ_grid_size > 0 and "
                "fine_mode='importance' for both train and eval — the "
                "occupancy grid is the sole sampling proposal in this mode"
            )
        if cfg.nerf.occ_pmf not in ("binary", "density"):
            raise ValueError(f"unknown nerf.occ_pmf: {cfg.nerf.occ_pmf!r}")
        if cfg.nerf.coarse_free_from_stage not in (1, 2):
            raise ValueError(
                "nerf.coarse_free_from_stage must be 1 (GLOBAL_OPTIM, all "
                "NeRF training) or 2 (FINE_TUNE only — the hybrid schedule)"
            )
        if cfg.nerf.occ_pmf == "density" and cfg.nerf.occ_map_dtype != "bfloat16":
            raise ValueError(
                "nerf.occ_pmf='density' requires occ_map_dtype='bfloat16' — "
                "the sampler map carries density magnitudes, not {0,1}"
            )
        if cfg.nerf.occ_refresh_source not in ("auto", "coarse", "fine"):
            raise ValueError(
                f"unknown nerf.occ_refresh_source: "
                f"{cfg.nerf.occ_refresh_source!r} (auto | coarse | fine)"
            )
        if (
            cfg.nerf.occ_refresh_source == "coarse"
            and cfg.nerf.coarse_free
            and cfg.nerf.coarse_free_from_stage == 1
        ):
            raise ValueError(
                "occ_refresh_source='coarse' needs a trained coarse MLP, but "
                "coarse_free_from_stage=1 never trains one — use the hybrid "
                "schedule (coarse_free_from_stage=2) or source 'fine'"
            )
        if cfg.eval.coarse_free and (
            cfg.nerf.occ_grid_size <= 0 or cfg.eval.fine_mode != "importance"
        ):
            raise ValueError(
                "eval.coarse_free=True requires occ_grid_size > 0 and "
                "eval.fine_mode='importance' — the occupancy grid is the "
                "sampling proposal"
            )
        # measured-harmful TRAINING guard-rails (VERDICT r4 ask #5): these
        # combinations collapsed in EVERY take of the round-4 attribution
        # matrix (BASELINE.md round 4) — a config system that types-checks
        # a documented 6-PSNR footgun is half a config system.  Demo mode
        # (cfg.mode == 1) renders existing checkpoints and is unaffected.
        if cfg.mode == 0 and not cfg.nerf.allow_measured_harmful:
            if cfg.nerf.coarse_free and cfg.nerf.coarse_free_from_stage == 1:
                raise ValueError(
                    "nerf.coarse_free with coarse_free_from_stage=1 trains "
                    "the field from scratch on the grid PMF alone and "
                    "collapsed to ~6 PSNR in all five measured takes "
                    "(BASELINE.md round 4).  Use the hybrid schedule "
                    "(coarse_free_from_stage=2), or set "
                    "nerf.allow_measured_harmful=True to re-run the "
                    "experiment anyway"
                )
            if cfg.nerf.occ_pmf == "density":
                raise ValueError(
                    "nerf.occ_pmf='density' is measured HARMFUL for "
                    "training in every schedule — concentrated-PMF sampling "
                    "starves the field of spread empty-space supervision "
                    "(FINE_TUNE collapses 12.0 -> 8.1 PSNR, BASELINE.md "
                    "round 4).  Keep 'binary' for training, or set "
                    "nerf.allow_measured_harmful=True to re-run the "
                    "experiment anyway"
                )
        if (
            cfg.nerf.coarse_free
            and cfg.nerf.coarse_free_from_stage == 1
            and cfg.eval.coarse_free is False
            and not cfg.nerf.allow_measured_harmful
        ):
            raise ValueError(
                "eval.coarse_free=False forces two-pass eval, but "
                "coarse_free_from_stage=1 never trains a coarse MLP to "
                "propose from — that override silently renders garbage "
                "(advisor r4).  Drop the override or use the hybrid "
                "schedule (coarse_free_from_stage=2)"
            )
        setup_logging(cfg.paths.log_path, cfg.log_to_file)
        logging.info("Loading scene: %s", cfg.scene_dir)
        self.scene = scene or load_scene(cfg.scene_dir, load_test_images=(cfg.mode == 1))
        self.img_h = self.scene.img_h
        self.img_w = self.scene.img_w
        self.n_train = self.scene.train.count

        n_dev = cfg.parallel.data_parallel or len(jax.devices())
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        self.n_devices = n_dev if self.mesh is not None else 1
        # rendering (validation/demo) is an IO/observability path entered
        # only by rank 0 — under multi-process it must NOT be a program over
        # the global mesh (a collective program entered by one process
        # deadlocks); render over this process's local devices instead
        if jax.process_count() > 1:
            local = jax.local_devices()
            self.render_mesh = (
                make_mesh(len(local), devices=local) if len(local) > 1 else None
            )
        else:
            self.render_mesh = self.mesh

        # steps per epoch: ref expands the dataset 50x and walks it once per
        # epoch per rank (data_read.py:286-297); with B images/step globally
        # that is N*50/B steps.
        b_global = cfg.train.images_per_batch * self.n_devices
        self.images_per_batch = b_global
        self.steps_per_epoch = max(
            1, (self.n_train * cfg.train.steps_per_image_epoch) // b_global
        )
        self.total_steps = self.steps_per_epoch * cfg.stages.total_epochs

        from mc_nerf_tpu.utils.prng import configure_fast_prng

        configure_fast_prng(cfg.train.prng_impl)
        key = jax.random.PRNGKey(cfg.train.seed)
        self.init_key, self.train_key = jax.random.split(key)
        params = Params(
            cam=init_camera_params(self.n_train),
            nerf=init_nerf_params(self.init_key, cfg.nerf),
        )
        self.txs, opt_states = build_optimizers(cfg, params, self.steps_per_epoch)
        self.state = TrainState(params, opt_states, jnp.zeros((), jnp.int32))

        self.ckpt_dir = os.path.join(
            cfg.paths.root_weights, "train", f"{cfg.data_name}"
        )
        # one manager for the Engine's lifetime; per-epoch saves are async
        # (the manager is created lazily on first use inside Checkpointer).
        # Retention: newest train.ckpt_max_keep epochs + the stage-boundary
        # epochs (demo-by-epoch / A/B seeds); 0 keeps everything.
        st = cfg.stages
        self.ckpt = ckpt_lib.Checkpointer(
            self.ckpt_dir,
            max_keep=cfg.train.ckpt_max_keep,
            keep_epochs=(
                st.cam_param_epochs - 1,
                st.cam_param_epochs + st.global_opt_epochs - 1,
                st.total_epochs - 1,
            ),
        )
        self.writer = ScalarWriter(
            os.path.join(cfg.paths.tb_path, cfg.data_name),
            delete_old=cfg.paths.tb_delete_old,
            enabled=cfg.tensorboard and is_main_process(),
        )
        self._epoch_fns = {}
        self._render_fns = {}
        self._table_rows = []

        # occupancy-grid culling state (ops/occupancy.py): the EMA density
        # grid is derived from the coarse MLP, never checkpointed — resume
        # and demo rebuild it in one lattice evaluation.
        self.occ_grid: Optional[OccupancyGrid] = None
        self._occ2d = None          # current binary map fed to train/eval
        self._grid_refresh = {}     # cached jitted refresh fns per source

    # ------------------------------------------------------------ multi-process

    def _to_global(self, tree):
        """Replicate a pytree onto the GLOBAL device mesh (multi-process).

        Without this, a multi-process launch silently degrades: each
        process's host-local arrays commit the epoch program to its own
        single device, the mesh sharding constraints are unsatisfiable, and
        every process redundantly computes the full batch alone (found by
        ``tests/test_multiprocess_train.py``).  Global replicated inputs
        make the epoch one SPMD program over all processes' devices — and
        are also what orbax requires to serialize under multihost.

        No-op single-process (committed single-device arrays are already
        correct there).
        """
        if self.mesh is None or jax.process_count() == 1:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            tree,
        )

    def _to_local(self, tree):
        """Host-local copy of a (fully replicated) pytree — for the
        rank-0-only local-mesh render paths under multi-process."""
        if jax.process_count() == 1:
            return tree
        return jax.tree.map(lambda x: np.asarray(x), tree)

    # -------------------------------------------------------------- occupancy

    @property
    def _occ_train(self) -> bool:
        return (
            self.cfg.nerf.occ_grid_size > 0
            and self.cfg.train.fine_mode == "importance"
        )

    @property
    def _occ_eval(self) -> bool:
        return (
            self.cfg.nerf.occ_grid_size > 0
            and self.cfg.eval.fine_mode == "importance"
        )

    def _grid_refresh_fns(self, source: str):
        """(ema_refresh, fresh_refresh) jitted closures over the config,
        per density ``source`` ("coarse" / "fine").

        Two-pass epochs always refresh from the coarse MLP (the proposal
        network); coarse-free epochs follow ``nerf.occ_refresh_source``
        (see NerfConfig — refreshing from the training fine field closes
        a measured feedback loop under the hybrid schedule)."""
        if source not in self._grid_refresh:
            nc = self.cfg.nerf
            cd = jnp.dtype(self.cfg.compute_dtype)
            skips = nc.fine_skips if source == "fine" else nc.coarse_skips

            def refresh(mlp_params, prev_density, key):
                def act(pts):
                    enc = sincos_encode(pts, nc.emb_freqs_xyz, None)
                    sigma, _ = apply_nerf_mlp(
                        mlp_params, enc, skips, cd, sigma_only=True
                    )
                    return jax.nn.softplus(sigma.reshape(-1))

                prev = None if prev_density is None else OccupancyGrid(prev_density)
                g = update_grid(
                    prev, act, nc.occ_grid_size, nc.bound_min, nc.bound_max,
                    key=key, decay=nc.occ_decay,
                )
                return g.density, sampler_map(g, nc)

            self._grid_refresh[source] = (
                jax.jit(refresh),
                jax.jit(lambda cp, k: refresh(cp, None, k)),
            )
        return self._grid_refresh[source]

    def _refresh_occupancy(self, epoch: int) -> None:
        """Refresh the EMA grid + sampler map from the density MLP (coarse,
        or per ``occ_refresh_source`` in coarse-free epochs)."""
        stage = self.cfg.stages.stage_of_epoch(epoch)
        source = self.cfg.nerf.refresh_source(stage)
        ema, fresh = self._grid_refresh_fns(source)
        key = jax.random.fold_in(jax.random.PRNGKey(self.cfg.train.seed ^ 0x0CC), epoch)
        nerf = self.state.params.nerf
        mlp = nerf.fine if source == "fine" else nerf.coarse
        if self.occ_grid is None:
            density, occ2d = fresh(mlp, key)
        else:
            density, occ2d = ema(mlp, self.occ_grid.density, key)
        self.occ_grid = OccupancyGrid(density)
        self._occ2d = occ2d

    # ------------------------------------------------------------------ train

    def _train_data(self) -> TrainData:
        imgs = self.scene.train.images_u8.reshape(self.n_train, -1, 3)
        # real-data path: a reference Blender-format scene has no detection
        # cache; run the C++ tag36h11 detector over the calib/coord images
        # (the reference runs libapriltag at startup, data_read.py:171-214).
        # No-op when the cache already exists (synthetic scenes ship one).
        from mc_nerf_tpu.data.calibration import build_calibration_cache

        if jax.process_count() > 1:
            # one writer, everyone waits: concurrent detector runs would
            # race on the cache file across processes sharing a filesystem
            if is_main_process():
                build_calibration_cache(self.cfg.scene_dir)
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("mcn_calib_cache")
        else:
            build_calibration_cache(self.cfg.scene_dir)
        calib = load_calibration(self.cfg.scene_dir, self.cfg.apriltag_size)
        return TrainData(images_u8=jnp.asarray(imgs), calib=calib)

    def _epoch_chunks(self) -> list:
        """Split ``steps_per_epoch`` into scan-call sizes, each at most
        ``train.max_steps_per_program`` (see the config comment: one epoch
        must not be one unbounded device-side program).  Prefers a single
        repeated size (one compile); falls back to two sizes when the epoch
        length has no usable divisor."""
        s = self.steps_per_epoch
        cap = self.cfg.train.max_steps_per_program
        if cap <= 0 or s <= cap:
            return [s]
        best = max((d for d in range(1, cap + 1) if s % d == 0))
        if best >= cap // 4:
            return [best] * (s // best)
        n = -(-s // cap)
        base, rem = divmod(s, n)
        return [base + 1] * rem + [base] * (n - rem)

    def _epoch_fn(self, stage: int, n_steps: int):
        key = (stage, n_steps)
        if key not in self._epoch_fns:
            self._epoch_fns[key] = make_stage_epoch(
                self.cfg, stage, self.txs[stage], self.img_h, self.img_w,
                total_steps=self.total_steps,
                steps_per_epoch=n_steps,
                images_per_batch=self.images_per_batch,
                mesh=self.mesh,
            )
        return self._epoch_fns[key]

    def _run_epoch(self, stage: int, data: TrainData, epoch_key: jax.Array):
        """One training epoch as a sequence of bounded scan executions."""
        chunks = self._epoch_chunks()
        sums = None
        for i, n_steps in enumerate(chunks):
            chunk_key = jax.random.fold_in(epoch_key, i)
            self.state, metrics = self._epoch_fn(stage, n_steps)(
                self.state, data, chunk_key
            )
            if len(chunks) > 1:
                # block per chunk: keeps each device program's wall time at
                # the chunk grain and surfaces faults at the right chunk
                metrics = {k: float(v) * n_steps for k, v in metrics.items()}
                sums = metrics if sums is None else {
                    k: sums[k] + v for k, v in metrics.items()
                }
        if sums is not None:
            return {k: v / self.steps_per_epoch for k, v in sums.items()}
        return {k: float(v) for k, v in metrics.items()}

    def _render_fn(self, img_h: int, img_w: int):
        key = (img_h, img_w)
        if key not in self._render_fns:
            self._render_fns[key] = make_render_fn(
                self.cfg, img_h, img_w, mesh=self.render_mesh
            )
        return self._render_fns[key]

    def train(self, resume: bool = False) -> TrainState:
        cfg = self.cfg
        data = self._train_data()
        # multi-process: state + scene tensors become global replicated
        # arrays over the full mesh (one SPMD program, orbax-serializable);
        # doing it before any restore makes the restore template global too
        self.state = self._to_global(self.state)
        data = self._to_global(data)
        start_epoch = 0
        if resume:
            last = self.ckpt.latest_epoch()
            if last is not None:
                self.state, start_epoch = self.ckpt.restore(self.state, last)
                start_epoch += 1
                logging.info("Resumed from epoch %d", start_epoch - 1)

        if self._occ_train:
            resumed_nerf_steps = (
                start_epoch - cfg.stages.cam_param_epochs
            ) * self.steps_per_epoch
            if resumed_nerf_steps >= cfg.nerf.occ_warmup_steps:
                # resume mid/post NeRF training: the grid is derived state —
                # rebuild it from the restored coarse MLP in one call
                self._refresh_occupancy(start_epoch - 1)
            else:
                # uniform sampling until the first refresh (all-occupied
                # binary map / all-zero density map per occ_pmf)
                self._occ2d = uniform_prior_map(cfg.nerf)
            data = data._replace(occ=self._occ2d)

        # profiling hook (SURVEY §5): MC_NERF_PROFILE=<dir> traces the first
        # epoch of each stage with jax.profiler (view with tensorboard)
        profile_dir = os.environ.get("MC_NERF_PROFILE")
        profiled_stages = set()

        stage_names = ("CAM_PARAM_EPOCH", "GLOBAL_OPTIM_EPOCH", "FINE_TUNE_EPOCH")
        for epoch in range(start_epoch, cfg.stages.total_epochs):
            stage = cfg.stages.stage_of_epoch(epoch)
            t0 = time.time()
            epoch_key = jax.random.fold_in(self.train_key, epoch)
            if profile_dir and stage not in profiled_stages:
                profiled_stages.add(stage)
                with jax.profiler.trace(os.path.join(profile_dir, f"stage{stage}")):
                    metrics = self._run_epoch(stage, data, epoch_key)
            else:
                metrics = self._run_epoch(stage, data, epoch_key)
            dt = time.time() - t0
            rays = (
                self.steps_per_epoch * self.images_per_batch * cfg.train.rays_per_batch
            )
            logging.info(
                "%s %d | loss %.6f | intr %.6f | extr %.6f | rgb_c %.5f rgb_f %.5f"
                " | %.1fs (%.0f rays/s)",
                stage_names[stage], epoch, metrics["loss"], metrics["loss_intr"],
                metrics["loss_extr"], metrics["loss_rgb_c"], metrics["loss_rgb_f"],
                dt, 0 if stage == 0 else rays / dt,
            )
            for k, v in metrics.items():
                self.writer.scalar(f"train/{k}", v, epoch)

            # rescue cameras stuck in reflection minima (see train/restarts.py);
            # only while the calibration stage still has epochs left to re-converge
            if stage == 0 and epoch < cfg.stages.cam_param_epochs - 1:
                self._maybe_restart_cameras(data, epoch)

            # refresh the occupancy grid from the coarse MLP once the NeRF
            # stages are training it (first refresh replaces the all-occupied
            # prior; later ones EMA-max into it).  The first refresh is gated
            # on occ_warmup_steps of NeRF training: a grid derived from a
            # barely-trained (DC-masked) coarse field mislocalizes the
            # culling and can collapse the fine MLP to empty space it cannot
            # recover from (reproduced at 96x96 scale; see config.py).
            nerf_epochs_done = epoch + 1 - cfg.stages.cam_param_epochs
            if (
                self._occ_train
                and stage >= 1
                and nerf_epochs_done % cfg.nerf.occ_update_every == 0
                and nerf_epochs_done * self.steps_per_epoch
                >= cfg.nerf.occ_warmup_steps
            ):
                self._refresh_occupancy(epoch)
                data = data._replace(occ=self._occ2d)

            # orbax coordinates multihost writes itself — under multi-process
            # EVERY process must enter save() (rank-gating a collective
            # checkpoint write deadlocks); single-process is unaffected
            self.ckpt.save(epoch, self.state)  # async; drained at train end
            if is_main_process():
                self._report_cameras(epoch)
                if stage > 0:
                    self._validate(epoch)
        self.ckpt.wait()
        self.writer.close()
        return self.state

    def _maybe_restart_cameras(self, data: TrainData, epoch: int) -> None:
        """Monotone camera-pose improvement between stage-0 epochs
        (candidate adoption: current params vs the deterministic joint
        focal x planar-PnP sweep — see train/restarts.py)."""
        from mc_nerf_tpu.train.restarts import improve_cameras

        rk = jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.train.seed ^ 0x5EED), epoch
        )
        new_params, adopt_pose, adopt_cube = improve_cameras(
            rk, self.state.params, data.calib, self.img_h, self.img_w
        )
        ap = np.asarray(adopt_pose)
        ac = np.asarray(adopt_cube)
        n_adopt = int(ap.sum() + ac.sum())
        if n_adopt:
            logging.info(
                "adopted better camera solutions for %d twists (pose: %s, cube: %s)",
                n_adopt, np.flatnonzero(ap).tolist(), np.flatnonzero(ac).tolist(),
            )
            self.state = TrainState(
                new_params, self.state.opt_states, self.state.step
            )

    # ----------------------------------------------------------- observability

    def _report_cameras(self, epoch: int) -> None:
        """Camera-error table + pose plot (ref mc_nerf.py:388-534)."""
        cam = self.state.params.cam
        K_est = np.asarray(intrinsics(cam, self.img_h, self.img_w))
        pose_est = np.asarray(camera_poses(cam))
        K_gt = self.scene.train.K
        pose_gt = self.scene.train.poses_w2c
        self._table_rows.append(
            camera_error_row(epoch, K_gt, K_est, pose_gt, pose_est)
        )
        print(camera_error_table(self._table_rows[-12:]))
        for name, val in zip(CAMERA_TABLE_HEADERS[1:], self._table_rows[-1][1:]):
            self.writer.scalar(f"camera/{name}", val, epoch)

        plot_path = os.path.join(
            self.cfg.paths.render_dir, self.cfg.data_name, "cam_pose",
            f"epoch_{epoch}.png",
        )
        try:
            save_pose_plot(
                plot_path,
                np.asarray(w2c_to_blender_pose(jnp.asarray(pose_gt))),
                np.asarray(w2c_to_blender_pose(jnp.asarray(pose_est))),
                K_gt, K_est, self.img_w,
            )
        except Exception as e:  # plotting must never kill training
            logging.warning("pose plot failed: %s", e)

    def _validate(self, epoch: int) -> None:
        """Render one validation view with GT val camera (ref mc_nerf.py:754-813)."""
        val = self.scene.val
        idx = epoch % val.count
        render = self._render_fn(val.img_h, val.img_w)
        occ = self._occ2d if self._occ_eval else None
        # local copies under multi-process: the render program runs on this
        # process's devices only (render_mesh), so its inputs must not be
        # committed to the global mesh
        rgb, depth, _ = render(
            self._to_local(self.state.params.nerf),
            jnp.asarray(val.poses_w2c[idx]),
            jnp.asarray(val.K[idx]),
            None if occ is None else self._to_local(occ),
        )
        pred = np.asarray(rgb)
        gt = val.images_u8[idx].astype(np.float32) / 255.0
        p = float(psnr(jnp.asarray(pred), jnp.asarray(gt)))
        s = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
        lp = lpips(pred, gt)
        logging.info(
            "VALID epoch %d | PSNR %.3f | SSIM %.4f | LPIPS %s",
            epoch, p, s, f"{lp:.4f}" if lp is not None else "n/a",
        )
        self.writer.scalar("val/psnr", p, epoch)
        self.writer.scalar("val/ssim", s, epoch)
        if lp is not None:
            self.writer.scalar("val/lpips", lp, epoch)

        out_dir = os.path.join(self.cfg.paths.render_dir, self.cfg.data_name)
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray((np.clip(pred, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"epoch_{epoch}.png")
        )
        Image.fromarray((np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"epoch_{epoch}_gt.png")
        )
        d = np.asarray(depth)
        d01 = np.clip(d / (self.cfg.nerf.far + 1e-9), 0, 1)
        Image.fromarray((d01 * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"epoch_{epoch}_depth.png")
        )

    # ------------------------------------------------------------------- demo

    def demo(self, ckpt_epoch: Optional[int] = None) -> dict:
        """Render all test views with GT test cameras + per-image metrics.

        The reference's demo path (``main.py:98-173``) with its two scoring
        bugs fixed (last-GT comparison; /200 hardcode).
        """
        cfg = self.cfg
        if ckpt_epoch is None:
            ckpt_epoch = _parse_demo_ckpt(cfg.eval.demo_ckpt)
        self.state, epoch = self.ckpt.restore(self.state, ckpt_epoch)
        logging.info("Loaded checkpoint epoch %d", epoch)
        test = self.scene.test
        if test.images_u8 is None:
            # the engine was constructed in train mode (test images skipped
            # at load, engine.py:96); train-then-demo in one process is
            # legitimate API use, so load them now and cache for reuse
            test = load_split(cfg.scene_dir, "test", load_images=True)
            self.scene.test = test
        render = self._render_fn(test.img_h, test.img_w)
        occ = None
        # warmup guard (mirrors the train-side occ_warmup_steps gating at
        # engine.py::train): a grid derived from a checkpoint whose coarse
        # MLP has fewer than occ_warmup_steps of NeRF training mislocalizes
        # the culling (stage-0 ckpts have an *untrained* coarse field and
        # would render white) — render those checkpoints unculled instead.
        nerf_steps_at_ckpt = (
            epoch + 1 - cfg.stages.cam_param_epochs
        ) * self.steps_per_epoch
        if self._occ_eval and nerf_steps_at_ckpt >= cfg.nerf.occ_warmup_steps:
            # derive the occupancy map from the restored MLP — coarse, or
            # fine when the checkpoint's stage is coarse-free (the grid is
            # never checkpointed; one lattice eval rebuilds it)
            self.occ_grid = None
            self._refresh_occupancy(epoch)
            occ = self._occ2d
        elif self._occ_eval:
            logging.info(
                "demo checkpoint (epoch %d) predates occ_warmup_steps=%d "
                "(%d NeRF steps trained) — rendering without occupancy culling",
                epoch, cfg.nerf.occ_warmup_steps, max(0, nerf_steps_at_ckpt),
            )
            if cfg.eval_coarse_free:
                # coarse-free cannot render occ-less (the grid IS the
                # sampling proposal): fall back to the uniform prior
                # (= uniform sampling), the same state train-side warmup uses
                occ = uniform_prior_map(cfg.nerf)

        # Under multi-process the view loop is SHARDED over processes
        # (round-robin) and per-view scores are summed back with one
        # allgather: each output file is written exactly once, and every
        # rank returns the identical result dict.  The reference instead
        # rank-gates its whole eval (``model/mc_nerf.py:747-759``) —
        # sharding gives the same single-writer guarantee plus an N-process
        # render speedup.  The directory stamp must agree across ranks, so
        # rank 0's clock wins.
        n_proc, pidx = jax.process_count(), jax.process_index()
        if n_proc > 1:
            from jax.experimental import multihost_utils

            t0 = int(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(int(time.time()), np.int64)
                )
            )
            stamp = time.strftime("%Y-%m-%d-%H-%M-%S", time.localtime(t0))
        else:
            stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        base = os.path.join(cfg.paths.render_dir + "_" + stamp)
        dirs = {k: os.path.join(base, k) for k in ("pred", "depth", "gt")}
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)

        # per-view rows: [psnr, ssim, lpips, lpips_valid] — zeros for views
        # this rank does not own, so a cross-process sum reassembles all
        per_view = np.zeros((test.count, 4), np.float64)
        # local copies under multi-process (the render mesh is local-only)
        nerf_local = self._to_local(self.state.params.nerf)
        occ_local = None if occ is None else self._to_local(occ)
        if self.render_mesh is not None:
            # a fresh demo-mode restore leaves arrays committed to one
            # device; the render shard_map needs them replicated over the
            # (local) render mesh
            rep = jax.sharding.NamedSharding(
                self.render_mesh, jax.sharding.PartitionSpec()
            )
            nerf_local = jax.device_put(nerf_local, rep)
            if occ_local is not None:
                occ_local = jax.device_put(occ_local, rep)
        for i in range(pidx, test.count, n_proc):
            rgb, depth, opacity = render(
                nerf_local,
                jnp.asarray(test.poses_w2c[i]),
                jnp.asarray(test.K[i]),
                occ_local,
            )
            pred = np.asarray(rgb)
            gt = test.images_u8[i].astype(np.float32) / 255.0
            per_view[i, 0] = float(psnr(jnp.asarray(pred), jnp.asarray(gt)))
            per_view[i, 1] = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
            lp = lpips(pred, gt)
            if lp is not None:
                per_view[i, 2:] = (lp, 1.0)

            name = str(i).zfill(4)
            Image.fromarray((np.clip(pred, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(dirs["pred"], name + ".png")
            )
            Image.fromarray((np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(dirs["gt"], name + "gt.png")
            )
            # inverse-depth colormap (ref main.py:117-118)
            inv = 1.0 / (np.asarray(depth) / np.clip(np.asarray(opacity), 1e-10, None) + 1e-10) * 2
            dep_rgb = apply_depth_colormap(inv, cmap="inferno")
            Image.fromarray((dep_rgb * 255).astype(np.uint8)).save(
                os.path.join(dirs["depth"], name + "depth.png")
            )

        if n_proc > 1:
            per_view = np.asarray(
                multihost_utils.process_allgather(per_view)
            ).sum(axis=0)

        n_lpips = per_view[:, 3].sum()
        result = {
            "psnr": float(per_view[:, 0].mean()),
            "ssim": float(per_view[:, 1].mean()),
            "lpips": float(per_view[:, 2].sum() / n_lpips) if n_lpips else None,
            "count": test.count,
            "out_dir": base,
        }
        if is_main_process():
            print(f"Results ({cfg.data_name})")
            print(f"PSNR: {result['psnr']}")
            print(f"SSIM: {result['ssim']}")
            print(f"LPIP: {result['lpips'] if result['lpips'] is not None else 'n/a (no weights)'}")
        return result
