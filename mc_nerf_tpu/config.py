"""Typed configuration for MC-NeRF-TPU.

Replaces the reference's untyped flat ``sys_param`` dict
(``config/config_read.py:8-93`` merging ``config/config.yaml`` with argparse
flags in ``main.py:245-268``) with frozen dataclasses.  Every YAML key and CLI
flag of the reference is represented; the YAML schema accepted by
:func:`load_yaml` is the reference's own schema so existing config files work
unmodified.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class StageConfig:
    """Three-stage training sequence (ref ``config/config.yaml:13-19``)."""

    cam_param_epochs: int = 20      # stage 1: camera parameter initialization
    global_opt_epochs: int = 16     # stage 2: joint camera + NeRF optimization
    fine_tune_epochs: int = 16      # stage 3: NeRF fine-tune, poses frozen

    @property
    def total_epochs(self) -> int:
        return self.cam_param_epochs + self.global_opt_epochs + self.fine_tune_epochs

    @property
    def boundaries(self) -> Tuple[int, int, int]:
        """Cumulative epoch boundaries of the three stages."""
        s1 = self.cam_param_epochs
        s2 = s1 + self.global_opt_epochs
        return (s1, s2, s2 + self.fine_tune_epochs)

    def stage_of_epoch(self, epoch: int) -> int:
        """0-based stage index for a 0-based epoch (ref ``main.py:210-217``)."""
        b1, b2, b3 = self.boundaries
        if epoch < b1:
            return 0
        if epoch < b2:
            return 1
        if epoch < b3:
            return 2
        raise ValueError(f"epoch {epoch} beyond training schedule ({b3} epochs)")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyper-parameters (ref ``config/config.yaml:20-30``)."""

    stage1_lr: float = 0.1
    stage2_lr: float = 5e-4
    stage3_lr: float = 2.5e-4
    # stage-1 LR decays exponentially to this floor over the stage
    # (ref ``main.py:188-189``: gamma = (0.005/lr1)**(1/steps)).
    stage1_lr_floor: float = 0.005
    weight_decay: float = 4e-4
    # global gradient-norm clip in every stage (extension — the reference
    # never clips): the perspective divide (stage CAM_PARAM) and the
    # self-normalized intr term (the NeRF stages) can both spike gradients
    # by orders of magnitude in single steps.  0 disables (reference
    # behavior); at norm 10 the clip rarely binds on healthy runs.
    grad_clip: float = 10.0
    # checkpoint retention (extension — the reference keeps every epoch,
    # model/mc_nerf.py:738-752, which fills /tmp-backed disks at 52 epochs
    # x full train state): keep the newest N checkpoints, PLUS every stage
    # boundary (the seeds demo-by-epoch and mid-protocol A/Bs restore
    # from).  0 = keep everything (reference parity).
    ckpt_max_keep: int = 5
    warmup_epoch: int = 100          # carried from the reference yaml (unused there too)
    rays_per_batch: int = 7000       # rays sampled per image per step (ref yaml `batch`)
    images_per_batch: int = 1        # images per step *per device* (ref: 1 via BatchSampler)
    steps_per_image_epoch: int = 50  # ref expands the dataset 50x (data_read.py:286-297)
    # Upper bound on steps per compiled epoch-scan *execution*.  Long epochs
    # run as several back-to-back scan calls (host syncs between them cost
    # ~40 ms each on the tunneled platform — negligible at this grain).
    # The bound is a hard requirement, not a preference: the tunneled TPU
    # worker enforces a ~60 s per-execution watchdog (measured: a plain XLA
    # fori_loop of matmuls is killed at 60.0 s — "TPU worker process crashed
    # or restarted"), so a full-scale 5500-step epoch as ONE program
    # (~165 s) dies every time.  500 steps ~ 15 s at measured throughput.
    max_steps_per_program: int = 500
    seed: int = 42
    # "importance" (default): stratified inverse-CDF fine sampling.  At
    # reference scale it scores within ~1 dB of the reference-faithful
    # threshold/top-k "grid" scheme at ~1/8 of the sample budget and ~1/5
    # of the wall-clock (BASELINE.md scale A/B — an earlier small-scale
    # "+3.6 dB" reading did NOT hold at scale).  "grid" remains the
    # reference-faithful max-quality path.
    fine_mode: str = "importance"
    # 32 fine samples/ray: the occ48/imp32 pair won the round-3 multi-rig
    # A/B on every rig geometry at protocol-like schedules — Ball 52-epoch
    # protocol 27.01 vs 26.45 PSNR, Array 19.22 vs 18.08, Room 31.40 vs
    # 29.41, HalfBall 27.72 vs 26.30
    # (vs occ32/imp16; scripts/dev_rig_ab.py, BASELINE.md) — so the
    # default is the quality-sound pair.  occ32/imp16 remains the fast
    # setting (1.7x rays/s at a 0.5-2 dB cost depending on rig); the
    # occ24/imp12 budget collapsed on the Array rig (15.4 PSNR) and was
    # rejected.
    importance_samples: int = 32     # fine samples/ray for fine_mode="importance"
    # rematerialize the encode->MLP->shade passes in the backward instead
    # of saving their activations (jax.checkpoint): trades ~1 extra forward
    # of FLOPs for the per-layer activation HBM round trips that floor the
    # bandwidth-bound train step (BASELINE.md round-3 profile).  Off until
    # the on-chip A/B (scripts/dev_train_bench.py *+remat variants) wins.
    remat_shade: bool = False
    # fused fwd+bwd MLP kernel for training; None resolves in
    # train/steps.py:make_loss_fn to the measured train-time winner —
    # currently False (XLA; the fused kernels reached parity, not victory,
    # on the glue-bound train step — BASELINE.md).  Eval resolves its own
    # flag in train/steps.py:make_render_fn (kernels win there).
    use_pallas: Optional[bool] = None
    # PRNG implementation: None = keep the process default (threefry).
    # Explicit "rbg"/"unsafe_rbg" switches to XLA's native bit generator —
    # measured a wash on v5e (BASELINE.md), kept as an experiment knob.
    # See utils/prng.py.
    prng_impl: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class BarfConfig:
    """BARF coarse-to-fine frequency schedule (ref ``config/config.yaml:56-61``).

    ``start``/``end`` parameterize the *within-stage-2* ramp; the global
    progress window is derived as in ref ``data/data_read.py:338-351``.
    """

    mask: bool = False   # yaml default; stage 2 force-enables the mask regardless
    start: float = 0.0
    end: float = 1.0

    def global_window(self, stages: StageConfig) -> Tuple[float, float]:
        """Map (start, end) into global training-progress coordinates.

        Mirrors ref ``data/data_read.py:338-351``: the ramp begins where
        stage 2 begins and spans ``end`` of stage 2's extent.
        """
        total = float(stages.total_epochs)
        g_start = stages.cam_param_epochs / total + self.start
        g_end_raw = (stages.cam_param_epochs + stages.global_opt_epochs) / total
        g_end = g_start + (g_end_raw - g_start) * self.end
        return g_start, g_end


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    """NeRF model/rendering parameters (ref ``config/config.yaml:62-82``)."""

    near: float = 1.0
    far: float = 8.0
    samples_coarse: int = 128
    sample_scale: int = 5            # fine grid = samples_coarse * sample_scale
    sigma_default: float = -20.0     # raw sigma assigned to unselected fine samples
    weight_thresh: float = 1e-3      # coarse-weight threshold for fine selection
    bound_min: float = -3.5
    bound_max: float = 3.5
    white_back: bool = True
    emb_freqs_xyz: int = 10
    coarse_depth: int = 4
    coarse_width: int = 128
    coarse_skips: Tuple[int, ...] = (2,)
    fine_depth: int = 8
    fine_width: int = 256
    fine_skips: Tuple[int, ...] = (4,)
    sh_deg: int = 2
    # Per-ray fine-sample budget. The reference caps total fine samples at
    # rays*128 (mc_nerf.py:630-632), i.e. an *average* of 128/ray; we use a
    # static per-ray budget of `fine_bins_topk` coarse bins * sample_scale.
    fine_bins_topk: int = 26
    # dormant voxel-cache keys kept for config parity (ref dead code
    # mc_nerf.py:859-867): accepted, never used.
    grid_nerf: int = 384
    sigma_init: float = 30.0

    # --- occupancy-grid sample culling (ops/occupancy.py) — the working
    # realization of the reference's dead voxel-cache idea.  Active when
    # grid size > 0 and fine_mode == "importance" (the grid fine mode stays
    # reference-faithful and uncullled).  An all-occupied grid reproduces
    # stratified-uniform sampling exactly, so warmup needs no second path.
    occ_grid_size: int = 64          # lattice resolution G (0 disables culling)
    occ_thresh: float = 0.01         # occupied iff softplus(sigma)*coarse_step > this
    occ_decay: float = 0.95          # EMA-max decay per refresh
    occ_update_every: int = 1        # epochs between grid refreshes (stages 2-3)
    # NeRF-stage steps before the FIRST grid refresh; until then the
    # all-occupied prior (= uniform sampling) is used.  Deriving the grid
    # from a coarse MLP that has only trained a few hundred DC-masked (BARF)
    # steps mislocalizes the culling and can collapse the fine MLP to empty
    # space it can never recover from (softplus gradient vanishes) —
    # reproduced at 96x96/12-cam scale, where one epoch is only 600 steps;
    # at the reference 800x800 scale one epoch is 5500 steps, so the default
    # leaves full-scale behavior unchanged.
    occ_warmup_steps: int = 3000
    occ_floor: float = 0.01          # exploration floor in the sampling PMF
    occ_probes: int = 64             # per-ray occupancy probes across [near, far]
    # 48 culling-guided coarse samples/ray: the occ48/imp32 default pair —
    # see TrainConfig.importance_samples for the multi-rig quality evidence
    occ_coarse_samples: int = 48     # coarse samples/ray under culling
    occ_dilate: bool = True          # 3^3 max-pool safety margin
    # coarse-free rendering (extension; NGP-era sampling): with a mature
    # occupancy grid the 4x128 coarse MLP is a proposal distribution the
    # grid already provides — draw the fine samples directly from the
    # occupancy PMF and skip the coarse pass entirely (train AND eval).
    # The grid then refreshes per ``occ_refresh_source``; the coarse MLP
    # stops training and the rgb_c loss term is dropped.  Requires
    # occ_grid_size > 0 and fine_mode="importance".  Quality/throughput
    # evidence: BASELINE.md round-4 coarse-free A/B.
    coarse_free: bool = False
    # first NeRF training stage that runs coarse-free (1 = GLOBAL_OPTIM,
    # i.e. all NeRF training; 2 = FINE_TUNE only — the HYBRID schedule).
    # Coarse-free from scratch cannot bootstrap: with only K uniform
    # samples/ray and no coarse MLP to concentrate them, the fine field
    # stays blurry and the grid derived from it never localizes (measured:
    # Array rig cf16 6.1 / cf16d 5.8 PSNR vs 18.1 two-pass, BASELINE.md
    # round 4).  The hybrid runs the two-pass pipeline while BARF ramps
    # (stage 1), then switches to the grid proposal once the field is
    # trained — the fine-tune stage steps at the coarse-free rate.
    coarse_free_from_stage: int = 1
    # storage layout of the binary map fed to the per-ray probe — its row
    # gather is the train step's largest single HBM op ([R, P, G] rows).
    # "bfloat16" / "int8": one cell per lane (2 / 1 B); "bitpack": 32 z
    # cells per uint32 lane, 16x less gather traffic than bf16.  All exact
    # (values are {0,1}); A/B'd on-chip via scripts/dev_occ_probe_bench.py
    # + dev_train_bench.py before flipping the default.
    occ_map_dtype: str = "bfloat16"
    # sampling-PMF semantics (extension; ops/occupancy.proposal_pmf):
    # "binary" — occupancy {0,1} + floor (piecewise-uniform over occupied
    # cells); "density" — compositing weights T*alpha built from the probed
    # EMA density itself (a grid-based coarse pass at zero MLP cost), so
    # samples concentrate at surfaces.  WARNING: density mode is measured
    # HARMFUL for TRAINING — inverse-CDF concentration starves the field
    # of spread empty-space supervision (two-pass FINE_TUNE under it
    # collapses 12.0 -> 8.1 PSNR where binary holds; a density-GLOBAL seed
    # cannot be lifted even by binary fine-tuning — BASELINE.md round-4
    # controls).  Keep "binary" for training; density remains available
    # for eval-side sampling experiments.  Requires
    # occ_map_dtype="bfloat16" (the map carries magnitudes).
    occ_pmf: str = "binary"
    # which MLP's density the grid refresh probes during COARSE-FREE stages
    # (extension; two-pass stages always refresh from the coarse MLP):
    # "fine" — follow the training field (the fine MLP is the only one
    # training there); "coarse" — FREEZE the proposal at the coarse MLP's
    # last trained state (hybrid schedule only: requires a trained coarse,
    # i.e. coarse_free_from_stage=2).  "fine" closes a feedback loop —
    # the fine MLP is supervised only ON the PMF support, drifts freely off
    # it, and the grid EMA then absorbs that drift into the next epoch's
    # proposal (measured: Array hyb32_16 fell 12.5 -> 9.8 val PSNR over 4
    # coarse-free epochs, BASELINE.md round 4).  "auto" = the measured
    # winner per schedule (currently: "coarse" when a trained coarse
    # exists, "fine" otherwise).
    occ_refresh_source: str = "auto"
    # coarse-free TRAIN-side mixture proposal (extension): replace this
    # many of the K fine samples with STRATIFIED-UNIFORM samples over
    # [near, far] (constant per-step budget; the rest draw from the grid
    # PMF as usual).  Pure-PMF coarse-free training supervises the fine
    # field only ON the PMF support — off it the density drifts freely,
    # and the field itself degrades (measured: Array hybrid ev2p 7.86 vs
    # 18.08 PSNR even under two-pass eval, BASELINE.md round 4).  The
    # uniform fraction composites through empty space every step, pinning
    # it down exactly the way the two-pass coarse pass does.  Eval keeps
    # the pure PMF (exploration is a training need).  0 disables.
    cf_uniform_samples: int = 0
    # Escape hatch for the TRAINING guard-rails (Engine.__init__): configs
    # the attribution matrix measured as always-collapsing — coarse-free
    # training from stage 1 (~6 PSNR, five takes) and occ_pmf="density"
    # training (12.0 -> 8.1 PSNR) — are refused unless this is set.  For
    # measurement harnesses re-running those experiments, never production.
    allow_measured_harmful: bool = False

    @property
    def samples_fine_grid(self) -> int:
        return self.samples_coarse * self.sample_scale

    def coarse_free_at(self, stage: int) -> bool:
        """Is the renderer coarse-free at this engine stage (0 = CAM_PARAM,
        1 = GLOBAL_OPTIM, 2 = FINE_TUNE)?  Eval always uses the terminal
        mode (``coarse_free`` itself)."""
        return self.coarse_free and stage >= self.coarse_free_from_stage

    def refresh_source(self, stage: int) -> str:
        """Which MLP ("coarse"/"fine") the occupancy-grid refresh probes at
        this engine stage.  Two-pass stages always probe the coarse MLP (it
        is the proposal network there); coarse-free stages follow
        ``occ_refresh_source``."""
        if not self.coarse_free_at(stage):
            return "coarse"
        if self.occ_refresh_source != "auto":
            return self.occ_refresh_source
        # auto: freeze at the trained coarse when one exists (hybrid);
        # pure coarse-free never trains the coarse MLP, so only the fine
        # field can drive the grid there
        return "fine" if self.coarse_free_from_stage == 1 else "coarse"

    @property
    def samples_fine(self) -> int:
        """Static number of fine samples evaluated per ray."""
        return self.fine_bins_topk * self.sample_scale

    @property
    def sh_dim(self) -> int:
        return 3 * (self.sh_deg + 1) ** 2

    @property
    def embed_dim(self) -> int:
        return 3 * (2 * self.emb_freqs_xyz + 1)


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Demo/eval parameters (ref ``config/config.yaml:31-36``)."""

    res_h: int = 800
    res_w: int = 800
    demo_ckpt: str = ""
    rays_per_chunk: int = 16384      # rays per jitted render chunk
    fine_mode: str = "importance"    # "importance" (TPU-fast) | "grid" (ref-faithful)
    # eval fine samples: match the train-time sample density — measured
    # best on full-protocol checkpoints (28.01 PSNR @ 32 vs 27.94 @ 64 on
    # an imp32-trained model, scripts/dev_eval_ab.py)
    importance_samples: int = 32     # fine samples/ray for fine_mode="importance"
    use_pallas: Optional[bool] = None  # fused MLP kernel; None = auto (TPU only)
    # eval-side coarse-free override (extension): None follows
    # nerf.coarse_free; False renders a coarse-free-TRAINED model through
    # the classic two-pass pipeline (the coarse MLP from the hybrid
    # schedule's GLOBAL_OPTIM stage proposes, the fine MLP shades) — a
    # deployment choice, and the diagnostic that separates "field
    # degraded" from "grid-PMF eval too sparse"; True forces grid-PMF
    # eval of a two-pass-trained model (requires occ culling).
    coarse_free: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class PathsConfig:
    """Output directory layout (ref ``config/config.yaml:37-49``)."""

    root_weights: str = "./weights"
    root_out: str = "./results"
    render_subdir: str = "./img_rendered"
    log_path: str = "./log"
    tb_path: str = "./tensorboard"
    tb_delete_old: bool = False

    @property
    def render_dir(self) -> str:
        return os.path.join(self.root_out, self.render_subdir)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh configuration (replaces torch DDP, ref utils/distributed_init.py)."""

    # number of devices for the data axis; 0 = use all local devices
    data_parallel: int = 0
    mesh_axis: str = "data"


@dataclasses.dataclass(frozen=True)
class Config:
    # CLI-level settings (ref ``main.py:245-268``)
    data_root: str = "./data/dataset_Ball"
    data_name: str = "Ball_Computer"
    mode: int = 0                    # 0 = train, 1 = demo (ref config_read.py:78-81)
    log_to_file: bool = False
    tensorboard: bool = False
    start_device: int = 0            # kept for CLI parity; meaningless on TPU
    apriltag_size: float = 1.0

    stages: StageConfig = dataclasses.field(default_factory=StageConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    barf: BarfConfig = dataclasses.field(default_factory=BarfConfig)
    nerf: NerfConfig = dataclasses.field(default_factory=NerfConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    paths: PathsConfig = dataclasses.field(default_factory=PathsConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    # numeric policy: params fp32; activations in compute_dtype on the hot path
    compute_dtype: str = "bfloat16"

    @property
    def scene_dir(self) -> str:
        """<data_root>/<data_name>, the directory holding transforms_*.json."""
        return os.path.join(self.data_root, self.data_name)

    @property
    def eval_coarse_free(self) -> bool:
        """Effective coarse-free flag for eval/demo renders
        (``eval.coarse_free`` override, else the train-side mode)."""
        ecf = self.eval.coarse_free
        return self.nerf.coarse_free if ecf is None else ecf

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_yaml(path: str, base: Optional[Config] = None) -> Config:
    """Build a :class:`Config` from a reference-format ``config.yaml``.

    Accepts the exact schema of the reference yaml (``config/config.yaml``);
    missing keys fall back to dataclass defaults.
    """
    cfg = base or Config()
    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}

    sys_info = raw.get("system", {})
    model = raw.get("model", {})

    def get(d, *keys, default=None):
        for k in keys:
            if not isinstance(d, dict) or k not in d:
                return default
            d = d[k]
        return d

    stages = StageConfig(
        cam_param_epochs=get(sys_info, "epoch", "cam_param_stage", default=cfg.stages.cam_param_epochs),
        global_opt_epochs=get(sys_info, "epoch", "global_opt_stage", default=cfg.stages.global_opt_epochs),
        fine_tune_epochs=get(sys_info, "epoch", "fine_tune_stage", default=cfg.stages.fine_tune_epochs),
    )
    train = dataclasses.replace(
        cfg.train,
        stage1_lr=get(sys_info, "train_params", "stage_1_lr", default=cfg.train.stage1_lr),
        stage2_lr=get(sys_info, "train_params", "stage_2_lr", default=cfg.train.stage2_lr),
        stage3_lr=get(sys_info, "train_params", "stage_3_lr", default=cfg.train.stage3_lr),
        weight_decay=get(sys_info, "train_params", "weight_decay", default=cfg.train.weight_decay),
        warmup_epoch=get(sys_info, "train_params", "warmup_epoch", default=cfg.train.warmup_epoch),
        rays_per_batch=get(sys_info, "train_params", "batch", default=cfg.train.rays_per_batch),
        seed=get(sys_info, "data", "seed", default=cfg.train.seed),
        # extension keys (not in the reference schema)
        fine_mode=get(sys_info, "train_params", "fine_mode", default=cfg.train.fine_mode),
        importance_samples=get(sys_info, "train_params", "importance_samples",
                               default=cfg.train.importance_samples),
        max_steps_per_program=get(sys_info, "train_params", "max_steps_per_program",
                                  default=cfg.train.max_steps_per_program),
        prng_impl=get(sys_info, "train_params", "prng_impl",
                      default=cfg.train.prng_impl),
        remat_shade=get(sys_info, "train_params", "remat_shade",
                        default=cfg.train.remat_shade),
        use_pallas=get(sys_info, "train_params", "use_pallas",
                       default=cfg.train.use_pallas),
        grad_clip=get(sys_info, "train_params", "grad_clip",
                      default=cfg.train.grad_clip),
        ckpt_max_keep=get(sys_info, "train_params", "ckpt_max_keep",
                          default=cfg.train.ckpt_max_keep),
    )
    barf = BarfConfig(
        mask=get(model, "barf", "barf_mask", default=cfg.barf.mask),
        start=get(model, "barf", "barf_start", default=cfg.barf.start),
        end=get(model, "barf", "barf_end", default=cfg.barf.end),
    )
    nerf = dataclasses.replace(
        cfg.nerf,
        near=get(model, "nerf", "near", default=cfg.nerf.near),
        far=get(model, "nerf", "far", default=cfg.nerf.far),
        samples_coarse=get(model, "nerf", "samples", default=cfg.nerf.samples_coarse),
        sample_scale=get(model, "nerf", "sample_scale", default=cfg.nerf.sample_scale),
        sigma_default=get(model, "nerf", "sigma_default", default=cfg.nerf.sigma_default),
        weight_thresh=get(model, "nerf", "weight_thresh", default=cfg.nerf.weight_thresh),
        bound_min=get(model, "nerf", "global_boader_min", default=cfg.nerf.bound_min),
        bound_max=get(model, "nerf", "global_boader_max", default=cfg.nerf.bound_max),
        white_back=get(model, "nerf", "white_back", default=cfg.nerf.white_back),
        emb_freqs_xyz=get(model, "nerf", "emb_freqs_xyz", default=cfg.nerf.emb_freqs_xyz),
        coarse_depth=get(model, "nerf", "coarse_MLP_depth", default=cfg.nerf.coarse_depth),
        coarse_width=get(model, "nerf", "coarse_MLP_width", default=cfg.nerf.coarse_width),
        coarse_skips=tuple(get(model, "nerf", "coarse_MLP_skip", default=list(cfg.nerf.coarse_skips))),
        fine_depth=get(model, "nerf", "fine_MLP_depth", default=cfg.nerf.fine_depth),
        fine_width=get(model, "nerf", "fine_MLP_width", default=cfg.nerf.fine_width),
        fine_skips=tuple(get(model, "nerf", "fine_MLP_skip", default=list(cfg.nerf.fine_skips))),
        sh_deg=get(model, "nerf", "MLP_deg", default=cfg.nerf.sh_deg),
        grid_nerf=get(model, "nerf", "grid_nerf", default=cfg.nerf.grid_nerf),
        sigma_init=get(model, "nerf", "sigma_init", default=cfg.nerf.sigma_init),
        # extension keys (not in the reference schema): occupancy culling
        occ_grid_size=get(model, "nerf", "occ_grid_size", default=cfg.nerf.occ_grid_size),
        occ_thresh=get(model, "nerf", "occ_thresh", default=cfg.nerf.occ_thresh),
        occ_decay=get(model, "nerf", "occ_decay", default=cfg.nerf.occ_decay),
        occ_update_every=get(model, "nerf", "occ_update_every", default=cfg.nerf.occ_update_every),
        occ_warmup_steps=get(model, "nerf", "occ_warmup_steps", default=cfg.nerf.occ_warmup_steps),
        occ_floor=get(model, "nerf", "occ_floor", default=cfg.nerf.occ_floor),
        occ_probes=get(model, "nerf", "occ_probes", default=cfg.nerf.occ_probes),
        occ_coarse_samples=get(model, "nerf", "occ_coarse_samples", default=cfg.nerf.occ_coarse_samples),
        occ_dilate=get(model, "nerf", "occ_dilate", default=cfg.nerf.occ_dilate),
        occ_map_dtype=get(model, "nerf", "occ_map_dtype", default=cfg.nerf.occ_map_dtype),
        coarse_free=get(model, "nerf", "coarse_free", default=cfg.nerf.coarse_free),
        occ_pmf=get(model, "nerf", "occ_pmf", default=cfg.nerf.occ_pmf),
        coarse_free_from_stage=get(model, "nerf", "coarse_free_from_stage",
                                   default=cfg.nerf.coarse_free_from_stage),
        occ_refresh_source=get(model, "nerf", "occ_refresh_source",
                               default=cfg.nerf.occ_refresh_source),
        cf_uniform_samples=get(model, "nerf", "cf_uniform_samples",
                               default=cfg.nerf.cf_uniform_samples),
        allow_measured_harmful=get(model, "nerf", "allow_measured_harmful",
                                   default=cfg.nerf.allow_measured_harmful),
    )
    evalc = dataclasses.replace(
        cfg.eval,
        res_h=get(sys_info, "test_params", "resolution_h", default=cfg.eval.res_h),
        res_w=get(sys_info, "test_params", "resolution_w", default=cfg.eval.res_w),
        demo_ckpt=get(sys_info, "test_params", "nerf_model_name", default=cfg.eval.demo_ckpt),
        # extension keys (not in the reference schema)
        fine_mode=get(sys_info, "test_params", "fine_mode", default=cfg.eval.fine_mode),
        importance_samples=get(sys_info, "test_params", "importance_samples",
                               default=cfg.eval.importance_samples),
        rays_per_chunk=get(sys_info, "test_params", "rays_per_chunk",
                           default=cfg.eval.rays_per_chunk),
        use_pallas=get(sys_info, "test_params", "use_pallas",
                       default=cfg.eval.use_pallas),
        coarse_free=get(sys_info, "test_params", "coarse_free",
                        default=cfg.eval.coarse_free),
    )
    paths = dataclasses.replace(
        cfg.paths,
        root_weights=get(sys_info, "weights_params", "root_weights", default=cfg.paths.root_weights),
        root_out=get(sys_info, "out_params", "root_out", default=cfg.paths.root_out),
        render_subdir=get(sys_info, "out_params", "test_enerf_pth", default=cfg.paths.render_subdir),
        log_path=get(sys_info, "log_params", "logpath", default=cfg.paths.log_path),
        tb_path=get(sys_info, "tensorboard_params", "tb_pth", default=cfg.paths.tb_path),
        tb_delete_old=get(sys_info, "tensorboard_params", "del_mode", default=cfg.paths.tb_delete_old),
    )
    return dataclasses.replace(
        cfg,
        apriltag_size=get(sys_info, "apriltag", "tag_size", default=cfg.apriltag_size),
        stages=stages, train=train, barf=barf, nerf=nerf, eval=evalc, paths=paths,
    )


def build_argparser() -> argparse.ArgumentParser:
    """CLI flags with the reference's exact surface (ref ``main.py:245-268``)."""
    p = argparse.ArgumentParser(description="MC-NeRF-TPU")
    p.add_argument("--config", type=str, default="./config",
                   help="root path of config file (directory containing config.yaml)")
    p.add_argument("--root_data", type=str, default="./data/dataset_Ball",
                   help="root path of data")
    p.add_argument("--data_name", type=str, default="Ball_Computer",
                   help="name of data")
    p.add_argument("--demo", action="store_true",
                   help="nerf rendering forward with test mode")
    p.add_argument("--train", action="store_true", help="train mode")
    p.add_argument("--log", action="store_true",
                   help="save log information to a log file")
    p.add_argument("--start_device", type=int, default=0,
                   help="start device index (CLI parity with the reference; no-op on TPU)")
    p.add_argument("--tensorboard", action="store_true",
                   help="write tensorboard scalars during training")
    return p


def from_args(args: argparse.Namespace) -> Config:
    """Merge CLI args with the YAML config (ref ``config/config_read.py:8-93``)."""
    yaml_path = os.path.join(Path(args.config), Path("config.yaml"))
    cfg = load_yaml(yaml_path) if os.path.exists(yaml_path) else Config()
    mode = 1 if args.demo and not args.train else 0
    return cfg.replace(
        data_root=args.root_data,
        data_name=args.data_name,
        mode=mode,
        log_to_file=args.log,
        tensorboard=args.tensorboard,
        start_device=args.start_device,
    )
