"""Multi-rig sampling-budget A/B: validate the library defaults on >=3 rigs.

Round-2's occ32/imp16 default rested on one scene (Ball spheres) and lost
0.55 dB at the full reference protocol (VERDICT r2 "what's weak" #1).  This
runs the budget ladder on the OTHER reference rig geometries — Array (10x10
planar grid, ref ``synthetic_dataset_code/Array.py:21-28``) and Room (88
cams on the walls of a box, ``Room.py:18-29``) — at full 800x800 scale with
cameras self-calibrated from scratch, the same (20, 6, 6) schedule as the
Ball A/B (BASELINE.md), so the three rigs' rankings are comparable.

Configs: occ48/imp32 (conservative), occ32/imp16 (default), occ24/imp12
(candidate — the next step toward the 10x throughput north star, adopted
only if quality holds across rigs per VERDICT r2 #1/#4).

Usage:
  python scripts/dev_rig_ab.py gen                    # write both scenes (CPU)
  python scripts/dev_rig_ab.py run [rig] [config...]  # train + demo
  python scripts/dev_rig_ab.py report
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/rig_ab"
RIGS = {"array": 100, "room": 88, "halfball": 100, "ball": 110}  # ref cam counts
RES = 800
N_TEST = 30
CONFIGS = {
    # occ=occ_coarse_samples, imp=importance_samples, probes=occ_probes,
    # rays=rays_per_batch, spi=steps_per_image_epoch, cf=coarse_free
    "occ48_imp32": dict(occ=48, imp=32),
    "occ32_imp16": dict(occ=32, imp=16),
    "occ24_imp12": dict(occ=24, imp=12),
    # probes-halved candidate: -0.45 ms/step measured (BASELINE.md round-3
    # "measured and rejected/held" list); adopted only if quality holds
    # vs the probes-64 twin on the same rig+seed
    "occ48_imp32_p32": dict(occ=48, imp=32, probes=32),
    # --- round-4 step-shape scaling (VERDICT r3 #1a): bigger, sparser
    # steps at CONSTANT total rays/epoch (rays x spi ~ 7000 x 50)
    "occ48_imp32_b14k": dict(occ=48, imp=32, rays=14000, spi=25),
    "occ48_imp32_b28k": dict(occ=48, imp=32, rays=28000, spi=13),
    "occ32_imp16_b28k": dict(occ=32, imp=16, rays=28000, spi=13),
    # --- round-4 coarse-free (VERDICT r3 #1b): occupancy PMF as the sole
    # proposal; cfN = N fine samples/ray, no coarse pass at all
    "cf16": dict(imp=16, cf=True),
    "cf24": dict(imp=24, cf=True),
    "cf32": dict(imp=32, cf=True),
    "cf48": dict(imp=48, cf=True),
    "cf64": dict(imp=64, cf=True),
    "cf48_b28k": dict(imp=48, cf=True, rays=28000, spi=13),
    "cf32_b28k": dict(imp=32, cf=True, rays=28000, spi=13),
    # --- round-4 density PMF (occ_pmf="density"): grid-based coarse pass;
    # the binary-PMF cf runs plateaued (Array 6.1 PSNR) because the PMF
    # cannot concentrate samples at surfaces
    "cf16d": dict(imp=16, cf=True, pmf="density"),
    "cf24d": dict(imp=24, cf=True, pmf="density"),
    "cf32d": dict(imp=32, cf=True, pmf="density"),
    # density PMF under the two-pass pipeline (sharper coarse placement)
    "occ32d_imp16": dict(occ=32, imp=16, pmf="density"),
    "occ24d_imp12": dict(occ=24, imp=12, pmf="density"),
    # --- round-4 HYBRID schedule (coarse_free_from_stage=2): two-pass
    # while BARF ramps (GLOBAL_OPTIM), grid-proposal coarse-free in
    # FINE_TUNE — coarse-free from scratch cannot bootstrap (BASELINE.md)
    "hyb32_16": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                     refresh="fine"),
    "hyb48_32": dict(occ=48, imp=32, cf=True, cf_stage=2, pmf="density",
                     refresh="fine"),
    # --- round-4 hybrid FIX candidates.  The take-3 hybrid (refresh from
    # the fine MLP during coarse-free FINE_TUNE) fails: the fine field is
    # supervised only ON the PMF support, drifts off it, and the grid EMA
    # feeds the drift back (Array 7.84 PSNR vs 18.08 two-pass; val PSNR
    # falls monotonically across cf epochs on a fixed view).  hybf* FREEZES
    # the proposal at the GLOBAL_OPTIM-trained coarse MLP
    # (occ_refresh_source="coarse").  seed_from reuses another config's
    # checkpoints up to seed_upto (the stages before the knob differ are
    # bit-identical), so each variant costs only the FINE_TUNE epochs.
    "hybf32_16": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                      refresh="coarse", seed_from="hyb32_16", seed_upto=25),
    "hybf48_32": dict(occ=48, imp=32, cf=True, cf_stage=2, pmf="density",
                      refresh="coarse", seed_from="hyb48_32", seed_upto=25),
    # eval-path diagnostics on EXISTING checkpoints (train is a resume
    # no-op): two-pass eval of hybrid-trained fields, denser cf eval
    "hyb32_16_ev2p": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                          seed_from="hyb32_16", eval_cf=False),
    "hybf32_16_ev2p": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                           refresh="coarse", seed_from="hybf32_16",
                           eval_cf=False),
    "hybf32_16_ev64": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                           refresh="coarse", seed_from="hybf32_16",
                           eval_imp=64),
    # two-pass eval of the SHARED epoch-25 checkpoint (GLOBAL_OPTIM end,
    # zero coarse-free epochs): the field-quality upper bound any
    # FINE_TUNE variant should beat — if ep31 ev2p scores BELOW this, the
    # coarse-free epochs damaged the field itself; if both sit well under
    # the 18.08 two-pass-trained comparator, the gap is the two-pass
    # FINE_TUNE epochs' contribution
    "hyb32_16_ep25_ev2p": dict(occ=32, imp=16, cf=True, cf_stage=2,
                               pmf="density", seed_from="hyb32_16",
                               eval_cf=False, demo_ckpt="25"),
    # --- MIXTURE proposal (cf_uniform_samples): the ev2p diagnostic showed
    # the coarse-free FINE_TUNE degrades the FIELD itself (7.86 PSNR even
    # under two-pass eval) — pure-PMF sampling never supervises empty
    # space.  uN = N of the 16 fine samples drawn stratified-uniform.
    "hybm32_16u4": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                        cf_uniform=4, seed_from="hyb32_16", seed_upto=25),
    "hybm32_16u8": dict(occ=32, imp=16, cf=True, cf_stage=2, pmf="density",
                        cf_uniform=8, seed_from="hyb32_16", seed_upto=25),
    # mixture-trained field scored through the two-pass pipeline
    "hybm32_16u4_ev2p": dict(occ=32, imp=16, cf=True, cf_stage=2,
                             pmf="density", cf_uniform=4,
                             seed_from="hybm32_16u4", eval_cf=False),
    "hybm32_16u8_ev2p": dict(occ=32, imp=16, cf=True, cf_stage=2,
                             pmf="density", cf_uniform=8,
                             seed_from="hybm32_16u8", eval_cf=False),
    # CONTROL: two-pass FINE_TUNE continuation of the IDENTICAL epoch-25
    # seed (the published 18.08 comparator ran pmf=binary end-to-end, so
    # it is not the all-else-equal control for the cf takes)
    "hyb32_16_2p_ft": dict(occ=32, imp=16, pmf="density",
                           seed_from="hyb32_16", seed_upto=25),
    # SECOND CONTROL: the density two-pass control ALSO collapsed (8.13) —
    # so the failure is not coarse-free-specific.  Binary-PMF continuation
    # of the same seed discriminates density-PMF concentration (recovers
    # here) from a resume-path defect (fails here too).
    "hyb32_16_2p_ftb": dict(occ=32, imp=16, pmf="binary",
                            seed_from="hyb32_16", seed_upto=25),
}


def cmd_gen() -> None:
    from mc_nerf_tpu.data.synthetic import make_dataset

    for rig, n_train in RIGS.items():
        scene_dir = os.path.join(ROOT, "data", f"{rig.capitalize()}_Spheres")
        if os.path.exists(os.path.join(scene_dir, "transforms_test.json")):
            print("scene exists:", scene_dir, flush=True)
            continue
        t0 = time.time()
        make_dataset(
            scene_dir, n_train=n_train, n_val=4, n_test=N_TEST,
            img_h=RES, img_w=RES, seed=7, calibration_mode="analytic",
            rig=rig,
        )
        print(f"scene written: {scene_dir} ({time.time()-t0:.0f}s)", flush=True)


def run_one(rig: str, config: str) -> dict:
    from mc_nerf_tpu.config import (
        Config, EvalConfig, NerfConfig, PathsConfig, StageConfig, TrainConfig,
    )
    from mc_nerf_tpu.train.engine import Engine

    c = CONFIGS[config]
    out = os.path.join(ROOT, f"{rig}_{config}")
    seed_src = c.get("seed_from")
    scene = f"{rig.capitalize()}_Spheres"
    if seed_src and not os.path.exists(os.path.join(out, "weights")):
        # seed from another config's checkpoints (identical up to the knob
        # under test); keep only epochs <= seed_upto so resume starts there
        import shutil

        src = os.path.join(ROOT, f"{rig}_{seed_src}", "weights", "train", scene)
        if os.path.isdir(src):
            dst = os.path.join(out, "weights", "train", scene)
            upto = c.get("seed_upto")
            keep = [
                d for d in os.listdir(src)
                if not d.isdigit() or upto is None or int(d) <= upto
            ]
            os.makedirs(dst, exist_ok=True)
            for d in keep:
                shutil.copytree(os.path.join(src, d), os.path.join(dst, d))
            print(f"seeded {config} from {seed_src} (epochs {sorted(keep)})",
                  flush=True)
        else:
            print(f"seed source {src} missing — training from scratch",
                  flush=True)
    cfg = Config(
        data_root=os.path.join(ROOT, "data"),
        data_name=f"{rig.capitalize()}_Spheres",
        stages=StageConfig(20, 6, 6),
        train=TrainConfig(
            rays_per_batch=c.get("rays", 7000),
            steps_per_image_epoch=c.get("spi", 50),
            importance_samples=c["imp"],
        ),
        nerf=NerfConfig(
            occ_coarse_samples=c.get("occ", 48),
            occ_probes=c.get("probes", 64),
            coarse_free=c.get("cf", False),
            coarse_free_from_stage=c.get("cf_stage", 1),
            occ_pmf=c.get("pmf", "binary"),
            occ_refresh_source=c.get("refresh", "auto"),
            cf_uniform_samples=c.get("cf_uniform", 0),
            # this harness EXISTS to measure the configs the engine
            # guard-rails refuse (BASELINE.md round-4 attribution matrix)
            allow_measured_harmful=True,
        ),
        eval=EvalConfig(
            res_h=RES, res_w=RES,
            importance_samples=c.get("eval_imp", c["imp"]),
            coarse_free=c.get("eval_cf", None),
            demo_ckpt=c.get("demo_ckpt", ""),
        ),
        paths=PathsConfig(
            root_weights=os.path.join(out, "weights"),
            root_out=os.path.join(out, "results"),
            log_path=os.path.join(out, "log"),
            tb_path=os.path.join(out, "tb"),
        ),
    )
    t0 = time.time()
    Engine(cfg).train(resume=True)
    t_train = time.time() - t0
    eng = Engine(cfg.replace(mode=1))
    t0 = time.time()
    result = eng.demo()
    result.update(rig=rig, config=config,
                  train_hours=round(t_train / 3600, 3),
                  demo_seconds=round(time.time() - t0, 1))
    print(f"RIG_AB[{rig}/{config}]:", json.dumps(result), flush=True)
    path = os.path.join(ROOT, "results.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(result) + "\n")
    return result


def cmd_report() -> None:
    path = os.path.join(ROOT, "results.jsonl")
    rows = [json.loads(l) for l in open(path)] if os.path.exists(path) else []
    print(f"{'rig':8s} {'config':12s} {'PSNR':>7s} {'SSIM':>7s} {'train h':>8s}")
    for r in rows:
        print(f"{r['rig']:8s} {r['config']:12s} {r['psnr']:7.2f} "
              f"{r['ssim']:7.4f} {r['train_hours']:8.2f}")


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "report"
    if cmd == "gen":
        cmd_gen()
    elif cmd == "run":
        rigs = [sys.argv[2]] if len(sys.argv) > 2 else list(RIGS)
        configs = sys.argv[3:] or list(CONFIGS)
        for rig in rigs:
            for config in configs:
                run_one(rig, config)
    elif cmd == "report":
        cmd_report()
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
