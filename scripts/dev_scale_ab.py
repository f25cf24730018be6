"""Reference-scale fine-sampling A/B: importance vs the ref-faithful grid.

Round-1 evidence for the importance-sampling default (+3.6 dB) was
small-scale (64x64/12 cams).  This runs both fine modes at the full
reference geometry — Ball rig, 110 cams, 800x800, 7000-ray steps — on a
shortened NeRF schedule (20 cam + 6 global + 6 fine-tune), reusing the
parity run's scene and its stage-0 (camera calibration) checkpoint so only
the NeRF stages re-train, then scores each over the first N test views.

Usage:
  python scripts/dev_scale_ab.py [src_run=/tmp/parity_ball] [mode=both]
        [n_views=50]
  mode: "importance" | "grid" | "both"
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mc_nerf_tpu.config import (
    Config, EvalConfig, NerfConfig, ParallelConfig, PathsConfig, StageConfig,
    TrainConfig,
)


def make_cfg(src_run: str, out: str, fine_mode: str) -> Config:
    # occ culling only applies to importance mode (engine gates on fine_mode),
    # so the one knob captures both sampling schemes faithfully
    return Config(
        data_root=os.path.join(src_run, "data"),
        data_name="Ball_Spheres",
        stages=StageConfig(20, 6, 6),
        train=TrainConfig(
            rays_per_batch=7000, steps_per_image_epoch=50,
            fine_mode=fine_mode,
            importance_samples=int(os.environ.get("MC_NERF_IMP_SAMPLES", "32")),
        ),
        nerf=NerfConfig(
            occ_grid_size=64,
            occ_coarse_samples=int(os.environ.get("MC_NERF_OCC_COARSE", "48")),
        ),
        eval=EvalConfig(
            res_h=800, res_w=800,
            fine_mode=fine_mode,
            # eval at the train-time sample density (measured best:
            # scripts/dev_eval_ab.py on the parity checkpoint)
            importance_samples=int(os.environ.get("MC_NERF_IMP_SAMPLES", "32")),
        ),
        paths=PathsConfig(
            root_weights=os.path.join(out, "weights"),
            root_out=os.path.join(out, "results"),
            log_path=os.path.join(out, "log"),
            tb_path=os.path.join(out, "tb"),
        ),
        parallel=ParallelConfig(data_parallel=1),
    )


def seed_stage0(src_run: str, out: str) -> None:
    """Copy the calibration-stage checkpoint (epoch 19) into ``out``."""
    src = os.path.join(src_run, "weights", "train", "Ball_Spheres", "19")
    dst = os.path.join(out, "weights", "train", "Ball_Spheres", "19")
    if not os.path.isdir(src):
        raise SystemExit(f"stage-0 checkpoint not found: {src}")
    if not os.path.isdir(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(src, dst)


def run_one(src_run: str, fine_mode: str, n_views: int) -> dict:
    from mc_nerf_tpu.train.engine import Engine

    tag = fine_mode
    if fine_mode == "importance":
        tag += (f"_occ{os.environ.get('MC_NERF_OCC_COARSE', '48')}"
                f"_imp{os.environ.get('MC_NERF_IMP_SAMPLES', '32')}")
    out = f"/tmp/scale_ab_{tag}"
    seed_stage0(src_run, out)
    cfg = make_cfg(src_run, out, fine_mode)
    t0 = time.time()
    Engine(cfg).train(resume=True)
    t_train = time.time() - t0

    eng = Engine(cfg.replace(mode=1))
    test = eng.scene.test
    # score the first n_views of the 200-view protocol (time-bounded A/B)
    test_small = dataclasses.replace(
        test,
        images_u8=test.images_u8[:n_views],
        poses_w2c=test.poses_w2c[:n_views],
        K=test.K[:n_views],
        fov_x=test.fov_x[:n_views],
        paths=test.paths[:n_views],
    ) if n_views < test.count else test
    eng.scene = dataclasses.replace(eng.scene, test=test_small)
    t0 = time.time()
    result = eng.demo()
    result["fine_mode"] = fine_mode
    result["train_hours"] = round(t_train / 3600, 3)
    result["demo_seconds"] = round(time.time() - t0, 1)
    print(f"AB[{fine_mode}]:", json.dumps(result), flush=True)
    return result


def main():
    src_run = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ball"
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    n_views = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    modes = ("importance", "grid") if mode == "both" else (mode,)
    results = [run_one(src_run, m, n_views) for m in modes]
    print("SCALE_AB_RESULT:", json.dumps(results), flush=True)
    with open("/tmp/scale_ab_result.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
