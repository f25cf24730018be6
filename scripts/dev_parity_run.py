"""Full-scale parity run: the reference's own protocol, end to end.

Reference protocol (SURVEY.md §6, ``/root/reference/main.py:137-171``,
``config/config.yaml:15-19``): Ball rig, ~110 train cameras, 800x800,
52 epochs (20 cam / 16 global / 16 fine-tune), 7000 rays/step,
N*50 steps/epoch; demo = 200 test views at 800x800 with PSNR/SSIM.

No Blender exists in this image, so the scene is the numpy-ray-traced
spheres dataset (data/synthetic.py) in the exact reference format +
camera rig geometry.  Results are recorded in BASELINE.md.

Usage: python scripts/dev_parity_run.py [out_dir] [epochs_scale]
  epochs_scale: optional float to shrink the schedule for smoke runs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mc_nerf_tpu.config import (
    Config, EvalConfig, NerfConfig, ParallelConfig, PathsConfig, StageConfig,
    TrainConfig,
)
from mc_nerf_tpu.data.synthetic import make_dataset
from mc_nerf_tpu.train.engine import Engine


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ball"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    hw = int(os.environ.get("MC_NERF_PARITY_HW", "800"))
    n_train = int(os.environ.get("MC_NERF_PARITY_CAMS", "110"))
    n_test = int(os.environ.get("MC_NERF_PARITY_TEST", "200"))
    scene_dir = os.path.join(out, "data", "Ball_Spheres")
    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        print(f"generating {n_train}-cam {hw}x{hw} ball scene ...", flush=True)
        t0 = time.time()
        make_dataset(scene_dir, n_train=n_train, n_val=4, n_test=n_test,
                     img_h=hw, img_w=hw, seed=5)
        print(f"scene generated in {time.time()-t0:.0f}s", flush=True)

    ep = lambda n: max(1, round(n * scale))
    cfg = Config(
        data_root=os.path.join(out, "data"),
        data_name="Ball_Spheres",
        stages=StageConfig(ep(20), ep(16), ep(16)),   # reference schedule
        train=TrainConfig(
            rays_per_batch=7000, steps_per_image_epoch=50,
            fine_mode=os.environ.get("MC_NERF_TRAIN_FINE_MODE", "importance"),
            importance_samples=int(os.environ.get("MC_NERF_IMP_SAMPLES", "32")),
            use_pallas=(os.environ.get("MC_NERF_TRAIN_PALLAS") == "1") or None,
            # grid-mode steps are ~2.5x slower than the importance default;
            # 500-step programs then flirt with the platform's ~60 s
            # execution watchdog — allow shrinking per run
            max_steps_per_program=int(
                os.environ.get("MC_NERF_MAX_STEPS_PER_PROGRAM", "500")
            ),
        ),
        nerf=NerfConfig(
            occ_grid_size=int(os.environ.get("MC_NERF_OCC_GRID", "64")),
            occ_coarse_samples=int(os.environ.get("MC_NERF_OCC_COARSE", "48")),
        ),
        eval=EvalConfig(
            res_h=hw, res_w=hw,
            # the ref demo path evaluates with the same hierarchical scheme
            # it trains (main.py:98-173); match the train fine_mode so the
            # grid-protocol run is apples-to-apples end to end
            fine_mode=os.environ.get("MC_NERF_TRAIN_FINE_MODE", "importance"),
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
    print(
        "parity config:",
        json.dumps({
            "hw": hw, "n_train": n_train, "n_test": n_test,
            "epochs": [cfg.stages.cam_param_epochs,
                       cfg.stages.global_opt_epochs,
                       cfg.stages.fine_tune_epochs],
            "fine_mode": cfg.train.fine_mode,
            "importance_samples": cfg.train.importance_samples,
            "occ_grid": cfg.nerf.occ_grid_size,
            "occ_coarse": cfg.nerf.occ_coarse_samples,
            "use_pallas": cfg.train.use_pallas,
        }),
        flush=True,
    )
    t0 = time.time()
    engine = Engine(cfg)
    engine.train(resume=True)
    t_train = time.time() - t0
    print(f"TRAIN DONE in {t_train/3600:.2f} h", flush=True)

    t0 = time.time()
    result = Engine(cfg.replace(mode=1)).demo()
    result["train_hours"] = round(t_train / 3600, 3)
    result["demo_seconds"] = round(time.time() - t0, 1)
    result["config"] = {
        "hw": hw, "n_train": n_train, "epochs": cfg.stages.total_epochs,
        "fine_mode": cfg.train.fine_mode,
        "importance_samples": cfg.train.importance_samples,
        "occ_grid": cfg.nerf.occ_grid_size,
        "occ_coarse": cfg.nerf.occ_coarse_samples,
    }
    print("PARITY RESULT:", json.dumps(result), flush=True)
    with open(os.path.join(out, "parity_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
