"""Dev: full 3-stage Engine run on a synthetic scene (TPU, small scale).

Usage: python scripts/dev_full_train.py [out_dir] [hw] [n_train]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mc_nerf_tpu.config import (
    Config, EvalConfig, NerfConfig, ParallelConfig, PathsConfig, StageConfig, TrainConfig,
)
from mc_nerf_tpu.data.synthetic import make_dataset
from mc_nerf_tpu.train.engine import Engine


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dev_full"
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    scene_dir = os.path.join(out, "data", "Dev_Spheres")
    if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
        make_dataset(scene_dir, n_train=n_train, n_val=3, n_test=4,
                     img_h=hw, img_w=hw, seed=5)

    cfg = Config(
        data_root=os.path.join(out, "data"),
        data_name="Dev_Spheres",
        stages=StageConfig(cam_param_epochs=8, global_opt_epochs=8, fine_tune_epochs=4),
        train=TrainConfig(
            rays_per_batch=2048, steps_per_image_epoch=50,
            fine_mode=os.environ.get("MC_NERF_TRAIN_FINE_MODE", "grid"),
            importance_samples=int(os.environ.get("MC_NERF_IMP_SAMPLES", "64")),
            seed=int(os.environ.get("MC_NERF_SEED", "42")),
        ),
        nerf=NerfConfig(
            samples_coarse=64, sample_scale=5, fine_bins_topk=13,
            occ_grid_size=int(os.environ.get("MC_NERF_OCC_GRID", "64")),
            occ_coarse_samples=int(os.environ.get("MC_NERF_OCC_COARSE", "64")),
        ),
        eval=EvalConfig(res_h=hw, res_w=hw, rays_per_chunk=4096),
        paths=PathsConfig(
            root_weights=os.path.join(out, "weights"),
            root_out=os.path.join(out, "results"),
            log_path=os.path.join(out, "log"),
            tb_path=os.path.join(out, "tb"),
        ),
        parallel=ParallelConfig(data_parallel=1),
    )
    engine = Engine(cfg)
    engine.train(resume=True)
    result = Engine(cfg.replace(mode=1)).demo()
    print("DEMO RESULT:", result)


if __name__ == "__main__":
    main()
