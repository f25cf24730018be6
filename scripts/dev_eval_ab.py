"""Eval-path A/B on a trained checkpoint: importance_samples vs quality/latency.

Loads the latest checkpoint of a (parity) run, renders N test views at each
candidate ``eval.importance_samples`` setting, and reports PSNR/SSIM plus
per-frame latency — the data for the <1 s/frame single-chip target
(ROADMAP: eval latency 1.58 s at imp64 as of round 2).

Usage: python scripts/dev_eval_ab.py [run_dir=/tmp/parity_ball] [n_views=8]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ball"
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    candidates = (64, 48, 32)

    import jax
    import jax.numpy as jnp

    from mc_nerf_tpu.config import Config, EvalConfig, NerfConfig, PathsConfig
    from mc_nerf_tpu.eval.metrics import psnr, ssim
    from mc_nerf_tpu.train.engine import Engine

    hw = int(os.environ.get("MC_NERF_PARITY_HW", "800"))
    cfg = Config(
        data_root=os.path.join(run, "data"),
        data_name="Ball_Spheres",
        mode=1,
        nerf=NerfConfig(
            occ_grid_size=int(os.environ.get("MC_NERF_OCC_GRID", "64")),
            occ_coarse_samples=int(os.environ.get("MC_NERF_OCC_COARSE", "48")),
        ),
        eval=EvalConfig(res_h=hw, res_w=hw),
        paths=PathsConfig(
            root_weights=os.path.join(run, "weights"),
            root_out=os.path.join(run, "results"),
            log_path=os.path.join(run, "log"),
            tb_path=os.path.join(run, "tb"),
        ),
    )

    chunk = int(os.environ.get("MC_NERF_EVAL_CHUNK", "0"))
    results = {}
    scene = None  # load the ~0.5 GB of PNGs once, reuse across candidates
    for imp in candidates:
        ev = dataclasses.replace(cfg.eval, importance_samples=imp)
        if chunk:
            ev = dataclasses.replace(ev, rays_per_chunk=chunk)
        c = cfg.replace(eval=ev)
        engine = Engine(c, scene=scene)
        scene = engine.scene
        from mc_nerf_tpu.train import checkpoint as ckpt_lib

        engine.state, epoch = ckpt_lib.restore_checkpoint(
            engine.ckpt_dir, engine.state, None
        )
        occ = None
        if engine._occ_eval:
            engine.occ_grid = None
            engine._refresh_occupancy(epoch)
            occ = engine._occ2d
        test = engine.scene.test
        render = engine._render_fn(test.img_h, test.img_w)

        # warm (compile)
        rgb, _, _ = render(engine.state.params.nerf,
                           jnp.asarray(test.poses_w2c[0]),
                           jnp.asarray(test.K[0]), occ)
        float(jnp.sum(rgb))

        ps, ss = [], []
        t0 = time.time()
        for i in range(n_views):
            rgb, _, _ = render(engine.state.params.nerf,
                               jnp.asarray(test.poses_w2c[i]),
                               jnp.asarray(test.K[i]), occ)
            pred = np.asarray(rgb)
            gt = test.images_u8[i].astype(np.float32) / 255.0
            ps.append(float(psnr(jnp.asarray(pred), jnp.asarray(gt))))
            ss.append(float(ssim(jnp.asarray(pred), jnp.asarray(gt))))
        dt = (time.time() - t0) / n_views
        results[imp] = {
            "psnr": round(float(np.mean(ps)), 3),
            "ssim": round(float(np.mean(ss)), 4),
            "sec_per_frame": round(dt, 3),
            "epoch": epoch,
        }
        print(f"imp{imp}: {results[imp]}", flush=True)

    print("EVAL_AB:", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
