"""Eval-side coarse-free quality/latency ladder on a HEALTHY checkpoint.

VERDICT r4 ask #2: the shipped ``eval.coarse_free`` mode had a measured
step rate (859k rays/s cf16) but every PSNR on record came from degraded
hybrid-trained fields — nothing said what grid-PMF eval costs in dB on the
one configuration a user would deploy (the two-pass occ48/imp32 protocol
checkpoint).  This renders the SAME restored checkpoint through:

  2p     — the two-pass eval baseline (coarse MLP proposes; ref protocol
           ``/root/reference/main.py:98-173``)
  cfN    — eval.coarse_free=True, importance_samples=N (binary PMF)
  cfNd   — same with nerf.occ_pmf="density" (transmittance-weighted PMF;
           demo mode, so the training guard-rail does not apply)

and reports PSNR/SSIM over the first ``n_views`` test views plus
render-only sec/frame (compile excluded, results forced with float()).

Usage: python scripts/dev_eval_cf_ab.py [run_dir=/tmp/parity_ball]
           [n_views=25] [out=benchmarks/eval_cf_ab_r05.json]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CANDIDATES = (
    ("2p", dict()),
    ("cf16", dict(cf=True, imp=16)),
    ("cf32", dict(cf=True, imp=32)),
    ("cf64", dict(cf=True, imp=64)),
    ("cf32d", dict(cf=True, imp=32, pmf="density")),
)


def main():
    run = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ball"
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "eval_cf_ab_r05.json",
    )

    import jax.numpy as jnp

    from mc_nerf_tpu.config import Config, EvalConfig, NerfConfig, PathsConfig
    from mc_nerf_tpu.eval.metrics import psnr, ssim
    from mc_nerf_tpu.train import checkpoint as ckpt_lib
    from mc_nerf_tpu.train.engine import Engine

    hw = int(os.environ.get("MC_NERF_PARITY_HW", "800"))
    base = Config(
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

    results = {}
    scene = None  # load the PNGs once, reuse across candidates
    for name, c in CANDIDATES:
        nerf = base.nerf
        if c.get("pmf"):
            nerf = dataclasses.replace(nerf, occ_pmf=c["pmf"])
        ev = dataclasses.replace(
            base.eval,
            coarse_free=bool(c.get("cf", False)) or None,
            importance_samples=c.get("imp", base.eval.importance_samples),
        )
        cfg = base.replace(nerf=nerf, eval=ev)
        engine = Engine(cfg, scene=scene)
        scene = engine.scene
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

        ps, ss, dt = [], [], 0.0
        for i in range(n_views):
            t0 = time.time()
            rgb, _, _ = render(engine.state.params.nerf,
                               jnp.asarray(test.poses_w2c[i]),
                               jnp.asarray(test.K[i]), occ)
            pred = np.asarray(rgb)  # forces the result (tunnel-safe)
            dt += time.time() - t0
            gt = test.images_u8[i].astype(np.float32) / 255.0
            ps.append(float(psnr(jnp.asarray(pred), jnp.asarray(gt))))
            ss.append(float(ssim(jnp.asarray(pred), jnp.asarray(gt))))
        results[name] = {
            "psnr": round(float(np.mean(ps)), 3),
            "ssim": round(float(np.mean(ss)), 4),
            "sec_per_frame": round(dt / n_views, 3),
            "epoch": epoch,
            "n_views": n_views,
        }
        print(f"{name}: {results[name]}", flush=True)

    print("EVAL_CF_AB:", json.dumps(results), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("written:", out_path, flush=True)


if __name__ == "__main__":
    main()
