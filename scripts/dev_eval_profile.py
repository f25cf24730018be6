"""Dev script: profile one 800x800 eval frame; summarize device op time."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mc_nerf_tpu.config import Config
from mc_nerf_tpu.models.nerf import init_nerf_params
from mc_nerf_tpu.train.steps import make_render_fn


def main():
    cfg = Config()
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else cfg.eval.rays_per_chunk
    key = jax.random.PRNGKey(0)
    params = init_nerf_params(key, cfg.nerf)
    render = make_render_fn(cfg, 800, 800, rays_per_chunk=chunk)

    pose = jnp.asarray(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32)
    )
    K = jnp.asarray(np.array([[800, 0, 400], [0, 800, 400], [0, 0, 1]], np.float32))

    occ = None
    if os.environ.get("MC_NERF_EVAL_OCC") == "1":
        from mc_nerf_tpu.ops.occupancy import binary_grid, init_grid

        occ = binary_grid(init_grid(cfg.nerf.occ_grid_size), cfg.nerf)

    out = render(params, pose, K, occ)
    float(out[0].sum())  # force
    t0 = time.time()
    n = 3
    for _ in range(n):
        out = render(params, pose, K, occ)
        s = float(out[0].sum())
    dt = (time.time() - t0) / n
    print(f"chunk={chunk} occ={occ is not None}: frame latency {dt*1e3:.0f} ms   (sum={s:.1f})")

    prof_dir = "/tmp/eval_prof"
    os.system(f"rm -rf {prof_dir}")
    with jax.profiler.trace(prof_dir):
        out = render(params, pose, K, occ)
        float(out[0].sum())

    traces = glob.glob(f"{prof_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace found")
        return
    with gzip.open(traces[0], "rt") as f:
        trace = json.load(f)

    # find TPU op events: pid for device, sum dur by name
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    by_name = defaultdict(float)
    for e in events:
        args = e.get("args") or {}
        cat = args.get("long_name") or ""
        name = e.get("name", "?")
        if "tid" in e and e.get("dur", 0) > 0:
            by_name[(e.get("pid"), name.split(".")[0])] += e["dur"]
    # print the top rows per pid group that looks like device ops
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    total = sum(v for _, v in rows)
    for (pid, name), dur in rows:
        print(f"{dur/1e3:9.2f} ms  pid={pid}  {name}")


if __name__ == "__main__":
    main()
