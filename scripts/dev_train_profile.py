"""Dev: profile one stage-1 train epoch (30-step scan); summarize device op time."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import jax

from dev_train_bench import setup  # noqa: E402
from mc_nerf_tpu.config import Config


def main():
    base = Config()
    overrides, nerf_overrides = {}, {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=")
        if k.startswith("nerf."):  # e.g. nerf.occ_coarse_samples=32
            nerf_overrides[k[5:]] = eval(v)
        else:
            overrides[k] = eval(v)  # dev tool: fine_mode="'importance'" etc
    cfg = base.replace(
        train=dataclasses.replace(base.train, **overrides),
        nerf=dataclasses.replace(base.nerf, **nerf_overrides),
    )

    state, data, epoch = setup(cfg)
    key = jax.random.PRNGKey(7)
    state, m = epoch(state, data, jax.random.fold_in(key, 0))
    _ = float(m["loss"])  # force compile + run

    t0 = time.time()
    state, m = epoch(state, data, jax.random.fold_in(key, 1))
    _ = float(m["loss"])
    dt = time.time() - t0
    print(f"epoch (30 steps): {dt*1e3:.0f} ms -> {dt/30*1e3:.2f} ms/step "
          f"({cfg.train.rays_per_batch*30/dt/1e3:.1f}k rays/s)")

    prof_dir = "/tmp/train_prof"
    os.system(f"rm -rf {prof_dir}")
    with jax.profiler.trace(prof_dir):
        state, m = epoch(state, data, jax.random.fold_in(key, 2))
        _ = float(m["loss"])

    traces = glob.glob(f"{prof_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace found")
        return
    with gzip.open(traces[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    by_name = defaultdict(float)
    for e in events:
        if "tid" in e and e.get("dur", 0) > 0:
            by_name[(e.get("pid"), e.get("name", "?").split(".")[0])] += e["dur"]
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:45]
    for (pid, name), dur in rows:
        print(f"{dur/1e3:9.2f} ms  pid={pid}  {name}")


if __name__ == "__main__":
    main()
