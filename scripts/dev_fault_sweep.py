"""Systematic Mosaic fault-surface sweep for the fused_render backward.

VERDICT r3 #3: the s=64 quarantine (`fused_render._QUARANTINED_S`) is exact
but was one bisected point, not a predicate — nearby geometries users can
reach via ``importance_samples`` were trusted on no evidence.  This sweep
probes every reachable (s, block_r) cell by running ONE fused fwd+bwd per
cell in a SUBPROCESS (`scripts/dev_fault_repro.py` with the
``MC_NERF_FUSED_RAW_S=1`` escape hatch so the quarantine pad is bypassed):
a faulting cell kills only the child, and the sweep then waits for the TPU
worker to recover before the next cell.

Reachable geometries (composite semantics: ref ``model/mc_nerf.py:705-736``):
- train: rays=7000 (the reference batch), s = importance_samples, block_r
  from the production selector `_block_rays(7000, s)` = 56 for s <= 36,
  falling to 40/16 as the VMEM cap shrinks;
- eval: rays=16384 chunks, fwd-only (the backward never runs in eval).

WARNING: run SOLO on the chip — a faulting cell crashes the *shared* TPU
worker (see CLAUDE.md); anything else running at that moment wedges.

Usage:
  python scripts/dev_fault_sweep.py run [--rays 7000] [--s-min 16]
      [--s-max 256] [--fwd-only] [--out benchmarks/fused_fault_sweep.jsonl]
  python scripts/dev_fault_sweep.py report
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_OUT = os.path.join(REPO, "benchmarks", "fused_fault_sweep.jsonl")


def _probe_cell(s: int, rays: int, block_r: int, fwd_only: bool,
                raw: bool, timeout: int = 900) -> dict:
    # timeout must clear a full cold compile over the tunnel: healthy
    # cells measured ~400 s when the block_r geometry changes (round-4
    # sweep), so 420 s misclassified a slow compile as a fault — and the
    # resulting SIGKILL mid-RPC can wedge the shared worker for ~40 min
    """Run one geometry in a subprocess; classify ok / fault / timeout."""
    cmd = [sys.executable, os.path.join(REPO, "scripts", "dev_fault_repro.py"),
           "--s", str(s), "--rays", str(rays)]
    if block_r:
        cmd += ["--block-r", str(block_r)]
    if fwd_only:
        cmd += ["--fwd-only"]
    env = dict(os.environ)
    if raw:
        env["MC_NERF_FUSED_RAW_S"] = "1"
    else:
        env.pop("MC_NERF_FUSED_RAW_S", None)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=timeout)
        status = "ok" if r.returncode == 0 else "fault"
        lines = (r.stdout + r.stderr).strip().splitlines()
        detail = lines[-1][:200] if lines else ""
        if status == "fault":
            # surface the actual failure class, not JAX's traceback-filtering
            # notice: prefer the raising exception line / XLA status line
            markers = ("RESOURCE_EXHAUSTED", "XlaRuntimeError", "INTERNAL:",
                       "Mosaic", "vmem", "VMEM", "Error:", "error:")
            hits = [l.strip() for l in lines
                    if any(m in l for m in markers)]
            if hits:
                detail = hits[-1][:300]
    except subprocess.TimeoutExpired:
        status, detail = "timeout", ""
    return dict(s=s, rays=rays, block_r=block_r,
                mode="fwd" if fwd_only else "fwd+bwd", raw=raw,
                status=status, seconds=round(time.time() - t0, 1),
                detail=detail)


def _wait_worker_recovery(max_wait: int = 600) -> bool:
    """After a fault the shared TPU worker restarts; poll with a tiny
    matmul subprocess until it answers again."""
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.ones((8,8)).sum()))")
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(10)
    return False


def cmd_run(args) -> None:
    from mc_nerf_tpu.ops.pallas.fused_render import (
        _QUARANTINED_S, _block_rays,
    )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    done = set()
    if os.path.exists(args.out) and not args.fresh:
        for line in open(args.out):
            r = json.loads(line)
            # only OK cells are settled; faults/timeouts are retried on a
            # re-run (a timeout can be a misclassified slow compile)
            if r["status"] == "ok":
                done.add((r["s"], r["rays"], r["block_r"], r["mode"], r["raw"]))

    cells = []
    for s in range(args.s_min, args.s_max + 1, 8):
        try:
            br = _block_rays(args.rays, s)
        except ValueError:
            continue  # the production path refuses this size outright
        cells.append((s, br))

    faults = []
    with open(args.out, "a") as f:
        for s, br in cells:
            key = (s, args.rays, br,
                   "fwd" if args.fwd_only else "fwd+bwd", True)
            if key in done:
                print(f"skip s={s} block_r={br} (done)", flush=True)
                continue
            rec = _probe_cell(s, args.rays, br, args.fwd_only, raw=True)
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if rec["status"] != "ok":
                faults.append(rec)
                print("waiting for TPU worker recovery...", flush=True)
                ok = _wait_worker_recovery()
                print("worker recovered" if ok else
                      "WORKER DID NOT RECOVER — aborting sweep", flush=True)
                if not ok:
                    break
        # verify each faulting size runs clean under the quarantine pad
        # (raw=False) IF a mapping exists; unmapped faults are reported for
        # quarantine-table extension
        for rec in faults:
            s = rec["s"]
            key = (s, args.rays, rec["block_r"], rec["mode"], False)
            if key in done:
                continue
            pad = _QUARANTINED_S.get(s)
            if pad is None:
                # no quarantine mapping: _safe_s(s) == s, so raw=False is
                # byte-identical geometry — probing it is a duplicate fault
                print(f"s={s}: no quarantine pad mapping — raw=False would "
                      "re-run the identical geometry; reported for "
                      "quarantine-table extension instead", flush=True)
                continue
            v = _probe_cell(s, args.rays, rec["block_r"],
                            rec["mode"] == "fwd", raw=False)
            v["quarantine_pad"] = pad
            print(json.dumps(v), flush=True)
            f.write(json.dumps(v) + "\n")
            f.flush()
            if v["status"] != "ok":
                print("waiting for TPU worker recovery...", flush=True)
                if not _wait_worker_recovery():
                    break


def cmd_report(args) -> None:
    if not os.path.exists(args.out):
        print("no sweep artifact at", args.out)
        return
    rows = [json.loads(l) for l in open(args.out)]
    print(f"{'s':>4s} {'rays':>6s} {'blk_r':>5s} {'mode':7s} {'raw':3s} "
          f"{'status':7s} {'sec':>6s}")
    for r in sorted(rows, key=lambda r: (r["s"], r["rays"], not r["raw"])):
        print(f"{r['s']:4d} {r['rays']:6d} {r['block_r']:5d} {r['mode']:7s} "
              f"{str(r['raw'])[0]:3s} {r['status']:7s} {r['seconds']:6.1f}")
    bad = [r for r in rows if r["raw"] and r["status"] != "ok"]
    print(f"\n{len(bad)} faulting raw cells:",
          sorted({r["s"] for r in bad}) or "none")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["run", "report"])
    ap.add_argument("--rays", type=int, default=7000)
    ap.add_argument("--s-min", type=int, default=16)
    ap.add_argument("--s-max", type=int, default=256)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore (do not skip) already-recorded cells")
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()
    if args.cmd == "run":
        cmd_run(args)
    else:
        cmd_report(args)


if __name__ == "__main__":
    main()
