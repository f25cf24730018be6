"""Resolve the raw-s=64 quarantine contradiction (VERDICT r4 ask #1).

History: round 2 bisected a TRAIN-backward kernel fault at s=64 "at every
tried ray-block size" — the repro notes name ray blocks of 1536 and 512
POINTS, i.e. block_r=24 and block_r=8 (scripts/dev_fault_repro.py docstring)
— and installed the exact-pad quarantine ``_QUARANTINED_S = {64: 72}``.
Round 4's sweep then probed RAW s=64 at block_r=16 (today's production
selector output for 7000 rays) and it ran OK in 93.5 s, contradicting the
quarantine's premise.  The kernel is byte-identical since the quarantine
commit (git: only the env escape hatch touched fused_render.py), so the
reconciling hypothesis is that the fault is BLOCK-GEOMETRY-dependent, not
s-dependent: the round-2 bisect ran under an earlier block selector that
chose 24/8, and block_r=16 was never the faulting geometry.

This driver probes raw s=64 across block_r x repeats (block_r=24 IS
production-reachable: any rays divisible by 24 but not 16/32, e.g. 984)
and appends to ``benchmarks/fused_fault_s64_probes.jsonl``.

WARNING: run SOLO — a faulting probe crashes the shared TPU worker.

Usage: python scripts/dev_s64_probes.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.dev_fault_sweep import _probe_cell, _wait_worker_recovery

OUT = os.path.join(REPO, "benchmarks", "fused_fault_s64_probes.jsonl")

# (block_r, repeats): 16 = today's production geometry (stability x3);
# 24 = the round-2 suspect, reachable via rays % 24 == 0; 8 = the
# selector-quarantined size (confirm the guard is still earned);
# 32 = reachable via rays % 32 == 0
PLAN = ((16, 3), (24, 2), (8, 1), (32, 1))


def main():
    rows = []
    with open(OUT, "a") as f:
        for block_r, reps in PLAN:
            for rep in range(reps):
                rec = _probe_cell(64, 7000, block_r, fwd_only=False, raw=True)
                rec["rep"] = rep
                rows.append(rec)
                print(json.dumps(rec), flush=True)
                f.write(json.dumps(rec) + "\n")
                f.flush()
                if rec["status"] != "ok":
                    print("waiting for TPU worker recovery...", flush=True)
                    if not _wait_worker_recovery():
                        print("WORKER DID NOT RECOVER — aborting", flush=True)
                        return
    bad = sorted({r["block_r"] for r in rows if r["status"] != "ok"})
    print("faulting block_r:", bad or "none", flush=True)


if __name__ == "__main__":
    main()
