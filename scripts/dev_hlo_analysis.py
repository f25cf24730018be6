"""Dev: dump the compiled epoch HLO and attribute copies/glue ops by shape.

Finds every non-fusion op in the while body (copies, reshapes,
dynamic-update-slices, convolutions) with its shape and byte count, so the
"2 ms/step of while-carry copies + 7 ms of spread glue" profile lines
(ROADMAP) map to actual instructions.
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax

from dev_train_bench import setup  # noqa: E402
from mc_nerf_tpu.config import Config


BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "u8": 1, "pred": 1, "s8": 1,
         "u64": 8, "s64": 8, "f64": 8, "u16": 2, "s16": 2}


def shape_bytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * BYTES.get(dt, 4)


def main():
    base = Config()
    overrides, nerf_overrides = {}, {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=")
        if k.startswith("nerf."):  # e.g. nerf.occ_coarse_samples=32
            nerf_overrides[k[5:]] = eval(v)
        else:
            overrides[k] = eval(v)
    cfg = base.replace(
        train=dataclasses.replace(base.train, **overrides),
        nerf=dataclasses.replace(base.nerf, **nerf_overrides),
    )

    state, data, epoch = setup(cfg)
    key = jax.random.PRNGKey(7)
    lowered = epoch.lower(state, data, key)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/epoch_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: /tmp/epoch_hlo.txt ({len(txt.splitlines())} lines)")

    # per-op-kind byte totals for interesting glue ops
    interesting = ("copy", "reshape", "transpose", "dynamic-update-slice",
                   "dynamic-slice", "convolution", "slice", "concatenate",
                   "gather", "scatter", "select-and-scatter", "all-reduce",
                   "pad", "broadcast")
    agg = defaultdict(lambda: [0, 0])
    lines = txt.splitlines()
    for ln in lines:
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\S+) (\w[\w\-]*)\(", ln)
        if not m:
            continue
        shape, op = m.groups()
        if op in interesting:
            agg[op][0] += 1
            agg[op][1] += shape_bytes(shape)
    print("\nop-kind totals over the whole module (count, output MB):")
    for op, (n, b) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {op:24s} n={n:4d}  {b/1e6:9.2f} MB")

    # largest copies with shapes
    print("\nlargest copy instructions:")
    copies = []
    for ln in lines:
        m = re.match(r"\s*%?([\w.\-]+) = (\S+) copy\(", ln)
        if m:
            copies.append((shape_bytes(m.group(2)), m.group(2), m.group(1)))
    for b, shape, name in sorted(copies, reverse=True)[:25]:
        print(f"  {b/1e6:9.3f} MB  {shape:40s} {name}")

    # largest reshapes/transposes (physical relayouts)
    print("\nlargest reshape/transpose instructions:")
    rs = []
    for ln in lines:
        m = re.match(r"\s*%?([\w.\-]+) = (\S+) (reshape|transpose)\(", ln)
        if m:
            rs.append((shape_bytes(m.group(2)), m.group(2), m.group(3), m.group(1)))
    for b, shape, op, name in sorted(rs, reverse=True)[:20]:
        print(f"  {b/1e6:9.3f} MB  {op:9s} {shape:36s} {name}")

    # convolutions (the conv_add first-layer GEMMs)
    print("\nconvolution instructions:")
    for ln in lines:
        m = re.match(r"\s*%?([\w.\-]+) = (\S+) convolution\(", ln)
        if m:
            print(f"  {m.group(2):40s} {m.group(1)}   {ln.strip()[:160]}")

    # dynamic-update-slice shapes
    print("\ndynamic-update-slice instructions:")
    dus = []
    for ln in lines:
        m = re.match(r"\s*%?([\w.\-]+) = (\S+) dynamic-update-slice\(", ln)
        if m:
            dus.append((shape_bytes(m.group(2)), m.group(2), m.group(1)))
    for b, shape, name in sorted(dus, reverse=True)[:15]:
        print(f"  {b/1e6:9.3f} MB  {shape:40s} {name}")


if __name__ == "__main__":
    main()
