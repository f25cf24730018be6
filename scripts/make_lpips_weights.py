#!/usr/bin/env python
"""Produce LPIPS(alex) weights for the JAX metric path, one command.

The reference scores LPIPS via the ``lpips`` pip package with pretrained
AlexNet weights (``/root/reference/main.py:238-241``).  Those weights are
neither redistributable nor downloadable from a zero-egress machine, so
this repo ships the *conversion* path instead: run this script once on any
networked machine (or against a torch checkpoint you already have on disk)
and copy the resulting ``.npz`` next to your run.

Usage — networked machine, nothing on disk yet (needs ``pip install lpips``):

    python scripts/make_lpips_weights.py --from-package -o weights/lpips_alex.npz

Usage — you already have a torch state dict (e.g. saved earlier with
``torch.save(lpips.LPIPS(net='alex').state_dict(), 'lpips_alex.pt')``):

    python scripts/make_lpips_weights.py lpips_alex.pt -o weights/lpips_alex.npz

The demo then picks the file up from ``weights/lpips_alex.npz`` (or
``$MC_NERF_LPIPS_WEIGHTS``) and reports the full PSNR/SSIM/LPIPS triple;
without it LPIPS is reported as "n/a (no weights)".  Format + loader:
``mc_nerf_tpu/eval/lpips_jax.py``; conversion is golden-tested against an
independent torch transcription in ``tests/test_lpips.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mc_nerf_tpu.eval.lpips_jax import convert_torch_lpips  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument(
        "ckpt", nargs="?", default=None,
        help="torch state-dict file of lpips.LPIPS(net='alex') "
             "(omit with --from-package)",
    )
    ap.add_argument(
        "--from-package", action="store_true",
        help="instantiate lpips.LPIPS(net='alex') directly (downloads "
             "pretrained weights; needs network + `pip install lpips`)",
    )
    ap.add_argument(
        "-o", "--out", default="weights/lpips_alex.npz",
        help="output .npz path (default: %(default)s)",
    )
    args = ap.parse_args()

    if args.from_package:
        try:
            import lpips  # type: ignore
        except ImportError:
            print("error: `pip install lpips` first (or pass a saved "
                  "state-dict file instead)", file=sys.stderr)
            return 2
        state_dict = lpips.LPIPS(net="alex").state_dict()
    elif args.ckpt:
        import torch

        state_dict = torch.load(args.ckpt, map_location="cpu")
        if hasattr(state_dict, "state_dict"):  # whole module was saved
            state_dict = state_dict.state_dict()
    else:
        ap.error("pass a torch state-dict file or --from-package")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    convert_torch_lpips(state_dict, args.out)
    import numpy as np

    z = np.load(args.out)
    convs = sorted(k for k in z.files if k.startswith("conv") and k.endswith("_w"))
    lins = sorted(k for k in z.files if k.startswith("lin"))
    if len(convs) != 5 or len(lins) != 5:
        print(f"error: wrote {args.out} but it has {len(convs)} convs / "
              f"{len(lins)} lins (expected 5/5) — wrong input checkpoint?",
              file=sys.stderr)
        return 1
    print(f"wrote {args.out} ({len(convs)} convs, {len(lins)} lin layers); "
          f"demo mode will now report LPIPS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
