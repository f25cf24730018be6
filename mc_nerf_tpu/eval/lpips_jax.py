"""LPIPS (AlexNet backbone) in JAX.

Faithful re-implementation of the LPIPS(alex) metric the reference computes
via the ``lpips`` pip package (``main.py:238-241``): AlexNet conv features at
5 taps, per-channel input scaling, unit-normalized feature maps, learned
linear weights per channel, spatial mean, summed over taps.

Pretrained AlexNet + LPIPS linear weights are neither bundled (license) nor
downloadable here (zero egress).  Weight resolution order:
  1. explicit ``weights_path`` argument,
  2. ``$MC_NERF_LPIPS_WEIGHTS``,
  3. ``weights/lpips_alex.npz`` under the current directory.
``load_default`` returns None when no weights are found; callers report
LPIPS as unavailable instead of fabricating numbers.

Weight file format (.npz): conv{1..5}_w [kh, kw, cin, cout], conv{1..5}_b
[cout], lin{0..4} [c] (non-negative LPIPS linear weights), shift [3],
scale [3].  ``convert_torch_lpips`` produces this from a torch ``lpips``
package state dict, for users who have one on disk.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

ENV_VAR = "MC_NERF_LPIPS_WEIGHTS"
DEFAULT_PATH = "weights/lpips_alex.npz"

# AlexNet-features geometry (torchvision layout)
_CONV_SPECS = (
    # (out_ch, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # maxpool 3x3 stride 2 after conv1 and conv2 taps


class LpipsModel(NamedTuple):
    conv_w: tuple
    conv_b: tuple
    lin: tuple
    shift: jnp.ndarray
    scale: jnp.ndarray


def load(path: str) -> LpipsModel:
    z = np.load(path)
    return LpipsModel(
        conv_w=tuple(jnp.asarray(z[f"conv{i+1}_w"]) for i in range(5)),
        conv_b=tuple(jnp.asarray(z[f"conv{i+1}_b"]) for i in range(5)),
        lin=tuple(jnp.asarray(z[f"lin{i}"]) for i in range(5)),
        shift=jnp.asarray(z["shift"]),
        scale=jnp.asarray(z["scale"]),
    )


def load_default(weights_path: Optional[str] = None) -> Optional[LpipsModel]:
    for cand in (weights_path, os.environ.get(ENV_VAR), DEFAULT_PATH):
        if cand and os.path.exists(cand):
            return load(cand)
    return None


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _alexnet_taps(model: LpipsModel, x: jnp.ndarray):
    """x: [1, H, W, 3] in [-1, 1] -> list of 5 relu feature maps."""
    x = (x - model.shift) / model.scale
    taps = []
    for i, (out_ch, k, stride, pad) in enumerate(_CONV_SPECS):
        x = _conv(x, model.conv_w[i], model.conv_b[i], stride, pad)
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return taps


def lpips_distance(model: LpipsModel, pred, gt) -> jnp.ndarray:
    """LPIPS between two [H, W, 3] images in [0, 1]."""
    pred = jnp.asarray(pred, jnp.float32)[None] * 2.0 - 1.0
    gt = jnp.asarray(gt, jnp.float32)[None] * 2.0 - 1.0
    taps_p = _alexnet_taps(model, pred)
    taps_g = _alexnet_taps(model, gt)
    total = jnp.zeros(())
    for tp, tg, lin in zip(taps_p, taps_g, model.lin):
        tp = tp / (jnp.linalg.norm(tp, axis=-1, keepdims=True) + 1e-10)
        tg = tg / (jnp.linalg.norm(tg, axis=-1, keepdims=True) + 1e-10)
        diff = (tp - tg) ** 2
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
    return total


def convert_torch_lpips(state_dict, out_path: str) -> None:
    """Convert a torch ``lpips`` package checkpoint to our .npz format.

    Expects keys like ``net.slice1.0.weight`` (torchvision AlexNet layout,
    [cout, cin, kh, kw]) and ``lin{i}.model.1.weight`` ([1, c, 1, 1]).
    """
    import re

    import numpy as _np

    def t2np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else _np.asarray(v)

    def natkey(k):
        # numeric sort so slice10 orders after slice9 (sorted() alone would
        # interleave them lexicographically)
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", k)]

    out = {}
    conv_i = 0
    for k in sorted(state_dict, key=natkey):
        if k.endswith(".weight") and "slice" in k:
            w = t2np(state_dict[k])
            if w.ndim == 4:
                conv_i += 1
                out[f"conv{conv_i}_w"] = w.transpose(2, 3, 1, 0)
                out[f"conv{conv_i}_b"] = t2np(state_dict[k.replace("weight", "bias")])
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key in state_dict:
            out[f"lin{i}"] = t2np(state_dict[key])[0, :, 0, 0]
    out["shift"] = _np.array([-0.030, -0.088, -0.188], dtype=_np.float32)
    out["scale"] = _np.array([0.458, 0.448, 0.450], dtype=_np.float32)
    _np.savez(out_path, **out)
