"""Per-stage optimizers: RAdam + decoupled weight decay + stage masking.

Replaces the reference's three RAdam instances built over stage-specific
``requires_grad`` subsets (``main.py:176-207``, custom RAdam at
``model/net_utils.py:10-101``) with three optax chains over the full
parameter pytree, where frozen leaves get ``optax.set_to_zero`` via
``multi_transform`` — explicit masking instead of hook-driven "unused
parameter" handling (this is why the reference needs
``find_unused_parameters=True`` in DDP; we don't).

Stage trainable sets (ref ``main.py:182-205``):
  1. camera parameters only (NeRF frozen);
  2. everything;
  3. everything except the camera poses (``weights_pose``).

Stage-1 LR decays exponentially from ``stage1_lr`` to ``stage1_lr_floor``
over the stage (ref ``main.py:188-189``); stages 2/3 are constant LR (the
reference's gamma there is exactly 1.0, ``main.py:194,201``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import optax

from mc_nerf_tpu.config import Config
from mc_nerf_tpu.models.camera_params import CameraParams
from mc_nerf_tpu.models.nerf import NerfParams


class Params(NamedTuple):
    """The full trainable state: camera block + NeRF block."""

    cam: CameraParams
    nerf: NerfParams


def _radam(lr, weight_decay: float, clip: float = 0.0) -> optax.GradientTransformation:
    """RAdam with AdamW-style decoupled weight decay.

    Matches the reference RAdam's update rule (net_utils.py:10-101):
    rectification threshold 5 with SGD fallback, then
    p <- p - lr * (update + wd * p).  ``clip`` > 0 prepends global-norm
    gradient clipping (used in the calibration stage, where the perspective
    divide can spike gradients while poses pass near z = 0).
    """
    parts = []
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    parts += [
        optax.scale_by_radam(b1=0.9, b2=0.999, eps=1e-8, threshold=5.0),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr),
    ]
    return optax.chain(*parts)


def _stage_labels(params: Params, stage: int) -> Params:
    """'train' / 'freeze' labels per leaf for one stage."""

    def fill(tree, label):
        return jax.tree.map(lambda _: label, tree)

    if stage == 0:
        return Params(cam=fill(params.cam, "train"), nerf=fill(params.nerf, "freeze"))
    if stage == 1:
        return Params(cam=fill(params.cam, "train"), nerf=fill(params.nerf, "train"))
    if stage == 2:
        cam = fill(params.cam, "train")._replace(pose_se3="freeze")
        return Params(cam=cam, nerf=fill(params.nerf, "train"))
    raise ValueError(stage)


def build_optimizers(
    cfg: Config,
    params: Params,
    steps_per_epoch: int,
) -> Tuple[Tuple[optax.GradientTransformation, ...], Tuple]:
    """The three stage optimizers and their initial states."""
    tc = cfg.train
    s1_steps = max(1, steps_per_epoch * cfg.stages.cam_param_epochs)
    gamma1 = (tc.stage1_lr_floor / tc.stage1_lr) ** (1.0 / s1_steps)
    lr1 = optax.exponential_decay(
        init_value=tc.stage1_lr, transition_steps=1, decay_rate=gamma1
    )
    lrs = (lr1, tc.stage2_lr, tc.stage3_lr)

    opts = []
    states = []
    for stage in range(3):
        # clip in every stage: the perspective divide (stage 0) and the
        # self-normalized intr term (stages 1-2) can both spike gradients
        # by orders of magnitude in single steps
        tx = optax.multi_transform(
            {
                "train": _radam(lrs[stage], tc.weight_decay, clip=10.0),
                "freeze": optax.set_to_zero(),
            },
            _stage_labels(params, stage),
        )
        opts.append(tx)
        states.append(tx.init(params))
    return tuple(opts), tuple(states)
