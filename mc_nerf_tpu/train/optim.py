"""Per-stage optimizers: flat-buffer RAdam + decoupled weight decay + masks.

Replaces the reference's three RAdam instances built over stage-specific
``requires_grad`` subsets (``main.py:176-207``, custom RAdam at
``model/net_utils.py:10-101``).  Round 2 used three ``optax.multi_transform``
chains over the parameter *pytree*; profiling the epoch ``lax.scan`` showed
the pytree carry (params + mu + nu across ~50 leaves) cost ~1 ms/step of
small while-loop carry copies and slices that XLA could not alias.  The
optimizer is therefore first-party and **flat**: parameters, first and
second moments each live in ONE ``[N]`` f32 buffer, per-stage trainable
subsets are 0/1 mask vectors, and the scan carries five arrays total.  The
update math is element-wise, so flattening changes nothing numerically —
:mod:`tests.test_train_steps` pins it against ``optax.scale_by_radam``.

Stage trainable sets (ref ``main.py:182-205``):
  1. camera parameters only (NeRF frozen);
  2. everything;
  3. everything except the camera poses (``weights_pose``).

Stage-1 LR decays exponentially from ``stage1_lr`` to ``stage1_lr_floor``
over the stage (ref ``main.py:188-189``); stages 2/3 are constant LR (the
reference's gamma there is exactly 1.0, ``main.py:194,201``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from mc_nerf_tpu.config import Config
from mc_nerf_tpu.models.camera_params import CameraParams
from mc_nerf_tpu.models.nerf import NerfParams


class Params(NamedTuple):
    """The full trainable state: camera block + NeRF block."""

    cam: CameraParams
    nerf: NerfParams


class FlatOptState(NamedTuple):
    """RAdam moments over the flattened parameter vector."""

    mu: jnp.ndarray      # [N] f32 first moment
    nu: jnp.ndarray      # [N] f32 second moment
    count: jnp.ndarray   # scalar int32 update count


class FlatRAdam:
    """Rectified Adam (threshold 5, SGD fallback) over one flat buffer.

    Semantics match the round-2 optax chain exactly —
    ``clip_by_global_norm(clip)`` -> ``scale_by_radam(threshold=5)`` ->
    ``add_decayed_weights(wd)`` -> ``scale_by_learning_rate(lr)`` — which
    itself matches the reference RAdam's update rule (``net_utils.py:
    10-101``).  ``mask`` freezes leaves exactly as ``optax.multi_transform``
    +``set_to_zero`` did: frozen entries see zero gradient (so their moments
    stay zero) and zero update (weight decay included); the clip norm is
    taken over trainable entries only.
    """

    b1, b2, eps, threshold = 0.9, 0.999, 1e-8, 5.0

    def __init__(
        self,
        mask: jnp.ndarray,
        lr: Union[float, Callable[[jnp.ndarray], jnp.ndarray]],
        weight_decay: float,
        clip: float = 0.0,
    ):
        self.mask = mask
        self.lr = lr
        self.weight_decay = weight_decay
        self.clip = clip

    def init(self, p_flat: jnp.ndarray) -> FlatOptState:
        # distinct buffers: mu/nu share a donated TrainState, and donating
        # one physical buffer twice is an XLA execute error
        return FlatOptState(
            mu=jnp.zeros_like(p_flat),
            nu=jnp.zeros_like(p_flat),
            count=jnp.zeros((), jnp.int32),
        )

    def update(
        self, g_flat: jnp.ndarray, state: FlatOptState, p_flat: jnp.ndarray
    ) -> Tuple[jnp.ndarray, FlatOptState]:
        """One step: returns (new params, new state)."""
        b1, b2 = self.b1, self.b2
        m = self.mask.astype(g_flat.dtype)
        g = g_flat * m
        if self.clip > 0:
            gn = jnp.sqrt(jnp.sum(g * g))
            g = g * (self.clip / jnp.maximum(gn, self.clip))
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * g * g
        count = state.count + 1
        t = count.astype(jnp.float32)
        b1t = b1**t
        b2t = b2**t
        mu_hat = mu / (1.0 - b1t)
        nu_hat = nu / (1.0 - b2t)
        ro_inf = 2.0 / (1.0 - b2) - 1.0
        ro = ro_inf - 2.0 * t * b2t / (1.0 - b2t)
        r = jnp.sqrt(
            (ro - 4.0) * (ro - 2.0) * ro_inf
            / ((ro_inf - 4.0) * (ro_inf - 2.0) * ro)
        )
        rect = r * mu_hat / (jnp.sqrt(nu_hat) + self.eps)
        upd = jnp.where(ro >= self.threshold, rect, mu_hat)
        upd = (upd + self.weight_decay * p_flat) * m
        # optax.scale_by_schedule evaluates at the PRE-increment count
        lr = self.lr(t - 1.0) if callable(self.lr) else self.lr
        return p_flat - lr * upd, FlatOptState(mu=mu, nu=nu, count=count)


def _stage_labels(
    params: Params, stage: int, freeze_coarse: bool = False
) -> Params:
    """'train' / 'freeze' labels per leaf for one stage."""

    def fill(tree, label):
        return jax.tree.map(lambda _: label, tree)

    if stage == 0:
        return Params(cam=fill(params.cam, "train"), nerf=fill(params.nerf, "freeze"))
    if stage not in (1, 2):
        raise ValueError(stage)
    cam = fill(params.cam, "train")
    if stage == 2:
        cam = cam._replace(pose_se3="freeze")
    nerf = fill(params.nerf, "train")
    if freeze_coarse:
        # coarse-free stages never backprop into the coarse MLP, but with a
        # "train" label decoupled weight decay `(upd + wd*p)*m` still shrinks
        # it every step (~0.8% over 16 default fine-tune epochs) — and
        # occ_refresh_source='coarse' probes that decaying field.  Freeze it
        # outright so the proposal is bit-stable across coarse-free epochs.
        nerf = nerf._replace(coarse=fill(params.nerf.coarse, "freeze"))
    return Params(cam=cam, nerf=nerf)


def stage_mask(
    params: Params, stage: int, freeze_coarse: bool = False
) -> jnp.ndarray:
    """[N] f32 0/1 trainable mask in ``ravel_pytree(params)`` order."""
    labels = _stage_labels(params, stage, freeze_coarse)
    mask_tree = jax.tree.map(
        lambda p, lbl: jnp.full(jnp.shape(p), 1.0 if lbl == "train" else 0.0,
                                jnp.result_type(p)),
        params, labels,
    )
    flat, _ = ravel_pytree(mask_tree)
    return flat


def build_optimizers(
    cfg: Config,
    params: Params,
    steps_per_epoch: int,
) -> Tuple[Tuple[FlatRAdam, ...], Tuple[FlatOptState, ...]]:
    """The three stage optimizers and their initial states."""
    tc = cfg.train
    s1_steps = max(1, steps_per_epoch * cfg.stages.cam_param_epochs)
    gamma1 = (tc.stage1_lr_floor / tc.stage1_lr) ** (1.0 / s1_steps)

    def lr1(count):
        # optax.exponential_decay(init, transition_steps=1, decay_rate=gamma)
        return tc.stage1_lr * gamma1**count

    lrs = (lr1, tc.stage2_lr, tc.stage3_lr)
    p_flat, _ = ravel_pytree(params)

    opts = []
    states = []
    for stage in range(3):
        # clip in every stage (cfg.train.grad_clip; 0 = off = reference
        # behavior): the perspective divide (CAM_PARAM) and the
        # self-normalized intr term (the NeRF stages) can both spike
        # gradients by orders of magnitude in single steps
        tx = FlatRAdam(
            mask=stage_mask(params, stage, cfg.nerf.coarse_free_at(stage)),
            lr=lrs[stage],
            weight_decay=tc.weight_decay,
            clip=tc.grad_clip,
        )
        opts.append(tx)
        states.append(tx.init(p_flat))
    return tuple(opts), tuple(states)
