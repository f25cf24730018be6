"""Checkpoint save/restore (orbax).

Improves on the reference, which writes a ckpt per epoch but can never
*resume* training from one (``model/mc_nerf.py:738-752``; checkpoints are
only read back by demo mode and the validation renderer).  Here the full
train state — parameters, all three optimizer states, and the step cursor —
round-trips, so training is resumable by construction (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from mc_nerf_tpu.train.steps import TrainState


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, epoch: int, state: TrainState) -> None:
    """Write one checkpoint per epoch (rank-0 only under multi-process)."""
    mgr = _manager(ckpt_dir)
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def _fill_from_raw(template, raw):
    """Rebuild ``template``'s pytree (NamedTuples by field NAME) from the
    raw nested-dict layout orbax restores without a target structure —
    immune to dict-key-ordering traps."""
    if hasattr(template, "_fields"):
        return type(template)(
            **{f: _fill_from_raw(getattr(template, f), raw[f])
               for f in template._fields}
        )
    if isinstance(template, (list, tuple)):
        return type(template)(
            _fill_from_raw(t, r) for t, r in zip(template, raw)
        )
    return jax.numpy.asarray(raw)


def restore_checkpoint(
    ckpt_dir: str, template: TrainState, epoch: Optional[int] = None
) -> tuple[TrainState, int]:
    """Restore into the shape/dtype structure of ``template``.

    Falls back to a params+step-only restore (optimizer states re-initialized
    from the template) when the stored optimizer-state structure does not
    match — e.g. checkpoints written before the round-3 flat-buffer RAdam
    (``train/optim.py``).  Stage boundaries start optimizers fresh anyway, so
    a boundary checkpoint (the common seed case) loses nothing; a mid-stage
    resume through the fallback restarts that stage's moments and logs it.

    Returns (state, epoch_restored).
    """
    mgr = _manager(ckpt_dir)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    try:
        state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    except Exception:
        import logging

        raw = mgr.restore(step)
        state = TrainState(
            params=_fill_from_raw(template.params, raw["params"]),
            opt_states=template.opt_states,
            step=jax.numpy.asarray(raw["step"]),
        )
        logging.warning(
            "checkpoint %s/%s: optimizer-state structure mismatch — restored "
            "parameters + step only, optimizer states re-initialized",
            ckpt_dir, step,
        )
    mgr.close()
    return state, step
