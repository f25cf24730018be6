"""Checkpoint save/restore (orbax).

Improves on the reference, which writes a ckpt per epoch but can never
*resume* training from one (``model/mc_nerf.py:738-752``; checkpoints are
only read back by demo mode and the validation renderer).  Here the full
train state — parameters, all three optimizer states, and the step cursor —
round-trips, so training is resumable by construction (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import orbax.checkpoint as ocp

from mc_nerf_tpu.train.steps import TrainState


def _manager(
    ckpt_dir: str,
    max_to_keep: Optional[int] = None,
    keep_epochs: Iterable[int] = (),
) -> ocp.CheckpointManager:
    keep = frozenset(keep_epochs)
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            # stage-boundary epochs survive pruning regardless of
            # max_to_keep: they seed demo-by-epoch and mid-protocol A/Bs
            should_keep_fn=(keep.__contains__ if keep else None),
            create=True,
        ),
    )


class Checkpointer:
    """One orbax ``CheckpointManager`` for an :class:`Engine`'s lifetime.

    ``save`` is asynchronous: orbax snapshots the device arrays to host and
    returns, so the next epoch's scan overlaps the disk write (the reference
    blocks its epoch loop on ``torch.save``, ``model/mc_nerf.py:738-752``).
    ``restore``/``latest_epoch`` first drain any in-flight save so a
    train-then-demo process never reads a half-written step.

    ``max_keep`` bounds retention to the newest N epochs (0 = keep every
    epoch, the reference's behavior); epochs in ``keep_epochs`` — the
    engine passes its stage boundaries — are never pruned.
    """

    def __init__(
        self, ckpt_dir: str, max_keep: int = 0,
        keep_epochs: Iterable[int] = (),
    ):
        self._dir = ckpt_dir
        self._max_keep = max_keep if max_keep and max_keep > 0 else None
        self._keep_epochs = tuple(keep_epochs)
        self._mgr: Optional[ocp.CheckpointManager] = None

    def _manager(self) -> ocp.CheckpointManager:
        if self._mgr is None:
            self._mgr = _manager(self._dir, self._max_keep, self._keep_epochs)
        return self._mgr

    def save(self, epoch: int, state: TrainState) -> None:
        """Schedule one checkpoint write (rank-0 only under multi-process)."""
        self._manager().save(epoch, args=ocp.args.StandardSave(state))

    def latest_epoch(self) -> Optional[int]:
        if self._mgr is None and not os.path.isdir(self._dir):
            return None
        mgr = self._manager()
        mgr.wait_until_finished()
        return mgr.latest_step()

    def restore(
        self, template: TrainState, epoch: Optional[int] = None
    ) -> tuple[TrainState, int]:
        mgr = self._manager()
        mgr.wait_until_finished()
        return _restore_with(mgr, self._dir, template, epoch)

    def wait(self) -> None:
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def close(self) -> None:
        if self._mgr is not None:
            self._mgr.wait_until_finished()
            self._mgr.close()
            self._mgr = None


def save_checkpoint(ckpt_dir: str, epoch: int, state: TrainState) -> None:
    """One-shot synchronous save (scripts/tests; the engine uses Checkpointer)."""
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
    result = _restore_with(mgr, ckpt_dir, template, epoch)
    mgr.close()
    return result


def _restore_with(
    mgr: ocp.CheckpointManager,
    ckpt_dir: str,
    template: TrainState,
    epoch: Optional[int],
) -> tuple[TrainState, int]:
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
    return state, step
