"""TensorBoard scalar/image writing.

The reference wires a ``SummaryWriter`` into its loss module but never
writes a single scalar (``utils/tensorboard_init.py:21`` ->
``model/loss.py:10-11``; no ``add_scalar`` call exists).  Here the writer is
actually used: per-epoch losses, LRs, camera errors, and validation metrics.
Falls back to a JSONL scalar log when no tensorboard backend is importable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional


class ScalarWriter:
    """SummaryWriter facade with a JSONL fallback."""

    def __init__(self, log_dir: str, delete_old: bool = False, enabled: bool = True):
        self.enabled = enabled
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        if delete_old and os.path.isdir(log_dir):
            shutil.rmtree(log_dir, ignore_errors=True)
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self.enabled:
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        elif self._jsonl is not None:
            self._jsonl.write(
                json.dumps(
                    {"tag": tag, "value": float(value), "step": int(step), "t": time.time()}
                )
                + "\n"
            )
            self._jsonl.flush()

    def image(self, tag: str, img_hwc, step: int) -> None:
        if self.enabled and self._tb is not None:
            self._tb.add_image(tag, img_hwc, step, dataformats="HWC")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
