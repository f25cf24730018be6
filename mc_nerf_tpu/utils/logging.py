"""Logging setup: console + optional timestamped file log.

Replaces ref ``utils/log_init.py`` (and fixes its path bug: the reference
creates ``results/log`` but writes to ``log/`` — ``log_init.py:15-21``; we
create and write the same directory).  The reference's rank-0-only print
monkey-patching (``utils/distributed_init.py:36-55``) is unnecessary under
JAX's single-controller model: ``jax.process_index() == 0`` gating is
provided for multi-process runs.
"""

from __future__ import annotations

import logging
import os
import time

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_logging(log_dir: str | None = None, to_file: bool = False) -> None:
    """Configure the root logger; optionally tee to <log_dir>/<time>.log."""
    handlers = [logging.StreamHandler()]
    if to_file and log_dir and is_main_process():
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        handlers.append(logging.FileHandler(os.path.join(log_dir, f"{stamp}.log")))
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(levelname).1s] %(message)s",
        datefmt="%H:%M:%S",
        handlers=handlers,
        force=True,
    )
    if not is_main_process():
        logging.getLogger().setLevel(logging.WARNING)
    # orbax emits dozens of INFO lines per checkpoint save, drowning the
    # training log; keep its warnings only
    for noisy in ("orbax", "orbax.checkpoint", "absl"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def format_table(headers, rows) -> str:
    """Minimal aligned text table (the reference uses prettytable for its
    per-epoch camera-error report, ``model/mc_nerf.py:51, 399-407``)."""
    cols = [[str(h)] + [str(r[i]) for r in rows] for i, h in enumerate(headers)]
    widths = [max(len(c) for c in col) for col in cols]
    def fmt_row(cells):
        return "| " + " | ".join(str(c).rjust(w) for c, w in zip(cells, widths)) + " |"
    sep = "+-" + "-+-".join("-" * w for w in widths) + "-+"
    lines = [sep, fmt_row(headers), sep]
    lines += [fmt_row(r) for r in rows]
    lines.append(sep)
    return "\n".join(lines)
