"""Multi-process / multi-host initialization.

Replaces ref ``utils/distributed_init.py`` (torchrun env parsing +
``init_process_group('nccl')`` + rank-gated printing):

  * single-controller JAX needs no explicit process group on one host —
    all local devices are visible and collectives ride ICI automatically;
  * multi-host (one process per host, e.g. a v4-8 pod slice) uses
    ``jax.distributed.initialize()``, which picks up the cluster
    environment (coordinator address, process count, process id) from the
    TPU runtime or standard env vars;
  * rank gating comes from ``jax.process_index()``
    (``utils/logging.py::is_main_process``), not print monkey-patching.

The reference's ``--start_device`` GPU-skipping flag is accepted for CLI
parity but meaningless under XLA device enumeration.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX when running with >1 process.

    Safe to call unconditionally: no-ops for single-process runs and when
    the runtime has already initialized (e.g. under a launcher that calls
    ``jax.distributed.initialize`` itself).
    """
    try:
        if jax.process_count() > 1:
            return  # already initialized by the runtime
    except RuntimeError:
        pass
    if coordinator_address is None and num_processes is None:
        # auto mode: only meaningful on multi-host TPU slices where the
        # runtime provides the cluster env; elsewhere this is a no-op
        try:
            jax.distributed.initialize()
            logging.info(
                "jax.distributed initialized: process %d / %d, %d local devices",
                jax.process_index(), jax.process_count(), jax.local_device_count(),
            )
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
