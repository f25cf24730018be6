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
import os
from typing import Optional

import jax

# env hints that indicate a launcher/cluster is present (jax.distributed's
# cluster auto-detection reads these, or the TPU runtime provides its own)
_CLUSTER_ENV_HINTS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "OMPI_MCA_orte_hnp_uri",     # OpenMPI
    "SLURM_JOB_ID",              # Slurm
)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX when running with >1 process.

    Safe to call unconditionally: no-ops for single-process runs (no cluster
    env present) and when the runtime has already initialized (e.g. under a
    launcher that calls ``jax.distributed.initialize`` itself).
    """
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _log_topology()
        return
    # auto mode: initialize only when a launcher/cluster environment is
    # detectable — never touch the distributed runtime on plain CLI runs.
    if not any(os.environ.get(k) for k in _CLUSTER_ENV_HINTS):
        return
    try:
        if jax.process_count() > 1:
            return  # already initialized by the runtime
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize()
        _log_topology()
    except Exception as e:
        logging.warning("jax.distributed auto-init failed (continuing single-process): %s", e)


def _log_topology() -> None:
    logging.info(
        "jax.distributed initialized: process %d / %d, %d local devices",
        jax.process_index(), jax.process_count(), jax.local_device_count(),
    )
