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
    # TPU runtimes (including this image's axon plugin) set
    # TPU_WORKER_HOSTNAMES even for a single worker, so a one-entry list is
    # NOT a cluster hint; everything else is.
    hosts = [
        h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if h.strip()
    ]
    other_hints = any(
        os.environ.get(k)
        for k in _CLUSTER_ENV_HINTS
        if k != "TPU_WORKER_HOSTNAMES"
    )
    if len(hosts) <= 1 and not other_hints:
        return
    # initialize() must run BEFORE any backend-touching call: probing
    # jax.process_count() first would itself initialize the XLA backend and
    # guarantee the subsequent initialize() fails — silently degrading a
    # real multi-host launch to N independent single-process runs.
    try:
        jax.distributed.initialize()
        _log_topology()
        return
    except Exception as e:
        err = e
    # Failure can mean a launcher/runtime already initialized distributed
    # (calling twice raises) — in that case the topology is already live.
    try:
        if jax.process_count() > 1:
            _log_topology()
            return
    except Exception:
        pass
    if len(hosts) > 1:
        # A multi-entry TPU_WORKER_HOSTNAMES is a *strong* multi-host signal:
        # continuing here would silently degrade a real pod-slice launch to N
        # independent single-process runs (each training alone and
        # overwriting the others' checkpoints).  Fail loudly instead.
        raise RuntimeError(
            f"jax.distributed auto-init failed on a {len(hosts)}-host cluster "
            f"(TPU_WORKER_HOSTNAMES={os.environ.get('TPU_WORKER_HOSTNAMES')!r}) "
            "and the process topology is still single-process — refusing to "
            "degrade a multi-host launch to independent single-process runs"
        ) from err
    logging.warning(
        "jax.distributed auto-init failed (continuing single-process): %s", err
    )


def _log_topology() -> None:
    logging.info(
        "jax.distributed initialized: process %d / %d, %d local devices",
        jax.process_index(), jax.process_count(), jax.local_device_count(),
    )
