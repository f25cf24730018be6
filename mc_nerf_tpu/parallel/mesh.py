"""Mesh construction and sharding helpers.

The parallelism story (SURVEY.md §2.3): the workload is data-parallel over
rays/images — the only axis the reference parallelizes (torch DDP,
``utils/distributed_init.py``).  Here that is a 1-D ``jax.sharding.Mesh``
over axis ``"data"``:

  * parameters + resident scene tensors: replicated;
  * the per-step image/ray batch: sharded on its leading axis;
  * gradients: reduced by XLA-inserted ``psum`` over ICI when the jitted
    loss averages over the sharded axis — no NCCL, no explicit all-reduce,
    no ``find_unused_parameters`` hacks.

TP/PP are intentionally out of scope (MLPs are <= 256 wide; SURVEY §2.3);
the sample axis stays on-device (its analogue of sequence parallelism is
handled inside the fused render kernel instead).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis sharded over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh]):
    """Inside jit: constrain a [B, ...] array's leading axis to the mesh."""
    if mesh is None or mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    )
