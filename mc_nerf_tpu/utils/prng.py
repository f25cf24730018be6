"""Process-level PRNG implementation selection.

The default JAX PRNG (threefry2x32) computes random bits with a software
block cipher — ~1.4M draws per training step (pixel sampling, z jitter,
three sigma-noise tensors, inverse-CDF uniforms; ref semantics at
``model/mc_nerf.py:327-345, 599-601, 729-731``) all pay for it on the VPU.
The ``rbg`` implementation lowers to XLA's native ``RngBitGenerator``,
which the TPU backend serves with a hardware generator — same statistical
contract (splittable keys, independent streams), different stream values.

Training quality is stream-agnostic (parity with the torch reference is
statistical anyway — SURVEY.md §7 "stochasticity semantics"), so training
entry points opt in via :func:`configure_fast_prng` before creating keys.
Auto mode only switches on TPU: tests and CPU runs keep the default
threefry streams so golden values stay stable.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax


def configure_fast_prng(impl: Optional[str] = None) -> str:
    """Set the process-default PRNG implementation.

    Args:
      impl: ``None`` = auto (``rbg`` iff the default backend is TPU),
        ``"threefry2x32"`` / ``"rbg"`` / ``"unsafe_rbg"`` = explicit.

    Returns:
      the implementation now in effect.

    Must run before the first ``jax.random.PRNGKey`` whose streams matter —
    existing key arrays keep their own impl, so calling late only affects
    keys created afterwards.
    """
    if impl is None:
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    jax.config.update("jax_default_prng_impl", impl)
    logging.info("PRNG implementation: %s", impl)
    return impl
