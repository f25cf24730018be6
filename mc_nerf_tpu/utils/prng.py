"""Process-level PRNG implementation selection.

The default JAX PRNG (threefry2x32) computes random bits with a software
block cipher — ~1.4M draws per training step (pixel sampling, z jitter,
three sigma-noise tensors, inverse-CDF uniforms; ref semantics at
``model/mc_nerf.py:327-345, 599-601, 729-731``) all pay for it on the VPU.
The ``rbg`` implementation lowers to XLA's native ``RngBitGenerator``.

Measured on a v5e at the reference workload: **a wash** — 243.6k (rbg) vs
245.0k (threefry) rays/s, within run noise (BASELINE.md) — XLA already
keeps the PRNG off the critical path.  The default is therefore to leave
the process default untouched (constructing an Engine must not mutate
global state); the knob exists for explicit experiments on other
topologies.  Training quality is stream-agnostic either way (parity with
the torch reference is statistical — SURVEY.md §7).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax


def configure_fast_prng(impl: Optional[str] = None) -> str:
    """Select the PRNG implementation for subsequently created keys.

    Args:
      impl: ``None`` (default) = no-op, keep the process default — Engine
        construction stays free of global side effects;
        ``"threefry2x32"`` / ``"rbg"`` / ``"unsafe_rbg"`` = set the
        process-default implementation explicitly.

    Returns:
      the implementation now in effect.

    An explicit impl is process-global: run it before the first
    ``jax.random.PRNGKey`` whose streams matter.  Existing key arrays keep
    the impl they were created with, so engines constructed before the
    switch are unaffected; the reproducibility hazard of mixing explicit
    impls across engines in one process is on the caller.
    """
    if impl is None:
        return jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", impl)
    logging.info("PRNG implementation: %s", impl)
    return impl
