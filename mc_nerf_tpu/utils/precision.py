"""Precision-pinned linear algebra for geometry code.

XLA backends (TPU MXU; and this image's CPU emulation) default to reduced
matmul precision.  That is the *right* default for the NeRF MLP hot path but
wrong for camera geometry: se(3) exponentials, pose inverses, and projection
chains need full fp32.  All geometry modules route matmuls through these
helpers; model code opts into bf16 explicitly instead.
"""

from functools import partial

import jax
import jax.numpy as jnp

# full-precision matmul / einsum for geometry math
hmatmul = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
heinsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
