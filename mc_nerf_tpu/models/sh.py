"""Real spherical-harmonic evaluation, degrees 0-4.

Same basis and coefficient convention as the reference (`model/net_utils.py:103-191`),
so SH-coefficient heads are interchangeable.  Vectorized over arbitrary batch
dims; jit/vmap friendly; no Python branching on traced values (degree is
static).
"""

from __future__ import annotations

import jax.numpy as jnp

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values at unit directions.

    Args:
      deg: static SH degree in [0, 4].
      dirs: [..., 3] unit directions.

    Returns:
      [..., (deg+1)**2] basis values.  ``eval_sh`` is then a contraction of
      coefficients with this basis; exposing the basis separately lets the
      renderer evaluate it once per ray and reuse it across samples.
    """
    assert 0 <= deg <= 4
    out = [jnp.full(dirs.shape[:-1], _C0, dtype=dirs.dtype)]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        out += [-_C1 * y, _C1 * z, -_C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            out += [
                _C2[0] * xy,
                _C2[1] * yz,
                _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz,
                _C2[4] * (xx - yy),
            ]
            if deg > 2:
                out += [
                    _C3[0] * y * (3 * xx - yy),
                    _C3[1] * xy * z,
                    _C3[2] * y * (4 * zz - xx - yy),
                    _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    _C3[4] * x * (4 * zz - xx - yy),
                    _C3[5] * z * (xx - yy),
                    _C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    out += [
                        _C4[0] * xy * (xx - yy),
                        _C4[1] * yz * (3 * xx - yy),
                        _C4[2] * xy * (7 * zz - 1),
                        _C4[3] * yz * (7 * zz - 3),
                        _C4[4] * (zz * (35 * zz - 30) + 3),
                        _C4[5] * xz * (7 * zz - 3),
                        _C4[6] * (xx - yy) * (7 * zz - 1),
                        _C4[7] * xz * (xx - 3 * yy),
                        _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH coefficients at unit directions.

    Args:
      deg: static SH degree in [0, 4].
      sh: [..., C, (deg+1)**2] coefficients (C color channels).
      dirs: [..., 3] unit directions, broadcastable against sh's batch dims.

    Returns:
      [..., C] evaluated colors (pre-sigmoid).
    """
    assert (deg + 1) ** 2 == sh.shape[-1]
    basis = sh_basis(deg, dirs)
    return jnp.einsum("...cb,...b->...c", sh, basis)
