"""Functional coarse/fine NeRF MLP.

Architecture mirrors the reference ``CorseFine_NeRF`` (``model/net_block.py:37-78``):
`depth` ReLU layers with a skip-concat of the encoded input at ``skips``, then
two 2-layer heads emitting raw density and SH color coefficients.  The rgb is
``sigmoid(eval_sh(sh, view_dir))`` — evaluated by the renderer so the SH basis
can be computed once per ray instead of once per sample.

Implementation is a plain parameter pytree + pure apply function:
  * params live in fp32; matmuls run in a configurable compute dtype
    (bfloat16 on TPU MXU by default) with fp32 accumulation;
  * all shapes static; the sample axis is flattened into one big matmul
    batch, which is exactly what the MXU wants.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class NerfMLPParams(NamedTuple):
    """Weights for one (coarse or fine) NeRF MLP.

    trunk_w/trunk_b: tuples of [in, width] / [width] arrays, one per layer.
    sigma_*: 2-layer density head (width -> width -> 1).
    sh_*: 2-layer SH head (width -> width -> 3*(deg+1)**2).
    """

    trunk_w: Tuple[jnp.ndarray, ...]
    trunk_b: Tuple[jnp.ndarray, ...]
    sigma_w0: jnp.ndarray
    sigma_b0: jnp.ndarray
    sigma_w1: jnp.ndarray
    sigma_b1: jnp.ndarray
    sh_w0: jnp.ndarray
    sh_b0: jnp.ndarray
    sh_w1: jnp.ndarray
    sh_b1: jnp.ndarray


def _linear_init(key, fan_in: int, fan_out: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b.

    Matches torch ``nn.Linear`` default init (kaiming_uniform(a=sqrt(5)) for
    weights + fan-in-bounded uniform bias), which the reference relies on.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in ** 0.5)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return w, b


def init_nerf_mlp(
    key: jax.Array,
    in_dim: int,
    depth: int,
    width: int,
    skips: Sequence[int],
    sh_dim: int,
) -> NerfMLPParams:
    """Initialize one NeRF MLP (coarse: 4x128 skip@2; fine: 8x256 skip@4)."""
    keys = jax.random.split(key, depth + 4)
    trunk_w, trunk_b = [], []
    for i in range(depth):
        fan_in = in_dim if i == 0 else (width + in_dim if i in skips else width)
        w, b = _linear_init(keys[i], fan_in, width)
        trunk_w.append(w)
        trunk_b.append(b)
    sw0, sb0 = _linear_init(keys[depth], width, width)
    sw1, sb1 = _linear_init(keys[depth + 1], width, 1)
    hw0, hb0 = _linear_init(keys[depth + 2], width, width)
    hw1, hb1 = _linear_init(keys[depth + 3], width, sh_dim)
    return NerfMLPParams(
        tuple(trunk_w), tuple(trunk_b), sw0, sb0, sw1, sb1, hw0, hb0, hw1, hb1
    )


def apply_nerf_mlp(
    params: NerfMLPParams,
    x_enc: jnp.ndarray,
    skips: Sequence[int],
    compute_dtype=jnp.bfloat16,
    sigma_only: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the trunk + heads.

    Args:
      params: fp32 parameter pytree.
      x_enc: [..., in_dim] positionally-encoded points.
      skips: static skip-layer indices.
      compute_dtype: matmul dtype (bf16 on TPU; fp32 exact mode for tests).
      sigma_only: skip the SH head (the eval coarse pass only needs density
        for fine-bin selection — saves ~40% of the coarse FLOPs).

    Returns:
      (sigma_raw [..., 1], sh [..., sh_dim] or None) in fp32.
    """
    x0 = x_enc.astype(compute_dtype)
    h = x0
    for i, (w, b) in enumerate(zip(params.trunk_w, params.trunk_b)):
        if i in skips:
            h = jnp.concatenate([x0, h], axis=-1)
        h = h @ w.astype(compute_dtype) + b.astype(compute_dtype)
        h = jax.nn.relu(h)
    s = jax.nn.relu(h @ params.sigma_w0.astype(compute_dtype) + params.sigma_b0.astype(compute_dtype))
    sigma = s @ params.sigma_w1.astype(compute_dtype) + params.sigma_b1.astype(compute_dtype)
    if sigma_only:
        return sigma.astype(jnp.float32), None
    c = jax.nn.relu(h @ params.sh_w0.astype(compute_dtype) + params.sh_b0.astype(compute_dtype))
    sh = c @ params.sh_w1.astype(compute_dtype) + params.sh_b1.astype(compute_dtype)
    return sigma.astype(jnp.float32), sh.astype(jnp.float32)


def apply_nerf_mlp_t(
    params: NerfMLPParams,
    feat_t: jnp.ndarray,
    skips: Sequence[int],
    compute_dtype=jnp.bfloat16,
    sigma_only: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Trunk + heads over TRANSPOSED features ``feat_t`` [C, P].

    Identical math to :func:`apply_nerf_mlp` on ``feat_t.T``, restructured
    for the TPU layout problem the HLO audit exposed (see
    ``encoding.sincos_encode_t``): the first layer contracts the leading
    channel axis of [C, P] directly (a transposed-LHS ``dot_general`` the
    MXU handles natively), and skip layers split their weight into the
    encode rows and the hidden rows — ``[x0, h] @ W == x0 @ W[:C] +
    h @ W[C:]`` — so the [P, C+W] skip concat never materializes either.
    The feature cotangent stays [C, P], flowing straight into the
    transposed encode's analytic VJP.

    Unlike :func:`apply_nerf_mlp`, the returned ``sh`` keeps the compute
    dtype (its consumer accumulates the SH contraction in fp32 itself).
    """
    ft = feat_t.astype(compute_dtype)
    c_dim = feat_t.shape[0]
    dn = (((0,), (0,)), ((), ()))            # [C,P] x [C,W] -> [P,W]
    h = None
    for i, (w, b) in enumerate(zip(params.trunk_w, params.trunk_b)):
        wc = w.astype(compute_dtype)
        if i == 0:
            acc = jax.lax.dot_general(ft, wc, dn)
        elif i in skips:
            acc = jax.lax.dot_general(ft, wc[:c_dim], dn) + h @ wc[c_dim:]
        else:
            acc = h @ wc
        h = jax.nn.relu(acc + b.astype(compute_dtype))
    s = jax.nn.relu(h @ params.sigma_w0.astype(compute_dtype) + params.sigma_b0.astype(compute_dtype))
    sigma = s @ params.sigma_w1.astype(compute_dtype) + params.sigma_b1.astype(compute_dtype)
    if sigma_only:
        return sigma.astype(jnp.float32), None
    c = jax.nn.relu(h @ params.sh_w0.astype(compute_dtype) + params.sh_b0.astype(compute_dtype))
    sh = c @ params.sh_w1.astype(compute_dtype) + params.sh_b1.astype(compute_dtype)
    # sh stays in the compute dtype: its only consumer is the SH contraction
    # (nerf._shade), which multiplies the bf16-rounded GEMM output against the
    # basis and accumulates in fp32 — the [P, 27] fp32 upcast here only added
    # convert + reduce HBM traffic at train scale (exact fp32 mode unaffected:
    # the dropped cast was a no-op there).
    return sigma.astype(jnp.float32), sh
