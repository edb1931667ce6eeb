"""Conv3d / ConvTranspose3d / Linear / LayerNorm primitives.

Thin wrappers over lax.conv_general_dilated with torch weight conventions so
converted checkpoints drop straight in. Layout NCDHW / OIDHW (XLA re-lays-out
for the MXU internally).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr3 = Union[int, Sequence[int]]


def _triple(v: IntOr3):
    if isinstance(v, int):
        return (v, v, v)
    return tuple(int(x) for x in v)


def conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
) -> jnp.ndarray:
    """x: (B, Cin, D, H, W); w: (Cout, Cin, kD, kH, kW) (torch layout)."""
    s = _triple(stride)
    p = _triple(padding)
    # no preferred_element_type: the TPU conv accumulates fp32 internally
    # regardless, and a forced-fp32 output makes the autodiff transpose rule
    # mix bf16 operands with fp32 cotangents (lax rejects that). fp32 inputs
    # are unaffected.
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=s,
        padding=[(pi, pi) for pi in p],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None, None].astype(out.dtype)
    return out.astype(x.dtype)


def conv_transpose3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
) -> jnp.ndarray:
    """Matches torch.nn.ConvTranspose3d. w: (Cin, Cout, kD, kH, kW) (torch
    layout). Implemented as an input-dilated forward conv with a spatially
    flipped, IO-swapped kernel. (A kernel==stride einsum formulation was
    measured SLOWER than this lowering on TPU at the DPT/SAM shapes — the
    interleave transpose dominates; the SAM upscale instead uses a packed
    offsets layout, models/sam.py.)"""
    s = _triple(stride)
    p = _triple(padding)
    k = w.shape[2:]
    w_f = jnp.flip(w, axis=(2, 3, 4)).swapaxes(0, 1).astype(x.dtype)  # (Cout, Cin, kD, kH, kW)
    pad = [(k[i] - 1 - p[i], k[i] - 1 - p[i]) for i in range(3)]
    out = lax.conv_general_dilated(
        x,
        w_f,
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None, None].astype(out.dtype)
    return out.astype(x.dtype)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: (..., in); w: (out, in) (torch layout)."""
    out = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6, axis: int = -1
) -> jnp.ndarray:
    """LayerNorm over `axis` with fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axis, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if axis in (-1, x.ndim - 1):
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    else:
        shape = [1] * x.ndim
        shape[axis] = x.shape[axis]
        y = y * weight.reshape(shape).astype(jnp.float32) + bias.reshape(shape).astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU. fp32+ uses the exact erf form (torch.nn.GELU default,
    reference modeling_finetune.py:51-69) so parity tests and goldens are
    bit-stable. The bf16 lane uses the tanh approximation: its global max
    abs error vs exact is 4.7e-4 (measured over [-12, 12]) — an order of
    magnitude below bf16 rounding at the same magnitudes — while the exact
    erf's deep VPU chain stalls the fc1-matmul epilogue in-graph (measured
    47.6 -> 41.7 ms on one giant encoder window on v5e,
    scripts/exp_encoder_gelu.py; standalone the two are equal, the cost
    only appears fused into the matmul). Same dtype policy as the
    polynomial erf inside ops/fused_upscale.py."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)
