"""Linear / bilinear / trilinear resize with exact PyTorch semantics.

The reference mixes `align_corners=True` (DPT fusion upsamples + head resize,
dpt_block.py:231-236, dpt_head.py:81-83) and `align_corners=False` (track-head
logits upsample, sparse_heads.py:645-647; Plucker temporal interp,
blocks.py:36-39). jax.image.resize only implements the half-pixel convention,
so we build explicit per-axis interpolation matrices (static shapes) and apply
them as matmuls — exact, and MXU-friendly on TPU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _interp_indices(n_in: int, n_out: int, align_corners: bool):
    """Per-output (i0, i1, w1) source indices/weight matching
    torch.nn.functional.interpolate's conventions."""
    dst = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = dst * (n_in - 1) / max(n_out - 1, 1) if n_out > 1 else np.zeros_like(dst)
    else:
        src = (dst + 0.5) * (n_in / n_out) - 0.5
        src = np.maximum(src, 0.0)  # torch clamps source index at 0
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = (src - np.floor(src)).astype(np.float32)
    return i0, i1, w1


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix (used where a closed-form
    row/column reduction of the interpolation is wanted, e.g. the track
    head's exact spatial means)."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float32)
    i0, i1, w1 = _interp_indices(n_in, n_out, align_corners)
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), i0] += 1.0 - w1.astype(np.float64)
    m[np.arange(n_out), i1] += w1.astype(np.float64)
    return m.astype(np.float32)


def _interp_axis(
    x: jnp.ndarray, n_out: int, axis: int, align_corners: bool, method: str = "matmul"
) -> jnp.ndarray:
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    if method == "lerp":
        # gather + fused-multiply-add on the VPU (exact fp32 math, same
        # values as the matmul). Elementwise, so XLA fuses it into
        # elementwise consumers — the track head's upsample->softargmax
        # chain runs ~3x faster this way (the MXU matmul below cannot fuse
        # into the softmax loop). Standalone resizes feeding convs are
        # faster on the matmul path; callers pick.
        i0, i1, w1 = _interp_indices(n_in, n_out, align_corners)
        shape = [1] * x.ndim
        shape[axis] = n_out
        w1j = jnp.asarray(w1).reshape(shape)
        x0 = jnp.take(x, jnp.asarray(i0), axis=axis).astype(jnp.float32)
        x1 = jnp.take(x, jnp.asarray(i1), axis=axis).astype(jnp.float32)
        return (x0 * (1.0 - w1j) + x1 * w1j).astype(x.dtype)
    # weights stay fp32 (casting them to a bf16 input's dtype would truncate
    # the interpolation coefficients); the matmul promotes, the result is
    # cast back.
    m = jnp.asarray(_interp_matrix(n_in, n_out, align_corners), dtype=jnp.float32)
    out = jnp.tensordot(
        x.astype(jnp.float32), m, axes=[[axis], [1]], precision=jax.lax.Precision.HIGHEST
    ).astype(x.dtype)
    return jnp.moveaxis(out, -1, axis)


def resize_linear(
    x: jnp.ndarray,
    out_sizes: Sequence[int],
    axes: Sequence[int],
    align_corners: bool = False,
    method: str = "matmul",
) -> jnp.ndarray:
    """Separable linear resize of the given axes to the given sizes."""
    assert len(out_sizes) == len(axes)
    for axis, n_out in zip(axes, out_sizes):
        x = _interp_axis(x, int(n_out), axis, align_corners, method)
    return x


def interpolate_trilinear(
    x: jnp.ndarray, size: Sequence[int], align_corners: bool = False, method: str = "matmul"
) -> jnp.ndarray:
    """x: (..., T, H, W) -> (..., size[0], size[1], size[2]).
    Matches F.interpolate(mode='trilinear')."""
    nd = x.ndim
    return resize_linear(x, size, (nd - 3, nd - 2, nd - 1), align_corners, method)


def interpolate_bilinear(
    x: jnp.ndarray, size: Sequence[int], align_corners: bool = False
) -> jnp.ndarray:
    """x: (..., H, W) -> (..., size[0], size[1])."""
    nd = x.ndim
    return resize_linear(x, size, (nd - 2, nd - 1), align_corners)


def interpolate_scale(
    x: jnp.ndarray,
    scale_factor: Sequence[float],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Scale-factor form over the trailing len(scale_factor) axes.
    Output size floor(in*scale), as torch computes it. (Only the
    align_corners=True path is exercised by the reference configs,
    dpt_block.py:231-236; the False path here uses the computed-output-size
    ratio.)"""
    nd = x.ndim
    k = len(scale_factor)
    sizes = [int(np.floor(x.shape[nd - k + i] * scale_factor[i])) for i in range(k)]
    return resize_linear(x, sizes, tuple(range(nd - k, nd)), align_corners)
