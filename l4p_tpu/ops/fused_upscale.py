"""Fused SAM upscale + hypernetwork contraction as one Pallas TPU kernel.

The mask decoder's packed-offset upscale (models/sam.py, replacing the
reference ConvTranspose3d chain at sam/mask_decoder.py:130-140) is
HBM-bound in XLA: deconv1's output (N, P, k1*d1) and deconv2's output
(N, P, k1, k2*d2) are ~1.5 GB / ~2.9 GB at N=64 and must round-trip to HBM
between the matmuls and the LayerNorm/GELU (XLA cannot fuse across matmul
boundaries). This kernel keeps the whole chain

    x1 = LN(gelu? no: LN) -> gelu -> x2 = gelu(x1 @ W2 + b2) -> out = x2 @ H

in VMEM per (query, token-block) tile: only the original tokens (N, P, C)
are read and only the tiny contracted logits (N, k1, 12, P) are written —
~4.4 GB of HBM traffic removed per tracked window at N=64.

Weight layout trick: deconv offsets k1 (kernel==stride => one matmul per
offset) iterate as a leading axis of W1; within the second deconv, each k2
offset's d2-column group is padded to a 128-lane multiple, and the
hypernetwork MLP outputs are packed into a block-diagonal H of shape
(d2_groups * d2_pad, k2 * M) so the per-k1 contraction is ONE matmul that
produces every (k2, mask-token) pair at once. Zero-padding is exact: padded
W/b columns are zero, gelu(0) = 0, and padded H rows are zero.

Differentiable via custom_vjp: forward runs the kernel, backward re-derives
gradients through the identical XLA reference implementation (same
flash-style recompute pattern as ops/flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 rational erf, max abs error 1.5e-7 —
    Pallas TPU has no erf/erfc lowering, and 1.5e-7 is far below bf16
    resolution (~1e-2 at unit scale), so the kernel stays bit-comparable to
    the XLA exact-erf path at the model's precision."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel(x):
    """Exact-form GELU on the polynomial erf (kernel-side only)."""
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _kernel(src_ref, w1_ref, b1_ref, lnw_ref, lnb_ref, w2_ref, b2_ref, h_ref,
            out_ref, *, d1: int, d1p: int, eps: float):
    """One (query, k1-offset, token-block) tile: offset matmul -> LN ->
    gelu -> grouped deconv2 matmul -> gelu -> block-diagonal hypernet
    matmul. k1 lives in the grid (not an unrolled body loop) to keep the
    Mosaic program small."""
    x0 = src_ref[0]  # (BP, C) bf16
    h_mat = h_ref[0]  # (G, KM) bf16 block-diagonal hypernet
    mask = (lax.broadcasted_iota(jnp.int32, (1, d1p), 1) < d1).astype(jnp.float32)
    lnw = lnw_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)
    x1 = jnp.dot(x0, w1_ref[0], preferred_element_type=jnp.float32)  # (BP, d1p)
    x1 = x1 + b1_ref[0, 0].astype(jnp.float32)
    # LayerNorm over the d1 valid columns (padded cols are exactly zero)
    mean = jnp.sum(x1 * mask, axis=-1, keepdims=True) / d1
    var = jnp.sum(jnp.square(x1 - mean) * mask, axis=-1, keepdims=True) / d1
    y = (x1 - mean) * lax.rsqrt(var + eps)
    y = y * lnw + lnb  # padded cols: lnw/lnb zero => y = 0
    y = _gelu_kernel(y).astype(x0.dtype)
    x2 = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)  # (BP, G)
    x2 = _gelu_kernel(x2 + b2).astype(x0.dtype)
    out_k = jnp.dot(x2, h_mat, preferred_element_type=jnp.float32)  # (BP, KM)
    out_ref[0, 0] = out_k.T  # (KM, BP)


def _prep_weights(w1, b1, lnw, lnb, w2, b2, dtype):
    """Rearrange torch-layout deconv weights into the kernel's padded layout.

    w1: (C, d1, kt, kh, kw) -> (k1, C, d1p); w2: (d1, d2, lt, lh, lw) ->
    (d1p, k2 * d2p) with per-k2 column groups. All padding zero."""
    c, d1 = w1.shape[:2]
    k1 = w1.shape[2] * w1.shape[3] * w1.shape[4]
    d2, k2 = w2.shape[1], w2.shape[2] * w2.shape[3] * w2.shape[4]
    d1p, d2p = _pad_to(d1, 128), _pad_to(d2, 128)

    w1r = w1.reshape(c, d1, k1).transpose(2, 0, 1)  # (k1, C, d1)
    w1p = jnp.zeros((k1, c, d1p), dtype).at[:, :, :d1].set(w1r.astype(dtype))
    # (k1, 1, d1p): Pallas wants per-k blocks whose trailing two dims match
    # the array's, so the bias carries an explicit singleton row
    b1p = jnp.zeros((k1, 1, d1p), dtype).at[:, 0, :d1].set(b1.astype(dtype))
    lnwp = jnp.zeros((d1p,), jnp.float32).at[:d1].set(lnw.astype(jnp.float32))
    lnbp = jnp.zeros((d1p,), jnp.float32).at[:d1].set(lnb.astype(jnp.float32))

    w2r = w2.reshape(d1, d2, k2).transpose(0, 2, 1)  # (d1, k2, d2)
    w2p = jnp.zeros((d1p, k2, d2p), dtype).at[:d1, :, :d2].set(w2r.astype(dtype))
    w2p = w2p.reshape(d1p, k2 * d2p)
    b2p = jnp.zeros((k2, d2p), dtype).at[:, :d2].set(b2.astype(dtype)).reshape(-1)
    return w1p, b1p, lnwp, lnbp, w2p, b2p, (k1, k2, d1, d1p, d2, d2p)


def _prep_hyper(hyper_nmd, k2: int, d2: int, d2p: int, dtype):
    """(N, M, d2) -> block-diagonal (N, k2*d2p, k2*M): H[n, j*d2p+d, j*M+m]
    = hyper[n, m, d]. Cross-offset terms are zero, so one matmul contracts
    every (k2 offset, mask token) pair."""
    n, m = hyper_nmd.shape[:2]
    h = jnp.zeros((n, k2, d2p, k2, m), dtype)
    ht = hyper_nmd.transpose(0, 2, 1).astype(dtype)  # (N, d2, M)
    for j in range(k2):
        h = h.at[:, j, :d2, j, :].set(ht)
    return h.reshape(n, k2 * d2p, k2 * m)


def _upscale_xla(src, w1, b1, lnw, lnb, w2, b2, hyper_nmd):
    """XLA reference of the fused chain -> (N, M, P, k1, k2) fp32. Identical
    math to the packed-offset path this kernel replaces (models/sam.py)."""
    from l4p_tpu.ops.conv import layer_norm

    n, p, c = src.shape
    d1, kt, kh, kw = w1.shape[1:]
    d2, lt, lh, lw = w2.shape[1:]
    k1, k2 = kt * kh * kw, lt * lh * lw
    m = hyper_nmd.shape[1]
    wm1 = w1.transpose(0, 2, 3, 4, 1).reshape(c, k1 * d1).astype(src.dtype)
    x = jnp.einsum("npc,ck->npk", src, wm1)
    x = x + jnp.tile(b1, k1).astype(x.dtype)
    x = x.reshape(n, p, k1, d1)
    x = layer_norm(x, lnw, lnb, eps=1e-6)
    x = _gelu(x)
    wm2 = w2.transpose(0, 2, 3, 4, 1).reshape(d1, k2 * d2).astype(x.dtype)
    x = jnp.einsum("npkc,cl->npkl", x, wm2)
    x = _gelu(x + jnp.tile(b2, k2).astype(x.dtype))
    x = x.reshape(n, p, k1, k2, d2)
    return jnp.einsum("npkld,nmd->nmpkl", x, hyper_nmd.astype(x.dtype),
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_upscale_hypernet(src, w1, b1, lnw, lnb, w2, b2, hyper_nmd,
                           interpret: bool = False):
    """(N, P, C) tokens -> (N, M, P, k1, k2) fp32 packed logits."""
    return _fused_impl(src, w1, b1, lnw, lnb, w2, b2, hyper_nmd, interpret)


def _fused_impl(src, w1, b1, lnw, lnb, w2, b2, hyper_nmd, interpret):
    n, p, c = src.shape
    m = hyper_nmd.shape[1]
    dtype = src.dtype
    w1p, b1p, lnwp, lnbp, w2p, b2p, dims = _prep_weights(w1, b1, lnw, lnb, w2, b2, dtype)
    k1, k2, d1, d1p, d2, d2p = dims
    h_mat = _prep_hyper(hyper_nmd, k2, d2, d2p, dtype)
    km = k2 * m

    bp = next((b for b in (512, 256, 128) if p % b == 0), p)
    # grid order (n, p-blocks, k1): the innermost k1 sweep reuses the
    # resident src block; only the ~1 MB w1[k]/b1[k] slices re-stream
    grid = (n, p // bp, k1)
    out = pl.pallas_call(
        functools.partial(_kernel, d1=d1, d1p=d1p, eps=1e-6),
        out_shape=jax.ShapeDtypeStruct((n, k1, km, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda i, j, k: (i, j, 0)),
            pl.BlockSpec((1, c, d1p), lambda i, j, k: (k, 0, 0)),
            pl.BlockSpec((1, 1, d1p), lambda i, j, k: (k, 0, 0)),
            pl.BlockSpec((d1p,), lambda i, j, k: (0,)),
            pl.BlockSpec((d1p,), lambda i, j, k: (0,)),
            pl.BlockSpec((d1p, k2 * d2p), lambda i, j, k: (0, 0)),
            pl.BlockSpec((k2 * d2p,), lambda i, j, k: (0,)),
            pl.BlockSpec((1, k2 * d2p, km), lambda i, j, k: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, km, bp), lambda i, j, k: (i, k, 0, j)),
        interpret=interpret,
    )(src, w1p, b1p, lnwp, lnbp, w2p, b2p, h_mat)
    # (N, k1, k2*M, P) -> (N, M, P, k1, k2); column order inside km is
    # (j, m) j-major by construction of H
    out = out.reshape(n, k1, k2, m, p)
    return out.transpose(0, 3, 4, 1, 2)


def _fused_fwd(src, w1, b1, lnw, lnb, w2, b2, hyper_nmd, interpret):
    out = _fused_impl(src, w1, b1, lnw, lnb, w2, b2, hyper_nmd, interpret)
    return out, (src, w1, b1, lnw, lnb, w2, b2, hyper_nmd)


def _fused_bwd(interpret, res, g):
    # flash-style recompute backward: differentiate the XLA reference
    _, vjp = jax.vjp(_upscale_xla, *res)
    return vjp(g)


fused_upscale_hypernet.defvjp(_fused_fwd, _fused_bwd)


def fused_upscale_available(src: jnp.ndarray, w1: jnp.ndarray) -> bool:
    """Kernel applies on a single TPU device with lane-friendly dims (the
    padding scheme handles any d1/d2; tiny CPU test configs and sharded
    meshes take the XLA path)."""
    from l4p_tpu.ops.flash_attention import _on_tpu, _single_device

    n, p, c = src.shape
    return (
        _on_tpu()
        and _single_device()
        and (p % 128 == 0 or p <= 512)
        and c >= 128
    )
