"""Fused SAM upscale + hypernetwork contraction as one Pallas TPU kernel.

The mask decoder's packed-offset upscale (models/sam.py, replacing the
reference ConvTranspose3d chain at sam/mask_decoder.py:130-140) is
HBM-bound in XLA: deconv1's output (N, P, k1*d1) and deconv2's output
(N, P, k1, k2*d2) are ~1.5 GB / ~2.9 GB at N=64 and must round-trip to HBM
between the matmuls and the LayerNorm/GELU (XLA cannot fuse across matmul
boundaries). This kernel keeps the whole chain

    x1 = src @ W1[k] -> LN -> gelu -> x2 = gelu(x1 @ W2 + b2) -> out = x2 @ H

in VMEM per (query, token-block) tile: only the original tokens (N, P, C)
are read and only the tiny contracted logits (N, k1, k2*M, P) are written.

Weight layout: the k1 deconv1 offsets (kernel==stride => one matmul per
offset) are packed side-by-side in ONE resident (C, k1*d1p) block and the
kernel loops the offsets INSIDE one grid step — the first version of this
kernel iterated k1 in the grid instead, which re-streamed the ~1 MB W1
slice on every step (~4.4 GB of weight traffic per window at N=128,
measured as the dominant cost of the 42 ms kernel). Within deconv2, the k2
offset column groups are packed CONTIGUOUSLY at their true width d2 and
only the total is lane-padded (k2*d2 -> kk2): per-group 128-padding (the
first version) inflated the second matmul's FLOPs by 45% at d2=176. The
hypernetwork MLP outputs are packed into a block-diagonal H of shape
(kk2, k2*M) so the per-offset contraction is ONE matmul that produces
every (k2, mask-token) pair at once. Zero-padding is exact: padded W/b
columns are zero, gelu(0) = 0, and padded H rows are zero.

When the resident W1 block would not fit VMEM (fp32 inputs), the offset
axis is split across a grid dimension (`ksplit`), trading one extra pass
over the tokens per split for the smaller weight block.

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


# minimax fit of erf(x)/x as a degree-7 polynomial in x^2 on (0, 3];
# outside [-3, 3] erf is snapped to +-1 (exact within 2.2e-5 there).
# max abs erf error 6.2e-4 -> max abs GELU error ~1.3e-3.
_ERF_P7 = (
    1.1283168401705774, -0.37512386745578974, 0.11015570060511803,
    -0.024060275695193943, 0.00371411257654781, -0.0003752059410900838,
    2.1871300708395912e-05, -5.515022005715491e-07,
)


def _gelu_fast(x):
    """GELU on a division/exp-free polynomial erf. The VPU cost of the exact
    rational erf is dominated by its exp and reciprocal (measured 12.6 ms of
    the N=128 giant kernel body, dropping to 3.5 ms with this form —
    scripts/exp_upscale_ablate.py). Max abs error ~1.3e-3 — an order of
    magnitude below bf16 rounding at the same magnitudes (8e-3 at |x|=1.5),
    so this form is reserved for bf16 inputs; fp32 lanes keep the exact
    erf."""
    z = x * 0.7071067811865476
    u = jnp.minimum(z * z, 9.0)
    acc = jnp.full_like(u, _ERF_P7[-1])
    for c in _ERF_P7[-2::-1]:
        acc = acc * u + c
    e = jnp.clip(z, -3.0, 3.0) * acc
    e = jnp.where(z > 3.0, 1.0, jnp.where(z < -3.0, -1.0, e))
    return 0.5 * x * (1.0 + e)


def _kernel(src_ref, w1_ref, b1_ref, lnw_ref, lnb_ref, w2_ref, b2_ref, h_ref,
            out_ref, *, d1: int, d1p: int, kres: int, eps: float, fast: bool):
    """One (query, k1-split, token-block) tile: for each resident deconv1
    offset: offset matmul -> LN -> gelu -> packed deconv2 matmul -> gelu ->
    block-diagonal hypernet matmul.

    `fast` (bf16 inputs): polynomial GELU (_gelu_fast), one-pass LN moments
    (E[x^2]-E[x]^2 — exact in exact arithmetic; its fp32 cancellation noise
    is far below bf16 rounding), and the hypernet contraction in the
    (KM, kk2) x (BP, kk2)^T orientation whose output lands in the out
    layout with no in-kernel transpose. fp32 inputs keep the exact erf and
    two-pass moments so the fp32 path stays within 2e-5 of the XLA chain."""
    x0 = src_ref[0]  # (BP, C)
    h_mat = h_ref[0]  # fast: (KM, kk2); else (kk2, KM)
    w2 = w2_ref[:]  # (d1p, kk2)
    mask = (lax.broadcasted_iota(jnp.int32, (1, d1p), 1) < d1).astype(jnp.float32)
    lnw = lnw_ref[:].astype(jnp.float32)
    lnb = lnb_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)
    gelu_fn = _gelu_fast if fast else _gelu_kernel
    for k in range(kres):  # static unroll over the resident offsets
        w1k = w1_ref[:, k * d1p:(k + 1) * d1p]  # (C, d1p)
        x1 = jnp.dot(x0, w1k, preferred_element_type=jnp.float32)  # (BP, d1p)
        x1 = x1 + b1_ref[0, k * d1p:(k + 1) * d1p].astype(jnp.float32)
        # LayerNorm over the d1 valid columns (padded cols are exactly zero)
        if fast:
            mean = jnp.sum(x1 * mask, axis=-1, keepdims=True) / d1
            var = jnp.sum(jnp.square(x1) * mask, axis=-1, keepdims=True) / d1
            var = var - jnp.square(mean)
        else:
            mean = jnp.sum(x1 * mask, axis=-1, keepdims=True) / d1
            var = jnp.sum(jnp.square(x1 - mean) * mask, axis=-1, keepdims=True) / d1
        y = (x1 - mean) * lax.rsqrt(var + eps)
        y = y * lnw + lnb  # padded cols: lnw/lnb zero => y = 0
        y = gelu_fn(y).astype(x0.dtype)
        x2 = jnp.dot(y, w2, preferred_element_type=jnp.float32)  # (BP, kk2)
        x2 = gelu_fn(x2 + b2).astype(x0.dtype)
        if fast:
            out_ref[0, k] = lax.dot_general(
                h_mat, x2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (KM, BP)
        else:
            out_k = jnp.dot(x2, h_mat, preferred_element_type=jnp.float32)
            out_ref[0, k] = out_k.T  # (KM, BP)


def _prep_weights(w1, b1, lnw, lnb, w2, b2, dtype):
    """Rearrange torch-layout deconv weights into the kernel's packed layout.

    w1: (C, d1, kt, kh, kw) -> (C, k1 * d1p) offsets side-by-side;
    w2: (d1, d2, lt, lh, lw) -> (d1p, kk2) with the k2 column groups packed
    contiguously at width d2 and only the total lane-padded. All padding
    zero."""
    c, d1 = w1.shape[:2]
    k1 = w1.shape[2] * w1.shape[3] * w1.shape[4]
    d2, k2 = w2.shape[1], w2.shape[2] * w2.shape[3] * w2.shape[4]
    d1p = _pad_to(d1, 128)
    kk2 = _pad_to(k2 * d2, 128)

    w1r = w1.reshape(c, d1, k1).transpose(2, 0, 1)  # (k1, C, d1)
    w1p = jnp.zeros((k1, c, d1p), dtype).at[:, :, :d1].set(w1r.astype(dtype))
    w1p = w1p.transpose(1, 0, 2).reshape(c, k1 * d1p)
    b1p = jnp.zeros((k1, d1p), dtype).at[:, :d1].set(
        jnp.broadcast_to(b1.astype(dtype), (k1, d1))
    ).reshape(1, k1 * d1p)
    lnwp = jnp.zeros((d1p,), jnp.float32).at[:d1].set(lnw.astype(jnp.float32))
    lnbp = jnp.zeros((d1p,), jnp.float32).at[:d1].set(lnb.astype(jnp.float32))

    w2r = w2.reshape(d1, d2, k2).transpose(0, 2, 1).reshape(d1, k2 * d2)
    w2p = jnp.zeros((d1p, kk2), dtype).at[:d1, : k2 * d2].set(w2r.astype(dtype))
    b2p = jnp.zeros((kk2,), dtype).at[: k2 * d2].set(
        jnp.broadcast_to(b2.astype(dtype)[None], (k2, d2)).reshape(-1)
    )
    return w1p, b1p, lnwp, lnbp, w2p, b2p, (k1, k2, d1, d1p, d2, kk2)


def _prep_hyper(hyper_nmd, k2: int, d2: int, kk2: int, dtype):
    """(N, M, d2) -> block-diagonal (N, kk2, k2*M): H[n, j*d2+d, j*M+m]
    = hyper[n, m, d]. Cross-offset terms are zero, so one matmul contracts
    every (k2 offset, mask token) pair."""
    n, m = hyper_nmd.shape[:2]
    h = jnp.zeros((n, kk2, k2, m), dtype)
    ht = hyper_nmd.transpose(0, 2, 1).astype(dtype)  # (N, d2, M)
    for j in range(k2):
        h = h.at[:, j * d2:(j + 1) * d2, j, :].set(ht)
    return h.reshape(n, kk2, k2 * m)


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
    k1, k2, d1, d1p, d2, kk2 = dims
    fast = dtype == jnp.bfloat16
    h_mat = _prep_hyper(hyper_nmd, k2, d2, kk2, dtype)
    if fast:
        h_mat = h_mat.transpose(0, 2, 1)  # (N, KM, kk2) for the reversed dot
    km = k2 * m

    # split the offset axis until the resident W1 block fits comfortably in
    # VMEM next to the token block and temporaries. bf16 giant shape: the
    # whole (1408, 8*384) block = 8.7 MB stays resident (ksplit=1, proven on
    # chip). fp32 needs a harder split AND a smaller token block: a 8.65 MB
    # fp32 half-split still OOMed scoped VMEM by 640 KB once double-buffered
    # (caught by the fp32 full-model parity run on hardware).
    itemsize = jnp.dtype(dtype).itemsize
    w1_limit = 9 * 2 ** 20 if fast else 4 * 2 ** 20
    ksplit = 1
    while (c * k1 * d1p * itemsize) // ksplit > w1_limit and ksplit < k1:
        ksplit *= 2
    ksplit = min(ksplit, k1)
    while k1 % ksplit:  # snap DOWN to a divisor (terminates at 1; k1 is 8
        ksplit -= 1     # for every real config, non-power-of-two k1 is safe)
    kres = k1 // ksplit
    bp_candidates = (256, 128) if fast else (128,)
    bp = next((b for b in bp_candidates if p % b == 0), p)

    # grid order (n, ksplit, p-blocks): the W1/b1 split-blocks have a
    # constant index over the inner token sweep, so they are fetched once
    # per split (not once per step — the trap the first version fell into)
    grid = (n, ksplit, p // bp)
    h_spec = (
        pl.BlockSpec((1, km, kk2), lambda i, s, j: (i, 0, 0))
        if fast
        else pl.BlockSpec((1, kk2, km), lambda i, s, j: (i, 0, 0))
    )
    out = pl.pallas_call(
        functools.partial(_kernel, d1=d1, d1p=d1p, kres=kres, eps=1e-6, fast=fast),
        out_shape=jax.ShapeDtypeStruct((n, k1, km, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda i, s, j: (i, j, 0)),
            pl.BlockSpec((c, kres * d1p), lambda i, s, j: (0, s)),
            pl.BlockSpec((1, kres * d1p), lambda i, s, j: (0, s)),
            pl.BlockSpec((d1p,), lambda i, s, j: (0,)),
            pl.BlockSpec((d1p,), lambda i, s, j: (0,)),
            pl.BlockSpec((d1p, kk2), lambda i, s, j: (0, 0)),
            pl.BlockSpec((kk2,), lambda i, s, j: (0,)),
            h_spec,
        ],
        out_specs=pl.BlockSpec((1, kres, km, bp), lambda i, s, j: (i, s, 0, j)),
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


def fused_upscale_sharded_available(mesh, src_shape, interpret: bool = False) -> bool:
    """Mesh-path gate: queries are independent, so the kernel runs per-shard
    under shard_map over the 'data' axis (VERDICT r4 item 4).
    `interpret=True` admits the CPU-mesh equality tests."""
    from l4p_tpu.ops.flash_attention import _on_tpu

    if mesh is None:
        return False
    sizes = dict(mesh.shape)
    nd = sizes.get("data", 1)
    n, p, c = src_shape
    return (
        (interpret or _on_tpu())
        and nd > 1
        and n % nd == 0
        and (p % 128 == 0 or p <= 512)
        and c >= 128
    )


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
