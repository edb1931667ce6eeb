"""Streaming Pallas kernels for the two-way transformer's image side.

The factored two-way transformer (models/sam.py) reduced the image-side
FLOPs ~14x by reassociating every projection through the ~6-token
bottleneck, but it remains HBM-bound: the per-query image embedding
`keys` is (N, P, C) = (128, 2048, 1408) ~ 738 MB bf16 at the reference
operating point, and the XLA einsum chain streams it ~12 times per
window (t2i logits, t2i weighted sum, i2t logits, i2t update + residual
+ LayerNorm, x 2 layers, + final attention) at a measured ~250-290 GB/s
(scripts/microbench_twoway.py). These two kernels cut that to the
dependency-theoretic floor of 5 passes (3 reads + 2 writes):

* `t2i_flash` — token->image cross-attention with an online softmax over
  the P axis: ONE read of keys, emitting only the (N, K, C) weighted sum
  (K = heads x tokens = 48).
* `i2t_ln_t2i` — image->token cross-attention + residual + LayerNorm
  fused with the NEXT layer's token->image flash accumulation: ONE read
  + ONE write. The fusion is legal because every op between a layer's
  i2t and the next layer's t2i (query self-attention, MLP, LayerNorms,
  projections) touches only the tiny query side — see
  models/sam.py:_twoway_kernel_impl for the pass schedule.

Layout notes (all chosen so no (tile_p, C) tile is ever transposed):
* logits live as (tile_p, K): `keys_tile @ st` contracts over the lane
  axis C of the resident tile — the MXU-native A@B form.
* t2i online-softmax statistics are per-K-column over sublanes; the
  accumulator update `E^T @ keys_tile` is the standard weight-gradient
  contraction (over sublanes both sides), also native.
* the i2t softmax is PER HEAD over its Q tokens. In the flattened
  (tile_p, h*Q) layout that is a grouped softmax over lane blocks of Q.
  Rather than reshaping lanes (a Mosaic relayout), it uses the identity
  softmax_g(x) = exp(x - M) / sum_g exp(x - M) for ANY per-row M: the
  global row max M (a native lane reduction) keeps exp bounded, and the
  per-group sums come from one matmul with a block-diagonal ones matrix
  G. Exact per-head softmax, no relayouts. (If one head's logits sat
  >87 nats below another head's — far outside anything trained weights
  produce — its exps would all underflow; guarded by max(S, 1e-30) and
  covered by the parity tests at realistic magnitudes.)

Reference: l4p/models/task_heads/sam/transformer.py:21-245 (the math
these kernels compute is the factored form of TwoWayAttentionBlock).
Gradients are provided one level up (models/sam.py) by a custom_vjp that
recomputes through the factored XLA path, the same flash-style pattern
as ops/flash_attention.py / ops/fused_upscale.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


_NEG_INF = -1e30


def _t2i_update(j, kt, st_ref, spe_ref, wsum_ref, acc_ref, m_ref, l_ref):
    """Online-softmax accumulation of one keys tile into the t2i weighted
    sum. kt: (bp, C) compute-dtype tile (fresh, post-update when called
    from the fused kernel). Writes wsum at the last grid step."""
    nj = pl.num_programs(1)
    lg = jnp.dot(kt, st_ref[0], preferred_element_type=jnp.float32)
    lg = lg + spe_ref[0]  # (bp, K)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, _NEG_INF, m_ref.dtype)
        l_ref[:] = jnp.zeros(l_ref.shape, l_ref.dtype)
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    m_old = m_ref[:]  # (1, K)
    m_new = jnp.maximum(m_old, jnp.max(lg, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)  # (1, K)
    # match the XLA factored path's precision flow: probabilities cast to
    # the keys dtype before the value matmul (softmax->astype->einsum)
    e = jnp.exp(lg - m_new).astype(kt.dtype)  # (bp, K)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(e.astype(jnp.float32), axis=0, keepdims=True)
    m_ref[:] = m_new
    scale = alpha.reshape(-1, 1)  # (K, 1)
    acc_ref[:] = acc_ref[:] * scale + lax.dot_general(
        e, kt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        wsum_ref[0] = acc_ref[:] / l_ref[:].reshape(-1, 1)


def _t2i_kernel(keys_ref, st_ref, spe_ref, wsum_ref, acc_ref, m_ref, l_ref):
    _t2i_update(
        pl.program_id(1), keys_ref[0], st_ref, spe_ref, wsum_ref, acc_ref, m_ref, l_ref
    )


def _i2t_t2i_kernel(
    keys_ref, r_ref, per_ref, v2_ref, g_ref, ob_ref, lnw_ref, lnb_ref,
    st_ref, spe_ref, knew_ref, wsum_ref, acc_ref, m_ref, l_ref, *,
    eps: float, fast: bool
):
    kt = keys_ref[0]  # (bp, C)
    # --- i2t: grouped softmax over each head's Q tokens (see module doc)
    lg = jnp.dot(kt, r_ref[0], preferred_element_type=jnp.float32)
    lg = lg + per_ref[0]  # (bp, K); includes pe-term and q-bias term
    mrow = jnp.max(lg, axis=-1, keepdims=True)  # (bp, 1) global row max
    e = jnp.exp(lg - mrow)
    s = jnp.dot(e, g_ref[:], preferred_element_type=jnp.float32)  # per-group sums
    attn = (e / jnp.maximum(s, 1e-30)).astype(kt.dtype)
    out = jnp.dot(attn, v2_ref[0], preferred_element_type=jnp.float32)
    y = kt.astype(jnp.float32) + out + ob_ref[:].astype(jnp.float32)
    # --- residual LayerNorm over C (norm4). `fast` (bf16 inputs): one-pass
    # moments (E[y^2]-E[y]^2) — one fewer full VPU pass over the (bp, C)
    # tile; its fp32 cancellation noise is far below bf16 rounding. fp32
    # inputs keep the two-pass form (the fp32 full-model parity lane runs
    # these kernels and is pinned at ~1e-6 tolerances).
    mean = jnp.mean(y, axis=-1, keepdims=True)
    if fast:
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mean)
    else:
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * lax.rsqrt(var + eps)
    y = y * lnw_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    knew = y.astype(kt.dtype)
    knew_ref[0] = knew
    # --- next layer's t2i flash accumulation on the fresh tile
    _t2i_update(pl.program_id(1), knew, st_ref, spe_ref, wsum_ref, acc_ref, m_ref, l_ref)


def _block_p(p: int, itemsize: int) -> int:
    """Largest keys tile that keeps the kernel inside scoped VMEM: at
    C=1408 a 512-row tile is ~1.4 MB bf16 but ~2.9 MB fp32, and with
    double-buffered in+out keys tiles the fp32 variant blows the 16 MB
    scoped limit (measured: 18.44M requested) — so fp32 tiles are half."""
    cap = 512 if itemsize <= 2 else 256
    for b in (512, 256, 128):
        if b <= cap and p % b == 0:
            return b
    return p


def _scratch(k: int, c: int):
    from jax.experimental.pallas import tpu as pltpu

    return [
        pltpu.VMEM((k, c), jnp.float32),
        pltpu.VMEM((1, k), jnp.float32),
        pltpu.VMEM((1, k), jnp.float32),
    ]


def _check_aligned(p: int, c: int, k: int) -> None:
    """Shape gate: callers normally go through fused_keys_available, but an
    explicit impl='streamed' bypasses it — fail with a real message instead
    of a scoped-VMEM blowup or an opaque Mosaic layout error."""
    if c % 128 or p % 128 or k > 128:
        raise ValueError(
            f"fused_keys kernels need C%128==0, P%128==0, h*Q<=128; got "
            f"P={p}, C={c}, K={k}. Use impl='factored' for these shapes."
        )


def t2i_flash(
    keys: jnp.ndarray,  # (N, P, C)
    st: jnp.ndarray,  # (N, C, K) pre-scaled s transposed
    spe: jnp.ndarray,  # (N, P, K) f32: s . pe^T
    interpret: bool = False,
) -> jnp.ndarray:
    """Token->image attention weighted sum: (N, K, C) f32, one keys pass."""
    n, p, c = keys.shape
    k = st.shape[-1]
    _check_aligned(p, c, k)
    bp = _block_p(p, keys.dtype.itemsize)
    return pl.pallas_call(
        _t2i_kernel,
        out_shape=jax.ShapeDtypeStruct((n, k, c), jnp.float32),
        grid=(n, p // bp),
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bp, k), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, c), lambda i, j: (i, 0, 0)),
        scratch_shapes=_scratch(k, c),
        interpret=interpret,
    )(keys, st, spe)


def i2t_ln_t2i(
    keys: jnp.ndarray,  # (N, P, C)
    r: jnp.ndarray,  # (N, C, K) i2t factored projection (h-major K)
    per: jnp.ndarray,  # (N, P, K) f32: pe-term + q-bias term
    v2: jnp.ndarray,  # (N, K, C) value-side already through out_proj
    g: jnp.ndarray,  # (K, K) f32 block-diagonal ones (group-sum matrix)
    ob: jnp.ndarray,  # (C,) out_proj bias
    lnw: jnp.ndarray,  # (C,) norm4 weight
    lnb: jnp.ndarray,  # (C,) norm4 bias
    st: jnp.ndarray,  # (N, C, K2) NEXT t2i pre-scaled s transposed
    spe: jnp.ndarray,  # (N, P, K2) f32 NEXT t2i s . pe^T
    eps: float = 1e-5,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused i2t cross-attention + residual LayerNorm + next-layer t2i
    flash: one keys read, one keys write. Returns (keys_new bf16-like,
    next wsum (N, K2, C) f32)."""
    n, p, c = keys.shape
    k = r.shape[-1]
    k2 = st.shape[-1]
    _check_aligned(p, c, max(k, k2))
    bp = _block_p(p, keys.dtype.itemsize)
    # 1-D operands as (1, C) rows — lane-axis-last is the Mosaic-native form
    ob, lnw, lnb = (v.reshape(1, c) for v in (ob, lnw, lnb))
    return pl.pallas_call(
        functools.partial(_i2t_t2i_kernel, eps=eps, fast=keys.dtype == jnp.bfloat16),
        out_shape=(
            jax.ShapeDtypeStruct((n, p, c), keys.dtype),
            jax.ShapeDtypeStruct((n, k2, c), jnp.float32),
        ),
        grid=(n, p // bp),
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bp, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((k, k), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c, k2), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bp, k2), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k2, c), lambda i, j: (i, 0, 0)),
        ),
        scratch_shapes=_scratch(k2, c),
        interpret=interpret,
    )(keys, r, per, v2, g, ob, lnw, lnb, st, spe)


def group_sum_matrix(num_heads: int, q: int) -> jnp.ndarray:
    """(h*q, h*q) block-diagonal ones: S = E @ G broadcasts each head's
    exp-sum back to its q lanes."""
    k = num_heads * q
    head = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) // q
    head_t = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1) // q
    return (head == head_t).astype(jnp.float32)


def fused_keys_sharded_available(mesh, keys_shape, num_heads: int, nq: int,
                                 interpret: bool = False) -> bool:
    """Mesh-path gate: the query axis N is embarrassingly parallel, so the
    streamed kernels run per-shard under shard_map over the 'data' axis
    (VERDICT r4 item 4; same pattern as ops/flash_attention.py's mesh wrap).
    `interpret=True` admits the CPU-mesh equality tests."""
    from l4p_tpu.ops.flash_attention import _on_tpu

    if mesh is None:
        return False
    sizes = dict(mesh.shape)
    nd = sizes.get("data", 1)
    n, p, c = keys_shape
    return (
        (interpret or _on_tpu())
        and nd > 1
        and n % nd == 0
        and c % 128 == 0
        and p % 128 == 0
        and num_heads * nq <= 128
    )


def fused_keys_available(keys: jnp.ndarray, num_heads: int, nq: int) -> bool:
    """Kernel path gate: single real TPU with lane-aligned dims. CPU
    tests exercise the kernels via interpret=True explicitly."""
    from l4p_tpu.ops.flash_attention import _on_tpu, _single_device

    n, p, c = keys.shape
    return (
        _on_tpu()
        and _single_device()
        and c % 128 == 0
        and p % 128 == 0
        and num_heads * nq <= 128
    )
