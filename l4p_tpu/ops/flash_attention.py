"""Pallas TPU attention kernel for the encoder's 2048-token windows.

The reference materializes full (N, N) softmax matrices in HBM per block
(modeling_finetune.py:180-186). At window size 2048 the whole K/V for one
(batch, head) fits in VMEM, so each kernel instance computes one q-block's
rows entirely on-chip: scores and the softmax never touch HBM.

Layout: q,k,v (B, H, N, D). D=88 for ViT-giant; the kernel pads the lane
dim to 128 internally via the block specs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, N)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_q: int = 256) -> jnp.ndarray:
    """q,k,v: (B, H, N, D) -> (B, H, N, D). Softmax in fp32 on-chip.

    Differentiable: the backward pass recomputes attention with XLA ops and
    uses the standard softmax VJP (flash-style recompute — no (N, N)
    probabilities are saved from the forward), so training runs with the
    Pallas kernel on the forward path.
    """
    return _flash_attention_impl(q, k, v, scale, block_q)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_attention_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: float, block_q: int = 256) -> jnp.ndarray:
    b, h, n, d = q.shape
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    bq = min(block_q, n)
    assert n % bq == 0

    grid = (bh, n // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _flash_fwd(q, k, v, scale, block_q):
    return _flash_attention_impl(q, k, v, scale, block_q), (q, k, v)


def _flash_bwd(scale, block_q, res, g):
    q, k, v = res
    from l4p_tpu.ops.attention import mha

    _, vjp = jax.vjp(lambda q_, k_, v_: mha(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


DEFAULT_BLOCK_Q = 256


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    """True when the default device is a TPU chip.

    Probes the device itself, not the backend name: the axon TPU plugin
    registers its backend as 'axon' in some code paths while the devices
    report platform 'tpu' / device_kind 'TPU v5 ...' — gating on
    jax.default_backend() alone can silently miss real hardware.
    """
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return (
        getattr(dev, "platform", "") in ("tpu", "axon")
        or "TPU" in getattr(dev, "device_kind", "")
    )


@functools.lru_cache(maxsize=1)
def _single_device() -> bool:
    """True when exactly one accelerator is visible. pallas_call has no
    registered GSPMD partitioning rule, so on a multi-chip host a jit over
    sharded operands (TP params or a window-sharded batch) could force a
    full re-gather around the kernel or fail outright; the XLA `mha`
    partitions cleanly. Until the kernel is shard_map-wrapped and verified
    on real multi-chip hardware, flash is single-device only (the
    bench/demo path — this session's hardware — is single-chip)."""
    try:
        return len(jax.devices()) == 1
    except Exception:
        return False


def attention_auto(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Pallas kernel on TPU; XLA fallback elsewhere (tests on CPU)."""
    from l4p_tpu.ops.attention import mha

    n = q.shape[-2]
    if _on_tpu() and _single_device() and n == k.shape[-2] and n % DEFAULT_BLOCK_Q == 0:
        # positional args only: jax.custom_vjp functions reject kwargs
        return flash_attention(q, k, v, scale, DEFAULT_BLOCK_Q)
    return mha(q, k, v, scale)
