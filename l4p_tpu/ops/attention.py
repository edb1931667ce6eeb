"""Multi-head attention for the video encoder and SAM decoder.

The 40-block encoder runs full joint spatio-temporal softmax attention over
2048 tokens (reference: modeling_finetune.py:169-190 — naive matmuls there).
Here: a single fused-QKV formulation with fp32 softmax; on TPU a Pallas
flash-attention kernel (l4p_tpu.ops.flash_attention) is used for the encoder
hot path, with this XLA path as the CPU/testing fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """q,k,v: (B, H, N, D) -> (B, H, Nq, D). fp32 softmax accumulation."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
