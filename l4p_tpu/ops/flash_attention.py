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


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _flash_attention_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: float, block_q: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
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
        interpret=interpret,
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


# ---------------------------------------------------------------------------
# mesh path: the kernel under shard_map
# ---------------------------------------------------------------------------

def _mesh_specs(mesh, b: int, h: int):
    """PartitionSpec for (B, H, N, D) attention operands on a (data, model)
    mesh: batch over 'data', heads over 'model' — exactly the layout GSPMD
    already produces in the encoder (window-merged batch is data-sharded,
    the TP qkv projection emits head-sharded features), so shard_map
    introduces no resharding. Returns None when the global dims don't tile
    the mesh axes (caller falls back to XLA `mha`)."""
    from jax.sharding import PartitionSpec as P

    sizes = dict(mesh.shape)
    nd = sizes.get("data", 1)
    nm = sizes.get("model", 1)
    if b % nd != 0 or h % nm != 0:
        return None
    return P("data" if "data" in sizes else None, "model" if "model" in sizes else None, None, None)


def flash_sharded_available(mesh, q_shape, kv_n: int) -> bool:
    b, h, n, _ = q_shape
    return (
        mesh is not None
        and n == kv_n
        and n % DEFAULT_BLOCK_Q == 0
        and _mesh_specs(mesh, b, h) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_sharded(q, k, v, scale: float, mesh=None, interpret: bool = False):
    """flash_attention under an explicit `shard_map` over a (data, model)
    mesh: each device runs the Pallas kernel on its local (B/nd, H/nm, N, D)
    shard — attention is independent across batch and heads, so no
    collectives are needed and `pallas_call`'s lack of a GSPMD partitioning
    rule never bites. `interpret=True` runs the kernel in interpret mode
    (CPU-mesh equality tests). Backward recomputes through the XLA `mha` at
    the GLOBAL level (outside the shard_map), which GSPMD partitions cleanly.
    """
    return _flash_sharded_impl(q, k, v, scale, mesh, interpret)


def _flash_sharded_impl(q, k, v, scale, mesh, interpret):
    from jax import shard_map

    spec = _mesh_specs(mesh, q.shape[0], q.shape[1])
    assert spec is not None, "shapes do not tile the mesh; gate with flash_sharded_available"

    def local(qs, ks, vs):
        return _flash_attention_impl(qs, ks, vs, scale, DEFAULT_BLOCK_Q, interpret)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)


def _flash_sharded_fwd(q, k, v, scale, mesh, interpret):
    return _flash_sharded_impl(q, k, v, scale, mesh, interpret), (q, k, v)


def _flash_sharded_bwd(scale, mesh, interpret, res, g):
    q, k, v = res
    from l4p_tpu.ops.attention import mha

    _, vjp = jax.vjp(lambda q_, k_, v_: mha(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_attention_sharded.defvjp(_flash_sharded_fwd, _flash_sharded_bwd)
