"""Flash-attention kernel variants on the real chip (giant window shape).

    python scripts/exp_flash_variants.py

The production kernel (ops/flash_attention.py) normalizes the full
(bq, N) probability block with a broadcast divide before the PV matmul.
TPU VPU division is multi-pass; the standard flash formulation instead
scales the (bq, D) OUTPUT rows by 1/denom — 2048x fewer divisions and the
scale runs on the small output tile. Variants timed at (1, 16, 2048, 88)
bf16 (one giant encoder window, all heads):

  base            — current kernel
  post_scale      — unnormalized exp -> PV matmul -> output rows * 1/denom
  post_scale_bq512— same with block_q=512 (fewer grid steps)

Numerics: post-scale accumulates PV in fp32 on exp values <= 1 then
rescales, which is if anything tighter than dividing in-block and casting
to bf16 before the matmul; equality vs base is reported at fp32 and bf16.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


def time_fn(fn, *args, iters=20):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def rep(name, dt, **kw):
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3), **kw}), flush=True)


def _kernel_post_scale(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (o * (1.0 / denom)).astype(o_ref.dtype)


def flash_variant(q, k, v, scale, kernel, block_q):
    b, h, n, d = q.shape
    bh = b * h
    qf, kf, vf = (t.reshape(bh, n, d) for t in (q, k, v))
    bq = min(block_q, n)
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=(bh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def main():
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    b, h, n, d = 1, 16, 2048, 88
    scale = d ** -0.5
    q = jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d), jnp.bfloat16)

    base = jax.jit(lambda a, bb, c: flash_attention(a, bb, c, scale, 256))
    rep("base_bq256", time_fn(base, q, k, v))

    for bq in (256, 512):
        fn = jax.jit(lambda a, bb, c, bq=bq: flash_variant(a, bb, c, scale, _kernel_post_scale, bq))
        rep(f"post_scale_bq{bq}", time_fn(fn, q, k, v))
        got = np.asarray(fn(q, k, v), np.float32)
        ref = np.asarray(base(q, k, v), np.float32)
        rep(f"err/post_scale_bq{bq}", 0.0, max_abs_err=float(np.abs(got - ref).max()))


if __name__ == "__main__":
    main()
