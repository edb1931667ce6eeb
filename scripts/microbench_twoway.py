"""Micro-benchmark the factored two-way transformer's keys-touching einsums
in isolation on the chip, to attribute the gap between the measured ~27 ms
(N=128) and the ~11 ms HBM roofline (each pass over the (N,P,C) keys is
738 MB bf16; the matmuls are rank-48).

    python scripts/microbench_twoway.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, P, C, K, H = 128, 2048, 1408, 48, 8


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


def rep(name, sec, gb=None):
    row = {"point": name, "ms": round(sec * 1e3, 2)}
    if gb is not None:
        row["gbps"] = round(gb / sec, 1)
    print(json.dumps(row), flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    key = jax.random.PRNGKey(0)
    keys_npc = (jax.random.normal(key, (N, P, C), jnp.float32) * 0.1).astype(jnp.bfloat16)
    s_nkc = (jax.random.normal(jax.random.fold_in(key, 1), (N, K, C), jnp.float32) * 0.1).astype(jnp.bfloat16)
    attn_nkp = (jax.random.normal(jax.random.fold_in(key, 2), (N, K, P), jnp.float32) * 0.1).astype(jnp.bfloat16)
    r_nck = (jax.random.normal(jax.random.fold_in(key, 3), (N, C, K), jnp.float32) * 0.1).astype(jnp.bfloat16)
    attn_npk = (jax.random.normal(jax.random.fold_in(key, 4), (N, P, K), jnp.float32) * 0.1).astype(jnp.bfloat16)
    v2_nkc = s_nkc
    upd_npc = keys_npc
    lnw = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)

    gb_keys = N * P * C * 2 / 1e9

    f1 = jax.jit(lambda s, k: jnp.einsum("nkc,npc->nkp", s, k, preferred_element_type=jnp.float32))
    rep("t2i_logits nkc,npc->nkp", time_fn(f1, s_nkc, keys_npc), gb_keys)

    f2 = jax.jit(lambda a, k: jnp.einsum("nkp,npc->nkc", a, k, preferred_element_type=jnp.float32))
    rep("t2i_wsum nkp,npc->nkc", time_fn(f2, attn_nkp, keys_npc), gb_keys)

    f3 = jax.jit(lambda k, r: jnp.einsum("npc,nck->npk", k, r, preferred_element_type=jnp.float32))
    rep("i2t_logits npc,nck->npk", time_fn(f3, keys_npc, r_nck), gb_keys)

    f4 = jax.jit(lambda a, v: jnp.einsum("npk,nkc->npc", a, v, preferred_element_type=jnp.float32))
    rep("i2t_out npk,nkc->npc", time_fn(f4, attn_npk, v2_nkc), gb_keys)

    from l4p_tpu.ops.conv import layer_norm

    f5 = jax.jit(lambda k, u: layer_norm(k + u.astype(k.dtype), lnw, lnb, 1e-5))
    rep("residual+LN", time_fn(f5, keys_npc, upd_npc), 3 * gb_keys)

    # fused i2t tail: out-einsum + residual + LN in one jit (lets XLA fuse)
    f6 = jax.jit(
        lambda a, v, k: layer_norm(
            k + jnp.einsum("npk,nkc->npc", a, v, preferred_element_type=jnp.float32).astype(k.dtype),
            lnw, lnb, 1e-5,
        )
    )
    rep("i2t_out+res+LN fused", time_fn(f6, attn_npk, v2_nkc, keys_npc), 3 * gb_keys)

    # softmax over P on (N,H,Q,P) fp32
    lg = jax.random.normal(jax.random.fold_in(key, 5), (N, H, 6, P), jnp.float32)
    f7 = jax.jit(lambda x: jax.nn.softmax(x, axis=-1).astype(jnp.bfloat16))
    rep("softmax over P", time_fn(f7, lg))

    # softmax over Q on (N,P,H,Q) fp32
    lg2 = jax.random.normal(jax.random.fold_in(key, 6), (N, P, H, 6), jnp.float32)
    rep("softmax over Q", time_fn(f7, lg2))

    # keys relayout probe: transpose (N,P,C)->(N,C,P)
    f8 = jax.jit(lambda k: k.transpose(0, 2, 1))
    rep("keys transpose", time_fn(f8, keys_npc), 2 * gb_keys)

    # pre-transposed variants: contraction along last-dim lanes both sides
    keys_ncp = jax.jit(lambda k: k.transpose(0, 2, 1))(keys_npc)
    f9 = jax.jit(lambda s, k: jnp.einsum("nkc,ncp->nkp", s, k, preferred_element_type=jnp.float32))
    rep("t2i_logits pre-T nkc,ncp->nkp", time_fn(f9, s_nkc, keys_ncp), gb_keys)

    f10 = jax.jit(lambda a, k: jnp.einsum("nkp,ncp->nkc", a, k, preferred_element_type=jnp.float32))
    rep("t2i_wsum pre-T nkp,ncp->nkc", time_fn(f10, attn_nkp, keys_ncp), gb_keys)


if __name__ == "__main__":
    main()
