"""Encoder micro-experiments on the real chip (one window, giant config).

    python scripts/exp_encoder_variants.py

Times encoder_apply variants to locate the ~18 ms/window gap between the
measured 47 ms and the ~29 ms matmul+flash roofline:

  base          — current code (lax.scan over stacked blocks, fp32-typed
                  einsum outputs)
  unroll        — Python-unrolled blocks (no per-step param dynamic-slice
                  copies; ~50 MB/block of HBM copy removed)
  bf16out       — einsums emit bf16 directly (MXU still accumulates fp32;
                  bias adds in bf16) — measures the cost of fp32
                  materialization between matmul and cast
  unroll+bf16out

Also times one DPT head window in NCDHW (current) vs NDHWC layouts, and the
head convs standalone, to bound the conv-efficiency headroom.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


def time_fn(fn, *args, iters=5):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def rep(name, dt, **kw):
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2), **kw}), flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.models.encoder import GIANT, encoder_apply, init_encoder_params
    from l4p_tpu.ops.conv import layer_norm, gelu
    from l4p_tpu.ops.flash_attention import attention_auto

    key = jax.random.PRNGKey(0)
    cfg = GIANT
    params = init_encoder_params(cfg, key, jnp.bfloat16)
    x = jax.random.normal(key, (1, 3, 16, 224, 224), jnp.bfloat16)

    fwd = jax.jit(lambda p, xx: encoder_apply(p, xx, cfg))
    rep("encoder_base", time_fn(fwd, params, x, iters=5))

    # ---- variant blocks ----
    def block_v(xx, p, bf16out: bool):
        B, N, E = xx.shape
        nh, hd = cfg.num_heads, cfg.head_dim
        pet = None if bf16out else jnp.float32

        def mm(a, w):
            o = jnp.einsum("bne,fe->bnf", a, w.astype(a.dtype), preferred_element_type=pet)
            return o

        h = layer_norm(xx, p["norm1_w"], p["norm1_b"], cfg.ln_eps)
        qkv_bias = jnp.stack([p["q_bias"], jnp.zeros_like(p["v_bias"]), p["v_bias"]])
        qkv = jnp.einsum("bne,sfe->bsnf", h, p["qkv_w"].astype(h.dtype), preferred_element_type=pet)
        if bf16out:
            qkv = qkv + qkv_bias[None, :, None, :].astype(qkv.dtype)
        else:
            qkv = (qkv + qkv_bias[None, :, None, :].astype(jnp.float32)).astype(xx.dtype)
        qkv = qkv.reshape(B, 3, N, nh, hd).transpose(1, 0, 3, 2, 4)
        attn_out = attention_auto(qkv[0], qkv[1], qkv[2], hd ** -0.5)
        attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, N, E)
        proj = mm(attn_out, p["proj_w"])
        if bf16out:
            xx = xx + (proj + p["proj_b"].astype(proj.dtype))
        else:
            xx = xx + (proj + p["proj_b"].astype(jnp.float32)).astype(xx.dtype)

        h = layer_norm(xx, p["norm2_w"], p["norm2_b"], cfg.ln_eps)
        h1 = mm(h, p["fc1_w"])
        if bf16out:
            h1 = gelu(h1 + p["fc1_b"].astype(h1.dtype))
        else:
            h1 = gelu((h1 + p["fc1_b"].astype(jnp.float32)).astype(xx.dtype))
        h2 = jnp.einsum("bnf,ef->bne", h1, p["fc2_w"].astype(h1.dtype), preferred_element_type=pet)
        if bf16out:
            xx = xx + (h2 + p["fc2_b"].astype(h2.dtype))
        else:
            xx = xx + (h2 + p["fc2_b"].astype(jnp.float32)).astype(xx.dtype)
        return xx.astype(jnp.bfloat16)

    from l4p_tpu.models.encoder import patchify

    def enc_variant(p, xx, unroll: bool, bf16out: bool):
        t = patchify(xx, p["patch_embed"]["weight"], p["patch_embed"]["bias"], cfg)
        t = t + p["pos_embed"].astype(t.dtype)
        blocks = p["blocks"]
        if unroll:
            for i in range(cfg.depth):
                t = block_v(t, {k: v[i] for k, v in blocks.items()}, bf16out)
        else:
            def body(carry, bp):
                return block_v(carry, bp, bf16out), None
            t, _ = lax.scan(body, t, blocks)
        return layer_norm(t, p["norm"]["weight"], p["norm"]["bias"], cfg.ln_eps)

    for unroll in (False, True):
        for bf16out in (False, True):
            fn = jax.jit(lambda p, xx, u=unroll, b=bf16out: enc_variant(p, xx, u, b))
            t0 = time.time()
            _sync(fn(params, x))
            compile_s = time.time() - t0
            rep(f"encoder(unroll={unroll},bf16out={bf16out})",
                time_fn(fn, params, x, iters=5), compile_s=round(compile_s, 1))

    # ---- DPT conv layout probes ----
    from l4p_tpu.models.dpt import DPTConfig, dpt_apply, init_dpt_params

    dcfg = DPTConfig(num_channels=2)
    dp = init_dpt_params(dcfg, key, jnp.bfloat16)
    feats = [jax.random.normal(jax.random.fold_in(key, i), (1, 2048, 1408), jnp.bfloat16)
             for i in range(4)]
    dfwd = jax.jit(lambda p, f: dpt_apply(p, f, dcfg, (16, 224, 224)))
    rep("dpt_head_window", time_fn(dfwd, dp, feats, iters=5))

    # heavy tail convs, both layouts
    for cin, cout, shape, name in (
        (256, 256, (16, 64, 64), "res_conv_64"),
        (256, 128, (16, 128, 128), "head1_conv"),
        (128, 128, (16, 224, 224), "head2_conv"),
    ):
        xin = jax.random.normal(key, (1, cin) + shape, jnp.bfloat16)
        w = jax.random.normal(key, (cout, cin, 3, 3, 3), jnp.bfloat16) * 0.02
        f_ncdhw = jax.jit(lambda a, ww: lax.conv_general_dilated(
            a, ww, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NCDHW", "OIDHW", "NCDHW")))
        rep(f"{name}_NCDHW", time_fn(f_ncdhw, xin, w, iters=10))
        xl = jnp.moveaxis(xin, 1, -1)
        wl = jnp.transpose(w, (2, 3, 4, 1, 0))
        f_ndhwc = jax.jit(lambda a, ww: lax.conv_general_dilated(
            a, ww, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        rep(f"{name}_NDHWC", time_fn(f_ndhwc, xl, wl, iters=10))


if __name__ == "__main__":
    main()
