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

    key = jax.random.PRNGKey(0)
    cfg = GIANT
    params = init_encoder_params(cfg, key, jnp.bfloat16)
    x = jax.random.normal(key, (1, 3, 16, 224, 224), jnp.bfloat16)

    import dataclasses

    fwd = jax.jit(lambda p, xx: encoder_apply(p, xx, cfg))
    rep("encoder_base", time_fn(fwd, params, x, iters=5))

    # ---- variants via the production flags (EncoderConfig.unroll_blocks /
    # matmul_out_compute_dtype) so the measurement IS the shippable path;
    # flag transparency is tested in tests/test_encoder_options.py
    for unroll in (False, True):
        for bf16out in (False, True):
            if not unroll and not bf16out:
                continue  # == encoder_base
            vcfg = dataclasses.replace(
                cfg, unroll_blocks=unroll, matmul_out_compute_dtype=bf16out
            )
            fn = jax.jit(lambda p, xx, c=vcfg: encoder_apply(p, xx, c))
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
