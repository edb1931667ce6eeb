"""Measure the encoder MLP's GELU cost on the real chip.

    python scripts/exp_encoder_gelu.py

The encoder's GELU is exact-erf (reference modeling_finetune.py:51-69,
torch.nn.GELU default). In the fused upscale kernel, replacing the
exp+reciprocal rational erf with a division/exp-free degree-7 polynomial
cut that kernel's VPU cost by ~9 ms (ROUND_NOTES session 6). This script
checks whether the same trade wins in the XLA-compiled encoder MLP, where
the GELU epilogue runs on the fc1 output (2048 x 6144 per window):

  1. standalone elementwise: copy baseline / XLA exact erf / tanh approx /
     fp32 polynomial erf on a (1, 2048, 6144) bf16 tensor;
  2. one full encoder window (giant, unroll_blocks=True — the production
     session path) with the module GELU swapped.

The polynomial's max GELU error is ~1.3e-3, an order of magnitude below
bf16 rounding at the same magnitudes, so a win here is shippable on the
bf16 lane (fp32 lanes keep exact erf — same policy as ops/fused_upscale).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3), **kw}), flush=True)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_poly32(x):
    """fp32 polynomial-erf GELU (ops/fused_upscale._gelu_fast math, forced
    fp32 internally so bf16 inputs do not accumulate Horner rounding)."""
    from l4p_tpu.ops.fused_upscale import _gelu_fast

    return _gelu_fast(x.astype(jnp.float32)).astype(x.dtype)


def main():
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    key = jax.random.PRNGKey(0)

    # ---- standalone elementwise at the fc1-output shape ----
    x = jax.random.normal(key, (1, 2048, 6144), jnp.bfloat16) * 2.0
    for name, fn in (
        ("copy(x+1)", lambda a: a + 1.0),
        ("gelu_exact_erf", gelu_exact),
        ("gelu_tanh", gelu_tanh),
        ("gelu_poly32", gelu_poly32),
    ):
        rep(f"elementwise/{name}", time_fn(jax.jit(fn), x, iters=50))

    # numeric check at the same magnitudes
    xf = np.asarray(x, np.float32)
    ref = np.asarray(gelu_exact(jnp.asarray(xf)), np.float32)
    for name, fn in (("poly32", gelu_poly32), ("tanh", gelu_tanh)):
        got = np.asarray(fn(jnp.asarray(xf)), np.float32)
        rep(f"err/{name}", 0.0, max_abs_err=float(np.abs(got - ref).max()))

    # ---- one encoder window, production unrolled path ----
    import dataclasses
    from l4p_tpu.models import encoder as enc_mod
    from l4p_tpu.models.encoder import GIANT, encoder_apply, init_encoder_params

    cfg = dataclasses.replace(GIANT, unroll_blocks=True)
    params = init_encoder_params(cfg, key, jnp.bfloat16)
    xw = jax.random.normal(key, (1, 3, 16, 224, 224), jnp.bfloat16)

    orig = enc_mod.gelu
    for name, fn in (("exact", orig), ("poly32", gelu_poly32), ("tanh", gelu_tanh)):
        enc_mod.gelu = fn
        fwd = jax.jit(lambda p, xx: encoder_apply(p, xx, cfg))
        t0 = time.time()
        _sync(fwd(params, xw))
        compile_s = time.time() - t0
        rep(f"encoder_window/gelu_{name}", time_fn(fwd, params, xw, iters=5),
            compile_s=round(compile_s, 1))
    enc_mod.gelu = orig


if __name__ == "__main__":
    main()
