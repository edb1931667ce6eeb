"""Attribute the fused-upscale kernel's time to its body stages.

Runs doctored variants of the kernel at the N=128 giant shape: full body,
no-gelu, no-LN, no-hypernet-matmul, no-transpose-store, matmuls-only.
Differences localize whether the kernel is MXU- or VPU-bound.

    python scripts/exp_upscale_ablate.py [--iters 10]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from l4p_tpu.ops.fused_upscale import _gelu_kernel, _prep_hyper, _prep_weights


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


def time_fn(fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def _gelu_poly7(x):
    """deg-7 odd minimax erf (exp/div-free): ~6e-4 abs erf error, ~3e-4
    gelu error — below bf16 resolution but NOT below the fp32 interpret
    tests' 2e-5. Candidate only."""
    z = x * 0.7071067811865476
    u = jnp.minimum(z * z, 9.0)
    # chebfit deg 7 of erf(x)/x on x in (0, 3]
    import numpy as _np
    from numpy.polynomial import chebyshev as _C
    from math import erf as _erf

    xs = _np.linspace(1e-6, 3.0, 4001)
    cf = _C.chebfit(xs ** 2, _np.array([_erf(v) for v in xs]) / xs, 7)
    p = _C.cheb2poly(cf)
    acc = jnp.full_like(u, float(p[-1]))
    for c in p[-2::-1]:
        acc = acc * u + float(c)
    zc = jnp.clip(z, -3.0, 3.0)
    return 0.5 * x * (1.0 + zc * acc)


def make_kernel(variant: str, d1: int, d1p: int, kres: int, eps: float):
    def _kernel(src_ref, w1_ref, b1_ref, lnw_ref, lnb_ref, w2_ref, b2_ref,
                h_ref, out_ref):
        x0 = src_ref[0]
        h_mat = h_ref[0]
        w2 = w2_ref[:]
        mask = (lax.broadcasted_iota(jnp.int32, (1, d1p), 1) < d1).astype(jnp.float32)
        lnw = lnw_ref[:].astype(jnp.float32)
        lnb = lnb_ref[:].astype(jnp.float32)
        b2 = b2_ref[:].astype(jnp.float32)
        gelu_fn = _gelu_poly7 if variant in ("gelu_poly7", "best_poly") else _gelu_kernel
        ln_mode = ("onepass" if variant in ("ln_onepass", "best", "best_poly")
                   else "none" if variant in ("no_ln", "matmuls_only") else "twopass")
        use_gelu = variant not in ("no_gelu", "matmuls_only")
        hyper_mode = ("rev" if variant in ("hyper_rev", "best", "best_poly")
                      else "skip" if variant == "no_hyper" else "fwd")
        for k in range(kres):
            w1k = w1_ref[:, k * d1p:(k + 1) * d1p]
            x1 = jnp.dot(x0, w1k, preferred_element_type=jnp.float32)
            x1 = x1 + b1_ref[0, k * d1p:(k + 1) * d1p].astype(jnp.float32)
            if ln_mode == "onepass":
                s1 = jnp.sum(x1 * mask, axis=-1, keepdims=True)
                s2 = jnp.sum(jnp.square(x1) * mask, axis=-1, keepdims=True)
                mean = s1 / d1
                var = s2 / d1 - jnp.square(mean)
                y = (x1 - mean) * lax.rsqrt(var + eps)
                y = y * lnw + lnb
            elif ln_mode == "twopass":
                mean = jnp.sum(x1 * mask, axis=-1, keepdims=True) / d1
                var = jnp.sum(jnp.square(x1 - mean) * mask, axis=-1, keepdims=True) / d1
                y = (x1 - mean) * lax.rsqrt(var + eps)
                y = y * lnw + lnb
            else:
                y = x1 * mask
            if use_gelu:
                y = gelu_fn(y)
            y = y.astype(x0.dtype)
            x2 = jnp.dot(y, w2, preferred_element_type=jnp.float32)
            if use_gelu:
                x2 = gelu_fn(x2 + b2)
            else:
                x2 = x2 + b2
            x2 = x2.astype(x0.dtype)
            if hyper_mode == "skip":
                out_ref[0, k] = jnp.zeros_like(out_ref[0, k]) + x2[:, :12].T
            elif hyper_mode == "rev":
                # (KM, kk2) @ (BP, kk2)^T -> (KM, BP): output lanes = BP and
                # the result lands in the out layout with no transpose
                out_ref[0, k] = lax.dot_general(
                    h_mat, x2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                out_k = jnp.dot(x2, h_mat, preferred_element_type=jnp.float32)
                out_ref[0, k] = out_k.T
        return

    return _kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=128)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    p, c, d1, d2, m = 2048, 1408, 352, 176, 3
    n = args.n
    key = jax.random.PRNGKey(0)
    mk = lambda i, s, sc: (jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32) * sc)
    dtype = jnp.bfloat16
    w1 = mk(1, (c, d1, 2, 2, 2), 0.05).astype(dtype)
    b1 = mk(2, (d1,), 0.1).astype(dtype)
    lnw = (1.0 + mk(3, (d1,), 0.1)).astype(dtype)
    lnb = mk(4, (d1,), 0.1).astype(dtype)
    w2 = mk(5, (d1, d2, 1, 2, 2), 0.1).astype(dtype)
    b2 = mk(6, (d2,), 0.1).astype(dtype)
    hyper = mk(7, (n, m, d2), 0.3).astype(dtype)
    src = mk(0, (n, p, c), 0.3).astype(dtype)

    w1p, b1p, lnwp, lnbp, w2p, b2p, dims = _prep_weights(w1, b1, lnw, lnb, w2, b2, dtype)
    k1, k2, d1_, d1p, d2_, kk2 = dims
    h_mat = _prep_hyper(hyper, k2, d2, kk2, dtype)
    km = k2 * m
    kres = k1
    bp = 256

    h_matT = h_mat.transpose(0, 2, 1)
    for variant in ("hyper_rev", "ln_onepass", "gelu_poly7", "best", "best_poly"):
        rev = variant in ("hyper_rev", "best", "best_poly")
        h_in = h_matT if rev else h_mat
        h_spec = (pl.BlockSpec((1, km, kk2), lambda i, s, j: (i, 0, 0)) if rev
                  else pl.BlockSpec((1, kk2, km), lambda i, s, j: (i, 0, 0)))
        kern = make_kernel(variant, d1, d1p, kres, 1e-6)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, k1, km, p), jnp.float32),
            grid=(n, 1, p // bp),
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
        )
        fn = jax.jit(lambda s_, *w: call(s_, *w))
        try:
            sec = time_fn(fn, src, w1p, b1p, lnwp, lnbp, w2p, b2p, h_in, iters=args.iters)
            print(json.dumps({"variant": variant, "ms": round(sec * 1e3, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": variant, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
