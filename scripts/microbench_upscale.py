"""Time the fused upscale+hypernet kernel at the giant track shapes.

    python scripts/microbench_upscale.py [--queries 128 64] [--iters 10]

Reports ms + MFU against the analytic (unpadded) matmul FLOPs and checks
the kernel against the XLA reference chain in bf16.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197.0


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, nargs="+", default=[128, 64])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.ops.fused_upscale import _upscale_xla, fused_upscale_hypernet

    p, c, d1, d2, m = 2048, 1408, 352, 176, 3
    k1, k2 = 8, 4
    key = jax.random.PRNGKey(0)
    mk = lambda i, s, sc: (jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32) * sc)

    for n in args.queries:
        ws = (
            mk(0, (n, p, c), 0.3).astype(jnp.bfloat16),
            mk(1, (c, d1, 2, 2, 2), 0.05).astype(jnp.bfloat16),
            mk(2, (d1,), 0.1).astype(jnp.bfloat16),
            (1.0 + mk(3, (d1,), 0.1)).astype(jnp.bfloat16),
            mk(4, (d1,), 0.1).astype(jnp.bfloat16),
            mk(5, (d1, d2, 1, 2, 2), 0.1).astype(jnp.bfloat16),
            mk(6, (d2,), 0.1).astype(jnp.bfloat16),
            mk(7, (n, m, d2), 0.3).astype(jnp.bfloat16),
        )
        gf = (
            2 * n * p * c * k1 * d1
            + 2 * n * p * k1 * d1 * k2 * d2
            + 2 * n * p * k1 * k2 * d2 * m
        ) / 1e9

        fk = jax.jit(lambda *a: fused_upscale_hypernet(*a))
        sec = time_fn(fk, *ws, iters=args.iters)
        print(json.dumps({
            "point": f"fused_kernel n={n}", "ms": round(sec * 1e3, 2),
            "gflops": round(gf, 1),
            "mfu": round(gf / 1e3 / sec / PEAK_TFLOPS, 3),
        }), flush=True)

        # error reduced on-device (the full logits are ~800 MB — never ship
        # them through the tunnel)
        diff = jax.jit(
            lambda *a: (
                jnp.max(jnp.abs(fused_upscale_hypernet(*a) - _upscale_xla(*a))),
                jnp.max(jnp.abs(_upscale_xla(*a))),
            )
        )(*ws)
        print(json.dumps({"point": f"max_abs_err n={n}",
                          "err": float(np.asarray(diff[0])),
                          "scale": float(np.asarray(diff[1]))}), flush=True)


if __name__ == "__main__":
    main()
