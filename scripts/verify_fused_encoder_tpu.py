"""Verify + time the fused whole-encoder megakernel on the real chip.

    python scripts/verify_fused_encoder_tpu.py [--windows N]

Compares against the current production XLA path (unrolled blocks + flash
attention) at the giant window shape (B windows of 2048 tokens), reporting
max abs error and per-window ms for both. Timing uses queued dispatch + one
device-side scalar sync (the ~29 ms/RTT tunnel rule from ROUND_NOTES).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from l4p_tpu.models.encoder import GIANT, init_encoder_params, encoder_apply
import dataclasses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = dataclasses.replace(GIANT, unroll_blocks=True)
    n = cfg.num_tokens
    print(f"giant: N={n} E={cfg.embed_dim} depth={cfg.depth} heads={cfg.num_heads} dt={dt.__name__}")

    params = init_encoder_params(cfg, jax.random.PRNGKey(0), dtype=dt)
    # realistic activation scale
    x = 0.02 * jax.random.normal(jax.random.PRNGKey(1), (args.windows, n, cfg.embed_dim), dt)
    hooks = (14, 21, 28, 36, 40)

    from l4p_tpu.ops.fused_encoder import fused_encoder_blocks, _run_blocks_xla, fused_encoder_available

    assert fused_encoder_available(cfg, params, n)

    t0 = time.time()
    fused = jax.jit(lambda p, xx: fused_encoder_blocks(p, xx, cfg, hooks))
    got = fused(params, x)
    got_h = np.asarray(got[:, :, :8, :8], np.float32)  # small slice pull
    print(f"kernel compile+run: {time.time()-t0:.1f}s out {got.shape}")

    t0 = time.time()
    ref_fn = jax.jit(lambda p, xx: _run_blocks_xla(p, xx, cfg, hooks))
    want = ref_fn(params, x)
    print(f"xla path compile+run: {time.time()-t0:.1f}s")

    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"max |err| = {err:.3e}  (scale {scale:.3f}, rel {err/scale:.3e})")

    def timeit(fn, label):
        # warm
        r = fn(params, x)
        _ = float(jnp.sum(r[:, -1, 0, 0].astype(jnp.float32)))
        t0 = time.time()
        acc = None
        for _ in range(args.iters):
            r = fn(params, x)
            acc = r[:, -1, 0, 0] if acc is None else acc + r[:, -1, 0, 0]
        _ = float(jnp.sum(acc.astype(jnp.float32)))
        dtd = (time.time() - t0) / args.iters
        per_w = dtd / args.windows * 1e3
        # padded model flops per window
        e, h, nh = cfg.embed_dim, cfg.mlp_hidden, cfg.num_heads
        fl = cfg.depth * (2 * n * e * (3 * e) + 4 * n * n * e + 2 * n * e * e + 4 * n * e * h)
        mfu = fl / (dtd / args.windows) / 197e12
        print(f"{label}: {per_w:.2f} ms/window  (iter {dtd*1e3:.1f} ms, ideal-flops MFU {mfu:.3f})")
        return per_w

    t_k = timeit(fused, "fused kernel ")
    t_x = timeit(ref_fn, "xla unrolled ")
    print(f"speedup {t_x/t_k:.2f}x")


if __name__ == "__main__":
    main()
