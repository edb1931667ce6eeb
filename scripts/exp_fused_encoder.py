"""Time fused-encoder kernel variants + per-phase-group costs on the chip.

    python scripts/exp_fused_encoder.py [--windows 2] [--iters 5]

Round-5 tuning for ops/fused_encoder.py. Baseline (fori tiles, lane-concat
proj): 74.3 ms/window vs 38.3 for the XLA unrolled path — the variants
here hunt the 2x gap. Phase-range rows time a restricted grid (garbage
numerics, valid timing).
"""

import argparse
import functools
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from l4p_tpu.models.encoder import GIANT, init_encoder_params
from l4p_tpu.ops import fused_encoder as fe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = dataclasses.replace(GIANT, unroll_blocks=True)
    n = cfg.num_tokens
    dt = jnp.bfloat16
    params = init_encoder_params(cfg, jax.random.PRNGKey(0), dtype=dt)
    x = 0.02 * jax.random.normal(jax.random.PRNGKey(1), (args.windows, n, cfg.embed_dim), dt)
    hooks = (14, 21, 28, 36, 40)
    fused = jax.jit(lambda p: fe.prepare_fused_params(p, cfg))(params)

    def run(label, **kw):
        f = jax.jit(lambda xx, fu: fe._fused_encoder_impl(
            xx, fu, n, cfg.embed_dim, cfg.num_heads, cfg.depth,
            cfg.head_dim ** -0.5, cfg.ln_eps, hooks, **kw))
        f = functools.partial(f, fu=fused)
        t0 = time.time()
        r = f(x)
        _ = float(jnp.sum(r[:, -1, 0, 0].astype(jnp.float32)))
        comp = time.time() - t0
        t0 = time.time()
        acc = None
        for _ in range(args.iters):
            r = f(x)
            acc = r[:, -1, 0, 0] if acc is None else acc + r[:, -1, 0, 0]
        _ = float(jnp.sum(acc.astype(jnp.float32)))
        per_w = (time.time() - t0) / args.iters / args.windows * 1e3
        print(f"{label:42s} {per_w:7.2f} ms/window  (compile {comp:.0f}s)", flush=True)
        return per_w

    nc = fused["wfc1"].shape[1]
    if os.environ.get("L4P_EXP_BISect2", ""):
        run("qkv+attn [0,4)", phase_range=(0, 4))
        run("attn+mlp [3,..)", phase_range=(3, 4 + nc))
        run("full via range [0,..)", phase_range=(0, 4 + nc))
    elif os.environ.get("L4P_EXP_PHASES_ONLY", ""):
        run("full (module defaults)")
        run("phases qkv only [0,3)", phase_range=(0, 3))
        run("phase attn only [3,4)", phase_range=(3, 4))
        run("phases mlp only [4,..)", phase_range=(4, 4 + nc))
    else:
        run("fori + concat (r5 baseline)", unroll_tiles=False, attn_accum=False)
        run("unroll + concat", unroll_tiles=True, attn_accum=False)
        run("unroll + accum", unroll_tiles=True, attn_accum=True)
        run("fori + accum", unroll_tiles=False, attn_accum=True)
        run("phases qkv only [0,3)", unroll_tiles=True, attn_accum=False, phase_range=(0, 3))
        run("phase attn only [3,4)", unroll_tiles=True, attn_accum=False, phase_range=(3, 4))
        run("phases mlp only [4,..)", unroll_tiles=True, attn_accum=False, phase_range=(4, 4 + nc))


if __name__ == "__main__":
    main()
