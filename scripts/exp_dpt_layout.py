"""Time dpt_apply (NCDHW) vs dpt_apply_cl (NDHWC) on the chip.

Production-like: vmapped over a window chunk of 2 (what the stacked dense
body's lax.map batch does), giant all-task shape, bf16 params + hooks.

    python scripts/exp_dpt_layout.py [--iters 10] [--chunk 2]
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

PEAK_TFLOPS = 197.0  # v5e bf16

# analytic FLOPs per window per task at the giant 16x224x224 shape
# (pyramid 437 + refinenet 1236 + head1 464 + head2 710 GF)
GF_PER_WINDOW = 2847.0


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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=2)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.models.dpt import DPTConfig, dpt_apply, dpt_apply_cl, init_dpt_params

    cfg = DPTConfig(num_channels=1)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        init_dpt_params(cfg, jax.random.PRNGKey(0)),
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    key = jax.random.PRNGKey(1)
    hooks = [
        (
            jax.random.normal(
                jax.random.fold_in(key, i), (args.chunk, 1, 2048, 1408), jnp.float32
            )
            * 0.3
        ).astype(jnp.bfloat16)
        for i in range(4)
    ]
    info = (16, 224, 224)

    def run(apply_fn, p, hs):
        return jax.vmap(lambda fw: apply_fn(p, fw, cfg, info))(hs)

    for name, fn in (("ncdhw", dpt_apply), ("ndhwc", dpt_apply_cl)):
        f = jax.jit(lambda p, hs, fn=fn: run(fn, p, hs))
        sec = time_fn(f, params, hooks, iters=args.iters)
        per_win = sec / args.chunk
        print(
            json.dumps(
                {
                    "impl": name,
                    "ms_per_window": round(per_win * 1e3, 2),
                    "mfu": round(GF_PER_WINDOW / 1e3 / per_win / PEAK_TFLOPS, 3),
                }
            ),
            flush=True,
        )

    # numerical agreement (bf16; layouts may reassociate)
    a = jax.jit(lambda p, hs: run(dpt_apply, p, hs))(params, hooks)
    b = jax.jit(lambda p, hs: run(dpt_apply_cl, p, hs))(params, hooks)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    print(json.dumps({"max_abs_diff": err, "out_scale": scale}), flush=True)


if __name__ == "__main__":
    main()
