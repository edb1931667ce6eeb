"""Streaming (online) all-task latency/throughput on the real chip.

    python scripts/stream_bench.py [--queries 64] [--windows 8]

Measures the steady-state per-window latency of StreamingL4P at the giant
config — the number behind README's "real-time with one window-stride of
latency" claim. Methodology per ROUND_NOTES: push all timed windows first,
sync ONCE on a device-side scalar at the end (each device->host pull costs a
~29 ms tunnel round-trip), divide.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--windows", type=int, default=8, help="timed steady-state windows")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.config import init_l4p_params, load_model_config
    from l4p_tpu.streaming import StreamingL4P

    cfg, tasks = load_model_config("configs/model.yaml")
    cfg = dataclasses.replace(cfg, track=dataclasses.replace(cfg.track, max_queries=args.queries))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    ws, stride = cfg.window_size[0], cfg.window_stride_t
    rng = np.random.default_rng(0)
    n = args.queries
    q = np.stack([np.zeros(n) + 0.5, rng.uniform(4, 220, n), rng.uniform(4, 220, n)], -1)
    s = StreamingL4P(params, cfg, tasks, queries_bn3=jnp.asarray(q[None].astype(np.float32)))

    t_total = ws + stride * (1 + args.windows)  # warmup: window 0 + 1 steady
    frames = rng.integers(0, 256, (1, t_total, 224, 224, 3), dtype=np.uint8)
    intr = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t_total))
    intr[:, 0, 2] = intr[:, 1, 2] = 112.0

    def sync(emit):
        v = next(iter(x for k, x in emit.items() if k != "t0"))
        return float(np.asarray(v.reshape(-1)[0], dtype=np.float32))

    # warmup: both jit variants (is_first and steady state)
    t0 = time.time()
    e = s.push(frames[:, :ws], intr[:, :, :, :ws])
    sync(e[-1])
    compile_first = time.time() - t0
    t0 = time.time()
    e = s.push(frames[:, ws : ws + stride], intr[:, :, :, ws : ws + stride])
    sync(e[-1])
    compile_steady = time.time() - t0

    # timed steady-state pushes, one sync at the end
    t0 = time.time()
    last = None
    for w in range(args.windows):
        lo = ws + stride * (1 + w)
        e = s.push(frames[:, lo : lo + stride], intr[:, :, :, lo : lo + stride])
        last = e[-1]
    sync(last)
    dt = (time.time() - t0) / args.windows

    print(json.dumps({
        "metric": f"stream_window_latency_ms_{args.queries}q",
        "value": round(dt * 1e3, 1),
        "unit": "ms/window",
        "sustained_input_fps": round(stride / dt, 1),
        "latency_frames": ws,
        "compile_s": {"first_window": round(compile_first, 1),
                      "steady": round(compile_steady, 1)},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
