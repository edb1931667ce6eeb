"""Benchmark: all-task sliding-window inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 30 fps/chip all-task 224x224 inference
(BASELINE.md; the reference repo publishes no numbers of its own).

Note: the axon platform's block_until_ready does not synchronize — timing
forces a device->host transfer instead.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48, help="video length (multiple of 8)")
    ap.add_argument("--queries", type=int, default=64, help="tracking queries")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tasks", type=str, default="flow_2d_backward,track_2d,depth,dyn_mask,camray")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    from l4p_tpu.config import init_l4p_params, load_model_config
    from l4p_tpu.models.l4p import l4p_forward

    cfg, _ = load_model_config("configs/model.yaml")
    cfg = dataclasses.replace(
        cfg, track=dataclasses.replace(cfg.track, max_queries=args.queries)
    )
    tasks = tuple(args.tasks.split(","))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    t = args.frames
    rng = np.random.default_rng(0)
    k = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    k[:, 0, 2] = 112.0
    k[:, 1, 2] = 112.0
    data = {
        "rgb_b3thw": jnp.asarray(rng.standard_normal((1, 3, t, 224, 224)), jnp.bfloat16),
        "intrinsics_b44t": jnp.asarray(k),
    }
    if "track_2d" in tasks:
        n = args.queries
        q = np.stack(
            [np.zeros(n) + 0.5, rng.uniform(4, 220, n), rng.uniform(4, 220, n)], -1
        ).astype(np.float32)
        data["track_2d_pointquerries_bn3"] = jnp.asarray(q[None])
        data["track_2d_pointlabels_bn"] = jnp.ones((1, n), jnp.float32)

    fwd = jax.jit(lambda p, d: l4p_forward(p, cfg, d, tasks, key=jax.random.PRNGKey(0)))

    def run_once():
        out = fwd(params, data)
        # force full materialization (axon block_until_ready caveat)
        s = 0.0
        for v in out.values():
            s += float(np.asarray(v.reshape(-1)[0], dtype=np.float32))
        return s

    t0 = time.time()
    run_once()
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.iters):
        run_once()
    dt = (time.time() - t0) / args.iters

    fps = t / dt
    result = {
        "metric": f"all_task_fps_per_chip_{t}f_{args.queries}q",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {
            "frames": t,
            "seconds_per_video": round(dt, 3),
            "compile_seconds": round(compile_s, 1),
            "tasks": list(tasks),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
