"""Attribute all-task forward time by timing DCE-pruned graph variants.

    python scripts/attribute_alltask.py [--queries 64] [--frames 48]

Rather than summing standalone component timings (which miss cross-component
XLA effects and the orchestration overhead), each variant jits the REAL
l4p_forward graph but returns only a subset of outputs — XLA dead-code
eliminates everything not needed, so the deltas between variants attribute
the end-to-end wall time to encoder / dense heads / stitching / track /
camray-solve stages as they actually run inside the full graph.

Tunnel methodology as bench.py: queue iters dispatches, sync once on a
device scalar.
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


def _sync(x) -> float:
    s = jnp.zeros((), jnp.float32)
    for v in jax.tree_util.tree_leaves(x):
        s = s + v.reshape(-1)[0].astype(jnp.float32)
    return float(np.asarray(s, dtype=np.float32))


def time_fn(fn, *args, iters=5):
    _sync(fn(*args))  # compile + warm
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.config import init_l4p_params, load_model_config
    from l4p_tpu.models.l4p import (
        camray_windows_to_cameras,
        encode_windows,
        l4p_forward,
        stitch_depth_aligned,
        stitch_joint_depth_camray,
        stitch_overwrite,
    )

    cfg, _ = load_model_config("configs/model.yaml")
    cfg = dataclasses.replace(cfg, track=dataclasses.replace(cfg.track, max_queries=args.queries))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    t = args.frames
    n = args.queries
    rng = np.random.default_rng(0)
    k = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    k[:, 0, 2] = 112.0
    k[:, 1, 2] = 112.0
    q = np.stack([np.zeros(n) + 0.5, rng.uniform(4, 220, n), rng.uniform(4, 220, n)], -1).astype(
        np.float32
    )
    data = {
        "rgb_u8_bthw3": jnp.asarray(rng.integers(0, 256, (1, t, 224, 224, 3), dtype=np.uint8)),
        "intrinsics_b44t": jnp.asarray(k),
        "track_2d_pointquerries_bn3": jnp.asarray(q[None]),
        "track_2d_pointlabels_bn": jnp.ones((1, n), jnp.float32),
    }
    all_tasks = ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")

    def rep(name, dt):
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 1)}), flush=True)

    key = jax.random.PRNGKey(0)

    # --- encoder only (hooks + final) ---
    @jax.jit
    def enc_only(p, d):
        return encode_windows(
            p["video_encoder"], cfg, d.get("rgb_b3thw"), d.get("intrinsics_b44t"),
            None, rgb_u8_bthw3=d.get("rgb_u8_bthw3"),
        )

    rep("encoder(all windows)", time_fn(enc_only, params, data, iters=args.iters))

    # --- full forwards with task subsets (DCE prunes unused heads) ---
    for tasks, name in (
        (("flow_2d_backward",), "enc+flow(stitched)"),
        (("dyn_mask",), "enc+dyn_mask(stitched)"),
        (("depth",), "enc+depth(aligned-stitch)"),
        (("camray",), "enc+camray(solve+stitch)"),
        (("depth", "camray"), "enc+depth+camray(JOINT sim3)"),
        (("flow_2d_backward", "depth", "dyn_mask", "camray"), "enc+all-dense(joint)"),
        (("track_2d",), "enc+track"),
        (all_tasks, "FULL all-task"),
    ):
        fwd = jax.jit(lambda p, d, tt=tasks: l4p_forward(p, cfg, d, tt, key=key))
        rep(name, time_fn(fwd, params, data, iters=args.iters))

    # --- dense heads raw, no stitch (return window outputs) ---
    from l4p_tpu.models.l4p import dense_head_raw

    heads = cfg.head_dict

    def dense_nostitch(p, d, task):
        enc = encode_windows(
            p["video_encoder"], cfg, None, d["intrinsics_b44t"], None,
            rgb_u8_bthw3=d["rgb_u8_bthw3"],
        )
        hcfg = heads[task]
        feats = [enc["hooks"][h] for h in hcfg.dpt.hooks]
        return jax.lax.map(
            lambda fw: dense_head_raw(p["task_heads"][task], hcfg, fw, (16, 224, 224)),
            feats, batch_size=2,
        )

    for task in ("flow_2d_backward", "depth", "camray"):
        fwd = jax.jit(lambda p, d, tt=task: dense_nostitch(p, d, tt))
        rep(f"enc+{task}-RAW(no stitch)", time_fn(fwd, params, data, iters=args.iters))

    # --- all four dense raw (shared encoder) ---
    def all_dense_nostitch(p, d):
        enc = encode_windows(
            p["video_encoder"], cfg, None, d["intrinsics_b44t"], None,
            rgb_u8_bthw3=d["rgb_u8_bthw3"],
        )
        outs = {}
        for task in ("flow_2d_backward", "depth", "dyn_mask", "camray"):
            hcfg = heads[task]
            feats = [enc["hooks"][h] for h in hcfg.dpt.hooks]
            outs[task] = jax.lax.map(
                lambda fw, tt=task, hc=hcfg: dense_head_raw(p["task_heads"][tt], hc, fw, (16, 224, 224)),
                feats, batch_size=2,
            )
        return outs

    rep("enc+4dense-RAW(no stitch)", time_fn(jax.jit(all_dense_nostitch), params, data, iters=args.iters))


if __name__ == "__main__":
    main()
