"""Attribute the all-task forward cost by task-subset ablation.

    python scripts/ablate_alltask.py [--queries 64] [--frames 48]

VERDICT r2 found ~150 ms/48f-video of all-task time not attributable to the
sum of component benchmarks (encoder + track + dense windows). Component
benchmarks time each jit in isolation, where XLA optimizes differently than
inside the full graph — so this script attributes cost by DIFFERENCING whole
jitted forwards that share the encoder pass:

  marginal(task)  = time(encoder + task) - time(encoder only)
  orchestration   = time(all tasks) - time(encoder) - sum(marginals)

Everything is measured with the tunnel-correct queue-then-sync methodology
(one device->host scalar pull per timing block, not per iteration), and all
points run serialized in ONE process so no two graphs contend for the chip.
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
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0], dtype=np.float32))


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
    )

    cfg, _ = load_model_config("configs/model.yaml")
    cfg = dataclasses.replace(cfg, track=dataclasses.replace(cfg.track, max_queries=args.queries))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    t = args.frames
    ws, stride = cfg.window_size[0], cfg.window_stride_t
    nw = (t - ws) // stride + 1
    rng = np.random.default_rng(0)
    kmat = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    kmat[:, 0, 2] = 112.0
    kmat[:, 1, 2] = 112.0
    n = args.queries
    q = np.stack([np.zeros(n) + 0.5, rng.uniform(4, 220, n), rng.uniform(4, 220, n)], -1)
    data = {
        "rgb_u8_bthw3": jnp.asarray(rng.integers(0, 256, (1, t, 224, 224, 3), dtype=np.uint8)),
        "intrinsics_b44t": jnp.asarray(kmat),
        "track_2d_pointquerries_bn3": jnp.asarray(q[None].astype(np.float32)),
        "track_2d_pointlabels_bn": jnp.ones((1, n), jnp.float32),
    }

    def rep(name, seconds, **extra):
        print(json.dumps({"point": name, "ms": round(seconds * 1e3, 2), **extra}), flush=True)

    # analytic per-stage FLOPs -> per-stage MFU on the marginal timings
    from l4p_tpu.utils.flops import alltask_video_flops, device_peak_flops, mfu

    all_tasks = ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")
    stage_flops = alltask_video_flops(cfg, all_tasks, t, n)
    peak = device_peak_flops()

    def _mfu(flops, seconds):
        u = mfu(flops, seconds, peak)
        return None if u is None else round(u, 3)

    # -- encoder-only baseline (same graph prefix every task point shares)
    enc_fn = jax.jit(
        lambda p, d: encode_windows(
            p["video_encoder"], cfg, None, d["intrinsics_b44t"], None,
            rgb_u8_bthw3=d["rgb_u8_bthw3"],
        )
    )
    t_enc = time_fn(enc_fn, params, data, iters=args.iters)
    rep("encoder_only", t_enc, windows=nw, mfu=_mfu(stage_flops["encoder"], t_enc))

    # -- single-task forwards (encoder + head + stitch, the real composition)
    singles = {}
    for task in ("flow_2d_backward", "dyn_mask", "depth", "camray", "track_2d"):
        fwd = jax.jit(lambda p, d, tt=(task,): l4p_forward(p, cfg, d, tt, key=jax.random.PRNGKey(0)))
        dt = time_fn(fwd, params, data, iters=args.iters)
        singles[task] = dt
        sf = stage_flops.get("track" if task == "track_2d" else f"dense/{task}")
        rep(f"enc+{task}", dt, marginal_ms=round((dt - t_enc) * 1e3, 2),
            marginal_mfu=None if sf is None else _mfu(sf, dt - t_enc))

    # -- joint depth+camray (the production Sim(3) path)
    fwd_joint = jax.jit(
        lambda p, d: l4p_forward(p, cfg, d, ("depth", "camray"), key=jax.random.PRNGKey(0))
    )
    t_joint = time_fn(fwd_joint, params, data, iters=args.iters)
    rep("enc+depth+camray(joint)", t_joint,
        marginal_ms=round((t_joint - t_enc) * 1e3, 2),
        vs_singles_ms=round((t_joint - singles["depth"] - singles["camray"] + t_enc) * 1e3, 2))

    # -- full all-task
    tasks = ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")
    fwd_all = jax.jit(lambda p, d: l4p_forward(p, cfg, d, tasks, key=jax.random.PRNGKey(0)))
    t_all = time_fn(fwd_all, params, data, iters=args.iters)
    marg = {k: v - t_enc for k, v in singles.items()}
    # in the all-task graph depth+camray run jointly; use the joint marginal
    sum_marg = marg["flow_2d_backward"] + marg["dyn_mask"] + marg["track_2d"] + (t_joint - t_enc)
    rep("all_task", t_all, fps=round(t / t_all, 1),
        unattributed_ms=round((t_all - t_enc - sum_marg) * 1e3, 2),
        mfu=_mfu(stage_flops["total"], t_all),
        model_tflops=round(stage_flops["total"] / 1e12, 2))

    # -- isolated hot sub-blocks (for the roofline table)
    # the camray head emits rays at its configured output_size (16x16 grid,
    # reference dense_heads.py:269-270) — NOT at image resolution
    r_t, r_h, r_w = cfg.head_dict["camray"].dpt.output_size
    rays = jnp.asarray(rng.standard_normal((nw, 1, 6, r_t, r_h, r_w)), jnp.float32)
    cam_fn = jax.jit(
        lambda r, d: camray_windows_to_cameras(
            r, cfg.head_dict["camray"], (ws, 224, 224), d["intrinsics_b44t"], stride,
            jax.random.PRNGKey(7),
        )
    )
    rep("camray_solve(all windows)", time_fn(cam_fn, rays, data, iters=args.iters))

    depth_w = jnp.asarray(np.abs(rng.standard_normal((nw, 1, 1, ws, 224, 224))) + 0.1, jnp.float32)
    st_fn = jax.jit(lambda d: stitch_depth_aligned(d, stride, t, cfg.head_dict["depth"]))
    rep("stitch_depth_aligned", time_fn(st_fn, depth_w, iters=args.iters))

    pose_w = jnp.tile(jnp.eye(4, dtype=jnp.float32).reshape(1, 1, 16, 1), (nw, 1, 1, ws))
    intr_w = jnp.asarray(np.tile(kmat[:, :, :, :ws].reshape(1, 1, 16, ws), (nw, 1, 1, 1)), jnp.float32)
    j_fn = jax.jit(
        lambda d, p, k: stitch_joint_depth_camray(
            d, p, k, stride, t, jax.random.PRNGKey(11),
            num_trials=cfg.sim3_num_trials, min_samples=cfg.sim3_min_samples,
        )
    )
    rep("stitch_joint_sim3", time_fn(j_fn, depth_w, pose_w, intr_w, iters=args.iters))


if __name__ == "__main__":
    main()
