"""Five-config evaluation harness (BASELINE.md protocol).

Runs each BASELINE.md evaluation config and writes ONE JSONL metric record
per config to --out-dir (default runs/eval_protocol/). Works today on
synthetic data with random weights; the day real weights/data arrive the
real numbers are one command away:

    python scripts/eval_protocol.py --ckpt weights/l4p_v1.ckpt \
        --davis-root /data/davis --dycheck-root /data/dycheck

Configs (BASELINE.md "Rebuild targets"):
  1 depth_single_window   depth only, one 16-frame window (CPU-runnable)
  2 dense_windowed        depth+flow+dyn_mask, 48-frame sliding window
  3 track2d               2D tracking (DAVIS when --davis-root, else synthetic)
  4 track3d_depth         3D tracking + depth (Dycheck when --dycheck-root)
  5 all_task              all five tasks incl. camray + joint Sim(3) alignment

Each record: {"config", "tasks", "frames", "metrics": {...}, "seconds",
"fps", "data": "synthetic|davis|dycheck", "weights": "random|ckpt"}.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batch(t, h=224, w=224, n_queries=32, seed=0, tasks=("depth",)):
    """L4PData-schema batch with consistent ground truth for every task."""
    rng = np.random.default_rng(seed)
    k = np.tile(np.diag([float(w), float(h), 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    k[:, 0, 2] = w / 2.0
    k[:, 1, 2] = h / 2.0
    ext = np.tile(np.eye(4, dtype=np.float32)[None, :, :, None], (1, 1, 1, t))
    for i in range(t):
        a = 0.01 * i
        ext[0, :3, :3, i] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]], np.float32)
        ext[0, :3, 3, i] = [0.02 * i, 0.0, -0.01 * i]
    batch = {
        "rgb_b3thw": rng.standard_normal((1, 3, t, h, w)).astype(np.float32) * 0.5,
        "intrinsics_b44t": k,
        "extrinsics_b44t": ext,
        "depth_b1thw": np.exp(rng.standard_normal((1, 1, t, h, w)).astype(np.float32) * 0.3),
        "flow_2d_backward_b2thw": rng.standard_normal((1, 2, t, h, w)).astype(np.float32),
        "dyn_mask_b1thw": (rng.random((1, 1, t, h, w)) > 0.5).astype(np.float32),
    }
    if "track_2d" in tasks:
        q = np.stack([
            np.zeros(n_queries) + 0.5,
            rng.uniform(4, w - 4, n_queries),
            rng.uniform(4, h - 4, n_queries),
        ], -1).astype(np.float32)[None]
        batch["track_2d_pointquerries_bn3"] = q
        batch["track_2d_pointlabels_bn"] = np.ones((1, n_queries), np.float32)
        traj = np.repeat(q[:, :, 1:3, None], t, axis=3)  # static GT tracks
        batch["track_2d_traj_bn2t"] = traj.astype(np.float32)
        batch["track_2d_vis_bn1t"] = np.ones((1, n_queries, 1, t), np.float32)
        batch["track_2d_valid_bn1t"] = np.ones((1, n_queries, 1, t), np.float32)
    return batch


def real_batch(kind, root, t_max, n_queries):
    """First sequence of a real dataset, collated to a batch."""
    from l4p_tpu.data.dataset import collate
    from l4p_tpu.data.sources import DavisDataset, DycheckDataset

    crop = (t_max, 224, 224)
    if kind == "davis":
        ds = DavisDataset(root, crop_size=crop)
    else:
        ds = DycheckDataset(root, crop_size=crop)
    return collate(ds[0])


# frames are expressed in windows: 1 window for the CPU-runnable config,
# 1 + 4 strides for the sliding-window ones (=> 16 / 48 frames at the
# released 16/8 geometry; scales down for the tiny smoke config)
CONFIGS = [
    ("depth_single_window", ("depth",), 0),
    ("dense_windowed", ("depth", "flow_2d_backward", "dyn_mask"), 4),
    ("track2d", ("track_2d",), 4),
    ("track3d_depth", ("track_2d", "depth"), 4),
    ("all_task", ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray"), 4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-config", default="configs/model.yaml")
    ap.add_argument("--ckpt", default=None, help="torch .ckpt (converted on load)")
    ap.add_argument("--queries", type=int, default=128,
                    help="tracking queries (reference default, demo.py:24-25)")
    ap.add_argument("--out-dir", default="runs/eval_protocol")
    ap.add_argument("--davis-root", default=None)
    ap.add_argument("--dycheck-root", default=None)
    ap.add_argument("--only", default=None, help="comma list of config names")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin overrides "
                         "the JAX_PLATFORMS env var, so this must go through "
                         "jax.config) — smoke runs with the tiny config")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.config import prepare_model
    from l4p_tpu.metrics import l4p_metrics
    from l4p_tpu.models.l4p import l4p_forward

    params, cfg, _ = prepare_model(args.model_config, args.ckpt,
                                   max_queries=args.queries, dtype=jnp.bfloat16)
    os.makedirs(args.out_dir, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None

    ws, h_img, w_img = cfg.window_size
    stride = cfg.window_stride_t
    for name, tasks, extra_strides in CONFIGS:
        if only and name not in only:
            continue
        frames = ws + extra_strides * stride
        data_kind = "synthetic"
        if name == "track2d" and args.davis_root:
            batch, data_kind = real_batch("davis", args.davis_root, frames, args.queries), "davis"
        elif name == "track3d_depth" and args.dycheck_root:
            batch, data_kind = real_batch("dycheck", args.dycheck_root, frames, args.queries), "dycheck"
        else:
            batch = synthetic_batch(frames, h=h_img, w=w_img, n_queries=args.queries, tasks=tasks)

        jb = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
        run_cfg = cfg
        if name == "depth_single_window":
            run_cfg = dataclasses.replace(cfg, joint_alignment=False)
        fwd = jax.jit(lambda p, d, _c=run_cfg, _t=tasks: l4p_forward(p, _c, d, _t))

        def sync(o):
            # one device->host pull on a combined scalar — the ONLY real
            # sync on the axon tunnel (block_until_ready does not sync
            # there, and each pull costs ~29 ms; see bench.py)
            s = sum(jnp.asarray(v).reshape(-1)[0].astype(jnp.float32) for v in o.values())
            float(np.asarray(s))

        out = fwd(params, jb)  # compile + run
        sync(out)
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            out = fwd(params, jb)
        sync(out)
        dt = (time.time() - t0) / iters

        m, _ = l4p_metrics(jb, out)
        rec = {
            "config": name,
            "tasks": list(tasks),
            "frames": frames,
            "queries": args.queries if "track_2d" in tasks else None,
            "metrics": {k: float(np.asarray(v)) for k, v in m.items()},
            "seconds": round(dt, 3),
            "fps": round(frames / dt, 2),
            "data": data_kind,
            "weights": "ckpt" if args.ckpt else "random",
        }
        path = os.path.join(args.out_dir, f"{name}.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
