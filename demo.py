"""All-task inference demo — parity with the reference demo/demo.py.

Runs the five tasks on DAVIS clips / generic videos / Dycheck sequences,
writes per-task panel videos and 4D point-cloud exports.

Usage:
  python demo.py --video path/to/clip.mp4 --out-dir out/
  python demo.py --davis-root /data/davis --seq train parkour
  python demo.py --dycheck-root /data/dycheck
  python demo.py --synthetic        # no data needed: random video smoke run
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax


TASKS = ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")

from l4p_tpu.inference import run_sequence  # noqa: E402 — shared with the CLI


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/model.yaml")
    ap.add_argument("--ckpt", default=None, help="released .ckpt (converted on load)")
    ap.add_argument("--video", nargs="*", default=None)
    # dataset-root presets (reference demo/demo.py:53,88,219 hardcodes its
    # roots via demo/paths.py; here the presets are env vars so the same
    # command works across machines): L4P_DAVIS_ROOT / L4P_DYCHECK_ROOT
    ap.add_argument("--davis-root", default=os.environ.get("L4P_DAVIS_ROOT"))
    ap.add_argument("--dycheck-root", default=os.environ.get("L4P_DYCHECK_ROOT"))
    ap.add_argument("--seq", nargs="*", default=None, help="filter sequence names")
    ap.add_argument("--out-dir", default="out")
    ap.add_argument("--max-queries", type=int, default=128)
    ap.add_argument("--tasks", default=None, help="defaults to the config's task list")
    ap.add_argument("--synthetic", action="store_true", help="random-video smoke run")
    ap.add_argument("--stream", action="store_true",
                    help="online mode: frames through StreamingL4P one "
                         "window-stride at a time (outputs identical to offline)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.config import prepare_model
    from l4p_tpu.data.dataset import collate
    from l4p_tpu.data.sources import DavisDataset, DycheckDataset, VideoDataset

    params, cfg, tasks = prepare_model(args.config, args.ckpt, max_queries=args.max_queries)
    if args.tasks:
        tasks = tuple(args.tasks.split(","))
    if args.ckpt is None:
        print("WARNING: no checkpoint given — running with random weights")

    datasets = []
    if args.video:
        datasets.append(VideoDataset(args.video))
    if args.davis_root:
        datasets.append(DavisDataset(args.davis_root))
    if args.dycheck_root:
        datasets.append(DycheckDataset(args.dycheck_root))

    if args.synthetic or not datasets:
        print("Running synthetic smoke sequence (24 frames)")
        rng = np.random.default_rng(0)
        t = 24
        k = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
        k[:, 0, 2], k[:, 1, 2] = 112.0, 112.0
        n = 32
        q = np.stack([np.zeros(n) + 0.5, rng.uniform(8, 216, n), rng.uniform(8, 216, n)], -1)
        u8 = rng.integers(0, 256, (1, t, 224, 224, 3), dtype=np.uint8)
        batch = {
            "rgb_u8_bthw3": u8,
            "rgb_b3thw": (u8.transpose(0, 4, 1, 2, 3) / 255.0).astype(np.float32),
            "intrinsics_b44t": k,
            "track_2d_pointquerries_bn3": q[None].astype(np.float32),
            "track_2d_pointlabels_bn": np.ones((1, n), np.float32),
            "rgb_mean_b3111": np.zeros((1, 3, 1, 1, 1), np.float32),
            "rgb_std_b3111": np.ones((1, 3, 1, 1, 1), np.float32),
        }
        run_sequence(params, cfg, tasks, batch, args.out_dir, "synthetic", stream=args.stream)
        return

    for ds in datasets:
        for i in range(len(ds)):
            # filter on the name BEFORE decoding/preprocessing the sequence
            name_src = getattr(ds, "scene_list", None) or getattr(ds, "video_paths", None) \
                or getattr(ds, "seq_list", None)
            if args.seq and name_src is not None:
                if not any(s in os.path.basename(str(name_src[i])) for s in args.seq):
                    continue
            sample = ds[i]
            seq = sample.get("seq_name", f"seq{i}")
            if args.seq and not any(s in seq for s in args.seq):
                continue
            batch = collate(sample)
            run_sequence(params, cfg, tasks, batch, args.out_dir, seq, stream=args.stream)


if __name__ == "__main__":
    main()
