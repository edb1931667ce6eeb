"""CLI entry: fit / validate / test / predict subcommands.

Mirrors the reference LightningCLI surface (reference l4p/main.py:10-15:
`python -m l4p.main fit --config ...`) on top of l4p_tpu's Trainer.

    python -m l4p_tpu.main fit      --config configs/model.yaml --data-root ...
    python -m l4p_tpu.main validate --config configs/model.yaml --ckpt ...
    python -m l4p_tpu.main predict  --config configs/model.yaml --video clip.mp4
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _build(args):
    from l4p_tpu.config import prepare_model
    from l4p_tpu import checkpoint_io

    params, cfg, tasks = prepare_model(args.config, None, max_queries=args.max_queries,
                                       dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.ckpt:
        if args.ckpt.endswith(".ckpt"):
            from l4p_tpu.config import convert_l4p, load_model_config
            import torch

            sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)["state_dict"]
            params = convert_l4p(sd, cfg, jnp.bfloat16 if args.bf16 else jnp.float32)
        else:
            restored = checkpoint_io.load(args.ckpt)
            params = restored["params"] if "params" in restored else restored
    return params, cfg, tasks


def _dataset(args, cfg=None):
    from l4p_tpu.data.dataset import collate
    from l4p_tpu.data.sources import DavisDataset, DycheckDataset, VideoDataset

    kw = {}
    if cfg is not None:  # match the model's window geometry
        t, h, w = cfg.window_size
        kw = dict(resize_size=(h, w), sample_size=(t, h, w),
                  length_multiply_of=cfg.window_stride_t)
    if args.video:
        ds = VideoDataset(args.video, **kw)
    elif args.davis_root:
        ds = DavisDataset(args.davis_root, **kw)
    elif args.dycheck_root:
        ds = DycheckDataset(args.dycheck_root, **kw)
    else:
        raise SystemExit("provide --video/--davis-root/--dycheck-root")

    def it():
        for i in range(len(ds)):
            yield collate(ds[i])

    return it


def main(argv=None):
    ap = argparse.ArgumentParser(prog="l4p_tpu")
    ap.add_argument("command", choices=["fit", "validate", "test", "predict"])
    ap.add_argument("--config", default="configs/model.yaml")
    ap.add_argument("--ckpt", default=None, help=".ckpt (torch) or orbax dir")
    ap.add_argument("--video", nargs="*", default=None)
    ap.add_argument("--davis-root", default=None)
    ap.add_argument("--dycheck-root", default=None)
    ap.add_argument("--out-dir", default="runs/default")
    ap.add_argument("--max-steps", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--max-queries", type=int, default=128)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--stream", action="store_true",
                    help="predict only: frames through StreamingL4P one "
                         "window-stride at a time (outputs identical to offline)")
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.trainer import Trainer, TrainerConfig

    params, cfg, tasks = _build(args)
    trainer = Trainer(cfg, tasks, TrainerConfig(max_steps=args.max_steps, lr=args.lr, out_dir=args.out_dir))

    if args.command == "fit":
        data_it = _dataset(args, cfg)
        params, _, step = trainer.fit(params, data_it())
        print(f"finished at step {step}; checkpoints in {args.out_dir}")
    elif args.command in ("validate", "test"):
        data_it = _dataset(args, cfg)
        scalars = trainer.validate(params, data_it(), phase="val" if args.command == "validate" else "test")
        print(scalars)
    else:  # predict — write the demo artifacts (panel mp4 + 4D PLY exports),
        # matching the reference demo surface (reference demo/demo.py:78-154)
        from l4p_tpu.inference import run_sequence

        data_it = _dataset(args, cfg)
        for i, batch in enumerate(data_it()):
            seq = batch.get("seq_name", f"seq{i}")
            if isinstance(seq, (list, tuple)):  # collate wraps per-item strings
                seq = seq[0]
            seq = str(seq)
            out = run_sequence(
                params, cfg, tasks, batch, args.out_dir, seq,
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                stream=args.stream,
            )
            print(f"sample {i} ({seq}): "
                  + ", ".join(f"{k}{list(v.shape)}" for k, v in sorted(out.items())))


if __name__ == "__main__":
    main()
