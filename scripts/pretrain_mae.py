"""VideoMAE-v2 pretraining driver (the stage that produces the encoder the
L4P heads are finetuned on).

    python scripts/pretrain_mae.py --size small --steps 100 --batch 2
    python scripts/pretrain_mae.py --size giant --remat --adafactor   # one v5e

The released reference ships only finetuned weights; its pretraining stack
is the upstream VideoMAEv2 recipe (reference modeling_pretrain.py:152-343):
tube masking at ratio 0.9 shared across tubelet steps, MSE on per-tubelet
normalized pixels, AdamW + warmup-cosine. This driver runs that objective on
our MAE model (models/mae.py) against a video directory (data/sources
VideoDataset) or synthetic batches, logs JSONL scalars, and saves an orbax
checkpoint that `checkpoint.convert_encoder_lenient`-style encoder-only init
(config key `video_encoder_ckpt_path`) can consume for finetuning.
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
import optax


def make_mae_optimizer(lr: float, steps: int, warmup: int, weight_decay: float = 0.05):
    """AdamW + linear warmup + cosine decay (the VideoMAE pretrain schedule)."""
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=max(warmup, 1),
        decay_steps=max(steps, warmup + 1), end_value=lr * 1e-2,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def synthetic_batches(cfg_enc, batch: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    shape = (batch, 3, cfg_enc.all_frames, cfg_enc.img_size, cfg_enc.img_size)
    while True:
        yield rng.standard_normal(shape).astype(np.float32)


def video_batches(root: str, cfg_enc, batch: int):
    """Random 16-frame crops from real clips, ImageNet-normalized like the
    finetune pipeline (data/dataset.py)."""
    from l4p_tpu.data.sources import VideoDataset

    ds = VideoDataset(sorted(
        os.path.join(root, f) for f in os.listdir(root)
        if f.lower().endswith((".mp4", ".avi", ".mov", ".webm"))
    ))
    rng = np.random.default_rng(0)
    t_need = cfg_enc.all_frames
    while True:
        clips = []
        while len(clips) < batch:
            sample = ds[int(rng.integers(len(ds)))]
            vid = sample["rgb_b3thw"][0]  # (3, T, H, W) normalized
            if vid.shape[1] < t_need:
                continue
            t0 = int(rng.integers(vid.shape[1] - t_need + 1))
            clips.append(vid[:, t0 : t0 + t_need])
        yield np.stack(clips)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="small", help="mae_registry size or 'tiny'")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1.5e-4)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--mask-ratio", type=float, default=0.9)
    ap.add_argument("--video-root", default=None, help="directory of clips; synthetic if absent")
    ap.add_argument("--out-dir", default="runs/mae_pretrain")
    ap.add_argument("--remat", action="store_true", help="rematerialize encoder blocks")
    ap.add_argument("--adafactor", action="store_true",
                    help="factored moments (fits giant on one 16 GB chip)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin otherwise "
                         "hangs backend init when the TPU tunnel is down)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.models.encoder import EncoderConfig
    from l4p_tpu.models.mae import MAEConfig, init_mae_params, mae_pretrain_loss, mae_registry

    if args.size == "tiny":
        cfg = MAEConfig(
            encoder=EncoderConfig(img_size=28, patch_size=14, embed_dim=64, depth=2,
                                  num_heads=4, mlp_ratio=4.0, all_frames=4),
            decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
            decoder_num_classes=3 * 2 * 14 * 14,
        )
    else:
        cfg = mae_registry(args.size)
    if args.remat:
        cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(cfg.encoder, remat_blocks=True))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    params = init_mae_params(cfg, jax.random.PRNGKey(0), dtype)

    if args.adafactor:
        optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adafactor(learning_rate=optax.warmup_cosine_decay_schedule(
                0.0, args.lr, max(args.warmup, 1), max(args.steps, args.warmup + 1))),
        )
    else:
        optimizer = make_mae_optimizer(args.lr, args.steps, args.warmup)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, x, key):
        loss, grads = jax.value_and_grad(
            lambda p: mae_pretrain_loss(p, cfg, x, key, args.mask_ratio)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batches = (
        video_batches(args.video_root, cfg.encoder, args.batch)
        if args.video_root
        else synthetic_batches(cfg.encoder, args.batch)
    )

    os.makedirs(args.out_dir, exist_ok=True)
    log_path = os.path.join(args.out_dir, "scalars.jsonl")
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    with open(log_path, "a") as log:
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            x = jnp.asarray(next(batches), dtype)
            params, opt_state, loss = step(params, opt_state, x, sub)
            if i % args.log_every == 0 or i == args.steps - 1:
                l = float(np.asarray(loss, np.float32))  # device sync
                rec = {"step": i, "loss": round(l, 5),
                       "s_per_step": round((time.time() - t0) / (i + 1), 3)}
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(json.dumps(rec), flush=True)

    from l4p_tpu import checkpoint_io

    ckpt_dir = os.path.abspath(os.path.join(args.out_dir, "ckpt"))
    checkpoint_io.save(ckpt_dir, {"encoder": params["encoder"]})
    print(f"saved encoder checkpoint -> {ckpt_dir}")


if __name__ == "__main__":
    main()
