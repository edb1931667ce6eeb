"""Giant-scale training-step check on one real TPU chip.

    python scripts/train_step_tpu.py [--frozen-encoder] [--steps 3]

Builds the flagship ViT-giant all-task model, runs real optimization steps
(AdamW + one-cycle, freeze masks honored) on a synthetic single-window
batch, and reports step time + loss trajectory. Two configurations:

  --frozen-encoder : heads-only training (reference finetune regime,
                     l4p_videomae.py:199-208) — encoder backward is cut by
                     stop_gradient, no encoder moments are allocated.
  default          : full-model training with block rematerialization
                     (remat_blocks) to fit the backward on one chip.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frozen-encoder", action="store_true")
    ap.add_argument("--adafactor", action="store_true",
                    help="factored second moments — full-model training fits "
                         "one 16 GB chip (AdamW's 8 GB fp32 moments do not)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--queries", type=int, default=32)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    import optax

    from l4p_tpu.config import init_l4p_params, load_model_config
    from l4p_tpu.train import l4p_loss, make_optimizer, trainable_mask

    cfg, tasks = load_model_config("configs/model.yaml")
    cfg = dataclasses.replace(
        cfg,
        track=dataclasses.replace(cfg.track, max_queries=args.queries),
        encoder=dataclasses.replace(cfg.encoder, remat_blocks=not args.frozen_encoder),
        freeze_video_encoder=args.frozen_encoder,
    )
    params = init_l4p_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    rng = np.random.default_rng(0)
    t, h, w = cfg.window_size
    n = args.queries
    kmat = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    kmat[:, 0, 2] = kmat[:, 1, 2] = 112.0
    batch = {
        "rgb_b3thw": jnp.asarray(rng.standard_normal((1, 3, t, h, w)), jnp.bfloat16),
        "intrinsics_b44t": jnp.asarray(kmat),
        "extrinsics_b44t": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32)[None, :, :, None], (1, 1, 1, t))
        ),
        "depth_b1thw": jnp.asarray(rng.uniform(1, 5, (1, 1, t, h, w)), jnp.float32),
        "flow_2d_backward_b2thw": jnp.asarray(rng.standard_normal((1, 2, t, h, w)), jnp.float32),
        "dyn_mask_b1thw": jnp.asarray((rng.uniform(size=(1, 1, t, h, w)) > 0.5), jnp.float32),
        "track_2d_pointquerries_bn3": jnp.asarray(
            np.stack([rng.uniform(0, t, (1, n)), rng.uniform(8, 216, (1, n)),
                      rng.uniform(8, 216, (1, n))], -1).astype(np.float32)),
        "track_2d_pointlabels_bn": jnp.ones((1, n), jnp.float32),
        "track_2d_traj_bn2t": jnp.asarray(rng.uniform(0, 224, (1, n, 2, t)), jnp.float32),
        "track_2d_vis_bn1t": jnp.ones((1, n, 1, t), jnp.float32),
        "track_2d_depth_bn1t": jnp.asarray(rng.uniform(1, 5, (1, n, 1, t)), jnp.float32),
        "track_2d_valid_bn1t": jnp.ones((1, n, 1, t), jnp.float32),
    }

    mask = trainable_mask(params, cfg) if args.frozen_encoder else None
    if args.adafactor:
        optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adafactor(1e-4))
    else:
        optimizer = make_optimizer(lr=1e-4, total_steps=100, mask=mask)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, loss_dict), grads = jax.value_and_grad(
            lambda p: l4p_loss(p, cfg, batch, tasks), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_dict

    t0 = time.time()
    params, opt_state, loss, _ = step(params, opt_state, batch)
    compile_s = time.time() - t0
    losses = [float(np.asarray(loss, np.float32))]

    t0 = time.time()
    for _ in range(args.steps):
        params, opt_state, loss, _ = step(params, opt_state, batch)
    losses.append(float(np.asarray(loss, np.float32)))
    dt = (time.time() - t0) / args.steps

    print(json.dumps({
        "mode": "frozen_encoder" if args.frozen_encoder else "full_remat",
        "step_seconds": round(dt, 3),
        "compile_seconds": round(compile_s, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "loss_decreased": losses[-1] < losses[0],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
