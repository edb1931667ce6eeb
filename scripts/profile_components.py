"""Per-component TPU timing with tunnel-aware (queue-then-sync) methodology.

    python scripts/profile_components.py [--queries 64]

Times, on the real chip:
  encoder window (flash on/off), dense DPT head per window, track head per
  window (+sub-parts: two-way transformer, upscale deconvs, xy upsample +
  softargmax), Sim(3) RANSAC aligner solve, and the full all-task forward.

Each measurement queues `iters` async dispatches and syncs once — syncing
per call would add the axon tunnel's ~29 ms round-trip to every number.
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


def time_fn(fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def report(name, seconds, **extra):
    print(json.dumps({"component": name, "ms": round(seconds * 1e3, 2), **extra}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from l4p_tpu.config import init_l4p_params, load_model_config
    from l4p_tpu.models.encoder import GIANT, encoder_apply, init_encoder_params
    from l4p_tpu.models.l4p import l4p_forward
    from l4p_tpu.models.sam import dense_pe, mask_decoder_apply, twoway_transformer_apply
    from l4p_tpu.models.track import (
        TrackConfig,
        init_track_params,
        softargmax_xy,
        track_forward,
    )
    from l4p_tpu.ops.resize import interpolate_trilinear

    key = jax.random.PRNGKey(0)
    n = args.queries

    # ---------------- encoder ----------------
    enc_params = init_encoder_params(GIANT, key, jnp.bfloat16)
    x = jax.random.normal(key, (1, 3, 16, 224, 224), jnp.bfloat16)
    for flash in (True, False):
        cfg = dataclasses.replace(GIANT, use_flash_attention=flash)
        fwd = jax.jit(lambda p, xx, c=cfg: encoder_apply(p, xx, c))
        report(f"encoder_window(flash={flash})", time_fn(fwd, enc_params, x, iters=5))

    # ---------------- track head, one window ----------------
    tcfg = TrackConfig(max_queries=n)
    tparams = init_track_params(tcfg, key, jnp.bfloat16)
    enc_bnpc = jax.random.normal(key, (1, n, 2048, 1408), jnp.bfloat16)
    q = jnp.concatenate(
        [jnp.zeros((1, n, 1)) + 0.5, jax.random.uniform(key, (1, n, 2), minval=4, maxval=220)],
        axis=-1,
    ).astype(jnp.float32)
    lab = jnp.ones((1, n), jnp.float32)
    pf = jnp.zeros((1, n, 1408), jnp.bfloat16)
    pfl = jnp.zeros((1, n), jnp.float32)
    tfwd = jax.jit(lambda p, e, qq, ll, f, fl: track_forward(p, tcfg, e, qq, ll, f, fl))
    report(f"track_window(N={n})", time_fn(tfwd, tparams, enc_bnpc, q, lab, pf, pfl, iters=5))

    # sub-parts
    sam = tcfg.sam
    img = enc_bnpc[0]  # (N, P, C)
    pe = dense_pe(tparams["prompt_encoder"], sam)
    pos = jnp.broadcast_to(pe.reshape(1, 1408, -1).transpose(0, 2, 1), (n, 2048, 1408)).astype(
        jnp.bfloat16
    )
    tokens = jax.random.normal(key, (n, 6, 1408), jnp.bfloat16)
    tw = jax.jit(
        lambda p, i, pp, t: twoway_transformer_apply(p["mask_decoder"]["transformer"], sam, i, pp, t)
    )
    report(f"  twoway_transformer(N={n})", time_fn(tw, tparams, img, pos, tokens, iters=5))

    md = jax.jit(lambda p, i, t: mask_decoder_apply(p["mask_decoder"], sam, i, pe, t))
    report(f"  mask_decoder_total(N={n})", time_fn(md, tparams, img, tokens, iters=5))

    logits = jax.random.normal(key, (n, 16, 64, 64), jnp.bfloat16)
    up = jax.jit(
        lambda l: softargmax_xy(
            interpolate_trilinear(l, (16, 224, 224), align_corners=False), (224, 224)
        )
    )
    report(f"  xy_upsample+softargmax(N={n})", time_fn(up, logits, iters=5))

    # ---------------- dense heads + full forward ----------------
    lcfg, _ = load_model_config("configs/model.yaml")
    lcfg = dataclasses.replace(lcfg, track=dataclasses.replace(lcfg.track, max_queries=n))
    lparams = init_l4p_params(lcfg, key, jnp.bfloat16)

    t = args.frames
    rng = np.random.default_rng(0)
    kmat = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    kmat[:, 0, 2] = 112.0
    kmat[:, 1, 2] = 112.0
    data = {
        "rgb_b3thw": jnp.asarray(rng.standard_normal((1, 3, t, 224, 224)), jnp.bfloat16),
        "intrinsics_b44t": jnp.asarray(kmat),
        "track_2d_pointquerries_bn3": q,
        "track_2d_pointlabels_bn": lab,
    }
    nw = (t - 16) // 8 + 1

    for tasks, label in (
        (("depth",), "depth_only"),
        (("depth", "camray"), "depth+camray(joint)"),
        (("track_2d",), "track_only"),
        (("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray"), "all_task"),
    ):
        fwd = jax.jit(lambda p, d, tt=tasks: l4p_forward(p, lcfg, d, tt, key=jax.random.PRNGKey(0)))
        dt = time_fn(fwd, lparams, data, iters=3)
        report(f"l4p_forward[{label}]({t}f,{nw}w)", dt, fps=round(t / dt, 1))


if __name__ == "__main__":
    main()
